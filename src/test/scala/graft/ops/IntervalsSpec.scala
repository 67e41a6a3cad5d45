package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class IntervalsSpec extends SparkSuite {
  import spark.implicits._

  test("coverage equals a brute-force point-set union") {
    val iv = Seq(
      ("a", 1, 3), ("a", 2, 5), ("a", 7, 7),   // overlap + gap
      ("b", 1, 3), ("b", 4, 5),                 // adjacent: two islands
      ("c", 10, 10), ("c", 10, 10),             // duplicate point interval
      ("d", 1, 9), ("d", 2, 3), ("d", 4, 8))    // nested
      .toDF("k", "s", "e")
    val got = Intervals.coverage(iv, Seq("k"), "s", "e")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    val pts = Seq("a", "b", "c", "d").map { k =>
      val rows = Seq(("a", 1, 3), ("a", 2, 5), ("a", 7, 7), ("b", 1, 3),
        ("b", 4, 5), ("c", 10, 10), ("c", 10, 10), ("d", 1, 9), ("d", 2, 3),
        ("d", 4, 8)).filter(_._1 == k)
      k -> rows.flatMap(r => r._2 to r._3).toSet
    }.toMap
    Seq("a", "b", "c", "d").foreach { k =>
      assert(got(k)._3 == pts(k).size.toLong, s"covered $k")
      assert(got(k)._4 == pts(k).max - pts(k).min + 1, s"span $k")
    }
    assert(got("a")._2 == 2L)  // {1..5}, {7}
    assert(got("b")._2 == 2L)  // adjacency does not merge
    assert(got("c")._2 == 1L)
    assert(got("d")._2 == 1L)
  }

  test("coverage is independent of physical layout") {
    val li = spark.read.parquet(s"$sf0/lineitem.parquet")
      .select(col("l_suppkey"),
        expr("unix_date(CAST(l_shipdate AS DATE))").as("s"),
        expr("unix_date(CAST(l_shipdate AS DATE)) + CAST(l_linenumber % 7 AS INT)")
          .as("e"))
    val a = Intervals.coverage(li, Seq("l_suppkey"), "s", "e")
      .orderBy("l_suppkey").collect().toSeq
    val b = Intervals.coverage(li.repartition(13), Seq("l_suppkey"), "s", "e")
      .orderBy("l_suppkey").collect().toSeq
    assert(a == b)
  }

  test("overlapJoin pairs intersecting intervals per key, inclusive bounds") {
    import spark.implicits._
    val a = Seq(("u1", 0L, 10L), ("u1", 20L, 30L), ("u2", 0L, 5L))
      .toDF("k", "a_start", "a_end")
    val b = Seq(("u1", 5L, 15L),  // overlaps [0,10] by 5, not [20,30]
      ("u1", 30L, 40L),           // touches [20,30] at 30 → overlap 0
      ("u2", 6L, 9L),             // adjacent-after [0,5] → NO overlap (6>5)
      ("u3", 0L, 100L))           // key absent on the left
      .toDF("k", "b_start", "b_end")
    val got = Intervals.overlapJoin(a, b, Seq("k"),
        "a_start", "a_end", "b_start", "b_end")
      .select("k", "a_start", "b_start", "overlap")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(("u1", 0L, 5L, 5L), ("u1", 20L, 30L, 0L)))
  }
}
