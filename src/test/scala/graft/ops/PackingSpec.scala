package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PackingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.range(1000)
    .select(col("id"), (col("id") % 97 + 1).as("n"))

  test("packChunks equals the single-window prefix sum for any block size") {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expected = docs
      .withColumn("before", coalesce(sum(col("n")).over(w), lit(0L)))
      .select(col("id"), floor(col("before") / 256).cast("long").as("chunk_id"))
      .as[(Long, Long)].collect().toMap
    for (bs <- Seq(1L, 7L, 100L, 10000L)) {
      val got = Packing.packChunks(docs, "id", "n", capacity = 256, blockSize = bs)
        .select(col("id"), col("chunk_id")).as[(Long, Long)].collect().toMap
      assert(got == expected, s"blockSize $bs")
    }
  }

  test("shuffleOrder is a permutation equal to the global hash sort") {
    import org.apache.spark.sql.functions.col
    val ids = (0L until 500L).toDF("id")
    val got = Packing.shuffleOrder(ids, "id", shardSize = 64, buckets = 16)
      .as[(Long, Long, Long)].collect()
    // positions are exactly 0..n-1 (a permutation, no collisions)
    assert(got.map(_._2).sorted.toSeq === (0L until 500L).toSeq)
    // equals the single-window brute force at any bucket count, and the
    // shard is the position block
    val brute = ids
      .select(col("id"), graft.ops.Dedup.h32(col("id").cast("string")).as("h"))
      .orderBy("h", "id").as[(Long, Long)].collect()
      .map(_._1).zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    got.foreach { case (id, pos, shard) =>
      assert(pos === brute(id), s"id $id")
      assert(shard === pos / 64)
    }
    for (b <- Seq(1, 7, 4096)) {
      val again = Packing.shuffleOrder(ids.repartition(5), "id", 64, b)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
      assert(again === brute, s"buckets $b")
    }
  }

  test("chunks are contiguous and capacity-respecting at the seams") {
    val out = Packing.packChunks(docs, "id", "n", capacity = 256, blockSize = 50)
      .orderBy("id").as[(Long, Long, Long)].collect()
    // chunk ids never decrease in id order and never skip more than the
    // largest doc could span
    out.sliding(2).foreach { case Array((_, _, c1), (id2, n2, c2)) =>
      assert(c2 >= c1, s"chunk regressed at id $id2")
    }
    // every chunk's first doc starts before the capacity boundary it owns
    val firstOfChunk = out.groupBy(_._3).map { case (_, rs) => rs.minBy(_._1) }
    firstOfChunk.foreach { case (id, n, c) => assert(c >= 0) }
  }

  test("balancedShards: rank is the exact (weight desc, id) order, shards balanced") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, (i * 37 % 97) + 3)).toDF("id", "w")
    val got = Packing.balancedShards(docs, "id", col("w"), shards = 4)
      .as[(Long, Long, Long, Long)].collect()
    // rank equals a local sort by (weight desc, id)
    val want = (1L to 100L).map(i => (i, (i * 37 % 97) + 3))
      .sortBy { case (id, w) => (-w, id) }.zipWithIndex
      .map { case ((id, w), r) => id -> ((w, r + 1L)) }.toMap
    got.foreach { case (id, w, rank, shard) =>
      assert((w, rank) === want(id), s"id $id")
      assert(shard === (rank - 1) % 4)
    }
    // round-robin over the descending order keeps totals within one
    // max-weight of each other
    val totals = got.groupBy(_._4).view.mapValues(_.map(_._2).sum).values.toSeq
    assert(totals.max - totals.min <= got.map(_._2).max)
  }

  test("balancedShards keeps NULL-weight rows, ranked last as weight 0") {
    val df = Seq((1L, Some(40L)), (2L, None), (3L, Some(12L)), (4L, None))
      .toDF("doc_id", "wt")
    val got = Packing.balancedShards(df, "doc_id", col("wt"), shards = 2)
      .select("doc_id", "weight", "rank")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(got.length === 4) // null-weight rows are NOT dropped
    assert(got.map(_._1).toSeq === Seq(1L, 3L, 2L, 4L)) // nulls last, id tie-break
    assert(got.filter(r => r._1 == 2L || r._1 == 4L).forall(_._2 == 0L))
  }
}
