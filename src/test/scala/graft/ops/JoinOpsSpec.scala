package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite

class JoinOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 110.0),
    (1L, ts("2024-01-01 12:00:00"), 120.0),
    (2L, ts("2024-01-01 10:30:00"), 200.0)
  ).toDF("key", "qts", "price")

  private val trades = Seq(
    (1L, ts("2024-01-01 10:59:59"), "a"), // before the 11:00 quote
    (1L, ts("2024-01-01 11:00:00"), "b"), // exactly at the 11:00 quote
    (1L, ts("2024-01-01 09:00:00"), "c"), // before any quote
    (2L, ts("2024-01-01 23:00:00"), "d"),
    (3L, ts("2024-01-01 10:00:00"), "e")  // key with no quotes at all
  ).toDF("key", "tts", "tag")

  test("asofJoin non-strict takes the latest quote at-or-before each trade") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
      Map("price" -> "price")).select("tag", "price").as[(String, Option[Double])]
      .collect().toMap
    assert(out == Map("a" -> Some(100.0), "b" -> Some(110.0), "c" -> None,
      "d" -> Some(200.0), "e" -> None))
  }

  test("asofJoin strict excludes the equal-timestamp right row") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
      Map("price" -> "price"), strict = true)
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(out("b").contains(100.0)) // 11:00 quote no longer visible at 11:00
    assert(out("a").contains(100.0))
  }

  test("asofJoin never matches null keys (equi-join semantics)") {
    val l = Seq((Option.empty[Long], ts("2024-01-01 12:00:00"), "nk"))
      .toDF("key", "tts", "tag")
    val r = Seq((Option.empty[Long], ts("2024-01-01 10:00:00"), 99.0))
      .toDF("key", "qts", "price")
    val out = AsofJoin.asofJoin(l, r, Seq("key"), "tts", "qts",
      Map("price" -> "price"))
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(out == Map("nk" -> None)) // left row kept, no null-key match
  }

  test("asofJoin keeps every left row and all left columns") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
      Map("price" -> "p", "qts" -> "matched_at"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("key", "tts", "tag", "p", "matched_at"))
  }

  private val intervals = Seq(
    (1L, ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00")),  // exactly one week
    (2L, ts("2024-01-03 00:00:00"), ts("2024-02-20 00:00:00")),  // spans many buckets
    (3L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))   // no points inside
  ).toDF("iv_id", "w_start", "w_end")

  private val points = Seq(
    (10L, ts("2024-01-01 00:00:00")), // start inclusive -> iv 1
    (11L, ts("2024-01-07 23:59:59")), // inside iv 1, last second
    (12L, ts("2024-01-08 00:00:00")), // end exclusive -> only iv 2
    (13L, ts("2024-02-19 23:59:59")), // last second of iv 2
    (14L, ts("2024-06-01 00:00:00"))  // matches nothing
  ).toDF("pt_id", "pts")

  test("intervalJoin matches [start, end) exactly, across bucket widths") {
    for (w <- Seq(1, 7, 30)) {
      val got = RangeJoin.intervalJoin(intervals, "w_start", "w_end",
          points, "pts", Seq("pt_id"), widthDays = w)
        .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (2L, 13L)),
        s"bucket width $w days")
    }
  }

  test("intervalJoin emits each matching pair exactly once") {
    val got = RangeJoin.intervalJoin(intervals, "w_start", "w_end",
      points, "pts", Seq("pt_id"), widthDays = 3)
    assert(got.count() == got.distinct().count())
  }
}
