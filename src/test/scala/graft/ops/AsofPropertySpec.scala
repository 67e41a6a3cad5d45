package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Property test: AsofJoin's union-merge formulation equals the obvious
  * per-row brute force (max right ts ≤ / < left ts within the key) on
  * random inputs — including duplicate timestamps, empty keys, and keys
  * present on only one side. (Plain ScalaCheck generators with fixed
  * seeds; the scalatest-scalacheck bridge isn't on the classpath.)
  */
class AsofPropertySpec extends SparkSuite {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private val genRows: Gen[(List[(Long, Long)], List[(Long, Long, Long)])] = for {
    nl <- Gen.choose(0, 40)
    nr <- Gen.choose(0, 40)
    // keys in a small range and timestamps on a coarse grid force
    // collisions: equal ts across sides, several right rows per left row
    left <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 20L)))
    right <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 20L)))
  } yield (left, right.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })

  private def bruteForce(left: List[(Long, Long)], right: List[(Long, Long, Long)],
                         strict: Boolean): Map[(Long, Long), Option[Long]] =
    left.map { case (k, t) =>
      val candidates = right.filter { case (rk, rt, _) =>
        rk == k && (if (strict) rt < t else rt <= t) }
      // deterministic pick among equal timestamps: the max payload id
      // (mirrors pre-aggregating the right side to one row per key/ts)
      val best = candidates.sortBy(c => (c._2, c._3)).lastOption.map(_._3)
      (k, t) -> best
    }.toMap

  private def bruteForward(left: List[(Long, Long)], right: List[(Long, Long, Long)],
                           strict: Boolean, tolMs: Long): Map[(Long, Long), Option[Long]] =
    left.map { case (k, t) =>
      val candidates = right.filter { case (rk, rt, _) =>
        rk == k && (if (strict) rt > t else rt >= t) }
      // nearest-at-or-after; None when even the nearest exceeds tolerance
      val best = candidates.sortBy(c => (c._2, c._3)).headOption
      (k, t) -> best.filter(_._2 - t <= tolMs).map(_._3)
    }.toMap

  for (strict <- Seq(false, true))
    test(s"forward asofJoin strict=$strict + tolerance equals brute force") {
      val cases = Gen.listOfN(25, genRows)
        .apply(Gen.Parameters.default, Seed(77L + (if (strict) 1 else 0))).get
      cases.zipWithIndex.foreach { case ((left, rightRaw), ci) =>
        val right = rightRaw.groupBy(r => (r._1, r._2))
          .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toList
        val lDf = left.map { case (k, t) => (k, ts(t)) }.toDF("k", "lts")
        val rDf = right.map { case (k, t, p) => (k, ts(t), p) }.toDF("k", "rts", "pay")
        val got = AsofJoin.asofJoin(lDf, rDf, Seq("k"), "lts", "rts",
            Map("pay" -> "pay"), strict, forward = true,
            tolerance = Some(org.apache.spark.sql.functions.expr(
              "INTERVAL 5 MILLISECONDS")))
          .select("k", "lts", "pay")
          .as[(Long, java.sql.Timestamp, Option[Long])].collect()
        val want = bruteForward(left, right, strict, tolMs = 5L)
        got.foreach { case (k, t, pay) =>
          assert(pay == want((k, t.getTime)), s"case $ci key=$k ts=${t.getTime}")
        }
        assert(got.length == left.length, s"case $ci row count")
      }
    }

  private def bruteNearest(left: List[(Long, Long)], right: List[(Long, Long, Long)],
                           strict: Boolean): Map[(Long, Long), Option[Long]] =
    left.map { case (k, t) =>
      val cands = right.filter(r => r._1 == k)
      val prev = cands.filter(r => if (strict) r._2 < t else r._2 <= t)
        .sortBy(_._2).lastOption
      val next = cands.filter(r => if (strict) r._2 > t else r._2 >= t)
        .sortBy(_._2).headOption
      val best = (prev, next) match {
        case (None, n) => n
        case (p, None) => p
        case (Some(p), Some(n)) =>
          if (t - p._2 <= n._2 - t) Some(p) else Some(n)
      }
      (k, t) -> best.map(_._3)
    }.toMap

  for (strict <- Seq(false, true))
    test(s"nearestJoin strict=$strict equals brute force on 25 random inputs") {
      val cases = Gen.listOfN(25, genRows)
        .apply(Gen.Parameters.default, Seed(99L + (if (strict) 1 else 0))).get
      cases.zipWithIndex.foreach { case ((left, rightRaw), ci) =>
        val right = rightRaw.groupBy(r => (r._1, r._2))
          .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toList
        val lDf = left.toDF("k", "lts")
        val rDf = right.toDF("k", "rts", "pay")
        val got = AsofJoin.nearestJoin(lDf, rDf, Seq("k"), "lts", "rts",
            Map("pay" -> "pay"), strict)
          .select("k", "lts", "pay")
          .as[(Long, Long, Option[Long])].collect()
        val want = bruteNearest(left, right, strict)
        got.foreach { case (k, t, pay) =>
          assert(pay == want((k, t)), s"case $ci key=$k ts=$t")
        }
        assert(got.length == left.length, s"case $ci row count")
      }
    }

  for (strict <- Seq(false, true))
    test(s"asofJoin strict=$strict equals brute force on 25 random inputs") {
      val cases = Gen.listOfN(25, genRows)
        .apply(Gen.Parameters.default, Seed(42L + (if (strict) 1 else 0))).get
      cases.zipWithIndex.foreach { case ((left, rightRaw), ci) =>
        // one right row per (key, ts): max payload id, as documented
        val right = rightRaw.groupBy(r => (r._1, r._2))
          .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toList
        val lDf = left.map { case (k, t) => (k, ts(t)) }.toDF("k", "lts")
          .withColumn("rid", org.apache.spark.sql.functions.monotonically_increasing_id())
        val rDf = right.map { case (k, t, p) => (k, ts(t), p) }.toDF("k", "rts", "pay")
        val got = AsofJoin.asofJoin(lDf, rDf, Seq("k"), "lts", "rts",
            Map("pay" -> "pay"), strict)
          .select("k", "lts", "pay")
          .as[(Long, java.sql.Timestamp, Option[Long])].collect()
        val want = bruteForce(left, right.map(r => (r._1, r._2, r._3)), strict)
        got.foreach { case (k, t, pay) =>
          assert(pay == want((k, t.getTime)), s"case $ci key=$k ts=${t.getTime}")
        }
        assert(got.length == left.length, s"case $ci row count")
      }
    }
}
