package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSuite {

  private def withRule[T](bin: Long)(body: => T): T = {
    RangeJoinRewrite.install(spark, bin)
    try body
    finally {
      spark.conf.set(RangeJoinRewrite.BinSizeKey, "0")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRewrite)
    }
  }

  // executedPlan is an AdaptiveSparkPlanExec wrapper; its toString renders
  // the full inner tree, while collect() would stop at the wrapper
  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hasBnlj(df: org.apache.spark.sql.DataFrame): Boolean = {
    val p = planOf(df)
    p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
  }

  private def intervals() = spark.read.parquet(s"$sf0/orders.parquet")
    .where(col("o_orderkey") % 50 === 0)
    .select(col("o_orderkey").as("iv_id"),
      col("o_orderdate").cast("timestamp").as("w_start"),
      (col("o_orderdate") + expr("make_interval(0,0,0, 1 + o_orderkey % 28)"))
        .cast("timestamp").as("w_end"))

  private def points() = spark.read.parquet(s"$sf0/lineitem.parquet")
    .select(col("l_orderkey"), col("l_quantity"),
      col("l_shipdate").cast("timestamp").as("ship_ts"))

  test("raw interval join rewrites to an equi-join plan, same result") {
    val iv = intervals(); val pt = points()
    val cond = col("ship_ts") >= col("w_start") && col("ship_ts") < col("w_end")

    val naive = iv.join(pt, cond).select("iv_id", "l_orderkey", "l_quantity")
    assert(hasBnlj(naive), "without the rule a pure range join is a BNLJ")
    val expected = naive.collect().toSet

    withRule(7 * 86400L) {
      val rewritten = iv.join(pt, cond).select("iv_id", "l_orderkey", "l_quantity")
      assert(!hasBnlj(rewritten), "rule must eliminate the nested-loop join")
      val p = planOf(rewritten)
      assert(p.contains("Generate") && p.contains("__graft_bucket"),
        s"expected the bucket explode in the plan:\n$p")
      assert(rewritten.collect().toSet === expected)
    }
  }

  test("point side may be left or right; bounds may be flipped or strict") {
    val iv = intervals(); val pt = points()
    withRule(86400L) {
      // point on the LEFT, bounds written "backwards" (lo <= p, hi > p)
      val flipped = pt.join(iv,
        col("w_start") <= col("ship_ts") && col("w_end") > col("ship_ts"))
        .select("iv_id", "l_orderkey")
      assert(!hasBnlj(flipped))
      // strict lower bound is rewritten too (over-generation only)
      val strict = iv.join(pt,
        col("ship_ts") > col("w_start") && col("ship_ts") <= col("w_end"))
        .select("iv_id", "l_orderkey")
      assert(!hasBnlj(strict))
      val naiveStrict = iv.join(pt,
        col("ship_ts") > col("w_start") && col("ship_ts") <= col("w_end"))
        .select("iv_id", "l_orderkey")
      assert(strict.collect().toSet === naiveStrict.collect().toSet)
    }
  }

  test("integral-typed range joins rewrite as well") {
    import spark.implicits._
    val ranges = Seq((1L, 0L, 100L), (2L, 50L, 150L), (3L, 400L, 410L))
      .toDF("rid", "lo", "hi")
    val vals = (0L until 500L).toDF("v")
    withRule(32L) {
      val joined = ranges.join(vals, col("v") >= col("lo") && col("v") < col("hi"))
      assert(!hasBnlj(joined))
      val got = joined.groupBy("rid").count().as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 100L, 2L -> 100L, 3L -> 10L))
    }
  }

  test("null bounds and null points drop out exactly like the naive join") {
    import spark.implicits._
    val ranges = Seq((1L, Some(0L), Some(100L)), (2L, None, Some(50L)),
      (3L, Some(10L), None)).toDF("rid", "lo", "hi")
    val vals = (Seq[Option[Long]](Some(5L), Some(20L), None)).toDF("v")
    val cond = col("v") >= col("lo") && col("v") < col("hi")
    val expected = ranges.join(vals, cond).select("rid", "v")
      .as[(Long, Long)].collect().toSet
    withRule(16L) {
      val got = ranges.join(vals, cond).select("rid", "v")
      assert(!hasBnlj(got))
      assert(got.as[(Long, Long)].collect().toSet === expected)
      assert(expected === Set((1L, 5L), (1L, 20L))) // sanity: nulls dropped
    }
  }

  test("conservative: equi conjunct present, extra filters, or rule off") {
    val iv = intervals(); val pt = points()
    // rule off → untouched
    val off = iv.join(pt, col("ship_ts") >= col("w_start") && col("ship_ts") < col("w_end"))
    assert(hasBnlj(off))
    withRule(86400L) {
      // an equi conjunct already spans the sides → leave it to hash join
      val equi = iv.join(pt,
        col("iv_id") === col("l_orderkey") && col("ship_ts") >= col("w_start"))
      assert(planOf(equi).contains("__graft_bucket") === false)
      // extra single-side conjuncts ride along unchanged
      val extra = iv.join(pt,
        col("ship_ts") >= col("w_start") && col("ship_ts") < col("w_end") &&
          col("l_quantity") > 10)
      assert(!hasBnlj(extra))
      val naive = iv.join(pt,
        col("ship_ts") >= col("w_start") && col("ship_ts") < col("w_end") &&
          col("l_quantity") > 10).select("iv_id", "l_orderkey")
      assert(extra.select("iv_id", "l_orderkey").collect().toSet
        === naive.collect().toSet)
    }
  }
}
