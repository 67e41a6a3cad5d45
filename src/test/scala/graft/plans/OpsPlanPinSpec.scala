package graft.plans

import graft.SparkSuite
import graft.ops.{Sampling, Similarity, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan pins for the round-4 operators: each test asserts the
  * shape that makes the operator scale — map-only where claimed, the
  * designed fan-out where claimed, and never a nested-loop/cartesian
  * fallback. A regression that silently re-plans one of these into a
  * serial or quadratic shape fails here before it costs a cluster-day.
  */
class OpsPlanPinSpec extends SparkSuite {
  import spark.implicits._

  private def planOf(df: DataFrame): String = {
    // collect() drives THIS QueryExecution (count() would spawn a separate
    // one and leave df.queryExecution un-executed), so the string below is
    // the AQE-FINALIZED plan, not the initial adaptive sketch
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private lazy val docs = (1L to 50L)
    .map(i => (i, s"src${i % 3}", s"alpha bravo charlie delta echo doc$i " * 3))
    .toDF("doc_id", "source", "text")

  private lazy val vecs = (1L to 40L)
    .map(i => (i, Array.tabulate(8)(j => ((i * 7 + j) % 13).toDouble)))
    .toDF("vec_id", "embedding")

  test("chunkWindows is map-only: one Generate, zero Exchange") {
    val p = planOf(TextOps.chunkWindows(docs, "doc_id", "text", 8, 6))
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("winnowFingerprints is map-only: one Generate, zero Exchange") {
    val p = planOf(TextOps.winnowFingerprints(docs, "doc_id", "text", 3, 4))
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange"), s"winnowing must not shuffle:\n$p")
  }

  test("leakageSafeSplit is a pure projection: zero Exchange, zero Generate") {
    val p = planOf(Sampling.leakageSafeSplit(
      docs.withColumn("unit", md5(col("text"))), "unit",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    assert(!p.contains("Exchange"), s"split assignment must not shuffle:\n$p")
    assert(!p.contains("Generate"), p)
  }

  test("densitySample: cell counts broadcast back, no sort-merge join, no window") {
    val p = planOf(Sampling.densitySample(vecs, "vec_id", "embedding", 4, 5L))
    assert(p.contains("BroadcastHashJoin"),
      s"cell-count table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
  }

  test("allPairsCosine: equi-join fan-out, never nested-loop or cartesian") {
    val grouped = vecs.withColumn("g", col("vec_id") % 2)
    val p = planOf(
      Similarity.allPairsCosine(grouped, "vec_id", "embedding", Seq("g"), 4))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"block decomposition must stay an equi-join:\n$p")
    assert(p.contains("Generate"), s"expected the block fan-out explode:\n$p")
  }
}
