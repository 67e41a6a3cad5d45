package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is non-reproducible across retries and
  * re-partitions; these operators hash a stable id column instead, so the
  * same row always makes the same keep/drop decision — on any cluster
  * layout, at any scale, and reproducibly for the DuckDB oracle. Pure
  * per-row expressions: map-only, no shuffle, no driver state.
  */
object Sampling {

  /** Uniform [0, 1) value derived from md5(id) — the per-row coin flip. */
  def hashUnit(idCol: Column): Column =
    Dedup.h32(idCol.cast("string")) / lit(4294967296.0)

  /** Keep each row with probability `rate`, deterministically by id. */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.where(hashUnit(col(idCol)) < rate)

  /** Stratified sampling: per-stratum keep rates (e.g. downsample the
    * dominant language, keep all of the rare ones). Strata missing from
    * `rates` fall back to `defaultRate`. One pass, no shuffle — the
    * standard class-rebalancing step before training. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.where(hashUnit(col(idCol)) < rate)
  }

  /** Efraimidis–Spirakis A-Res weighted sampling without replacement:
    * each row draws u ∈ (0,1] from its id hash (the +1 keeps ln defined)
    * and scores ln(u)/weight — a monotone transform of the classic
    * u^(1/weight) reservoir key — and the k largest scores win. Executes
    * as TakeOrderedAndProject: per-partition top-k heaps, only k rows per
    * partition reach the driver-side merge, no global sort at any scale.
    * Hash-derived u keeps the draw reproducible across retries and
    * cluster layouts (a `rand()` key would re-roll per attempt). */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
                   k: Int): DataFrame = {
    val u = (Dedup.h32(col(idCol).cast("string")) + 1) / lit(4294967296.0)
    df.withColumn("_skey", log(u) / col(weightCol))
      .orderBy(col("_skey").desc, col(idCol))
      .limit(k)
      .drop("_skey")
  }
}
