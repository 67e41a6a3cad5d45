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
}
