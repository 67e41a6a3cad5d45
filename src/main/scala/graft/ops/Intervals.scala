package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-set analysis: union length ("coverage") of inclusive
  * [start, end] intervals per key — the temporal-completeness audit a
  * pipeline runs over crawl windows, sensor uptime, or shipment spans.
  *
  * Shape: classic gaps-and-islands. Every window below partitions by the
  * key, so the per-key work is one sort inside one exchange — the same
  * single-shuffle discipline as the batch sessionization query; no
  * self-join, no interval pair blowup. Bounds are NUMERIC (callers
  * convert dates via `unix_date` — integer arithmetic keeps the result
  * bit-deterministic cross-engine).
  */
object Intervals {

  /** Keyed interval OVERLAP join: all (a, b) pairs under the same key
    * whose inclusive [start, end] intervals intersect, with the overlap
    * length — the alignment step between two interval families (e.g.
    * activity sessions of two event types, crawl windows vs outage
    * windows).
    *
    * Shape: an equi-join on the key columns with the overlap predicate as
    * a residual filter — ONE keyed shuffle, never a cross join; output
    * per key is bounded by that key's interval counts (callers control
    * key granularity). Bounds are numeric; overlap = min(ends) −
    * max(starts) is exact integer arithmetic for integer bounds.
    *
    * Convention note: the PAIR predicate is inclusive (intervals touching
    * at exactly one point match), but `overlap` is the half-open length —
    * a point-touch pair appears with overlap 0. Callers wanting inclusive
    * point COUNTS (the [[coverage]] convention, end - start + 1) should
    * read `overlap + 1` for matched pairs; filtering `overlap > 0` drops
    * point-touch pairs by design. */
  def overlapJoin(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                  aStart: String, aEnd: String,
                  bStart: String, bEnd: String): DataFrame =
    a.join(b, keyCols)
      .where(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .withColumn("overlap",
        least(col(aEnd), col(bEnd)) - greatest(col(aStart), col(bStart)))

  /** Per-key interval union stats.
    *
    * An interval starts a new island when its start exceeds the running
    * max end of all earlier intervals (ordered by (start, end) — ties are
    * interchangeable projections, so island assignment is order-stable).
    * Inclusive-bound semantics: only true overlap (start <= prevMax)
    * merges; adjacency (start = prevMax + 1) stays two islands, so
    * covered = Σ_islands (maxEnd − minStart + 1) counts each grid point
    * at most once — islands are disjoint by construction.
    *
    * @return one row per key: n_intervals, n_islands, covered (points in
    *         the union), span (max end − min start + 1), coverage_ratio
    *         (covered / span, the gap-freeness score). */
  def coverage(df: DataFrame, keyCols: Seq[String],
               startCol: String, endCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val ordered = Window.partitionBy(keys: _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = ordered.rowsBetween(Window.unboundedPreceding, -1)
    val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = df.select(keys :+ col(startCol) :+ col(endCol): _*)
      .withColumn("__pmax", max(col(endCol)).over(prevMax))
      .withColumn("__new",
        (col("__pmax").isNull || col(startCol) > col("__pmax")).cast("int"))
      .withColumn("__isl", sum(col("__new")).over(running))
    val islands = flagged
      .groupBy(keys :+ col("__isl"): _*)
      .agg(min(col(startCol)).as("__s"), max(col(endCol)).as("__e"),
        count(lit(1)).as("__n"))
    islands.groupBy(keys: _*)
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__e") - col("__s") + 1).as("covered"),
        (max(col("__e")) - min(col("__s")) + 1).as("span"))
      .withColumn("coverage_ratio", col("covered") / col("span"))
  }
}
