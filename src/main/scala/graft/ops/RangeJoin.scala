package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment join without an equi key, made shuffle-joinable by
  * time bucketing: every interval is exploded to the fixed-width buckets it
  * overlaps, every point maps to its single bucket, and the join becomes an
  * equi-join on bucket id refined by the exact containment predicate.
  *
  * Each (interval, point) pair can only meet in the point's own bucket, so
  * the output needs no dedup. Candidate volume is
  * |points| x (overlapping intervals per bucket) — bounded by choosing the
  * bucket width near the typical interval length, instead of the
  * BroadcastNestedLoopJoin a raw `BETWEEN` join plans to, which is a cross
  * product at 100 TB. Long intervals fan out to more buckets (rows, not
  * memory); pathological spans should be split upstream.
  */
object RangeJoin {

  private def dayBucket(ts: Column, widthDays: Int): Column =
    floor(unix_timestamp(ts) / (widthDays * 86400L))

  /** Pairs (interval, point) with `start <= point < end`, returned as all
    * interval columns plus `payload` point columns. Timestamps bucketed in
    * `widthDays`-day cells.
    */
  def intervalJoin(intervals: DataFrame, startCol: String, endCol: String,
                   points: DataFrame, ptCol: String,
                   payload: Seq[String], widthDays: Int = 7): DataFrame = {
    require(widthDays >= 1, s"widthDays must be positive, got $widthDays")
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        dayBucket(col(startCol), widthDays),
        // end is exclusive: an interval ending exactly on a bucket edge
        // never produces a point in that bucket
        dayBucket(col(endCol) - expr("INTERVAL 1 MICROSECOND"), widthDays))))
    val pt = points.select(
      (payload.map(col) :+ col(ptCol).as("__pt")
        :+ dayBucket(col(ptCol), widthDays).as("__bucket")): _*)
    iv.join(pt, Seq("__bucket"))
      .where(col("__pt") >= col(startCol) && col("__pt") < col(endCol))
      .drop("__bucket", "__pt")
  }
}
