package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join: for every left row, attach the payload
  * of the right row with the greatest timestamp not after (or strictly
  * before, when `strict`) the left row's timestamp, within the same key.
  *
  * Implementation is the union-merge shape, not a range join: both sides
  * are tagged and unioned, then a single `last(_, ignoreNulls)` running
  * window ordered by (ts, side) carries the latest right payload forward
  * onto left rows. One shuffle on the key, no per-pair candidate blowup —
  * the per-key work is a sort, which is exactly what a dedicated as-of
  * merge does. This survives 100x scale because cost is
  * O(shuffle(left+right) + sortWithinKey), independent of how many right
  * rows precede each left row.
  *
  * Skew note: one hot key serializes into one task; at cluster scale,
  * salt the key and replicate right rows per salt before calling.
  */
object AsofJoin {

  /** @param leftTs    timestamp column name on `left`
    * @param rightTs   timestamp column name on `right`
    * @param payload   right columns to carry onto left rows, as
    *                  (rightColumn -> outputName)
    * @param strict    true → match right.ts <  left.ts (previous-event
    *                  join; with `forward`, right.ts > left.ts);
    *                  false → allow equal timestamps (standard as-of)
    * @param forward   false → nearest right row at-or-before left.ts
    *                  (backward, the default); true → nearest right row
    *                  at-or-after left.ts (the pandas `merge_asof
    *                  direction='forward'` shape)
    * @param tolerance maximum allowed |left.ts − right.ts| for a match,
    *                  as something addable to the ts column — an interval
    *                  (`expr("INTERVAL 90 DAYS")`) for timestamps, a
    *                  `lit(n)` for numeric ts. The nearest candidate
    *                  beyond it yields a null payload (all farther ones
    *                  are worse by construction).
    *
    * Right rows should be unique per (key, rightTs) — pre-aggregate
    * otherwise, or the carried payload among equal timestamps is the last
    * in an engine-chosen order.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               payload: Map[String, String], strict: Boolean = false,
               forward: Boolean = false,
               tolerance: Option[Column] = None): DataFrame = {
    // at equal ts the running window must include right rows for the
    // non-strict bound and exclude them for the strict one, so right rows
    // sort before left rows iff non-strict — in BOTH directions, because
    // the secondary __ord sort stays ascending under the reversed ts sort
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)
    val paySorted = payload.toSeq.sortBy(_._1)

    // equi-join semantics: a null key matches nothing. The window below
    // partitions nulls TOGETHER, so null-key right rows must be dropped
    // here or null-key left rows would pick up their payloads.
    val rightTagged = right
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTs).as("__ts"), lit(rightOrd).as("__ord"),
          struct(col(rightTs).as("__rts") +:
            paySorted.map { case (src, dst) => col(src).as(dst) }: _*).as("__pay")): _*)
      .withColumn("__lrow", lit(null).cast(
        org.apache.spark.sql.types.StructType(left.schema.fields)))

    val leftTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(leftOrd).as("__ord"),
        lit(null).cast(rightTagged.schema("__pay").dataType).as("__pay"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)

    // forward = the same merge walked from the other end: descending ts
    // makes "last right seen so far" the nearest right at-or-after
    val tsOrd = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrd, col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val inTol = tolerance.map { t =>
      if (forward) col("__match.__rts") <= col("__ts") + t
      else col("__match.__rts") >= col("__ts") - t
    }.getOrElse(lit(true))

    val outCols =
      left.columns.map(c => col(s"__lrow.$c").as(c)) ++
        paySorted.map { case (_, dst) =>
          when(inTol, col(s"__match.$dst")).as(dst) }

    rightTagged.unionByName(leftTagged)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__lrow").isNotNull)
      .select(outCols: _*)
  }

  /** Nearest-in-either-direction as-of join (the pandas
    * `merge_asof(direction='nearest')` shape): each left row takes the
    * right row minimizing |left.ts − right.ts| within the key; equal
    * distances break BACKWARD (the at-or-before candidate wins).
    *
    * Both timestamp columns must be NUMERIC (convert dates with
    * `unix_date` first) so the distance compare is exact integer
    * arithmetic — bit-deterministic cross-engine.
    *
    * Same union-merge scale shape as [[asofJoin]], walked from both ends:
    * ONE exchange on the key feeds two running windows (ascending
    * carries the latest prior right row, descending the earliest later
    * one) and the winner is a per-row compare — no candidate pair
    * blowup, cost O(shuffle + two per-key sorts) regardless of density.
    *
    * @param strict true → exclude equal-timestamp right rows from BOTH
    *               directions (nearest OTHER event). */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTs: String, rightTs: String,
                  payload: Map[String, String],
                  strict: Boolean = false): DataFrame = {
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)
    val paySorted = payload.toSeq.sortBy(_._1)

    val rightTagged = right
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTs).as("__ts"), lit(rightOrd).as("__ord"),
          struct(col(rightTs).as("__rts") +:
            paySorted.map { case (src, dst) => col(src).as(dst) }: _*).as("__pay")): _*)
      .withColumn("__lrow", lit(null).cast(
        org.apache.spark.sql.types.StructType(left.schema.fields)))

    val leftTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(leftOrd).as("__ord"),
        lit(null).cast(rightTagged.schema("__pay").dataType).as("__pay"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)

    // the (rightOrd, leftOrd) assignment keeps equal-ts right rows on the
    // correct side of left rows in BOTH sort directions: ascending for the
    // backward walk, descending for the forward one — so one exchange
    // serves both windows (Spark re-sorts within the same partitioning)
    val wB = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").desc, col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val merged = rightTagged.unionByName(leftTagged)
      .withColumn("__prev", last(col("__pay"), ignoreNulls = true).over(wB))
      .withColumn("__next", last(col("__pay"), ignoreNulls = true).over(wF))
      .where(col("__lrow").isNotNull)

    val dPrev = col("__ts") - col("__prev.__rts")
    val dNext = col("__next.__rts") - col("__ts")
    val pickPrev = col("__next").isNull ||
      (col("__prev").isNotNull && dPrev <= dNext)

    val outCols =
      left.columns.map(c => col(s"__lrow.$c").as(c)) ++
        paySorted.map { case (_, dst) =>
          when(pickPrev, col(s"__prev.$dst"))
            .otherwise(col(s"__next.$dst")).as(dst) }
    merged.select(outCols: _*)
  }
}
