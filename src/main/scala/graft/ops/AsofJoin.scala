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
}
