package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** True multi-column Z-order (Morton curve) clustering for
  * [[ManagedTable.optimize]] — the analogue of Delta's `OPTIMIZE ZORDER BY`
  * for more than one column.
  *
  * Why not lexicographic range partitioning: `repartitionByRange(a, b)`
  * clusters files tightly on `a`, but within any `a`-range the `b` values
  * span the whole domain — per-file min/max stats on `b` are useless and
  * [[DataSkipping]] can only prune on the leading column. Interleaving the
  * bits of per-column ranks gives every indexed column locality
  * proportional to its bit share, so range predicates on ANY of the
  * z-ordered columns skip files.
  *
  * Rank function: equi-width bucketing of each column into 2^bits cells
  * between its observed min and max (`width_bucket` — codegen'd). Delta
  * uses equi-depth ranks from a range-partitioner sample; equi-width is
  * deterministic and needs only one tiny min/max aggregate, at the cost of
  * skew sensitivity on heavily non-uniform columns (documented trade —
  * the skipping stats stay correct either way, pruning just gets weaker).
  * The min/max collect is 2 scalars per column — bounded driver metadata.
  */
object ZOrder {

  /** Bit-interleaved Z-order key over `cols`. Bits per column is capped so
    * the interleaved key fits a positive long. Null ranks as 0 (sorts
    * first, like NULLS FIRST). Numeric, date and timestamp columns rank by
    * their double view; anything else ranks by its 32-bit hash (groups
    * equal values, no range locality — same degradation Delta has for
    * unorderable types). */
  def zOrderKey(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zOrderKey needs at least one column")
    val n = cols.length
    val b = math.min(bits, 62 / n)
    val cells = 1L << b

    def doubleView(c: String): Column = {
      import org.apache.spark.sql.types._
      df.schema(df.schema.fieldIndex(c)).dataType match {
        case _: NumericType => col(c).cast("double")
        case DateType => col(c).cast("int").cast("double")
        case TimestampType => col(c).cast("long").cast("double")
        case TimestampNTZType => // NTZ has no direct long cast
          col(c).cast("timestamp").cast("long").cast("double")
        case _ => (hash(col(c)).cast("long") + 2147483648L).cast("double")
      }
    }

    // one tiny aggregate: (min, max) per column, embedded as literals
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(doubleView(c)).as(s"mn$i"), max(doubleView(c)).as(s"mx$i"))
    }
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()

    val ranks = cols.zipWithIndex.map { case (c, i) =>
      // an all-null column (or an empty snapshot) aggregates to null
      // bounds — rank the whole column 0 instead of crashing OPTIMIZE
      // (nulls already rank 0, so this is the degenerate single-cell case)
      if (bounds.isNullAt(2 * i) || bounds.isNullAt(2 * i + 1)) lit(0L)
      else {
      val mn = bounds.getDouble(2 * i)
      val mx = bounds.getDouble(2 * i + 1)
      if (mx == mn) lit(0L)
      else coalesce(
        least(width_bucket(doubleView(c), lit(mn), lit(mx), lit(cells)), lit(cells)) - 1L,
        lit(0L))
      }
    }
    // interleave: output bit j*n+i takes bit j of column i's rank
    (0 until b).flatMap { j =>
      ranks.zipWithIndex.map { case (r, i) =>
        shiftleft(shiftright(r, j).bitwiseAND(lit(1L)), j * n + i)
      }
    }.reduce(_ + _)
  }
}
