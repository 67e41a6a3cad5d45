package graft.transform

import scala.util.Try

import org.apache.spark.sql.{AnalysisException, Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{DateType, StringType}

/** The reference's transform-operator vocabulary as pure
  * `DataFrame => DataFrame` functions (reference:
  * getl/blocks/transform/transform.py and add_column/date.py).
  *
  * Each function is declarative — it only composes Catalyst expressions, so
  * projection collapsing, predicate pushdown, and whole-stage codegen apply
  * unchanged at any scale.
  */
object Transforms {

  /** One column spec of `select` (transform.py:16-37, 388-432). */
  final case class SelectCol(
      col: String,
      addNewColumn: Boolean = false,
      alias: Option[String] = None,
      cast: Option[String] = None,
      defaultValue: Option[String] = None)

  /** Projection with per-column alias/cast/add-missing semantics
    * (transform.py:16-37, 388-432): a column absent from the frame is an
    * error unless `addNewColumn`, in which case it is backfilled with
    * `lit(null)` (or an empty `array<string>` when `defaultValue` is
    * `"array()"`); `alias` materializes the column under the new name;
    * `cast` of a nested path without an alias is an error.
    */
  def select(df: DataFrame, cols: Seq[SelectCol]): DataFrame = {
    var cur = df
    val names = cols.map { sc =>
      var name = sc.col
      if (!sc.addNewColumn) validateColumnExists(cur, name)
      if (!columnPresent(cur, name)) {
        cur =
          if (sc.defaultValue.contains("array()"))
            cur.withColumn(name, F.array().cast("array<string>"))
          else cur.withColumn(name, F.lit(null))
      }
      sc.alias.foreach { a =>
        cur = cur.withColumn(a, F.col(name)); name = a
      }
      sc.cast.foreach { t =>
        if (name.contains("."))
          throw new IllegalArgumentException(
            s"Can not cast nested column $name please use the alias parameter also.")
        cur = castColumn(cur, name, t)
      }
      name
    }
    cur.select(names.map(F.col): _*)
  }

  /** Explode an array column into rows; in place when `newCol` is empty
    * (transform.py:40-48). */
  def explode(df: DataFrame, col: String, newCol: Option[String] = None): DataFrame =
    df.withColumn(newCol.getOrElse(col), F.explode(F.col(col)))

  /** Rename, validating the source exists (transform.py:51-59). */
  def renameColumn(df: DataFrame, col: String, newName: String): DataFrame = {
    validateColumnExists(df, col)
    df.withColumnRenamed(col, newName)
  }

  /** Substring into a new column; `pos` is 1-based as in SQL
    * (transform.py:62-74). */
  def substring(df: DataFrame, col: String, newCol: String, pos: Int, length: Int): DataFrame = {
    validateColumnExists(df, col)
    df.withColumn(newCol, F.substring(F.col(col), pos, length))
  }

  /** Split string → array column on a regex (transform.py:77-100). */
  def split(df: DataFrame, col: String, newCol: String, splitOn: String): DataFrame = {
    validateColumnExists(df, col)
    df.withColumn(newCol, F.split(F.col(col), splitOn))
  }

  /** Array/map element extraction (transform.py:103-126). */
  def getItem(df: DataFrame, col: String, newCol: String, index: Any): DataFrame = {
    validateColumnExists(df, col)
    df.withColumn(newCol, F.col(col).getItem(index))
  }

  /** JSON-string field extraction; path auto-prefixed `$.`
    * (transform.py:129-154). */
  def getJsonObject(df: DataFrame, col: String, newCol: String, path: String): DataFrame = {
    validateColumnExists(df, col)
    df.withColumn(newCol, F.get_json_object(F.col(col), "$." + path))
  }

  /** In-place cast using a SQL type name (transform.py:157-165). */
  def castColumn(df: DataFrame, col: String, newType: String): DataFrame = {
    validateColumnExists(df, col)
    df.withColumn(col, F.col(col).cast(newType))
  }

  /** USING-style equi-join on a column list (transform.py:168-175).
    * Catalyst picks the physical join; callers wanting a broadcast wrap the
    * right side in `org.apache.spark.sql.functions.broadcast`. */
  def join(left: DataFrame, right: DataFrame, cols: Seq[String], joinType: String = "left"): DataFrame =
    left.join(right, cols, joinType)

  /** Positional union (`UNION ALL` by position, not name) — the reference
    * uses `DataFrame.union` here but `unionByName` for XML batches
    * (transform.py:178-187 vs load/entrypoint.py:190). */
  def union(left: DataFrame, right: DataFrame): DataFrame =
    try left.union(right)
    catch {
      case e: AnalysisException => throw new IllegalArgumentException(e.getMessage)
    }

  /** Filter keeping rows that satisfy the predicate (transform.py:190-218). */
  def where(df: DataFrame, predicate: Predicate): DataFrame =
    try df.where(PredicateDsl.toSql(predicate))
    catch {
      case e: AnalysisException => throw new IllegalArgumentException(e.getMessage)
    }

  def where(df: DataFrame, predicate: Any): DataFrame =
    where(df, Predicate.fromAny(predicate))

  /** Inverse filter with the reference's set-difference semantics
    * (transform.py:221-223): `df EXCEPT (df WHERE pred)` — deduplicates and
    * treats null-predicate rows differently from `!pred`; preserved because
    * it is observable behavior. */
  def filterDataframe(df: DataFrame, predicate: Predicate): DataFrame =
    df.except(where(df, predicate))

  /** Null-propagating string concat of N columns interleaved with a literal
    * delimiter (transform.py:226-245). Uses `concat` (null if any input is
    * null), NOT `concat_ws` — a deliberate reference behavior. */
  def concat(df: DataFrame, fromColumns: Seq[String], toColumn: String, delimiter: String = "_"): DataFrame = {
    val casted = fromColumns.map(c => F.col(c).cast(StringType))
    val interleaved: Seq[Column] =
      casted.flatMap(c => Seq(c, F.lit(delimiter))).dropRight(1)
    df.withColumn(toColumn, F.concat(interleaved: _*))
  }

  /** Dedup; subset mode reproduces the reference's `concat_ws("-", cols)`
    * temp-key trick (transform.py:248-262), so `["ab","c"]` collides with
    * `["a","bc"]` and nulls collapse (concat_ws skips nulls). At scale this
    * is a single hash-aggregate shuffle on the temp key. */
  def dropDuplicates(df: DataFrame, columns: Seq[String] = Nil): DataFrame =
    if (columns.nonEmpty) {
      // the reference hardcodes a helper column literally named "temp"
      // (transform.py:258) and crashes on inputs that already carry one;
      // a collision-proof name preserves the concat_ws semantics exactly
      // while surviving such inputs (the column is dropped either way)
      val key = "__graft_dedup_temp"
      df.select(F.concat_ws("-", columns.map(F.col): _*).as(key), F.col("*"))
        .dropDuplicates(key)
        .drop(key)
    } else df.dropDuplicates()

  // --- add_column.date.* (reference: add_column/date.py) ---

  /** Unix seconds → formatted string; the odd `sss` pattern is preserved
    * from the reference (add_column/date.py:6-16) and requires
    * `spark.sql.legacy.timeParserPolicy=LEGACY` exactly as the reference's
    * test session sets (tests/conftest.py:59). */
  def unixtimeToUtcz(df: DataFrame, fromColumn: String, toColumn: String): DataFrame =
    df.withColumn(toColumn, F.from_unixtime(F.col(fromColumn), "yyyy-MM-dd'T'HH:mm:sssZ"))

  /** Year as StringType (add_column/date.py:19-29). */
  def yearCol(df: DataFrame, fromColumn: String, toColumn: String): DataFrame =
    df.withColumn(toColumn, F.year(F.col(fromColumn)).cast(StringType))

  /** Month as StringType (add_column/date.py:32-41). */
  def monthCol(df: DataFrame, fromColumn: String, toColumn: String): DataFrame =
    df.withColumn(toColumn, F.month(F.col(fromColumn)).cast(StringType))

  /** Day-of-month as StringType (add_column/date.py:44-52). */
  def dayofmonthCol(df: DataFrame, fromColumn: String, toColumn: String): DataFrame =
    df.withColumn(toColumn, F.dayofmonth(F.col(fromColumn)).cast(StringType))

  /** Cast to DateType (add_column/date.py:55-61). */
  def dateCol(df: DataFrame, fromColumn: String, toColumn: String): DataFrame =
    df.withColumn(toColumn, F.col(fromColumn).cast(DateType))

  // --- helpers ---

  private[transform] def columnPresent(df: DataFrame, col: String): Boolean =
    Try(df(col)).isSuccess

  private[transform] def validateColumnExists(df: DataFrame, col: String): Unit =
    if (!columnPresent(df, col))
      throw new IllegalArgumentException(
        s"Column '$col' is not present in the dataframes columns: ${df.columns.mkString("[", ", ", "]")}")
}
