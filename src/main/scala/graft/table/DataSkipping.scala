package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions._

/** File-level data skipping for [[ManagedTable]] — the engine's analogue of
  * Delta Lake's per-file statistics + DataSkippingReader (the reference
  * relies on Delta for this; we rebuild it over plain parquet).
  *
  * Two pieces:
  *
  *  1. '''Stats collection''' ([[fileStats]]): one distributed aggregation
  *     over a data dir grouped by `input_file_name()` producing, per file,
  *     the row count and `min/max/null-count` of every atomic column (the
  *     first [[MaxStatsColumns]], mirroring Delta's
  *     `dataSkippingNumIndexedCols`). Cost is one column-pruned pass over
  *     the newly written files — the same cost model as Delta, which
  *     computes stats inline during the write. Partition columns read
  *     through `basePath` are constant per file, so their min = max =
  *     value: partition pruning falls out of the same mechanism for free.
  *
  *  2. '''Predicate rewrite''' ([[mightMatchSql]]): a data predicate is
  *     rewritten into a "file might contain a matching row" predicate over
  *     the stats columns (`c = v` → `min_c <= v AND max_c >= v`, etc. —
  *     Delta's DataSkippingReader shape). The rewritten predicate is then
  *     evaluated '''by Spark itself''' as a filter on the stats DataFrame,
  *     so literal/column type coercion is exactly the engine's own — no
  *     hand-rolled comparison semantics to get subtly wrong. Unsupported
  *     sub-predicates conservatively rewrite to `true` (never skip).
  *
  * Why this matters at 100 TB: Spark's parquet reader already does
  * row-group skipping from footers, but only AFTER listing and opening
  * every file. With millions of files, planning-time pruning from a small
  * stats table (one row per file) is the difference between touching every
  * object and touching only the files a predicate can match — stats rows
  * are ~1e-6 of the data they describe, and the stats filter itself runs
  * distributed.
  *
  * Null semantics note: an all-null column in a file stores null min/max;
  * any comparison over them evaluates to null and the `WHERE` drops the
  * file — correct, since no non-null value can match a comparison. Null
  * hunting predicates (`IS NULL`) use the null-count column instead.
  */
object DataSkipping {

  /** Stats are collected for the first N atomic columns (Delta's
    * `dataSkippingNumIndexedCols` default). A 2000-column table would
    * otherwise pay 6000 aggregates per file for stats nobody filters on. */
  val MaxStatsColumns = 32

  val PathCol = "__path"
  val RowsCol = "__rows"
  def minCol(c: String) = s"min_$c"
  def maxCol(c: String) = s"max_$c"
  def nullsCol(c: String) = s"nulls_$c"

  private def atomic(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: StructType | _: ArrayType | _: MapType | _: BinaryType |
           _: NullType | _: VariantType => false
      case _ => true
    }
  }

  /** Per-file stats for one data dir: `__path` (raw `input_file_name`
    * URI), `__rows`, and min/max/null-count per eligible column. `cols`
    * restricts the stat columns (empty = first [[MaxStatsColumns]] atomic
    * columns). Runs as ONE distributed aggregation; only the per-file
    * stat rows come back when the caller collects. */
  def fileStats(spark: SparkSession, dir: String, basePath: Option[String],
                cols: Seq[String] = Nil): DataFrame = {
    val df = basePath.fold(spark.read)(b => spark.read.option("basePath", b)).parquet(dir)
    val eligible = df.schema.fields.filter(f => atomic(f.dataType))
    val picked =
      if (cols.nonEmpty) eligible.filter(f => cols.exists(_.equalsIgnoreCase(f.name)))
      else eligible.take(MaxStatsColumns)
    val aggs = count(lit(1)).as(RowsCol) +: picked.toSeq.flatMap { f =>
      Seq(min(col(f.name)).as(minCol(f.name)),
          max(col(f.name)).as(maxCol(f.name)),
          (count(lit(1)) - count(col(f.name))).as(nullsCol(f.name)))
    }
    // project the file name first: nondeterministic expressions may not
    // appear directly in a grouping expression
    df.withColumn(PathCol, input_file_name())
      .groupBy(PathCol).agg(aggs.head, aggs.tail: _*)
  }

  /** Rewrite `condition` (raw SQL over the data columns) into SQL over a
    * stats table. `statCols` maps lower-cased data-column name → actual
    * name for columns that have stats; anything else rewrites to `true`. */
  def mightMatchSql(spark: SparkSession, condition: String,
                    statCols: Map[String, String]): String = {
    def statOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        statCols.get(a.nameParts.head.toLowerCase)
      case _ => None
    }
    def lited(e: Expression): Option[String] = e match {
      case l: Literal => Some(l.sql)
      case _ => None
    }
    // range tests; comparisons against an all-null file's null min/max
    // yield null, which WHERE treats as "skip the file" — see class doc
    def cmp(a: Expression, b: Expression,
            fwd: (String, String) => String,
            rev: (String, String) => String): String =
      (statOf(a), lited(b), statOf(b), lited(a)) match {
        case (Some(c), Some(v), _, _) => fwd(c, v)
        case (_, _, Some(c), Some(v)) => rev(c, v)
        case _ => "true"
      }
    def go(e: Expression): String = e match {
      case And(l, r) => s"(${go(l)} AND ${go(r)})"
      case Or(l, r)  => s"(${go(l)} OR ${go(r)})"
      case Not(IsNull(a)) => go(IsNotNull(a))
      case Not(IsNotNull(a)) => go(IsNull(a))
      case EqualTo(a, b) => cmp(a, b,
        (c, v) => s"(`${minCol(c)}` <= $v AND `${maxCol(c)}` >= $v)",
        (c, v) => s"(`${minCol(c)}` <= $v AND `${maxCol(c)}` >= $v)")
      case EqualNullSafe(a, b) => (statOf(a), lited(b), statOf(b), lited(a)) match {
        // BOTH literal orders: `NULL <=> c` falling through to the
        // EqualTo rewrite would emit min <= NULL (always null) and
        // wrongly prune every stats-covered file
        case (Some(c), Some(v), _, _) if v == "NULL" => s"`${nullsCol(c)}` > 0"
        case (_, _, Some(c), Some(v)) if v == "NULL" => s"`${nullsCol(c)}` > 0"
        case _ => go(EqualTo(a, b))
      }
      case LessThan(a, b) => cmp(a, b,
        (c, v) => s"`${minCol(c)}` < $v",  // some row < v  ⇔  min < v
        (c, v) => s"`${maxCol(c)}` > $v")  // v < some row  ⇔  max > v
      case LessThanOrEqual(a, b) => cmp(a, b,
        (c, v) => s"`${minCol(c)}` <= $v",
        (c, v) => s"`${maxCol(c)}` >= $v")
      case GreaterThan(a, b) => cmp(a, b,
        (c, v) => s"`${maxCol(c)}` > $v",
        (c, v) => s"`${minCol(c)}` < $v")
      case GreaterThanOrEqual(a, b) => cmp(a, b,
        (c, v) => s"`${maxCol(c)}` >= $v",
        (c, v) => s"`${minCol(c)}` <= $v")
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        statOf(a) match {
          case Some(c) => vs.map(v => go(EqualTo(a, v))).mkString("(", " OR ", ")")
          case None => "true"
        }
      case IsNull(a) => statOf(a) match {
        case Some(c) => s"`${nullsCol(c)}` > 0"
        case None => "true"
      }
      case IsNotNull(a) => statOf(a) match {
        case Some(c) => s"`$RowsCol` > `${nullsCol(c)}`"
        case None => "true"
      }
      case StartsWith(a, b) => (statOf(a), lited(b)) match {
        // rows in [prefix, prefix + maxChar): min <= upper bound is
        // approximated by the substring test on both bound columns
        case (Some(c), Some(v)) =>
          s"(substring(`${minCol(c)}`, 1, length($v)) <= $v AND " +
            s"substring(`${maxCol(c)}`, 1, length($v)) >= $v)"
        case _ => "true"
      }
      case _ => "true"
    }
    go(spark.sessionState.sqlParser.parseExpression(condition))
  }

  // ------------------------------------------------------- bloom skipping
  // Min/max stats cannot prune point lookups on high-cardinality columns
  // that aren't clustered (a doc_id equality hits every file's [min,max]
  // range once files interleave ids). Per-file BLOOM FILTERS prune those:
  // Delta's bloom filter index, rebuilt over plain parquet. Collection is
  // one distributed pass using Spark's own BloomFilterAggregate (the
  // runtime-filter aggregate — sketch-native, codegen-fed); pruning
  // deserializes ONE filter per file per predicate, distributed over the
  // stats rows, and only surviving paths reach the driver.

  def bloomCol(c: String) = s"bloom_$c"

  /** Per-file bloom filters for `cols` of one data dir: `__path` + one
    * serialized `BloomFilter` binary per column, hashed via
    * `xxhash64(col)`. `itemsPerFile`/`fpp` size the filter (1M items at
    * 1% fpp ≈ 1.2 MB per file per column). */
  def fileBlooms(spark: SparkSession, dir: String, basePath: Option[String],
                 cols: Seq[String], itemsPerFile: Long,
                 fpp: Double): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val df = basePath.fold(spark.read)(b => spark.read.option("basePath", b)).parquet(dir)
    val picked = df.schema.fields.filter(f =>
      atomic(f.dataType) && cols.exists(_.equalsIgnoreCase(f.name)))
    require(picked.nonEmpty, s"no bloom-eligible columns among $cols in $dir")
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(itemsPerFile, fpp)
    val aggs = picked.toSeq.map { f =>
      GraftShim.bloomAgg(col(f.name), itemsPerFile, bits).as(bloomCol(f.name))
    }
    df.withColumn(PathCol, input_file_name())
      .groupBy(PathCol).agg(aggs.head, aggs.tail: _*)
  }

  /** xxhash64 of `l` cast to the bloomed column's type `dt` — MUST match
    * the hash fed to [[fileBlooms]]'s aggregate (`id = 5` parses an INT
    * literal but a LongType column hashed longs; hashing the raw literal
    * would never match). Catalyst-evaluated, so coercion is Spark's own. */
  private def hashLiteral(l: Literal, dt: org.apache.spark.sql.types.DataType): Option[Long] =
    try {
      val cast = Cast(l, dt, Option("UTC"))
      if (cast.eval(null) == null) None // un-castable literal → no pruning
      else Some(new XxHash64(Seq(cast)).eval(null).asInstanceOf[Long])
    } catch { case _: Exception => None }

  /** Bloom file-pruning predicate over a blooms DataFrame for `condition`:
    * keeps a file unless some top-level equality/IN conjunct on a bloomed
    * column proves it can't match. Non-equality conjuncts (and anything
    * under OR/NOT) conservatively keep — range pruning is min/max stats'
    * job. A null bloom cell (file added after collection) keeps. */
  def bloomKeep(spark: SparkSession, condition: String,
                bloomed: Map[String, org.apache.spark.sql.types.DataType]): Option[org.apache.spark.sql.Column] = {
    val might = udf { (bloom: Array[Byte], hashes: Seq[Long]) =>
      bloom == null || {
        val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(bloom)
        hashes.exists(bf.mightContainLong)
      }
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        Some(a.nameParts.head.toLowerCase)
      case _ => None
    }
    val tests = conjuncts(
      spark.sessionState.sqlParser.parseExpression(condition)).flatMap {
      case EqualTo(a, l: Literal) => attrName(a).map(_ -> Seq(l))
      case EqualTo(l: Literal, a) => attrName(a).map(_ -> Seq(l))
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        attrName(a).map(_ -> vs.map(_.asInstanceOf[Literal]))
      case _ => None
    }.flatMap { case (name, lits) =>
      bloomed.collectFirst { case (c, dt) if c.toLowerCase == name =>
        // a literal that can't hash (un-castable) disables THIS conjunct
        val hashes = lits.map(hashLiteral(_, dt))
        if (hashes.exists(_.isEmpty)) lit(true)
        else might(col(bloomCol(c)), typedLit(hashes.flatten))
      }
    }
    if (tests.isEmpty) None else Some(tests.reduce(_ && _))
  }

  // ------------------------------------------------------ bucket skipping
  // Iceberg-style bucket transform support: the write side stores
  // `pmod(hash(key), n)` as a hidden hive partition, and a point lookup on
  // the key prunes to the matching bucket dirs STRUCTURALLY — no sidecar
  // collection, exact under appends (a new file lands in its key's bucket
  // by construction, where a bloom sidecar goes stale until re-collected).

  /** Bucket id of literal `l` cast to the bucketed column's type `dt` —
    * MUST match the write-side expression `pmod(hash(cast(col)), n)`
    * ([[graft.table.ManagedTable.setBucket]]). Like [[hashLiteral]], the
    * cast+hash is Catalyst-evaluated so `key = 5` against a LongType key
    * hashes the long 5, not the int literal. An un-castable literal
    * yields None (no pruning — the safe direction). */
  def bucketOfLiteral(l: Literal, dt: org.apache.spark.sql.types.DataType,
                      n: Int): Option[Int] =
    try {
      val cast = Cast(l, dt, Option("UTC"))
      if (cast.eval(null) == null) None
      else {
        val h = new Murmur3Hash(Seq(cast)).eval(null).asInstanceOf[Int]
        Some(((h % n) + n) % n)
      }
    } catch { case _: Exception => None }

  /** Buckets a read for `condition` must scan, from top-level equality/IN
    * conjuncts on the bucketed `column` — None when no conjunct constrains
    * the key (or a literal can't hash): read every bucket. Multiple
    * conjuncts on the key intersect (`k = 5 AND k IN (5, 6)` → bucket of
    * 5 only). Anything under OR/NOT conservatively contributes nothing —
    * same shape as [[bloomKeep]]'s conjunct rule. */
  def bucketsFor(spark: SparkSession, condition: String, column: String,
                 dt: org.apache.spark.sql.types.DataType,
                 n: Int): Option[Set[Int]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def onKey(e: Expression): Boolean = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        a.nameParts.head.equalsIgnoreCase(column)
      case _ => false
    }
    val parsed = try {
      spark.sessionState.sqlParser.parseExpression(condition)
    } catch { case _: Exception => return None }
    val perConjunct = conjuncts(parsed).flatMap {
      case EqualTo(a, l: Literal) if onKey(a) => Some(Seq(l))
      case EqualTo(l: Literal, a) if onKey(a) => Some(Seq(l))
      case In(a, vs) if onKey(a) && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Literal]) =>
        Some(vs.map(_.asInstanceOf[Literal]))
      case _ => None
    }.flatMap { lits =>
      val ids = lits.map(bucketOfLiteral(_, dt, n))
      // one un-hashable literal disables THIS conjunct (it might match a
      // bucket we can't compute), not the others
      if (ids.exists(_.isEmpty)) None else Some(ids.flatten.toSet)
    }
    if (perConjunct.isEmpty) None
    else Some(perConjunct.reduce(_ intersect _))
  }

  /** True iff `condition` contains a TOP-LEVEL AND-conjunct equating
    * `source.column` with `updates.column` (either order; `=`, `==` or
    * `<=>`) — the partition-stability evidence bucket-pruned DML needs.
    * Parsed with Catalyst, so backticks, case and whitespace resolve
    * exactly and an equality buried under OR/NOT proves nothing (a match
    * through the other arm could live in an untouched bucket). An
    * unparseable condition proves nothing either. */
  def keyEquiConjunct(spark: SparkSession, condition: String,
                      column: String): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def is(e: Expression, alias: String): Boolean = e match {
      case a: UnresolvedAttribute => a.nameParts.length == 2 &&
        a.nameParts.head.equalsIgnoreCase(alias) &&
        a.nameParts(1).equalsIgnoreCase(column)
      case _ => false
    }
    def keyPair(l: Expression, r: Expression): Boolean =
      (is(l, "source") && is(r, "updates")) ||
        (is(l, "updates") && is(r, "source"))
    try conjuncts(spark.sessionState.sqlParser.parseExpression(condition))
      .exists {
        case EqualTo(l, r) => keyPair(l, r)
        case EqualNullSafe(l, r) => keyPair(l, r)
        case _ => false
      }
    catch { case _: Exception => false }
  }

  /** Canonical filesystem path of a raw `input_file_name()` URI (or any
    * path string) for prefix matching and hand-off to the reader. */
  def canonPath(s: String): String = {
    val u = try new java.net.URI(s) catch { case _: Exception => null }
    if (u != null && u.getPath != null && u.getPath.nonEmpty) u.getPath
    else new Path(s).toUri.getPath
  }
}
