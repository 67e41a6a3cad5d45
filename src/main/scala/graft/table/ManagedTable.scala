package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.common.FsUtils

/** Versioned parquet table — the engine's replacement for the reference's
  * Delta tables (reference getl/common/delta_table.py, getl/blocks/write/
  * batch_delta.py; design in SURVEY.md §7.3).
  *
  * Layout: `<path>/v=N/` immutable snapshot dirs + `<path>/_graft_log/N.json`
  * manifests carrying the commit timestamp. This gives us:
  *   - upsert-merge (`whenMatchedUpdateAll` / `whenNotMatchedInsertAll`)
  *   - insert-if-absent (the registries' anti-insert)
  *   - time travel by timestamp (SnapshotDiff registry)
  *   - OPTIMIZE (compaction rewrite) and VACUUM (old-snapshot GC)
  *
  * Scale notes: every operation is a single declarative Spark plan over the
  * current snapshot — merges are one shuffle-join (or broadcast join when the
  * update set is small, which is the common incremental-ingest case and is
  * hinted automatically below); commit is an O(1) driver-side manifest write.
  * No driver-side row iteration anywhere.
  */
final class ManagedTable(spark: SparkSession, val path: String) {

  private def logDir = s"$path/_graft_log"
  private def versionDir(v: Long) = s"$path/v=$v"

  /** (version, commitTimestampMillis) pairs, ascending. */
  def history(): Seq[(Long, Long)] =
    FsUtils.listFiles(spark, logDir, ".json").flatMap { p =>
      val name = new Path(p).getName.stripSuffix(".json")
      name.toLongOption.map { v =>
        val ts = FsUtils.readText(spark, p).trim
        // manifest body: {"version":N,"timestamp":millis}
        val m = "\"timestamp\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(ts)
        v -> m.map(_.group(1).toLong).getOrElse(0L)
      }
    }.sortBy(_._1)

  def exists: Boolean = history().nonEmpty

  def currentVersion: Option[Long] = history().lastOption.map(_._1)

  /** Latest version committed at or before `tsMillis`, if any. */
  def versionAt(tsMillis: Long): Option[Long] =
    history().filter(_._2 <= tsMillis).lastOption.map(_._1)

  def read(): DataFrame = currentVersion match {
    case Some(v) => readVersion(v)
    case None    => spark.emptyDataFrame
  }

  def readVersion(v: Long): DataFrame = spark.read.parquet(versionDir(v))

  /** Write a new snapshot. `partitionBy` columns apply to the parquet layout
    * (partition pruning for downstream readers). */
  def write(df: DataFrame, partitionBy: Seq[String] = Nil): Long = {
    val v = currentVersion.map(_ + 1).getOrElse(0L)
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(versionDir(v))
    commit(v)
    v
  }

  /** Append = current ∪ new rows → next snapshot (positional union would be
    * fragile across schema drift, so unionByName with missing-column fill —
    * matching the reference's MergeSchema behavior, batch_delta.py:27,40). */
  def append(df: DataFrame, partitionBy: Seq[String] = Nil): Long =
    if (!exists) write(df, partitionBy)
    else write(read().unionByName(df, allowMissingColumns = true), partitionBy)

  /** Delta-style merge (reference getl/common/delta_table.py:27-44): target
    * aliased `source`, updates aliased `updates`, raw SQL condition like
    * `source.eventId == updates.eventId`.
    *
    *   - whenMatchedUpdateAll + whenNotMatchedInsertAll (upsert=true):
    *     rows of target NOT matching any update survive; all updates enter.
    *   - insert-only (upsert=false): target survives; only non-matching
    *     updates enter (registry anti-insert, fileregistry_utils.py:14-32).
    *
    * Both compile to ONE anti-join + union — the update set in incremental
    * ingest is small, so it is broadcast-hinted for a shuffle-free plan.
    */
  def merge(updates: DataFrame, condition: String, upsert: Boolean = true,
            partitionBy: Seq[String] = Nil): Long = {
    if (!exists) return write(updates, partitionBy)
    val target = read()
    val merged =
      if (upsert)
        target.alias("source")
          .join(broadcast(updates.alias("updates")), expr(condition), "left_anti")
          .unionByName(updates, allowMissingColumns = true)
      else
        target.unionByName(
          updates.alias("updates")
            .join(broadcast(target.alias("source")), expr(condition), "left_anti"),
          allowMissingColumns = true)
    write(merged, partitionBy)
  }

  /** Change-data-feed analogue (reference load/entrypoint.py:222-229 reads
    * the Databricks CDF from a starting timestamp): rows of the current
    * snapshot that were not present in the last snapshot committed BEFORE
    * `tsMillis` — set-difference over full rows, the row-level change set
    * our versioned-parquet layer can answer without a commit log of
    * per-row operations. Inclusive start: a version committed exactly at
    * `tsMillis` counts as changed. */
  def changesSince(tsMillis: Long): DataFrame = {
    if (!exists) return spark.emptyDataFrame
    history().filter(_._2 < tsMillis).lastOption.map(_._1) match {
      case None       => read() // no snapshot predates the start → full feed
      case Some(base) => read().except(readVersion(base))
    }
  }

  /** Delta-style UPDATE … SET on the current snapshot: one projection pass,
    * no shuffle (reference delta_table.py update via registries). */
  def updateWhere(cond: String, set: Map[String, String]): Long = {
    if (!exists) throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map("relationName" -> path))
    val cur = read()
    val updated = set.foldLeft(cur) { case (df, (c, valueExpr)) =>
      df.withColumn(c, when(expr(cond), expr(valueExpr)).otherwise(col(c)))
    }
    write(updated)
  }

  /** OPTIMIZE [ZORDER BY cols]: rewrite the current snapshot compacted; a
    * z-order request approximates to range-partition + sortWithinPartitions
    * on those columns — same data-skipping effect for parquet min/max stats
    * (reference batch_delta.py:116-134). */
  def optimize(zorderBy: Seq[String] = Nil, targetPartitions: Int = 0): Long = {
    if (!exists) throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map("relationName" -> path))
    val cur = read()
    val n = if (targetPartitions > 0) targetPartitions
            else math.max(1, spark.sparkContext.defaultParallelism / 2)
    val compacted =
      if (zorderBy.nonEmpty)
        cur.repartitionByRange(n, zorderBy.map(col): _*)
          .sortWithinPartitions(zorderBy.map(col): _*)
      else cur.repartition(n)
    write(compacted)
  }

  /** VACUUM RETAIN n HOURS: delete snapshots older than the horizon, always
    * keeping the current one (reference batch_delta.py:136-155, incl. the
    * <168h guard unless explicitly overridden). */
  def vacuum(retainHours: Double, enforceRetention: Boolean = true): Unit = {
    if (enforceRetention && retainHours < 168)
      throw new IllegalArgumentException(
        s"retentionDurationCheck: refusing VACUUM RETAIN $retainHours HOURS (<168); " +
          "pass enforceRetention=false to override")
    val horizon = System.currentTimeMillis() - (retainHours * 3600 * 1000).toLong
    val hist = history()
    val keep = hist.lastOption.map(_._1).toSet
    hist.filter { case (v, ts) => ts < horizon && !keep.contains(v) }
      .foreach { case (v, _) =>
        FsUtils.deleteFiles(spark, Seq(versionDir(v), s"$logDir/$v.json"))
      }
  }

  /** Register in the session catalog (reference common/hive_table.py:20-38
    * `CREATE DATABASE/TABLE IF NOT EXISTS … USING DELTA LOCATION`). Our
    * snapshots move per-version, so the stable equivalent is a catalog view
    * over the current snapshot, refreshed on each write. */
  def registerAs(databaseName: String, tableName: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $databaseName")
    val loc = currentVersion.map(versionDir).getOrElse(path)
    spark.sql(
      s"CREATE OR REPLACE VIEW $databaseName.$tableName AS SELECT * FROM parquet.`$loc`")
  }

  private def commit(v: Long): Unit =
    FsUtils.writeText(spark, s"$logDir/$v.json",
      s"""{"version":$v,"timestamp":${System.currentTimeMillis()}}""")
}

object ManagedTable {
  def apply(spark: SparkSession, path: String): ManagedTable =
    new ManagedTable(spark, path)
}
