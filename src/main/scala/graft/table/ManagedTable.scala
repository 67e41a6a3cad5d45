package graft.table

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.common.FsUtils

/** Versioned parquet table — the engine's replacement for the reference's
  * Delta tables (reference getl/common/delta_table.py, getl/blocks/write/
  * batch_delta.py; design in SURVEY.md §7.3).
  *
  * Layout: immutable data dirs `<path>/d<N>/` plus manifest log
  * `<path>/_graft_log/<N>.json`, where each manifest lists the data dirs
  * composing that snapshot:
  *
  * {{{ {"version":3,"timestamp":1723400000000,"dirs":["…/d0","…/d3"]} }}}
  *
  * This gives Delta's essential operations at Delta's cost model:
  *   - APPEND writes only the new rows' files and a manifest referencing
  *     old + new dirs — O(new data), NOT O(table); the same holds for the
  *     registries' insert-if-absent merge;
  *   - upsert-merge / UPDATE rewrite into a fresh dir (one declarative
  *     plan — anti-join + union; AQE picks broadcast at runtime when the
  *     update set is small);
  *   - time travel reads any manifest's dir list (SnapshotDiff registry);
  *   - OPTIMIZE compacts the current dir list into one dir (ZORDER ≈
  *     range-partition + sortWithinPartitions for parquet min/max
  *     data-skipping);
  *   - VACUUM deletes manifests past retention and any data dir no
  *     retained manifest references.
  *
  * A multi-dir snapshot reads as a `unionByName(allowMissingColumns)` of
  * per-dir scans — schema drift across appends behaves like the
  * reference's MergeSchema (batch_delta.py:27,40), and each scan keeps its
  * own partition discovery, pruning and pushdown.
  */
final class ManagedTable(spark: SparkSession, val path: String) {

  private def logDir = s"$path/_graft_log"
  private def dataDir(v: Long) = s"$path/d$v"

  private case class Manifest(version: Long, timestamp: Long, dirs: Seq[String])

  private def readManifest(p: String): Option[Manifest] =
    new Path(p).getName.stripSuffix(".json").toLongOption.map { v =>
      val node = new ObjectMapper().readTree(FsUtils.readText(spark, p))
      val dirs = Option(node.get("dirs")).map { arr =>
        (0 until arr.size()).map(arr.get(_).asText())
      }.getOrElse(Nil)
      Manifest(v, Option(node.get("timestamp")).map(_.asLong()).getOrElse(0L), dirs)
    }

  private def manifests(): Seq[Manifest] =
    FsUtils.listFiles(spark, logDir, ".json")
      .flatMap(readManifest)
      .sortBy(_.version)

  /** (version, commitTimestampMillis) pairs, ascending. */
  def history(): Seq[(Long, Long)] = manifests().map(m => (m.version, m.timestamp))

  def exists: Boolean = manifests().nonEmpty

  def currentVersion: Option[Long] = manifests().lastOption.map(_.version)

  /** Latest version committed at or before `tsMillis`, if any. */
  def versionAt(tsMillis: Long): Option[Long] =
    manifests().filter(_.timestamp <= tsMillis).lastOption.map(_.version)

  def read(): DataFrame = manifests().lastOption match {
    case Some(m) => readDirs(m.dirs)
    case None    => spark.emptyDataFrame
  }

  def readVersion(v: Long): DataFrame =
    manifests().find(_.version == v) match {
      case Some(m) => readDirs(m.dirs)
      case None => throw new AnalysisException(
        "TABLE_OR_VIEW_NOT_FOUND", Map("relationName" -> s"$path@v$v"))
    }

  private def readDirs(dirs: Seq[String]): DataFrame = dirs match {
    case Nil => spark.emptyDataFrame
    case ds  => ds.map(spark.read.parquet(_))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Write a full new snapshot into a fresh dir. `partitionBy` columns
    * shape the parquet layout (partition pruning for downstream reads). */
  def write(df: DataFrame, partitionBy: Seq[String] = Nil): Long =
    commitDirs(writeData(df, partitionBy) :: Nil)

  /** Append: write ONLY the new rows; the next manifest references the
    * previous snapshot's dirs plus the new one. */
  def append(df: DataFrame, partitionBy: Seq[String] = Nil): Long = {
    val prev = manifests().lastOption.map(_.dirs).getOrElse(Nil)
    commitDirs(prev :+ writeData(df, partitionBy))
  }

  /** Delta-style merge (reference getl/common/delta_table.py:27-44): target
    * aliased `source`, updates aliased `updates`, raw SQL condition like
    * `source.eventId == updates.eventId`.
    *
    *   - upsert (whenMatchedUpdateAll + whenNotMatchedInsertAll): one
    *     anti-join + union rewritten into a fresh snapshot dir;
    *   - insert-only (registry anti-insert): only the NOT-matching update
    *     rows are appended — O(new data) like append.
    */
  def merge(updates: DataFrame, condition: String, upsert: Boolean = true,
            partitionBy: Seq[String] = Nil): Long = {
    if (!exists) return write(updates, partitionBy)
    val target = read()
    // no explicit broadcast hint on either side: updates batches and the
    // target both grow without bound at scale, and a forced broadcast of
    // the anti-join build side would OOM; AQE converts the exchange to a
    // broadcast at runtime whenever the observed size is actually small
    if (upsert)
      write(
        target.alias("source")
          .join(updates.alias("updates"), expr(condition), "left_anti")
          .unionByName(updates, allowMissingColumns = true),
        partitionBy)
    else
      append(
        updates.alias("updates")
          .join(target.alias("source"), expr(condition), "left_anti"),
        partitionBy)
  }

  /** Change-data-feed analogue (reference load/entrypoint.py:222-229):
    * rows of the current snapshot not present in the last snapshot
    * committed BEFORE `tsMillis` (inclusive start). */
  def changesSince(tsMillis: Long): DataFrame = {
    if (!exists) return spark.emptyDataFrame
    manifests().filter(_.timestamp < tsMillis).lastOption match {
      case None       => read() // no snapshot predates the start → full feed
      case Some(base) => read().except(readDirs(base.dirs))
    }
  }

  /** Delta-style UPDATE … SET on the current snapshot: one projection pass
    * into a fresh snapshot dir. */
  def updateWhere(cond: String, set: Map[String, String]): Long = {
    if (!exists) throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map("relationName" -> path))
    val updated = set.foldLeft(read()) { case (df, (c, valueExpr)) =>
      df.withColumn(c, when(expr(cond), expr(valueExpr)).otherwise(col(c)))
    }
    write(updated)
  }

  /** OPTIMIZE [ZORDER BY cols]: compact the current snapshot's dir list
    * into ONE dir; a z-order request approximates to range-partition +
    * sortWithinPartitions on those columns — same data-skipping effect for
    * parquet min/max stats (reference batch_delta.py:116-134). */
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

  /** VACUUM RETAIN n HOURS: drop manifests older than the horizon (always
    * keeping the current one) and delete data dirs no retained manifest
    * references (reference batch_delta.py:136-155, incl. the <168h guard
    * unless explicitly overridden). */
  def vacuum(retainHours: Double, enforceRetention: Boolean = true): Unit = {
    if (enforceRetention && retainHours < 168)
      throw new IllegalArgumentException(
        s"retentionDurationCheck: refusing VACUUM RETAIN $retainHours HOURS (<168); " +
          "pass enforceRetention=false to override")
    val horizon = System.currentTimeMillis() - (retainHours * 3600 * 1000).toLong
    val all = manifests()
    val current = all.lastOption.map(_.version).toSet
    val (dropped, retained) = all.partition(m =>
      m.timestamp < horizon && !current.contains(m.version))
    val referenced = retained.flatMap(_.dirs).toSet
    val orphanDirs = dropped.flatMap(_.dirs).distinct.filterNot(referenced)
    FsUtils.deleteFiles(spark,
      orphanDirs ++ dropped.map(m => s"$logDir/${m.version}.json"))
  }

  /** Register in the session catalog (reference common/hive_table.py:20-38).
    * Our snapshots move per-version, so the stable equivalent is a catalog
    * view over the current snapshot, refreshed on each write. */
  def registerAs(databaseName: String, tableName: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $databaseName")
    val selects = manifests().lastOption.map(_.dirs).getOrElse(Nil) match {
      case Nil => Seq(s"SELECT * FROM parquet.`$path`")
      case ds  => ds.map(d => s"SELECT * FROM parquet.`$d`")
    }
    spark.sql(
      s"CREATE OR REPLACE VIEW $databaseName.$tableName AS ${selects.mkString(" UNION ALL ")}")
  }

  private def writeData(df: DataFrame, partitionBy: Seq[String]): String = {
    val v = currentVersion.map(_ + 1).getOrElse(0L)
    val dir = dataDir(v)
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dir)
    dir
  }

  private def commitDirs(dirs: Seq[String]): Long = {
    val v = currentVersion.map(_ + 1).getOrElse(0L)
    val dirsJson = dirs.map(d => "\"" + d + "\"").mkString("[", ",", "]")
    // atomic rename commit: a manifest either exists completely or not at
    // all, so a crash mid-write can never corrupt the table's log
    FsUtils.writeTextAtomic(spark, s"$logDir/$v.json",
      s"""{"version":$v,"timestamp":${System.currentTimeMillis()},"dirs":$dirsJson}""")
    v
  }
}

object ManagedTable {
  def apply(spark: SparkSession, path: String): ManagedTable =
    new ManagedTable(spark, path)
}
