package graft.table

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{AnalysisException, Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.common.FsUtils

/** Versioned parquet table — the engine's replacement for the reference's
  * Delta tables (reference getl/common/delta_table.py, getl/blocks/write/
  * batch_delta.py; design in SURVEY.md §7.3).
  *
  * Layout: immutable data dirs `<path>/d<N>/` plus manifest log
  * `<path>/_graft_log/<N>.json`. The log is DELTA-ENCODED (round 11):
  * every [[ManagedTable.checkpointInterval]]-th commit (and v0) is a
  * FULL self-contained manifest listing the data dirs composing that
  * snapshot,
  *
  * {{{ {"version":3,"timestamp":1723400000000,"dirs":["…/d0","…/d3"]} }}}
  *
  * while the commits between write ACTION manifests — the entry/dv
  * add/remove deltas against the parent —
  *
  * {{{ {"version":4,"timestamp":…,"parent":3,"add":["…/d4-ab12"]} }}}
  *
  * so an append's commit metadata is O(changed dirs), not O(snapshot
  * dirs) (a year of micro-batch appends would otherwise write O(dirs²)
  * cumulative manifest bytes), and snapshot resolution replays at most
  * interval-1 deltas onto the nearest full manifest. VACUUM repairs the
  * chain before reaping: a retained delta whose parent drops gains a
  * `<N>.checkpoint.json` full shadow first. Old (pre-round-11, all-full)
  * logs read unchanged.
  *
  * An entry may also be an object `{"dir":"…/d0/p=a","base":"…/d0"}`
  * referencing ONE hive partition subdir of an earlier data dir — written
  * by partition-pruned merges; `base` is passed as the scan's `basePath`
  * so the partition column survives the subdir read.
  *
  * This gives Delta's essential operations at Delta's cost model:
  *   - APPEND writes only the new rows' files and a manifest referencing
  *     old + new dirs — O(new data), NOT O(table); the same holds for the
  *     registries' insert-if-absent merge;
  *   - upsert-merge / UPDATE rewrite into a fresh dir (one declarative
  *     plan — anti-join + union; AQE picks broadcast at runtime when the
  *     update set is small); when the table is partitioned, the merge
  *     rewrites ONLY partitions containing update keys and carries
  *     untouched partition dirs by manifest reference — O(touched
  *     partitions), Delta's file-pruned merge cost model;
  *   - time travel reads any manifest's dir list (SnapshotDiff registry);
  *   - OPTIMIZE compacts the current dir list into one dir (ZORDER ≈
  *     range-partition + sortWithinPartitions for parquet min/max
  *     data-skipping);
  *   - VACUUM deletes manifests past retention and any data dir no
  *     retained manifest references (containment-aware: a dir with a
  *     referenced subdir — or inside a referenced dir — is never deleted).
  *
  * A multi-dir snapshot reads as a `unionByName(allowMissingColumns)` of
  * per-dir scans — schema drift across appends behaves like the
  * reference's MergeSchema (batch_delta.py:27,40), and each scan keeps its
  * own partition discovery, pruning and pushdown.
  */
final class ManagedTable(spark: SparkSession, val path: String) {

  private def logDir = s"$path/_graft_log"
  private def dataDir(v: Long) = s"$path/d$v"

  import ManagedTable.{DeltaRecord, Entry, Manifest}

  /** Parse one log file's JSON body. Two formats share the log
    * (round-11 delta-encoded log, VERDICT r10 #1):
    *
    *   - FULL (a checkpoint): carries `"dirs"` — the complete snapshot,
    *     self-contained exactly like every pre-round-11 manifest (old
    *     logs read unchanged);
    *   - DELTA (an action manifest): carries `"parent"` plus the
    *     add/remove ACTIONS against the parent snapshot — O(changed
    *     dirs) bytes per commit, the cost model an append-heavy 100 TB
    *     table needs (a full dir list per micro-batch commit is O(dirs²)
    *     cumulative metadata writes over a year).
    *
    * Every [[ManagedTable.checkpointInterval]]-th commit is written FULL,
    * so resolution replays at most interval-1 deltas onto the nearest
    * checkpoint — head reads stay O(1) log I/O in the cadence sense. */
  private def parseLog(v: Long, text: String): Either[DeltaRecord, Manifest] = {
    val node = new ObjectMapper().readTree(text)
    def entries(field: String): Seq[Entry] = Option(node.get(field)).map { arr =>
      (0 until arr.size()).map { i =>
        val e = arr.get(i)
        if (e.isTextual) Entry(e.asText(), None)
        else Entry(e.get("dir").asText(),
          Option(e.get("base")).map(_.asText()))
      }
    }.getOrElse(Nil)
    def strings(field: String): Seq[String] = Option(node.get(field)).map { arr =>
      (0 until arr.size()).map(arr.get(_).asText())
    }.getOrElse(Nil)
    // present-vs-absent matters for a delta's renames: an absent key
    // inherits the parent's mapping, a present (even empty) key SETS it
    val renames = Option(node.get("renames")).map { arr =>
      (0 until arr.size()).map { i =>
        val r = arr.get(i)
        (r.get("from").asText(), r.get("to").asText())
      }
    }
    val txn = Option(node.get("txn")).map { t =>
      val it = t.properties().iterator()
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asLong() }
      b.result()
    }.getOrElse(Map.empty[String, Long])
    val ts = Option(node.get("timestamp")).map(_.asLong()).getOrElse(0L)
    val op = Option(node.get("op")).map(_.asText()).getOrElse("")
    if (node.has("parent"))
      Left(DeltaRecord(v, ts, entries("add"), entries("remove"),
        strings("dvAdd"), strings("dvRemove"), renames, txn, op))
    else
      Right(Manifest(v, ts, entries("dirs"), strings("dv"),
        renames.getOrElse(Nil), txn, op))
  }

  /** The log file for version `v`, parsed — preferring a vacuum-written
    * `<v>.checkpoint.json` (always full/self-contained) over the commit
    * file itself, so a delta whose parents vacuum reaped stays readable. */
  private def logFileAt(v: Long): Option[Either[DeltaRecord, Manifest]] = {
    val cp = s"$logDir/$v.checkpoint.json"
    val p =
      if (FsUtils.exists(spark, cp)) cp
      else {
        val q = s"$logDir/$v.json"
        if (FsUtils.exists(spark, q)) q else return None
      }
    Some(parseLog(v, FsUtils.readText(spark, p)))
  }

  /** Fold one action delta onto its parent's materialized snapshot.
    * Entry/dv order is reconstruction-exact: the committer verified
    * `parent minus removed plus added == intended` before writing the
    * delta (and fell back to a full manifest otherwise), so replay
    * reproduces the snapshot byte-for-byte, not merely set-equal. txn
    * markers stay CUMULATIVE across the fold ([[lastTxn]]'s O(head)
    * property); renames inherit unless the delta set them. */
  private def applyDelta(parent: Manifest, d: DeltaRecord): Manifest = {
    val removed = d.remove.toSet
    val dvRemoved = d.dvRemove.toSet
    Manifest(d.version, d.timestamp,
      parent.entries.filterNot(removed) ++ d.add,
      parent.dvs.filterNot(dvRemoved) ++ d.dvAdd,
      d.renames.getOrElse(parent.renames),
      parent.txn ++ d.txn, d.op)
  }

  /** Every manifest, MATERIALIZED, ascending — O(versions) reads (one
    * forward fold, each file read once). Only the ops that truly need
    * timestamps or the whole history (history, time travel by timestamp,
    * change feeds, vacuum) pay this; the hot paths go through
    * [[versionsOnDisk]]/[[lastManifest]] instead. */
  private def manifests(): Seq[Manifest] = {
    val out = Seq.newBuilder[Manifest]
    var prev: Option[Manifest] = None
    versionsOnDisk().foreach { v =>
      val m: Option[Manifest] = logFileAt(v) match {
        case Some(Right(full)) => Some(full)
        case Some(Left(d)) => prev match {
          case Some(p) if p.version == d.version - 1 => Some(applyDelta(p, d))
          // non-contiguous log (a listed-then-reaped race) — chain-walk
          case _ => manifestAt(v)
        }
        case None => None // file raced away between listing and read
      }
      m.foreach { mm => out += mm; prev = Some(mm) }
    }
    out.result()
  }

  /** Committed version numbers, ascending — one metadata LISTING, no
    * manifest file is read (versions are the file names). O(versions)
    * directory entries: only the cold paths below (history, timestamp
    * time travel, vacuum, hint-miss fallback) may call this. */
  private def versionsOnDisk(): Seq[Long] =
    FsUtils.listFiles(spark, logDir, ".json")
      .flatMap(p => new Path(p).getName.stripSuffix(".json").toLongOption)
      .sorted

  /** Materialize snapshot `v`: read its log file; when it is a delta,
    * walk BACK to the nearest self-contained manifest (a checkpoint-
    * cadence full commit or a vacuum-written `.checkpoint.json`) and
    * fold forward — at most [[ManagedTable.checkpointInterval]]-1 reads.
    * A broken chain (parents reaped by a vacuum that failed before
    * checkpointing, or hand-deleted log files) fails LOUDLY naming the
    * vacuum horizon rather than returning a partial snapshot.
    * `private[table]` for spec access to materialized snapshots.
    *
    * LIVE-VACUUM race: a concurrent vacuum reaps a retained delta's
    * parents only AFTER writing the boundary version's self-contained
    * `.checkpoint.json` shadow (repair-before-reap). But this walk can
    * interleave — read the boundary's DELTA file before the shadow
    * landed, then hit the parent after it was reaped. One re-resolution
    * from scratch is exact recovery: the second pass prefers the shadow
    * ([[logFileAt]]) and never reaches the reaped parents. Only a chain
    * still broken on the clean second pass is REAL breakage (a vacuum
    * that crashed mid-repair, or a hand-edited log) — that one throws. */
  private[table] def manifestAt(v: Long): Option[Manifest] =
    try manifestAtOnce(v)
    catch { case _: IllegalStateException => manifestAtOnce(v) }

  private def manifestAtOnce(v: Long): Option[Manifest] =
    logFileAt(v) match {
      case None => None
      case Some(Right(m)) => Some(m)
      case Some(Left(d0)) =>
        var deltas: List[DeltaRecord] = d0 :: Nil
        var pv = v - 1
        var base: Option[Manifest] = None
        while (base.isEmpty) {
          ManagedTable.chainWalkHook.get()(pv) // fault-injection seam (specs)
          logFileAt(pv) match {
            case Some(Right(m))  => base = Some(m)
            case Some(Left(d)) => deltas = d :: deltas; pv -= 1
            case None => throw new IllegalStateException(
              s"snapshot v$v of $path is not reconstructable: its delta " +
                s"manifest chain is broken at v$pv — the chain was removed " +
                "by VACUUM past the retention horizon (or the log was " +
                "hand-edited); time travel is bounded by vacuum retention")
          }
        }
        Some(deltas.foldLeft(base.get)(applyDelta))
    }

  // ---------------------------------------------------- version resolution
  // Delta's `_last_checkpoint` analogue: every successful commit refreshes
  // a one-line hint file naming its version, and current-version
  // resolution probes FORWARD from the hint (does v+1.json exist?) instead
  // of LISTING the whole log directory. A year-long streaming ingest
  // committing per micro-batch accumulates 10^5-10^6 manifests; an
  // object-store LIST at that count is a real per-query planning tax,
  // while the hint path costs O(1) reads + O(commits-since-hint)
  // existence probes — commits are consecutive integers under the OCC
  // put-if-absent rule, so the first missing version IS the boundary.
  // The hint is best-effort and self-healing: torn/missing/stale hints
  // (crashed writer, out-of-order hint races, an ancient hint whose
  // manifest vacuum reaped) fall back to the full listing; a hint that
  // merely LAGS (a racer's hint write landing late) is healed by the
  // forward probe. Correctness never depends on the hint's content.
  private def hintPath = s"$logDir/_last_checkpoint"

  private def writeVersionHint(v: Long): Unit =
    try FsUtils.writeTextAtomic(spark, hintPath, s"""{"version":$v}""")
    catch { case _: Exception => () } // a lost hint only costs the fallback

  private def readVersionHint(): Option[Long] =
    try {
      if (!FsUtils.exists(spark, hintPath)) None
      else Option(new ObjectMapper()
        .readTree(FsUtils.readText(spark, hintPath)).get("version"))
        .map(_.asLong())
    } catch { case _: Exception => None }

  /** The current snapshot's manifest: on the hint path, O(1) log reads
    * plus at most [[ManagedTable.checkpointInterval]]-1 delta replays —
    * constant in table size and commit count. */
  private def lastManifest(): Option[Manifest] =
    currentVersion.flatMap(manifestAt)

  /** (version, commitTimestampMillis) pairs, ascending. */
  def history(): Seq[(Long, Long)] = manifests().map(m => (m.version, m.timestamp))

  /** `DESCRIBE HISTORY` analogue: one row per commit with the operation
    * name the writer stamped ([[withCommitRetry]]'s op context) and the
    * snapshot's entry/DV/rename/txn footprint. O(versions) manifest reads
    * — a cold observability path, like [[history]]. Pre-op manifests
    * (older log versions) surface an empty operation string. */
  def describeHistory(): DataFrame = {
    import spark.implicits._
    manifests().map { m =>
      (m.version, new java.sql.Timestamp(m.timestamp), m.op,
        m.entries.size.toLong, m.dvs.size.toLong, m.renames.size.toLong,
        m.txn.size.toLong)
    }.toDF("version", "timestamp", "operation",
      "num_entries", "num_dvs", "num_renames", "num_txn")
  }

  def exists: Boolean = currentVersion.nonEmpty

  def currentVersion: Option[Long] =
    readVersionHint() match {
      case Some(h) if FsUtils.exists(spark, s"$logDir/$h.json") =>
        var v = h
        while (FsUtils.exists(spark, s"$logDir/${v + 1}.json")) v += 1
        Some(v)
      case _ => versionsOnDisk().lastOption
    }

  /** Latest version committed at or before `tsMillis`, if any. */
  def versionAt(tsMillis: Long): Option[Long] =
    manifests().filter(_.timestamp <= tsMillis).lastOption.map(_.version)

  def read(): DataFrame = lastManifest() match {
    case Some(m) => readSnapshot(m)
    case None    => spark.emptyDataFrame
  }

  def readVersion(v: Long): DataFrame = readSnapshot(resolveVersion(v))

  /** Snapshot `v` materialized, or a LOUD, cause-naming failure — never a
    * partial/empty frame. A version whose manifest is gone while NEWER
    * versions exist was reaped by VACUUM (manifests only ever leave the
    * log through it), so the error names the vacuum horizon and the
    * earliest version still readable; a version beyond the head is a
    * plain not-found. Broken delta chains fail inside [[manifestAt]]
    * with their own vacuum-naming error. */
  private def resolveVersion(v: Long): Manifest =
    manifestAt(v).getOrElse {
      val onDisk = versionsOnDisk()
      if (onDisk.lastOption.exists(v < _) && v >= 0)
        throw new IllegalStateException(
          s"version $v of $path is no longer available: its manifest was " +
            "removed by VACUUM (older than the retention horizon at the " +
            "time); earliest retained version is " +
            s"${onDisk.headOption.getOrElse(-1L)}")
      else throw new AnalysisException(
        "TABLE_OR_VIEW_NOT_FOUND", Map("relationName" -> s"$path@v$v"))
    }

  /** Apply the manifest's ORDERED logical renames to one per-dir scan:
    * each (from, to) renames only when the dir's schema still carries the
    * old physical name (dirs written after the rename already have the
    * new one), so rename chains and mixed-age snapshots resolve
    * per-dir with zero data movement. */
  private def applyRenames(df: DataFrame,
                           renames: Seq[(String, String)]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      d.schema.fields.find(_.name.equalsIgnoreCase(from)) match {
        case Some(f) if !d.schema.fieldNames.exists(_.equalsIgnoreCase(to)) =>
          d.withColumnRenamed(f.name, to)
        case _ => d
      }
    }

  /** Exclude drop-tombstoned columns from a logical read. Catalyst's
    * column pruning pushes the exclusion into the parquet scans, so
    * dropped bytes are never read. */
  private def dropTombstones(df: DataFrame): DataFrame = {
    val ts = df.schema.fieldNames.filter(_.startsWith(ManagedTable.DroppedPrefix))
    if (ts.isEmpty) df else df.drop(ts.toIndexedSeq: _*)
  }

  private def readEntries(entries: Seq[Entry],
                          renames: Seq[(String, String)] = Nil): DataFrame =
    entries match {
      case Nil => spark.emptyDataFrame
      case es => dropTombstones(es.map { e =>
        applyRenames(
          e.base.fold(spark.read)(b => spark.read.option("basePath", b))
            .parquet(e.dir),
          renames)
      }.reduce(_.unionByName(_, allowMissingColumns = true)))
    }

  // ------------------------------------------------------- deletion vectors
  // Delta-style deletion vectors: a manifest may carry `dv` dirs of
  // (__dv_file, __dv_pos) rows marking deleted positions inside otherwise
  // untouched data files. Row-level DML then costs O(matched rows) — ONE
  // sidecar write, ZERO data-file rewrites — and reads subtract the
  // vectors with a (file, row_index) anti-join. The DV side holds only
  // not-yet-compacted deletions, so AQE turns the anti-join into a
  // broadcast at any realistic deletion rate; OPTIMIZE / any full rewrite
  // materializes the vectors and clears them.

  private val DvFile = "__dv_file"
  private val DvPos  = "__dv_pos"

  /** Entries scan carrying per-row file provenance (`_metadata.file_path`
    * + `_metadata.row_index`) — the join key deletion vectors address. */
  private def readEntriesWithMeta(entries: Seq[Entry],
                                  renames: Seq[(String, String)] = Nil): DataFrame =
    entries match {
      case Nil => spark.emptyDataFrame
      case es => dropTombstones(es.map { e =>
        applyRenames(
          e.base.fold(spark.read)(b => spark.read.option("basePath", b))
            .parquet(e.dir),
          renames)
          .withColumn(DvFile, col("_metadata.file_path"))
          .withColumn(DvPos, col("_metadata.row_index"))
      }.reduce(_.unionByName(_, allowMissingColumns = true)))
    }

  private def applyDv(withMeta: DataFrame, dvs: Seq[String]): DataFrame =
    withMeta.join(spark.read.parquet(dvs: _*), Seq(DvFile, DvPos), "left_anti")

  /** Snapshot read with `m`'s deletion vectors subtracted (plain
    * [[readEntries]] when there are none — the common path stays a bare
    * parquet scan with no provenance columns in the plan). */
  private def readSnapshot(m: Manifest): DataFrame =
    // the hidden bucket partition ([[setBucket]]) never surfaces in a
    // logical read; rewrites recompute it in writeData, so dropping it
    // here keeps it physically-derived only (drop is a no-op on
    // unbucketed dirs)
    (if (m.dvs.isEmpty) readEntries(m.entries, m.renames)
     else applyDv(readEntriesWithMeta(m.entries, m.renames), m.dvs)
       .drop(DvFile, DvPos))
      .drop(ManagedTable.BucketCol)

  /** Like [[readSnapshot]] but keeps the provenance columns — DML ops use
    * it to derive NEW vectors from matched rows. */
  private def readWithMeta(m: Manifest): DataFrame = {
    val base = readEntriesWithMeta(m.entries, m.renames)
    if (m.dvs.isEmpty) base else applyDv(base, m.dvs)
  }

  // Filtered snapshot reads for the pruned DML paths are built inside
  // [[prunedRewrite]] from ONE shared snapshot relation (filter applied
  // BEFORE the DV anti-join so scan-level pushdown/pruning is unaffected;
  // rewriting a slice from un-vectored data would resurrect deleted rows).

  /** DV sidecars live under `_graft_dv/` — outside the `d*` data-dir
    * namespace, so data-dir globs (streamAppends) and the race-orphan
    * sweep never confuse them with data; vacuum reaps them explicitly. */
  private def writeDvData(matched: DataFrame): String = {
    val v = currentVersion.map(_ + 1).getOrElse(0L)
    val dir = s"$path/_graft_dv/dv$v-${java.util.UUID.randomUUID.toString.take(8)}"
    matched.select(col(DvFile), col(DvPos)).write.mode("overwrite").parquet(dir)
    dir
  }

  /** Deletion-vector set surviving a PARTIAL rewrite (incremental
    * optimize / small-file compaction): rows addressing files under the
    * `rewritten` entries are inert after the rewrite (the rewrite read
    * them DV-subtracted, materializing those deletions), and under
    * incremental-only maintenance they would otherwise accumulate
    * forever — every read's anti-join scanning an ever-growing, mostly
    * dead DV set that vacuum can never reap while retained manifests
    * reference it (round-10 advice). One O(dv rows) sidecar fold per
    * maintenance run keeps the DV set sized by LIVE deletions; the
    * replaced sidecar dirs age out through vacuum's orphan sweep.
    *
    * Kept rows = those under a `carried` entry (anything else — the
    * rewritten slice, or dirs that left the snapshot earlier — is inert
    * by definition). The prefix disjunction is planning-time metadata,
    * so when the carried list is huge (a never-compacted append tail)
    * the fold is skipped and the vectors carry verbatim — correct
    * either way, and such a table's next full optimize clears them. */
  private def foldDvs(cur: Manifest, carried: Seq[Entry]): Seq[String] = {
    if (cur.dvs.isEmpty) return cur.dvs
    if (carried.size > 256) return cur.dvs // bounded planning metadata
    val canon = udf(DataSkipping.canonPath _)
    val c = canon(col(DvFile))
    val live = carried.map(e => DataSkipping.canonPath(e.dir)).distinct
      .map(p => c === p || c.startsWith(p + "/"))
      .reduceOption(_ || _).getOrElse(lit(false))
    val kept = spark.read.parquet(cur.dvs: _*).where(live)
    if (kept.isEmpty) Nil
    else {
      val dir = s"$path/_graft_dv/dv${cur.version + 1}-${
        java.util.UUID.randomUUID.toString.take(8)}"
      kept.write.mode("overwrite").parquet(dir)
      Seq(dir)
    }
  }

  /** Bound the LIVE DV sidecar-dir count per snapshot (Delta's DV-file
    * merge analogue): when a vectorized DML op would push the set past
    * [[ManagedTable.dvCompactThreshold]], merge the whole set into ONE
    * sidecar for the new snapshot. Without this, a table maintained by
    * vectorized DML alone accumulates one sidecar dir per op forever and
    * every read's anti-join scans an ever-longer union (round-11 verdict
    * #4); with it the read side lists O(threshold) dirs at ANY DML
    * count, and the merge reads O(live dv rows) once per threshold ops —
    * amortized O(rows/threshold) per op. Replaced dirs remain on disk
    * for the old snapshots that reference them (time travel intact) and
    * age out through vacuum's dv-orphan sweep, exactly like
    * [[foldDvs]]'s replaced sidecars. */
  private def compactedDvs(dvs: Seq[String]): Seq[String] = {
    if (dvs.size <= ManagedTable.dvCompactThreshold(spark)) return dvs
    val dir = s"$path/_graft_dv/dv${currentVersion.map(_ + 1).getOrElse(0L)}" +
      s"-merge-${java.util.UUID.randomUUID.toString.take(8)}"
    spark.read.parquet(dvs: _*).write.mode("overwrite").parquet(dir)
    Seq(dir)
  }

  /** (dv dir count, deleted-position rows) of the current snapshot — the
    * observability hook specs assert against. */
  def dvInfo(): (Int, Long) = lastManifest() match {
    case Some(m) if m.dvs.nonEmpty =>
      (m.dvs.size, spark.read.parquet(m.dvs: _*).count())
    case _ => (0, 0L)
  }

  /** Row-level DELETE via deletion vectors: O(matched rows), no data-file
    * rewrite — the cost model Delta's DV-enabled `DELETE` has. One scan
    * finds matching positions (file-level data skipping applies: combine
    * with [[collectStats]] and the scan is also planning-pruned), one
    * sidecar write records them; every data dir carries over by reference.
    * Prefer this over [[delete]] for sparse deletes (GDPR erasure of a few
    * keys across a 100 TB table); prefer [[delete]]/[[optimize]] when a
    * large fraction of the table leaves. */
  def deleteVectorized(condition: String): Long = {
    require(exists, s"deleteVectorized on absent table $path")
    withCommitRetry("deleteVectorized") {
      val cur = lastManifest().get
      val matched = readWithMeta(cur).where(expr(condition))
      if (matched.isEmpty)
        commitAgainst(Some(cur.version), cur.entries, cur.dvs)
      else
        commitAgainst(Some(cur.version), cur.entries,
          compactedDvs(cur.dvs :+ writeDvData(matched)))
    }
  }

  /** Row-level UPDATE via deletion vectors: matched rows are vectored OUT
    * of their files and their post-update images appended as a fresh dir —
    * O(matched rows) total, no data-file rewrite (Delta's DV update path).
    * `partitionBy` shapes the appended images so a partitioned table keeps
    * its splittable layout. */
  def updateVectorized(cond: String, set: Map[String, String],
                       partitionBy: Seq[String] = Nil): Long = {
    require(exists, s"updateVectorized on absent table $path")
    withCommitRetry("updateVectorized") {
      val cur = lastManifest().get
      val matched = readWithMeta(cur).where(expr(cond))
      if (matched.isEmpty)
        commitAgainst(Some(cur.version), cur.entries, cur.dvs)
      else {
        val images = set.foldLeft(matched.drop(DvFile, DvPos)) {
          case (d, (c, valueExpr)) => d.withColumn(c, expr(valueExpr))
        }
        validateBatch(images)
        val dvDir = writeDvData(matched)
        commitAgainst(Some(cur.version),
          cur.entries :+ Entry(writeData(images, partitionBy), None),
          compactedDvs(cur.dvs :+ dvDir))
      }
    }
  }

  /** Upsert-merge via deletion vectors: matched target rows (one semi-join
    * against the update batch) are vectored out and the WHOLE batch appends
    * as a fresh dir — O(matched + batch), independent of table size AND of
    * how many partitions the batch touches (beats [[merge]]'s pruned path
    * when a small batch scatters across many partitions). Same contract as
    * [[merge]] upsert: `condition` is `source.<k> = updates.<k>`-style raw
    * SQL; the result is bit-identical to merge's. */
  def mergeVectorized(updates: DataFrame, condition: String,
                      partitionBy: Seq[String] = Nil,
                      txn: Map[String, Long] = Map.empty): Long = {
    validateBatch(updates)
    requireFreshNames(updates, "mergeVectorized")
    withCommitRetry("mergeVectorized") {
      lastManifest() match {
        case None =>
          commitAgainst(None, Seq(Entry(writeData(updates, partitionBy), None)),
            txn = txn)
        case Some(cur) =>
          val matched = readWithMeta(cur).alias("source")
            .join(updates.alias("updates"), expr(condition), "left_semi")
          val dvs = if (matched.isEmpty) cur.dvs
                    else compactedDvs(cur.dvs :+ writeDvData(matched))
          commitAgainst(Some(cur.version),
            cur.entries :+ Entry(writeData(updates, partitionBy), None), dvs,
            txn = txn)
      }
    }
  }

  // ---------------------------------------------------------------- checks
  private def propsPath = s"$logDir/_properties.json"

  /** Table properties: CHECK constraints + schema-enforcement flag +
    * optional bucket spec (column, n). Stored beside the manifest log;
    * read per write (one tiny file — same cost class as the manifest
    * listing). */
  private def readProps(): (Boolean, Map[String, String],
                            Option[ManagedTable.BucketSpec]) = {
    if (!FsUtils.exists(spark, propsPath)) return (false, Map.empty, None)
    val node = new ObjectMapper().readTree(FsUtils.readText(spark, propsPath))
    val checks = Option(node.get("checks")).map { c =>
      val it = c.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      b.result()
    }.getOrElse(Map.empty)
    val bucket = for {
      b <- Option(node.get("bucket"))
      t <- Option(b.get("type")).map(_.asText())
    } yield ManagedTable.BucketSpec(b.get("column").asText(),
      b.get("n").asInt(),
      org.apache.spark.sql.types.DataType.fromDDL(t))
    (Option(node.get("schemaEnforced")).exists(_.asBoolean(false)), checks,
      bucket)
  }

  private def writeProps(enforced: Boolean, checks: Map[String, String],
                         bucket: Option[ManagedTable.BucketSpec]): Unit = {
    val mapper = new ObjectMapper()
    val body = checks.map { case (k, v) =>
      s"${mapper.writeValueAsString(k)}: ${mapper.writeValueAsString(v)}"
    }.mkString("{", ",", "}")
    val bucketJson = bucket.fold("") { s =>
      s""","bucket":{"column":${mapper.writeValueAsString(s.column)},""" +
        s""""n":${s.n},"type":${mapper.writeValueAsString(s.keyType.catalogString)}}"""
    }
    FsUtils.writeTextAtomic(spark, propsPath,
      s"""{"schemaEnforced":$enforced,"checks":$body$bucketJson}""")
  }

  /** Registered CHECK constraints (name → SQL expression). */
  def checks: Map[String, String] = readProps()._2

  // ------------------------------------------------------------- bucketing

  /** The table's bucket transform, if set. */
  def bucketSpec: Option[ManagedTable.BucketSpec] = readProps()._3

  /** Capture the key type from the current snapshot's schema. */
  def setBucket(column: String, n: Int): Unit = {
    require(exists, s"setBucket($column, $n) on absent/empty table $path: " +
      "pass the key type explicitly (setBucket(column, n, keyType))")
    val dt = read().schema.fields.find(_.name.equalsIgnoreCase(column))
      .getOrElse(throw new IllegalArgumentException(
        s"setBucket: no column $column in $path")).dataType
    setBucket(column, n, dt)
  }

  /** CLUSTER the table Iceberg-`bucket(n, column)`-style: every subsequent
    * write adds a hidden `__gbucket = pmod(hash(cast(column AS keyType)),
    * n)` hive partition (innermost, below any explicit `partitionBy`), and
    *
    *   - [[readWhere]] with an equality/IN on the key scans ONLY the
    *     matching bucket dirs — structural point-lookup pruning to 1/n of
    *     the files with no sidecar to collect and no staleness under
    *     appends (new files land in their key's bucket by construction);
    *   - [[merge]]/[[applyChanges]] keyed on the bucketed column rewrite
    *     ONLY the buckets holding batch keys (O(touched buckets), not
    *     O(table)) — the upsert-heavy-ingest cost model Delta needs
    *     partition columns for, without requiring a natural partition key.
    *
    * `keyType` is part of the layout: EVERY side (writes, lookup literals,
    * DML touched-bucket discovery) hashes the key cast to it, so a batch
    * whose key column arrives wider/narrower still buckets identically —
    * without the canonical type, an int-keyed table merged with a
    * long-keyed batch would compute different buckets for the same logical
    * key and silently duplicate rows.
    *
    * The bucket column is internal: every public read drops it, and every
    * rewrite recomputes it from the key column, so it can never drift from
    * the data. Existing dirs keep their layout (reads stay correct,
    * unpruned) until `optimize()`/[[compactSmall]] rewrites them.
    * The spec is a layout constant: re-setting a DIFFERENT (column, n,
    * type) is refused while any current dir still carries the old layout
    * (its stored bucket values would be pruned with the new function —
    * silently wrong reads); the migration recipe is `dropBucket()` →
    * `optimize()` (materializes an unbucketed layout) → `setBucket(new)`. */
  def setBucket(column: String, n: Int,
                keyType: org.apache.spark.sql.types.DataType): Unit = {
    require(n >= 1, s"setBucket: bucket count must be >= 1, got $n")
    require(!column.startsWith("__"),
      s"setBucket: cannot bucket by internal column $column")
    val spec = ManagedTable.BucketSpec(column, n, keyType)
    val (enforced, cks, cur) = readProps()
    if (cur.contains(spec)) return // idempotent re-set
    require(!anyBucketedDirs(),
      s"setBucket on $path: existing dirs carry a previous bucket layout " +
        "whose stored values the new spec would mis-prune; dropBucket() " +
        "then optimize() to materialize an unbucketed layout first")
    writeProps(enforced, cks, Some(spec))
  }

  /** Any current snapshot entry laid out with a bucket partition? (One
    * listing per entry — setBucket is rare DDL.) */
  private def anyBucketedDirs(): Boolean =
    lastManifest().exists(_.entries.exists { e =>
      new Path(e.dir).getName.startsWith(ManagedTable.BucketCol + "=") ||
        FsUtils.listChildren(spark, e.dir)._1
          .exists(_.startsWith(ManagedTable.BucketCol + "="))
    })

  /** Clear the bucket transform: future writes are unbucketed; existing
    * bucketed dirs keep reading correctly (the hidden column is dropped
    * on read regardless, and with no spec no read ever bucket-prunes). */
  def dropBucket(): Unit = {
    val (enforced, cks, _) = readProps()
    writeProps(enforced, cks, None)
  }

  /** Add/replace a CHECK constraint (`ALTER TABLE ADD CONSTRAINT name
    * CHECK (expr)`): every subsequent write/append/merge batch must
    * satisfy `expression` on every row or the operation fails BEFORE
    * committing. The existing snapshot is validated now — a constraint
    * the current data violates is rejected, like Delta. */
  def setCheck(name: String, expression: String): Unit = {
    if (exists) {
      val bad = read().where(!expr(expression)).limit(1).count()
      require(bad == 0,
        s"cannot add CHECK $name: existing rows violate ($expression)")
    }
    val (enforced, cur, bucket) = readProps()
    writeProps(enforced, cur + (name -> expression), bucket)
  }

  def dropCheck(name: String): Unit = {
    val (enforced, cur, bucket) = readProps()
    writeProps(enforced, cur - name, bucket)
  }

  /** Toggle schema enforcement. Off (default) the table behaves like
    * Delta with mergeSchema: drifted batches union by name at read time.
    * On, a batch may only use the table's existing columns with equal
    * types — the Delta default, failing fast at write time instead of
    * poisoning future reads with an incompatible column type. */
  def setSchemaEnforced(on: Boolean): Unit = {
    val (_, cur, bucket) = readProps()
    writeProps(on, cur, bucket)
  }

  /** Write-time validation: CHECK constraints (one scan of the BATCH,
    * never the table) + optional schema enforcement against the current
    * snapshot's schema. */
  private def validateBatch(df: DataFrame): Unit = {
    require(!df.columns.exists(_.equalsIgnoreCase(ManagedTable.BucketCol)),
      s"batch column ${ManagedTable.BucketCol} collides with the reserved " +
        "bucket-transform column")
    val (enforced, cks, _) = readProps()
    if (enforced && exists) {
      val have = read().schema.map(f => f.name.toLowerCase -> f.dataType).toMap
      df.schema.foreach { f =>
        have.get(f.name.toLowerCase) match {
          case None => throw new AnalysisException("FIELD_NOT_FOUND",
            Map("fieldName" -> f.name,
                "fields" -> have.keys.mkString(", ")))
          case Some(t) if t != f.dataType =>
            throw new AnalysisException("CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE",
              Map("left" -> t.sql, "right" -> f.dataType.sql))
          case _ =>
        }
      }
    }
    if (cks.nonEmpty) {
      val violated = cks.find { case (_, e) =>
        df.where(!expr(e) || expr(e).isNull).limit(1).count() > 0
      }
      violated.foreach { case (n, e) =>
        throw new IllegalArgumentException(
          s"CHECK constraint $n ($e) violated by the write batch")
      }
    }
  }

  /** Write a full new snapshot into a fresh dir. `partitionBy` columns
    * shape the parquet layout (partition pruning for downstream reads).
    * `txn` stamps (appId -> version) markers into the commit atomically —
    * see [[lastTxn]]. */
  def write(df: DataFrame, partitionBy: Seq[String] = Nil,
            txn: Map[String, Long] = Map.empty): Long = {
    validateBatch(df)
    // clean_write replaces the table's data AND schema mapping: the batch
    // is the new logical truth, so renames reset (old manifests keep
    // their own renames — time travel is unaffected)
    ManagedTable.currentOp.withValue("write") {
      commitEntries(Entry(writeData(df, partitionBy), None) :: Nil,
        renames = Some(Nil), txn = txn)
    }
  }

  /** The newest (appId -> version) transaction marker committed for
    * `appId`, or None — Delta's `txnVersion` replay guard: a streaming
    * sink stamps its batchId into each commit and skips batches at or
    * below the last stamped one, making at-least-once foreachBatch
    * delivery exactly-once even when the driver dies between the data
    * commit and the checkpoint commit. O(versions) manifest reads,
    * newest-first, stopping at the first hit. */
  def lastTxn(appId: String): Option[Long] =
    // markers carry forward cumulatively since round 9, so the head
    // manifest answers in O(1) — resolved ONCE (an `exists` pre-check
    // would repeat the hint read + forward probes on this per-micro-batch
    // hot path). The full-log walk remains only for markers stranded in
    // pre-carry-forward history (and for genuinely absent appIds — one
    // cold walk before a stream's first commit on a pre-round-9 log).
    lastManifest() match {
      case None => None // absent table: no manifests to walk either
      case Some(head) => head.txn.get(appId)
        .orElse(manifests().reverseIterator
          .flatMap(_.txn.get(appId))
          .nextOption())
    }

  /** Append: write ONLY the new rows; the next manifest references the
    * previous snapshot's dirs plus the new one. The new rows are written
    * once; when the commit loses a race only the MANIFEST is rebased onto
    * the new head (Delta's blind-append fast path — N concurrent appends
    * all land, as N consecutive versions). */
  def append(df: DataFrame, partitionBy: Seq[String] = Nil,
             txn: Map[String, Long] = Map.empty): Long = {
    validateBatch(df)
    requireFreshNames(df, "append")
    val dir = writeData(df, partitionBy)
    withCommitRetry("append") {
      val prev = lastManifest()
      commitAgainst(prev.map(_.version),
        prev.map(_.entries).getOrElse(Nil) :+ Entry(dir, None),
        prev.map(_.dvs).getOrElse(Nil), txn = txn)
    }
  }

  /** ALTER TABLE RENAME COLUMN as a manifest-only commit: zero data
    * movement at any table size. The ordered rename list lives in the
    * manifest and resolves per-dir at read time ([[applyRenames]]), so
    * dirs from before and after the rename coexist; stats/bloom sidecars
    * keyed by the old physical name simply stop pruning for pre-rename
    * files (correctness unaffected — pruning is planning-time only).
    * Renaming a hive PARTITION column is unsupported (the name is baked
    * into directory layout); OPTIMIZE materializes renames into the data
    * files and clears the mapping. */
  def renameColumn(from: String, to: String): Long = {
    require(exists, s"renameColumn on absent table $path")
    withCommitRetry("renameColumn") {
      val cur = lastManifest().get
      val schema = readSnapshot(cur).schema.fieldNames
      require(schema.exists(_.equalsIgnoreCase(from)),
        s"renameColumn: no column '$from' in $path (have ${schema.mkString(", ")})")
      require(!schema.exists(_.equalsIgnoreCase(to)),
        s"renameColumn: column '$to' already exists in $path")
      require(!to.startsWith(ManagedTable.DroppedPrefix),
        s"renameColumn: '$to' collides with the drop-tombstone namespace")
      // the whole `__` prefix is the engine's internal namespace: a rename
      // onto __gbucket would be silently dropped by every read (and a
      // later optimize would destroy the column's data); __dv_file/__dv_pos
      // would collide with deletion-vector provenance. The 'already
      // exists' check can't catch these — internal columns never surface
      // in a logical schema. Mirrors setBucket's reserved-prefix rule.
      require(!to.startsWith("__"),
        s"renameColumn: '$to' is in the reserved internal namespace (__*)")
      requireNotBucketKey(from, "renameColumn")
      commitAgainst(Some(cur.version), cur.entries, cur.dvs,
        Some(cur.renames :+ (from, to)))
    }
  }

  /** Renaming/dropping the bucket-spec key would silently break the
    * feature's cost model: batches no longer carry `spec.column`, so
    * writeData writes unbucketed dirs while the spec stays set — reads
    * remain correct but point-lookup pruning and bucket-pruned DML stop
    * for all new data, and the stale layout blocks a future setBucket.
    * Loud guard, mirroring the partition-column rename restriction. */
  private def requireNotBucketKey(name: String, op: String): Unit =
    bucketSpec.foreach(s => require(!s.column.equalsIgnoreCase(name),
      s"$op on $path: '$name' is the bucket transform's key column " +
        s"(bucket(${s.n}, ${s.column})); dropBucket() first"))

  /** ALTER TABLE DROP COLUMN, manifest-only: a rename into the tombstone
    * namespace reads always exclude — old files keep their bytes (never
    * read again thanks to column pruning) and no dir rewrites. Re-using a
    * dropped name for NEW data requires [[optimize]] first (enforced by
    * [[requireFreshNames]] on incoming batches), exactly because old
    * files still carry the physical column. */
  def dropColumn(name: String): Long = {
    require(exists, s"dropColumn on absent table $path")
    withCommitRetry("dropColumn") {
      val cur = lastManifest().get
      val schema = readSnapshot(cur).schema.fieldNames
      require(schema.exists(_.equalsIgnoreCase(name)),
        s"dropColumn: no column '$name' in $path (have ${schema.mkString(", ")})")
      requireNotBucketKey(name, "dropColumn")
      commitAgainst(Some(cur.version), cur.entries, cur.dvs,
        Some(cur.renames :+
          (name, s"${ManagedTable.DroppedPrefix}v${cur.version + 1}_$name")))
    }
  }

  /** An incoming batch may not re-use a column name that is currently the
    * SOURCE of a rename/drop mapping: the per-dir [[applyRenames]] would
    * re-capture the new column in that dir (the classic no-column-ids
    * hazard — Delta requires column mapping for the same reason). The
    * caller's fix is OPTIMIZE (materializes the mapping, clears it). */
  private def requireFreshNames(df: DataFrame, op: String): Unit =
    lastManifest().map(_.renames).getOrElse(Nil).foreach { case (from, _) =>
      require(!df.schema.fieldNames.exists(_.equalsIgnoreCase(from)),
        s"$op on $path: batch column '$from' matches a renamed/dropped " +
          "column's old name; run optimize() to materialize the column " +
          "mapping before re-using the name")
    }

  /** Delta-style merge (reference getl/common/delta_table.py:27-44): target
    * aliased `source`, updates aliased `updates`, raw SQL condition like
    * `source.eventId == updates.eventId`.
    *
    *   - upsert (whenMatchedUpdateAll + whenNotMatchedInsertAll): one
    *     anti-join + union rewritten into a fresh snapshot dir; when
    *     `partitionBy` is set the rewrite is pruned to partitions that
    *     actually contain update rows ([[prunedMerge]]) — untouched
    *     partition dirs carry over by reference, so a merge costs
    *     O(touched partitions), not O(table);
    *   - insert-only (registry anti-insert): only the NOT-matching update
    *     rows are appended — O(new data) like append.
    */
  def merge(updates: DataFrame, condition: String, upsert: Boolean = true,
            partitionBy: Seq[String] = Nil): Long = withCommitRetry("merge") {
    validateBatch(updates)
    requireFreshNames(updates, "merge")
    lastManifest() match {
      case None =>
        commitAgainst(None, Seq(Entry(writeData(updates, partitionBy), None)))
      case Some(cur) =>
        val pruned = if (upsert && partitionBy.nonEmpty)
          prunedMerge(updates, condition, partitionBy)
        else if (upsert && partitionBy.isEmpty)
          bucketPrunedDml(updates, updates, updates, condition)
        else None
        pruned.getOrElse {
          val target = readSnapshot(cur)
          // no explicit broadcast hint on either side: updates batches and
          // the target both grow without bound at scale, and a forced
          // broadcast of the anti-join build side would OOM; AQE converts
          // the exchange to a broadcast at runtime whenever the observed
          // size is actually small
          if (upsert)
            commitAgainst(Some(cur.version), Seq(Entry(writeData(
              target.alias("source")
                .join(updates.alias("updates"), expr(condition), "left_anti")
                .unionByName(updates, allowMissingColumns = true),
              partitionBy), None)))
          else
            commitAgainst(Some(cur.version), cur.entries :+ Entry(writeData(
              updates.alias("updates")
                .join(target.alias("source"), expr(condition), "left_anti"),
              partitionBy), None), cur.dvs)
        }
    }
  }

  /** Update-set size above which pruning degenerates to a full rewrite
    * anyway (the touched-value list is driver-side metadata, so bound it). */
  val MaxPrunedPartitions = 4096

  /** Partition-pruned upsert on the FIRST partition column: rewrite only
    * top-level partition dirs holding update rows, carry the rest by
    * subdir reference. Returns None when the current snapshot's layout
    * can't be split per-partition (e.g. unpartitioned legacy dirs) or the
    * update touches more than [[MaxPrunedPartitions]] values — callers
    * fall back to the full rewrite.
    *
    * Pruning contract: the join key must be PARTITION-STABLE — an update
    * row only ever matches target rows in its own partition (the usual
    * case: the partition column is part of, or functionally determined
    * by, the merge key). A key that can match across partitions leaves
    * the other partition's old row in place; use the unpartitioned full
    * rewrite for such keys. Same contract as Delta's guidance to put the
    * partition predicate in the merge condition for pruned merges. */
  private def prunedMerge(updates: DataFrame, condition: String,
                          partitionBy: Seq[String]): Option[Long] = {
    if (!updates.columns.contains(partitionBy.head)) return None
    prunedRewrite(lit(false), partitionBy,
      // the rewritten slice: current rows of touched partitions, merged
      // with ALL updates — the anti-join reads only touched partitions
      slice => slice.alias("source")
        .join(updates.alias("updates"), expr(condition), "left_anti")
        .unionByName(updates, allowMissingColumns = true),
      extraTouched = Some(updates.select(col(partitionBy.head))))
  }

  /** Bucket-pruned upsert on an UNPARTITIONED bucketed table
    * ([[setBucket]]): rewrite only the `__gbucket=` dirs whose buckets the
    * update keys hash into, carry the rest by subdir reference — the
    * O(touched buckets) merge cost model, with no natural partition key
    * required. Engages only when the merge condition contains a
    * `source.key =/== updates.key` equality on the bucketed column (the
    * hash is a function of the key, so matches can never cross buckets —
    * the partition-stability contract holds by construction); any other
    * condition shape falls back to the full rewrite. None → caller falls
    * back (no spec, layout not splittable — e.g. pre-bucket dirs — or too
    * many touched buckets). */
  /** Bucket-pruned DML core shared by [[merge]] and [[applyChanges]]:
    * engages only when the spec is set, the condition carries a TOP-LEVEL
    * `source.key = updates.key` AND-conjunct ([[DataSkipping
    * .keyEquiConjunct]] — an equality under OR/NOT proves nothing, a
    * match through the other arm could live in an untouched bucket), and
    * the batch has the key column. Touched buckets = `keys` hashed at the
    * spec's canonical type ([[ManagedTable.BucketSpec.idOf]] — the batch's
    * own column type is irrelevant, so type-drifted batches bucket
    * identically to the layout); the rewritten slice anti-joins
    * `antiFrame` and unions `unionFrame`, exactly the partition-pruned
    * shapes. */
  private def bucketPrunedDml(keys: DataFrame, antiFrame: DataFrame,
                              unionFrame: DataFrame,
                              condition: String): Option[Long] = {
    val spec = bucketSpec.getOrElse(return None)
    if (!DataSkipping.keyEquiConjunct(spark, condition, spec.column))
      return None
    val key = keys.columns.find(_.equalsIgnoreCase(spec.column))
      .getOrElse(return None)
    val bucketed = keys.withColumn(ManagedTable.BucketCol,
      spec.idOf(col(s"`$key`")))
    prunedRewrite(lit(false), Seq(ManagedTable.BucketCol),
      slice => slice.drop(ManagedTable.BucketCol).alias("source")
        .join(antiFrame.alias("updates"), expr(condition), "left_anti")
        .unionByName(unionFrame, allowMissingColumns = true),
      extraTouched = Some(bucketed.select(col(ManagedTable.BucketCol))))
  }

  /** Apply a CDC batch — rows tagged insert/update/delete in `opCol`
    * (values I/U/D, case-insensitive) — in ONE new snapshot version: the
    * Delta `whenMatchedDelete` + `whenMatchedUpdateAll` +
    * `whenNotMatchedInsertAll` composition, i.e. the standard "apply
    * change feed to the mirror table" step. Target rows matching ANY
    * change key leave the snapshot via one anti-join (same single pass
    * whether the change is U or D), then the upsert-image rows (I/U)
    * union in. With `partitionBy` set, the rewrite prunes to partitions
    * named by the batch's keys — same contract as [[merge]]. Within one
    * batch the LAST op per key in `orderCol` order wins (CDC logs are
    * ordered; without the in-batch collapse a U followed by its D would
    * resurrect the row). */
  def applyChanges(changes: DataFrame, condition: String, opCol: String,
                   orderCol: String, partitionBy: Seq[String] = Nil): Long = {
    requireFreshNames(changes, "applyChanges")
    import org.apache.spark.sql.expressions.Window
    // key columns = the `updates.<col>` references in the join condition,
    // extracted as whole identifiers (a substring test would make
    // `updates.id` also claim column `identifier`, corrupting the dedup
    // window; backticked and differently-cased references must match too).
    // A backticked identifier is captured up to its CLOSING backtick —
    // `updates.`order id`` must resolve to "order id", not truncate at
    // the space (which would either fail the require or, worse, silently
    // dedup-partition by a different column named by the prefix)
    val referenced = """updates\.(?:`([^`]+)`|([A-Za-z_][A-Za-z0-9_]*))""".r
      .findAllMatchIn(condition)
      .map(m => Option(m.group(1)).getOrElse(m.group(2))).toSeq.distinct
    val keyCols = changes.columns
      .filter(c => referenced.exists(_.equalsIgnoreCase(c)))
    require(keyCols.nonEmpty,
      s"applyChanges condition must reference updates.<key> columns: $condition")
    val latest = changes
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col).toIndexedSeq: _*)
          .orderBy(col(orderCol).desc)))
      .where(col("__rn") === 1).drop("__rn")
    val upserts = latest.where(!upper(col(opCol)).isin("D"))
      .drop(opCol, orderCol)
    // one pass: every changed key (U or D) leaves via the anti-join;
    // upsert images come back in the union
    val allKeys = latest.drop(opCol, orderCol)
    validateBatch(upserts)
    withCommitRetry("applyChanges") {
      lastManifest() match {
        case None =>
          commitAgainst(None, Seq(Entry(writeData(upserts, partitionBy), None)))
        case Some(cur) =>
          val pruned = if (partitionBy.nonEmpty &&
              changes.columns.contains(partitionBy.head))
            // touched partitions = partitions NAMED BY THE BATCH (D keys
            // included — their rows must leave those partitions; I keys
            // included — a batch for a partition the table has never seen
            // must still land). Discovery never scans the table. Pruning
            // contract (same as [[merge]]'s): the join key must be
            // partition-stable — a change row only ever matches target
            // rows in its own partition.
            prunedRewrite(lit(false), partitionBy,
              slice => slice.alias("source")
                .join(allKeys.alias("updates"), expr(condition), "left_anti")
                .unionByName(upserts, allowMissingColumns = true),
              extraTouched = Some(allKeys.select(col(partitionBy.head))))
          else if (partitionBy.isEmpty)
            // bucketed CDC mirror: a change batch keyed on the bucketed
            // column rewrites only the buckets its keys (I, U and D
            // alike) hash into — partition-stability holds by
            // construction, the hash is a function of the key
            bucketPrunedDml(allKeys, allKeys, upserts, condition)
          else None
          pruned.getOrElse(
            commitAgainst(Some(cur.version), Seq(Entry(writeData(
              readSnapshot(cur).alias("source")
                .join(allKeys.alias("updates"), expr(condition), "left_anti")
                .unionByName(upserts, allowMissingColumns = true),
              partitionBy), None))))
      }
    }
  }

  /** Delta-style row-level DELETE (`DELETE FROM t WHERE condition` — the
    * GDPR/right-to-erasure primitive). Rows matching `condition` (raw SQL
    * over the table's columns) are removed in a new snapshot version; time
    * travel still reads them in older versions until VACUUM retires those
    * manifests. With `partitionBy` set the rewrite is pruned to partitions
    * that contain matching rows — the touched-partition discovery scans
    * only the filter + partition columns, and untouched dirs carry over by
    * manifest reference, so a targeted delete costs O(touched partitions).
    * One documented degradation: when a delete empties a partition
    * COMPLETELY the pruned path cannot name the emptied dir without
    * re-implementing Spark's partition-value encoding, so it falls back to
    * the full rewrite (partition-aligned bulk deletes are the one shape
    * where a full rewrite of the survivors is proportional to the work
    * anyway). Returns the new version. */
  def delete(condition: String, partitionBy: Seq[String] = Nil): Long = {
    require(exists, s"delete on absent table $path")
    withCommitRetry("delete") {
      val cur = lastManifest().get
      val pruned = if (partitionBy.nonEmpty)
        prunedDelete(condition, partitionBy) else None
      pruned.getOrElse( // not splittable / emptied partition → full rewrite
        commitAgainst(Some(cur.version), Seq(Entry(writeData(
          readSnapshot(cur).where(!expr(condition)), partitionBy), None))))
    }
  }

  /** Partition-pruned delete on the FIRST partition column; None → caller
    * falls back to the full rewrite (layout not splittable or too many
    * touched partitions). A delete that EMPTIES a partition drops its dir
    * exactly (prunedRewrite learns the encoded dir names from Spark). */
  private def prunedDelete(condition: String,
                           partitionBy: Seq[String]): Option[Long] =
    prunedRewrite(expr(condition), partitionBy,
      slice => slice.where(!expr(condition)))

  /** Predicate-scoped overwrite (Delta's `replaceWhere`): rows matching
    * `condition` leave the snapshot and the batch takes their place, in
    * ONE new version — the idempotent backfill primitive ("recompute this
    * day/source and swap it in"). The batch must itself satisfy the
    * predicate (checked, like Delta's constraint — otherwise the swap
    * silently grows out of scope). With `partitionBy` set the rewrite is
    * pruned to partitions holding matching rows PLUS the batch's own
    * partitions (either side alone is wrong: an existing partition the
    * batch doesn't refill must still drop its matches; a partition only
    * the batch names must merge with its untouched rows), untouched dirs
    * carried by manifest reference — O(touched partitions). A replace
    * that empties a partition falls back to the full rewrite. */
  def replaceWhere(df: DataFrame, condition: String,
                   partitionBy: Seq[String] = Nil): Long = {
    validateBatch(df)
    requireFreshNames(df, "replaceWhere")
    val stray = df.where(!expr(condition)).limit(1).count()
    require(stray == 0L,
      s"replaceWhere batch contains rows violating the predicate $condition")
    withCommitRetry("replaceWhere") {
      lastManifest() match {
        case None =>
          commitAgainst(None, Seq(Entry(writeData(df, partitionBy), None)))
        case Some(cur) =>
          val pruned = if (partitionBy.nonEmpty &&
              df.columns.contains(partitionBy.head))
            prunedRewrite(expr(condition), partitionBy,
              slice => slice.where(!expr(condition))
                .unionByName(df, allowMissingColumns = true),
              extraTouched = Some(df.select(col(partitionBy.head))))
          else None
          pruned.getOrElse(
            commitAgainst(Some(cur.version), Seq(Entry(writeData(
              readSnapshot(cur).where(!expr(condition))
                .unionByName(df, allowMissingColumns = true),
              partitionBy), None))))
      }
    }
  }

  /** Shared pruned-rewrite engine for DML on the FIRST partition column:
    * discover partitions holding rows matching `cond` (column-pruned scan,
    * bounded driver-side value list) plus any `extraTouched` key rows (the
    * incoming batch's partitions for replaceWhere/applyChanges/merge), run
    * `rewriteSlice` over ONLY those partitions into a fresh dir, and carry
    * every other partition dir by manifest reference.
    *
    * Emptied partitions are handled EXACTLY, not by falling back: the
    * touched values' encoded dir names are learned from Spark itself (a
    * one-int marker frame written `partitionBy(pcol)` — no hand-rolled
    * partition-value encoding, so dates/timestamps/specials/nulls all get
    * Spark's own escaping), and every touched old dir is dropped whether
    * or not the rewrite produced a replacement — a touched partition with
    * no surviving rows simply disappears from the snapshot, which is the
    * correct result for a partition-emptying delete/replace/CDC batch.
    * A count-based "did everything get rewritten" guard is NOT sound
    * here: an op that empties one touched partition while inserting a new
    * one keeps the counts equal and would silently resurrect the emptied
    * partition's rows. */
  private def prunedRewrite(cond: Column, partitionBy: Seq[String],
                            rewriteSlice: DataFrame => DataFrame,
                            extraTouched: Option[DataFrame] = None): Option[Long] = {
    val pcol = partitionBy.head
    val cur = lastManifest().get
    val prefix = pcol + "="
    // ONE metadata listing answers BOTH layout splittability and the
    // carry-candidate (name, entry) list — the separate splittableLayout
    // walk re-listed every entry a second time, and those per-dir round
    // trips were a dominant fixed cost of a small bucketed merge
    // (round-9 verdict item 3; PLANS.md "bucketed-merge fixed costs").
    // splittable = every entry is either already a single-partition subdir
    // reference or a dir containing ONLY pcol=… subdirs (+ marker files).
    val childBuilder = Seq.newBuilder[(String, Entry)]
    val splittable = cur.entries.forall { e =>
      val name = new Path(e.dir).getName
      if (name.startsWith(prefix)) { childBuilder += name -> e; true }
      else {
        val (dirs, files) = FsUtils.listChildren(spark, e.dir)
        dirs.foreach(sub => childBuilder +=
          sub -> Entry(s"${e.dir}/$sub", Some(e.base.getOrElse(e.dir))))
        dirs.forall(_.startsWith(prefix)) &&
          files.forall(f => f.startsWith("_") || f.startsWith("."))
      }
    }
    if (!splittable) return None
    val children: Seq[(String, Entry)] = childBuilder.result()
    val isBucket = pcol == ManagedTable.BucketCol
    // Bucket dirs are written exclusively by this layer from an INT bucket
    // id, so a dir name is canonical iff it re-encodes from its parsed int
    // (`__gbucket=5`, never `05`/`+5`/non-numeric). A non-canonical name
    // means an external writer laid the dir out; its rows could dodge the
    // drop set below, so bail to the full rewrite. This pure string check
    // IS the bucket path's presence guard: with every name canonical, rows
    // holding bucket value v live exactly in dir `__gbucket=v`, so a
    // touched value with current rows always re-encodes to an existing
    // dir — the invariant the partition path below must pay a scan and
    // two encode jobs to establish.
    if (isBucket && !children.forall { case (n, _) =>
        n.stripPrefix(prefix).toIntOption.exists(v => prefix + v == n) })
      return None
    // ONE logical snapshot relation serves key discovery, the presence
    // guard and the rewrite slice: each readEntries construction re-lists
    // and re-infers schemas per entry, so building the snapshot read three
    // times tripled the fixed metadata cost of every pruned DML call.
    val baseRead =
      if (cur.dvs.isEmpty) readEntries(cur.entries, cur.renames)
      else readEntriesWithMeta(cur.entries, cur.renames)
    def snapWhere(c: Column): DataFrame =
      if (cur.dvs.isEmpty) baseRead.where(c)
      else applyDv(baseRead.where(c), cur.dvs).drop(DvFile, DvPos)
    // with cond = lit(false) (the merge/CDC paths) Catalyst folds this
    // branch of the union to an empty relation — no scan tasks run
    val matchKeys = snapWhere(cond).select(col(pcol))
    // the union's resolved schema (not matchKeys') types the collected
    // rows: a batch whose key column is wider than the table's coerces
    val keyed = extraTouched.fold(matchKeys)(matchKeys.union)
    val touchedRows = keyed.distinct()
      .limit(MaxPrunedPartitions + 1).collect()
    if (touchedRows.length > MaxPrunedPartitions) return None
    if (touchedRows.isEmpty)
      return Some(commitAgainst(Some(cur.version), cur.entries, cur.dvs))
    val touchedVals = touchedRows.map(_.get(0))
    // bucket ids are non-null ints by construction (pmod(hash(k), n) is
    // non-null even for null keys); anything else means a caller handed a
    // foreign frame — fall back rather than mis-encode
    if (isBucket && !touchedVals.forall(_.isInstanceOf[java.lang.Integer]))
      return None
    val encodedTouched: Set[String] =
      if (isBucket) touchedVals.map(v => prefix + v).toSet
      else encodePartitionNames(touchedRows.toIndexedSeq, keyed.schema, pcol)
    val nonNull = touchedVals.filter(_ != null)
    val hasNull = touchedVals.exists(_ == null)
    var sliceCond = if (nonNull.nonEmpty)
      col(pcol).isin(nonNull.toIndexedSeq: _*) else lit(false)
    if (hasNull) sliceCond = sliceCond || col(pcol).isNull

    // Round-trip guard (non-bucket partitions): dropping a touched old dir
    // relies on its name matching the RE-ENCODED touched value. If an
    // existing dir's name doesn't round-trip through Spark's
    // value-parse/re-encode (a dir from an external writer's escaping, a
    // timestamp partition under a changed session timezone, a
    // type-widening batch re-encoding `p=5` as `p=5.0`), the touched old
    // dir would be silently carried — deleted rows resurrect, merged rows
    // duplicate. The sound invariant is PRESENCE-based: every touched
    // value that actually has rows in the current snapshot must re-encode
    // to an existing dir name (that is the dir the drop set will remove).
    // Checking "touched name is in the rewrite output" instead is NOT
    // safe — a widening batch that UPDATES rather than empties a
    // partition puts the re-encoded name into the rewrite output, which
    // would vouch for a name matching no old dir while the real old dir
    // is silently carried. Touched values with NO current rows are
    // genuinely new partitions and constrain nothing. Bail to the full
    // rewrite on any mismatch — BEFORE the rewrite write, so the bail
    // costs one pruned key scan, not a wasted data write. The bucket path
    // established the same invariant structurally above (canonical int
    // names), so it skips the scan and both encode jobs.
    if (!isBucket) {
      val existingNames = children.iterator.map(_._1).toSet
      val presentRows = snapWhere(sliceCond)
        .select(col(pcol).cast(keyed.schema.head.dataType).as(pcol))
        .distinct().limit(MaxPrunedPartitions + 1).collect()
      val encodedPresent = encodePartitionNames(
        presentRows.toIndexedSeq, keyed.schema, pcol)
      if (!encodedPresent.forall(existingNames.contains)) return None
    }

    // the isin filter prunes the scan to touched partitions before the
    // per-row rewrite applies
    val out = rewriteSlice(snapWhere(sliceCond))
    val newDir = writeData(out, partitionBy)
    val rewritten = FsUtils.listChildren(spark, newDir)._1
      .filter(_.startsWith(prefix)).toSet
    // every touched old dir leaves the snapshot (rewritten-or-emptied);
    // `rewritten` also covers partitions the op newly introduced
    val drop = encodedTouched ++ rewritten
    val carried = children.collect { case (n, e) if !drop.contains(n) => e }
    // a fresh dir with no data subdirs is unreadable (schema inference has
    // nothing to see) — commit carried entries only; a table emptied
    // ENTIRELY falls back to the full rewrite, which owns that edge
    val entries =
      if (rewritten.nonEmpty) carried :+ Entry(newDir, None) else carried
    if (entries.isEmpty) return None
    Some(commitAgainst(Some(cur.version), entries, cur.dvs))
  }

  /** Spark's own encoded `pcol=value` dir name for each key row: write a
    * one-int marker frame partitioned by `pcol` to a staging dir and read
    * the subdir names back. Bounded by [[MaxPrunedPartitions]] rows; one
    * tiny job per pruned DML call. The probe stages on the TABLE's own
    * filesystem — process-local scratch is only sound single-node: on a
    * cluster the write task would land on an executor's local disk, the
    * driver's read-back would see NO subdirs, and the empty encoded set
    * would silently carry every touched old dir (deleted rows resurrect,
    * merged rows duplicate) — the same failure class as the round-9
    * footer-staging fix. `_tmp-` under `_graft_stats` is outside the
    * sidecar namespace and vacuum's sidecar-orphan sweep reaps crash
    * leftovers. */
  private def encodePartitionNames(rows: Seq[org.apache.spark.sql.Row],
                                   keySchema: org.apache.spark.sql.types.StructType,
                                   pcol: String): Set[String] = {
    val probeDir = s"$path/_graft_stats/_tmp-pencode-${
      java.util.UUID.randomUUID().toString.take(12)}"
    try {
      spark.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, keySchema)
        .withColumn("__probe", lit(1))
        .coalesce(1)
        .write.mode("overwrite").partitionBy(pcol).parquet(probeDir)
      FsUtils.listChildren(spark, probeDir)._1
        .filter(_.startsWith(pcol + "=")).toSet
    } finally FsUtils.deleteFiles(spark, Seq(probeDir))
  }

  /** Change-data-feed analogue (reference load/entrypoint.py:222-229):
    * rows of the current snapshot not present in the last snapshot
    * committed BEFORE `tsMillis` (inclusive start). `exceptAll` keeps
    * multiplicity: a table legitimately holding k duplicate rows that grew
    * to k+m reports exactly m changed rows (plain `except` is set-semantics
    * and would under-report the diff as empty). */
  def changesSince(tsMillis: Long): DataFrame = {
    if (!exists) return spark.emptyDataFrame
    manifests().filter(_.timestamp < tsMillis).lastOption match {
      case None       => read() // no snapshot predates the start → full feed
      case Some(base) => read().exceptAll(readSnapshot(base))
    }
  }

  /** Change feed WITH Delta-CDF-style `_change_type` markers: rows only in
    * the current snapshot are `insert`, rows only in the base snapshot are
    * `delete` (both multiplicity-aware via `exceptAll`). An updated row
    * surfaces as its delete+insert pair — the table layer has no key
    * knowledge to pair them into `update_pre/postimage`, which is the
    * honest degradation of Delta's CDF off-Databricks. */
  def changesWithType(tsMillis: Long): DataFrame = {
    if (!exists) return spark.emptyDataFrame
    manifests().filter(_.timestamp < tsMillis).lastOption match {
      case None => read().withColumn("_change_type", lit("insert"))
      case Some(base) =>
        val cur = read()
        val old = readSnapshot(base)
        cur.exceptAll(old).withColumn("_change_type", lit("insert"))
          .unionByName(old.exceptAll(cur).withColumn("_change_type", lit("delete")))
    }
  }

  /** Delta-style UPDATE … SET on the current snapshot: one projection pass
    * into a fresh snapshot dir. With `partitionBy` set the rewrite is
    * pruned to partitions containing matching rows, like [[delete]] —
    * updates never remove rows, so the pruned path has no emptied-partition
    * fallback. NOTE: assigning to the partition column itself would move
    * rows between partitions, so that case always takes the full rewrite. */
  def updateWhere(cond: String, set: Map[String, String],
                  partitionBy: Seq[String] = Nil): Long = {
    if (!exists) throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map("relationName" -> path))
    def apply(df: DataFrame): DataFrame =
      set.foldLeft(df) { case (d, (c, valueExpr)) =>
        d.withColumn(c, when(expr(cond), expr(valueExpr)).otherwise(col(c)))
      }
    // CHECK constraints see the post-update image of CHANGED rows only —
    // one extra scan proportional to the matched slice, not the table
    validateBatch(apply(read().where(expr(cond))))
    withCommitRetry("update") {
      val cur = lastManifest().get
      val pruned = if (partitionBy.nonEmpty && !set.contains(partitionBy.head))
        prunedRewrite(expr(cond), partitionBy, apply)
      else None
      pruned.getOrElse(
        commitAgainst(Some(cur.version), Seq(Entry(writeData(
          apply(readSnapshot(cur)), partitionBy), None))))
    }
  }

  private def statsDirFor(e: Entry): String =
    s"$path/_graft_stats/${new Path(e.base.getOrElse(e.dir)).getName}"

  private def bloomDirFor(e: Entry): String =
    s"$path/_graft_blooms/${new Path(e.base.getOrElse(e.dir)).getName}"

  /** Collect per-file bloom filters (see [[DataSkipping]] bloom skipping)
    * on `cols` for every data dir of the current snapshot that lacks them
    * — Delta's bloom filter index. Size via `itemsPerFile` (distinct keys
    * a file may hold) and `fpp`; both trade sidecar bytes for skip rate.
    * Like stats, blooms are keyed by data dir, so carried dirs are
    * aggregated once, ever. */
  def collectBlooms(cols: Seq[String], itemsPerFile: Long = 1000000L,
                    fpp: Double = 0.01): Unit = {
    require(exists, s"collectBlooms on absent table $path")
    collectSidecars(bloomDirFor, (dataDir, sd) =>
      DataSkipping.fileBlooms(spark, dataDir, None, cols, itemsPerFile, fpp)
        .write.mode("overwrite").parquet(sd))
  }

  /** Shared sidecar-collection loop: one producer pass per data dir of
    * the current snapshot that lacks its sidecar (dirs carried across
    * versions — including pruned-merge partition subdirs, which share
    * their base dir's sidecar — are produced once, ever). The producer
    * receives (dataDir, sidecarDir) and owns the write, so collectors
    * with extra staging (the footer path) share this keying/existence
    * logic instead of re-implementing it. */
  private def collectSidecars(sidecarFor: Entry => String,
                              produce: (String, String) => Unit): Unit =
    lastManifest().get.entries
      .map(e => (sidecarFor(e), e.base.getOrElse(e.dir)))
      .distinct
      .filterNot { case (sd, _) => FsUtils.exists(spark, sd) }
      .foreach { case (sd, dataDir) => produce(dataDir, sd) }

  /** Collect per-file data-skipping stats (see [[DataSkipping]]) for every
    * data dir of the current snapshot that doesn't have them yet. Stats are
    * keyed by the dir they describe (`_graft_stats/d<N>`), so a dir carried
    * across versions — including partition subdirs carried by pruned
    * merges, which share their base dir's stats — is aggregated once, ever.
    * `cols` restricts the statted columns (empty = the first
    * [[DataSkipping.MaxStatsColumns]] atomic columns). Each missing dir
    * costs one distributed, column-pruned aggregation pass. */
  def collectStats(cols: Seq[String] = Nil): Unit = {
    require(exists, s"collectStats on absent table $path")
    collectSidecars(statsDirFor, (dataDir, sd) =>
      DataSkipping.fileStats(spark, dataDir, None, cols)
        .write.mode("overwrite").parquet(sd))
  }

  /** Like [[collectStats]] but computed from parquet FOOTERS — ZERO data
    * bytes are read (one ~KB footer per file, distributed), where the
    * scan-based pass re-reads every data byte of the dir. At 100 TB that
    * is a metadata sweep instead of a second full table pass. Same
    * sidecar format and conventions, so pruning consumes either.
    * Limits (see [[DataSkipping.fileStatsFromFooters]]): fixed-width
    * columns plus UTF8 strings (string max bounds are truncation-safely
    * WIDENED, so boundary equality keeps a file scan mode would prune —
    * never the wrong direction); float/double/decimal/binary are excluded
    * (requested-but-excluded columns warn); a column any file can't vouch
    * for is left out of that dir's sidecar entirely (pruning skips it,
    * never wrong). */
  def collectStatsFromFooters(cols: Seq[String] = Nil): Unit = {
    require(exists, s"collectStatsFromFooters on absent table $path")
    collectSidecars(statsDirFor, (dataDir, sd) => {
      // raw footer rows stage on the TABLE's own filesystem — not
      // process-local scratch, which on a multi-node deployment would
      // hand the driver a partial stats table and silently drop files
      // from every pruned read. `_tmp-` under _graft_stats is outside
      // the sidecar namespace (dirs are named d<N>…) and vacuum's
      // sidecar-orphan sweep reaps any crash leftovers.
      val staging = s"$path/_graft_stats/_tmp-${
        java.util.UUID.randomUUID().toString.take(12)}"
      try DataSkipping.fileStatsFromFooters(spark, dataDir, None, cols,
          Some(staging))
        .write.mode("overwrite").parquet(sd)
      finally FsUtils.deleteFiles(spark, Seq(staging))
    })
  }

  /** Per-entry file selection for `condition`: (entry, Some(surviving
    * file paths) or None = read the whole entry unpruned, kept count,
    * files before pruning). Entries without collected stats prune nothing
    * (pruning never affects correctness). The stats filter runs
    * distributed, and the driver only ever collects a kept-list bounded
    * by [[ManagedTable.MaxPruneFiles]]: when more files than that survive
    * the stats filter, pruning is SKIPPED for the entry (None) — a
    * selection that weak saves little scan time, and the full-dir read
    * hands file enumeration back to Spark's own (distributed) listing
    * instead of shipping a multi-million-path array through the driver.
    * This is the same ceiling treatment the registry path handout got
    * (`PathBatchSize`, SURVEY §2.4).
    * When bloom sidecars exist ([[collectBlooms]]), equality/IN conjuncts
    * additionally drop files whose filters prove the key absent — the
    * point-lookup case min/max can't prune on unclustered data. */
  private def pruneEntries(entries: Seq[Entry], condition: String,
                           withCounts: Boolean): Seq[(Entry, Option[Seq[String]], Long, Long)] =
    entries.map { e =>
      val cap = ManagedTable.maxPruneFiles(spark)
      val sd = statsDirFor(e)
      val bd = bloomDirFor(e)
      val prefix = DataSkipping.canonPath(e.dir)
      // stats sidecars can serve several entries sharing a base dir
      // (compaction merges); restrict rows to this entry's subtree. The
      // canonicalization runs distributed so no unbounded path list is
      // ever collected just to be counted.
      val canon = org.apache.spark.sql.functions.udf(DataSkipping.canonPath _)
      def underEntry(df: DataFrame): DataFrame =
        if (e.base.isEmpty) df
        else {
          val p = canon(col(DataSkipping.PathCol))
          df.where(p === prefix || p.startsWith(prefix + "/"))
        }
      // canonical kept paths minus those the bloom sidecars DISPROVE
      // (equality/IN point lookups min/max can't prune on unclustered
      // data). Absent rows — files written after collection — never land
      // in the disproven set, so they survive.
      def bloomPrune(afterStats: Seq[String]): Seq[String] =
        if (afterStats.isEmpty || !FsUtils.exists(spark, bd)) afterStats
        else {
          val blooms = spark.read.parquet(bd)
          val bloomedTypes = {
            val schema = e.base.fold(spark.read)(b =>
              spark.read.option("basePath", b)).parquet(e.dir).schema
            blooms.schema.fieldNames.filter(_.startsWith("bloom_"))
              .map(_.stripPrefix("bloom_")).flatMap(c =>
                schema.fields.find(_.name.equalsIgnoreCase(c))
                  .map(f => f.name -> f.dataType)).toMap
          }
          DataSkipping.bloomKeep(spark, condition, bloomedTypes) match {
            case None => afterStats // no equality conjunct on a bloomed col
            case Some(keep) =>
              // capped like the kept list; an over-cap disproven set
              // leaves the overflow files un-pruned — the safe direction
              val pruned = blooms.where(org.apache.spark.sql.functions.not(keep))
                .select(DataSkipping.PathCol).limit(cap + 1).collect()
                .map(r => DataSkipping.canonPath(r.getString(0))).toSet
              afterStats.filterNot(pruned.contains)
          }
        }
      if (FsUtils.exists(spark, sd)) {
        val stats = underEntry(spark.read.parquet(sd))
        val statCols = stats.schema.fieldNames.toSeq
          .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
          .map(c => c.toLowerCase -> c).toMap
        val mm = DataSkipping.mightMatchSql(spark, condition, statCols)
        // the pre-prune total is observability-only (pruneInfo); readWhere
        // skips the extra job entirely
        val total = if (withCounts) stats.count() else -1L
        val keptRows = stats.where(mm).select(DataSkipping.PathCol)
          .limit(cap + 1).collect()
        if (keptRows.length > cap) {
          org.slf4j.LoggerFactory.getLogger(classOf[ManagedTable])
            .info(s"prune(${e.dir}): >$cap files survive stats for " +
              s"'$condition' — skipping pruning (bounded driver list)")
          (e, None, total, total)
        } else {
          val kept = bloomPrune(keptRows
            .map(r => DataSkipping.canonPath(r.getString(0))).toSeq)
          (e, Some(kept), kept.length.toLong, total)
        }
      } else if (FsUtils.exists(spark, bd)) {
        // BLOOM-ONLY pruning (collectBlooms without collectStats): the
        // file list is the dir listing, canonicalized to match the bloom
        // sidecar's paths, bounded by the same cap
        val files = FsUtils.listFiles(spark, e.dir)
          .filterNot { f =>
            val nm = new Path(f).getName
            nm.startsWith("_") || nm.startsWith(".")
          }
        if (files.length > cap) (e, None, files.length.toLong, files.length.toLong)
        else {
          val kept = bloomPrune(files.map(DataSkipping.canonPath))
          (e, Some(kept), kept.length.toLong, files.length.toLong)
        }
      } else {
        // no sidecars: nothing to prune with — hand the whole dir to
        // Spark's scan (its InMemoryFileIndex lists large dirs with a
        // distributed job; no path array crosses this layer). The listing
        // below runs only for pruneInfo observability.
        val n =
          if (!withCounts) -1L
          else FsUtils.listFiles(spark, e.dir).count { f =>
            val nm = new Path(f).getName
            !nm.startsWith("_") && !nm.startsWith(".")
          }.toLong
        (e, None, n, n)
      }
    }

  /** (files read, files in snapshot) for `condition` — the observability
    * hook specs and operators use to assert skipping actually happened. */
  def pruneInfo(condition: String): (Long, Long) = {
    val sel = pruneEntries(lastManifest().get.entries, condition, withCounts = true)
    (sel.map(_._3).sum, sel.map(_._4).sum)
  }

  /** Read the current snapshot with file-level data skipping: files whose
    * [[DataSkipping]] stats prove no row can satisfy `condition` are never
    * opened; the residual filter still applies (pruning is planning-time
    * only, row-level filtering is unchanged). Falls back to a plain
    * filtered read when no stats exist. */
  def readWhere(condition: String): DataFrame = lastManifest() match {
    case None => spark.emptyDataFrame
    case Some(m) =>
      // bucket pruning ([[setBucket]]): an equality/IN conjunct on the
      // bucketed key constrains the hidden partition to the literals'
      // computed buckets — Catalyst turns the isin into a partition
      // filter, so non-matching bucket dirs are pruned at planning time
      // (per SCAN: dirs written before setBucket lack the column and
      // read unpruned, which keeps mixed-age snapshots correct). The id
      // set depends only on (condition, spec) — literals hash at the
      // spec's CANONICAL type, matching the write layout regardless of
      // any scan's physical key type — so it is computed once, not per
      // entry (a bucket-pruned merge leaves up to n carried subdir
      // entries in the snapshot).
      val bucketIds: Option[Set[Int]] = bucketSpec.flatMap(spec =>
        DataSkipping.bucketsFor(spark, condition, spec.column,
          spec.keyType, spec.n))
      def bucketFilter(scan: DataFrame): DataFrame = bucketIds match {
        case Some(ids) if scan.schema.fieldNames
            .exists(_.equalsIgnoreCase(ManagedTable.BucketCol)) =>
          // an EMPTY id set (contradictory conjuncts) correctly prunes
          // the whole scan — isin() of nothing is false
          scan.where(
            col(ManagedTable.BucketCol).isin(ids.toSeq.map(Int.box): _*))
        case _ => scan
      }
      val dfs = pruneEntries(m.entries, condition, withCounts = false).map {
        case (e, sel, _, _) if sel.forall(_.nonEmpty) =>
          // Some(kept files) -> pruned scan; None -> full-dir scan
          // (no/weak stats: Spark enumerates the dir itself)
          val scan = bucketFilter(applyRenames(
            sel.fold(spark.read.option("basePath", e.base.getOrElse(e.dir))
                .parquet(e.dir)) { files =>
              spark.read.option("basePath", e.base.getOrElse(e.dir))
                .parquet(files: _*)
            },
            m.renames))
          if (m.dvs.isEmpty) scan
          else scan.withColumn(DvFile, col("_metadata.file_path"))
            .withColumn(DvPos, col("_metadata.row_index"))
        case (e, _, _, _) =>
          // fully-pruned entry: keep its SCHEMA as a zero-row slice —
          // under schema drift, dropping the entry entirely could lose
          // columns the residual filter (or the caller) references
          // (limit 0 plans to an empty relation, nothing is scanned)
          readEntries(Seq(e), m.renames).limit(0)
      }
      val unioned = dropTombstones(
        dfs.reduce(_.unionByName(_, allowMissingColumns = true)))
        .where(expr(condition))
      (if (m.dvs.isEmpty) unioned
       else applyDv(unioned, m.dvs).drop(DvFile, DvPos))
        .drop(ManagedTable.BucketCol)
  }

  /** Structured-Streaming SOURCE over an APPEND-ONLY table: a parquet
    * file-stream on the table's data-dir glob. Every [[append]] commits a
    * fresh `d<v>-…` dir whose files the source discovers on its next poll,
    * so `table.streamAppends() → transform → writeStream` chains
    * incremental pipelines off the table exactly like Delta's streaming
    * source in append-only mode (checkpointed offsets = processed files;
    * replays are exact). CAVEAT (Delta's too, absent skipChangeCommits):
    * snapshot-REPLACING commits — clean_write, a rewriting merge,
    * optimize, compactSmall, restore — rewrite existing rows into new
    * files, which a file-offset source would surface as phantom new
    * appends. Attach streams only to ingest tables maintained by append,
    * and compact them in maintenance windows when no stream is attached
    * (or with the stream's checkpoint advanced past the rewrite).
    * Partition columns live in dir names, not files, so stream
    * unpartitioned ingest tables (partition-shaping belongs downstream). */
  def streamAppends(): DataFrame = {
    require(exists, s"streamAppends on absent table $path")
    require(lastManifest().forall(_.dvs.isEmpty),
      s"streamAppends on $path: table has deletion vectors — a file-offset " +
        "source cannot subtract them (and would also surface dv sidecar " +
        "dirs); OPTIMIZE to materialize the vectors first")
    require(lastManifest().forall(_.renames.isEmpty),
      s"streamAppends on $path: table has a live column mapping — a raw " +
        "file-glob source reads physical names and would null out renamed " +
        "columns; OPTIMIZE to materialize the renames first")
    require(bucketSpec.isEmpty,
      s"streamAppends on $path: table is bucketed — partition-shaped " +
        "layouts are unsupported as raw file-glob stream sources (same " +
        "caveat as explicit partitionBy, see above); stream the unbucketed " +
        "ingest table and bucket downstream")
    spark.readStream.schema(read().schema).parquet(s"$path/d*")
  }

  /** Shared OPTIMIZE clustering: a z-order request approximates to
    * range-partition + sortWithinPartitions (multi-column via the
    * bit-interleaved Morton key, see [[ZOrder]] — per-file min/max stats
    * then prune on EVERY z-ordered column, not just the leading one);
    * bucketed tables compact BY BUCKET (one file per non-empty bucket,
    * not tasks × buckets — same shape as [[compactSmall]]). */
  private def clusterFor(cur: DataFrame, zorderBy: Seq[String],
                         n: Int): DataFrame =
    if (zorderBy.size > 1) {
      val zk = ZOrder.zOrderKey(cur, zorderBy)
      cur.withColumn("__zkey", zk)
        .repartitionByRange(n, col("__zkey"))
        .sortWithinPartitions(col("__zkey"))
        .drop("__zkey")
    } else if (zorderBy.nonEmpty)
      cur.repartitionByRange(n, zorderBy.map(col): _*)
        .sortWithinPartitions(zorderBy.map(col): _*)
    else bucketSpec match {
      case Some(spec)
          if cur.columns.exists(_.equalsIgnoreCase(spec.column)) =>
        val key = cur.columns.find(_.equalsIgnoreCase(spec.column)).get
        cur.repartition(n, spec.idOf(col(s"`$key`")))
      case _ => cur.repartition(n)
    }

  // Optimize watermark: a one-line hint naming the last version an
  // optimize (full or incremental) produced, so [[optimizeIncremental]]
  // can tell already-clustered dirs from post-optimize arrivals without
  // replaying the log. Advisory metadata like the version hint:
  // missing/stale/vacuumed → the incremental path degrades to the full
  // footprint, never to a wrong result.
  private def optimizeWatermarkPath = s"$logDir/_optimize_watermark"

  private def writeOptimizeWatermark(v: Long): Unit =
    try FsUtils.writeTextAtomic(spark, optimizeWatermarkPath, s"""{"version":$v}""")
    catch { case _: Exception => () }

  private def readOptimizeWatermark(): Option[Long] =
    try {
      if (!FsUtils.exists(spark, optimizeWatermarkPath)) None
      else Option(new ObjectMapper()
        .readTree(FsUtils.readText(spark, optimizeWatermarkPath)).get("version"))
        .map(_.asLong())
    } catch { case _: Exception => None }

  /** OPTIMIZE [ZORDER BY cols]: compact the current snapshot's dir list
    * into ONE dir; a z-order request approximates to range-partition +
    * sortWithinPartitions on those columns — same data-skipping effect for
    * parquet min/max stats (reference batch_delta.py:116-134). O(table)
    * per run — at 100 TB prefer [[optimizeIncremental]] on a cadence with
    * this full pass reserved for restoring global clustering. */
  def optimize(zorderBy: Seq[String] = Nil, targetPartitions: Int = 0,
               partitionBy: Seq[String] = Nil): Long = {
    if (!exists) throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map("relationName" -> path))
    val v = withCommitRetry("optimize") {
      val curM = lastManifest().get
      // readSnapshot: a full compaction MATERIALIZES the deletion vectors
      // (vectored rows drop out of the rewrite) and the fresh manifest
      // clears them — OPTIMIZE is the DV purge path, exactly like Delta
      val cur = readSnapshot(curM)
      val n = if (targetPartitions > 0) targetPartitions
              else math.max(1, spark.sparkContext.defaultParallelism / 2)
      val compacted = clusterFor(cur, zorderBy, n)
      // pass the table's partition columns so compaction keeps the hive
      // layout — otherwise one OPTIMIZE would flatten the dirs and disable
      // both scan-time partition pruning and future pruned merges
      // the rewrite materializes the logical schema into the data files,
      // so the column mapping resets — OPTIMIZE is the "make renames
      // physical" path (and the escape hatch that frees a dropped name
      // for re-use)
      commitAgainst(Some(curM.version),
        Seq(Entry(writeData(compacted, partitionBy), None)),
        renames = Some(Nil))
    }
    writeOptimizeWatermark(v)
    v
  }

  /** Incremental OPTIMIZE [ZORDER BY cols]: compact/cluster ONLY the dirs
    * written since the last optimize watermark; every dir the snapshot at
    * the watermark already held carries over by manifest reference —
    * O(data landed since the last optimize), not O(table). This is the
    * maintenance cost model a 100 TB ingest table needs: the full
    * [[optimize]] rewrite is a per-run table scan it cannot pay, while
    * the append tail it actually accumulates stays small. Clustering
    * quality matches Delta's incremental OPTIMIZE: each optimized dir is
    * internally clustered (per-file min/max stats prune within it); run
    * the full pass in a maintenance window if global clustering ever
    * degrades. Differences from the full pass, by necessity: column
    * renames are NOT materialized (carried dirs keep physical names) and
    * deletion vectors are materialized only for the rewritten slice —
    * both mappings stay live. Output is sized by the fresh slice's bytes
    * (`targetBytes`-sized files), not the cluster's parallelism. Returns
    * the current version unchanged when nothing new landed. */
  def optimizeIncremental(zorderBy: Seq[String] = Nil,
                          targetPartitions: Int = 0,
                          partitionBy: Seq[String] = Nil,
                          targetBytes: Long = 128L * 1024 * 1024): Long = {
    if (!exists) throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map("relationName" -> path))
    val v = withCommitRetry("optimizeIncremental") {
      val cur = lastManifest().get
      val baseline: Set[Entry] = (for {
        w <- readOptimizeWatermark()
        m <- manifestAt(w)
      } yield m.entries.toSet).getOrElse(Set.empty)
      val (carried, fresh) = cur.entries.partition(baseline.contains)
      if (fresh.isEmpty) cur.version // nothing landed since the watermark
      else {
        // DV-aware read of ONLY the fresh entries (rewriting from
        // un-vectored files would resurrect deleted rows); DVs carry
        // over for the carried dirs — vector rows addressing rewritten
        // files become inert, exactly like [[compactSmall]]
        val folded =
          if (cur.dvs.isEmpty) readEntries(fresh, cur.renames)
          else applyDv(readEntriesWithMeta(fresh, cur.renames), cur.dvs)
            .drop(DvFile, DvPos)
        val n = if (targetPartitions > 0) targetPartitions
          else {
            val bytes = fresh.map(e =>
              FsUtils.listFilesWithSize(spark, e.dir).map(_._2).sum).sum
            math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
          }
        val newEntry = Entry(writeData(clusterFor(folded, zorderBy, n),
          partitionBy), None)
        // DV sidecars fold to LIVE rows only (those addressing carried
        // dirs) — incremental-only maintenance must shed the vectors the
        // rewrite just materialized, or they accumulate forever
        commitAgainst(Some(cur.version), carried :+ newEntry,
          foldDvs(cur, carried))
      }
    }
    writeOptimizeWatermark(v)
    v
  }

  /** Delta-style RESTORE: roll the table back to snapshot `v` by
    * committing a NEW version whose entries are v's entries — history is
    * preserved (the bad versions stay time-travelable until VACUUM), the
    * restore itself is a manifest write, no data moves. */
  def restore(v: Long): Long = {
    val m = resolveVersion(v) // vacuumed target → loud, cause-naming error
    // the restored snapshot's column mapping travels with its data
    ManagedTable.currentOp.withValue("restore") {
      commitEntries(m.entries, m.dvs, Some(m.renames))
    }
  }

  /** Delta-style shallow CLONE: create a table at `targetPath` whose
    * first manifest references THIS table's current data dirs — a
    * zero-copy snapshot (the 100 TB dev/test-sandbox primitive: cloning
    * costs one manifest write regardless of table size). The clone's
    * subsequent writes land under its own path and never touch the
    * source; vacuuming the clone can't delete source dirs because its
    * orphan scan only ever matches dirs its own manifests dropped.
    * CAVEAT (same as Delta's shallow clone): vacuuming the SOURCE can
    * remove dirs the clone still references — deep-copy (`read` +
    * `write`) when lifetimes are independent. */
  def cloneTo(targetPath: String): ManagedTable = {
    val target = new ManagedTable(spark, targetPath)
    require(!target.exists, s"clone target already exists: $targetPath")
    val m = lastManifest()
    // CAS at the target's version 0: of two racing clones to one path,
    // exactly one wins and the other fails loudly
    ManagedTable.currentOp.withValue("clone") {
      target.commitAgainst(None, m.map(_.entries).getOrElse(Nil),
        m.map(_.dvs).getOrElse(Nil), Some(m.map(_.renames).getOrElse(Nil)))
    }
    // table properties travel with the clone: CHECK constraints, schema
    // enforcement and the bucket spec are part of the table's contract,
    // not of one snapshot — a clone losing its checks would accept
    // batches the source rejects, and one losing its bucket spec would
    // silently write unbucketed dirs
    if (FsUtils.exists(spark, propsPath)) {
      val (enforced, cks, bucket) = readProps()
      target.writeProps(enforced, cks, bucket)
    }
    target
  }

  /** Incremental small-file compaction — Delta's OPTIMIZE binpacking
    * without the full-table rewrite: only snapshot entries whose data
    * files are small (mean size below `targetBytes / 2` with more than
    * one file) are coalesced into one fresh right-sized dir; every
    * healthy dir carries over by manifest reference untouched. This is
    * the maintenance op a streaming/append-heavy table needs at 100 TB —
    * each AvailableNow batch appends a small dir, and compaction cost
    * must track the SMALL tail, not the table. File sizes come from one
    * metadata listing per entry; the rewrite sizes its output by total
    * bytes / targetBytes. Returns the new version (a no-op commit when
    * nothing qualifies). */
  def compactSmall(targetBytes: Long = 128L * 1024 * 1024,
                   partitionBy: Seq[String] = Nil): Long = {
    require(exists, s"compactSmall on absent table $path")
    withCommitRetry("compactSmall") {
      val cur = lastManifest().get
      val sized = cur.entries.map { e =>
        (e, FsUtils.listFilesWithSize(spark, e.dir))
      }
      val (small, healthy) = sized.partition { case (_, files) =>
        files.nonEmpty && files.map(_._2).sum / files.length < targetBytes / 2
      }
      val totalBytes = small.flatMap(_._2).map(_._2).sum
      val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      // nothing small, or already as packed as it gets (e.g. ONE small
      // single-file dir, or a just-compacted dir still under target) —
      // return the current version WITHOUT committing: a streaming sink
      // calling this on a cadence would otherwise mint a no-op manifest
      // (duplicating the whole entry list + txn map) every cadence point,
      // pure log churn at 10^5 micro-batches
      if (small.isEmpty || small.map(_._2.length).sum <= n)
        cur.version
      else {
        // subtract deletion vectors from the rewritten slice (rewriting
        // from un-vectored files would resurrect deleted rows); carried
        // healthy dirs may still have vectored rows so dvs carry over
        val smallEntries = small.map(_._1)
        val folded = (if (cur.dvs.isEmpty) readEntries(smallEntries, cur.renames)
                      else applyDv(readEntriesWithMeta(smallEntries, cur.renames), cur.dvs)
                        .drop(DvFile, DvPos))
        // bucketed tables repartition BY BUCKET so each bucket's rows land
        // in one task — the rewrite then emits one file per non-empty
        // bucket instead of (tasks × buckets) small files, which would
        // re-create the small-file tail the compaction exists to fold
        val merged = bucketSpec match {
          case Some(spec)
              if folded.columns.exists(_.equalsIgnoreCase(spec.column)) =>
            val key = folded.columns.find(_.equalsIgnoreCase(spec.column)).get
            folded.repartition(n, spec.idOf(col(s"`$key`")))
          case _ => folded.repartition(n)
        }
        val healthyEntries = healthy.map(_._1)
        val newEntry = Entry(writeData(merged, partitionBy), None)
        // same DV fold as optimizeIncremental: the compacted slice's
        // vectors were materialized by the rewrite — shed them
        commitAgainst(Some(cur.version), healthyEntries :+ newEntry,
          foldDvs(cur, healthyEntries))
      }
    }
  }

  /** VACUUM RETAIN n HOURS: drop manifests older than the horizon (always
    * keeping the current one) and delete data dirs no retained manifest
    * references (reference batch_delta.py:136-155, incl. the <168h guard
    * unless explicitly overridden). Containment-aware: a dir is deletable
    * only when no retained reference equals it, lives inside it (a carried
    * partition subdir), or contains it (a whole-dir reference above a
    * dropped subdir entry). */
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
    val referenced = retained.flatMap(_.entries).map(e => normPath(e.dir))
    def deletable(d: String): Boolean = {
      val n = normPath(d)
      !referenced.exists(r => r == n || r.startsWith(n + "/") || n.startsWith(r + "/"))
    }
    // never delete dirs OUTSIDE this table's own path: a shallow clone's
    // manifests reference the source table's dirs, which are borrowed,
    // not owned — the source's own vacuum governs their lifetime
    val own = normPath(path) + "/"
    val orphanDirs = dropped.flatMap(_.entries).map(_.dir).distinct
      .filter(d => normPath(d).startsWith(own))
      .filter(deletable)
    // also reap data dirs referenced by NO manifest at all — the residue
    // of optimistic commits that LOST their race (the op re-ran and wrote
    // a fresh dir). The retention horizon doubles as the in-flight guard:
    // a dir younger than the horizon may belong to a writer whose commit
    // hasn't landed yet, so it survives until a later vacuum.
    val allRefs = all.flatMap(_.entries).map(e => normPath(e.dir))
    val raceOrphans = FsUtils.listChildDirsWithModTime(spark, path)
      .filter { case (name, mod) => name.startsWith("d") && mod < horizon }
      .map { case (name, _) => s"$path/$name" }
      .filter { d =>
        val n = normPath(d)
        !allRefs.exists(r => r == n || r.startsWith(n + "/") || n.startsWith(r + "/"))
      }
    // DV sidecars: reap `_graft_dv/` dirs no RETAINED manifest references
    // (optimize/rewrite materialized them, or the manifest that introduced
    // them dropped past the horizon). Same in-flight guard as race
    // orphans — a sidecar younger than the horizon may belong to a commit
    // that hasn't landed.
    val retainedDvs = retained.flatMap(_.dvs).map(normPath).toSet
    val dvOrphans = FsUtils.listChildDirsWithModTime(spark, s"$path/_graft_dv")
      .filter { case (_, mod) => mod < horizon }
      .map { case (name, _) => s"$path/_graft_dv/$name" }
      .filter(d => !retainedDvs.contains(normPath(d)))
    // stats/bloom sidecars are keyed by their data dir's NAME: once no
    // retained manifest references a dir of that name (directly or as a
    // base), its sidecars are unreachable — reap them or they leak forever
    val liveNames = retained.flatMap(_.entries)
      .flatMap(e => Seq(e.dir) ++ e.base.toSeq)
      .map(d => new Path(d).getName).toSet
    val sidecarOrphans = Seq("_graft_stats", "_graft_blooms").flatMap { sc =>
      FsUtils.listChildDirsWithModTime(spark, s"$path/$sc")
        .filter { case (name, mod) => mod < horizon && !liveNames.contains(name) }
        .map { case (name, _) => s"$path/$sc/$name" }
    }
    // chain repair BEFORE any deletion: a retained DELTA manifest whose
    // parent is about to drop must first be materialized into a
    // self-contained `.checkpoint.json` shadow, or every later read of
    // that version (including the head, via the fold) would fail on the
    // broken chain. Ordering makes a crash mid-vacuum safe: checkpoints
    // land first, so the chain is never broken without its repair.
    // `retained` is already materialized (from manifests()'s fold), so
    // each checkpoint is one small write — no replay work here.
    val droppedVs = dropped.map(_.version).toSet
    retained.foreach { m =>
      val needsRepair = droppedVs.contains(m.version - 1) &&
        logFileAt(m.version).exists(_.isLeft)
      if (needsRepair)
        FsUtils.writeTextAtomic(spark, s"$logDir/${m.version}.checkpoint.json",
          fullManifestJson(m))
    }
    FsUtils.deleteFiles(spark,
      orphanDirs ++ raceOrphans ++ dvOrphans ++ sidecarOrphans ++
        dropped.map(m => s"$logDir/${m.version}.json") ++
        dropped.map(m => s"$logDir/${m.version}.checkpoint.json"))
    // fold the reap into the checkpoint hint: an ancient hint could name
    // a version this vacuum just deleted, which would demote every read
    // to the full-listing fallback until the next commit — re-point it at
    // the surviving head now
    retained.lastOption.foreach(m => writeVersionHint(m.version))
  }

  /** Scheme-insensitive path form for containment checks (`file:/x` and
    * `/x` are the same local dir). */
  private def normPath(s: String): String = {
    val u = new Path(s).toUri
    if (u.getScheme == null || u.getScheme == "file") u.getPath else s
  }

  /** Register in the session catalog (reference common/hive_table.py:20-38).
    * Our snapshots move per-version, so the stable equivalent is a catalog
    * view over the current snapshot, refreshed on each write. Carried
    * partition-subdir entries become a pruned scan of their base dir
    * (`WHERE pcol = value` — partition pruning reads the same files, and
    * the partition column stays in the view's schema). */
  def registerAs(databaseName: String, tableName: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $databaseName")
    val m = lastManifest()
    val dvs = m.map(_.dvs).getOrElse(Nil)
    val renames = m.map(_.renames).getOrElse(Nil)
    // under deletion vectors each scan must carry per-row provenance so
    // the view can anti-join the vectored positions back out
    val meta = if (dvs.isEmpty) ""
      else s", _metadata.file_path AS $DvFile, _metadata.row_index AS $DvPos"
    // the view must mirror the READ path exactly: union BY NAME across
    // schema drift (positional UNION ALL would mis-map or fail on
    // different-width dirs), live renames applied, tombstoned columns
    // hidden — so each branch selects the table's LOGICAL columns
    // explicitly, null-filling the ones its dir predates
    def logicalName(phys: String): String =
      renames.foldLeft(phys) { case (n, (f, t)) =>
        if (n.equalsIgnoreCase(f)) t else n }
    val finalSchema = read().schema
    def selectItems(dir: String, base: Option[String]): String = {
      val phys = base.fold(spark.read)(b =>
        spark.read.option("basePath", b)).parquet(dir).schema
      val physByLogical = phys.fieldNames
        .map(p => logicalName(p).toLowerCase -> p).toMap
      finalSchema.map { f =>
        physByLogical.get(f.name.toLowerCase) match {
          case Some(p) => s"`$p` AS `${f.name}`"
          case None    => s"CAST(NULL AS ${f.dataType.sql}) AS `${f.name}`"
        }
      }.mkString(", ")
    }
    val selects = m.map(_.entries).getOrElse(Nil) match {
      case Nil => Seq(s"SELECT *$meta FROM parquet.`$path`")
      case es => es.map {
        case Entry(d, None) =>
          s"SELECT ${selectItems(d, None)}$meta FROM parquet.`$d`"
        case Entry(d, Some(b)) =>
          // decode `pcol=value` path segments below the base into predicates
          val rel = normPath(d).stripPrefix(normPath(b)).stripPrefix("/")
          val preds = rel.split("/").toSeq.map { seg =>
            val Array(c, v) = seg.split("=", 2)
            if (v == "__HIVE_DEFAULT_PARTITION__") s"$c IS NULL"
            else {
              // '' doubling: a quote inside a partition VALUE must not
              // break (or inject into) the view body
              val lit = unescapePathName(v).replace("'", "''")
              s"CAST($c AS STRING) = '$lit'"
            }
          }
          s"SELECT ${selectItems(d, Some(b))}$meta FROM parquet.`$b` " +
            s"WHERE ${preds.mkString(" AND ")}"
      }
    }
    val unioned = selects.mkString(" UNION ALL ")
    val body = if (dvs.isEmpty) unioned else {
      val cols = read().schema.fieldNames.map(c => s"t.`$c`").mkString(", ")
      val dvScan = dvs.map(d => s"SELECT * FROM parquet.`$d`")
        .mkString(" UNION ALL ")
      s"""SELECT $cols FROM ($unioned) t LEFT ANTI JOIN ($dvScan) dv
         |ON t.$DvFile = dv.$DvFile AND t.$DvPos = dv.$DvPos""".stripMargin
    }
    spark.sql(
      s"CREATE OR REPLACE VIEW $databaseName.$tableName AS $body")
  }

  /** Inverse of Spark's partition-path escaping (`%xx` sequences only —
    * NOT URL decoding; `+` stays `+`). */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val code = try Integer.parseInt(s.substring(i + 1, i + 3), 16) catch { case _: NumberFormatException => -1 }
        if (code >= 0) { sb.append(code.toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def writeData(df: DataFrame, partitionBy: Seq[String]): String = {
    // next-version hint + random suffix: concurrent writers (and retried
    // optimistic commits) must never share a data dir — parquet overwrite
    // mode would clobber the other writer's files mid-job. Nothing parses
    // the name back; manifests carry full paths. A dir whose commit LOSES
    // its race is left unreferenced and reaped by vacuum's orphan sweep.
    val v = currentVersion.map(_ + 1).getOrElse(0L)
    val dir = s"${dataDir(v)}-${java.util.UUID.randomUUID.toString.take(8)}"
    // bucket transform: the hidden bucket partition is ALWAYS recomputed
    // from the key column here (any stale __gbucket a rewrite carried in
    // is dropped first), so the layout can never drift from the data. The
    // bucket level sits innermost so explicit partition columns keep
    // their top-level dirs (pruned DML on partitionBy.head unaffected).
    // No shuffle is added — like Delta, append cost stays O(new data);
    // a task spanning several buckets writes one file per (task, bucket).
    val (toWrite, parts) = bucketSpec match {
      case Some(spec) if df.columns.exists(_.equalsIgnoreCase(spec.column)) =>
        val key = df.columns.find(_.equalsIgnoreCase(spec.column)).get
        (df.drop(ManagedTable.BucketCol).withColumn(ManagedTable.BucketCol,
            spec.idOf(col(s"`$key`"))),
          partitionBy.filterNot(_ == ManagedTable.BucketCol) :+
            ManagedTable.BucketCol)
      case _ => (df.drop(ManagedTable.BucketCol), partitionBy)
    }
    val w = toWrite.write.mode("overwrite")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(dir)
    dir
  }

  // Jackson-escaped strings throughout the writers: a quote or backslash
  // in a dir path or a renamed column name written raw would poison every
  // later parseLog of this version (reads parse with Jackson; writes must
  // escape with it too).
  private def js(s: String): String =
    new ObjectMapper().writeValueAsString(s)

  private def entryJson(e: Entry): String = e match {
    case Entry(d, None)    => js(d)
    case Entry(d, Some(b)) => s"""{"dir":${js(d)},"base":${js(b)}}"""
  }

  private def renamesJson(rs: Seq[(String, String)]): String =
    rs.map { case (f, t) => s"""{"from":${js(f)},"to":${js(t)}}""" }
      .mkString("[", ",", "]")

  // Delta's `txn` action analogue: (appId -> version) stamped ATOMICALLY
  // with the commit, so a streaming sink's replay guard survives a crash
  // between data commit and checkpoint commit.
  private def txnJson(txn: Map[String, Long]): String =
    if (txn.isEmpty) ""
    else txn.map { case (a, tv) => s"${js(a)}:$tv" }
      .mkString(""","txn":{""", ",", "}")

  /** The self-contained (FULL/checkpoint) body for a materialized
    * manifest — today's pre-round-11 format, byte-compatible with old
    * logs. Shared by the checkpoint-cadence commits and vacuum's
    * chain-repair checkpoints. */
  private def fullManifestJson(m: Manifest): String = {
    val dirsJson = m.entries.map(entryJson).mkString("[", ",", "]")
    val dvJson = if (m.dvs.isEmpty) ""
      else m.dvs.map(js).mkString(""","dv":[""", ",", "]")
    val renJson = if (m.renames.isEmpty) ""
      else s""","renames":${renamesJson(m.renames)}"""
    // DESCRIBE HISTORY's operation column — observability only
    val opJson = s""","op":${js(m.op)}"""
    s"""{"version":${m.version},"timestamp":${m.timestamp},"dirs":$dirsJson$dvJson$renJson${txnJson(m.txn)}$opJson}"""
  }

  /** One optimistic commit attempt at exactly version `v` — true iff this
    * writer won the put-if-absent race for the manifest file (a manifest
    * still either exists completely or not at all; a crash mid-write can
    * never corrupt the log).
    *
    * What lands on disk (round-11 delta-encoded log): a DELTA action
    * manifest — add/remove entry actions, dv deltas, this commit's txn
    * markers — when a parent snapshot exists and `v` is off the
    * checkpoint cadence, so commit bytes are O(changed dirs); a FULL
    * self-contained manifest every [[ManagedTable.checkpointInterval]]-th
    * version (and always at v0), bounding delta replay. The delta is
    * written ONLY when replaying it over the parent provably reproduces
    * the intended entry/dv lists exactly (order included) — any
    * reordering op falls back to a full manifest, so replay correctness
    * never depends on op-specific ordering conventions. `txnDelta` is
    * THIS commit's markers; the full form folds them over the parent's
    * cumulative map (the O(head) [[lastTxn]] contract). */
  private def tryCommit(v: Long, entries: Seq[Entry],
                        dvs: Seq[String],
                        renames: Seq[(String, String)],
                        txnDelta: Map[String, Long],
                        parent: Option[Manifest]): Boolean = {
    val ts = System.currentTimeMillis()
    val op = ManagedTable.currentOp.value
    def full: String = fullManifestJson(Manifest(v, ts, entries, dvs,
      renames, parent.map(_.txn).getOrElse(Map.empty) ++ txnDelta, op))
    val interval = ManagedTable.checkpointInterval(spark)
    val body: String = parent match {
      case Some(p) if p.version == v - 1 && interval > 1 && v % interval != 0 =>
        val eSet = entries.toSet
        val pESet = p.entries.toSet
        val remove = p.entries.filterNot(eSet)
        val add = entries.filterNot(pESet)
        val dvSet = dvs.toSet
        val pDvSet = p.dvs.toSet
        val dvRemove = p.dvs.filterNot(dvSet)
        val dvAdd = dvs.filterNot(pDvSet)
        val reconstructs =
          (p.entries.filterNot(remove.toSet) ++ add) == entries &&
            (p.dvs.filterNot(dvRemove.toSet) ++ dvAdd) == dvs
        if (!reconstructs) full
        else {
          val renJson = if (renames == p.renames) ""
            else s""","renames":${renamesJson(renames)}"""
          s"""{"version":$v,"timestamp":$ts,"parent":${v - 1}""" +
            (if (add.isEmpty) "" else s""","add":${add.map(entryJson).mkString("[", ",", "]")}""") +
            (if (remove.isEmpty) "" else s""","remove":${remove.map(entryJson).mkString("[", ",", "]")}""") +
            (if (dvAdd.isEmpty) "" else s""","dvAdd":${dvAdd.map(js).mkString("[", ",", "]")}""") +
            (if (dvRemove.isEmpty) "" else s""","dvRemove":${dvRemove.map(js).mkString("[", ",", "]")}""") +
            renJson + txnJson(txnDelta) + s""","op":${js(op)}}"""
        }
      case _ => full
    }
    val won = FsUtils.writeTextIfAbsent(spark, s"$logDir/$v.json", body)
    // refresh the _last_checkpoint hint AFTER the manifest is durable —
    // readers probing forward from it must always find the named version
    if (won) writeVersionHint(v)
    won
  }

  /** Blind snapshot commit (clean_write / restore / append-rebase): the
    * entries do not derive from the snapshot they land on, so losing a
    * version-number race is harmless — take the next number and retry
    * until the manifest lands. */
  private def commitEntries(entries: Seq[Entry],
                            dvs: Seq[String] = Nil,
                            renames: Option[Seq[(String, String)]] = None,
                            txn: Map[String, Long] = Map.empty): Long = {
    var tries = 0
    // None = inherit the head's renames (re-resolved per attempt so a
    // racing rename is never silently shed); Some = set them outright
    // (clean_write resets, restore restores the target's, rename extends).
    // txn markers are CUMULATIVE in materialized snapshots (delta replay
    // folds parent ++ delta; full manifests store the folded map) so
    // [[lastTxn]] resolves from the head manifest alone. The head is
    // re-read per attempt so renames, markers and the delta diff always
    // fold over the manifest this commit actually lands on.
    var h = lastManifest()
    var v = h.map(_.version + 1).getOrElse(0L)
    def resolved = renames.getOrElse(h.map(_.renames).getOrElse(Nil))
    while (!tryCommit(v, entries, dvs, resolved, txn, h)) {
      tries += 1
      if (tries > 1000) throw new java.io.IOException(
        s"commit contention on $path: gave up after $tries attempts")
      h = lastManifest()
      v = h.map(_.version + 1).getOrElse(0L)
    }
    v
  }

  /** Compare-and-swap commit for read-modify-write operations: `entries`
    * were computed against snapshot `base`, so they are valid ONLY as
    * version base+1. A concurrent writer winning that version number
    * means this operation read a snapshot that is no longer current →
    * [[ManagedTable.ConcurrentWriteException]], and [[withCommitRetry]]
    * re-runs the whole operation against the new snapshot. This is
    * Delta's optimistic-concurrency loop with recompute-on-conflict in
    * place of logical conflict classification — always serializable,
    * never a silent lost update. */
  private def commitAgainst(base: Option[Long], entries: Seq[Entry],
                            dvs: Seq[String] = Nil,
                            renames: Option[Seq[(String, String)]] = None,
                            txn: Map[String, Long] = Map.empty): Long = {
    val v = base.map(_ + 1).getOrElse(0L)
    // None = carry the BASE snapshot's renames forward (the op was
    // computed against that snapshot, so its mapping is the valid one);
    // txn markers fold over the base's cumulative map (see commitEntries)
    val bm = base.flatMap(manifestAt)
    val resolved = renames.getOrElse(bm.map(_.renames).getOrElse(Nil))
    if (!tryCommit(v, entries, dvs, resolved, txn, bm))
      throw new ManagedTable.ConcurrentWriteException(path, base)
    v
  }

  /** Bounded re-run loop around a read-modify-write operation body whose
    * commit is a [[commitAgainst]] CAS. */
  private def withCommitRetry[T](op: String)(body: => T): T =
    ManagedTable.currentOp.withValue(op) {
      var last: ManagedTable.ConcurrentWriteException = null
      var attempt = 0
      while (attempt < ManagedTable.MaxCommitAttempts) {
        try return body
        catch { case e: ManagedTable.ConcurrentWriteException =>
          last = e; attempt += 1 }
      }
      throw new java.io.IOException(
        s"$op on $path lost ${ManagedTable.MaxCommitAttempts} optimistic-commit races", last)
    }
}

object ManagedTable {
  /** Ceiling on the pruned file list collected to the driver by
    * [[ManagedTable.readWhere]]'s stats skipping: when more than this
    * many files survive the stats filter, pruning is skipped for the
    * entry and the scan enumerates the directory itself (Spark's
    * InMemoryFileIndex lists large dirs with a distributed job). At
    * ~150 bytes/path this bounds the list at ~40 MB; a selection keeping
    * more files than this prunes too little to pay for shipping the
    * paths through the driver. Overridable per session with
    * `graft.prune.maxFiles`. Measured: see PLANS.md (stats-prune cap). */
  val MaxPruneFiles = 262144

  private[table] def maxPruneFiles(spark: SparkSession): Int =
    spark.conf.getOption("graft.prune.maxFiles").map(_.toInt)
      .getOrElse(MaxPruneFiles)

  private[table] case class Entry(dir: String, base: Option[String])
  private[table] case class Manifest(version: Long, timestamp: Long,
                                     entries: Seq[Entry],
                                     dvs: Seq[String] = Nil,
                                     renames: Seq[(String, String)] = Nil,
                                     txn: Map[String, Long] = Map.empty,
                                     op: String = "")

  /** One delta-encoded commit as parsed from disk: the ACTIONS against
    * the parent snapshot (version-1). `renames` is Some only when the
    * commit SET the mapping (None inherits); `txn` is this commit's
    * markers only (the fold keeps the materialized map cumulative). */
  private[table] case class DeltaRecord(version: Long, timestamp: Long,
                                        add: Seq[Entry], remove: Seq[Entry],
                                        dvAdd: Seq[String],
                                        dvRemove: Seq[String],
                                        renames: Option[Seq[(String, String)]],
                                        txn: Map[String, Long], op: String)

  /** Live DV sidecar dirs allowed per snapshot before a vectorized DML
    * op merges the set into one ([[compactedDvs]]). 32 keeps read-side
    * sidecar listing trivial while amortizing the merge to ~3% of DML
    * ops. Overridable per session with `graft.table.dvCompactThreshold`
    * (specs use a small value to exercise the merge cheaply). */
  val DefaultDvCompactThreshold = 32

  private[table] def dvCompactThreshold(spark: SparkSession): Int =
    math.max(1, spark.conf.getOption("graft.table.dvCompactThreshold")
      .map(_.toInt).getOrElse(DefaultDvCompactThreshold))

  /** Fault-injection seam for the chain-walk specs: called with the
    * parent version about to be read during a delta-chain walk. Lets a
    * spec run a REAL vacuum inside the exact repair-then-reap window the
    * walk can race with (no sleep-based scheduling luck). No-op in
    * production — one volatile read per chain step. */
  private[table] val chainWalkHook =
    new java.util.concurrent.atomic.AtomicReference[Long => Unit](_ => ())

  /** Commits between FULL (self-contained) manifests in the log: every
    * Nth version is written full, the rest as O(changed dirs) action
    * deltas, so head resolution replays at most N-1 deltas onto the
    * nearest checkpoint while an append-heavy table's cumulative commit
    * metadata stays O(dirs·versions/N) instead of O(dirs·versions)
    * (round-10 verdict #1). Overridable per session with
    * `graft.table.checkpointInterval`; 1 = every commit full (the
    * pre-round-11 behavior). */
  val DefaultCheckpointInterval = 16

  private[table] def checkpointInterval(spark: SparkSession): Int =
    math.max(1, spark.conf.getOption("graft.table.checkpointInterval")
      .map(_.toInt).getOrElse(DefaultCheckpointInterval))

  /** Operation name the in-flight commit stamps into its manifest
    * (`DESCRIBE HISTORY`'s operation column). Thread-local so concurrent
    * writers on one JVM each record their own op. */
  private val currentOp = new scala.util.DynamicVariable[String]("commit")

  /** Tombstone prefix for dropped columns: a drop is a rename to a name
    * reads always exclude, so old data dirs keep their files untouched
    * and Catalyst's column pruning keeps the dropped bytes unread. */
  private[table] val DroppedPrefix = "__graft_dropped_"

  /** Hidden hive-partition column carrying the bucket transform's
    * `pmod(hash(key), n)` value ([[ManagedTable.setBucket]]). Reserved:
    * batches may not use the name; public reads never surface it. */
  val BucketCol = "__gbucket"

  /** The bucket transform's layout contract: key column, bucket count and
    * the CANONICAL key type every side hashes at. */
  case class BucketSpec(column: String, n: Int,
                        keyType: org.apache.spark.sql.types.DataType) {
    /** The single bucket-id expression all sides share — write layout,
      * DML touched-bucket discovery, compaction clustering. (Lookup
      * literals evaluate the same cast+hash constant-side in
      * [[DataSkipping.bucketOfLiteral]].) */
    def idOf(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      pmod(hash(key.cast(keyType)), lit(n))
  }

  /** Attempts a read-modify-write operation makes before giving up under
    * sustained commit contention. */
  val MaxCommitAttempts = 10

  /** An optimistic commit lost its race: the snapshot the operation was
    * computed against is no longer the table's head. Public ops catch and
    * re-run internally up to [[MaxCommitAttempts]] times; seeing this
    * escape means sustained multi-writer contention on one table. */
  final class ConcurrentWriteException(path: String, base: Option[Long])
    extends RuntimeException(
      s"concurrent update on $path: snapshot ${base.fold("<empty>")(v => s"v$v")} is no longer current")

  def apply(spark: SparkSession, path: String): ManagedTable =
    new ManagedTable(spark, path)
}
