package graft.registry

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.common.FsUtils
import graft.runtime.BlockConfig
import graft.table.ManagedTable

/** Shared plumbing for the file-path registries (reference
  * getl/fileregistry/fileregistry_utils.py + s3_full_scan.py).
  *
  * State is a [[ManagedTable]] of `(file_path, [prefix_date,] date_lifted)`
  * rows. All operations are single Spark plans: anti-insert is a left-anti
  * join (AQE broadcasts the small side at runtime), and the lift
  * flush is one projection pass — the registry never iterates rows on the
  * driver except to hand the path list to `spark.read.load(paths:_*)`,
  * which is exactly the reference's coarse-grained file pruning.
  */
private[registry] abstract class PathRegistry(bconf: BlockConfig) extends FileRegistry {
  protected val spark: SparkSession = bconf.spark
  protected val basePath: String = bconf.props.getString("BasePath")
  protected val table = ManagedTable(spark, basePath)

  /** Driver-memory bound (`PathBatchSize`, optional): the reference
    * semantics hand EVERY pending path to `spark.read.load(paths: _*)`,
    * which means the path list must sit on the driver — at 100 TB with
    * millions of unprocessed files that list alone is a driver-heap
    * hazard (10⁷ paths × ~100 B ≈ 1 GB before read-path bookkeeping).
    * With `PathBatchSize: N` set, `load` hands out at most N pending
    * paths per lift (ordered by `file_path`, so draining is deterministic
    * and resumable) and `update()` marks ONLY the handed-out batch as
    * lifted — the remainder stays pending and the next scheduled lift
    * drains the next batch. Without the prop, behavior is the reference's
    * all-pending hand-out (`RegistriesSpec` pins a 100k-path listing
    * through that path inside the suite's fixed heap). */
  private val batchSize: Option[Int] =
    if (bconf.props.exists("PathBatchSize"))
      Some(bconf.props.getInt("PathBatchSize")) else None

  /** Full rows of the last handed-out batch (bounded by `batchSize`),
    * retained so `update()` can target exactly these paths. */
  private var handedOut: Option[Seq[org.apache.spark.sql.Row]] = None

  protected def emptySchema: StructType

  /** Rows handed out but not yet marked lifted (`date_lifted IS NULL`). */
  protected def pendingPaths(): Seq[String] = {
    val cur = if (table.exists) table.read() else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
    val pending = cur.filter(col("date_lifted").isNull)
    batchSize match {
      case None =>
        pending.select("file_path").collect().map(_.getString(0)).toSeq
      case Some(n) =>
        // orderBy + limit is a TakeOrdered top-k: per-partition heads
        // merge on the driver, so even the listing stage never collects
        // more than n rows
        val rows = pending.orderBy(col("file_path")).limit(n).collect().toSeq
        handedOut = Some(rows)
        rows.map(_.getAs[String]("file_path"))
    }
  }

  /** Insert rows for paths not already present (reference
    * fileregistry_utils.py:14-32 merge whenNotMatchedInsertAll). */
  protected def antiInsert(rows: DataFrame): Unit =
    if (!table.exists) { table.write(rows); () }
    else { table.merge(rows, "source.file_path == updates.file_path", upsert = false); () }

  /** Mark the handed-out paths as lifted now (reference s3_full_scan.py
    * `update()` → Delta UPDATE date_lifted = now()). Unbatched, that is
    * everything pending; with `PathBatchSize` set, ONLY the batch the
    * last `load` returned — the rest stays pending for the next lift. */
  override def update(): Unit =
    if (table.exists) {
      handedOut match {
        case Some(rows) =>
          if (rows.nonEmpty) {
            import scala.jdk.CollectionConverters._
            val upd = spark
              .createDataFrame(rows.asJava, rows.head.schema)
              .withColumn("date_lifted", current_timestamp())
            table.merge(upd, "source.file_path == updates.file_path")
          }
          handedOut = None
        case None =>
          // batched mode NEVER falls back to stamping everything: an
          // update() that fires before (or without) the load that hands
          // a batch out must be a no-op — marking every pending path
          // lifted would permanently skip files no reader ever saw
          if (batchSize.isEmpty)
            table.updateWhere("date_lifted IS NULL",
              Map("date_lifted" -> "current_timestamp()"))
      }
      ()
    }
}

/** Full-prefix scan registry (reference getl/fileregistry/s3_full_scan.py):
  * list every file under the prefix, anti-insert unknown paths, return the
  * not-yet-lifted ones. */
final class FullScan(bconf: BlockConfig) extends PathRegistry(bconf) {
  import spark.implicits._

  protected def emptySchema: StructType = StructType(Seq(
    StructField("file_path", StringType),
    StructField("date_lifted", TimestampType)))

  override def load(path: String, suffix: String): Seq[String] = {
    val found = FsUtils.listFiles(spark, path, suffix)
    if (found.nonEmpty) {
      val rows = found.toDF("file_path")
        .withColumn("date_lifted", lit(null).cast(TimestampType))
      antiInsert(rows)
    }
    pendingPaths()
  }
}

object FullScan {
  def apply(bconf: BlockConfig): FullScan = new FullScan(bconf)
}

/** Date-partition-aware scan (reference s3_date_prefix_scan.py): enumerate
  * strftime-formatted prefixes from `max(prefix_date)` (else
  * `DefaultStartDate`) to now, list each, anti-insert, return pending.
  * Bounding the listing to the date window is the scale win — at 100 TB the
  * object store is never listed outside `[watermark, now]`. */
final class DatePrefixScan(bconf: BlockConfig) extends PathRegistry(bconf) {
  import DatePrefixScan._
  import spark.implicits._

  private val partitionFormat = bconf.props.getString("PartitionFormat")
  // YAML parsers auto-type unquoted `2026-07-31` as a Date — accept both
  private val defaultStart = bconf.props.get[Any]("DefaultStartDate") match {
    case d: java.util.Date =>
      d.toInstant.atZone(ZoneOffset.UTC).toLocalDate.toString
    case s => String.valueOf(s)
  }

  protected def emptySchema: StructType = StructType(Seq(
    StructField("file_path", StringType),
    StructField("prefix_date", TimestampType),
    StructField("date_lifted", TimestampType)))

  override def load(path: String, suffix: String): Seq[String] = {
    val start: LocalDateTime =
      if (table.exists)
        Option(table.read().agg(max("prefix_date")).head().get(0))
          .map(ts => ts.asInstanceOf[java.sql.Timestamp].toLocalDateTime)
          .getOrElse(LocalDateTime.parse(defaultStart + "T00:00:00"))
      else LocalDateTime.parse(defaultStart + "T00:00:00")

    val prefixes = enumeratePrefixes(partitionFormat, start,
      LocalDateTime.now(ZoneOffset.UTC))
    val rows = prefixes.flatMap { case (prefixDate, rel) =>
      FsUtils.listFiles(spark, s"$path/$rel", suffix)
        .map(f => (f, java.sql.Timestamp.valueOf(prefixDate)))
    }
    if (rows.nonEmpty) {
      val df = rows.toDF("file_path", "prefix_date")
        .withColumn("date_lifted", lit(null).cast(TimestampType))
      antiInsert(df)
    }
    pendingPaths()
  }
}

object DatePrefixScan {
  def apply(bconf: BlockConfig): DatePrefixScan = new DatePrefixScan(bconf)

  /** Direct strftime expansion (the subset the reference supports,
    * s3_date_prefix_scan.py:169-222) — substituted per datetime so literal
    * text like `year=` never hits a pattern parser. */
  private def formatPrefix(fmt: String, dt: LocalDateTime): String =
    "%[YymdejHIMS]".r.replaceAllIn(fmt, m => m.matched match {
      case "%Y" => f"${dt.getYear}%04d"
      case "%y" => f"${dt.getYear % 100}%02d"
      case "%m" => f"${dt.getMonthValue}%02d"
      case "%d" => f"${dt.getDayOfMonth}%02d"
      case "%e" => dt.getDayOfMonth.toString
      case "%j" => f"${dt.getDayOfYear}%03d"
      case "%H" => f"${dt.getHour}%02d"
      case "%I" => f"${((dt.getHour + 11) % 12) + 1}%02d"
      case "%M" => f"${dt.getMinute}%02d"
      case "%S" => f"${dt.getSecond}%02d"
    })

  /** Finest granularity present in the format, as a step function. */
  private def stepOf(fmt: String): LocalDateTime => LocalDateTime = {
    if (fmt.contains("%S")) _.plusSeconds(1)
    else if (fmt.contains("%M")) _.plusMinutes(1)
    else if (fmt.contains("%H") || fmt.contains("%I")) _.plusHours(1)
    else if (fmt.contains("%d") || fmt.contains("%e") || fmt.contains("%j")) _.plusDays(1)
    else if (fmt.contains("%m")) _.plusMonths(1)
    else if (fmt.contains("%Y") || fmt.contains("%y")) _.plusYears(1)
    else throw new IllegalArgumentException(s"No strftime codes in: $fmt")
  }

  /** All (dateTime, formattedPrefix) pairs in `[start, end]` at the format's
    * granularity — driver-side metadata enumeration, bounded by the window. */
  def enumeratePrefixes(fmt: String, start: LocalDateTime, end: LocalDateTime): Seq[(LocalDateTime, String)] = {
    val step = stepOf(fmt)
    Iterator.iterate(start)(step)
      .takeWhile(!_.isAfter(end))
      .map(dt => dt -> formatPrefix(fmt, dt))
      .toSeq
  }
}

/** Row-level incremental registry over [[ManagedTable]] versions (reference
  * getl/fileregistry/delta_diff.py): keeps a single `version_date`
  * watermark; `loadNewRowsOnly` diffs the table's snapshot at the watermark
  * against now with a LEFT ANTI join on `JoinOnFields`; `update()` advances
  * the watermark to this job's start time. */
final class SnapshotDiff(bconf: BlockConfig) extends FileRegistry {
  private val spark = bconf.spark
  private val basePath = bconf.props.getString("BasePath")
  private val joinFields = bconf.props.getStringSeq("JoinOnFields")
  private val watermark = ManagedTable(spark, basePath)
  private val jobStart = Instant.now()

  override def load(path: String, suffix: String): Seq[String] =
    throw new UnsupportedOperationException("SnapshotDiff is row-level; use loadNewRowsOnly")

  override def loadNewRowsOnly(path: String): DataFrame = {
    val target = ManagedTable(spark, path)
    if (!target.exists) return spark.emptyDataFrame
    val current = target.read()
    lastLiftTs.flatMap(target.versionAt) match {
      case None => current // watermark precedes first commit → full load
      case Some(v) =>
        // the diff is one shuffle anti-join on the key fields; at scale both
        // sides are parquet scans pruned to the key columns by Catalyst
        current.join(target.readVersion(v), joinFields, "left_anti")
    }
  }

  override def update(): Unit = {
    import spark.implicits._
    watermark.write(
      Seq(new java.sql.Timestamp(jobStart.toEpochMilli)).toDF("version_date"))
    ()
  }

  private def lastLiftTs: Option[Long] =
    if (!watermark.exists) None
    else watermark.read().select("version_date").collect().headOption
      .map(_.getTimestamp(0).getTime)
}

object SnapshotDiff {
  def apply(bconf: BlockConfig): SnapshotDiff = new SnapshotDiff(bconf)
}
