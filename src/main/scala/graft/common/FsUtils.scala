package graft.common

import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem` path utilities replacing the reference's `S3Path`
  * (reference getl/common/s3path.py, getl/common/utils.py). Works uniformly
  * for file://, hdfs:// and s3a:// — at cluster scale the same code lists
  * an S3 prefix; locally it lists a directory.
  */
object FsUtils {

  def hadoopConf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  private def fs(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  def readText(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val in = fs(path, hadoopConf(spark)).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  def writeText(spark: SparkSession, path: String, text: String): Unit = {
    val p = new Path(path)
    val out = fs(path, hadoopConf(spark)).create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write-then-rename so readers never observe a half-written file — the
    * commit primitive for manifest logs. (Rename is atomic on HDFS and
    * POSIX filesystems; object stores substitute a conditional-put in the
    * same position.) */
  def writeTextAtomic(spark: SparkSession, path: String, text: String): Unit = {
    val tmp = s"$path.tmp-${java.util.UUID.randomUUID}"
    writeText(spark, tmp, text)
    val f = fs(path, hadoopConf(spark))
    // the local ChecksumFileSystem writes a `.<name>.crc` sidecar next to
    // the tmp file; the NIO move below relocates only the data file, so
    // reap the sidecar or every atomic write leaks one crc forever
    val tmpP = new Path(tmp)
    val crc = new Path(tmpP.getParent, s".${tmpP.getName}.crc")
    if (f.getUri.getScheme == "file") {
      // atomic REPLACE: plain Hadoop rename won't overwrite an existing
      // destination on the local FS, so use rename(2) semantics directly
      import java.nio.file.{Files, Paths, StandardCopyOption}
      Files.move(Paths.get(new Path(tmp).toUri.getPath),
        Paths.get(new Path(path).toUri.getPath),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      if (f.exists(crc)) f.delete(crc, false)
    } else {
      // HDFS-likes: FileContext rename carries an explicit atomic
      // OVERWRITE option (FileSystem.rename's no-overwrite contract
      // would refuse the replace)
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        new Path(path).toUri, hadoopConf(spark))
      fc.rename(new Path(tmp), new Path(path),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Atomic put-if-absent — the optimistic-concurrency commit primitive
    * for manifest logs: exactly ONE of any number of concurrent callers
    * writing the same path wins (returns true); the rest observe the loss
    * (false) instead of silently overwriting. On file:// the winner is
    * decided by hard-link creation (link(2) fails EEXIST atomically —
    * POSIX rename would overwrite); on HDFS-like filesystems by rename's
    * no-overwrite contract (rename onto an existing destination returns
    * false). Object stores substitute a conditional-put (S3
    * If-None-Match) in the same position. */
  def writeTextIfAbsent(spark: SparkSession, path: String, text: String): Boolean = {
    val f = fs(path, hadoopConf(spark))
    val dst = new Path(path)
    if (f.exists(dst)) return false
    val tmpStr = s"$path.tmp-${java.util.UUID.randomUUID}"
    writeText(spark, tmpStr, text)
    val won =
      if (f.getUri.getScheme == "file") {
        import java.nio.file.{Files, Paths, FileAlreadyExistsException}
        try { Files.createLink(Paths.get(dst.toUri.getPath),
                               Paths.get(new Path(tmpStr).toUri.getPath)); true }
        catch { case _: FileAlreadyExistsException => false }
      } else f.rename(new Path(tmpStr), dst)
    // link winner + any loser still hold the tmp file; rename winner's tmp
    // is already gone (delete is then a harmless no-op)
    f.delete(new Path(tmpStr), false)
    won
  }

  def exists(spark: SparkSession, path: String): Boolean =
    fs(path, hadoopConf(spark)).exists(new Path(path))

  /** Test-visible counter of directory-LISTING operations — the
    * O(entries) metadata calls whose count the ManagedTable checkpoint
    * hint exists to bound (ManagedTableSpec pins the read path at zero
    * listings on a many-version log). Existence probes and single-file
    * reads are O(1) on any store and deliberately not counted. */
  val listingOps = new java.util.concurrent.atomic.AtomicLong()

  /** Re-run a metadata listing that raced a concurrent writer: Hadoop's
    * listing iterators stat each entry lazily, so a tmp/commit file
    * vanishing between readdir and stat (another writer finishing its
    * atomic rename) throws mid-iteration. The re-list observes a
    * consistent later state — bounded, and only metadata work. */
  private def relisting[T](body: => T): T = {
    var i = 0
    while (true) {
      try return body
      catch {
        // the vanishing-file race itself surfaces as FileNotFoundException
        // (an IOException, NOT a RuntimeException) from the lazy stat —
        // catching only RuntimeException would never engage the retry for
        // the exact case this wrapper exists for
        case e @ (_: RuntimeException | _: java.io.IOException) =>
          i += 1
          if (i >= 5) throw e
          Thread.sleep(10L * i)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Recursively list file paths under a prefix with a suffix filter —
    * the engine's analogue of the reference's paginated S3 listing
    * (s3path.py:80-106). Driver-side metadata op; the data itself is
    * never touched.
    */
  def listFiles(spark: SparkSession, prefix: String, suffix: String = ""): Seq[String] = relisting {
    listingOps.incrementAndGet()
    val f = fs(prefix, hadoopConf(spark))
    val p = new Path(prefix)
    if (!f.exists(p)) Nil
    else {
      val out = ArrayBuffer[String]()
      val it = f.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        val s = st.getPath.toString
        if (st.isFile && (suffix.isEmpty || s.endsWith(suffix))) out += s
      }
      out.toSeq
    }
  }

  /** Recursive (path, byteSize) listing of data files under a prefix —
    * marker files (`_SUCCESS`, checksums) excluded. Drives small-file
    * detection for incremental compaction. Metadata-only. */
  def listFilesWithSize(spark: SparkSession, prefix: String): Seq[(String, Long)] = relisting {
    listingOps.incrementAndGet()
    val f = fs(prefix, hadoopConf(spark))
    val p = new Path(prefix)
    if (!f.exists(p)) Nil
    else {
      val out = ArrayBuffer[(String, Long)]()
      val it = f.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
          out += ((st.getPath.toString, st.getLen))
      }
      out.toSeq
    }
  }

  /** Immediate children of a directory as (subdirectory names, file names).
    * One non-recursive metadata listing — used by the managed table's
    * partition-pruned merge to enumerate hive partition dirs. */
  def listChildren(spark: SparkSession, dir: String): (Seq[String], Seq[String]) = relisting {
    listingOps.incrementAndGet()
    val f = fs(dir, hadoopConf(spark))
    val p = new Path(dir)
    if (!f.exists(p)) (Nil, Nil)
    else {
      val st = f.listStatus(p).toSeq
      (st.filter(_.isDirectory).map(_.getPath.getName),
        st.filter(_.isFile).map(_.getPath.getName))
    }
  }

  /** Immediate child DIRECTORIES of `dir` as (name, modificationTimeMs). */
  def listChildDirsWithModTime(spark: SparkSession, dir: String): Seq[(String, Long)] = relisting {
    listingOps.incrementAndGet()
    val f = fs(dir, hadoopConf(spark))
    val p = new Path(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.filter(_.isDirectory)
      .map(st => (st.getPath.getName, st.getModificationTime))
  }

  /** Delete paths (files or directories) — reference `delete_files`
    * (utils.py:55-73). */
  def deleteFiles(spark: SparkSession, paths: Seq[String]): Unit =
    paths.foreach { s => fs(s, hadoopConf(spark)).delete(new Path(s), true) }

  /** Copy (source, target) pairs — reference `copy_keys` (utils.py:97-117). */
  def copyKeys(spark: SparkSession, pairs: Seq[(String, String)]): Unit =
    pairs.foreach { case (src, dst) =>
      val conf = hadoopConf(spark)
      val sp = new Path(src)
      val dp = new Path(dst)
      val sf = sp.getFileSystem(conf)
      if (!sf.exists(sp)) throw new java.io.FileNotFoundException(src)
      FileUtil.copy(sf, sp, dp.getFileSystem(conf), dp, false, true, conf)
    }

  /** Copy then delete sources — reference `copy_and_cleanup` (utils.py:76-94). */
  def copyAndCleanup(spark: SparkSession, pairs: Seq[(String, String)]): Unit = {
    copyKeys(spark, pairs)
    deleteFiles(spark, pairs.map(_._1))
  }
}
