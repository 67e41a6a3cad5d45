package graft.tools

import org.apache.spark.sql.SparkSession

import graft.table.ManagedTable

/** Scale evidence for footer-based stats collection (round 9): time the
  * scan-based vs footer-based passes over the same dir. Numbers go to
  * PLANS.md. Run: sbt "Test/runMain graft.tools.ProbeFooter /root/testdata/sf0.1"
  */
object ProbeFooter {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val w = graft.common.Scratch.dir("probe", "footer")
    graft.common.FsUtils.deleteFiles(spark, Seq(w))
    // a wide-ish lineitem copy in 64 files — the shape where the second
    // full data pass hurts
    import org.apache.spark.sql.functions.col
    val li = graft.Tables.lineitem(spark, sfDir)
    val scanT = ManagedTable(spark, s"$w/scan")
    scanT.write(li.repartitionByRange(64, col("l_orderkey")))
    val footT = ManagedTable(spark, s"$w/foot")
    footT.write(li.repartitionByRange(64, col("l_orderkey")))
    val bytes = graft.common.FsUtils
      .listFilesWithSize(spark, s"$w/scan").map(_._2).sum / (1024 * 1024)
    // bytes the footer pass touches, counted by the hadoop file-scheme FS
    // statistics (the raw ParquetFileReader path registers there; Spark's
    // vectored data scans do not, so the scan side's bytes are simply the
    // dir size — a full-dir aggregation reads the data by construction)
    def fsBytesRead(): Long = {
      import scala.jdk.CollectionConverters._
      org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala
        .filter(_.getScheme == "file").map(_.getBytesRead).sum
    }
    for (i <- 0 until 2) {
      graft.common.FsUtils.deleteFiles(spark,
        Seq(s"$w/scan/_graft_stats", s"$w/foot/_graft_stats"))
      val ts = timed(scanT.collectStats())
      val b1 = fsBytesRead()
      val tf = timed(footT.collectStatsFromFooters())
      val b2 = fsBytesRead()
      println(f"[footer] run$i: scan-based=$ts%6.2fs/${bytes}%dMB-data " +
        f"footer-based=$tf%6.2fs/${(b2 - b1) / 1024}%dKB (64 files)")
    }
    val cond = "l_orderkey <= 1000"
    val (ks, tots) = scanT.pruneInfo(cond)
    val (kf, totf) = footT.pruneInfo(cond)
    println(s"[footer] prune parity on '$cond': scan=$ks/$tots footer=$kf/$totf")
    spark.stop()
  }
}
