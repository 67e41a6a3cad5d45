package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.table.ManagedTable

/** Scale evidence for the bucket transform (round 9): builds a bucketed
  * vs unbucketed copy of the sf tables' orders rows, then measures a
  * point lookup's files-scanned and wall time on each, plus the touched
  * dirs of a keyed merge. Numbers go to PLANS.md.
  * Run: sbt "Test/runMain graft.tools.ProbeBucket /root/testdata/sf0.1"
  */
object ProbeBucket {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val w = graft.common.Scratch.dir("probe", "bucket")
    graft.common.FsUtils.deleteFiles(spark, Seq(w))
    val orders = graft.Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey", "o_orderstatus", "round(o_totalprice,2) AS price")

    def filesScanned(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
        p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case f: FileSourceScanExec => Seq(f)
          case other => other.children.flatMap(scans)
        }
      scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // 64 buckets, 16 write tasks — the 100 TB shape in miniature
    val flat = ManagedTable(spark, s"$w/flat")
    flat.write(orders.repartition(16))
    val bucketed = ManagedTable(spark, s"$w/bucketed")
    bucketed.setBucket("o_orderkey", 64, org.apache.spark.sql.types.LongType)
    bucketed.write(orders.repartition(16))

    def totalFiles(t: ManagedTable): Long = filesScanned(t.read())

    // bloom sidecars on the flat copy: the sidecar-based alternative for
    // the same point-lookup problem (costs a collection pass, goes stale
    // on append until re-collected; buckets are structural and free)
    flat.collectBlooms(Seq("o_orderkey"))

    val key = orders.agg(max("o_orderkey")).head().getLong(0)
    for (_ <- 0 until 2) { // second iteration is the warm measurement
      val (fFlat, tFlat) = timed(filesScanned(flat.readWhere(s"o_orderkey = $key")))
      val (fB, tB) = timed(filesScanned(bucketed.readWhere(s"o_orderkey = $key")))
      println(f"[bucket] lookup flat+bloom: files=$fFlat%4d/${totalFiles(flat)}%4d " +
        f"wall=$tFlat%6.3fs | bucketed: files=$fB%4d/${totalFiles(bucketed)}%4d wall=$tB%6.3fs")
    }

    // keyed merge: 3 update keys → <=3 of 64 bucket dirs rewritten
    val updates = orders.where(col("o_orderkey").isin(key, key - 32, key - 64))
      .withColumn("price", round(col("price") + 1, 2))
    val (_, tm) = timed(bucketed.merge(updates, "source.o_orderkey == updates.o_orderkey"))
    val newest = graft.common.FsUtils.listChildren(spark, bucketed.path)._1
      .filter(_.startsWith("d")).map(d => s"${bucketed.path}/$d")
      .maxBy(d => new org.apache.hadoop.fs.Path(d).getName
        .stripPrefix("d").takeWhile(_.isDigit).toLong)
    val touched = graft.common.FsUtils.listChildren(spark, newest)._1
      .count(_.startsWith(ManagedTable.BucketCol + "="))
    val (_, tf) = timed(flat.merge(updates, "source.o_orderkey == updates.o_orderkey"))
    println(f"[bucket] merge 3 keys: bucketed wall=$tm%6.3fs touchedDirs=$touched/64 | " +
      f"flat full-rewrite wall=$tf%6.3fs")
    spark.stop()
  }
}
