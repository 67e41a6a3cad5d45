package graft.table

import java.nio.file.Files

import graft.SparkSuite

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-zorder").toString

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("multi-column z-order prunes on BOTH columns; lexicographic only on the first") {
    // 64x64 independent grid: after clustering into 16 files, a narrow
    // range on either axis should touch only a strip of files
    val grid = spark.range(4096).selectExpr(
      "id", "CAST(id % 64 AS DOUBLE) AS x", "CAST(id DIV 64 AS DOUBLE) AS y")

    val tz = ManagedTable(spark, tmp() + "/z")
    tz.write(grid)
    tz.optimize(zorderBy = Seq("x", "y"), targetPartitions = 16)
    tz.collectStats()

    val xCond = "x >= 10.0 AND x < 18.0"
    val yCond = "y >= 10.0 AND y < 18.0"
    val (keptX, totalX) = tz.pruneInfo(xCond)
    val (keptY, totalY) = tz.pruneInfo(yCond)
    assert(totalX === 16 && totalY === 16)
    // a 1/8-wide strip on either axis must prune at least half the files
    assert(keptX <= 8, s"x-pruning too weak: $keptX/16")
    assert(keptY <= 8, s"y-pruning too weak: $keptY/16")
    assert(sortedRows(tz.readWhere(xCond)) === sortedRows(tz.read().where(xCond)))
    assert(sortedRows(tz.readWhere(yCond)) === sortedRows(tz.read().where(yCond)))

    // contrast: lexicographic clustering on (y, x) cannot prune x ranges
    val tl = ManagedTable(spark, tmp() + "/l")
    tl.write(grid)
    tl.optimize(zorderBy = Seq("y"), targetPartitions = 16)
    tl.collectStats()
    val (keptLexX, _) = tl.pruneInfo(xCond)
    assert(keptLexX === 16, s"every y-clustered file spans all x: $keptLexX")
  }

  test("z-order key handles nulls, constant columns and string columns") {
    val df = Seq(
      (Some(1.0), "a"), (Some(2.0), "b"), (None: Option[Double], "c"),
      (Some(4.0), "a")).toDF("v", "s").withColumn("k", org.apache.spark.sql.functions.lit(7))
    // no exception, one deterministic long per row
    val keyed = df.withColumn("z", ZOrder.zOrderKey(df, Seq("v", "s", "k")))
    val zs = keyed.select("z").collect().map(_.getLong(0))
    assert(zs.length === 4)
    assert(zs.forall(_ >= 0L))
    val again = df.withColumn("z", ZOrder.zOrderKey(df, Seq("v", "s", "k")))
      .select("z").collect().map(_.getLong(0))
    assert(zs.toSeq === again.toSeq)
  }

  test("timestamp z-order column ranks by epoch and stays pruneable") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(spark.range(1024).selectExpr(
      "id",
      "timestampadd(HOUR, CAST(id % 32 AS INT), TIMESTAMP '2024-01-01 00:00:00') AS ts",
      "CAST(id DIV 32 AS DOUBLE) AS m"))
    t.optimize(zorderBy = Seq("ts", "m"), targetPartitions = 8)
    t.collectStats()
    val cond = "ts < TIMESTAMP '2024-01-01 08:00:00'"
    val (kept, total) = t.pruneInfo(cond)
    assert(total === 8 && kept <= 4, s"kept=$kept")
    assert(t.readWhere(cond).count() === t.read().where(cond).count())
  }

  test("an all-null z-order column degrades to rank 0 instead of crashing") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq((1L, None: Option[Double]), (2L, None)).toDF("id", "gap")
      .coalesce(1))
    t.optimize(zorderBy = Seq("id", "gap")) // null bounds on gap
    assert(t.read().count() === 2)
  }
}
