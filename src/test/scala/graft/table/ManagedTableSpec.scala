package graft.table

import java.nio.file.Files

import graft.SparkSuite

class ManagedTableSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-mt").toString

  test("write / read / append round-trip with version history") {
    val t = ManagedTable(spark, tmp() + "/t")
    assert(!t.exists)
    assert(t.read().isEmpty)
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(t.currentVersion.contains(0L))
    t.append(Seq((3, "c")).toDF("id", "v"))
    assert(t.currentVersion.contains(1L))
    assert(t.read().count() === 3)
    // previous snapshot unchanged — time travel
    assert(t.readVersion(0).count() === 2)
  }

  test("merge upsert = whenMatchedUpdateAll + whenNotMatchedInsertAll") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq((1, "old"), (2, "keep")).toDF("id", "v"))
    t.merge(Seq((1, "new"), (3, "ins")).toDF("id", "v"),
      "source.id == updates.id")
    val rows = t.read().as[(Int, String)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1, "new"), (2, "keep"), (3, "ins")))
  }

  test("merge insert-only leaves matched target rows untouched") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq((1, "old")).toDF("id", "v"))
    t.merge(Seq((1, "new"), (2, "ins")).toDF("id", "v"),
      "source.id == updates.id", upsert = false)
    val rows = t.read().as[(Int, String)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1, "old"), (2, "ins")))
  }

  test("updateWhere rewrites only matching rows") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.updateWhere("id = 1", Map("v" -> "'z'"))
    val rows = t.read().as[(Int, String)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1, "z"), (2, "b")))
  }

  test("versionAt picks the latest snapshot at or before a timestamp") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq(1).toDF("id"))
    val afterV0 = System.currentTimeMillis()
    Thread.sleep(5)
    t.write(Seq(1, 2).toDF("id"))
    assert(t.versionAt(afterV0).contains(0L))
    assert(t.versionAt(System.currentTimeMillis()).contains(1L))
    assert(t.versionAt(0L).isEmpty)
  }

  test("changesSince returns rows added after the starting timestamp") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    Thread.sleep(5)
    val mid = System.currentTimeMillis()
    Thread.sleep(5)
    t.append(Seq((3, "c")).toDF("id", "v"))
    assert(t.changesSince(mid).as[(Int, String)].collect().toSeq === Seq((3, "c")))
    // start before the first commit → full feed
    assert(t.changesSince(0L).count() === 3)
  }

  test("optimize compacts and zorder sorts; vacuum guards retention") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq.tabulate(100)(i => (i % 7, i)).toDF("k", "id").repartition(8))
    t.optimize(zorderBy = Seq("k"), targetPartitions = 2)
    assert(t.read().count() === 100)
    assertThrows[IllegalArgumentException](t.vacuum(1))
    t.vacuum(0, enforceRetention = false)
    // current snapshot survives GC
    assert(t.read().count() === 100)
    assert(t.history().size === 1)
  }

  test("partitioned snapshots prune partitions on filtered reads") {
    import org.apache.spark.sql.functions.col
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq.tabulate(60)(i => (s"p${i % 3}", i)).toDF("part", "id"),
      partitionBy = Seq("part"))
    val filtered = t.read().where(col("part") === "p1")
    assert(filtered.count() === 20)
    val scan = filtered.queryExecution.executedPlan.toString
    // the partition filter must reach the scan's directory pruning, not
    // run as a post-scan row filter over all partitions
    assert(scan.contains("PartitionFilters: [isnotnull(part"),
      s"expected partition pruning in:\n$scan")
  }

  test("registerAs exposes a catalog view over the current snapshot") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq((1, "a")).toDF("id", "v"))
    t.registerAs("graft_test_db", "reg_spec")
    assert(spark.sql("SELECT count(*) FROM graft_test_db.reg_spec").head().getLong(0) === 1L)
  }
}
