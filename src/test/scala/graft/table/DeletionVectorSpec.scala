package graft.table

import java.nio.file.Files

import graft.SparkSuite

/** Deletion-vector DML: row-level DELETE/UPDATE/MERGE in O(matched rows)
  * with ZERO data-file rewrites (Delta's DV cost model — reference
  * batch_delta.py rewrites files; our sidecar beats it at sparse-delete
  * scale). The invariants under test:
  *   - vectored rows disappear from every read path (read, readVersion,
  *     readWhere, registerAs view) without touching data files;
  *   - rewrite ops (optimize, delete, updateWhere) MATERIALIZE vectors
  *     rather than resurrect rows;
  *   - vacuum reaps sidecars once no retained manifest references them.
  */
class DeletionVectorSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-dv").toString

  private def fileMap(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(base).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => base.relativize(p).toString -> java.nio.file.Files.size(p))
      .toMap
  }

  test("deleteVectorized removes rows with zero data-file rewrites") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.write(Seq.tabulate(20)(i => (i, s"v$i")).toDF("id", "v"))
    val d0 = dataDirOf(root, 0)
    val before = fileMap(d0)

    t.deleteVectorized("id % 2 = 0")

    // data files byte-identical — only a sidecar was written
    assert(fileMap(d0) === before)
    val (dvDirs, dvRows) = t.dvInfo()
    assert(dvDirs === 1 && dvRows === 10)
    assert(t.read().as[(Int, String)].collect().map(_._1).sorted
      === (1 until 20 by 2).toArray)
    // time travel below the DV commit sees every row
    assert(t.readVersion(0).count() === 20)
  }

  test("deleteVectorized stacks across commits and readWhere subtracts them") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq.tabulate(10)(i => (i, i * 100)).toDF("id", "x"))
    t.deleteVectorized("id < 3")
    t.deleteVectorized("id >= 8")
    assert(t.dvInfo()._1 === 2)
    assert(t.read().count() === 5)
    // filtered read must not resurrect vectored rows matching the filter
    assert(t.readWhere("id < 5").as[(Int, Int)].collect().map(_._1).sorted
      === Array(3, 4))
  }

  test("updateVectorized rewrites no files; matched rows get new images") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    val before = fileMap(dataDirOf(root, 0))

    t.updateVectorized("id <= 2", Map("v" -> "upper(v)"))

    assert(fileMap(dataDirOf(root, 0)) === before)
    assert(t.read().as[(Int, String)].collect().sortBy(_._1).toSeq
      === Seq((1, "A"), (2, "B"), (3, "c")))
    // idempotence of the no-match path: a fresh no-op version, no sidecar
    val dvBefore = t.dvInfo()
    t.updateVectorized("id = 99", Map("v" -> "'x'"))
    assert(t.dvInfo() === dvBefore)
  }

  test("mergeVectorized matches merge semantics without touching files") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.write(Seq((1, "old"), (2, "keep")).toDF("id", "v"))
    val before = fileMap(dataDirOf(root, 0))

    t.mergeVectorized(Seq((1, "new"), (3, "ins")).toDF("id", "v"),
      "source.id = updates.id")

    assert(fileMap(dataDirOf(root, 0)) === before)
    assert(t.read().as[(Int, String)].collect().sortBy(_._1).toSeq
      === Seq((1, "new"), (2, "keep"), (3, "ins")))
    // absent-table path degrades to a plain first write
    val t2 = ManagedTable(spark, tmp() + "/t2")
    t2.mergeVectorized(Seq((9, "x")).toDF("id", "v"), "source.id = updates.id")
    assert(t2.read().count() === 1 && t2.dvInfo() === ((0, 0L)))
  }

  test("vectorized-DML-only maintenance keeps the live sidecar set bounded") {
    // VERDICT r11 #4: without compaction, N vectorized DML ops = N
    // sidecar dirs and every read anti-joins the ever-growing union.
    // compactedDvs merges the set whenever an op would push it past the
    // threshold, so the live count is bounded at ANY DML count while old
    // snapshots keep their (pre-merge) sidecars for time travel.
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    spark.conf.set("graft.table.dvCompactThreshold", "4")
    try {
      t.write(Seq.tabulate(200)(i => (i, s"v$i")).toDF("id", "v"))
      val dirCounts = (1 to 50).map { i =>
        t.deleteVectorized(s"id = ${i - 1}")
        t.dvInfo()._1
      }
      // live set never exceeds the threshold — 50 DML ops, yet every
      // snapshot's read plans a <=4-dir sidecar scan
      assert(dirCounts.max <= 4, s"sidecar count grew: $dirCounts")
      assert(dirCounts.count(_ == 1) >= 10) // the merges actually happened
      // every deleted position survives the merges
      assert(t.dvInfo()._2 === 50)
      assert(t.read().count() === 150)
      assert(t.read().agg(org.apache.spark.sql.functions.min("id"))
        .as[Int].head() === 50)
      // time travel: an old snapshot still resolves through its own
      // (since-replaced) sidecars
      assert(t.readVersion(10).count() === 190)
      // replaced sidecar dirs linger for time travel until vacuum; the
      // reap keeps exactly the head's referenced dirs
      val dvRoot = java.nio.file.Paths.get(root, "_graft_dv")
      def onDisk = java.nio.file.Files.list(dvRoot).count().toInt
      assert(onDisk > 4)
      Thread.sleep(20)
      t.vacuum(0, enforceRetention = false)
      assert(onDisk === t.dvInfo()._1)
      assert(t.read().count() === 150)
    } finally spark.conf.unset("graft.table.dvCompactThreshold")
  }

  test("optimize materializes deletion vectors and clears them") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq.tabulate(10)(i => (i, s"v$i")).toDF("id", "v"))
    t.deleteVectorized("id >= 5")
    t.optimize()
    assert(t.dvInfo() === ((0, 0L)))
    assert(t.read().as[(Int, String)].collect().map(_._1).sorted
      === (0 until 5).toArray)
  }

  test("full-rewrite delete and updateWhere after DVs do not resurrect rows") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq.tabulate(10)(i => (i, i)).toDF("id", "x"))
    t.deleteVectorized("id = 0")
    t.delete("id > 7") // full rewrite path reads the DV-subtracted snapshot
    assert(t.read().as[(Int, Int)].collect().map(_._1).sorted
      === (1 to 7).toArray)
    t.deleteVectorized("id = 1")
    t.updateWhere("id = 2", Map("x" -> "-1"))
    val rows = t.read().as[(Int, Int)].collect().toMap
    assert(!rows.contains(1) && rows(2) === -1)
  }

  test("registerAs view subtracts deletion vectors") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq.tabulate(6)(i => (i, s"v$i")).toDF("id", "v"))
    t.deleteVectorized("id IN (1, 4)")
    t.registerAs("graft_dv_db", "tv")
    val got = spark.table("graft_dv_db.tv").as[(Int, String)]
      .collect().map(_._1).sorted
    assert(got === Array(0, 2, 3, 5))
    assert(spark.table("graft_dv_db.tv").columns.toSeq === Seq("id", "v"))
  }

  test("cloneTo and restore carry deletion vectors") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq.tabulate(6)(i => (i, i)).toDF("id", "x"))
    t.deleteVectorized("id < 2") // v1: dv present
    val clone = t.cloneTo(tmp() + "/c")
    assert(clone.read().count() === 4)
    t.delete("id = 5") // v2: full rewrite materializes
    t.restore(1)       // back to the DV'd snapshot
    assert(t.read().as[(Int, Int)].collect().map(_._1).sorted
      === Array(2, 3, 4, 5))
  }

  test("streamAppends refuses a table with live deletion vectors") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq((1, "a")).toDF("id", "v"))
    t.deleteVectorized("id = 1")
    val e = intercept[IllegalArgumentException](t.streamAppends())
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("vacuum reaps sidecars no retained manifest references") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.write(Seq.tabulate(8)(i => (i, i)).toDF("id", "x"))
    t.deleteVectorized("id < 4")
    t.optimize() // materializes: current manifest has no dv refs
    assert(new java.io.File(s"$root/_graft_dv").listFiles().nonEmpty)
    t.vacuum(0, enforceRetention = false)
    val left = Option(new java.io.File(s"$root/_graft_dv").listFiles())
      .map(_.length).getOrElse(0)
    assert(left === 0)
    assert(t.read().count() === 4) // snapshot unharmed
  }

  test("vacuum keeps sidecars the current manifest still references") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.write(Seq.tabulate(8)(i => (i, i)).toDF("id", "x"))
    t.deleteVectorized("id < 4")
    t.vacuum(0, enforceRetention = false)
    assert(t.dvInfo()._2 === 4)
    assert(t.read().count() === 4)
  }
}
