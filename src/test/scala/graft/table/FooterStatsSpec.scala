package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Footer-based stats collection ([[DataSkipping.fileStatsFromFooters]] /
  * [[ManagedTable.collectStatsFromFooters]]): identical sidecar semantics
  * to the scan-based pass with ZERO data bytes read. The cross-check
  * against [[DataSkipping.fileStats]] is the load-bearing assertion — a
  * bound converted wrong silently mis-prunes. */
class FooterStatsSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-footer").toString

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val c = udf(DataSkipping.canonPath _)
    df.withColumn(DataSkipping.PathCol, c(col(DataSkipping.PathCol)))
      .collect()
      // parquet writers record floating ZERO bounds as -0.0 min / +0.0 max
      // (parquet-format's recommendation); -0.0 == 0.0 in SQL comparisons,
      // so the bounds prune identically — normalize for the text compare
      .map(_.toString.replace("-0.0", "0.0")).sorted.toSeq
  }

  test("footer stats equal scan stats across every supported type") {
    val dir = tmp() + "/d"
    // timestamps must be written as TIMESTAMP_MICROS to carry footer
    // bounds — the INT96 default never records usable chunk statistics
    // (the INT96 test below pins that they are then DROPPED, not wrong)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try spark.range(1000).selectExpr(
        "id AS l",
        "CAST(id AS INT) AS i",
        "CAST(id AS SMALLINT) AS sh",
        "CAST(id % 120 AS TINYINT) AS by",
        "CAST(id AS DOUBLE) / 7 AS d",
        "CAST(id AS FLOAT) * 2 AS f",
        "id % 2 = 0 AS b",
        "DATE_ADD(DATE '2020-01-01', CAST(id % 365 AS INT)) AS dt",
        "TIMESTAMP '2021-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts",
        "IF(id % 3 = 0, NULL, id * 5) AS withnulls")
      .repartitionByRange(7, $"id")
      .write.parquet(dir)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val scan = DataSkipping.fileStats(spark, dir, None)
    val foot = DataSkipping.fileStatsFromFooters(spark, dir, None)
    // float/double never get footer bounds: parquet writers exclude NaN
    // from float min/max while Spark orders NaN above every double, so a
    // footer bound could prune a file whose NaN row matches
    assert(!foot.columns.exists(c => c.endsWith("_d") || c.endsWith("_f")))
    val shared = scan.columns.filter(foot.columns.contains)
    assert(foot.columns.sorted.toSeq === shared.sorted.toSeq)
    assert(canon(foot.select(shared.map(col).toIndexedSeq: _*)) ===
      canon(scan.select(shared.map(col).toIndexedSeq: _*)))
  }

  test("all-null columns, float exclusion and 0-row semantics") {
    val dir = tmp() + "/d"
    spark.range(100).selectExpr(
        "id", "CAST(NULL AS BIGINT) AS allnull", "CAST(id AS DOUBLE) AS s")
      .coalesce(2).write.parquet(dir)
    val foot = DataSkipping.fileStatsFromFooters(spark, dir, None)
    // doubles never get footer bounds (NaN gap); the convention for an
    // all-null column is null min/max + exact null count
    assert(!foot.columns.exists(_.endsWith("_s")))
    val r = foot.select(DataSkipping.minCol("allnull"),
      DataSkipping.maxCol("allnull"), DataSkipping.nullsCol("allnull"),
      DataSkipping.RowsCol).collect()
    assert(r.forall(x => x.isNullAt(0) && x.isNullAt(1) && x.getLong(2) === x.getLong(3)))
    // scan-based agrees on the shared columns
    val scan = DataSkipping.fileStats(spark, dir, None, Seq("id", "allnull"))
    val footShared = DataSkipping.fileStatsFromFooters(spark, dir, None,
      Seq("id", "allnull"))
    assert(canon(footShared.select(scan.columns.map(col).toIndexedSeq: _*)) ===
      canon(scan))
  }

  test("string footer bounds: valid lower bound, widened upper bound") {
    val dir = tmp() + "/d"
    // multibyte + supplementary chars exercise the UTF-8 byte-order reduce
    // and the code-point increment (java.lang.String ordering would pick
    // the wrong max for the supplementary row)
    Seq("apple", "banana", "cherry", "zzétail", "中文",
        "emoji😀", "aaa", "zzz")
      .toDF("s").withColumn("id", monotonically_increasing_id())
      .coalesce(1).write.parquet(dir)
    val foot = DataSkipping.fileStatsFromFooters(spark, dir, None)
    val r = foot.select(DataSkipping.minCol("s"), DataSkipping.maxCol("s")).head()
    val (mn, mx) = (r.getString(0), r.getString(1))
    // min is exact-or-prefix (a valid lower bound), max strictly exceeds
    // every value in UTF8 binary order (the truncation-safe widening)
    val vals = Seq("apple", "banana", "cherry", "zzétail", "中文",
      "emoji😀", "aaa", "zzz")
    import org.apache.spark.unsafe.types.UTF8String
    def u(x: String) = UTF8String.fromString(x)
    assert(vals.forall(v => u(mn).compareTo(u(v)) <= 0), s"min=$mn")
    assert(vals.forall(v => u(mx).compareTo(u(v)) > 0), s"max=$mx")
  }

  test("string stats prune readWhere like scan stats, equality at the max kept") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(spark.range(1000)
      .selectExpr("concat('doc', lpad(CAST(id AS STRING), 6, '0')) AS k", "id AS v")
      .repartitionByRange(10, $"k"))
    t.collectStatsFromFooters()
    val cond = "k >= 'doc000100' AND k < 'doc000200'"
    val (kept, total) = t.pruneInfo(cond)
    assert(total === 10 && kept <= 3, s"kept=$kept total=$total")
    assert(t.readWhere(cond).collect().map(_.toString).sorted.toSeq ===
      t.read().where(expr(cond)).collect().map(_.toString).sorted.toSeq)
    // widening keeps equality AT each file's true max (the loosened
    // boundary must never prune the file holding the value)
    assert(t.readWhere("k = 'doc000999'").count() === 1L)
    val (keptEq, _) = t.pruneInfo("k = 'doc000500'")
    assert(keptEq <= 2, s"keptEq=$keptEq")
    // parity with the scan-based pass on the same layout
    val t2 = ManagedTable(spark, tmp() + "/t2")
    t2.write(spark.range(1000)
      .selectExpr("concat('doc', lpad(CAST(id AS STRING), 6, '0')) AS k", "id AS v")
      .repartitionByRange(10, $"k"))
    t2.collectStats()
    val (kept2, total2) = t2.pruneInfo(cond)
    assert(total2 === 10 && kept === kept2,
      s"footer kept=$kept vs scan kept=$kept2")
  }

  test("hive-partition columns get exact path-derived stats") {
    val dir = tmp() + "/d"
    spark.range(200).selectExpr("id", "CAST(id % 4 AS INT) AS p")
      .write.partitionBy("p").parquet(dir)
    val scan = DataSkipping.fileStats(spark, dir, None)
    val foot = DataSkipping.fileStatsFromFooters(spark, dir, None)
    assert(foot.columns.contains(DataSkipping.minCol("p")))
    assert(canon(foot.select(scan.columns.map(col).toIndexedSeq: _*)) ===
      canon(scan))
  }

  test("partition values with escaped characters survive the path round-trip") {
    // 'a:b' encodes as name=a%3Ab on disk; the sidecar path must decode
    // back to the ON-DISK name through canonPath, and the partition stat
    // must carry the unescaped value
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(Seq((1L, "a:b"), (2L, "plain"), (3L, "a:b")).toDF("id", "name"),
      partitionBy = Seq("name"))
    t.collectStatsFromFooters()
    val got = t.readWhere("id = 2")
    assert(got.collect().map(_.toString).toSeq === Seq("[2,plain]"))
    assert(t.readWhere("id >= 1").count() === 3L)
  }

  test("timestamp partition stats parse with the session timezone") {
    // Spark reads a ts=... partition dir with the SESSION timezone; a
    // UTC-pinned footer parse would shift the bound by the offset and
    // prune every matching file under a non-UTC session
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val t = ManagedTable(spark, tmp() + "/t")
      t.write(
        spark.sql(
          """SELECT id, TIMESTAMP '2020-06-01 00:00:00' AS ts FROM range(5)
            |UNION ALL
            |SELECT id, TIMESTAMP '2020-06-02 00:00:00' FROM range(5, 10)""".stripMargin)
          .coalesce(1),
        partitionBy = Seq("ts"))
      t.collectStatsFromFooters()
      val cond = "ts = TIMESTAMP '2020-06-01 00:00:00'"
      val (kept, total) = t.pruneInfo(cond)
      assert(total === 2 && kept === 1, s"kept=$kept total=$total")
      assert(t.readWhere(cond).count() === 5L)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("INT96 timestamps are dropped from the sidecar, never mis-bounded") {
    val dir = tmp() + "/d"
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try spark.range(50)
      .selectExpr("id",
        "TIMESTAMP '2022-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts")
      .coalesce(1).write.parquet(dir)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val foot = DataSkipping.fileStatsFromFooters(spark, dir, None)
    // INT96 chunk statistics are unusable; the column must vanish rather
    // than carry a wrong bound
    assert(!foot.columns.exists(_.endsWith("_ts")))
    assert(foot.columns.contains(DataSkipping.minCol("id")))
  }

  test("footer-collected sidecars prune readWhere exactly like scan-collected") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.write(spark.range(1000).selectExpr("id", "id * 2 AS v")
      .repartitionByRange(10, $"id"))
    t.collectStatsFromFooters()
    val cond = "id >= 100 AND id < 200"
    val (kept, total) = t.pruneInfo(cond)
    assert(total === 10 && kept <= 3, s"kept=$kept total=$total")
    assert(t.readWhere(cond).collect().map(_.toString).sorted.toSeq ===
      t.read().where(expr(cond)).collect().map(_.toString).sorted.toSeq)
    // and through the DSL: Stats.Mode: footers
    val work = tmp()
    spark.range(500).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("fs_src")
    graft.runtime.Lift.lift(spark,
      s"""LiftJob:
         |  Src:
         |    Type: custom::sql
         |    Properties:
         |      Statement: SELECT * FROM fs_src
         |  W:
         |    Type: write::batch_delta
         |    Input: Src
         |    Properties:
         |      Path: $work/t
         |      Mode: clean_write
         |      Repartition: 5
         |      Stats:
         |        Mode: footers
         |""".stripMargin)
    val t2 = ManagedTable(spark, s"$work/t")
    val (k2, tot2) = t2.pruneInfo("k = 17")
    assert(tot2 >= 2 && k2 < tot2, s"kept=$k2 total=$tot2")
  }
}
