package graft.runtime

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.table.ManagedTable

/** End-to-end lift-job tests mirroring the reference's integration tier
  * (reference tests/integration/test_lift_parquet_to_delta.py,
  * tests/getl/manager/test_manager.py). */
class LiftSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-lift").toString

  test("parquet → transform → json write pipeline (minimum slice, SURVEY §7.2)") {
    val out = tmp()
    val yaml =
      s"""LiftJob:
         |  Raw:
         |    Type: load::batch_parquet
         |    Properties:
         |      Path: $sf0/nation.parquet
         |  Shaped:
         |    Type: transform::generic
         |    Input: Raw
         |    Properties:
         |      Functions:
         |        - where:
         |            predicate: [n_regionkey, '<', 3]
         |        - rename_column:
         |            col: n_name
         |            new_name: nation
         |        - select:
         |            cols:
         |              - col: n_nationkey
         |                alias: key
         |                cast: string
         |              - col: nation
         |  Out:
         |    Type: write::batch_json
         |    Input: Shaped
         |    Properties:
         |      Path: $out/nations
         |      Mode: overwrite
         |""".stripMargin
    val log = Lift.lift(spark, yaml)
    val written = spark.read.json(s"$out/nations")
    assert(written.columns.sorted.toSeq === Seq("key", "nation"))
    assert(written.count() === log.getDf("Shaped").count())
    assert(written.count() > 0)
  }

  test("transform join with broadcast: true plans a broadcast hash join") {
    val yaml =
      s"""LiftJob:
         |  Fact:
         |    Type: load::batch_parquet
         |    Properties:
         |      Path: $sf1/orders.parquet
         |  Dim:
         |    Type: load::batch_parquet
         |    Properties:
         |      Path: $sf1/customer.parquet
         |  Joined:
         |    Type: transform::generic
         |    Input: Fact
         |    Properties:
         |      Functions:
         |        - rename_column:
         |            col: o_custkey
         |            new_name: c_custkey
         |        - join:
         |            right_df: Dim
         |            cols: [c_custkey]
         |            join_type: inner
         |            broadcast: true
         |""".stripMargin
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // hint must win
    try {
      val joined = Lift.lift(spark, yaml).getDf("Joined")
      assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("orc write and read round-trip") {
    val out = tmp()
    val yaml =
      s"""LiftJob:
         |  Raw:
         |    Type: load::batch_parquet
         |    Properties:
         |      Path: $sf0/nation.parquet
         |  Out:
         |    Type: write::batch_orc
         |    Input: Raw
         |    Properties:
         |      Path: $out/orc
         |  Back:
         |    Type: load::batch_orc
         |    Properties:
         |      Path: $out/orc
         |""".stripMargin
    val log = Lift.lift(spark, yaml)
    assert(log.getDf("Back").count() ==
      spark.read.parquet(s"$sf0/nation.parquet").count())
  }

  test("write blocks size output files via Repartition") {
    val out = tmp()
    val yaml =
      s"""LiftJob:
         |  Raw:
         |    Type: load::batch_parquet
         |    Properties:
         |      Path: $sf1/orders.parquet
         |  Out:
         |    Type: write::batch_parquet
         |    Input: Raw
         |    Properties:
         |      Path: $out/sized
         |      Repartition: 2
         |""".stripMargin
    Lift.lift(spark, yaml)
    val files = new java.io.File(s"$out/sized").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 2)
  }

  test("parameters bind strings and raw objects (custom function block)") {
    val fn: Map[String, Any] => Any = { in =>
      val df = in("Raw").asInstanceOf[DataFrame]
      Map("big" -> df.where("r_regionkey >= 2"),
          "small" -> df.where("r_regionkey < 2"))
    }
    val yaml =
      """LiftJob:
        |  Raw:
        |    Type: load::batch_parquet
        |    Properties:
        |      Path: ${dir}/region.parquet
        |  Split:
        |    Type: custom::function
        |    Input: [Raw]
        |    Output: [big, small]
        |    Properties:
        |      CustomFunction: ${splitter}
        |""".stripMargin
    val log = Lift.lift(spark, yaml,
      Map("dir" -> sf0, "splitter" -> fn))
    assert(log.getDf("Split.big").count() === 3)
    assert(log.getDf("Split.small").count() === 2)
  }

  test("CustomCodePath compiles a scala file into the block function") {
    val w = graft.common.Scratch.dir("test", "codepath")
    graft.common.FsUtils.deleteFiles(spark, Seq(w))
    graft.common.FsUtils.writeText(spark, s"$w/block.scala",
      """(in: Map[String, Any]) => {
        |  val df = in("Raw").asInstanceOf[org.apache.spark.sql.DataFrame]
        |  df.where("r_regionkey >= 2")
        |}""".stripMargin)
    val yaml =
      s"""LiftJob:
         |  Raw:
         |    Type: load::batch_parquet
         |    Properties:
         |      Path: $sf0/region.parquet
         |  Shaped:
         |    Type: custom::function
         |    Input: [Raw]
         |    Properties:
         |      CustomCodePath: $w/block.scala
         |""".stripMargin
    assert(Lift.lift(spark, yaml).getDf("Shaped").count() === 3)
  }

  test("custom::sql sees inputs as temp views") {
    val yaml =
      s"""LiftJob:
         |  Raw:
         |    Type: load::batch_parquet
         |    Properties:
         |      Path: $sf0/region.parquet
         |  Agg:
         |    Type: custom::sql
         |    Input: [Raw]
         |    Properties:
         |      Statement: SELECT count(*) AS n FROM Raw
         |""".stripMargin
    val log = Lift.lift(spark, yaml)
    assert(log.getDf("Agg").head().getLong(0) === 5L)
  }

  test("custom::sql rejects inputs whose sanitized view names collide") {
    // "Raw.A" and "Raw-A" both sanitize to Raw_A — letting
    // createOrReplaceTempView clobber one with the other would silently
    // run the Statement against the wrong input
    val df = Seq((1, "a")).toDF("id", "v")
    val history = new BlockLog()
    val reg = new BlockLog()
    def conf(name: String, in: Seq[String], props: Map[String, Any]) =
      BlockConfig(name, spark, in, graft.dsl.Props(props), history, reg)
    history.add(conf("Raw.A", Nil, Map.empty), df)
    history.add(conf("Raw-A", Nil, Map.empty), df)
    val cfg = conf("Agg", Seq("Raw.A", "Raw-A"),
      Map("Statement" -> "SELECT count(*) AS n FROM Raw_A"))
    val e = intercept[IllegalArgumentException](
      graft.blocks.CustomBlocks.sql(cfg))
    assert(e.getMessage.contains("collide"))
    assert(e.getMessage.contains("Raw.A") && e.getMessage.contains("Raw-A"))
  }

  test("file registry prunes processed files and short-circuits on no data") {
    val work = tmp()
    // two source files
    Seq((1, "a")).toDF("id", "v").write.parquet(s"$work/in/f1.parquet")
    Seq((2, "b")).toDF("id", "v").write.parquet(s"$work/in/f2.parquet")
    val yaml =
      s"""FileRegistry:
         |  Reg:
         |    Type: fileregistry::s3_full_scan
         |    Properties:
         |      BasePath: $work/registry
         |      UpdateAfter: Sink
         |LiftJob:
         |  Raw:
         |    Type: load::batch_parquet
         |    Properties:
         |      Path: $work/in
         |      FileRegistry: Reg
         |  Sink:
         |    Type: write::batch_delta
         |    Input: Raw
         |    Properties:
         |      Path: $work/table
         |      Mode: append
         |""".stripMargin
    Lift.lift(spark, yaml)
    val table = ManagedTable(spark, s"$work/table")
    assert(table.read().count() === 2)

    // run again: no new files → NoDataToProcess → job ends cleanly, no write
    Lift.lift(spark, yaml)
    assert(table.read().count() === 2)

    // add a file: only the new one is lifted (append grows by 1)
    Seq((3, "c")).toDF("id", "v").write.parquet(s"$work/in/f3.parquet")
    Lift.lift(spark, yaml)
    assert(table.read().count() === 3)
  }

  test("batch_delta Checks + EnforceSchema gate writes through the DSL") {
    val work = Files.createTempDirectory("graft-lift-checks").toString
    Seq((1, 10), (2, -3)).toDF("id", "qty").createOrReplaceTempView("chk_src")
    def yaml(filter: String) =
      s"""LiftJob:
         |  Src:
         |    Type: custom::sql
         |    Properties:
         |      Statement: SELECT * FROM chk_src WHERE $filter
         |  W:
         |    Type: write::batch_delta
         |    Input: Src
         |    Properties:
         |      Path: $work/t
         |      Mode: append
         |      EnforceSchema: true
         |      Checks:
         |        qty_pos: qty > 0
         |""".stripMargin
    // a batch violating the CHECK never commits
    intercept[IllegalArgumentException](Lift.lift(spark, yaml("true")))
    assert(!ManagedTable(spark, s"$work/t").exists)
    // the conforming slice lands
    Lift.lift(spark, yaml("qty > 0"))
    assert(ManagedTable(spark, s"$work/t").read().count() === 1)
  }

  test("batch_delta Bucket property lays out and prunes through the DSL") {
    val work = Files.createTempDirectory("graft-lift-bucket").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .createOrReplaceTempView("bkt_src")
    val yaml =
      s"""LiftJob:
         |  Src:
         |    Type: custom::sql
         |    Properties:
         |      Statement: SELECT * FROM bkt_src
         |  W:
         |    Type: write::batch_delta
         |    Input: Src
         |    Properties:
         |      Path: $work/t
         |      Mode: clean_write
         |      Bucket:
         |        Column: id
         |        N: 4
         |        Type: bigint
         |""".stripMargin
    Lift.lift(spark, yaml)
    val t = ManagedTable(spark, s"$work/t")
    assert(t.bucketSpec ===
      Some(ManagedTable.BucketSpec("id", 4, org.apache.spark.sql.types.LongType)))
    assert(t.read().columns.toSeq === Seq("id", "v")) // hidden partition
    assert(t.readWhere("id = 2").as[(Long, String)].collect().toSeq ===
      Seq((2L, "b")))
    // the lift re-runs idempotently (same spec re-set is a no-op)
    Lift.lift(spark, yaml)
    assert(t.read().count() === 3)
  }

  test("delta upsert write merges on the MergeStatement") {
    val work = tmp()
    ManagedTable(spark, s"$work/t")
      .write(Seq((1, "old"), (2, "keep")).toDF("id", "v"))
    val updates = Seq((1, "new"), (3, "ins")).toDF("id", "v")
    updates.createOrReplaceTempView("upd_src")
    val yaml =
      s"""LiftJob:
         |  U:
         |    Type: custom::sql
         |    Properties:
         |      Statement: SELECT * FROM upd_src
         |  W:
         |    Type: write::batch_delta
         |    Input: U
         |    Properties:
         |      Path: $work/t
         |      Mode: upsert
         |      Upsert:
         |        MergeStatement: source.id == updates.id
         |""".stripMargin
    Lift.lift(spark, yaml)
    val rows = ManagedTable(spark, s"$work/t").read()
      .as[(Int, String)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1, "new"), (2, "keep"), (3, "ins")))
  }

  test("snapshot-diff registry returns only new rows on reload") {
    val work = tmp()
    val t = ManagedTable(spark, s"$work/t")
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val yaml =
      s"""FileRegistry:
         |  Diff:
         |    Type: fileregistry::delta_diff
         |    Properties:
         |      BasePath: $work/wm
         |      UpdateAfter: Read
         |      JoinOnFields: [id]
         |LiftJob:
         |  Read:
         |    Type: load::batch_delta
         |    Properties:
         |      Path: $work/t
         |      FileRegistry: Diff
         |""".stripMargin
    // first run: watermark precedes first commit → full load
    val first = Lift.lift(spark, yaml).getDf("Read")
    assert(first.count() === 2)
    Thread.sleep(5)
    t.append(Seq((3, "c")).toDF("id", "v"))
    val second = Lift.lift(spark, yaml).getDf("Read")
    assert(second.as[(Int, String)].collect().toSeq === Seq((3, "c")))
  }
}
