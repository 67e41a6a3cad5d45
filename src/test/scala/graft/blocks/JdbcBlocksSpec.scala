package graft.blocks

import graft.SparkSuite
import graft.runtime.Lift

/** JDBC load/write blocks end-to-end against embedded Derby (the container
  * has no server databases; Derby exercises the same Spark JDBC data source
  * code paths the reference drives against Postgres/MySQL —
  * reference load/entrypoint.py:265-301, write/entrypoint.py:21-62). */
class JdbcBlocksSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("write::batch_jdbc then load::jdbc round-trip with query pushdown") {
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score").createOrReplaceTempView("jdbc_src")
    val yaml =
      s"""LiftJob:
         |  Src:
         |    Type: custom::sql
         |    Properties:
         |      Statement: SELECT * FROM jdbc_src
         |  Out:
         |    Type: write::batch_jdbc
         |    Input: Src
         |    Properties:
         |      Mode: append
         |      Driver: $driver
         |      ConnUrl: $url
         |      Table: things
         |      User: ""
         |      Password: ""
         |      NumPartitions: 2
         |  Back:
         |    Type: load::jdbc
         |    Properties:
         |      Driver: $driver
         |      ConnUrl: $url
         |      User: ""
         |      Password: ""
         |      Query: SELECT "id", "name" FROM things WHERE "score" > 15
         |""".stripMargin
    val log = Lift.lift(spark, yaml)
    val rows = log.getDf("Back").as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((2L, "b"), (3L, "c")))
  }

  test("load::jdbc partition-parallel read splits the query into stride scans") {
    val url2 = "jdbc:derby:memory:graftdb2;create=true"
    spark.range(100).selectExpr("id", "id * 2 AS v")
      .createOrReplaceTempView("jdbc_src2")
    val yaml =
      s"""LiftJob:
         |  Src:
         |    Type: custom::sql
         |    Properties:
         |      Statement: SELECT * FROM jdbc_src2
         |  Out:
         |    Type: write::batch_jdbc
         |    Input: Src
         |    Properties:
         |      Mode: append
         |      Driver: $driver
         |      ConnUrl: $url2
         |      Table: wide
         |      User: ""
         |      Password: ""
         |  Back:
         |    Type: load::jdbc
         |    Properties:
         |      Driver: $driver
         |      ConnUrl: $url2
         |      User: ""
         |      Password: ""
         |      Query: SELECT "id", "v" FROM wide
         |      PartitionColumn: id
         |      LowerBound: 0
         |      UpperBound: 100
         |      NumPartitions: 4
         |""".stripMargin
    val back = Lift.lift(spark, yaml).getDf("Back")
    assert(back.rdd.getNumPartitions == 4) // stride queries, not one reader
    assert(back.count() == 100)
    assert(back.selectExpr("sum(v)").head().getLong(0) == 9900L)
  }

  test("write::batch_jdbc_upsert merges conflicting rows through the chunked engine") {
    val url3 = "jdbc:derby:memory:graftdb3;create=true"
    Seq((1L, "old", 1.0), (2L, "keep", 2.0))
      .toDF("id", "name", "score").createOrReplaceTempView("jdbc_ups_base")
    Seq((1L, "new", 10.0), (3L, "ins", 30.0))
      .toDF("id", "name", "score").createOrReplaceTempView("jdbc_ups_upd")
    val yaml =
      s"""LiftJob:
         |  Base:
         |    Type: custom::sql
         |    Properties:
         |      Statement: SELECT * FROM jdbc_ups_base
         |  Seed:
         |    Type: write::batch_jdbc
         |    Input: Base
         |    Properties:
         |      Mode: overwrite
         |      Driver: $driver
         |      ConnUrl: $url3
         |      Table: ups
         |      User: ""
         |      Password: ""
         |  Updates:
         |    Type: custom::sql
         |    Properties:
         |      Statement: SELECT * FROM jdbc_ups_upd
         |  Ups:
         |    Type: write::batch_jdbc_upsert
         |    Input: Updates
         |    Properties:
         |      Driver: $driver
         |      ConnUrl: $url3
         |      Table: ups
         |      ConflictColumns: [id]
         |      User: ""
         |      Password: ""
         |  Back:
         |    Type: load::jdbc
         |    Properties:
         |      Driver: $driver
         |      ConnUrl: $url3
         |      User: ""
         |      Password: ""
         |      Query: SELECT "id", "name", "score" FROM ups
         |""".stripMargin
    val rows = Lift.lift(spark, yaml).getDf("Back")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, "new", 10.0), (2L, "keep", 2.0), (3L, "ins", 30.0)))
  }
}
