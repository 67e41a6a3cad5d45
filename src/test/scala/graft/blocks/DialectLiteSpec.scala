package graft.blocks

import java.sql.SQLException

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The conflict-dialect SQL is EXECUTED here, not just pinned: DialectLite
  * parses the exact statements [[Upsert.postgresSql]]/[[Upsert.mysqlSql]]
  * emit and applies live upsert semantics (the reference drives these
  * against docker-compose Postgres 14 / MySQL 8 —
  * tests/getl/blocks/write/test_write_postgres_upsert.py). */
class DialectLiteSpec extends AnyFunSuite {

  private def exec(db: String, sql: String, rows: Seq[Any]*): Unit = {
    DialectLiteDriver.register()
    val conn = java.sql.DriverManager.getConnection(s"jdbc:dialectlite:$db", "", "")
    try {
      val st = conn.prepareStatement(sql)
      rows.foreach { r =>
        r.zipWithIndex.foreach { case (v, i) => st.setObject(i + 1, v) }
        st.addBatch()
      }
      st.executeBatch()
      conn.commit()
    } finally conn.close()
  }

  test("postgres ON CONFLICT DO UPDATE inserts then updates in place") {
    DialectLite.create("t1", "ups", Seq("id", "a", "b"), Seq("id"))
    val sql = Upsert.postgresSql("ups", Seq("id", "a", "b"), Seq("id"), Seq("a", "b"))
    exec("t1", sql, Seq(1L, "x", 10L), Seq(2L, "y", 20L))
    exec("t1", sql, Seq(2L, "z", 99L), Seq(3L, "w", 30L))
    val (_, rows) = DialectLite.snapshot("t1", "ups")
    assert(rows.toSet === Set(Vector(1L, "x", 10L), Vector(2L, "z", 99L), Vector(3L, "w", 30L)))
  }

  test("postgres DO UPDATE with a column subset leaves other columns alone") {
    DialectLite.create("t2", "ups", Seq("id", "a", "b"), Seq("id"))
    exec("t2", Upsert.postgresSql("ups", Seq("id", "a", "b"), Seq("id"), Seq("a", "b")),
      Seq(1L, "x", 10L))
    // update only b; a must keep its seeded value even though the
    // attempted row carries a different one
    exec("t2", Upsert.postgresSql("ups", Seq("id", "a", "b"), Seq("id"), Seq("b")),
      Seq(1L, "CHANGED", 77L))
    assert(DialectLite.snapshot("t2", "ups")._2 === Vector(Vector(1L, "x", 77L)))
  }

  test("postgres DO NOTHING inserts new keys, never touches existing rows") {
    DialectLite.create("t3", "ups", Seq("id", "a"), Seq("id"))
    val doNothing = Upsert.postgresSql("ups", Seq("id", "a"), Seq("id"), Nil)
    exec("t3", doNothing, Seq(1L, "orig"))
    exec("t3", doNothing, Seq(1L, "clobber"), Seq(2L, "new"))
    assert(DialectLite.snapshot("t3", "ups")._2.toSet ===
      Set(Vector(1L, "orig"), Vector(2L, "new")))
  }

  test("postgres rejects a conflict target with no matching unique constraint") {
    DialectLite.create("t4", "ups", Seq("id", "a"), Seq("id"))
    val e = intercept[SQLException] {
      exec("t4", Upsert.postgresSql("ups", Seq("id", "a"), Seq("a"), Seq("id")),
        Seq(1L, "x"))
    }
    assert(e.getMessage.contains("no unique or exclusion constraint"))
  }

  test("mysql ON DUPLICATE KEY UPDATE resolves against the table's own key") {
    DialectLite.create("t5", "ups", Seq("id", "a", "b"), Seq("id"))
    // the reference's mysql default updates EVERY column including the
    // key (VALUES(id) on the key row is the identity) — same text here
    val sql = Upsert.mysqlSql("ups", Seq("id", "a", "b"), Seq("id", "a", "b"))
    exec("t5", sql, Seq(1L, "x", 10L), Seq(2L, "y", 20L))
    exec("t5", sql, Seq(2L, "z", 99L))
    assert(DialectLite.snapshot("t5", "ups")._2.toSet ===
      Set(Vector(1L, "x", 10L), Vector(2L, "z", 99L)))
  }

  test("composite conflict keys upsert on the full key tuple") {
    DialectLite.create("t6", "ups", Seq("k1", "k2", "v"), Seq("k1", "k2"))
    val sql = Upsert.postgresSql("ups", Seq("k1", "k2", "v"), Seq("k1", "k2"), Seq("v"))
    exec("t6", sql, Seq(1L, 1L, "a"), Seq(1L, 2L, "b"))
    exec("t6", sql, Seq(1L, 2L, "B2"), Seq(2L, 1L, "c"))
    assert(DialectLite.snapshot("t6", "ups")._2.toSet ===
      Set(Vector(1L, 1L, "a"), Vector(1L, 2L, "B2"), Vector(2L, 1L, "c")))
  }

  test("malformed conflict clauses fail at prepare, like a real server") {
    DialectLite.create("t7", "ups", Seq("id", "a"), Seq("id"))
    // clause order swapped
    intercept[SQLException] { exec("t7",
      "INSERT INTO ups (id, a) ON CONFLICT (id) VALUES (?, ?) DO NOTHING", Seq(1L, "x")) }
    // cross-wired EXCLUDED reference (a = EXCLUDED.b)
    intercept[SQLException] { exec("t7",
      "INSERT INTO ups (id, a) VALUES (?, ?) ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.id",
      Seq(1L, "x")) }
    // parameter count mismatch
    intercept[SQLException] { exec("t7",
      "INSERT INTO ups (id, a) VALUES (?) ON CONFLICT (id) DO NOTHING", Seq(1L)) }
    // unknown relation
    intercept[SQLException] { exec("t7",
      Upsert.postgresSql("missing", Seq("id"), Seq("id"), Nil), Seq(1L)) }
  }
}

/** End-to-end through Spark: the [[Upsert]] engine (foreachPartition,
  * 1000-row chunks, executeBatch) drives the pg dialect against
  * DialectLite from executor threads across multiple partitions. */
class DialectLiteSparkSpec extends SparkSuite {
  import spark.implicits._

  test("multi-partition postgres upsert lands every row exactly once") {
    DialectLite.create("t8", "wide", Seq("id", "v"), Seq("id"))
    spark.range(0, 2500).select($"id", ($"id" * 10).as("v"))
      .repartition(7).createOrReplaceTempView("dlite_src")
    graft.runtime.Lift.lift(spark,
      s"""LiftJob:
         |  Src:
         |    Type: custom::sql
         |    Properties:
         |      Statement: SELECT id, v FROM dlite_src
         |  Seed:
         |    Type: write::batch_postgres_upsert
         |    Input: Src
         |    Properties:
         |      Table: wide
         |      ConflictColumns: [id]
         |      Driver: graft.blocks.DialectLiteDriver
         |      ConnUrl: jdbc:dialectlite:t8
         |      User: ""
         |      Password: ""
         |""".stripMargin)
    val (_, rows) = DialectLite.snapshot("t8", "wide")
    assert(rows.length === 2500)
    assert(rows.forall(r => r(1) == r(0).asInstanceOf[Long] * 10))
  }

  test("the retry loop survives injected transient connection failures") {
    // reference contract: 10 tries with a sleep between (upsert.py:148-160,
    // 227-233) — inject 2 dropped connections; the 3rd attempt lands the
    // rows. Millisecond sleep via the documented test seam.
    sys.props("graft.upsert.retrySleepMs") = "5"
    try {
      DialectLite.create("t9", "flaky", Seq("id", "v"), Seq("id"))
      DialectLite.injectTransientFailures("t9", 2)
      spark.range(0, 10).select($"id", ($"id" + 100).as("v"))
        .coalesce(1).createOrReplaceTempView("dlite_flaky_src")
      graft.runtime.Lift.lift(spark,
        s"""LiftJob:
           |  Src:
           |    Type: custom::sql
           |    Properties:
           |      Statement: SELECT id, v FROM dlite_flaky_src
           |  Seed:
           |    Type: write::batch_postgres_upsert
           |    Input: Src
           |    Properties:
           |      Table: flaky
           |      ConflictColumns: [id]
           |      Driver: graft.blocks.DialectLiteDriver
           |      ConnUrl: jdbc:dialectlite:t9
           |      User: ""
           |      Password: ""
           |""".stripMargin)
      assert(DialectLite.snapshot("t9", "flaky")._2.length === 10)
    } finally sys.props -= "graft.upsert.retrySleepMs"
  }

  test("a connection dropped between chunks loses no earlier rows") {
    // 2500 rows in ONE partition = three 1000-row chunks, each on its own
    // connection (the reference's per-chunk connection factory shape,
    // upsert.py:141-160). Dropping the SECOND chunk's first attempt must
    // re-send exactly that chunk: a retry that resumed a shared row
    // iterator instead would silently lose chunk 1's rows.
    sys.props("graft.upsert.retrySleepMs") = "5"
    try {
      DialectLite.create("t10", "chunks", Seq("id", "v"), Seq("id"))
      DialectLite.injectTransientFailures("t10", n = 1, after = 1)
      spark.range(0, 2500).select($"id", ($"id" * 3).as("v"))
        .coalesce(1).createOrReplaceTempView("dlite_chunk_src")
      graft.runtime.Lift.lift(spark,
        s"""LiftJob:
           |  Src:
           |    Type: custom::sql
           |    Properties:
           |      Statement: SELECT id, v FROM dlite_chunk_src
           |  Seed:
           |    Type: write::batch_postgres_upsert
           |    Input: Src
           |    Properties:
           |      Table: chunks
           |      ConflictColumns: [id]
           |      Driver: graft.blocks.DialectLiteDriver
           |      ConnUrl: jdbc:dialectlite:t10
           |      User: ""
           |      Password: ""
           |""".stripMargin)
      val (_, rows) = DialectLite.snapshot("t10", "chunks")
      assert(rows.length === 2500, "mid-stream drop must not lose rows")
      assert(rows.forall(r => r(1) == r(0).asInstanceOf[Long] * 3))
    } finally sys.props -= "graft.upsert.retrySleepMs"
  }

  test("a deadlock victim chained inside BatchUpdateException retries and converges") {
    // Derby at sf1 (32 concurrent upsert partitions) reported deadlocks as
    // BatchUpdateException -> getNextException ->
    // SQLTransactionRollbackException (SQLState 40001). The retry loop
    // must walk that chain: matching only the TOP exception type misses
    // every batched failure and aborts the whole write.
    sys.props("graft.upsert.retrySleepMs") = "5"
    try {
      DialectLite.create("t13", "victim", Seq("id", "v"), Seq("id"))
      DialectLite.injectDeadlocks("t13", 2) // first two executeBatch calls lose
      spark.range(0, 10).select($"id", ($"id" + 7).as("v"))
        .coalesce(1).createOrReplaceTempView("dlite_deadlock_src")
      graft.runtime.Lift.lift(spark,
        s"""LiftJob:
           |  Src:
           |    Type: custom::sql
           |    Properties:
           |      Statement: SELECT id, v FROM dlite_deadlock_src
           |  Seed:
           |    Type: write::batch_postgres_upsert
           |    Input: Src
           |    Properties:
           |      Table: victim
           |      ConflictColumns: [id]
           |      Driver: graft.blocks.DialectLiteDriver
           |      ConnUrl: jdbc:dialectlite:t13
           |      User: ""
           |      Password: ""
           |""".stripMargin)
      val (_, rows) = DialectLite.snapshot("t13", "victim")
      assert(rows.length === 10, "deadlock victim must converge on retry")
      assert(rows.forall(r => r(1) == r(0).asInstanceOf[Long] + 7))
    } finally sys.props -= "graft.upsert.retrySleepMs"
  }

  test("NumPartitions bounds concurrent upsert connections to the cap") {
    // 8 input partitions, NumPartitions: 2 — the coalesce must hold the
    // connection high-water mark at <= 2 (one open connection per live
    // partition; a real server's session cap is what this protects).
    DialectLite.create("t14", "fanin", Seq("id", "v"), Seq("id"))
    DialectLite.resetPeakConnections("t14")
    spark.range(0, 4000).select($"id", ($"id" * 2).as("v"))
      .repartition(8).createOrReplaceTempView("dlite_fanin_src")
    graft.runtime.Lift.lift(spark,
      s"""LiftJob:
         |  Src:
         |    Type: custom::sql
         |    Properties:
         |      Statement: SELECT id, v FROM dlite_fanin_src
         |  Seed:
         |    Type: write::batch_postgres_upsert
         |    Input: Src
         |    Properties:
         |      Table: fanin
         |      ConflictColumns: [id]
         |      NumPartitions: 2
         |      Driver: graft.blocks.DialectLiteDriver
         |      ConnUrl: jdbc:dialectlite:t14
         |      User: ""
         |      Password: ""
         |""".stripMargin)
    assert(DialectLite.snapshot("t14", "fanin")._2.length === 4000)
    val peak = DialectLite.peakConnections("t14")
    assert(peak >= 1 && peak <= 2,
      s"NumPartitions: 2 must cap concurrent connections at 2, saw $peak")
  }

  test("unknown insert columns raise SQLException at prepare, not a raw throw") {
    DialectLite.create("t11", "narrow", Seq("id"), Seq("id"))
    val e = intercept[java.sql.SQLException] {
      val conn = java.sql.DriverManager.getConnection("jdbc:dialectlite:t11", "", "")
      try conn.prepareStatement(
        Upsert.postgresSql("narrow", Seq("id", "ghost"), Seq("id"), Seq("ghost")))
      finally conn.close()
    }
    assert(e.getMessage.contains("does not exist"))
  }
}
