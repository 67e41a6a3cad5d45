package graft.blocks

import org.scalatest.funsuite.AnyFunSuite

/** Upsert SQL template generation (reference getl/common/upsert.py:100-224;
  * the live-database integration tier needs Postgres/MySQL servers the
  * container doesn't have, so the dialect SQL itself is pinned here). */
class UpsertSqlSpec extends AnyFunSuite {

  test("postgres: ON CONFLICT DO UPDATE with EXCLUDED refs") {
    val sql = Upsert.postgresSql("t", Seq("id", "a", "b"), Seq("id"), Seq("a", "b"))
    assert(sql ===
      "INSERT INTO t (id, a, b) VALUES (?, ?, ?) " +
        "ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")
  }

  test("postgres: empty update set degrades to DO NOTHING") {
    val sql = Upsert.postgresSql("t", Seq("id"), Seq("id"), Nil)
    assert(sql === "INSERT INTO t (id) VALUES (?) ON CONFLICT (id) DO NOTHING")
  }

  test("postgres: composite conflict key") {
    val sql = Upsert.postgresSql("t", Seq("k1", "k2", "v"), Seq("k1", "k2"), Seq("v"))
    assert(sql.contains("ON CONFLICT (k1, k2) DO UPDATE SET v = EXCLUDED.v"))
  }

  test("mysql: ON DUPLICATE KEY UPDATE with VALUES refs") {
    val sql = Upsert.mysqlSql("t", Seq("id", "a"), Seq("id", "a"))
    assert(sql ===
      "INSERT INTO t (id, a) VALUES (?, ?) " +
        "ON DUPLICATE KEY UPDATE id = VALUES(id), a = VALUES(a)")
  }

  test("merge: standard MERGE with quoted columns and dual source") {
    val sql = Upsert.mergeSql("t", Seq("id", "a"), Seq("id"), Seq("a"),
      "SYSIBM.SYSDUMMY1")
    assert(sql ===
      "MERGE INTO t USING SYSIBM.SYSDUMMY1 ON t.\"id\" = ? " +
        "WHEN MATCHED THEN UPDATE SET \"a\" = ? " +
        "WHEN NOT MATCHED THEN INSERT (\"id\", \"a\") VALUES (?, ?)")
  }
}
