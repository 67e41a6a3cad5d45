package graft.blocks

import java.sql.{Connection, DriverManager, PreparedStatement, SQLTransientException}

import org.apache.spark.sql.{DataFrame, Row}

import graft.runtime.BlockConfig

/** Partition-parallel JDBC upserts (reference getl/common/upsert.py +
  * write/entrypoint.py:97-192).
  *
  * Execution model matches the reference exactly: `foreachPartition`
  * (where `NumPartitions` upstream bounds DB fan-in), rows MATERIALIZED a
  * chunk at a time and each chunk executed-and-committed on its own
  * connection with its own retry loop (upsert.py:141-160 opens a fresh
  * `connection_cursor_factory()` per chunk per attempt and commits on
  * context exit). Per-chunk retry is the part that makes retry SOUND: a
  * chunk is a re-sendable list, so a connection dropped mid-stream
  * re-sends exactly that chunk — never a partially consumed row iterator
  * — and upserts are idempotent, so a chunk that half-landed before the
  * drop converges on the retry. The dialect differs only in the conflict
  * clause:
  *   - Postgres: `INSERT … ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c`
  *     (upsert.py:100-160)
  *   - MySQL:    `INSERT … ON DUPLICATE KEY UPDATE c = VALUES(c)`
  *     (upsert.py:163-224)
  *
  * At scale this is the correct shape: no driver collect, work distributed
  * across executors, CONCURRENT connections bounded by partition count
  * (one open connection per partition at any moment; sequential chunks
  * within a partition each open and close their own, like the reference).
  */
object Upsert {

  private val ChunkSize = 1000
  private val MaxRetries = 10           // upsert.py:148-160
  // 60s between attempts, as the reference hardcodes (upsert.py:227-233);
  // the system property is a TEST seam so the retry loop itself can be
  // exercised without minute-long sleeps — production never sets it
  private def retrySleepMs: Long =
    sys.props.get("graft.upsert.retrySleepMs").map(_.toLong).getOrElse(60 * 1000L)

  def postgres(c: BlockConfig): DataFrame = {
    val df = c.inputDf
    val columns = df.columns.toSeq
    val conflictCols = c.props.getStringSeq("ConflictColumns")
    val updateCols =
      if (c.props.exists("UpdateColumns")) c.props.getStringSeq("UpdateColumns")
      else columns.diff(conflictCols) // default: Columns − ConflictColumns
    val sql = postgresSql(c.props.getString("Table"), columns, conflictCols, updateCols)
    run(c, df, sql, columns)
    df
  }

  def mysql(c: BlockConfig): DataFrame = {
    val df = c.inputDf
    val columns = df.columns.toSeq
    val updateCols =
      if (c.props.exists("UpdateColumns")) c.props.getStringSeq("UpdateColumns")
      else columns
    val sql = mysqlSql(c.props.getString("Table"), columns, updateCols)
    run(c, df, sql, columns)
    df
  }

  /** Generic SQL:2003 `MERGE INTO` upsert — the same chunked
    * partition-parallel execution path as the Postgres/MySQL dialects, for
    * targets that speak standard MERGE (Derby, DB2, Oracle, SQL Server).
    * This is the dialect the sandbox can drive END TO END against embedded
    * Derby, so the whole executor-side machinery (connection per
    * partition, 1000-row chunks, executeBatch, retry loop) is verified
    * against a real database, not just as SQL text. */
  def jdbcMerge(c: BlockConfig): DataFrame = {
    val df = c.inputDf
    val columns = df.columns.toSeq
    val conflictCols = c.props.getStringSeq("ConflictColumns")
    val updateCols =
      if (c.props.exists("UpdateColumns")) c.props.getStringSeq("UpdateColumns")
      else columns.diff(conflictCols)
    val dual = c.props.getStringOr("DualTable", "SYSIBM.SYSDUMMY1")
    val sql = mergeSql(c.props.getString("Table"), columns, conflictCols, updateCols, dual)
    // parameter markers appear in ON (conflict cols), UPDATE SET (update
    // cols), then INSERT VALUES (all cols) order
    run(c, df, sql, conflictCols ++ updateCols ++ columns)
    df
  }

  /** `INSERT INTO t (a,b) VALUES (?,?) ON CONFLICT (a) DO UPDATE SET
    * b = EXCLUDED.b` — upsert.py:100-137. */
  def postgresSql(table: String, columns: Seq[String], conflict: Seq[String],
                  update: Seq[String]): String = {
    val base = s"INSERT INTO $table (${columns.mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${conflict.mkString(", ")})"
    if (update.isEmpty) s"$base DO NOTHING"
    else s"$base DO UPDATE SET ${update.map(u => s"$u = EXCLUDED.$u").mkString(", ")}"
  }

  /** `INSERT INTO t (a,b) VALUES (?,?) ON DUPLICATE KEY UPDATE
    * b = VALUES(b)` — upsert.py:163-199. */
  def mysqlSql(table: String, columns: Seq[String], update: Seq[String]): String =
    s"INSERT INTO $table (${columns.mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")}) " +
      s"ON DUPLICATE KEY UPDATE ${update.map(u => s"$u = VALUES($u)").mkString(", ")}"

  /** `MERGE INTO t USING <dual> ON t.k = ? WHEN MATCHED THEN UPDATE SET
    * v = ? WHEN NOT MATCHED THEN INSERT (k, v) VALUES (?, ?)` — the
    * single-row standard-MERGE upsert shape (the one-row dual table makes
    * each batched statement an upsert of one parameter row, mirroring the
    * per-row VALUES of the other dialects). */
  def mergeSql(table: String, columns: Seq[String], conflict: Seq[String],
               update: Seq[String], dual: String): String = {
    // ANSI-quoted column identifiers: Spark's JDBC writer creates tables
    // with quoted (case-exact) column names, so the merge must quote too
    def q(c: String) = "\"" + c + "\""
    val on = conflict.map(k => s"$table.${q(k)} = ?").mkString(" AND ")
    val matched =
      if (update.isEmpty) ""
      else s" WHEN MATCHED THEN UPDATE SET ${update.map(u => s"${q(u)} = ?").mkString(", ")}"
    s"MERGE INTO $table USING $dual ON $on$matched " +
      s"WHEN NOT MATCHED THEN INSERT (${columns.map(q).mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")})"
  }

  private def run(c: BlockConfig, df: DataFrame, sql: String, columns: Seq[String]): Unit = {
    val url = c.props.getString("ConnUrl")
    val user = c.props.getString("User")
    val password = c.props.getString("Password")
    val driver = c.props.getStringOr("Driver", "")
    // `NumPartitions` bounds DB fan-in (concurrent connections == input
    // partitions): a 1000-task stage must not open 1000 server sessions.
    // coalesce, not repartition — merging partitions needs no shuffle.
    val bounded = c.props.getStringOpt("NumPartitions")
      .map(n => df.coalesce(n.toInt)).getOrElse(df)
    bounded.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        if (driver.nonEmpty) Class.forName(driver)
        // grouped() materializes each chunk as a Seq — re-sendable, so the
        // retry loop never resumes a partially consumed iterator (which
        // would silently drop every row consumed before the failure)
        rows.grouped(ChunkSize).foreach { chunk =>
          withRetries { () =>
            val conn = DriverManager.getConnection(url, user, password)
            try executeChunk(conn, sql, columns, chunk)
            finally conn.close()
          }
        }
      }
    }
  }

  private def executeChunk(conn: Connection, sql: String,
                           columns: Seq[String], chunk: Seq[Row]): Unit = {
    conn.setAutoCommit(false)
    val stmt: PreparedStatement = conn.prepareStatement(sql)
    try {
      chunk.foreach { row =>
        columns.zipWithIndex.foreach { case (col, i) =>
          stmt.setObject(i + 1, row.getAs[Any](col))
        }
        stmt.addBatch()
      }
      stmt.executeBatch()
      conn.commit()
    } catch { case e: Throwable =>
      // leave the connection transaction-clean before close: embedded
      // engines (Derby) refuse to close a connection holding an active
      // transaction, and that close error would MASK the real failure
      try conn.rollback() catch { case _: Throwable => () }
      throw e
    } finally stmt.close()
  }

  /** Walk cause + SQLException.getNextException chains: `executeBatch`
    * failures surface as `BatchUpdateException` with the actual
    * deadlock/serialization/connection error CHAINED, not thrown — a bare
    * instanceof on the top exception misses every batched failure (found
    * at sf1: 32 concurrent partitions upserting into embedded Derby
    * deadlock, and the `SQLTransactionRollbackException` rides inside a
    * `BatchUpdateException`). */
  private def chain(e: Throwable): Iterator[Throwable] = {
    val seen = scala.collection.mutable.Set[Throwable]()
    def walk(t: Throwable): Iterator[Throwable] =
      if (t == null || !seen.add(t)) Iterator.empty
      else Iterator(t) ++ (t match {
        case s: java.sql.SQLException =>
          walk(s.getNextException) ++ walk(s.getCause)
        case _ => walk(t.getCause)
      })
    walk(e)
  }

  /** SQLState 40xxx = transaction rollback (deadlock victim / serialization
    * failure): the tx is already rolled back and an immediate re-send
    * converges (chunks are idempotent MERGEs), so the victim backs off
    * briefly — the 60s sleep models a remote-DB OUTAGE, not lock juggling. */
  private def isLockVictim(e: Throwable): Boolean = chain(e).exists {
    case s: java.sql.SQLException =>
      s.isInstanceOf[java.sql.SQLTransactionRollbackException] ||
        Option(s.getSQLState).exists(_.startsWith("40"))
    case _ => false
  }

  private def isTransient(e: Throwable): Boolean = chain(e).exists {
    case s: java.sql.SQLException =>
      s.isInstanceOf[SQLTransientException] ||
        s.isInstanceOf[java.sql.SQLNonTransientConnectionException] ||
        Option(s.getSQLState).exists(_.startsWith("08")) // connection errors
    case _ => false
  }

  /** 10 tries with a 60s sleep on transient/connection errors
    * (upsert.py:148-160, 212-224, 227-233); deadlock victims retry
    * promptly with linear backoff capped at 1s. */
  private def withRetries(body: () => Unit): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try { body(); done = true }
      catch {
        case e: Throwable if isLockVictim(e) || isTransient(e) =>
          attempt += 1
          if (attempt >= MaxRetries) throw e
          Thread.sleep(
            if (isLockVictim(e)) math.min(50L * attempt, 1000L)
            else retrySleepMs)
      }
    }
  }
}
