package graft.blocks

import java.sql.{Connection, Driver, DriverManager, PreparedStatement,
  SQLException, SQLFeatureNotSupportedException}
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** Embedded execution engine for the two conflict-clause upsert dialects.
  *
  * The reference verifies `write::batch_postgres_upsert` /
  * `write::batch_mysql_upsert` against dockerized servers
  * (reference docker-compose.yaml, tests/getl/blocks/write/
  * test_write_postgres_upsert.py); this container ships no database
  * server, and the bundled embedded engine (Derby) speaks standard MERGE
  * but neither `ON CONFLICT` nor `ON DUPLICATE KEY UPDATE`. Pinning the
  * dialect SQL as text (UpsertSqlSpec) verifies the string, not the
  * semantics — so this minimal engine EXECUTES the exact statements
  * [[Upsert.postgresSql]] / [[Upsert.mysqlSql]] emit:
  *
  *   - it parses the full conflict-clause grammar (DO NOTHING /
  *     DO UPDATE SET c = EXCLUDED.c / ON DUPLICATE KEY UPDATE
  *     c = VALUES(c)), rejecting anything malformed with a SQLException,
  *   - it enforces Postgres's real constraint that the ON CONFLICT target
  *     must match a unique constraint on the table,
  *   - and it applies genuine upsert semantics (insert when the key is
  *     absent, targeted column update from the attempted row when
  *     present) against an in-memory table, concurrently, one connection
  *     per Spark partition — the same path a live server exercises.
  *
  * Like Derby `jdbc:derby:memory:` URLs, the store is JVM-local: correct
  * under `local[n]` (the verification environment) and NOT a multi-node
  * database. The production path against real Postgres/MySQL is the same
  * [[Upsert]] code with a real ConnUrl/Driver.
  *
  * JDBC surface: only what [[Upsert.run]] uses (getConnection,
  * setAutoCommit, prepareStatement, setObject, addBatch, executeBatch,
  * commit, close); everything else raises SQLFeatureNotSupportedException
  * via a reflective proxy, so accidental reliance on unimplemented
  * behavior is loud, never silent.
  */
object DialectLite {

  final class Table(val cols: Vector[String], val pk: Vector[String]) {
    // insertion-ordered so readback is deterministic
    val rows = mutable.LinkedHashMap[Vector[Any], Array[Any]]()
  }

  private val tables = TrieMap[String, Table]()

  private def key(db: String, table: String) = s"$db.${table.toLowerCase}"

  /** DDL stand-in: the reference's tests create the target table (with
    * its primary key) over psql before upserting; callers do the same
    * here. Replaces any previous definition. */
  def create(db: String, table: String, cols: Seq[String], pk: Seq[String]): Unit = {
    require(pk.nonEmpty && pk.forall(cols.contains), s"pk $pk must be drawn from $cols")
    DialectLiteDriver.register()
    tables.put(key(db, table), new Table(cols.toVector, pk.toVector))
  }

  def drop(db: String, table: String): Unit = tables.remove(key(db, table))

  // ---- transient-failure injection (retry-loop verification) ----
  // A live server drops connections; this engine can simulate that so the
  // chunk/retry machinery's failure branch is testable in-container. Per
  // db: the first `after` connection attempts succeed, the following `n`
  // raise SQLTransientConnectionException, then connections succeed again
  // (`after` > 0 proves chunks landed BEFORE a mid-stream drop survive).
  private val failPlan = TrieMap[String, java.util.concurrent.atomic.AtomicInteger]()
  private val failLeft = TrieMap[String, java.util.concurrent.atomic.AtomicInteger]()

  def injectTransientFailures(db: String, n: Int, after: Int = 0): Unit = {
    failPlan.put(db, new java.util.concurrent.atomic.AtomicInteger(after))
    failLeft.put(db, new java.util.concurrent.atomic.AtomicInteger(n))
  }

  // Deadlock injection: the next `n` executeBatch calls for `db` fail the
  // way a real engine reports a deadlock VICTIM — a BatchUpdateException
  // whose getNextException chains the SQLTransactionRollbackException
  // (SQLState 40001). Derby at sf1 produced exactly this shape; a bare
  // instanceof-SQLTransientException retry loop misses it because
  // BatchUpdateException itself is neither transient nor chained via
  // getCause.
  private val deadlockLeft = TrieMap[String, java.util.concurrent.atomic.AtomicInteger]()

  def injectDeadlocks(db: String, n: Int): Unit =
    deadlockLeft.put(db, new java.util.concurrent.atomic.AtomicInteger(n))

  private def maybeDeadlock(db: String): Unit =
    deadlockLeft.get(db).foreach { left =>
      if (left.getAndDecrement() > 0) {
        val e = new java.sql.BatchUpdateException(
          s"injected batch failure for $db", "40001", 0, Array.emptyIntArray,
          null)
        e.setNextException(new java.sql.SQLTransactionRollbackException(
          s"injected deadlock victim for $db", "40001"))
        throw e
      }
    }

  private def maybeFail(db: String): Unit =
    failPlan.get(db).foreach { skip =>
      if (skip.getAndDecrement() <= 0 && failLeft(db).getAndDecrement() > 0)
        throw new java.sql.SQLTransientConnectionException(
          s"injected transient failure for $db")
    }

  /** Readback for verification: (columns, rows in insertion order). */
  def snapshot(db: String, table: String): (Vector[String], Vector[Vector[Any]]) = {
    val t = tables.getOrElse(key(db, table),
      throw new SQLException(s"relation $table does not exist"))
    t.synchronized { (t.cols, t.rows.valuesIterator.map(_.toVector).toVector) }
  }

  // ---- SQL grammar: exactly the two dialect shapes Upsert emits ----
  private val Ident = """[A-Za-z_][A-Za-z0-9_]*"""
  private val PgRe =
    s"""INSERT INTO ($Ident) \\(($Ident(?:, $Ident)*)\\) VALUES \\((\\?(?:, \\?)*)\\) ON CONFLICT \\(($Ident(?:, $Ident)*)\\)(?: DO NOTHING| DO UPDATE SET ((?:$Ident = EXCLUDED\\.$Ident)(?:, $Ident = EXCLUDED\\.$Ident)*))""".r
  private val MyRe =
    s"""INSERT INTO ($Ident) \\(($Ident(?:, $Ident)*)\\) VALUES \\((\\?(?:, \\?)*)\\) ON DUPLICATE KEY UPDATE (($Ident = VALUES\\($Ident\\))(?:, $Ident = VALUES\\($Ident\\))*)""".r

  private[blocks] final case class Plan(table: Table, insertCols: Vector[String],
                                        keyCols: Vector[String], updateCols: Vector[String]) {
    private val colIdx = table.cols.zipWithIndex.toMap
    private def idxOf(c: String): Int = colIdx.getOrElse(c,
      throw new SQLException(s"column \"$c\" of relation does not exist"))
    private val insIdx = insertCols.map(idxOf)
    private val keyFromParams = keyCols.map(c => insertCols.indexOf(c))
    private val updFromParams = updateCols.map(c => (idxOf(c), insertCols.indexOf(c)))
    if (!(keyFromParams.forall(_ >= 0) && updFromParams.forall(_._2 >= 0)))
      throw new SQLException(
        "conflict/update columns must appear in the insert column list")

    /** One attempted row: insert when the key is new, apply the dialect's
      * targeted update (possibly none) when it exists. Returns the JDBC
      * update count. */
    def apply(params: Array[Any]): Int = table.synchronized {
      val k = keyFromParams.map(params(_))
      table.rows.get(k) match {
        case Some(existing) =>
          if (updateCols.isEmpty) 0 // DO NOTHING
          else {
            updFromParams.foreach { case (ti, pi) => existing(ti) = params(pi) }
            1
          }
        case None =>
          val row = new Array[Any](table.cols.length)
          insIdx.zipWithIndex.foreach { case (ti, pi) => row(ti) = params(pi) }
          table.rows.put(k, row)
          1
      }
    }
  }

  private def split(csv: String): Vector[String] = csv.split(", ").toVector

  private[blocks] def plan(db: String, sql: String): Plan = sql match {
    case PgRe(tname, cols, marks, conflict, set) =>
      val t = tables.getOrElse(key(db, tname),
        throw new SQLException(s"relation $tname does not exist"))
      val insertCols = split(cols)
      if (split(marks).length != insertCols.length)
        throw new SQLException("parameter count mismatch")
      val conflictCols = split(conflict)
      // Postgres: the conflict target must match a unique constraint
      if (conflictCols.sorted != t.pk.sorted)
        throw new SQLException(
          s"there is no unique or exclusion constraint matching the ON CONFLICT specification (target $conflictCols, key ${t.pk})")
      val updates =
        if (set == null) Vector.empty
        else split(set).map { item =>
          val Array(lhs, rhs) = item.split(" = EXCLUDED\\.")
          if (lhs != rhs) throw new SQLException(s"unsupported SET item $item")
          lhs
        }
      Plan(t, insertCols, conflictCols, updates)
    case MyRe(tname, cols, marks, set, _) =>
      val t = tables.getOrElse(key(db, tname),
        throw new SQLException(s"table $tname doesn't exist"))
      val insertCols = split(cols)
      if (split(marks).length != insertCols.length)
        throw new SQLException("parameter count mismatch")
      val updates = split(set).map { item =>
        val Array(lhs, rhs) = item.split(" = VALUES\\(")
        if (rhs.stripSuffix(")") != lhs) throw new SQLException(s"unsupported SET item $item")
        lhs
      }
      // MySQL resolves "duplicate key" against the table's own keys
      Plan(t, insertCols, t.pk, updates.filterNot(t.pk.contains))
    case other =>
      throw new SQLException(s"syntax error at or near: $other")
  }

  // ---- JDBC plumbing: reflective proxies over the used surface ----
  private def proxy[T](clazz: Class[T])(
      handler: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    java.lang.reflect.Proxy.newProxyInstance(clazz.getClassLoader, Array[Class[_]](clazz),
      (_, m, args) => {
        val a = if (args == null) Array.empty[AnyRef] else args
        handler.applyOrElse((m.getName, a), (x: (String, Array[AnyRef])) =>
          throw new SQLFeatureNotSupportedException(s"DialectLite: ${x._1}"))
      }).asInstanceOf[T]

  // concurrency observability: high-water mark of simultaneously-open
  // connections per db — lets specs PROVE NumPartitions bounds DB fan-in
  // instead of trusting the coalesce (a real server's connection cap is
  // the resource the bound protects)
  private val openNow = TrieMap[String, java.util.concurrent.atomic.AtomicInteger]()
  private val openPeak = TrieMap[String, java.util.concurrent.atomic.AtomicInteger]()

  def resetPeakConnections(db: String): Unit = {
    openNow.put(db, new java.util.concurrent.atomic.AtomicInteger(0))
    openPeak.put(db, new java.util.concurrent.atomic.AtomicInteger(0))
  }

  def peakConnections(db: String): Int =
    openPeak.get(db).map(_.get()).getOrElse(0)

  private[blocks] def connection(db: String): Connection = {
    maybeFail(db)
    val now = openNow.getOrElseUpdate(db,
      new java.util.concurrent.atomic.AtomicInteger(0))
    val peak = openPeak.getOrElseUpdate(db,
      new java.util.concurrent.atomic.AtomicInteger(0))
    val n = now.incrementAndGet()
    peak.getAndAccumulate(n, math.max(_, _))
    var closed = false
    proxy(classOf[Connection]) {
      case ("setAutoCommit", _) => null
      case ("commit", _) => null      // ops apply eagerly; commit is a no-op
      case ("rollback", _) => null
      case ("close", _) =>
        if (!closed) now.decrementAndGet()
        closed = true; null
      case ("isClosed", _) => java.lang.Boolean.valueOf(closed)
      case ("prepareStatement", Array(sql: String)) => statement(db, sql)
      case ("toString", _) => s"DialectLiteConnection($db)"
    }
  }

  private def statement(db: String, sql: String): PreparedStatement = {
    val p = plan(db, sql) // parse/validate at prepare time, like a server
    val nParams = p.insertCols.length
    var current = new Array[Any](nParams)
    val batch = mutable.ArrayBuffer[Array[Any]]()
    proxy(classOf[PreparedStatement]) {
      case ("setObject", Array(i: Integer, v)) =>
        current(i - 1) = v; null
      case ("addBatch", _) =>
        batch += current; current = new Array[Any](nParams); null
      case ("executeBatch", _) =>
        maybeDeadlock(db)
        val counts = batch.map(p.apply(_)).toArray
        batch.clear()
        counts
      case ("clearBatch", _) => batch.clear(); null
      case ("close", _) => null
      case ("toString", _) => s"DialectLiteStatement($sql)"
    }
  }
}

/** `jdbc:dialectlite:<db>` driver. Registered three ways, belt and
  * braces: the ServiceLoader entry (META-INF/services/java.sql.Driver —
  * DriverManager instantiates every classpath driver on first use, and
  * the constructor below self-registers), the engine's `create` call,
  * and the constructor itself — so `DriverManager.getConnection` works
  * from executor code whether or not `Class.forName` constructed
  * anything (Class.forName alone runs no Scala constructor). */
class DialectLiteDriver extends Driver {
  DialectLiteDriver.register()
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(DialectLiteDriver.Prefix)
  override def connect(url: String, info: java.util.Properties): Connection =
    if (!acceptsURL(url)) null
    else DialectLite.connection(url.stripPrefix(DialectLiteDriver.Prefix))
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getParentLogger =
    throw new SQLFeatureNotSupportedException("getParentLogger")
}

object DialectLiteDriver {
  private[blocks] val Prefix = "jdbc:dialectlite:"
  private val registered = new AtomicBoolean(false)
  def register(): Unit =
    if (registered.compareAndSet(false, true))
      DriverManager.registerDriver(new DialectLiteDriver)
}
