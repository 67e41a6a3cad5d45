package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session-scoped registry of the intermediate Datasets the library
  * persists internally (signature stages, scored corpora, bucketed join
  * sides). The ops return LAZY DataFrames — the persisted stage must stay
  * alive until the caller materializes the result, so the op itself cannot
  * unpersist in a try/finally. Instead every internal `.persist()` routes
  * through [[track]], and callers release the accumulated blocks with one
  * [[release]] call once results are materialized:
  *
  * {{{
  *   val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
  *   pairs.write.parquet(out)       // materialize while caches are warm
  *   graft.ops.Caches.release()     // drop every internal cached stage
  * }}}
  *
  * The registry is keyed BY SparkSession: `release()` drops only the
  * stages tracked for the calling thread's active session (or the explicit
  * session passed to the overload), so concurrent pipelines in separate
  * sessions of one JVM never unpersist each other's in-flight stages.
  * Entries whose session has stopped are swept on the next [[track]] —
  * a caller that never releases does not pin references past its
  * session's lifetime.
  *
  * Long-lived sessions that interleave many ops call [[release]] at their
  * own batch boundaries; `Bench`/`Verify` call it between queries (their
  * `clearCache()` remains as belt-and-braces for caller-persisted frames).
  * Releasing is safe at any time — a released stage silently recomputes if
  * an un-materialized result is evaluated later; nothing breaks, it just
  * re-pays the scan. Ops that manage a cache's lifetime fully inside one
  * call (per-round label propagation, streaming foreachBatch) unpersist
  * in place and don't need the registry.
  *
  * Reference shape: husqvarnagroup/GETL caches per-lift DataFrames and
  * relies on short-lived job JVMs for cleanup
  * (getl/blocks/transform/entrypoint.py) — a library embedded in a
  * long-lived session needs the explicit release point instead.
  */
object Caches {
  private val tracked = scala.collection.mutable
    .Map.empty[SparkSession, scala.collection.mutable.ArrayBuffer[Dataset[_]]]

  /** Persist `ds` (with its current storage level already applied by the
    * caller) and register it under ITS OWN SparkSession for the next
    * [[release]] of that session. Returns `ds`. Also sweeps registry
    * entries whose session has stopped, so abandoned sessions don't pin
    * Dataset references for the life of the JVM. */
  def track[T](ds: Dataset[T]): Dataset[T] = synchronized {
    tracked.filterInPlace { case (s, _) => !s.sparkContext.isStopped }
    tracked.getOrElseUpdate(ds.sparkSession,
      scala.collection.mutable.ArrayBuffer.empty) += ds
    ds
  }

  /** Unpersist every Dataset tracked for the calling thread's active
    * SparkSession (non-blocking) and clear that session's registry entry.
    * With no active session, releases ALL sessions' entries (the
    * single-session legacy behavior). Idempotent. */
  def release(): Unit = release(SparkSession.getActiveSession.orNull)

  /** Unpersist every Dataset tracked for `spark` only. A null `spark`
    * releases every session's entries. */
  def release(spark: SparkSession): Unit = synchronized {
    def drop(ds: Dataset[_]): Unit =
      if (!ds.sparkSession.sparkContext.isStopped) ds.unpersist(false)
    if (spark == null) {
      tracked.valuesIterator.foreach(_.foreach(drop))
      tracked.clear()
    } else tracked.remove(spark).foreach(_.foreach(drop))
  }

  /** Number of currently tracked (not yet released) stages across all
    * sessions — for specs. */
  def trackedCount: Int = synchronized(tracked.valuesIterator.map(_.size).sum)

  /** Tracked stages for one session — for specs. */
  def trackedCount(spark: SparkSession): Int =
    synchronized(tracked.get(spark).map(_.size).getOrElse(0))

  /** `.persistTracked()` — drop-in for `.persist()` that also registers
    * the Dataset for the next [[release]]. */
  implicit class TrackedPersist[T](private val ds: Dataset[T]) {
    def persistTracked(): Dataset[T] = track(ds.persist())
    def persistTracked(level: org.apache.spark.storage.StorageLevel): Dataset[T] =
      track(ds.persist(level))
  }
}
