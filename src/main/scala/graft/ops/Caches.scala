package graft.ops

import org.apache.spark.sql.Dataset

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
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` (with its current storage level already applied by the
    * caller) and register it for the next [[release]]. Returns `ds`. */
  def track[T](ds: Dataset[T]): Dataset[T] = synchronized {
    tracked += ds
    ds
  }

  /** Unpersist every tracked Dataset (non-blocking) and clear the
    * registry. Idempotent; unpersisting an already-released stage is a
    * no-op. */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }

  /** Number of currently tracked (not yet released) stages — for specs. */
  def trackedCount: Int = synchronized(tracked.size)

  /** `.persistTracked()` — drop-in for `.persist()` that also registers
    * the Dataset for the next [[release]]. */
  implicit class TrackedPersist[T](private val ds: Dataset[T]) {
    def persistTracked(): Dataset[T] = track(ds.persist())
    def persistTracked(level: org.apache.spark.storage.StorageLevel): Dataset[T] =
      track(ds.persist(level))
  }
}
