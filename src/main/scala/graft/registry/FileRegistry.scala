package graft.registry

import org.apache.spark.sql.DataFrame

import graft.runtime.BlockConfig

/** Incremental-ingestion state contract (reference
  * getl/fileregistry/base.py:6-12 plus the loader methods used by load
  * blocks at getl/blocks/load/entrypoint.py:219-221, 311-322).
  */
trait FileRegistry {

  /** Narrow `path` to the list of not-yet-processed file paths with the
    * given suffix; empty ⇒ the load block raises NoDataToProcess. */
  def load(path: String, suffix: String): Seq[String]

  /** Row-level incremental load (version-diff registries). */
  def loadNewRowsOnly(path: String): DataFrame =
    throw new UnsupportedOperationException(
      s"${getClass.getSimpleName} does not support load_new_rows_only")

  /** Mark everything handed out by `load` as lifted; called by the manager
    * after the `UpdateAfter` section completes. */
  def update(): Unit
}

/** `fileregistry::<name>` block registry — populated by the concrete
  * registries (FullScan, DatePrefixScan, SnapshotDiff). */
object FileRegistryBlocks {
  def registry: Map[String, BlockConfig => Any] = Map(
    "fileregistry::s3_full_scan" -> (c => FullScan(c)),
    "fileregistry::prefix_based_date" -> (c => DatePrefixScan(c)),
    "fileregistry::s3_date_prefix_scan" -> (c => DatePrefixScan(c)),
    "fileregistry::delta_diff" -> (c => SnapshotDiff(c))
  )
}
