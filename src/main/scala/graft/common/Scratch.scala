package graft.common

/** Scratch-space root for query/test working dirs.
  *
  * Streaming checkpoints and managed-table scratch do many small fsync'd
  * writes; on a tmpfs those are memory stores instead of ext4 journal
  * commits. Prefers `/dev/shm` (tmpfs on Linux) and falls back to the JVM
  * temp dir elsewhere. Production deployments point checkpoints at durable
  * storage — this root is only for the self-contained local harness.
  */
object Scratch {
  val root: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm/graft"
    else System.getProperty("java.io.tmpdir", "/tmp") + "/graft"
  }

  /** `<root>/<ns>/<name>`, e.g. `scratch("lift", "l_lift_csv")`. */
  def dir(ns: String, name: String): String = s"$root/$ns/$name"
}
