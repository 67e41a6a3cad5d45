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
  /** Per-PROCESS root: two JVMs driving the same query names concurrently
    * (a test suite beside a Verify run) must never share a streaming
    * checkpoint or table dir — an HDFSStateStore commit under a directory
    * another process just truncated dies with CANNOT_COMMIT. A pid suffix
    * isolates them; the shutdown hook clears this process's root so
    * crashed or finished runs don't accumulate in tmpfs. */
  val root: String = {
    val base = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir", "/tmp")
    }
    val r = s"$base/graft-${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      try rm(new java.io.File(r)) catch { case _: Throwable => () }
    }))
    r
  }

  /** `<root>/<ns>/<name>`, e.g. `scratch("lift", "l_lift_csv")`. */
  def dir(ns: String, name: String): String = s"$root/$ns/$name"

  /** Loud guard for scratch uses that are only sound single-node: on a
    * cluster, a path under [[root]] names a DIFFERENT directory on every
    * executor, so distributed writes land scattered across machines and a
    * driver read-back silently sees a partial (or empty) result — the
    * failure mode round-9's footer-staging fix closed. Call this before
    * any Spark JOB reads or writes a scratch path (driver-only file I/O
    * is fine without it). Production paths must stage on the table/job
    * filesystem instead (round-10 verdict #4 inventory in PLANS.md). */
  def requireLocalMaster(spark: org.apache.spark.sql.SparkSession,
                         what: String): Unit = {
    val m = spark.sparkContext.master
    require(m.startsWith("local"),
      s"$what stages data in process-local scratch ($root), which is " +
        s"sound only with a local master; got master=$m. Stage on a " +
        "shared filesystem (the table's own path) or run the local harness")
  }
}
