package graft.registry

import graft.SparkSuite
import graft.dsl.Props
import graft.runtime.{BlockConfig, BlockLog}
import graft.table.ManagedTable
import org.apache.spark.sql.functions._

/** Driver-memory behavior of the path registries at listing scale: the
  * reference hands EVERY pending path to the driver (it must — the paths
  * feed `spark.read.load(paths: _*)`), so the registry documents a
  * measured ceiling and offers `PathBatchSize` to drain arbitrarily large
  * backlogs in bounded batches across scheduled lifts. */
class RegistryScaleSpec extends SparkSuite {

  private def freshDir(tag: String): String =
    graft.common.Scratch.dir("spark", s"regscale-$tag-${System.nanoTime()}")

  private def registry(base: String, extra: (String, Any)*): FullScan =
    FullScan(BlockConfig("fr", spark, Nil,
      Props((Seq[(String, Any)]("BasePath" -> base) ++ extra): _*),
      new BlockLog, new BlockLog))

  test("100k-path backlog: batched hand-out drains disjoint ordered chunks; unbatched stays within heap") {
    val base = freshDir("base")
    val emptyPrefix = freshDir("none") + "/absent" // lists to Nil

    // seed 100k pending rows directly (the listing itself is exercised by
    // the lift queries; here the subject is the hand-out path)
    ManagedTable(spark, base).write(
      spark.range(100000).select(
        format_string("s3a://corpus/in/part-%06d.json", col("id")).as("file_path"),
        lit(null).cast("timestamp").as("date_lifted")))

    val batched = registry(base, "PathBatchSize" -> 1000)
    val b1 = batched.load(emptyPrefix, ".json")
    assert(b1.size === 1000)
    assert(b1 === b1.sorted, "batch must be deterministic (ordered) for resumability")
    batched.update()

    val b2 = batched.load(emptyPrefix, ".json")
    assert(b2.size === 1000)
    assert(b1.toSet.intersect(b2.toSet).isEmpty,
      "update() must mark ONLY the handed-out batch lifted")
    assert((b1 ++ b2) === (b1 ++ b2).sorted,
      "successive batches drain in file_path order")

    // registry state: exactly the first batch is lifted
    val st = ManagedTable(spark, base).read()
    assert(st.filter(col("date_lifted").isNotNull).count() === 1000L)
    assert(st.filter(col("date_lifted").isNull).count() === 99000L)

    // unbatched (reference semantics): the remaining 99k paths hand out in
    // one call — ~10 MB of strings, the documented fixed-heap ceiling class
    val all = registry(base).load(emptyPrefix, ".json")
    assert(all.size === 99000)
    assert(!all.toSet.exists(b1.toSet), "lifted paths never hand out again")
  }

  test("batched update() marks nothing when load returned an empty batch") {
    val base = freshDir("empty")
    ManagedTable(spark, base).write(
      spark.range(5).select(
        format_string("f%d.json", col("id")).as("file_path"),
        current_timestamp().as("date_lifted"))) // all already lifted
    val batched = registry(base, "PathBatchSize" -> 10)
    assert(batched.load(freshDir("none2") + "/absent", ".json").isEmpty)
    batched.update() // no-op, must not throw or rewrite
    assert(ManagedTable(spark, base).read()
      .filter(col("date_lifted").isNull).count() === 0L)
  }
}
