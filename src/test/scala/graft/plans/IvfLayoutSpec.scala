package graft.plans

import graft.SparkSuite
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Pins the IVF SCALE-PATH claim in [[Similarity.knnJoinIvf]]'s docs: "at
  * 100 TB the assigned table is written partitioned by cell and a query
  * batch touches only its probed partitions." This spec actually does
  * that — writes the cell-assigned corpus `partitionBy("cell")`, probes a
  * cell subset, and asserts the scan carries PartitionFilters (directory
  * pruning, so unprobed cells are never read) and returns exactly the
  * probed rows. */
class IvfLayoutSpec extends SparkSuite {
  import spark.implicits._

  test("cell-partitioned corpus scan prunes unprobed cells at the source") {
    val vecs = (0L until 64L)
      .map(i => (i, Array.tabulate(4)(j => ((i * 3 + j) % 7).toFloat), (i % 8).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = graft.common.Scratch.dir("spark", s"ivf-layout-${System.nanoTime()}")
    vecs.withColumn("cell", col("label"))
      .write.partitionBy("cell").mode("overwrite").parquet(dir)

    val probed = spark.read.parquet(dir).where(col("cell").isin(2, 5))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("cell"), scan)
    // pruning is real: only the two probed directories' rows come back
    assert(probed.count() === vecs.where(col("label").isin(2, 5)).count())
    // and the filter reached the partition layer, not a post-scan Filter
    // over all cells — the scan's partition filter mentions the isin set
    assert(scan.replaceAll("\\s+", " ").matches("(?s).*PartitionFilters.*cell.*"),
      scan)
  }

  test("knnJoinIvf over the partitioned read equals the in-memory path") {
    val vecs = (0L until 64L)
      .map(i => (i, Array.tabulate(4)(j => ((i * 3 + j) % 7).toFloat), (i % 8).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = graft.common.Scratch.dir("spark", s"ivf-layout2-${System.nanoTime()}")
    vecs.write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val q = vecs.where(col("vec_id") % 16 === 0)
    val a = Similarity.knnJoinIvf(vecs, "vec_id", "embedding", "label",
        q, "vec_id", "embedding", k = 3, probes = 2)
      .orderBy("q_id", "rank").collect().toSeq
    val b = Similarity.knnJoinIvf(fromDisk, "vec_id", "embedding", "label",
        q, "vec_id", "embedding", k = 3, probes = 2)
      .orderBy("q_id", "rank").collect().toSeq
    assert(a === b)
  }
}
