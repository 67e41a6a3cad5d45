package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan check for the streaming near-dup index audit (round 9):
  * with a grown LSH index, is the per-batch candidate join a broadcast of
  * the (small) batch side — index scanned map-only — or does it shuffle
  * the index? Run: sbt "Test/runMain graft.tools.ExplainNdi"
  */
object ExplainNdi {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // synthetic: 1.5M-row index, 160k-row banded batch
    val index = spark.range(1500000L)
      .select(col("id"), pmod(hash(col("id")), lit(40000)).cast("long").as("bucket"))
    val dir = graft.common.Scratch.dir("explain", "ndi-index")
    index.write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val banded = spark.range(1500000L, 1505000L)
      .select(col("id"), explode(sequence(lit(0), lit(31))).as("b"))
      .select(col("id"), pmod(hash(col("id"), col("b")), lit(40000)).cast("long").as("bucket"))
    val joined = banded.alias("b").join(idx.alias("i"),
      expr("b.bucket = i.bucket AND i.id < b.id"))
      .select(col("b.id").as("id"), col("i.id").as("prior_id"))
    joined.explain("formatted")
    println("rows=" + joined.count())
    spark.stop()
  }
}
