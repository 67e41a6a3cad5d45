package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's testdata tables (TESTDATA.md). Plain parquet
  * scans — Catalyst pushes filters/projection down into them, so every
  * query built on these starts from a pruned columnar scan.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; read it as long nanos (legacy conf) and truncate to a
    * microsecond timestamp — same truncation DuckDB applies on ns→us.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register every table as a temp view for `spark.sql` queries
    * (the engine's `custom::sql` escape hatch). */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings")
      .foreach(t => apply(s, d, t).createOrReplaceTempView(t))
    events(s, d).createOrReplaceTempView("events")
  }
}
