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
  /** events.parquet has shipped `ts` as either TIMESTAMP(NANOS) (older
    * testdata drops — Spark's reader rejects it, so read as long nanos via
    * the legacy conf and truncate to micros, same as DuckDB's ns→us) or
    * TIMESTAMP(MICROS) (current drops — reads natively as TIMESTAMP_NTZ).
    * Branch on the resolved schema so both generations work.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // normalize to TimestampType (sessions run in UTC, so the instant
        // is unchanged): NTZ refuses numeric casts and surfaces as
        // LocalDateTime, which breaks the epoch-arithmetic and typed
        // collect paths downstream
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
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
