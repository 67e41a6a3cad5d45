package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the shuffle-elimination path for repeated
  * large-to-large joins.
  *
  * `spark.write.bucketBy(n, k).sortBy(k)` hash-partitions files by key and
  * records the layout in the catalog; a join of two tables bucketed the
  * same way plans as a sort-merge join with ZERO Exchange on either side —
  * the shuffle happened once at write time and is amortized over every
  * subsequent join/aggregation on that key. At 100 TB this converts the
  * dominant repeated cost (re-shuffling a fact table per query) into a
  * one-time layout decision, the same trade Hive bucketing and Iceberg
  * sorted tables make.
  *
  * Bucketing metadata only lives in the catalog (parquet files alone don't
  * carry it), so this writes through `saveAsTable` with an explicit
  * location instead of the path-based `ManagedTable` layout.
  */
object Bucketed {

  /** Write `df` as a bucketed catalog table at `location`. Buckets and
    * bucket count must match on both sides of a join for exchange-free
    * planning; `sortBy` the same columns so merge-join needs no sort. */
  def writeBucketed(df: DataFrame, tableName: String, location: String,
                    bucketCols: Seq[String], nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    df.write
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", location)
      .mode("overwrite")
      .saveAsTable(tableName)
  }

  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
