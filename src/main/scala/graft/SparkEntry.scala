package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates per-area query maps; every entry that is
  * SQL-expressible has a matching DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticsQueries.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TransformQueries.queries ++
    AnalyticsQueries.queries ++
    OpsQueries.queries ++
    LiftQueries.queries ++
    StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    TransformQueries.oracleSql ++
    AnalyticsQueries.oracleSql ++
    OpsQueries.oracleSql ++
    LiftQueries.oracleSql ++
    StreamQueries.oracleSql
}
