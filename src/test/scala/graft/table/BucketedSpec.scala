package graft.table

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

class BucketedSpec extends SparkSuite {

  test("join of two co-bucketed tables plans with no shuffle exchange") {
    val w = graft.common.Scratch.dir("test", "bucketed")
    graft.common.FsUtils.deleteFiles(spark, Seq(w))
    val orders = spark.read.parquet(s"$sf1/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf1/lineitem.parquet")
    Bucketed.writeBucketed(orders, "b_orders", s"$w/orders", Seq("o_orderkey"), 8)
    Bucketed.writeBucketed(lineitem, "b_lineitem", s"$w/lineitem", Seq("l_orderkey"), 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE wraps exchanges in query stages, which hides them from the plan
    // collect below — disable it so the assertion sees the raw plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Bucketed.table(spark, "b_orders")
        .join(Bucketed.table(spark, "b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))

      // correctness: same as joining the raw parquet
      val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == expected)

      // scale property: the join itself required no exchange — only the
      // post-join aggregation shuffles
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"expected only the aggregation exchange, got:\n${joined.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
