package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for constructing Columns from custom Catalyst expressions:
  * Spark 4 made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so the library exposes
  * them through this in-package shim — the standard pattern for libraries
  * that ship native expressions.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Spark's native bloom-filter aggregate (the one runtime filtering
    * injects), exposed as a groupBy-able Column: builds one
    * `org.apache.spark.util.sketch.BloomFilter` per group over
    * `xxhash64(c)` and returns its serialized bytes. TypedImperative +
    * sketch-native — each input row is one `putLong`, no per-row
    * (de)serialization. */
  def bloomAgg(c: Column, estimatedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    column(new BloomFilterAggregate(new XxHash64(Seq(expression(c))),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Ship a hadoop Configuration to executors (the class is
    * `private[spark]`; this is the standard library bridge). */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)

  /** Register a function on a LIVE session's registry (extensions only
    * apply at session build time). */
  def registerFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
