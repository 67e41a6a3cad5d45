package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewSpec extends SparkSuite {
  import spark.implicits._

  // 10k rows on 2 hot keys + a tail — the shape salting exists for
  private lazy val skewed = spark.range(10000)
    .select(
      when(col("id") % 10 < 8, lit("hot"))
        .when(col("id") % 10 < 9, lit("warm"))
        .otherwise(concat(lit("cold_"), (col("id") % 50).cast("string"))).as("k"),
      (col("id") % 97).cast("double").as("v"))

  test("saltedAgg equals the unsalted aggregate") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .as[(String, Long, Double)].collect().map { case (k, n, t) => k -> ((n, math.round(t * 100))) }.toMap
    val salted = Skew.saltedAgg(skewed, Seq("k"), 16,
      Map("n" -> (count(lit(1)), sum(col("n"))),
        "total" -> (sum(col("v")), sum(col("total")))))
      .as[(String, Long, Double)].collect().map { case (k, n, t) => k -> ((n, math.round(t * 100))) }.toMap
    assert(salted == plain)
  }

  test("saltedAgg spreads a hot key over the salt space") {
    val perSalt = skewed.withColumn("__salt", pmod(hash(col("k"), col("v")), lit(16)))
      .where(col("k") === "hot").groupBy("__salt").count()
    assert(perSalt.count() == 16) // all 16 sub-keys materialize
  }

  test("saltedJoin equals the plain join") {
    val dim = skewed.groupBy("k").agg(min("v").as("w"))
    val plain = skewed.join(dim, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("s"))
      .as[(String, Long, Double)].collect().map { case (k, n, s) => k -> ((n, math.round(s * 100))) }.toMap
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("s"))
      .as[(String, Long, Double)].collect().map { case (k, n, s) => k -> ((n, math.round(s * 100))) }.toMap
    assert(salted == plain)
  }
}
