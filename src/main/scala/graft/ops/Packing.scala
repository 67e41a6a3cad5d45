package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents in a stable
  * order and cut the token stream into fixed-budget chunks ("concat and
  * chunk"). Each document is assigned the chunk its FIRST token falls in.
  *
  * The global running token count is a distributed two-level prefix sum,
  * not one unpartitioned window (which would serialize the corpus through
  * a single task):
  *   1. documents group into fixed id-range blocks (`blockSize` ids per
  *      block — deterministic, no sampling);
  *   2. per-block token sums aggregate map-side, and ONLY the block-sum
  *      table (corpus/blockSize rows) goes through the small global
  *      cumulative window;
  *   3. block offsets join back (AQE broadcasts them) and a window
  *      partitioned BY BLOCK finishes the per-document prefix — so every
  *      window with corpus-sized input is keyed, and the unkeyed one sees
  *      only block aggregates.
  */
object Packing {

  /** @param capacity  tokens per packed chunk
    * @param blockSize ids per prefix-sum block (tune so corpus/blockSize
    *                  stays driver-window-sized; 1e6 blocks cover 1e12 docs)
    * Returns (idCol, n_tokens, chunk_id). */
  def packChunks(df: DataFrame, idCol: String, tokenCol: String,
                 capacity: Long, blockSize: Long = 1000L): DataFrame = {
    require(capacity >= 1 && blockSize >= 1, "capacity and blockSize must be positive")
    val withBlock = df.select(
      col(idCol), col(tokenCol).cast("long").as("__n"),
      floor(col(idCol) / blockSize).as("__block"))

    val blockOffsets = withBlock
      .groupBy(col("__block"))
      .agg(sum(col("__n")).as("__block_sum"))
      .withColumn("__offset",
        coalesce(sum(col("__block_sum")).over(
          Window.orderBy(col("__block"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__block_sum")

    val inBlock = Window.partitionBy(col("__block")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withBlock
      .join(blockOffsets, Seq("__block"))
      .withColumn("__before",
        col("__offset") + coalesce(sum(col("__n")).over(inBlock), lit(0L)))
      .select(col(idCol), col("__n").as("n_tokens"),
        floor(col("__before") / capacity).cast("long").as("chunk_id"))
  }
}
