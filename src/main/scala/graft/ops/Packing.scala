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

  /** Deterministic corpus shuffle: every document gets a global position
    * under a hash-derived pseudo-random order, plus the training shard
    * that position falls in — the "shuffle the corpus, write N shards"
    * step before training. Same two-level structure as [[packChunks]]:
    * the hash space splits into `buckets` ordered ranges (bucket id is
    * monotone in the hash, so bucket-then-hash order IS global hash
    * order), per-bucket counts go through the one small unpartitioned
    * window, and the corpus-sized rank window is keyed by bucket. The
    * order is a pure function of ids — reproducible across retries,
    * layouts, and engines (the DuckDB oracle is a plain
    * `row_number() OVER (ORDER BY hash, id)`).
    * Returns (idCol, shuffle_pos, shard). */
  def shuffleOrder(df: DataFrame, idCol: String, shardSize: Long,
                   buckets: Int = 1024): DataFrame = {
    require(shardSize >= 1 && buckets >= 1, "shardSize and buckets must be positive")
    val withBucket = df.select(col(idCol),
        Dedup.h32(col(idCol).cast("string")).as("__h"))
      .withColumn("__bucket", floor(col("__h") * buckets / 4294967296.0))
    val offsets = withBucket
      .groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__cnt")
    val inBucket = Window.partitionBy(col("__bucket"))
      .orderBy(col("__h"), col(idCol))
    withBucket
      .join(offsets, Seq("__bucket"))
      .withColumn("__pos", col("__offset") + row_number().over(inBucket) - 1)
      .select(col(idCol), col("__pos").as("shuffle_pos"),
        floor(col("__pos") / shardSize).cast("long").as("shard"))
  }

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

  /** Balanced training shards: documents go to `shards` output shards
    * round-robin over the size-DESCENDING rank — the deterministic
    * streaming cousin of longest-processing-time scheduling (heaviest
    * docs spread first, so shard token totals stay within one max-doc of
    * each other; a hash split would leave ~√-law imbalance).
    *
    * The rank is the [[shuffleOrder]] two-level prefix sum keyed by a
    * monotone weight-bucket coarsening (weight div 4, descending), so no
    * corpus-sized window is unpartitioned; the shard is
    * `(rank − 1) mod shards` — pure integer, no engine convention.
    * NULL weights coalesce to 0 — the row still lands in a shard (ranked
    * with the lightest documents) instead of silently vanishing in the
    * bucket-offset equi-join, which a NULL bucket key would never match.
    * Returns (idCol, weight, rank, shard). */
  def balancedShards(df: DataFrame, idCol: String,
                     weightCol: org.apache.spark.sql.Column,
                     shards: Int): DataFrame = {
    require(shards >= 1, "shards must be positive")
    val base = df.select(col(idCol),
      coalesce(weightCol.cast("long"), lit(0L)).as("weight"))
    val withB = base.withColumn("__b", expr("weight div 4"))
    val off = withB.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    val inB = Window.partitionBy(col("__b"))
      .orderBy(col("weight").desc, col(idCol))
    withB.join(off, Seq("__b"))
      .withColumn("rank", col("__off") + row_number().over(inB))
      .withColumn("shard", expr(s"(rank - 1) % $shards"))
      .select(col(idCol), col("weight"), col("rank"), col("shard"))
  }
}
