package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Caches.TrackedPersist

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is non-reproducible across retries and
  * re-partitions; these operators hash a stable id column instead, so the
  * same row always makes the same keep/drop decision — on any cluster
  * layout, at any scale, and reproducibly for the DuckDB oracle. Pure
  * per-row expressions: map-only, no shuffle, no driver state.
  */
object Sampling {

  /** Uniform [0, 1) value derived from md5(id) — the per-row coin flip. */
  def hashUnit(idCol: Column): Column =
    Dedup.h32(idCol.cast("string")) / lit(4294967296.0)

  /** Keep each row with probability `rate`, deterministically by id. */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.where(hashUnit(col(idCol)) < rate)

  /** Stratified sampling: per-stratum keep rates (e.g. downsample the
    * dominant language, keep all of the rare ones). Strata missing from
    * `rates` fall back to `defaultRate`. One pass, no shuffle — the
    * standard class-rebalancing step before training. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.where(hashUnit(col(idCol)) < rate)
  }

  /** Inverse-density sampling over embedding-space LSH cells: dense
    * regions (boilerplate clusters, templated pages) are thinned to an
    * expected ~`cap` kept rows per cell while sparse regions keep
    * everything — diversity-preserving corpus selection, the
    * cheap-and-distributed stand-in for semantic-dedup-then-sample. Cell
    * counts are one aggregate (a cell-count-sized table, broadcast); the
    * keep decision is the deterministic id-hash coin at rate
    * min(1, cap / n_cell). Two passes + map filter, no windows. */
  def densitySample(df: DataFrame, idCol: String, vecCol: String,
                    nPlanes: Int, cap: Long): DataFrame = {
    val cells = df.select(col(idCol),
      Similarity.lshBucket(col(vecCol), nPlanes).cast("int").as("bucket"))
    val counts = cells.groupBy(col("bucket")).agg(count(lit(1)).as("n_cell"))
    cells.join(broadcast(counts), "bucket")
      .where(hashUnit(col(idCol)) <
        least(lit(1.0), lit(cap.toDouble) / col("n_cell")))
      .select(col(idCol), col("bucket"), col("n_cell"))
  }

  /** Leakage-safe train/val/test assignment: the split is decided by the
    * hash of a SPLIT UNIT — a dedup-cluster id, a URL domain, a content
    * digest — rather than the row id, so near-duplicate documents sharing
    * a unit can never straddle a split boundary and leak held-out content
    * into the training set (the classic eval-contamination failure when
    * splitting a deduplicated-but-not-clustered corpus uniformly).
    * Map-only: one hash and a boundary when-chain per row, no shuffle, no
    * state; weights are normalized, boundaries tested in declared order. */
  def leakageSafeSplit(df: DataFrame, unitCol: String,
                       splits: Seq[(String, Double)],
                       outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    val total = splits.map(_._2).sum
    // a null unit is a unit: coalesce to a sentinel so the null family
    // lands wherever the sentinel hashes (honoring the weights) instead
    // of every comparison failing and silently defaulting to the LAST
    // declared split
    val u = hashUnit(coalesce(col(unitCol).cast("string"),
      lit("__null_unit__")))
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assign = splits.init.zip(cum.init)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), hi), acc) => when(u < hi / total, name).otherwise(acc)
      }
    df.withColumn(outCol, assign)
  }

  /** Cap each stratum at `cap` rows, chosen deterministically by id hash
    * (row_number over the per-stratum hash order). The standard "no
    * language/source may exceed N documents" rebalancing step before
    * training-mix assembly. One shuffle on the stratum key; each group
    * sorts only its own rows.
    *
    * Scale ceiling, stated honestly: a window partition CANNOT be split
    * across tasks (AQE's skew handling applies to joins, not windows), so
    * a dominant stratum — English at 40% of a 100 TB corpus — lands in
    * one task. For that regime, pre-prune per Spark partition first
    * (sort-within-partitions + a per-partition top-cap take keeps at most
    * `cap` candidate rows per partition per stratum before the window),
    * or use the two-level prefix-sum shape [[TextOps.perplexityBuckets]]
    * and [[Packing.curriculumOrder]] demonstrate. The plain window is
    * correct and optimal when no stratum dwarfs an executor's slice. */
  def capPerStratum(df: DataFrame, idCol: String, strataCol: String,
                    cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashUnit(col(idCol)), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Temperature-scaled mixture weights per source: w_s ∝ count_s^alpha,
    * normalized to sum to 1 — the standard multi-source sampling-rate
    * computation (alpha < 1 upweights small sources, alpha = 1 is
    * proportional). alpha = 0.5 keeps the power an exact IEEE sqrt, so
    * the oracle reproduces it bit-for-bit; the final weight is rounded
    * to 6 decimals to absorb summation-order ulps. Output is one row per
    * source — a broadcast-size table joined back onto the corpus by the
    * sampling step. */
  def mixtureWeights(df: DataFrame, sourceCol: String): DataFrame = {
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("_pw", sqrt(col("n_docs")))
    val tot = counts.agg(sum(col("_pw")).as("_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"),
        round(col("_pw") / col("_tot"), 6).as("mix_weight"))
  }

  /** KL divergence audit of the ACHIEVED corpus mix against the
    * temperature-scaled TARGET weights ([[mixtureWeights]]): per-source
    * `p·ln(p/q)` terms, where p = actual doc share and q = published
    * 6-dp mix weight — the drift monitor a pipeline runs after sampling
    * to confirm the mix it built is the mix it planned. Everything
    * happens on the sources-sized weight table (one more tiny aggregate
    * for the doc total); per-source terms are emitted unreduced, so no
    * float summation order is in play. */
  def mixtureKl(df: DataFrame, sourceCol: String): DataFrame = {
    val w = mixtureWeights(df, sourceCol) // (source, n_docs, mix_weight)
    val tot = w.agg(sum(col("n_docs")).as("__t"))
    w.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("mix_weight"),
        round(col("n_docs") / col("__t"), 6).as("p_actual"),
        round((col("n_docs") / col("__t")) *
          log(col("n_docs") / col("__t") / col("mix_weight")), 6)
          .as("kl_term"))
  }

  /** Assemble a training mix: [[mixtureWeights]] turned into per-source
    * document quotas (`totalTarget` × weight, floor 1) and filled
    * deterministically by id-hash rank — the end-to-end "sample each
    * source to its temperature-scaled share" step. The quota table is
    * source-count-sized (broadcast); the rank window shuffles once on the
    * source key like [[capPerStratum]]. */
  def mixSample(df: DataFrame, idCol: String, sourceCol: String,
                totalTarget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // quota arithmetic stays in exact integers: mix_weight carries exactly
    // 6 decimals, so weight*1e6 recovers an integer and the half-up
    // division below is engine-portable (round(weight * target) on the
    // double would flip at decimal .5 boundaries across engines)
    val quotas = mixtureWeights(df, sourceCol)
      .withColumn("__w6", round(col("mix_weight") * 1000000).cast("long"))
      .select(col(sourceCol),
        greatest(lit(1L),
          expr(s"(__w6 * $totalTarget + 500000) div 1000000")).as("__quota"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(hashUnit(col(idCol)), col(idCol))
    df.join(broadcast(quotas), sourceCol)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Token-budgeted mix assembly: [[mixtureWeights]] scaled by a total
    * TOKEN budget instead of a document count — training mixes are
    * specified in tokens, and sources with long documents must fill
    * fewer of them. Each source's docs fill in deterministic id-hash
    * order while the running token total of STRICTLY-EARLIER-ranked docs
    * stays under the source's budget, so the doc that crosses the
    * boundary is the last one in (≥ 1 doc per source with a positive
    * budget). Cost model matches [[mixSample]]: one broadcast-size quota
    * table and ONE shuffle on the source key; the running sum is a
    * per-source window over already-co-located rows. */
  def tokenBudgetMix(df: DataFrame, idCol: String, sourceCol: String,
                     tokensCol: String, totalTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budgets = mixtureWeights(df, sourceCol)
      .withColumn("__w6", round(col("mix_weight") * 1000000).cast("long"))
      .select(col(sourceCol),
        expr(s"(__w6 * $totalTokens + 500000) div 1000000").as("__budget"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(hashUnit(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.join(broadcast(budgets), sourceCol)
      .withColumn("__prior", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .where(col("__prior") < col("__budget"))
      .drop("__prior", "__budget")
  }

  /** Per-source EPOCH factors under a total token budget — the
    * data-constrained-scaling bookkeeping (Muennighoff et al. 2023):
    * when a source's temperature-scaled budget exceeds its token stock
    * the source repeats (`epochs` > 1, upsampled); abundant sources
    * subsample (`epochs` < 1). Same exact-integer budget arithmetic as
    * [[tokenBudgetMix]]; the token stock is one aggregate over the
    * corpus, everything else is source-count-sized. */
  def mixEpochs(df: DataFrame, sourceCol: String, tokensCol: String,
                totalTokens: Long): DataFrame = {
    val budgets = mixtureWeights(df, sourceCol)
      .withColumn("__w6", round(col("mix_weight") * 1000000).cast("long"))
      .select(col(sourceCol),
        expr(s"(__w6 * $totalTokens + 500000) div 1000000").as("token_budget"))
    val stock = df.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).cast("long").as("token_stock"))
    stock.join(budgets, sourceCol)
      .select(col(sourceCol), col("token_stock"), col("token_budget"),
        round(col("token_budget").cast("double") /
          greatest(col("token_stock"), lit(1L)), 4).as("epochs"))
  }

  /** Efraimidis–Spirakis A-Res weighted sampling without replacement:
    * each row draws u ∈ (0,1] from its id hash (the +1 keeps ln defined)
    * and scores ln(u)/weight — a monotone transform of the classic
    * u^(1/weight) reservoir key — and the k largest scores win. Executes
    * as TakeOrderedAndProject: per-partition top-k heaps, only k rows per
    * partition reach the driver-side merge, no global sort at any scale.
    * Hash-derived u keeps the draw reproducible across retries and
    * cluster layouts (a `rand()` key would re-roll per attempt). */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
                   k: Int): DataFrame = {
    val u = (Dedup.h32(col(idCol).cast("string")) + 1) / lit(4294967296.0)
    df.withColumn("_skey", log(u) / col(weightCol))
      .orderBy(col("_skey").desc, col(idCol))
      .limit(k)
      .drop("_skey")
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): pick the raw documents
    * whose hashed-n-gram distribution looks most like a small target
    * domain. Features are the bag of unigrams + bigrams hashed into
    * `buckets` slots; both the target and raw bucket distributions get
    * Laplace smoothing, each bucket carries the log-likelihood ratio
    * ln p_target(b) − ln p_raw(b), and a raw document's importance
    * log-weight is the count-weighted sum of its buckets' ratios.
    * Selection is Gumbel top-k over (log-weight + g) — sampling without
    * replacement ∝ the importance weight, per the paper — with the Gumbel
    * draw g = −ln(−ln u) derived from the id hash, so the "random" sample
    * is reproducible across retries, cluster layouts, and the oracle.
    *
    * Scale shape: the feature stream is map-generated and aggregated by
    * bucket with map-side partial combine, so the distribution table is
    * AT MOST `buckets` rows no matter the corpus size — a constant-size
    * broadcast by construction (unlike a vocabulary table, which grows
    * with the corpus and must never be broadcast). Per-document scoring
    * is one shuffle on (id, bucket); the summation folds in bucket order
    * so the double-precision result is deterministic and the oracle
    * replays it exactly. Final top-k is a TakeOrderedAndProject. */
  def dsirSelect(df: DataFrame, idCol: String, targetPred: Column,
                 textCol: String = "text", buckets: Int = 4096,
                 k: Int = 25): DataFrame = {
    val toks = df.select(col(idCol), targetPred.as("_t"),
      TextOps.tokens(col(textCol)).as("_toks"))
    // unigrams + bigrams, hashed into a fixed bucket space (element_at is
    // 1-based, mirroring the oracle's 1-based list indexing)
    val feats = toks.select(col(idCol), col("_t"),
        explode(concat(col("_toks"),
          // sequence(1, n) DESCENDS for n < 1, so short docs need the guard
          expr("CASE WHEN size(_toks) < 2 THEN array() ELSE" +
            " transform(sequence(1, size(_toks) - 1)," +
            " i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1))) END")))
          .as("_f"))
      .withColumn("_b", Dedup.h32(col("_f")) % buckets)
      // the hashed-feature stream feeds three plan branches (target dist,
      // raw dist, per-raw-doc fold) — without persist each branch re-pays
      // the tokenize + explode + hash of the whole corpus
      .persistTracked()
    // bucket log-likelihood ratios: ≤ `buckets` rows by construction
    val dist = feats.groupBy(col("_b")).agg(
      sum(when(col("_t"), 1L).otherwise(0L)).as("_ct"),
      sum(when(col("_t"), 0L).otherwise(1L)).as("_cr"))
    val tot = dist.agg(sum(col("_ct")).as("_nt"), sum(col("_cr")).as("_nr"))
    val ratio = dist.crossJoin(broadcast(tot))
      .select(col("_b"),
        (log((col("_ct") + 1.0) / (col("_nt") + buckets.toDouble)) -
          log((col("_cr") + 1.0) / (col("_nr") + buckets.toDouble))).as("_l"))
    // raw docs only: count-weighted ratio sum, folded in bucket order
    val logw = feats.where(!col("_t"))
      .groupBy(col(idCol), col("_b"))
      .agg(count(lit(1)).as("_c"))
      .join(broadcast(ratio), "_b")
      .groupBy(col(idCol))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("_b"), (col("_c") * col("_l")).as("_s")))),
          x => x.getField("_s")),
        lit(0.0), (acc, v) => acc + v).as("_raw"))
    val u = (Dedup.h32(col(idCol).cast("string")) + 1) / lit(4294967296.0)
    logw.select(col(idCol),
        round(col("_raw"), 4).as("dsir_logw"),
        round(col("_raw") - log(-log(u)), 4).as("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}
