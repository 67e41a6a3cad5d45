package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{AsofJoin, Curation, Dedup, Graph, Intervals, Multimodal, Packing, RangeJoin, Sampling, Similarity, Sketches, Skew, TextOps}
import graft.ops.Caches.TrackedPersist

/** Training-data pipeline operators as oracle-verified queries: text
  * analysis, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
  * and multimodal binary-column plumbing.
  *
  * Every oracle mirrors the md5-derived hash arithmetic EXACTLY (same byte
  * hashing, same left-to-right double summation), so the driver's
  * value-hash compare is deterministic, not approximate.
  */
object OpsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_text_tokens" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_ws_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"))),

    "x_text_quality" -> ((s, d) =>
      TextOps.qualityScore(Tables.documents(s, d))
        .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
          "mean_word_len", "quality_score")),

    "x_text_langid" -> ((s, d) =>
      TextOps.langId(Tables.documents(s, d))
        .select("doc_id", "lang", "lang_pred")),

    "x_text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.canonicalFingerprint(col("text")).as("fp_canon"))),

    // word-blocklist safety gate: literal-array tally, integer-exact
    // keep decision at 3% basis points — map-only at any corpus size
    "x_text_blocklist" -> ((s, d) =>
      TextOps.blocklistGate(Tables.documents(s, d), "doc_id", "text",
        Seq("slow", "dup", "drop"), maxBp = 300)),

    "x_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "text", "doc_id")),

    "x_dedup_minhash" -> ((s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, k = 64, bands = 32, threshold = 0.7)),

    "x_dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.7)),

    // prefix-filtered (PPJoin-style) exact Jaccard: lossless scale path —
    // boilerplate shingles drop out of every prefix instead of being
    // df-capped away; oracle is the brute-force exact pair set
    "x_dedup_prefix" -> ((s, d) =>
      Dedup.prefixJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.6)),

    "x_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxDistance = 3)),

    // the finishing step of dedup: every doc labelled with the min id of
    // its near-dup component; keep rows with doc_id == cluster_id
    "x_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.dedupClusters(docs, "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, k = 64, bands = 32, threshold = 0.7))
    }),

    // threshold 0.4: the synthetic embeddings' max within-label cosine is
    // ~0.51, so 0.9 would make the check vacuous (zero pairs at every sf)
    "x_embed_neardup" -> ((s, d) =>
      Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), "vec_id",
        "embedding", "label", threshold = 0.4)),

    // unblocked near-dup: the LSH bucket is the blocking key (the 100 TB
    // path when no label/cluster column exists)
    "x_embed_lsh_pairs" -> ((s, d) =>
      Dedup.embeddingLshPairs(Tables.embeddings(s, d), "vec_id",
        "embedding", nPlanes = 4, threshold = 0.3)),

    // fixed-point centroid means from exact integer sums — a float avg's
    // partial-sum order varies with partitioning (and DuckDB's round emits
    // -0.0 on tiny negative means, found by tools/audit_signed_zero.py at
    // sf0.1); integer micro-units are bit-stable at any parallelism
    "x_embed_centroid" -> ((s, d) =>
      Similarity.centroidsMicro(Tables.embeddings(s, d), "label", "embedding")),

    // per-dim z-score whitening: one stats aggregation broadcast back,
    // map-only apply — the pre-clustering feature-scaling pass
    "x_embed_standardize" -> ((s, d) =>
      Similarity.standardize(Tables.embeddings(s, d), "vec_id", "embedding")),

    // cell-confined corpus k-NN graph with mutual-edge flags — the
    // substrate for density clustering; in-cell pairs are adaptively
    // triangle-blocked so no task exceeds ~targetBlockRows^2 work
    "x_knn_graph" -> ((s, d) =>
      Similarity.knnGraph(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", k = 3)),

    // deterministic Lloyd's k-means (the IVF quantizer training step):
    // md5-seeded init, 2 iterations, centroids rounded between passes
    "x_embed_kmeans" -> ((s, d) =>
      Similarity.kmeans(Tables.embeddings(s, d), "vec_id", "embedding",
        k = 8, iters = 2)),

    // SemDeDup: cluster embeddings with the trained quantizer, drop the
    // larger id of any within-cell pair with cosine >= 0.35 — semantic
    // near-dup removal (the synthetic corpus's max within-cell cosine is
    // ~0.5, so 0.35 exercises real drops without emptying cells)
    "x_dedup_semantic" -> ((s, d) =>
      Similarity.semanticDedup(Tables.embeddings(s, d), "vec_id",
        "embedding", k = 8, iters = 2, threshold = 0.35)),

    // embedding-space eval-set leakage screen: vec_id % 101 == 0 stands in
    // as the held-out benchmark; 0.40 sits under the corpus's ~0.51 max
    // pairwise cosine so real rows flag without flagging everything
    "x_embed_decontaminate" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.semanticDecontaminate(
        emb.where(col("vec_id") % 101 =!= 0), "vec_id", "embedding",
        emb.where(col("vec_id") % 101 === 0), "embedding", threshold = 0.40)
    }),

    "x_ann_brute" -> ((s, d) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", queryId = 0L, k = 10)),

    "x_ann_lsh" -> ((s, d) =>
      Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10, nPlanes = 4)),

    // multi-probe LSH: query bucket + every one-bit-flipped bucket
    "x_ann_lsh_probe" -> ((s, d) =>
      Similarity.lshTopKProbe(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10, nPlanes = 4)),

    "x_ann_ivf" -> ((s, d) =>
      Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", queryId = 0L, k = 10)),

    // the self-trained IVF pipeline: k-means quantizer -> cell assignment
    // -> single-cell probe
    "x_ann_ivf_trained" -> ((s, d) =>
      Similarity.ivfTopKTrained(Tables.embeddings(s, d), "vec_id",
        "embedding", queryId = 0L, k = 10, nCells = 8, iters = 2)),

    // multi-probe IVF: the query scans its 3 nearest cells, not 1 — the
    // recall lever when the true neighbour sits across a Voronoi boundary
    "x_ann_ivf_probe" -> ((s, d) =>
      Similarity.ivfTopKMultiProbe(Tables.embeddings(s, d), "vec_id",
        "embedding", "label", queryId = 0L, k = 10, probes = 3)),

    // batch k-NN JOIN: every query vector (the vec_id % 100 slice) gets
    // its top-5 corpus neighbours in one pass — broadcast query batch,
    // map-only scoring, per-query top-k window
    "x_knn_join" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.knnJoinExact(e, "vec_id", "embedding",
        e.where(col("vec_id") % 100 === 0), "vec_id", "embedding", k = 5)
    }),

    // IVF-pruned k-NN join: corpus assigned to label cells once, each
    // query scores only its 2 nearest cells — the batch-retrieval scale
    // path (probes/nCells of the corpus per query)
    "x_knn_join_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.knnJoinIvf(e, "vec_id", "embedding", "label",
        e.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
        k = 5, probes = 2)
    }),

    // ANN recall audit: per-query overlap of the IVF-pruned top-5 with
    // the exact top-5 — the in-engine recall@k measurement every ANN
    // deployment owes its users (the dedup twin is x_dedup_audit)
    "x_ann_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.where(col("vec_id") % 100 === 0)
      val ex = Similarity.knnJoinExact(e, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5).select(col("q_id"), col("vec_id"))
      val ax = Similarity.knnJoinIvf(e, "vec_id", "embedding", "label",
        q, "vec_id", "embedding", k = 5, probes = 2)
        .select(col("q_id").as("aq"), col("vec_id").as("av"))
      ex.join(ax, col("q_id") === col("aq") && col("vec_id") === col("av"),
          "left")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_exact"), count(col("av")).as("n_found"),
          round(count(col("av")).cast("double") / count(lit(1)), 4)
            .as("recall"))
    }),

    // product quantization: 2 subspaces x 32 dims, 4 codes each — every
    // vector reduced to (sub, code) pairs from per-subspace k-means
    // codebooks (the PQ memory/recall trade under IVF)
    "x_embed_pq" -> ((s, d) =>
      Similarity.pqCodes(Tables.embeddings(s, d), "vec_id", "embedding",
        m = 2, subDim = 32, k = 4, iters = 2)),

    // PQ asymmetric-distance search: the query scored against PQ codes
    // through per-subspace lookup tables — the memory-bound ANN path
    "x_ann_pq" -> ((s, d) =>
      Similarity.pqTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, kNeighbors = 10, m = 2, subDim = 32, k = 4, iters = 2)),

    // the production IVF-PQ serving funnel: multi-probe IVF candidates ->
    // PQ-ADC shortlist -> exact cosine re-rank of the shortlist only
    "x_ann_rerank" -> ((s, d) =>
      Similarity.annRerank(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", queryId = 0L, k = 10, probes = 3, shortlist = 50,
        m = 2, subDim = 32, pqK = 4, iters = 2)),

    // int8 scalar quantization, verified per (vector, dimension) element.
    // lo/hi live in a project BELOW the Generate (multiply-referenced, so
    // CollapseProject can't inline them into the generator) — otherwise
    // the per-element lambda recomputes the array min/max per output row
    "x_embed_quantize" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("lo0", array_min(col("v")))
        .withColumn("hi0", array_max(col("v")))
        .withColumn("scale0",
          when(col("hi0") === col("lo0"), lit(1.0)).otherwise(col("hi0") - col("lo0")))
        .select(col("vec_id"), round(col("lo0"), 4).as("lo"),
          round(col("hi0"), 4).as("hi"),
          posexplode(transform(col("v"),
            x => round((x - col("lo0")) / col("scale0") * 255).cast("int")))
            .as(Seq("dim", "qv")))),

    // corpus vocabulary: top-20 tokens by document frequency
    // (TakeOrderedAndProject — per-partition top-k before the driver merge)
    "x_text_vocab" -> ((s, d) =>
      TextOps.docFrequency(Tables.documents(s, d))
        .orderBy(col("doc_freq").desc, col("token"))
        .limit(20)),

    // per-document top TF-IDF term
    "x_text_tfidf" -> ((s, d) =>
      TextOps.tfidfTop(Tables.documents(s, d), "doc_id")),

    // hashed-feature linear classifier inference (fastText shape): tokens
    // hash into weight buckets, exact integer milli-weight summation,
    // map-only — the quality/domain classifier scoring pass
    "x_text_classifier" -> ((s, d) =>
      TextOps.hashedLinearScore(Tables.documents(s, d), "doc_id")),

    // source-level corpus-overlap sketches: one mergeable MinHash per
    // source (per-position min over the group's shingle hashes — cost
    // independent of group size), pairwise estimated Jaccard on the tiny
    // signature table
    "x_source_minhash" -> ((s, d) =>
      Dedup.groupMinhashSim(Tables.documents(s, d), "source", "text")),

    // Okapi BM25 lexical retrieval: top-10 documents for a 3-term query —
    // token stream pruned to the query terms map-side, doc-length join by
    // plain shuffle, deterministic token-ordered score summation
    "x_text_bm25" -> ((s, d) =>
      TextOps.bm25(Tables.documents(s, d), "doc_id",
        Seq("spark", "query", "join"))),

    // hybrid retrieval: BM25 top-20 and exact-cosine top-20 fused by
    // reciprocal rank (1/(60+rank)); the fusion never touches the corpus
    "x_retrieval_rrf" -> ((s, d) => {
      val lex = TextOps.bm25(Tables.documents(s, d), "doc_id",
        Seq("spark", "query", "join"), topK = 20)
      val sem = Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", queryId = 0L, k = 20)
        .withColumnRenamed("vec_id", "doc_id")
      TextOps.rrfFuse(lex, sem, "doc_id", "bm25", "cosine", topK = 10)
    }),

    // Gopher-style repetition signal: top-trigram fraction per document
    "x_text_repetition" -> ((s, d) =>
      TextOps.repetitionStats(Tables.documents(s, d), "doc_id")),

    // concat-and-chunk sequence packing: each doc assigned the 2048-token
    // training chunk its first token falls in (two-level prefix sum)
    "x_pack_chunks" -> ((s, d) =>
      Packing.packChunks(
        Tables.documents(s, d).select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", capacity = 2048, blockSize = 100)),

    // deterministic corpus shuffle: global pseudo-random position + shard
    // assignment via hash order (two-level prefix structure)
    "x_corpus_shuffle" -> ((s, d) =>
      Packing.shuffleOrder(Tables.documents(s, d).select("doc_id"),
        "doc_id", shardSize = 64)),

    // deterministic hash-based stratified sampling: downsample dominant
    // languages, keep rare ones — reproducible on any cluster layout
    "x_sample_stratified" -> ((s, d) =>
      Sampling.stratified(Tables.documents(s, d), "doc_id", "lang",
          Map("en" -> 0.25, "de" -> 0.5), defaultRate = 1.0)
        .select("doc_id", "lang")),

    // leakage-safe splitting: train/val/test decided by the hash of the
    // content digest (the exact-dup unit), so byte-identical copies can
    // never straddle a split and leak eval text into training — map-only
    "x_split_safe" -> ((s, d) =>
      Sampling.leakageSafeSplit(
          Tables.documents(s, d).withColumn("unit", md5(col("text"))),
          "unit", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")),

    // A-Res weighted sampling: longest documents most likely, but every
    // document has a nonzero chance — the standard quality-weighted
    // corpus subsampling step
    "x_sample_weighted" -> ((s, d) =>
      Sampling.weightedTopK(Tables.documents(s, d).select("doc_id", "n_chars"),
        "doc_id", "n_chars", k = 50)),

    // passage-level exact dedup: first copy of each distinct 20-token
    // passage survives
    "x_dedup_paragraph" -> ((s, d) =>
      Dedup.paragraphDedup(Tables.documents(s, d), "doc_id", "text", k = 20)),

    // duplicated-passage fraction (Gopher repetition family, corpus-wide)
    "x_text_dupfrac" -> ((s, d) =>
      Dedup.dupPassageFrac(Tables.documents(s, d), "doc_id", "text", k = 20)),

    // incremental dedup: a "new crawl" batch (doc_id % 5 == 0) deduped
    // against the already-ingested index (everything else) — digest
    // anti-join, then in-batch dedup
    "x_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalExact(
        docs.where(col("doc_id") % 5 === 0),
        docs.where(col("doc_id") % 5 =!= 0), "text", "doc_id")
    }),

    // inter-document bigram novelty (boilerplate/diversity signal)
    "x_text_novelty" -> ((s, d) =>
      TextOps.bigramNovelty(Tables.documents(s, d), "doc_id", "text")),

    // corpus heavy hitters: top-20 trigram shingles by DOCUMENT frequency
    // (shingles are per-doc distinct; deterministic tie-break on the
    // shingle) — partial counts + TakeOrderedAndProject, so only k rows
    // per task reach the merge
    "x_text_top_ngrams" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(Dedup.shingles(col("text"), 3)).as("ngram"))
        .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(20)),

    // count-min sketch error contract: per-source sketches merged into a
    // global one (constant-size fold), probe estimates vs exact counts
    "x_sketch_cms" -> ((s, d) =>
      Sketches.cmsContract(Tables.documents(s, d), "text", "source",
        Seq("join", "hash", "scan", "order", "zyzzyx"))),

    // t-digest quantile contract: per-type digests re-digested into a
    // global sketch (raw data scanned once), probe quantile estimates
    // audited against their true ranks
    "x_sketch_tdigest" -> ((s, d) =>
      Sketches.tdigestContract(Tables.events(s, d), "value", "event_type",
        Seq(0.1, 0.5, 0.9, 0.99))),

    // KMV bottom-k distinct-count contract: per-returnflag sketches of
    // distinct part keys, merged globally; the oracle replays the hash,
    // the kth-order statistic, and the estimate bit-for-bit
    "x_sketch_kmv" -> ((s, d) =>
      Sketches.kmvContract(Tables.lineitem(s, d), "l_partkey",
        "l_returnflag", k = 128)),

    // pairwise distinct-customer overlap between order statuses from the
    // same bottom-k state (theta-sketch intersection on KMV sketches);
    // sub-capacity pairs are exact by construction
    "x_sketch_kmv_overlap" -> ((s, d) =>
      Sketches.kmvOverlapContract(Tables.orders(s, d), "o_custkey",
        "o_orderstatus", k = 128)),

    // bigram collocations by pointwise mutual information with the
    // standard low-count floor — corpus phrase mining
    "x_text_pmi" -> ((s, d) =>
      TextOps.pmiTop(Tables.documents(s, d), "text", minCount = 5L, topK = 20)),

    // train the hashed-feature quality classifier IN the engine:
    // fixed-point logistic regression, 2 full-batch GD iterations —
    // deterministic integer weights the oracle replays exactly
    "x_text_train_lr" -> ((s, d) =>
      TextOps.trainHashedLogReg(Tables.documents(s, d), "doc_id",
        col("source") === "src1", dim = 64, iters = 2, lrInv = 100.0)),

    // log2-bucketed document-length histogram — the standard corpus size
    // profile (map-only bucket assignment, one narrow aggregation). The
    // +0.5 keeps the log argument off exact powers of two, where the two
    // engines' libm could disagree by one ulp and flip the floor; for
    // integer input it never changes the true bucket
    "x_doc_length_hist" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(floor(log2(greatest(col("n_chars"), lit(1)) + 0.5))
          .cast("long").as("log2_chars"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))),

    // canonical whitespace/case normalization: per-doc normalized length
    // and content fingerprint (map-only at any scale)
    "x_text_normalize" -> ((s, d) => {
      val norm = TextOps.normalize(col("text"))
      Tables.documents(s, d).select(col("doc_id"),
        length(norm).as("n_chars_norm"),
        md5(norm.cast("binary")).as("fp_norm"))
    }),

    // exact dedup over NORMALIZED text: catches duplicates that differ
    // only in case/whitespace — the standard canonicalize-then-dedup pass
    "x_dedup_norm" -> ((s, d) =>
      Dedup.exact(
        Tables.documents(s, d)
          .withColumn("norm", TextOps.normalize(col("text"))),
        "norm", "doc_id")),

    // per-language document cap: no stratum exceeds 20 docs, members
    // chosen deterministically by id hash (training-mix rebalancing)
    "x_sample_lang_cap" -> ((s, d) =>
      Sampling.capPerStratum(Tables.documents(s, d), "doc_id", "lang", cap = 20)
        .select("doc_id", "lang")),

    // the curation pipeline END-TO-END: canonicalize → dedup (first copy
    // per normalized text, window keyed on the 16-byte digest so the sort
    // key is compact) → quality-gate at the survivor-corpus P25 → per-lang
    // cap. One composed plan: Catalyst pipelines the whole chain — dedup
    // shuffles the rows once, the gate is a broadcast threshold, the cap
    // is one window over the (already small) kept set
    "x_pipeline_curate" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wd = Window
        .partitionBy(md5(TextOps.normalize(col("text")).cast("binary")))
        .orderBy(col("doc_id"))
      val deduped = Tables.documents(s, d)
        .withColumn("_rn", row_number().over(wd))
        .where(col("_rn") === 1).drop("_rn")
      // persist the scored stage: the threshold aggregate AND the gate both
      // read it, so the corpus is scanned + deduped + scored ONCE and the
      // second pass is a cached re-read (at 100 TB this stage persists to
      // disk-backed storage; without it the whole dedup window runs twice)
      val scored = TextOps.qualityScore(deduped)
        .persistTracked(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val thr = scored.agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY quality_score)")
          .as("_thr"))
      val kept = scored.crossJoin(broadcast(thr))
        .where(col("quality_score") >= col("_thr"))
      Sampling.capPerStratum(kept, "doc_id", "lang", cap = 15)
        .select(col("doc_id"), col("lang"), col("quality_score"))
    }),

    // temperature-scaled (alpha = 0.5) per-source mixture weights —
    // the multi-source sampling-rate table for training-mix assembly
    "x_mix_weights" -> ((s, d) =>
      Sampling.mixtureWeights(Tables.documents(s, d), "source")),

    // soft dedup: every copy kept, weighted 1/n_copies — the
    // downweight-instead-of-drop alternative
    "x_dedup_soft" -> ((s, d) =>
      Dedup.softWeights(Tables.documents(s, d), "text", "doc_id")),

    // exact-substring duplicated spans (Lee et al. 2022 ExactSubstr shape):
    // per doc, the token positions lying inside a >= k-token substring
    // whose first corpus-wide copy is elsewhere — k-gram coverage, no
    // suffix array; only docs with some duplication kept (dup_frac > 0
    // keeps the result row set meaningful at corpus scale)
    "x_dedup_spans" -> ((s, d) =>
      Dedup.duplicatedSpans(Tables.documents(s, d), "doc_id", "text", k = 5)
        .where(col("dup_tokens") > 0)),

    // the removal half of ExactSubstr: every doc rebuilt with duplicated
    // spans excised (first corpus copy kept); fingerprint stands in for
    // the cleaned text
    "x_text_excise" -> ((s, d) =>
      Dedup.exciseDuplicatedSpans(Tables.documents(s, d), "doc_id", "text",
        k = 5)),

    // Matryoshka truncation: slice each embedding to its first 16 dims
    // and L2-renormalize — map-only, the MRL serving-dimension cut
    "x_embed_truncate" -> ((s, d) => {
      val v = slice(col("embedding").cast("array<double>"), 1, 16)
      val n = sqrt(aggregate(transform(v, x => x * x), lit(0.0), _ + _))
      // + 0.0 drops the sign off a rounded -0.0 (DuckDB keeps it, Spark
      // doesn't — the one hash-visible bit on a value-equal zero)
      Tables.embeddings(s, d).select(col("vec_id"),
        (round(element_at(v, 1) / when(n === 0, 1.0).otherwise(n), 4) + lit(0.0))
          .as("d1_renormed"),
        round(n, 4).as("norm16"))
    }),

    // mix assembly: temperature weights → per-source quotas → hash-ranked
    // fill (the end-to-end training-mix sampling composition)
    "x_mix_apply" -> ((s, d) =>
      Sampling.mixSample(Tables.documents(s, d).select("doc_id", "source"),
        "doc_id", "source", totalTarget = 200L)),

    // token-budgeted mix: the same temperature weights scaled by a TOTAL
    // TOKEN budget — each source fills in hash-rank order until its
    // running token total crosses its budget (boundary doc included)
    "x_mix_tokens" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.tokenBudgetMix(docs, "doc_id", "source", "n_tokens",
        totalTokens = 12000L)
    }),

    // per-source epoch factors under a 5M-token budget: scarce sources
    // upsample (epochs > 1), abundant ones subsample — the data-
    // constrained scaling bookkeeping on top of the temperature weights
    "x_mix_epochs" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.mixEpochs(docs, "source", "n_tokens", totalTokens = 5000000L)
    }),

    // DSIR importance resampling: src1 plays the curated target domain;
    // every other document scores by hashed unigram+bigram log-likelihood
    // ratio and the Gumbel top-k draws the selection ∝ importance weight
    "x_mix_dsir" -> ((s, d) =>
      Sampling.dsirSelect(Tables.documents(s, d), "doc_id",
        col("source") === "src1", buckets = 4096, k = 25)),

    // Bloom-prefiltered incremental dedup: identical result to the plain
    // digest anti-join, but the definitely-new majority of the batch is
    // discarded map-side by a broadcast Bloom sketch of the index
    "x_dedup_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.bloomIncremental(
        docs.where(col("doc_id") % 3 === 0),
        docs.where(col("doc_id") % 3 =!= 0),
        "text", "doc_id", expectedItems = 100000L)
    }),

    // unigram-LM scoring: per-doc mean token log-probability under the
    // corpus's own unigram distribution (KenLM-filter stand-in)
    "x_text_logprob" -> ((s, d) =>
      TextOps.unigramLogProb(Tables.documents(s, d), "doc_id")),

    // percentile-threshold quality gate: cut the worst quartile by
    // composite quality score (threshold = corpus P25, discrete)
    "x_text_quality_filter" -> ((s, d) =>
      TextOps.qualityFilter(Tables.documents(s, d), "doc_id",
        quantile = 0.25)),

    // source-level (domain-level) corpus statistics: the aggregation that
    // drives source allow/deny lists in web-scale pipelines
    "x_doc_source_stats" -> ((s, d) =>
      TextOps.qualityScore(Tables.documents(s, d))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          round(avg("quality_score"), 4).as("avg_quality"),
          countDistinct(col("lang")).as("n_langs"))),

    // REAL header decode: packMedia writes spec-valid PNG IHDR / JPEG SOF0
    // headers; imageMeta parses width/height/channels back OUT of the
    // bytes. The oracle recomputes the dims from the synthesis arithmetic
    // — any parser offset/endianness bug hash-mismatches. Audio stays a
    // labeled stub (no codec in the container).
    "x_mm_decode" -> ((s, d) => {
      val packed = Multimodal.packMedia(Tables.documents(s, d), "doc_id", "text")
      packed
        .withColumn("m", Multimodal.imageMeta(col("payload")))
        .withColumn("a", Multimodal.audioMeta(col("payload")))
        .select(col("doc_id"), col("byte_len"), col("content_type"),
          col("m.format"), col("m.width"), col("m.height"), col("m.channels"),
          col("a.sample_rate").as("audio_sr"),
          col("a.channels").as("audio_ch"),
          round(col("a.seconds"), 6).as("audio_secs"))
    }),

    "x_mm_frames" -> ((s, d) =>
      Multimodal.sampleFrames(
        Multimodal.pack(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload", chunkBytes = 100)),

    // REAL sample decode: the WAV rows' PCM data chunk decoded to
    // per-frame RMS / zero-crossing / peak gating signals (silence and
    // clipping filters). The oracle re-decodes the identical int16-LE
    // stream from the text bytes in SQL — any offset, sign-extension, or
    // framing bug in the JVM decoder hash-mismatches
    "x_mm_audio_energy" -> ((s, d) => {
      val media = Multimodal.packMedia(Tables.documents(s, d), "doc_id", "text")
      Multimodal.pcmFrames(
        media.where(col("content_type") === "audio/wav"),
        "doc_id", "payload", frameSamples = 256)
    }),

    // frequency-domain audio features: quantized-coefficient DFT power at
    // bins 1..8 per 64-sample frame + the frame's dominant bin — exact
    // integer arithmetic end-to-end, so the SQL oracle replays every bit
    // of the transform (no golden file needed for a spectral decode)
    "x_mm_audio_spectral" -> ((s, d) => {
      val media = Multimodal.packMedia(Tables.documents(s, d), "doc_id", "text")
      Multimodal.audioSpectral(
        media.where(col("content_type") === "audio/wav"), "doc_id", "payload")
    }),

    // the audio-gating pipeline end-to-end: decode PCM frames, score
    // activity per clip, drop mostly-quiet clips. The 26000 RMS floor
    // sits inside the ASCII-payload RMS range so the gate genuinely
    // discriminates — both the per-frame decisions and the doc-level
    // keep/drop replay in the oracle
    "x_mm_audio_gate" -> ((s, d) => {
      val media = Multimodal.packMedia(Tables.documents(s, d), "doc_id", "text")
      Multimodal.audioActivityGate(
        media.where(col("content_type") === "audio/wav"),
        "doc_id", "payload", frameSamples = 64,
        rmsFloor = 26000.0, minActive = 0.5)
    }),

    // REAL pixel decode: P6 PPM payloads (spec-valid ASCII header, text
    // bytes as a deliberately-truncated raster) averaged per channel over
    // the complete pixels actually present
    "x_mm_pixels" -> ((s, d) =>
      Multimodal.ppmPixels(
        Multimodal.packPpm(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload")),

    // REAL PNG decode end-to-end: encode (five-filter scanlines + zlib
    // IDAT + chunk CRCs) then decode (inflate + filter reconstruction) —
    // the golden oracle rebuilt every payload byte-for-byte with CPython's
    // zlib and its own independent filter implementation, so one wrong
    // predictor byte, CRC, or deflate flag mismatches png_md5 or a mean
    "x_mm_png_pixels" -> ((s, d) =>
      Multimodal.pngPixels(
        Multimodal.packPng(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload")),

    // REAL baseline JPEG end-to-end: encode (fixed-point fDCT + Annex K
    // quant/Huffman, a spec-valid stream ImageIO also reads) then decode
    // (Huffman + dequant + integer IDCT) — the golden rebuilt every
    // payload byte-for-byte with an independent pure-Python codec, so one
    // wrong coefficient, code, or stuffing byte mismatches jpeg_md5 or
    // the decoded mean
    "x_mm_jpeg_pixels" -> ((s, d) =>
      Multimodal.jpegPixels(
        Multimodal.packJpeg(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload")),

    // PROGRESSIVE JPEG end-to-end: the same rasters emitted as SOF2
    // six-scan successive-approximation streams, decoded by the same
    // multi-scan entropy decoder. Progressive reorders the identical
    // quantized coefficients, so every decoded statistic must equal the
    // baseline query's — while the payload md5 pins the progressive
    // entropy stream byte-for-byte against an independent Python port
    "x_mm_jpeg_progressive" -> ((s, d) =>
      Multimodal.jpegPixels(
        Multimodal.packJpegProgressive(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload")),

    // COMPRESSED audio #1 — G.711 mu-law: every text byte is one mu-law
    // code; the decoder expands through the closed-form companding law
    // (pure integer shifts/masks), so the oracle replays every sample in
    // SQL with no golden file — the same no-trust contract as the raw
    // PCM energy query, one codec deeper
    "x_mm_audio_ulaw" -> ((s, d) =>
      Multimodal.ulawFrames(
        Multimodal.packUlaw(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload", frameSamples = 256)),

    // the other G.711 companding law (A-law, formatTag 6) — same
    // SQL-replayable closed form, toggled bits and a linear segment 0
    "x_mm_audio_alaw" -> ((s, d) =>
      Multimodal.alawFrames(
        Multimodal.packAlaw(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload", frameSamples = 256)),

    // COMPRESSED audio #2 — IMA ADPCM (WAV formatTag 0x11): the text's
    // int16 stream 4:1-compressed through the standard step/index
    // adaptation, then decoded back and frame-folded. Sequential state
    // machine -> golden-file oracle (independent pure-Python port pins
    // payload md5 AND every decoded frame statistic)
    "x_mm_audio_adpcm" -> ((s, d) =>
      Multimodal.adpcmFrames(
        Multimodal.packAdpcm(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload", frameSamples = 256)),

    // image near-dup end-to-end over the decoded rasters: perceptual
    // dHash -> 4x14-bit pigeonhole bands -> equi-join -> hamming verify.
    // The oracle recomputes every grayscale sample, every hash bit, and
    // the full exact pair set (banding is provably lossless at distance
    // <= 3, so SQL can skip the bands and brute-force the small result)
    "x_mm_image_neardup" -> ((s, d) =>
      Multimodal.imageNearDup(
        Multimodal.packPpm(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload", maxHamming = 3)),

    // REAL resize: 4x4 nearest-neighbor thumbnails of the P6 rasters —
    // the oracle rebuilds every thumbnail byte-for-byte from the same
    // source-pixel arithmetic, so a single mis-sampled pixel mismatches
    "x_mm_thumbnail" -> ((s, d) =>
      Multimodal.ppmThumbnails(
        Multimodal.packPpm(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload", side = 4)),

    // exact-cut scene segmentation over a synthesized frame stream: each
    // 100-byte source frame is "held on screen" doc_id%3+1 frames, so
    // static runs are real; only (id, idx, md5) rows cross the exchange
    "x_mm_scenes" -> ((s, d) => {
      val video = Tables.documents(s, d).select(col("doc_id"),
        expr("""array_join(transform(
            CASE WHEN length(text) < 100 THEN array()
                 ELSE sequence(1, CAST(length(text) DIV 100 AS INT)) END,
            i -> repeat(substring(text, (i - 1) * 100 + 1, 100),
                        CAST(doc_id % 3 + 1 AS INT))), '')""").as("vid"))
        .where(length(col("vid")) > 0)
        .select(col("doc_id"), col("vid").cast("binary").as("payload"))
      Multimodal.sceneCuts(video, "doc_id", "payload", chunkBytes = 100)
    }),

    // the multimodal feature-extract chain end-to-end: payload → stub
    // embedding → within-lang pairwise cosine → global top-10 pairs.
    // The lang block bounds candidates exactly like x_embed_neardup; the
    // cosine runs on the codegen'd vector kernels
    "x_mm_embed_pairs" -> ((s, d) => {
      // exact all-pairs within language, block-decomposed ADAPTIVELY: the
      // naive lang self-join put the dominant language's ~2M pairs in ONE
      // task (measured 5.9-20 s); a FIXED block count balances one SF and
      // straggles at the next (blocks=8 measured 15.0x wall at 10x docs —
      // per-task pair work is (group/blocks)^2), so the block count now
      // derives from the largest group and bounds per-task comparisons at
      // any corpus size. Identical result either way.
      val emb = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        Multimodal.featureStub(col("text").cast("binary"), 16).as("emb"))
      Similarity.allPairsCosineAuto(emb, "doc_id", "emb", Seq("lang"),
        targetBlockRows = 1024)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
        .limit(10)
    }),

    // as-of join: each order annotated with the customer's strictly
    // previous order (right side pre-reduced to one row per key/ts so the
    // carried payload is deterministic)
    "x_asof_join" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val prev = orders.groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("prev_okey"))
      AsofJoin.asofJoin(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        prev, Seq("o_custkey"), "o_orderdate", "o_orderdate",
        Map("prev_okey" -> "prev_okey", "o_orderdate" -> "prev_date"),
        strict = true)
        .select("o_orderkey", "prev_okey", "prev_date")
    }),

    // forward as-of with tolerance: each order annotated with the
    // customer's NEXT order, but only when it lands within 90 days —
    // the pandas merge_asof(direction='forward', tolerance=...) shape
    "x_asof_forward" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val next = orders.groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("next_okey"))
      AsofJoin.asofJoin(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        next, Seq("o_custkey"), "o_orderdate", "o_orderdate",
        Map("next_okey" -> "next_okey"),
        strict = true, forward = true,
        tolerance = Some(expr("INTERVAL 90 DAYS")))
        .select("o_orderkey", "next_okey")
    }),

    // keyless interval-containment join, bucketed by week: lineitems
    // shipped inside each sampled order's [orderdate, orderdate + n) window
    "x_range_join" -> ((s, d) => {
      val iv = Tables.orders(s, d)
        .where(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("iv_id"),
          col("o_orderdate").as("w_start"),
          (col("o_orderdate") + expr("make_interval(0,0,0, 1 + o_orderkey % 28)"))
            .as("w_end"))
      val matched = RangeJoin.intervalJoin(iv, "w_start", "w_end",
        Tables.lineitem(s, d), "l_shipdate", Seq("l_orderkey", "l_quantity"))
        .groupBy(col("iv_id"))
        .agg(count(lit(1)).as("n_ship"), round(sum("l_quantity"), 2).as("qty"))
      iv.join(matched, Seq("iv_id"), "left")
        .select(col("iv_id"), coalesce(col("n_ship"), lit(0L)).as("n_ship"),
          col("qty"))
    }),

    // same interval join written the NAIVE way — a plain inequality join
    // that Spark alone plans as BroadcastNestedLoopJoin — relying on the
    // RangeJoinRewrite optimizer rule to recover the bucketed equi-join
    // plan automatically (plans/RangeJoinRewrite.scala; asserted BNLJ-free
    // in RangeJoinRewriteSpec)
    "x_range_join_auto" -> ((s, d) => {
      graft.plans.RangeJoinRewrite.install(s, 7L * 86400L)
      val iv = Tables.orders(s, d)
        .where(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("iv_id"),
          col("o_orderdate").cast("timestamp").as("w_start"),
          (col("o_orderdate") + expr("make_interval(0,0,0, 1 + o_orderkey % 28)"))
            .cast("timestamp").as("w_end"))
      val pt = Tables.lineitem(s, d).select(col("l_quantity"),
        col("l_shipdate").cast("timestamp").as("ship_ts"))
      iv.join(pt, col("ship_ts") >= col("w_start") && col("ship_ts") < col("w_end"))
        .groupBy(col("iv_id"))
        .agg(count(lit(1)).as("n_ship"), round(sum("l_quantity"), 2).as("qty"))
    }),

    // skewed aggregation via salting: events concentrate on few
    // event_types (hot reducer keys); the salted two-phase plan spreads
    // each key over 16 reducers and must agree exactly with a plain GROUP BY
    "x_skew_agg" -> ((s, d) =>
      Skew.saltedAgg(
        Tables.events(s, d).select("event_type", "value"),
        Seq("event_type"), saltBuckets = 16,
        Map(
          "n" -> (count(lit(1)), sum(col("n"))),
          "total" -> (sum(col("value")), sum(col("total")))))
        .select(col("event_type"), col("n"), round(col("total"), 2).as("total"))),

    // salted join against a replicated small side (the explicit fallback
    // when the dim is above broadcast size and the fact key is hot)
    "x_skew_join" -> ((s, d) => {
      val dim = Tables.events(s, d).groupBy("event_type")
        .agg(round(min("value"), 2).as("w"))
      Skew.saltedJoin(
          Tables.events(s, d).select("event_type", "value"),
          dim, Seq("event_type"), saltBuckets = 8)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value") * col("w")), 2).as("wsum"))
    }),

    // co-bucketed join: both tables written bucketBy(orderkey) so the
    // join plans exchange-free (BucketedSpec asserts the plan property;
    // this verifies the result equals the plain join)
    "x_bucket_join" -> ((s, d) => {
      // local-harness-only fixture write (see LiftQueries.scratch)
      graft.common.Scratch.requireLocalMaster(s, "x_bucket_join fixture")
      val w = graft.common.Scratch.dir("ops", "bucket_join")
      graft.common.FsUtils.deleteFiles(s, Seq(w))
      graft.table.Bucketed.writeBucketed(
        Tables.orders(s, d).select("o_orderkey", "o_orderstatus"),
        "q_b_orders", s"$w/orders", Seq("o_orderkey"), 8)
      graft.table.Bucketed.writeBucketed(
        Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice"),
        "q_b_lineitem", s"$w/lineitem", Seq("l_orderkey"), 8)
      graft.table.Bucketed.table(s, "q_b_orders")
        .join(graft.table.Bucketed.table(s, "q_b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))
    }),

    // benchmark decontamination: every 97th doc stands in for the eval
    // set; each training doc reports its eval-shingle overlap fraction
    "x_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.contaminationScreen(docs, "doc_id",
        docs.where(col("doc_id") % 97 === 0), n = 3)
    }),

    // compression-ratio boilerplate signal. DuckDB has no deflate, so the
    // oracle joins a committed golden parquet (md5(text) → ratio) computed
    // by CPython's zlib (tools/make_compress_golden.py) — a genuine
    // cross-implementation check of the JVM Deflater expression
    "x_text_compress_ratio" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        round(TextOps.compressionRatio(col("text")), 4).as("compress_ratio"))),

    // byte-entropy gibberish/boilerplate signal, the complement of the
    // compression ratio (low = templated/repetitive, ~8 bits = random
    // bytes). Exact oracle: DuckDB replays the identical ln(x)/ln(2)
    // algebra with the identical ascending-byte summation order
    "x_text_entropy" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        length(col("text").cast("binary")).as("n_bytes"),
        round(graft.functions.GraftFunctions.byteEntropy(col("text")), 4)
          .as("entropy"))),

    // crawl-to-text extraction: script/style content dropped, tags
    // stripped keeping text, entities decoded, whitespace collapsed —
    // synthetic markup wrapped around each document (corpus has none)
    "x_text_strip_html" -> ((s, d) => {
      val html = concat(
        lit("<html><head><title>T</title><style>body{color:red}</style>" +
          "<script type=\"text/javascript\">var x = 1 < 2;</script></head>" +
          "<body><p class=\"main\">"),
        col("text"),
        lit("</p><div>footer &amp; nav &lt;3</div></body></html>"))
      Tables.documents(s, d).select(col("doc_id"),
        md5(TextOps.stripMarkup(html).cast("binary")).as("stripped_md5"),
        length(TextOps.stripMarkup(html)).as("n_chars_stripped"))
    }),

    // URL canonicalization: fragment + tracking params + default port
    // dropped, scheme/host lowercased, trailing slash removed — the
    // web-dedup key derivation (synthetic per-doc URLs)
    "x_url_canonical" -> ((s, d) => {
      val url = concat(lit("HTTP://WWW.Example"),
        (col("doc_id") % 20).cast("string"),
        lit(".COM:80/Dir/Page"), col("doc_id").cast("string"),
        lit("?utm_source=news&id="), col("doc_id").cast("string"),
        lit("&gclid=9#top"))
      val canon = TextOps.canonicalizeUrl(url)
      Tables.documents(s, d).select(col("doc_id"), canon.as("url_canon"),
        TextOps.urlDomain(canon).as("domain"))
    }),

    // keep-best dedup: whitespace/case-normalized duplicates collapse to
    // the LONGEST raw variant (ties to the smallest id) instead of the
    // first-crawled copy — map-side-combining struct max, no window
    "x_dedup_keep_best" -> ((s, d) =>
      Dedup.keepBest(Tables.documents(s, d),
          TextOps.normalize(col("text")), col("n_chars"), "doc_id")
        .select("doc_id", "n_chars", "n_copies")),

    // inverse-density sampling: dense LSH cells of embedding space thin
    // to ~16 expected keeps, sparse cells keep everything — diversity-
    // preserving selection without a full semantic-dedup pass
    "x_embed_density_sample" -> ((s, d) =>
      Sampling.densitySample(Tables.embeddings(s, d), "vec_id", "embedding",
        nPlanes = 4, cap = 16L)),

    // MOSS winnowing: per-doc fingerprints at ~1/w shingle density, then
    // the cross-doc shared-fingerprint counts (the plagiarism/near-dup
    // candidate signal); any shared run of >= w+k-1 tokens must share a
    // fingerprint
    "x_text_winnow" -> ((s, d) =>
      TextOps.winnowFingerprints(Tables.documents(s, d), "doc_id", "text",
          k = 5, w = 4)
        .groupBy(col("fp")).agg(countDistinct(col("doc_id")).as("n_docs"))
        .where(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("fp"))
        .limit(20)),

    // RAG chunking: overlapping 32-token windows every 24 tokens — the
    // retrieval-indexing substrate; map-only Generate, one row per chunk
    "x_chunk_windows" -> ((s, d) =>
      TextOps.chunkWindows(Tables.documents(s, d), "doc_id", "text",
          window = 32, stride = 24)
        .select(col("doc_id"), col("chunk_idx"),
          md5(col("chunk").cast("binary")).as("chunk_md5"))),

    // per-source quality gate: every source cuts its own worst quartile,
    // so a noisy domain is filtered against itself, not against the
    // corpus's best source
    "x_text_quality_by_source" -> ((s, d) =>
      TextOps.qualityFilterBySource(Tables.documents(s, d), "doc_id",
        "source", quantile = 0.25)),

    // multi-quantile convention pin: a percentile_disc ladder per source
    // at five q values. Discrete quantiles select ACTUAL observed scores,
    // so both engines emit bit-identical doubles iff their discrete-index
    // conventions coincide (SQL standard: least value with CDF >= q) —
    // this is the cross-engine proof the quality gates' thresholds rely
    // on at quantiles beyond the 0.25 the filters themselves exercise
    "x_text_quality_quantiles" -> ((s, d) =>
      TextOps.qualityScore(Tables.documents(s, d))
        .groupBy(col("source"))
        .agg(
          expr("percentile_disc(0.10) WITHIN GROUP (ORDER BY quality_score)").as("q10"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY quality_score)").as("q25"),
          expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY quality_score)").as("q50"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY quality_score)").as("q75"),
          expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY quality_score)").as("q90"),
          count(lit(1)).as("n_docs"))),

    // the split-quality audit closing the loop on x_split_safe: every
    // held-out (val/test) document reports the fraction of its 3-gram
    // shingles that ALSO appear in the training split — the residual
    // cross-split leakage the unit-hash split cannot remove (shared
    // boilerplate across non-identical docs). Same inverted-index
    // semi-join shape as x_contamination: train side shuffles 64-bit
    // shingle hashes only, holdout side is the small side
    "x_split_leakage" -> ((s, d) => {
      val split = Sampling.leakageSafeSplit(
        Tables.documents(s, d).withColumn("unit", md5(col("text"))),
        "unit", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      TextOps.contaminationScreen(
        split.where(col("split") =!= "train"), "doc_id",
        split.where(col("split") === "train"), n = 3)
    }),

    // PII scrub: synthetic emails/phones appended per doc (the corpus has
    // none), then counted and redacted with RE2-portable patterns
    "x_text_pii" -> ((s, d) => {
      val enriched = Tables.documents(s, d).withColumn("text",
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or +1-555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit(" now")))
      TextOps.redactPii(enriched)
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          md5(col("redacted").cast("binary")).as("redacted_md5"))
    }),

    // link-graph authority over a DERIVED deterministic web graph (each
    // doc emits 3 md5-derived outlinks): 5 damped PageRank iterations in
    // integer fixed point — every edge, every truncating division, and
    // every sum replays bit-exactly in the oracle's unrolled SQL. Per
    // iteration the exchanges carry (id, rank) / (dst, contrib) longs
    // only; the corpus text never enters the plan
    "x_graph_pagerank" -> ((s, d) =>
      Graph.pagerank(Tables.documents(s, d), "doc_id", outDeg = 3, iters = 5)),

    // degree profile of the same derived graph (in-degree skew is the
    // first spam/hub signal a crawl-prioritization pass reads)
    "x_graph_degree" -> ((s, d) =>
      Graph.degrees(Tables.documents(s, d), "doc_id", outDeg = 3)),

    // top principal component by fixed-point power iteration: every
    // corpus-level sum is an exact long, per-row folds run in index
    // order, and the driver sees only 64-long vectors per step — the
    // distributed PCA core, bit-replayed by the unrolled oracle
    "x_embed_pca" -> ((s, d) =>
      Similarity.topComponentProjection(
        Tables.embeddings(s, d), "vec_id", "embedding", iters = 4)),

    // link-spam composite: mean in-neighbor quality per document over the
    // derived graph — 1e-4 fixed-point sums, two IEEE divisions at the end
    "x_graph_neighbor_quality" -> ((s, d) =>
      Graph.neighborQuality(
        TextOps.qualityScore(Tables.documents(s, d)), "doc_id",
        "quality_score", outDeg = 3)),

    // one BPE-trainer iteration: the top adjacent character pairs a
    // byte-pair tokenizer would merge next — corpus collapses to
    // (word, count) first, the pair explode runs over the VOCABULARY
    "x_text_bpe_pairs" -> ((s, d) =>
      TextOps.bpePairCounts(Tables.documents(s, d), "text", k = 20)),

    // the full BPE TRAINING loop: 3 greedy merges learned in-engine —
    // each step is vocabulary-sized work + a 1-row winner collect
    "x_text_bpe_train" -> ((s, d) =>
      TextOps.bpeTrain(Tables.documents(s, d), "text", merges = 3)),

    // per-source distribution drift: grid-quantized two-sample KS between
    // each source's quality profile and the rest of the corpus — integer
    // cumulative counts on a 256-point grid, one division per cell
    "x_quality_ks" -> ((s, d) =>
      TextOps.qualityDrift(Tables.documents(s, d), "source", buckets = 256)),

    // directed sub-document duplication: fraction of a doc's 3-gram
    // shingles contained in another — the asymmetric twin of
    // x_dedup_ngram, catching short docs embedded in long ones
    "x_dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.6, minShingles = 3)),

    // bigram LM surprise with add-one smoothing — the step up from the
    // unigram logprob for perplexity-style filtering; count joins stay
    // plain shuffles (vocabulary-sized sides), V is one broadcast scalar
    "x_text_bigram_lm" -> ((s, d) =>
      TextOps.bigramLogProb(Tables.documents(s, d), "doc_id")),

    // RAKE keyphrases: stopword-delimited candidate runs, fixed-point
    // degree/freq word scores, integer phrase-score sums — corpus top-20
    "x_text_keyphrases" -> ((s, d) =>
      TextOps.rakeKeyphrases(Tables.documents(s, d), "doc_id", "text",
        k = 20)),

    // leakage-safe k-fold assignment: fold is a pure function of the
    // content digest, so byte-identical copies can never straddle folds
    "x_sample_kfold" -> ((s, d) =>
      TextOps.kFold(Tables.documents(s, d), "text", folds = 5)
        .select(col("doc_id"), col("fold"))),

    // Gopher-style named rule gate: integer-exact per-rule flags + keep
    "x_text_gopher_rules" -> ((s, d) =>
      TextOps.gopherRules(Tables.documents(s, d), "doc_id",
        minWords = 50, maxWords = 100000)),

    // per-source disparity of the Gopher gate: keep rate vs corpus rate
    // in signed basis points — the post-filter fairness audit
    "x_quality_disparity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.gateDisparity(
        TextOps.gopherRules(docs, "doc_id", minWords = 50)
          .join(docs.select(col("doc_id"), col("source")), "doc_id"),
        "source", "keep")
    }),

    // group-aware temporal split with a 30-day embargo before the cutoff;
    // per split: rows, entities, and residual cross-split entities
    "x_split_temporal" -> ((s, d) =>
      Curation.temporalSplit(Tables.orders(s, d), "o_custkey",
        "o_orderdate", "1998-01-01", embargoDays = 30)),

    // triangle listing on the derived link graph: oriented edge-iterator,
    // three compact (long, long) shuffles
    "x_graph_triangles" -> ((s, d) =>
      Graph.triangles(Tables.documents(s, d), "doc_id")),

    // batch BM25: one corpus token scan shared by 3 queries; the query
    // batch broadcasts; per-query top-k is a qid-partitioned window
    "x_retrieval_batch" -> ((s, d) => {
      import s.implicits._
      val qs = Seq(
        (1L, Seq("big", "order", "scan")),
        (2L, Seq("data", "table")),
        (3L, Seq("fast", "slow", "value"))).toDF("qid", "terms")
      TextOps.bm25Batch(Tables.documents(s, d), "doc_id", qs, "qid", "terms")
    }),

    // LPT-style balanced shards: round-robin over the size-descending
    // two-level rank, shard totals audited per shard
    "x_order_shards" -> ((s, d) =>
      Packing.balancedShards(Tables.documents(s, d), "doc_id",
          TextOps.bpeTokenCount(col("text")), shards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("weight")).as("tokens_total"))),

    // one-scan column profile of lineitem: null/distinct counts and
    // lexicographic bounds over deterministic string renderings
    "x_profile_table" -> ((s, d) =>
      Curation.profile(Tables.lineitem(s, d), Seq(
        "l_orderkey" -> col("l_orderkey"),
        "l_linenumber" -> col("l_linenumber"),
        "l_returnflag" -> col("l_returnflag"),
        "l_linestatus" -> col("l_linestatus"),
        "l_shipdate" -> date_format(col("l_shipdate"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS")))),

    // classifier reliability bins: per-bin positive rate in integer
    // basis points (no float rounding convention)
    "x_eval_calibration" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.calibrationBins(
        TextOps.hashedLinearScore(docs, "doc_id")
          .join(docs.select(col("doc_id"),
            (col("source") === "src1").as("y")), "doc_id"),
        "score", "y")
    }),

    // keyed interval-overlap join: click sessions x view sessions per
    // user — one keyed shuffle with the overlap predicate residual.
    // Session windows carry the standard timeout semantics: a session
    // stays open `gap` past its last event, so the interval is
    // [min_t, max_t + gap] (a bare [min, max] makes single-event
    // sessions zero-length and the overlap set vacuous)
    "x_interval_overlap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val gap = 1800000000L // 30 min in micros
      def sessions(tpe: String, p: String) = {
        val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
        Tables.events(s, d).where(col("event_type") === tpe)
          .select(col("user_id"), unix_micros(col("ts")).as("t"))
          .withColumn("__new",
            when(col("t") - lag(col("t"), 1).over(w) > gap ||
              lag(col("t"), 1).over(w).isNull, 1).otherwise(0))
          .withColumn("sid", sum(col("__new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("t")).as(s"${p}_start"),
            (max(col("t")) + gap).as(s"${p}_end"))
          .drop("sid")
      }
      Intervals.overlapJoin(sessions("click", "a"), sessions("view", "b"),
          Seq("user_id"), "a_start", "a_end", "b_start", "b_end")
        .select(col("user_id"), col("a_start"), col("b_start"),
          col("overlap").as("overlap_us"))
    }),

    // tie-corrected ROC-AUC of the hashed quality scorer against the
    // source label: doubled midranks keep the rank-sum integer; the one
    // unpartitioned window runs over the bounded distinct-score table
    "x_eval_auc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = TextOps.hashedLinearScore(docs, "doc_id")
        .join(docs.select(col("doc_id"),
          (col("source") === "src1").as("y")), "doc_id")
      Curation.rankAuc(scored, "score", "y")
    }),

    // Flesch-Kincaid-style readability grade from map-only regexp proxies
    "x_text_readability" -> ((s, d) =>
      TextOps.readability(Tables.documents(s, d), "doc_id")),

    // achieved-vs-target mixture KL audit: per-source p·ln(p/q) terms on
    // the sources-sized weight table
    "x_mix_kl" -> ((s, d) =>
      Sampling.mixtureKl(Tables.documents(s, d), "source")),

    // tokenizer fertility: chars-per-BPE-token per language — one
    // map-side-combined aggregation, integer sums, one final division
    "x_text_fertility" -> ((s, d) =>
      TextOps.tokenizerFertility(Tables.documents(s, d), "lang")),

    // JL signed random projection: driver-literal ±1 matrix (md5 nibble
    // parity), map-only left-to-right dot per (vector, output dim)
    "x_embed_rp" -> ((s, d) =>
      Similarity.randomProject(Tables.embeddings(s, d), "vec_id",
        "embedding", outDim = 16, inDim = 64)),

    // CCNet-style per-language perplexity tiers: head/middle/tail thirds
    // by unigram-LM surprise, ranked via the two-level prefix sum (no
    // per-language global sort, no NTILE convention)
    "x_text_ppl_buckets" -> ((s, d) =>
      TextOps.perplexityBuckets(Tables.documents(s, d), "doc_id", "lang")),

    // positional-inverted-index phrase search: only the query terms'
    // postings ever shuffle; adjacency is k-1 equi-joins on (id, pos)
    "x_retrieval_phrase" -> ((s, d) =>
      TextOps.phraseSearch(Tables.documents(s, d), "doc_id", "text",
        PhraseTerms)),

    // right-to-be-forgotten propagation: listed docs + byte-exact copies
    // + near-dups of listed docs, via broadcast digest/shingle probes
    "x_privacy_forget" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.removalPropagate(docs, "doc_id", "text",
        docs.where(col("doc_id") % 17 === 0).select("doc_id"))
    }),

    // HITS hubs & authorities over the derived link graph: 3 fixed-point
    // iterations, integer L1 renormalization via a one-row broadcast —
    // bit-deterministic like x_graph_pagerank
    "x_graph_hits" -> ((s, d) =>
      Graph.hits(Tables.documents(s, d), "doc_id", outDeg = 3, iters = 3)),

    // classifier evaluation: confusion counts + per-class precision/
    // recall/F1 for the k-NN labeler on its held-out slice — tp/fp/fn
    // stay integers, each ratio is a single guarded division
    "x_eval_confusion" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val preds = Similarity.knnClassify(e.where(col("vec_id") % 50 =!= 0),
        "vec_id", "embedding", "label",
        e.where(col("vec_id") % 50 === 0), "vec_id", "embedding", k = 10)
      val cells = e.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("label").as("true_label"))
        .join(preds, "q_id")
        .groupBy(col("true_label"), col("pred_label"))
        .agg(count(lit(1)).as("n"))
      val labels = e.select(col("label")).distinct()
      val tp = cells.where(col("true_label") === col("pred_label"))
        .select(col("true_label").as("label"), col("n").as("tp"))
      val fp = cells.where(col("true_label") =!= col("pred_label"))
        .groupBy(col("pred_label").as("label")).agg(sum(col("n")).as("fp"))
      val fn = cells.where(col("true_label") =!= col("pred_label"))
        .groupBy(col("true_label").as("label")).agg(sum(col("n")).as("fn"))
      labels.join(tp, Seq("label"), "left")
        .join(fp, Seq("label"), "left").join(fn, Seq("label"), "left")
        .select(col("label"),
          coalesce(col("tp"), lit(0L)).as("tp"),
          coalesce(col("fp"), lit(0L)).as("fp"),
          coalesce(col("fn"), lit(0L)).as("fn"))
        .withColumn("precision",
          when(col("tp") + col("fp") === 0, 0.0)
            .otherwise(round(col("tp").cast("double") /
              (col("tp") + col("fp")), 4)))
        .withColumn("recall",
          when(col("tp") + col("fn") === 0, 0.0)
            .otherwise(round(col("tp").cast("double") /
              (col("tp") + col("fn")), 4)))
        .withColumn("f1",
          when(lit(2L) * col("tp") + col("fp") + col("fn") === 0, 0.0)
            .otherwise(round(lit(2.0) * col("tp") /
              (lit(2L) * col("tp") + col("fp") + col("fn")), 4)))
    }),

    // BPE ENCODE: the trained 3-rule merge table applied back to the
    // corpus — train→encode in one engine, per-doc piece statistics
    "x_text_bpe_encode" -> ((s, d) =>
      TextOps.bpeEncode(Tables.documents(s, d), "doc_id", "text",
        merges = 3)),

    // corpus snapshot diff: the "next" crawl derives deterministically
    // from the testdata (doc_id % 7 == 3 dropped, doc_id % 5 == 0 texts
    // edited, doc_id % 11 == 0 re-issued under a shifted id) — the diff
    // report carries 16-byte digests only, never text
    "x_corpus_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val next = docs.where(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.where(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      Curation.snapshotDiff(docs, next, "doc_id", "text")
    }),

    // k-anonymity release audit over (lang, source, length-bucket):
    // every document labelled with its equivalence-class size and the
    // suppress flag at k = 5
    "x_privacy_kanon" -> ((s, d) =>
      Curation.kAnonymity(
        Tables.documents(s, d)
          .withColumn("len_bucket", expr("n_chars div 100")),
        "doc_id", Seq("lang", "source", "len_bucket"), k = 5)),

    // robust per-source length outliers: median ± 2.5 robust-z via MAD,
    // doubled-median INTEGER arithmetic end to end — no interpolated
    // quantile convention in play, bit-exact in any engine
    "x_quality_outliers" -> ((s, d) =>
      Curation.robustOutliers(Tables.documents(s, d), "doc_id", "n_chars",
        "source", cMilli = 2500L)),

    // curriculum ordering: rank easy-to-hard by quality score, cut into
    // 10 stages, hash-shuffle within each stage — both total orders are
    // two-level prefix sums, never one unpartitioned corpus window
    "x_order_curriculum" -> ((s, d) =>
      Curation.curriculumOrder(
        TextOps.qualityScore(Tables.documents(s, d))
          .select(col("doc_id"), col("quality_score")),
        "doc_id", col("quality_score"), stages = 10)),

    // order-sensitive near-dup: Levenshtein over 80-char prefixes,
    // candidates from the df-capped inverted shingle index + lossless
    // length filter — the DP runs only on surviving candidate pairs
    "x_dedup_edit" -> ((s, d) =>
      Dedup.editDistancePairs(Tables.documents(s, d), "doc_id", "text",
        prefixLen = 80, maxDist = 20, n = 3)),

    // LSH banding recall audit: exact shingle-Jaccard pairs vs a
    // deliberately coarse 2-band MinHash candidate set (k = 32,
    // rows = 16 — this corpus's near-dups sit at jaccard >= 0.9, where
    // 2x16 banding recalls ~30-90%, so the measurement is non-trivial) —
    // the audit every approximate-dedup deployment owes its users
    "x_dedup_audit" -> ((s, d) =>
      Dedup.lshRecallAudit(Tables.documents(s, d), "doc_id", "text",
        n = 3, k = 32, bands = 2, threshold = 0.7)),

    // k-NN majority-vote labeling: the vec_id % 50 == 0 slice classified
    // by its 10 nearest labeled neighbours (corpus = the other 490)
    "x_knn_classify" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.knnClassify(e.where(col("vec_id") % 50 =!= 0), "vec_id",
        "embedding", "label", e.where(col("vec_id") % 50 === 0), "vec_id",
        "embedding", k = 10)
    }),

    // lexical diversity: type-token ratio + hapax fraction per document
    // — (doc_id, token) pairs shuffle once, the same economics as tf-idf
    "x_text_ttr" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"),
        TextOps.tokens(col("text")).as("toks"))
      val perTok = t.select(col("doc_id"), explode(col("toks")).as("tk"))
        .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("n"))
      val agg = perTok.groupBy(col("doc_id")).agg(
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      t.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_types"), lit(0L)).as("n_types"),
          coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
          when(coalesce(col("n_tokens"), lit(0L)) === 0, 0.0)
            .otherwise(round(col("n_types").cast("double") /
              col("n_tokens"), 4)).as("ttr"),
          when(coalesce(col("n_types"), lit(0L)) === 0, 0.0)
            .otherwise(round(col("n_hapax").cast("double") /
              col("n_types"), 4)).as("hapax_frac"))
    }),

    // nearest-in-either-direction as-of (pandas merge_asof
    // direction='nearest'): each order takes the customer's closest OTHER
    // order day, backward winning ties — one key exchange, two running
    // windows, integer day arithmetic
    "x_asof_nearest" -> ((s, d) => {
      val orders = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"),
        expr("unix_date(CAST(o_orderdate AS DATE))").as("od"))
      val g = orders.groupBy(col("o_custkey"), col("od"))
        .agg(max("o_orderkey").as("near_okey"))
      AsofJoin.nearestJoin(orders, g, Seq("o_custkey"), "od", "od",
        Map("near_okey" -> "near_okey", "od" -> "near_od"), strict = true)
        .select(col("o_orderkey"), col("near_okey"),
          (col("near_od") - col("od")).as("gap_days"))
    }),

    // per-supplier shipment-window union: how many distinct days each
    // supplier had stock in transit, vs the span — gaps-and-islands, one
    // key-partitioned sort, integer day arithmetic end to end. The
    // in-transit window is [shipdate, shipdate + linenumber % 7] (the
    // testdata carries no receiptdate, so transit time derives
    // deterministically from the row itself)
    "x_interval_coverage" -> ((s, d) =>
      Intervals.coverage(
        Tables.lineitem(s, d).select(col("l_suppkey"),
          expr("unix_date(CAST(l_shipdate AS DATE))").as("s_day"),
          expr("unix_date(CAST(l_shipdate AS DATE)) + CAST(l_linenumber % 7 AS INT)")
            .as("e_day")),
        Seq("l_suppkey"), "s_day", "e_day"))
  )

  /** The x_retrieval_phrase query phrase — single source of truth for
    * BOTH the Spark query and the DuckDB oracle's generated conjunction. */
  private val PhraseTerms = Seq("big", "order", "scan")

  /** Shared DuckDB fragments mirroring TextOps/Dedup hash arithmetic. */
  private[queries] val Toks =
    """list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), w -> len(w) > 0)"""

  /** Shared Gopher rule-gate CTE chain ending in `g` (per-doc flags). */
  private val GopherCtes =
    s"""t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
       |f AS (SELECT doc_id,
       |  CAST(len(toks) AS INT) AS n_words,
       |  CAST(coalesce(list_sum(list_transform(toks, w -> len(w))), 0) AS BIGINT) AS wlen,
       |  len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS alpha,
       |  len(list_filter(toks, w -> list_contains(
       |    ['the','a','an','and','or','of','to','in','is','it'], w))) AS stop,
       |  len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS punct
       |  FROM t),
       |g AS (SELECT doc_id, n_words,
       |  (n_words >= 50 AND n_words <= 100000) AS flag_word_count,
       |  (n_words > 0 AND (wlen * 1000) // n_words BETWEEN 3000 AND 10000)
       |    AS flag_mean_word_len,
       |  (alpha * 5 >= n_words * 4 AND n_words > 0) AS flag_alpha,
       |  (punct * 10 <= n_words) AS flag_symbol,
       |  (stop >= 2) AS flag_stopwords,
       |  ((n_words >= 50 AND n_words <= 100000)
       |   AND (n_words > 0 AND (wlen * 1000) // n_words BETWEEN 3000 AND 10000)
       |   AND (alpha * 5 >= n_words * 4 AND n_words > 0)
       |   AND (punct * 10 <= n_words) AND (stop >= 2)) AS keep
       |  FROM f)""".stripMargin

  /** Shared CTE chain computing exact-Jaccard candidate pairs (`p`),
    * reusable inside WITH RECURSIVE for the clustering oracle. */
  private val ShingleCtes =
    s"""t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
       |       ELSE list_distinct(list_transform(range(1, len(toks) - 1),
       |              i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS sh
       |  FROM t),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |         FROM ex l JOIN ex r ON l.s = r.s AND l.doc_id < r.doc_id),
       |p AS (SELECT id_a, id_b,
       |  round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
       |        CAST(len(list_distinct(x.sh || y.sh)) AS DOUBLE), 4) AS jaccard
       |  FROM cand JOIN sh x ON x.doc_id = cand.id_a JOIN sh y ON y.doc_id = cand.id_b)""".stripMargin

  private val ShinglesSql =
    s"WITH $ShingleCtes\nSELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.7"

  /** Left-fold double dot product of two DuckDB float lists (same
    * summation order as Spark's `aggregate(zip_with(...))`). */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  private def cosineSql(a: String, b: String): String =
    s"""(CASE WHEN ${normSql(a)} * ${normSql(b)} = 0 THEN CAST(0 AS DOUBLE)
       |  ELSE ${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}) END)""".stripMargin

  /** Squared L2 between a float list and a double list — mirrors
    * [[Similarity.sqDist]]'s left-to-right summation. */
  private def sqDistSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |  i -> (CAST($a[i] AS DOUBLE) - $b[i]) * (CAST($a[i] AS DOUBLE) - $b[i])),
       |  (x, y) -> x + y)""".stripMargin

  /** Per-subspace clone of the deterministic kmeans chain (seeds by
    * md5(vec_id), 2 iterations, 6-dp inter-iteration rounding, final
    * codebook rounded to 4 dp) over list_slice'd 32-dim subvectors —
    * produces CTEs v{s}..asg{s} for the PQ oracles. */
  private def PqChain(s: Int): String = {
    val a = s * 32 + 1
    val b = a + 31
    def assign(cents: String) =
      s"""SELECT vec_id, vec, cell,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |  FROM (SELECT v.vec_id, v.vec, c.cell,
         |    ${sqDistSql("v.vec", "c.cvec")} AS dist
         |    FROM v$s v CROSS JOIN $cents c)""".stripMargin
    def means(t: String) =
      s"""SELECT cell, CAST(t.dim AS INT) AS dim, round(avg(vec[t.dim + 1]), 6) AS mean
         |  FROM $t, UNNEST(range(len(vec))) AS t(dim) WHERE rn = 1 GROUP BY 1, 2""".stripMargin
    s"""v$s AS (SELECT vec_id,
       |  list_transform(list_slice(embedding, $a, $b), x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings),
       |s0$s AS (SELECT vec_id AS cell, vec AS cvec FROM v$s
       |  ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT), vec_id
       |  LIMIT 4),
       |a1$s AS (${assign(s"s0$s")}),
       |m1$s AS (${means(s"a1$s")}),
       |c1$s AS (SELECT cell, list(mean ORDER BY dim) AS cvec FROM m1$s GROUP BY cell),
       |a2$s AS (${assign(s"c1$s")}),
       |m2$s AS (${means(s"a2$s")}),
       |c2$s AS (SELECT cell, list(round(mean, 4) ORDER BY dim) AS cvec FROM m2$s GROUP BY cell),
       |asg$s AS (${assign(s"c2$s")})""".stripMargin
  }

  /** Random-hyperplane LSH bucket mirroring [[Similarity.lshBucket]]. */
  private def bucketSql(v: String): String =
    s"""CAST(list_sum(list_transform(range(0, 4), p -> CASE WHEN
       |  list_reduce(list_transform(range(1, len($v) + 1),
       |    i -> CAST($v[i] AS DOUBLE) *
       |      ((CAST(CAST('0x' || substr(md5(CAST(p AS VARCHAR) || ':' ||
       |          CAST(i - 1 AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)
       |        / 4294967296.0) - 0.5)),
       |    (x, y) -> x + y) >= 0 THEN (1 << p) ELSE 0 END)) AS INT)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "x_text_tokens" ->
      s"""SELECT doc_id,
         |CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)) AS INT) AS n_ws_tokens,
         |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens
         |FROM documents""".stripMargin,

    "x_text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(len(toks) AS INT) AS n_tokens,
         |  round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) /
         |        greatest(len(text), 1), 4) AS punct_ratio,
         |  round(CAST(len(list_filter(toks, w -> list_contains(
         |      ['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE) /
         |        greatest(len(toks), 1), 4) AS stopword_ratio,
         |  round(CAST(list_sum(list_transform(toks, w -> len(w))) AS DOUBLE) /
         |        greatest(len(toks), 1), 4) AS mean_word_len
         |  FROM t)
         |SELECT doc_id, n_tokens, punct_ratio, stopword_ratio, mean_word_len,
         |  round(least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
         |      + stopword_ratio * CAST(0.4 AS DOUBLE)
         |      + (CAST(1.0 AS DOUBLE) - least(punct_ratio * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
         |    4) AS quality_score
         |FROM f""".stripMargin,

    "x_text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, $Toks AS toks FROM documents),
         |h AS (SELECT doc_id, lang,
         |  len(list_filter(toks, w -> list_contains(['the','and','of','is','a'], w))) AS h_en,
         |  len(list_filter(toks, w -> list_contains(['der','und','die','ist','das'], w))) AS h_de,
         |  len(list_filter(toks, w -> list_contains(['le','et','la','est','les'], w))) AS h_fr,
         |  len(list_filter(toks, w -> list_contains(['el','y','la','es','los'], w))) AS h_es,
         |  len(list_filter(toks, w -> list_contains(['de','shi','zai','le','he'], w))) AS h_zh
         |  FROM t)
         |SELECT doc_id, lang,
         |  CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_zh) <= 0 THEN 'und'
         |       WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
         |       WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
         |       WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
         |       WHEN h_es >= h_zh THEN 'es'
         |       ELSE 'zh' END AS lang_pred
         |FROM h""".stripMargin,

    "x_text_blocklist" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents)
         |SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
         |  CAST(len(list_filter(toks,
         |      w -> list_contains(['slow','dup','drop'], w))) AS INT) AS n_blocked,
         |  len(list_filter(toks,
         |      w -> list_contains(['slow','dup','drop'], w))) * 10000
         |    <= 300 * len(toks) AS kept
         |FROM t""".stripMargin,

    "x_text_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS fp,
         |md5(array_to_string(list_sort(list_distinct($Toks)), ' ')) AS fp_canon
         |FROM documents""".stripMargin,

    "x_dedup_exact" ->
      "SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY text",

    // The LSH parameters (32 bands x 2 rows at threshold 0.7) detect every
    // qualifying pair with probability 1 - (1 - j^2)^32 >= 1 - 1e-9 for
    // j >= 0.7, and the data's qualifying pairs all sit at j >= 0.9 — so
    // the exact-Jaccard oracle IS the expected LSH output (verified).
    "x_dedup_minhash" -> ShinglesSql,
    "x_dedup_ngram" -> ShinglesSql,

    // prefix filtering is recall-lossless, so the oracle is the same
    // brute-force exact-Jaccard shape at this query's threshold
    "x_dedup_prefix" ->
      s"WITH $ShingleCtes\nSELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.6",

    // reachability closure over the pair graph; cluster id = min reachable
    "x_dedup_clusters" ->
      s"""WITH RECURSIVE $ShingleCtes,
         |pr AS (SELECT id_a, id_b FROM p WHERE jaccard >= 0.7),
         |e AS (SELECT id_a AS src, id_b AS dst FROM pr
         |      UNION SELECT id_b, id_a FROM pr),
         |reach(a, b) AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
         |m AS (SELECT a, min(b) AS mn FROM reach GROUP BY a)
         |SELECT d.doc_id,
         |  least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_id
         |FROM documents d LEFT JOIN m ON m.a = d.doc_id""".stripMargin,

    "x_dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |hh AS (SELECT doc_id, list_transform(toks,
         |         w -> CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)) AS hs FROM t),
         |sig AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), j ->
         |  CASE WHEN 2 * len(list_filter(hs, x -> ((x >> j) & 1) = 1)) > len(hs)
         |       THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
         |  FROM hh)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,

    "x_embed_neardup" ->
      s"""WITH p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosineSql("a.embedding", "b.embedding")}, 4) AS cosine
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.4""".stripMargin,

    "x_embed_kmeans" -> {
      def assign(cents: String) =
        s"""SELECT vec_id, vec, cell,
           |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
           |  FROM (SELECT v.vec_id, v.vec, c.cell,
           |    ${sqDistSql("v.vec", "c.cvec")} AS dist
           |    FROM v CROSS JOIN $cents c)""".stripMargin
      def means(a: String) =
        s"""SELECT cell, CAST(t.dim AS INT) AS dim, round(avg(vec[t.dim + 1]), 6) AS mean
           |  FROM $a, UNNEST(range(len(vec))) AS t(dim) WHERE rn = 1 GROUP BY 1, 2""".stripMargin
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |           FROM embeddings),
         |s0 AS (SELECT vec_id AS cell, vec AS cvec FROM v
         |       ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT), vec_id
         |       LIMIT 8),
         |a1 AS (${assign("s0")}),
         |m1 AS (${means("a1")}),
         |c1 AS (SELECT cell, list(mean ORDER BY dim) AS cvec FROM m1 GROUP BY cell),
         |a2 AS (${assign("c1")}),
         |m2 AS (${means("a2")})
         |SELECT cell, dim, round(mean, 4) AS mean FROM m2""".stripMargin
    },

    "x_ann_ivf_trained" -> {
      def assign(cents: String) =
        s"""SELECT vec_id, vec, cell,
           |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
           |  FROM (SELECT v.vec_id, v.vec, c.cell,
           |    ${sqDistSql("v.vec", "c.cvec")} AS dist
           |    FROM v CROSS JOIN $cents c)""".stripMargin
      def means(a: String) =
        s"""SELECT cell, CAST(t.dim AS INT) AS dim, round(avg(vec[t.dim + 1]), 6) AS mean
           |  FROM $a, UNNEST(range(len(vec))) AS t(dim) WHERE rn = 1 GROUP BY 1, 2""".stripMargin
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |           FROM embeddings),
         |s0 AS (SELECT vec_id AS cell, vec AS cvec FROM v
         |       ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT), vec_id
         |       LIMIT 8),
         |a1 AS (${assign("s0")}),
         |m1 AS (${means("a1")}),
         |c1 AS (SELECT cell, list(mean ORDER BY dim) AS cvec FROM m1 GROUP BY cell),
         |a2 AS (${assign("c1")}),
         |m2 AS (${means("a2")}),
         |c2 AS (SELECT cell, list(round(mean, 4) ORDER BY dim) AS cvec FROM m2 GROUP BY cell),
         |asg AS (${assign("c2")}),
         |q AS (SELECT vec AS qv, cell FROM asg WHERE vec_id = 0 AND rn = 1),
         |sc AS (SELECT e.vec_id, round(${cosineSql("e.vec", "q.qv")}, 3) AS cosine
         |       FROM asg e JOIN q ON e.cell = q.cell
         |       WHERE e.rn = 1 AND e.vec_id <> 0)
         |SELECT vec_id, cosine FROM sc ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin
    },

    // row-form mirror of the map-only literal-matrix screen: CROSS JOIN +
    // GROUP BY computes the identical cosines (same left-to-right list
    // arithmetic), and max/count are order-independent
    "x_embed_decontaminate" ->
      s"""WITH ev AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |            FROM embeddings WHERE vec_id % 101 = 0),
         |c AS (SELECT t.vec_id, ${cosineSql("t.embedding", "ev.e")} AS cos
         |      FROM embeddings t CROSS JOIN ev WHERE t.vec_id % 101 <> 0)
         |SELECT vec_id,
         |  CAST(round(max(cos) * 1e6) AS BIGINT) AS max_cos_micro,
         |  CAST(count(*) FILTER (WHERE cos >= 0.40) AS BIGINT) AS n_close,
         |  (count(*) FILTER (WHERE cos >= 0.40)) > 0 AS contaminated
         |FROM c GROUP BY 1""".stripMargin,

    "x_dedup_semantic" -> {
      def assign(cents: String) =
        s"""SELECT vec_id, vec, cell,
           |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
           |  FROM (SELECT v.vec_id, v.vec, c.cell,
           |    ${sqDistSql("v.vec", "c.cvec")} AS dist
           |    FROM v CROSS JOIN $cents c)""".stripMargin
      def means(a: String) =
        s"""SELECT cell, CAST(t.dim AS INT) AS dim, round(avg(vec[t.dim + 1]), 6) AS mean
           |  FROM $a, UNNEST(range(len(vec))) AS t(dim) WHERE rn = 1 GROUP BY 1, 2""".stripMargin
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |           FROM embeddings),
         |s0 AS (SELECT vec_id AS cell, vec AS cvec FROM v
         |       ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT), vec_id
         |       LIMIT 8),
         |a1 AS (${assign("s0")}),
         |m1 AS (${means("a1")}),
         |c1 AS (SELECT cell, list(mean ORDER BY dim) AS cvec FROM m1 GROUP BY cell),
         |a2 AS (${assign("c1")}),
         |m2 AS (${means("a2")}),
         |c2 AS (SELECT cell, list(round(mean, 4) ORDER BY dim) AS cvec FROM m2 GROUP BY cell),
         |asg AS (SELECT vec_id, vec, cell FROM (${assign("c2")}) WHERE rn = 1),
         |drp AS (SELECT DISTINCT l.vec_id AS id
         |        FROM asg l JOIN asg r ON l.cell = r.cell AND r.vec_id < l.vec_id
         |        WHERE ${cosineSql("l.vec", "r.vec")} >= 0.35)
         |SELECT vec_id, cell FROM asg
         |WHERE vec_id NOT IN (SELECT id FROM drp)""".stripMargin
    },

    "x_embed_pq" -> {
      s"""WITH ${PqChain(0)},
         |${PqChain(1)}
         |SELECT vec_id, CAST(0 AS INT) AS sub, cell AS code FROM asg0 WHERE rn = 1
         |UNION ALL
         |SELECT vec_id, CAST(1 AS INT) AS sub, cell AS code FROM asg1 WHERE rn = 1""".stripMargin
    },

    "x_ann_pq" -> {
      def lut(s: Int): String =
        s"""q$s AS (SELECT vec FROM v$s WHERE vec_id = 0),
           |lut$s AS (SELECT c.cell, ${sqDistSql("q.vec", "c.cvec")} AS qd
           |          FROM c2$s c, q$s q),
           |d$s AS (SELECT a.vec_id, l.qd FROM asg$s a JOIN lut$s l ON a.cell = l.cell
           |        WHERE a.rn = 1)""".stripMargin
      s"""WITH ${PqChain(0)},
         |${PqChain(1)},
         |${lut(0)},
         |${lut(1)}
         |SELECT d0.vec_id, round(d0.qd + d1.qd, 6) AS adist
         |FROM d0 JOIN d1 ON d0.vec_id = d1.vec_id
         |WHERE d0.vec_id <> 0
         |ORDER BY d0.qd + d1.qd, d0.vec_id LIMIT 10""".stripMargin
    },

    "x_ann_rerank" -> {
      def lut(s: Int): String =
        s"""q$s AS (SELECT vec FROM v$s WHERE vec_id = 0),
           |lut$s AS (SELECT c.cell, ${sqDistSql("q.vec", "c.cvec")} AS qd
           |          FROM c2$s c, q$s q),
           |d$s AS (SELECT a.vec_id, l.qd FROM asg$s a JOIN lut$s l ON a.cell = l.cell
           |        WHERE a.rn = 1)""".stripMargin
      s"""WITH ${PqChain(0)},
         |${PqChain(1)},
         |${lut(0)},
         |${lut(1)},
         |ad AS (SELECT d0.vec_id, d0.qd + d1.qd AS raw
         |       FROM d0 JOIN d1 ON d0.vec_id = d1.vec_id WHERE d0.vec_id <> 0),
         |c AS (SELECT label, CAST(t.dim AS INT) AS dim,
         |  round(avg(CAST(embedding[t.dim + 1] AS DOUBLE)), 4) AS mean
         |  FROM embeddings, UNNEST(range(len(embedding))) AS t(dim)
         |  GROUP BY 1, 2),
         |cv AS (SELECT label AS cell, list(mean ORDER BY dim) AS cvec FROM c GROUP BY label),
         |a AS (SELECT e.vec_id, e.embedding, cv.cell,
         |  ${sqDistSql("e.embedding", "cv.cvec")} AS dist
         |  FROM embeddings e CROSS JOIN cv),
         |asg AS (SELECT vec_id, embedding, cell FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |   FROM a) WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |pc AS (SELECT cv.cell FROM cv, q
         |       ORDER BY ${sqDistSql("q.qv", "cv.cvec")}, cv.cell LIMIT 3),
         |short AS (SELECT e.vec_id, e.embedding, ad.raw
         |          FROM asg e JOIN pc ON e.cell = pc.cell
         |          JOIN ad ON ad.vec_id = e.vec_id
         |          WHERE e.vec_id <> 0
         |          ORDER BY ad.raw, e.vec_id LIMIT 50)
         |SELECT s.vec_id, round(s.raw, 6) AS adist,
         |  round(${cosineSql("s.embedding", "q.qv")}, 3) AS cosine
         |FROM short s, q ORDER BY cosine DESC, s.vec_id LIMIT 10""".stripMargin
    },

    "x_embed_lsh_pairs" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |           FROM embeddings),
         |p AS (SELECT l.vec_id AS id_a, r.vec_id AS id_b,
         |  round(${cosineSql("l.embedding", "r.embedding")}, 4) AS cosine
         |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
         |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.3""".stripMargin,

    // exact-integer mirror of Similarity.centroidsMicro: same 1e-6
    // quantization, HUGEINT sum, one IEEE division — no double in the hash
    "x_embed_centroid" ->
      s"""WITH e AS (SELECT label, CAST(t.dim AS INT) AS dim,
         |             CAST(round(CAST(embedding[t.dim + 1] AS DOUBLE) * 1e6)
         |                  AS BIGINT) AS xq
         |           FROM embeddings, UNNEST(range(len(embedding))) AS t(dim))
         |SELECT label, dim,
         |  CAST(round(CAST(sum(CAST(xq AS HUGEINT)) AS DOUBLE)
         |             / (count(*) * 100.0)) AS BIGINT) AS mean_micro
         |FROM e GROUP BY 1, 2""".stripMargin,

    // fixed-point mirror of Similarity.standardize: identical 1e-6
    // quantization, exact HUGEINT moments (DuckDB's int128 stands in for
    // Spark's decimal(38,0)), one division over one sqrt of exact
    // integers, integer micro-unit output — no double column survives to
    // the hash, so no signed-zero or decimal-boundary divergence exists
    "x_embed_standardize" ->
      s"""WITH e AS (SELECT vec_id, CAST(t.dim AS INT) AS dim,
         |             CAST(round(CAST(embedding[t.dim + 1] AS DOUBLE) * 1e6)
         |                  AS BIGINT) AS xq
         |           FROM embeddings, UNNEST(range(len(embedding))) AS t(dim)),
         |st AS (SELECT dim, CAST(count(*) AS HUGEINT) AS n,
         |              CAST(sum(xq) AS HUGEINT) AS sq,
         |              sum(CAST(xq AS HUGEINT) * xq) AS ssq
         |       FROM e GROUP BY dim),
         |s2 AS (SELECT dim, n, sq, n * ssq - sq * sq AS disc FROM st)
         |SELECT e.vec_id, e.dim,
         |  CASE WHEN s2.disc <= 0 THEN 0
         |       ELSE CAST(round(CAST(s2.n * e.xq - s2.sq AS DOUBLE)
         |                 / sqrt(CAST(s2.disc AS DOUBLE)) * 1e4) AS BIGINT)
         |  END AS z_micro
         |FROM e JOIN s2 USING (dim)""".stripMargin,

    "x_knn_graph" ->
      s"""WITH p AS (SELECT l.vec_id AS src_id, r.vec_id AS nbr_id,
         |    round(${cosineSql("l.embedding", "r.embedding")}, 4) AS cosine
         |  FROM embeddings l JOIN embeddings r
         |    ON l.label = r.label AND l.vec_id <> r.vec_id),
         |t AS (SELECT src_id, nbr_id, cosine,
         |    row_number() OVER (PARTITION BY src_id
         |                       ORDER BY cosine DESC, nbr_id) AS rank
         |  FROM p)
         |SELECT e.src_id, e.nbr_id, e.cosine, CAST(e.rank AS INT) AS rank,
         |  m.src_id IS NOT NULL AS mutual
         |FROM (SELECT * FROM t WHERE rank <= 3) e
         |LEFT JOIN (SELECT * FROM t WHERE rank <= 3) m
         |  ON e.src_id = m.nbr_id AND e.nbr_id = m.src_id""".stripMargin,

    "x_ann_brute" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT e.vec_id, round(${cosineSql("e.embedding", "q.qv")}, 3) AS cosine
         |      FROM embeddings e, q WHERE e.vec_id <> 0)
         |SELECT vec_id, cosine FROM s ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

    "x_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |           FROM embeddings),
         |q AS (SELECT embedding AS qv, bucket FROM b WHERE vec_id = 0),
         |s AS (SELECT e.vec_id, round(${cosineSql("e.embedding", "q.qv")}, 3) AS cosine
         |      FROM b e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> 0)
         |SELECT vec_id, cosine FROM s ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

    "x_ann_lsh_probe" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |           FROM embeddings),
         |q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0),
         |s AS (SELECT e.vec_id, round(${cosineSql("e.embedding", "q.qv")}, 3) AS cosine
         |      FROM b e, q
         |      WHERE e.vec_id <> 0 AND xor(e.bucket, q.qb) IN (0, 1, 2, 4, 8))
         |SELECT vec_id, cosine FROM s ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

    "x_ann_ivf" ->
      s"""WITH c AS (SELECT label, CAST(t.dim AS INT) AS dim,
         |  round(avg(CAST(embedding[t.dim + 1] AS DOUBLE)), 4) AS mean
         |  FROM embeddings, UNNEST(range(len(embedding))) AS t(dim)
         |  GROUP BY 1, 2),
         |cv AS (SELECT label AS cell, list(mean ORDER BY dim) AS cvec FROM c GROUP BY label),
         |a AS (SELECT e.vec_id, e.embedding, cv.cell,
         |  ${sqDistSql("e.embedding", "cv.cvec")} AS dist
         |  FROM embeddings e CROSS JOIN cv),
         |asg AS (SELECT vec_id, embedding, cell FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |   FROM a) WHERE rn = 1),
         |q AS (SELECT embedding AS qv, cell FROM asg WHERE vec_id = 0),
         |s AS (SELECT e.vec_id, round(${cosineSql("e.embedding", "q.qv")}, 3) AS cosine
         |      FROM asg e JOIN q ON e.cell = q.cell WHERE e.vec_id <> 0)
         |SELECT vec_id, cosine FROM s ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

    "x_text_classifier" ->
      s"""WITH tok AS (SELECT doc_id, unnest($Toks) AS token FROM documents),
         |f AS (SELECT doc_id,
         |        CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 1024 AS b
         |      FROM tok),
         |w AS (SELECT doc_id,
         |        CAST('0x' || substr(md5('w:' || b), 1, 8) AS BIGINT) % 2001 - 1000 AS w_milli
         |      FROM f),
         |a AS (SELECT doc_id, sum(w_milli) AS wsum, count(*) AS n_tokens
         |      FROM w GROUP BY doc_id)
         |SELECT doc_id,
         |  floor(wsum * 10.0 / n_tokens) / 10000.0 AS score,
         |  n_tokens, wsum >= 0 AS keep
         |FROM a""".stripMargin,
    "x_source_minhash" ->
      s"""WITH t AS (SELECT source, $Toks AS toks FROM documents),
         |sh AS (SELECT source,
         |  CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_distinct(list_transform(range(1, len(toks) - 1),
         |              i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS sh
         |  FROM t),
         |d AS (SELECT DISTINCT source, unnest(sh) AS s FROM sh),
         |h AS (SELECT source, CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS h FROM d),
         |sig AS (SELECT source, u.i,
         |          min(((2 * u.i + 1) * h + (101 * u.i + 17)) % 4294967311) AS m
         |        FROM h, UNNEST(range(32)) AS u(i) GROUP BY 1, 2),
         |sv AS (SELECT source, list(m ORDER BY i) AS sig FROM sig GROUP BY source)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  round(CAST(len(list_filter(range(1, 33), i -> a.sig[i] = b.sig[i]))
         |        AS DOUBLE) / 32, 4) AS est_jaccard
         |FROM sv a JOIN sv b ON a.source < b.source""".stripMargin,
    "x_text_bm25" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS toks FROM documents),
         |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM toks),
         |stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM toks),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tok
         |       WHERE token IN ('spark', 'query', 'join') GROUP BY 1, 2),
         |dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |s AS (SELECT tf.doc_id, tf.token,
         |        ln((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         |          * tf.tf * (1.2 + 1.0)
         |          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
         |      FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id) CROSS JOIN stats),
         |agg AS (SELECT doc_id,
         |          round(list_reduce(list(s ORDER BY token), (x, y) -> x + y), 4) AS bm25
         |        FROM s GROUP BY doc_id)
         |SELECT doc_id, bm25 FROM agg ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,
    "x_retrieval_rrf" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS toks FROM documents),
         |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM toks),
         |stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM toks),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tok
         |       WHERE token IN ('spark', 'query', 'join') GROUP BY 1, 2),
         |dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id, tf.token,
         |        ln((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         |          * tf.tf * (1.2 + 1.0)
         |          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
         |      FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id) CROSS JOIN stats),
         |bm AS (SELECT doc_id,
         |          round(list_reduce(list(s ORDER BY token), (x, y) -> x + y), 4) AS bm25
         |        FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20),
         |bmr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank_a
         |        FROM bm),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cs AS (SELECT e.vec_id, round(${cosineSql("e.embedding", "q.qv")}, 3) AS cosine
         |       FROM embeddings e, q WHERE e.vec_id <> 0),
         |ann AS (SELECT vec_id AS doc_id, cosine FROM cs
         |        ORDER BY cosine DESC, vec_id LIMIT 20),
         |anr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS rank_b
         |        FROM ann),
         |f AS (SELECT doc_id, rank_a, rank_b,
         |        round(coalesce(CAST(1 AS DOUBLE) / (60 + rank_a), 0) +
         |              coalesce(CAST(1 AS DOUBLE) / (60 + rank_b), 0), 6) AS rrf
         |      FROM bmr FULL OUTER JOIN anr USING (doc_id))
         |SELECT doc_id, rank_a, rank_b, rrf FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    "x_knn_join" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |           WHERE vec_id % 100 = 0),
         |s AS (SELECT q.q_id, e.vec_id,
         |        round(${cosineSql("e.embedding", "q.qv")}, 3) AS cosine
         |      FROM embeddings e CROSS JOIN q WHERE q.q_id <> e.vec_id),
         |r AS (SELECT q_id, vec_id, cosine,
         |        CAST(row_number() OVER (PARTITION BY q_id
         |             ORDER BY cosine DESC, vec_id) AS INT) AS rank
         |      FROM s)
         |SELECT q_id, vec_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin,
    "x_knn_join_ivf" ->
      s"""WITH c AS (SELECT label, CAST(t.dim AS INT) AS dim,
         |  round(avg(CAST(embedding[t.dim + 1] AS DOUBLE)), 4) AS mean
         |  FROM embeddings, UNNEST(range(len(embedding))) AS t(dim)
         |  GROUP BY 1, 2),
         |cv AS (SELECT label AS cell, list(mean ORDER BY dim) AS cvec FROM c GROUP BY label),
         |a AS (SELECT e.vec_id, e.embedding, cv.cell,
         |  ${sqDistSql("e.embedding", "cv.cvec")} AS dist
         |  FROM embeddings e CROSS JOIN cv),
         |asg AS (SELECT vec_id, embedding, cell FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |   FROM a) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |      WHERE vec_id % 100 = 0),
         |pc AS (SELECT q_id, qv, cell FROM
         |  (SELECT q.q_id, q.qv, cv.cell,
         |     row_number() OVER (PARTITION BY q.q_id
         |       ORDER BY ${sqDistSql("q.qv", "cv.cvec")}, cv.cell) AS rn
         |   FROM q CROSS JOIN cv) WHERE rn <= 2),
         |s AS (SELECT pc.q_id, e.vec_id,
         |        round(${cosineSql("e.embedding", "pc.qv")}, 3) AS cosine
         |      FROM asg e JOIN pc ON e.cell = pc.cell WHERE pc.q_id <> e.vec_id),
         |r AS (SELECT q_id, vec_id, cosine,
         |        CAST(row_number() OVER (PARTITION BY q_id
         |             ORDER BY cosine DESC, vec_id) AS INT) AS rank
         |      FROM s)
         |SELECT q_id, vec_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin,
    "x_ann_recall" ->
      s"""WITH eq AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |           WHERE vec_id % 100 = 0),
         |es AS (SELECT eq.q_id, e.vec_id,
         |        round(${cosineSql("e.embedding", "eq.qv")}, 3) AS cosine
         |      FROM embeddings e CROSS JOIN eq WHERE eq.q_id <> e.vec_id),
         |er AS (SELECT q_id, vec_id,
         |        row_number() OVER (PARTITION BY q_id
         |          ORDER BY cosine DESC, vec_id) AS rank FROM es),
         |ex AS (SELECT q_id, vec_id FROM er WHERE rank <= 5),
         |c AS (SELECT label, CAST(t.dim AS INT) AS dim,
         |  round(avg(CAST(embedding[t.dim + 1] AS DOUBLE)), 4) AS mean
         |  FROM embeddings, UNNEST(range(len(embedding))) AS t(dim)
         |  GROUP BY 1, 2),
         |cv AS (SELECT label AS cell, list(mean ORDER BY dim) AS cvec FROM c GROUP BY label),
         |a AS (SELECT e.vec_id, e.embedding, cv.cell,
         |  ${sqDistSql("e.embedding", "cv.cvec")} AS dist
         |  FROM embeddings e CROSS JOIN cv),
         |asg AS (SELECT vec_id, embedding, cell FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |   FROM a) WHERE rn = 1),
         |pc AS (SELECT q_id, qv, cell FROM
         |  (SELECT eq.q_id, eq.qv, cv.cell,
         |     row_number() OVER (PARTITION BY eq.q_id
         |       ORDER BY ${sqDistSql("eq.qv", "cv.cvec")}, cv.cell) AS rn
         |   FROM eq CROSS JOIN cv) WHERE rn <= 2),
         |s2 AS (SELECT pc.q_id, e.vec_id,
         |        round(${cosineSql("e.embedding", "pc.qv")}, 3) AS cosine
         |      FROM asg e JOIN pc ON e.cell = pc.cell WHERE pc.q_id <> e.vec_id),
         |r2 AS (SELECT q_id, vec_id,
         |        row_number() OVER (PARTITION BY q_id
         |          ORDER BY cosine DESC, vec_id) AS rank FROM s2),
         |ax AS (SELECT q_id, vec_id FROM r2 WHERE rank <= 5)
         |SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ax.vec_id) AS BIGINT) AS n_found,
         |  round(CAST(count(ax.vec_id) AS DOUBLE) / count(*), 4) AS recall
         |FROM ex LEFT JOIN ax ON ex.q_id = ax.q_id AND ex.vec_id = ax.vec_id
         |GROUP BY ex.q_id""".stripMargin,

    "x_ann_ivf_probe" ->
      s"""WITH c AS (SELECT label, CAST(t.dim AS INT) AS dim,
         |  round(avg(CAST(embedding[t.dim + 1] AS DOUBLE)), 4) AS mean
         |  FROM embeddings, UNNEST(range(len(embedding))) AS t(dim)
         |  GROUP BY 1, 2),
         |cv AS (SELECT label AS cell, list(mean ORDER BY dim) AS cvec FROM c GROUP BY label),
         |a AS (SELECT e.vec_id, e.embedding, cv.cell,
         |  ${sqDistSql("e.embedding", "cv.cvec")} AS dist
         |  FROM embeddings e CROSS JOIN cv),
         |asg AS (SELECT vec_id, embedding, cell FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |   FROM a) WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |pc AS (SELECT cv.cell FROM cv, q
         |       ORDER BY ${sqDistSql("q.qv", "cv.cvec")}, cv.cell LIMIT 3),
         |s AS (SELECT e.vec_id, round(${cosineSql("e.embedding", "q.qv")}, 3) AS cosine
         |      FROM asg e JOIN pc ON e.cell = pc.cell, q WHERE e.vec_id <> 0)
         |SELECT vec_id, cosine FROM s ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

    "x_embed_quantize" ->
      s"""WITH m AS (SELECT vec_id,
         |  list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS lo,
         |  list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS hi
         |  FROM embeddings)
         |SELECT e.vec_id, round(m.lo, 4) AS lo, round(m.hi, 4) AS hi,
         |  CAST(t.i - 1 AS INT) AS dim,
         |  CAST(round((CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) - m.lo) /
         |    (CASE WHEN m.hi = m.lo THEN 1 ELSE m.hi - m.lo END) * 255) AS INT) AS qv
         |FROM embeddings e JOIN m ON e.vec_id = m.vec_id,
         |  UNNEST(range(1, len(e.embedding) + 1)) AS t(i)""".stripMargin,

    "x_text_vocab" ->
      s"""WITH t AS (SELECT doc_id, unnest(list_distinct($Toks)) AS token FROM documents),
         |df AS (SELECT token, count(*) AS doc_freq FROM t GROUP BY token)
         |SELECT token, doc_freq FROM df ORDER BY doc_freq DESC, token LIMIT 20""".stripMargin,

    "x_text_tfidf" ->
      s"""WITH tok AS (SELECT doc_id, unnest($Toks) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfq AS (SELECT token, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (SELECT tf.doc_id, tf.token, tf.tf, dfq.doc_freq,
         |  round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.doc_freq), 4) AS tfidf
         |  FROM tf JOIN dfq USING (token) CROSS JOIN n)
         |SELECT doc_id, token, tf, doc_freq, tfidf FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, token) AS rn FROM s) WHERE rn = 1""".stripMargin,

    "x_text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
         |        ELSE list_transform(range(1, len(toks) - 1),
         |          i -> array_to_string(list_slice(toks, i, i + 2), ' ')) END AS tris FROM t),
         |e AS (SELECT doc_id, unnest(tris) AS tri FROM g),
         |c AS (SELECT doc_id, tri, count(*) AS n FROM e GROUP BY 1, 2),
         |m AS (SELECT doc_id, CAST(max(n) AS INT) AS max_tri, CAST(sum(n) AS INT) AS n_tri
         |      FROM c GROUP BY 1)
         |SELECT g.doc_id, coalesce(m.max_tri, 0) AS max_tri, coalesce(m.n_tri, 0) AS n_tri,
         |  round(CAST(coalesce(m.max_tri, 0) AS DOUBLE) / greatest(coalesce(m.n_tri, 0), 1), 4) AS rep_ratio
         |FROM g LEFT JOIN m USING (doc_id)""".stripMargin,

    "x_pack_chunks" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, n,
        |  coalesce(sum(n) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM t)
        |SELECT doc_id, n AS n_tokens,
        |  CAST(floor(CAST(before AS DOUBLE) / 2048) AS BIGINT) AS chunk_id
        |FROM c""".stripMargin,

    "x_corpus_shuffle" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT),
        |    doc_id) - 1 AS BIGINT) AS shuffle_pos,
        |  CAST(floor((row_number() OVER (ORDER BY
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT),
        |    doc_id) - 1) / 64) AS BIGINT) AS shard
        |FROM documents""".stripMargin,

    "x_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      / 4294967296.0
        |  < (CASE WHEN lang = 'en' THEN 0.25 WHEN lang = 'de' THEN 0.5 ELSE 1.0 END)""".stripMargin,

    "x_split_safe" ->
      """SELECT doc_id,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST('0x' || substr(md5(coalesce(md5(text), '__null_unit__')), 1, 8) AS BIGINT)
        |          / 4294967296.0 AS u
        |      FROM documents)""".stripMargin,

    "x_dedup_incremental" ->
      """SELECT min(f.doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents f
        |WHERE f.doc_id % 5 = 0
        |  AND NOT EXISTS (SELECT 1 FROM documents i
        |                  WHERE i.doc_id % 5 <> 0 AND i.text = f.text)
        |GROUP BY f.text""".stripMargin,

    "x_text_novelty" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |b AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)),
         |        i -> array_to_string(list_slice(toks, i, i + 1), ' ')))) AS bg
         |      FROM t WHERE len(toks) >= 2),
         |d AS (SELECT bg, count(*) AS df FROM b GROUP BY 1)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(CAST(count(CASE WHEN df = 1 THEN 1 END) AS DOUBLE)
         |        / count(*), 4) AS novelty
         |FROM b JOIN d USING (bg) GROUP BY 1""".stripMargin,

    "x_text_top_ngrams" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |  CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_distinct(list_transform(range(1, len(toks) - 1),
         |              i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS sh
         |  FROM t),
         |ex AS (SELECT doc_id, unnest(sh) AS ngram FROM sh)
         |SELECT ngram, count(*) AS n FROM ex
         |GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20""".stripMargin,

    "x_sketch_tdigest" ->
      """SELECT CAST(q AS DOUBLE) AS q, TRUE AS within_bound
        |FROM (VALUES (0.1), (0.5), (0.9), (0.99)) t(q)""".stripMargin,

    // full bit-level replay of the KMV sketch: same 60-bit md5 hash, same
    // kth-order statistic per group and globally, same estimate arithmetic
    // ((k-1)*2^60/h_k in doubles), same 3-sigma bound boolean
    "x_sketch_kmv" ->
      """WITH h AS (SELECT DISTINCT l_returnflag AS grp,
        |             CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |                  AS BIGINT) AS hv
        |           FROM lineitem),
        |ex AS (SELECT l_returnflag AS grp, count(DISTINCT l_partkey) AS n_exact
        |       FROM lineitem GROUP BY 1),
        |r AS (SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn,
        |        count(*) OVER (PARTITION BY grp) AS sz FROM h),
        |kth AS (SELECT grp, max(CASE WHEN rn = 128 THEN hv END) AS kth,
        |          max(sz) AS sz FROM r GROUP BY grp),
        |gr AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
        |         count(*) OVER () AS sz FROM (SELECT DISTINCT hv FROM h)),
        |gkth AS (SELECT max(CASE WHEN rn = 128 THEN hv END) AS kth,
        |           max(sz) AS sz FROM gr),
        |gex AS (SELECT count(DISTINCT l_partkey) AS n_exact FROM lineitem),
        |per AS (
        |  SELECT k.grp, e.n_exact, k.kth,
        |    CASE WHEN k.sz < 128 THEN CAST(k.sz AS DOUBLE)
        |         ELSE round(127.0 * CAST(1152921504606846976 AS DOUBLE)
        |                    / CAST(k.kth AS DOUBLE), 2) END AS est
        |  FROM kth k JOIN ex e USING (grp)
        |  UNION ALL
        |  SELECT '__all__', g.n_exact, gk.kth,
        |    CASE WHEN gk.sz < 128 THEN CAST(gk.sz AS DOUBLE)
        |         ELSE round(127.0 * CAST(1152921504606846976 AS DOUBLE)
        |                    / CAST(gk.kth AS DOUBLE), 2) END
        |  FROM gkth gk CROSS JOIN gex g)
        |SELECT grp, n_exact, kth, est,
        |  (abs(est / n_exact - 1.0) <= 3.0 / sqrt(126.0)) AS within_bound
        |FROM per""".stripMargin,

    // bit-level replay of the KMV overlap: same sketches, same union
    // sketch + theta, same rho-scaled estimate and 3-sigma bound
    "x_sketch_kmv_overlap" ->
      """WITH h AS (SELECT DISTINCT o_orderstatus AS grp,
        |             CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
        |                  AS BIGINT) AS hv
        |           FROM orders),
        |r AS (SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
        |      FROM h),
        |sk AS (SELECT grp, list(hv ORDER BY hv) AS sk FROM r WHERE rn <= 128 GROUP BY grp),
        |dv AS (SELECT DISTINCT o_orderstatus AS grp, o_custkey AS v FROM orders),
        |ex AS (SELECT a.grp AS grp_a, b.grp AS grp_b, count(*) AS n_inter
        |       FROM dv a JOIN dv b ON a.v = b.v AND a.grp < b.grp GROUP BY 1, 2),
        |c AS (SELECT x.grp AS grp_a, y.grp AS grp_b,
        |        list_sort(list_distinct(list_concat(x.sk, y.sk)))[1:128] AS u,
        |        list_intersect(x.sk, y.sk) AS common
        |      FROM sk x JOIN sk y ON x.grp < y.grp),
        |s AS (SELECT grp_a, grp_b, u, common,
        |        CASE WHEN len(u) < 128 THEN CAST(len(common) AS DOUBLE)
        |             ELSE round((CAST(len(list_filter(common, h -> h <= u[128])) AS DOUBLE) / 128.0)
        |                        * ((127.0 * CAST(1152921504606846976 AS DOUBLE))
        |                           / CAST(u[128] AS DOUBLE)), 2)
        |        END AS est_inter
        |      FROM c)
        |SELECT s.grp_a, s.grp_b, coalesce(e.n_inter, 0) AS n_inter, s.est_inter,
        |  CASE WHEN len(s.u) < 128
        |       THEN s.est_inter = CAST(coalesce(e.n_inter, 0) AS DOUBLE)
        |       ELSE abs(s.est_inter - coalesce(e.n_inter, 0)) <=
        |            (3.0 / sqrt(128.0)) * ((127.0 * CAST(1152921504606846976 AS DOUBLE))
        |                                   / CAST(s.u[128] AS DOUBLE))
        |  END AS within_bound
        |FROM s LEFT JOIN ex e USING (grp_a, grp_b)""".stripMargin,

    "x_text_train_lr" ->
      s"""WITH t AS (SELECT doc_id, (source = 'src1') AS y, $Toks AS toks FROM documents),
         |f AS (SELECT doc_id, y, unnest(toks) AS token FROM t),
         |x AS (SELECT doc_id, y,
         |        CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 64 AS b,
         |        count(*) AS cnt,
         |        CASE WHEN y THEN 1000000 ELSE 0 END AS yfp
         |      FROM f GROUP BY 1, 2, 3),
         |n AS (SELECT count(DISTINCT doc_id) AS n FROM x),
         |g1 AS (SELECT b, sum(cnt * (yfp - 500000)) AS gfp FROM x GROUP BY b),
         |w1 AS (SELECT b, CAST(floor(gfp / (100.0 * n.n)) AS BIGINT) AS wfp
         |       FROM g1, n),
         |s2 AS (SELECT x.doc_id, sum(x.cnt * w1.wfp) AS sfp
         |       FROM x JOIN w1 USING (b) GROUP BY 1),
         |p2 AS (SELECT doc_id,
         |         CAST(round(1000000.0 / (1 + exp(-(sfp / 1000000.0)))) AS BIGINT) AS pfp
         |       FROM s2),
         |g2 AS (SELECT x.b, sum(x.cnt * (x.yfp - p2.pfp)) AS gfp
         |       FROM x JOIN p2 USING (doc_id) GROUP BY 1),
         |w2 AS (SELECT w1.b, w1.wfp + CAST(floor(g2.gfp / (100.0 * n.n)) AS BIGINT) AS wfp
         |       FROM w1 JOIN g2 USING (b), n)
         |SELECT CAST(b AS INT) AS bucket, wfp AS w_micro,
         |  round(wfp / 1000000.0, 6) AS w
         |FROM w2""".stripMargin,

    "x_text_pmi" ->
      s"""WITH t AS (SELECT $Toks AS toks FROM documents),
         |u AS (SELECT unnest(toks) AS token FROM t),
         |uc AS (SELECT token, count(*) AS c FROM u GROUP BY 1),
         |b0 AS (SELECT toks[r.i] AS w1, toks[r.i + 1] AS w2
         |       FROM t, unnest(range(1, len(toks))) AS r(i)),
         |b AS (SELECT w1, w2, count(*) AS c12 FROM b0 GROUP BY 1, 2),
         |n AS (SELECT sum(c) AS n FROM uc),
         |m AS (SELECT sum(c12) AS m FROM b)
         |SELECT b.w1, b.w2, b.c12,
         |  round(ln((b.c12 / m.m) / ((u1.c / n.n) * (u2.c / n.n))), 4) AS pmi
         |FROM b JOIN uc u1 ON b.w1 = u1.token JOIN uc u2 ON b.w2 = u2.token, n, m
         |WHERE b.c12 >= 5
         |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    "x_sketch_cms" ->
      s"""WITH t AS (SELECT $Toks AS toks FROM documents),
         |tok AS (SELECT unnest(toks) AS token FROM t),
         |probe(token) AS (VALUES ('join'), ('hash'), ('scan'), ('order'), ('zyzzyx')),
         |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
         |SELECT p.token, CAST(coalesce(c.cnt, 0) AS BIGINT) AS exact_count,
         |  TRUE AS within_bound
         |FROM probe p LEFT JOIN c USING (token)""".stripMargin,

    "x_doc_length_hist" ->
      """SELECT CAST(floor(log2(greatest(n_chars, 1) + 0.5)) AS BIGINT) AS log2_chars,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1""".stripMargin,

    "x_text_normalize" ->
      """SELECT doc_id,
        |  CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS INT) AS n_chars_norm,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_norm
        |FROM documents""".stripMargin,

    "x_dedup_norm" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))""".stripMargin,

    "x_sample_lang_cap" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |             / 4294967296.0, doc_id) AS rn
        |  FROM documents) WHERE rn <= 20""".stripMargin,

    "x_pipeline_curate" ->
      s"""WITH dd AS (SELECT doc_id, lang, text FROM (
         |  SELECT doc_id, lang, text, row_number() OVER (
         |    PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
         |    ORDER BY doc_id) AS rn
         |  FROM documents) WHERE rn = 1),
         |t AS (SELECT doc_id, lang, text, $Toks AS toks FROM dd),
         |f AS (SELECT doc_id, lang,
         |  CAST(len(toks) AS INT) AS n_tokens,
         |  round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) /
         |        greatest(len(text), 1), 4) AS punct_ratio,
         |  round(CAST(len(list_filter(toks, w -> list_contains(
         |      ['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE) /
         |        greatest(len(toks), 1), 4) AS stopword_ratio
         |  FROM t),
         |q AS (SELECT doc_id, lang,
         |  round(least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
         |      + stopword_ratio * CAST(0.4 AS DOUBLE)
         |      + (CAST(1.0 AS DOUBLE) - least(punct_ratio * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
         |    4) AS quality_score
         |  FROM f),
         |k AS (SELECT * FROM q WHERE quality_score >=
         |        (SELECT quantile_disc(quality_score, 0.25) FROM q))
         |SELECT doc_id, lang, quality_score FROM (
         |  SELECT doc_id, lang, quality_score, row_number() OVER (PARTITION BY lang
         |    ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
         |             / 4294967296.0, doc_id) AS rn
         |  FROM k) WHERE rn <= 15""".stripMargin,

    "x_mix_weights" ->
      """WITH c AS (SELECT source, count(*) AS n_docs, sqrt(count(*)) AS pw
        |           FROM documents GROUP BY 1)
        |SELECT source, n_docs, round(pw / (SELECT sum(pw) FROM c), 6) AS mix_weight
        |FROM c""".stripMargin,

    "x_mix_apply" ->
      """WITH c AS (SELECT source, count(*) AS n_docs, sqrt(count(*)) AS pw
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source,
        |        CAST(round(round(pw / (SELECT sum(pw) FROM c), 6) * 1000000) AS BIGINT) AS w6
        |      FROM c),
        |q AS (SELECT source, greatest(1, (w6 * 200 + 500000) // 1000000) AS quota FROM w),
        |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |        ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |                 / 4294967296.0, doc_id) AS rn
        |      FROM documents)
        |SELECT doc_id, source FROM r JOIN q USING (source) WHERE rn <= quota""".stripMargin,

    "x_mix_epochs" ->
      """WITH c AS (SELECT source, sqrt(count(*)) AS pw FROM documents GROUP BY 1),
        |w AS (SELECT source,
        |        CAST(round(round(pw / (SELECT sum(pw) FROM c), 6) * 1000000) AS BIGINT) AS w6
        |      FROM c),
        |b AS (SELECT source, (w6 * 5000000 + 500000) // 1000000 AS token_budget FROM w),
        |t AS (SELECT source,
        |        CAST(sum(len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0))) AS BIGINT) AS token_stock
        |      FROM documents GROUP BY 1)
        |SELECT t.source, t.token_stock, b.token_budget,
        |  round(CAST(b.token_budget AS DOUBLE) / greatest(t.token_stock, 1), 4) AS epochs
        |FROM t JOIN b USING (source)""".stripMargin,

    "x_mix_tokens" ->
      """WITH c AS (SELECT source, sqrt(count(*)) AS pw FROM documents GROUP BY 1),
        |w AS (SELECT source,
        |        CAST(round(round(pw / (SELECT sum(pw) FROM c), 6) * 1000000) AS BIGINT) AS w6
        |      FROM c),
        |q AS (SELECT source, (w6 * 12000 + 500000) // 1000000 AS budget FROM w),
        |t AS (SELECT doc_id, source,
        |        CAST(len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) AS BIGINT) AS n_tokens
        |      FROM documents),
        |r AS (SELECT doc_id, source, n_tokens,
        |        coalesce(sum(n_tokens) OVER (PARTITION BY source
        |          ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |      FROM t)
        |SELECT r.doc_id, r.source, r.n_tokens
        |FROM r JOIN q USING (source) WHERE r.prior < q.budget""".stripMargin,

    "x_mix_dsir" ->
      s"""WITH t AS (SELECT doc_id, (source = 'src1') AS tgt, $Toks AS toks
         |           FROM documents),
         |f AS (SELECT doc_id, tgt,
         |        unnest(toks || list_transform(range(1, len(toks)),
         |                 i -> toks[i] || ' ' || toks[i + 1])) AS f
         |      FROM t),
         |fb AS (SELECT doc_id, tgt,
         |         CAST('0x' || substr(md5(f), 1, 8) AS BIGINT) % 4096 AS b
         |       FROM f),
         |dist AS (SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
         |                sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
         |         FROM fb GROUP BY b),
         |tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM dist),
         |r AS (SELECT b, ln((ct + 1.0) / (nt + 4096.0))
         |             - ln((cr + 1.0) / (nr + 4096.0)) AS l
         |      FROM dist CROSS JOIN tot),
         |c AS (SELECT doc_id, b, CAST(count(*) AS DOUBLE) AS c
         |      FROM fb WHERE NOT tgt GROUP BY 1, 2),
         |s AS (SELECT doc_id,
         |        list_reduce(list(c.c * r.l ORDER BY c.b), (x, y) -> x + y) AS raw
         |      FROM c JOIN r USING (b) GROUP BY doc_id)
         |SELECT doc_id, round(raw, 4) AS dsir_logw,
         |  round(raw - ln(-ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
         |    AS BIGINT) + 1) / 4294967296.0)), 4) AS gumbel_key
         |FROM s ORDER BY gumbel_key DESC, doc_id LIMIT 25""".stripMargin,

    "x_dedup_soft" ->
      """SELECT doc_id, count(*) OVER (PARTITION BY text) AS n_copies,
        |  round(1.0 / count(*) OVER (PARTITION BY text), 6) AS weight
        |FROM documents""".stripMargin,

    "x_dedup_spans" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |g AS (SELECT doc_id, CAST(u.i AS INTEGER) AS pos,
         |        array_to_string(toks[u.i + 1 : u.i + 5], ' ') AS gram
         |      FROM t, unnest(range(0, greatest(len(toks) - 4, 0))) AS u(i)),
         |m AS (SELECT *, row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
         |      FROM g),
         |c AS (SELECT DISTINCT doc_id, pos + v.j AS idx
         |      FROM m, unnest(range(0, 5)) AS v(j) WHERE rn > 1),
         |s AS (SELECT doc_id, count(*) AS dup_tokens FROM c GROUP BY 1)
         |SELECT t.doc_id, CAST(len(t.toks) AS INTEGER) AS n_tokens, s.dup_tokens,
         |  round(s.dup_tokens / CAST(len(t.toks) AS DOUBLE), 6) AS dup_frac
         |FROM t JOIN s USING (doc_id) WHERE s.dup_tokens > 0""".stripMargin,

    // replay of the excision: same first-copy-wins span coverage (gram
    // text in place of the 64-bit gram hash — collision-free at oracle
    // scale), kept tokens re-joined in position order, empty docs -> ''
    "x_text_excise" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |g AS (SELECT doc_id, CAST(u.i AS INTEGER) AS pos,
         |        array_to_string(toks[u.i + 1 : u.i + 5], ' ') AS gram
         |      FROM t, unnest(range(0, greatest(len(toks) - 4, 0))) AS u(i)),
         |m AS (SELECT *, row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
         |      FROM g),
         |c AS (SELECT DISTINCT doc_id, pos + v.j AS idx
         |      FROM m, unnest(range(0, 5)) AS v(j) WHERE rn > 1),
         |p AS (SELECT doc_id, CAST(u.i AS INTEGER) AS idx, toks[u.i + 1] AS tok
         |      FROM t, unnest(range(0, len(toks))) AS u(i)),
         |kept AS (SELECT p.doc_id, p.idx, p.tok
         |         FROM p LEFT JOIN c ON c.doc_id = p.doc_id AND c.idx = p.idx
         |         WHERE c.idx IS NULL),
         |agg AS (SELECT doc_id, count(*) AS n_kept,
         |          string_agg(tok, ' ' ORDER BY idx) AS clean
         |        FROM kept GROUP BY 1)
         |SELECT t.doc_id, CAST(len(t.toks) AS INTEGER) AS n_tokens,
         |  CAST(coalesce(a.n_kept, 0) AS INTEGER) AS n_kept,
         |  md5(coalesce(a.clean, '')) AS fp_clean
         |FROM t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "x_embed_truncate" ->
      """WITH v AS (SELECT vec_id,
        |             list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nn
        |      FROM v)
        |SELECT vec_id,
        |  round(v[1] / (CASE WHEN nn = 0 THEN 1.0 ELSE nn END), 4) + 0.0
        |    AS d1_renormed,
        |  round(nn, 4) AS norm16
        |FROM n""".stripMargin,

    // the Bloom sketch is recall-lossless (only false POSITIVES, resolved
    // by the exact anti-join), so the oracle is the plain incremental shape
    "x_dedup_bloom" ->
      """SELECT min(f.doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents f
        |WHERE f.doc_id % 3 = 0
        |  AND NOT EXISTS (SELECT 1 FROM documents i
        |                  WHERE i.doc_id % 3 <> 0 AND i.text = f.text)
        |GROUP BY f.text""".stripMargin,

    "x_text_logprob" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |e AS (SELECT doc_id, unnest(toks) AS token FROM t),
         |f AS (SELECT doc_id, token, count(*) AS tf FROM e GROUP BY 1, 2),
         |c AS (SELECT token, CAST(sum(tf) AS BIGINT) AS cnt FROM f GROUP BY 1),
         |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tok FROM c)
         |SELECT doc_id,
         |  round(sum(tf * ln(CAST(cnt AS DOUBLE) / n_tok)) / sum(tf), 4)
         |    AS mean_logprob,
         |  CAST(sum(tf) AS BIGINT) AS n_tokens
         |FROM f JOIN c USING (token), n
         |GROUP BY 1""".stripMargin,

    "x_text_quality_filter" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(len(toks) AS INT) AS n_tokens,
         |  round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) /
         |        greatest(len(text), 1), 4) AS punct_ratio,
         |  round(CAST(len(list_filter(toks, w -> list_contains(
         |      ['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE) /
         |        greatest(len(toks), 1), 4) AS stopword_ratio
         |  FROM t),
         |q AS (SELECT doc_id,
         |  round(least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
         |      + stopword_ratio * CAST(0.4 AS DOUBLE)
         |      + (CAST(1.0 AS DOUBLE) - least(punct_ratio * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
         |    4) AS quality_score
         |  FROM f)
         |SELECT doc_id, quality_score FROM q
         |WHERE quality_score >= (SELECT quantile_disc(quality_score, 0.25) FROM q)""".stripMargin,

    "x_sample_weighted" ->
      """SELECT doc_id, n_chars FROM documents
        |ORDER BY ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1)
        |            / 4294967296.0) / n_chars DESC, doc_id
        |LIMIT 50""".stripMargin,

    "x_dedup_paragraph" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |p AS (SELECT doc_id, CAST(i AS INT) AS para_idx,
         |        array_to_string(list_slice(toks, i * 20 + 1, i * 20 + 20), ' ') AS para
         |      FROM t, unnest(range(CAST(ceil(len(toks) / 20.0) AS BIGINT))) AS u(i)
         |      WHERE len(toks) > 0)
         |SELECT doc_id, para_idx, n_copies FROM (
         |  SELECT doc_id, para_idx,
         |         count(*) OVER (PARTITION BY para) AS n_copies,
         |         row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx) AS rn
         |  FROM p) WHERE rn = 1""".stripMargin,

    "x_text_dupfrac" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |p AS (SELECT doc_id, CAST(i AS INT) AS para_idx,
         |        array_to_string(list_slice(toks, i * 20 + 1, i * 20 + 20), ' ') AS para
         |      FROM t, unnest(range(CAST(ceil(len(toks) / 20.0) AS BIGINT))) AS u(i)
         |      WHERE len(toks) > 0),
         |c AS (SELECT para, count(*) AS n FROM p GROUP BY 1)
         |SELECT doc_id, count(*) AS n_paras,
         |  round(avg(CASE WHEN n > 1 THEN 1.0 ELSE 0.0 END), 4) AS dup_para_frac
         |FROM p JOIN c USING (para) GROUP BY 1""".stripMargin,

    "x_doc_source_stats" ->
      s"""WITH t AS (SELECT doc_id, source, lang, n_chars, text, $Toks AS toks FROM documents),
         |f AS (SELECT doc_id, source, lang, n_chars,
         |  CAST(len(toks) AS INT) AS n_tokens,
         |  round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) /
         |        greatest(len(text), 1), 4) AS punct_ratio,
         |  round(CAST(len(list_filter(toks, w -> list_contains(
         |      ['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE) /
         |        greatest(len(toks), 1), 4) AS stopword_ratio
         |  FROM t),
         |q AS (SELECT source, lang, n_chars,
         |  round(least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
         |      + stopword_ratio * CAST(0.4 AS DOUBLE)
         |      + (CAST(1.0 AS DOUBLE) - least(punct_ratio * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
         |    4) AS quality_score
         |  FROM f)
         |SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  round(avg(quality_score), 4) AS avg_quality,
         |  count(DISTINCT lang) AS n_langs
         |FROM q GROUP BY 1""".stripMargin,

    // replays packMedia's header-synthesis arithmetic (never parses bytes):
    // png header 33 B, jpeg 12+3n B, wav 44 B; dims w=id%512+64,
    // h=id*7%512+64; png channels rgb/rgba by id parity, jpeg 1 or 3
    // components; wav sr 8000/16000 and 1/2 channels by parity, 16-bit —
    // byte rate sr*ch*2, seconds = tlen / byte_rate off the data chunk
    "x_mm_decode" ->
      s"""WITH m AS (SELECT doc_id, len(text) AS tlen, doc_id % 3 AS k,
         |    doc_id % 2 AS p FROM documents)
         |SELECT doc_id,
         |  CAST(tlen + CASE WHEN k = 0 THEN 33
         |                   WHEN k = 1 THEN 12 + 3 * (CASE WHEN p = 0 THEN 1 ELSE 3 END)
         |                   ELSE 44 END AS INT) AS byte_len,
         |  CASE WHEN k = 0 THEN 'image/png' WHEN k = 1 THEN 'image/jpeg'
         |       ELSE 'audio/wav' END AS content_type,
         |  CASE WHEN k = 0 THEN 'png' WHEN k = 1 THEN 'jpeg' END AS format,
         |  CASE WHEN k <= 1 THEN CAST(doc_id % 512 + 64 AS BIGINT) END AS width,
         |  CASE WHEN k <= 1 THEN CAST((doc_id * 7) % 512 + 64 AS BIGINT) END AS height,
         |  CASE WHEN k = 0 THEN CAST(CASE WHEN p = 0 THEN 3 ELSE 4 END AS INT)
         |       WHEN k = 1 THEN CAST(CASE WHEN p = 0 THEN 1 ELSE 3 END AS INT)
         |  END AS channels,
         |  CASE WHEN k = 2 THEN CAST((p + 1) * 8000 AS BIGINT) END AS audio_sr,
         |  CASE WHEN k = 2 THEN CAST(p + 1 AS INT) END AS audio_ch,
         |  CASE WHEN k = 2
         |       THEN round(tlen / ((p + 1) * 8000.0 * (p + 1) * 2), 6)
         |  END AS audio_secs
         |FROM m""".stripMargin,

    "x_mm_scenes" ->
      """WITH v AS (SELECT doc_id,
        |    array_to_string(list_transform(range(1, len(text) // 100 + 1),
        |      i -> repeat(substr(text, CAST((i - 1) * 100 + 1 AS BIGINT), 100),
        |                  CAST(doc_id % 3 + 1 AS INT))), '') AS vid
        |  FROM documents WHERE len(text) >= 100),
        |f AS (SELECT doc_id, vid,
        |    CAST(ceil(CAST(len(vid) AS DOUBLE) / 100) AS BIGINT) AS n FROM v),
        |e AS (SELECT doc_id, i,
        |    md5(substring(vid, CAST(i * 100 + 1 AS BIGINT), 100)) AS h
        |  FROM f, UNNEST(range(0, n)) AS u(i)),
        |w AS (SELECT doc_id, i,
        |    CASE WHEN lag(h) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
        |           OR h <> lag(h) OVER (PARTITION BY doc_id ORDER BY i)
        |         THEN 1 ELSE 0 END AS cut
        |  FROM e),
        |sc AS (SELECT doc_id, i,
        |    sum(cut) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene
        |  FROM w),
        |g AS (SELECT doc_id, scene, count(*) AS len FROM sc GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_frames,
        |  count(*) AS n_scenes, CAST(max(len) AS BIGINT) AS max_static_run
        |FROM g GROUP BY doc_id""".stripMargin,

    "x_mm_frames" ->
      s"""WITH f AS (SELECT doc_id, text,
         |  CAST(ceil(CAST(len(text) AS DOUBLE) / 100) AS BIGINT) AS n FROM documents),
         |e AS (SELECT doc_id, text, unnest(range(0, n)) AS i FROM f)
         |SELECT doc_id, i AS frame_idx,
         |  md5(substring(text, CAST(i * 100 + 1 AS BIGINT), 100)) AS frame_md5
         |FROM e""".stripMargin,

    // re-decode the WAV data chunk (= the utf-8 text bytes after the
    // 44-byte header) as int16-LE samples via the hex trick: byte j is hex
    // chars 2j+1..2j+2, sample i = bytes (2i, 2i+1) little-endian,
    // sign-extended. Frame = sidx // 256; zero crossings pair each sample
    // with its predecessor WITHIN the frame (sidx % 256 <> 0). The frame
    // sum-of-squares is exact in double (<= 256 * 32767^2 << 2^53) so
    // summation order cannot diverge between engines
    "x_mm_audio_energy" ->
      """WITH a AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 2 AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |e AS (SELECT doc_id, hx, unnest(range(n)) AS i FROM a),
        |s AS (SELECT doc_id, i AS sidx,
        |    CAST('0x' || substr(hx, CAST(4*i + 3 AS INT), 2)
        |              || substr(hx, CAST(4*i + 1 AS INT), 2) AS INT) AS u
        |  FROM e),
        |v AS (SELECT doc_id, sidx,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v FROM s),
        |w AS (SELECT doc_id, sidx, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY sidx) AS pv FROM v)
        |SELECT doc_id,
        |  CAST(sidx // 256 AS INT) AS frame_idx,
        |  CAST(count(*) AS INT) AS n_samples,
        |  round(sqrt(sum(CAST(v AS DOUBLE) * v) / count(*)), 4) AS rms,
        |  CAST(coalesce(sum(CASE WHEN sidx % 256 <> 0
        |      AND (v < 0) <> (pv < 0) THEN 1 END), 0) AS INT) AS zero_crossings,
        |  CAST(max(abs(v)) AS INT) AS peak
        |FROM w GROUP BY doc_id, frame_idx""".stripMargin,

    // same int16-LE sample decode as x_mm_audio_energy, then the exact
    // integer quantized-table DFT: re/im are plain integer sums over the
    // shared 64-entry cos table (sin = the same table shifted 48),
    // descale (|x|+8192)//16384 on nonnegative values, power = qre^2+qim^2
    // — every intermediate replays the JVM expression bit-for-bit
    "x_mm_audio_spectral" ->
      """WITH ct AS (SELECT [16384, 16305, 16069, 15679, 15137, 14449, 13623,
        |    12665, 11585, 10394, 9102, 7723, 6270, 4756, 3196, 1606, 0,
        |    -1606, -3196, -4756, -6270, -7723, -9102, -10394, -11585,
        |    -12665, -13623, -14449, -15137, -15679, -16069, -16305, -16384,
        |    -16305, -16069, -15679, -15137, -14449, -13623, -12665, -11585,
        |    -10394, -9102, -7723, -6270, -4756, -3196, -1606, 0, 1606, 3196,
        |    4756, 6270, 7723, 9102, 10394, 11585, 12665, 13623, 14449,
        |    15137, 15679, 16069, 16305] AS t),
        |a AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 2 AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |e AS (SELECT doc_id, hx, unnest(range(n)) AS i FROM a),
        |s AS (SELECT doc_id, i AS sidx,
        |    CAST('0x' || substr(hx, CAST(4*i + 3 AS INT), 2)
        |              || substr(hx, CAST(4*i + 1 AS INT), 2) AS INT) AS u
        |  FROM e),
        |v AS (SELECT doc_id, CAST(sidx // 64 AS INT) AS frame_idx,
        |    CAST(sidx % 64 AS INT) AS j,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v FROM s),
        |r AS (SELECT doc_id, frame_idx, CAST(k AS INT) AS bin,
        |    CAST(sum(v * ct.t[((CAST(k AS INT) * j) % 64) + 1]) AS BIGINT) AS re,
        |    CAST(sum(v * ct.t[(((CAST(k AS INT) * j) % 64 + 48) % 64) + 1]) AS BIGINT) AS im
        |  FROM v CROSS JOIN range(1, 9) t(k) CROSS JOIN ct
        |  GROUP BY 1, 2, 3),
        |p AS (SELECT doc_id, frame_idx, bin,
        |    ((abs(re) + 8192) // 16384) * ((abs(re) + 8192) // 16384)
        |  + ((abs(im) + 8192) // 16384) * ((abs(im) + 8192) // 16384) AS power
        |  FROM r),
        |d AS (SELECT doc_id, frame_idx, max(power) AS dom_power
        |      FROM p GROUP BY 1, 2),
        |db AS (SELECT p.doc_id, p.frame_idx, CAST(min(p.bin) AS INT) AS dom_bin,
        |         p.power AS dom_power
        |       FROM p JOIN d ON p.doc_id = d.doc_id
        |         AND p.frame_idx = d.frame_idx AND p.power = d.dom_power
        |       GROUP BY 1, 2, 4)
        |SELECT p.doc_id, p.frame_idx, p.bin, CAST(p.power AS BIGINT) AS power,
        |  db.dom_bin, CAST(db.dom_power AS BIGINT) AS dom_power
        |FROM p JOIN db USING (doc_id, frame_idx)""".stripMargin,

    // frame RMS exactly as in x_mm_audio_energy (frame = 64 samples),
    // then the doc-level activity gate on the ROUNDED rms
    "x_mm_audio_gate" ->
      """WITH a AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 2 AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |e AS (SELECT doc_id, hx, unnest(range(n)) AS i FROM a),
        |s AS (SELECT doc_id, i AS sidx,
        |    CAST('0x' || substr(hx, CAST(4*i + 3 AS INT), 2)
        |              || substr(hx, CAST(4*i + 1 AS INT), 2) AS INT) AS u
        |  FROM e),
        |v AS (SELECT doc_id, sidx,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v FROM s),
        |f AS (SELECT doc_id, sidx // 64 AS frame_idx,
        |    round(sqrt(sum(CAST(v AS DOUBLE) * v) / count(*)), 4) AS rms
        |  FROM v GROUP BY doc_id, frame_idx),
        |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
        |    CAST(sum(CASE WHEN rms >= 26000.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS active_frames
        |  FROM f GROUP BY doc_id)
        |SELECT doc_id, n_frames, active_frames,
        |  round(CAST(active_frames AS DOUBLE) / n_frames, 4) AS active_frac
        |FROM g
        |WHERE round(CAST(active_frames AS DOUBLE) / n_frames, 4) >= 0.5""".stripMargin,

    // replay the dHash bit-for-bit (9x7 integer-grayscale grid over the
    // heff complete rows, bit r*8+c when gray(r,c) < gray(r,c+1)), then
    // brute-force the exact hamming<=3 pair set — the banding the Spark
    // side uses is provably lossless at that distance, so the oracle can
    // skip it
    "x_mm_image_neardup" ->
      """WITH p AS (SELECT doc_id, doc_id % 16 + 4 AS w,
        |    (doc_id * 3) % 16 + 4 AS h, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS t
        |  FROM documents),
        |n AS (SELECT doc_id, w, hx, least(h, (t // 3) // w) AS heff FROM p
        |  WHERE least(h, (t // 3) // w) >= 1),
        |r1 AS (SELECT doc_id, w, hx, heff, unnest(range(7)) AS r FROM n),
        |r2 AS (SELECT doc_id, w, hx, heff, r, unnest(range(9)) AS c FROM r1),
        |g AS (SELECT doc_id, r, c,
        |   (CAST('0x' || substr(hx, CAST(6*(((r*heff) // 7)*w + ((c*w) // 9)) + 1 AS INT), 2) AS INT)
        |  + CAST('0x' || substr(hx, CAST(6*(((r*heff) // 7)*w + ((c*w) // 9)) + 3 AS INT), 2) AS INT)
        |  + CAST('0x' || substr(hx, CAST(6*(((r*heff) // 7)*w + ((c*w) // 9)) + 5 AS INT), 2) AS INT)) // 3 AS gray
        |  FROM r2),
        |bb AS (SELECT doc_id, r, c, gray,
        |    lead(gray) OVER (PARTITION BY doc_id, r ORDER BY c) AS nxt FROM g),
        |dh AS (SELECT doc_id, CAST(sum(CASE WHEN c < 8 AND gray < nxt
        |      THEN CAST(power(2, r*8 + c) AS BIGINT) ELSE 0 END) AS BIGINT) AS dh
        |  FROM bb GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
        |  CAST(bit_count(xor(a.dh, b2.dh)) AS INT) AS hamming
        |FROM dh a JOIN dh b2 ON a.doc_id < b2.doc_id
        |WHERE bit_count(xor(a.dh, b2.dh)) <= 3""".stripMargin,

    // rebuild each 4x4 thumbnail: source pixel for cell (r, c) is
    // (r*heff // 4, c*w // 4) over the heff complete rows, pixel p's three
    // channels = hex chars 6p+1..6p+6, concatenated row-major
    "x_mm_thumbnail" ->
      """WITH p AS (SELECT doc_id, doc_id % 16 + 4 AS w,
        |    (doc_id * 3) % 16 + 4 AS h, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS t
        |  FROM documents),
        |n AS (SELECT doc_id, w, hx,
        |    least(h, (t // 3) // w) AS heff FROM p WHERE least(h, (t // 3) // w) >= 1),
        |r1 AS (SELECT doc_id, w, hx, heff, unnest(range(4)) AS r FROM n),
        |r2 AS (SELECT doc_id, w, hx, heff, r, unnest(range(4)) AS c FROM r1),
        |px AS (SELECT doc_id, r, c,
        |    substr(hx, CAST(6 * (((r * heff) // 4) * w + ((c * w) // 4)) + 1 AS INT), 6) AS hex6
        |  FROM r2),
        |th AS (SELECT doc_id, string_agg(hex6, '' ORDER BY r, c) AS thumb_hex
        |  FROM px GROUP BY doc_id)
        |SELECT doc_id, thumb_hex, md5(thumb_hex) AS thumb_md5 FROM th""".stripMargin,

    // re-decode the P6 raster: header "P6\n<w> <h>\n255\n" then the text
    // bytes; pixel i channels at raster bytes 3i/3i+1/3i+2 -> hex chars
    // 6i+1 / 6i+3 / 6i+5; complete pixels only, means 0.0 for an empty
    // raster (mirrors the decoder's 0-pixel convention)
    "x_mm_pixels" ->
      """WITH p AS (SELECT doc_id, doc_id % 16 + 4 AS w,
        |    (doc_id * 3) % 16 + 4 AS h, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS t
        |  FROM documents),
        |n AS (SELECT doc_id, w, h, hx, least(w * h, t // 3) AS npix FROM p),
        |e AS (SELECT doc_id, hx, unnest(range(npix)) AS i FROM n),
        |px AS (SELECT doc_id, i,
        |    CAST('0x' || substr(hx, CAST(6*i + 1 AS INT), 2) AS INT) AS r,
        |    CAST('0x' || substr(hx, CAST(6*i + 3 AS INT), 2) AS INT) AS g,
        |    CAST('0x' || substr(hx, CAST(6*i + 5 AS INT), 2) AS INT) AS b
        |  FROM e)
        |SELECT n.doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(npix AS BIGINT) AS n_pixels,
        |  round(coalesce(avg(CAST(r AS DOUBLE)), 0.0), 4) AS mean_r,
        |  round(coalesce(avg(CAST(g AS DOUBLE)), 0.0), 4) AS mean_g,
        |  round(coalesce(avg(CAST(b AS DOUBLE)), 0.0), 4) AS mean_b
        |FROM n LEFT JOIN px USING (doc_id)
        |GROUP BY n.doc_id, w, h, npix""".stripMargin,

    // golden-file oracle (the x_text_compress_ratio recipe): every PNG is
    // rebuilt byte-for-byte by tools/make_png_golden.py with CPython's
    // zlib + an independent filter/CRC implementation, and the expected
    // pixel means come from the pre-filter raster — keyed by
    // md5(doc_id:md5(text)) so one golden serves all three SFs. The inner
    // join fails loud (rows_match) on any missing/extra row.
    "x_mm_png_pixels" ->
      """SELECT d.doc_id, g.png_md5, g.width, g.height, g.color_type,
        |  g.n_pixels, g.mean_r_micro, g.mean_g_micro, g.mean_b_micro
        |FROM documents d
        |JOIN '/root/repo/oracle/png_pixels_golden.parquet' g
        |  ON md5(CAST(d.doc_id AS VARCHAR) || ':' || md5(d.text)) = g.key""".stripMargin,

    // golden-file oracle (same recipe as x_mm_png_pixels): every JPEG is
    // rebuilt byte-for-byte by tools/make_jpeg_golden.py with an
    // independent pure-Python fixed-point codec, and the expected gray
    // mean replays dequant + the integer IDCT over the cropped raster —
    // keyed by md5(doc_id:md5(text)) so one golden serves all three SFs
    "x_mm_jpeg_pixels" ->
      """SELECT d.doc_id, g.jpeg_md5, g.width, g.height, g.n_pixels,
        |  g.mean_gray_micro
        |FROM documents d
        |JOIN '/root/repo/oracle/jpeg_pixels_golden.parquet' g
        |  ON md5(CAST(d.doc_id AS VARCHAR) || ':' || md5(d.text)) = g.key""".stripMargin,

    // same golden recipe, progressive codec: payload bytes rebuilt by
    // tools/make_jpeg_progressive_golden.py's independent pure-Python
    // SOF2 entropy coder; decoded stats are the baseline golden's by
    // construction (progressive is a lossless coefficient reordering)
    "x_mm_jpeg_progressive" ->
      """SELECT d.doc_id, g.jpeg_md5, g.width, g.height, g.n_pixels,
        |  g.mean_gray_micro
        |FROM documents d
        |JOIN '/root/repo/oracle/jpeg_progressive_golden.parquet' g
        |  ON md5(CAST(d.doc_id AS VARCHAR) || ':' || md5(d.text)) = g.key""".stripMargin,

    // G.711 mu-law expansion replayed sample-for-sample in SQL:
    // u = ~code (= 255 - code), t = ((u&15)*8 + 132) << ((u>>4)&7),
    // pcm = sign ? 132 - t : t - 132 — then the same 256-sample frame
    // fold as x_mm_audio_energy
    "x_mm_audio_ulaw" ->
      """WITH a AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n FROM documents),
        |e AS (SELECT doc_id, hx, unnest(range(n)) AS i FROM a),
        |c AS (SELECT doc_id, i AS sidx,
        |    255 - CAST('0x' || substr(hx, CAST(2*i + 1 AS INT), 2) AS INT) AS u
        |  FROM e),
        |v AS (SELECT doc_id, sidx,
        |    CASE WHEN u >= 128
        |      THEN 132 - (((u & 15) * 8 + 132) << ((u >> 4) & 7))
        |      ELSE (((u & 15) * 8 + 132) << ((u >> 4) & 7)) - 132 END AS v
        |  FROM c),
        |w AS (SELECT doc_id, sidx, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY sidx) AS pv FROM v)
        |SELECT doc_id,
        |  CAST(sidx // 256 AS INT) AS frame_idx,
        |  CAST(count(*) AS INT) AS n_samples,
        |  round(sqrt(sum(CAST(v AS DOUBLE) * v) / count(*)), 4) AS rms,
        |  CAST(coalesce(sum(CASE WHEN sidx % 256 <> 0
        |      AND (v < 0) <> (pv < 0) THEN 1 END), 0) AS INT) AS zero_crossings,
        |  CAST(max(abs(v)) AS INT) AS peak
        |FROM w GROUP BY doc_id, frame_idx""".stripMargin,

    // G.711 A-law: a = code XOR 0x55; seg = (a>>4)&7; m = a&15;
    // t = seg == 0 ? (m<<4)+8 : ((m<<4)+264) << (seg-1);
    // pcm = (a & 0x80) != 0 ? t : -t — then the same frame fold
    "x_mm_audio_alaw" ->
      """WITH a AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n FROM documents),
        |e AS (SELECT doc_id, hx, unnest(range(n)) AS i FROM a),
        |c AS (SELECT doc_id, i AS sidx,
        |    xor(CAST('0x' || substr(hx, CAST(2*i + 1 AS INT), 2) AS INT), 85) AS u
        |  FROM e),
        |t AS (SELECT doc_id, sidx, u,
        |    CASE WHEN ((u >> 4) & 7) = 0 THEN ((u & 15) << 4) + 8
        |         ELSE (((u & 15) << 4) + 264) << (((u >> 4) & 7) - 1) END AS m
        |  FROM c),
        |v AS (SELECT doc_id, sidx,
        |    CASE WHEN (u & 128) <> 0 THEN m ELSE -m END AS v FROM t),
        |w AS (SELECT doc_id, sidx, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY sidx) AS pv FROM v)
        |SELECT doc_id,
        |  CAST(sidx // 256 AS INT) AS frame_idx,
        |  CAST(count(*) AS INT) AS n_samples,
        |  round(sqrt(sum(CAST(v AS DOUBLE) * v) / count(*)), 4) AS rms,
        |  CAST(coalesce(sum(CASE WHEN sidx % 256 <> 0
        |      AND (v < 0) <> (pv < 0) THEN 1 END), 0) AS INT) AS zero_crossings,
        |  CAST(max(abs(v)) AS INT) AS peak
        |FROM w GROUP BY doc_id, frame_idx""".stripMargin,

    // golden-file oracle (same recipe as the JPEG goldens): payload bytes
    // and decoded frame stats rebuilt by tools/make_adpcm_golden.py's
    // independent pure-Python IMA ADPCM port, keyed by md5(doc_id:md5(text))
    "x_mm_audio_adpcm" ->
      """SELECT d.doc_id, g.wav_md5, CAST(g.frame_idx AS INT) AS frame_idx,
        |  CAST(g.n_samples AS INT) AS n_samples, g.rms,
        |  CAST(g.zero_crossings AS INT) AS zero_crossings,
        |  CAST(g.peak AS INT) AS peak
        |FROM documents d
        |JOIN '/root/repo/oracle/adpcm_golden.parquet' g
        |  ON md5(CAST(d.doc_id AS VARCHAR) || ':' || md5(d.text)) = g.key""".stripMargin,

    "x_mm_embed_pairs" ->
      s"""WITH e AS (SELECT doc_id, lang, list_transform(range(0, 16), j ->
         |    CAST('0x' || substr(md5(text || ':' || CAST(j AS VARCHAR)), 1, 8) AS BIGINT)
         |      / 4294967296.0 - 0.5) AS emb
         |  FROM documents)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(${cosineSql("a.emb", "b.emb")}, 6) AS cosine
         |FROM e a JOIN e b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |ORDER BY cosine DESC, id_a, id_b LIMIT 10""".stripMargin,

    "x_asof_join" ->
      """WITH r AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS prev_okey
        |           FROM orders GROUP BY 1, 2)
        |SELECT l.o_orderkey, r.prev_okey, r.o_orderdate AS prev_date
        |FROM orders l ASOF LEFT JOIN r
        |  ON l.o_custkey = r.o_custkey AND l.o_orderdate > r.o_orderdate""".stripMargin,

    "x_asof_forward" ->
      """WITH n AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS next_okey
        |           FROM orders GROUP BY 1, 2)
        |SELECT o.o_orderkey,
        |  CASE WHEN n.o_orderdate <= o.o_orderdate + INTERVAL 90 DAY
        |       THEN n.next_okey END AS next_okey
        |FROM orders o ASOF LEFT JOIN n
        |  ON o.o_custkey = n.o_custkey AND o.o_orderdate < n.o_orderdate""".stripMargin,

    "x_range_join" ->
      """WITH iv AS (SELECT o_orderkey AS iv_id, o_orderdate AS w_start,
        |              o_orderdate + INTERVAL (1 + o_orderkey % 28) DAY AS w_end
        |            FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT iv_id, count(l_orderkey) AS n_ship,
        |  round(sum(l_quantity), 2) AS qty
        |FROM iv LEFT JOIN lineitem ON l_shipdate >= w_start AND l_shipdate < w_end
        |GROUP BY iv_id""".stripMargin,

    "x_range_join_auto" ->
      """WITH iv AS (SELECT o_orderkey AS iv_id,
        |              CAST(o_orderdate AS TIMESTAMP) AS w_start,
        |              CAST(o_orderdate + INTERVAL (1 + o_orderkey % 28) DAY
        |                   AS TIMESTAMP) AS w_end
        |            FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT iv_id, count(*) AS n_ship, round(sum(l_quantity), 2) AS qty
        |FROM iv JOIN lineitem
        |  ON CAST(l_shipdate AS TIMESTAMP) >= w_start
        | AND CAST(l_shipdate AS TIMESTAMP) < w_end
        |GROUP BY iv_id""".stripMargin,

    "x_skew_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY event_type""".stripMargin,

    "x_skew_join" ->
      """WITH dim AS (SELECT event_type, round(min(value), 2) AS w
        |             FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n, round(sum(e.value * dim.w), 2) AS wsum
        |FROM events e JOIN dim USING (event_type)
        |GROUP BY e.event_type""".stripMargin,

    "x_bucket_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |round(sum(l_extendedprice), 2) AS rev
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus""".stripMargin,

    // per-byte histogram via the hex trick (fixed-width uppercase hex
    // sorts identically to the byte value, so ORDER BY the hex pair IS
    // ascending-byte order); entropy = ln(n)/ln(2) − Σ cnt·(ln cnt/ln 2)/n
    // with list_sum over the byte-ordered list matching the expression's
    // ascending-byte loop term for term
    "x_text_entropy" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n FROM documents),
        |e AS (SELECT doc_id, n, unnest(range(n)) AS i, hx FROM b),
        |c AS (SELECT doc_id, substr(hx, CAST(2*i + 1 AS INT), 2) AS byte,
        |    count(*) AS cnt FROM e GROUP BY doc_id, byte),
        |l AS (SELECT doc_id,
        |    list(CAST(cnt AS DOUBLE) ORDER BY byte) AS cs
        |  FROM c GROUP BY doc_id)
        |SELECT b.doc_id, CAST(b.n AS INT) AS n_bytes,
        |  CASE WHEN b.n = 0 THEN 0.0 ELSE
        |    round(ln(CAST(b.n AS DOUBLE)) / ln(2.0) -
        |      list_sum(list_transform(l.cs, x -> x * (ln(x) / ln(2.0)))) / b.n, 4)
        |  END AS entropy
        |FROM b LEFT JOIN l USING (doc_id)""".stripMargin,

    // golden-file oracle: expected ratios precomputed by CPython zlib
    // (level 6, the same public zlib the JVM Deflater wraps) and committed
    // keyed by md5(text) — regenerate with tools/make_compress_golden.py
    // whenever the testdata corpus changes. An inner join fails loud
    // (rows_match) if a text is missing from the golden.
    "x_text_compress_ratio" ->
      """SELECT d.doc_id, g.expected_ratio AS compress_ratio
        |FROM documents d
        |JOIN '/root/repo/oracle/compress_ratio_golden.parquet' g
        |  ON md5(d.text) = g.text_md5""".stripMargin,

    "x_contamination" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |  CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_distinct(list_transform(range(1, len(toks) - 1),
         |              i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS sh
         |  FROM t),
         |ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0),
         |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         |hit AS (SELECT doc_id, count(*) AS n_hit FROM ex
         |        WHERE s IN (SELECT s FROM ev) GROUP BY doc_id)
         |SELECT sh.doc_id, CAST(len(sh.sh) AS INT) AS n_shingles,
         |  coalesce(hit.n_hit, 0) AS n_contaminated,
         |  round(CAST(coalesce(hit.n_hit, 0) AS DOUBLE) /
         |        greatest(len(sh.sh), 1), 4) AS contamination
         |FROM sh LEFT JOIN hit USING (doc_id)""".stripMargin,

    "x_text_strip_html" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>T</title><style>body{color:red}</style>' ||
        |  '<script type="text/javascript">var x = 1 < 2;</script></head>' ||
        |  '<body><p class="main">' || text ||
        |  '</p><div>footer &amp; nav &lt;3</div></body></html>' AS html
        |  FROM documents),
        |s AS (SELECT doc_id, trim(regexp_replace(
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(html,
        |    '<script[^>]*>.*?</script>', ' ', 'gis'),
        |    '<style[^>]*>.*?</style>', ' ', 'gis'),
        |    '<[^>]*>', ' ', 'gs'),
        |    '&nbsp;', ' ', 'g'),
        |    '&lt;', '<', 'g'),
        |    '&gt;', '>', 'g'),
        |    '&quot;', '"', 'g'),
        |    '&#39;', '''', 'g'),
        |    '&amp;', '&', 'g'),
        |  '\s+', ' ', 'g')) AS t
        |  FROM h)
        |SELECT doc_id, md5(t) AS stripped_md5,
        |  CAST(len(t) AS INT) AS n_chars_stripped FROM s""".stripMargin,

    "x_url_canonical" ->
      """WITH u AS (SELECT doc_id,
        |  'HTTP://WWW.Example' || (doc_id % 20) || '.COM:80/Dir/Page' ||
        |  doc_id || '?utm_source=news&id=' || doc_id || '&gclid=9#top' AS url
        |  FROM documents),
        |p AS (SELECT doc_id,
        |  CASE WHEN lower(url) LIKE 'http://%' THEN
        |    regexp_replace(regexp_replace(regexp_replace(t4,
        |      ':80/', '/', 'g'), ':80\?', '?', 'g'), ':80$', '', 'g')
        |  WHEN lower(url) LIKE 'https://%' THEN
        |    regexp_replace(regexp_replace(regexp_replace(t4,
        |      ':443/', '/', 'g'), ':443\?', '?', 'g'), ':443$', '', 'g')
        |  ELSE t4 END AS s
        |  FROM (SELECT doc_id, url,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
        |      '#.*', '', 'g'),
        |      '&(utm_[^&=]*|gclid|fbclid)=[^&]*', '', 'g'),
        |      '\?(utm_[^&=]*|gclid|fbclid)=[^&]*&', '?', 'g'),
        |      '\?(utm_[^&=]*|gclid|fbclid)=[^&]*$', '', 'g') AS t4
        |    FROM u)),
        |r AS (SELECT doc_id,
        |  lower(regexp_extract(s, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) ||
        |    substr(s, len(regexp_extract(s, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) + 1,
        |           1000000) AS rebuilt
        |  FROM p)
        |SELECT doc_id,
        |  regexp_replace(rebuilt, '/$', '', 'g') AS url_canon,
        |  regexp_extract(regexp_replace(rebuilt, '/$', '', 'g'),
        |    '://([^/:?#]*)', 1) AS domain
        |FROM r""".stripMargin,

    "x_dedup_keep_best" ->
      """SELECT doc_id, n_chars, n_copies FROM (
        |  SELECT doc_id, n_chars,
        |    count(*) OVER (PARTITION BY k) AS n_copies,
        |    row_number() OVER (PARTITION BY k
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM (SELECT doc_id, n_chars,
        |          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS k
        |        FROM documents))
        |WHERE rn = 1""".stripMargin,

    "x_embed_density_sample" ->
      s"""WITH b AS (SELECT vec_id, ${bucketSql("embedding")} AS bucket
         |           FROM embeddings),
         |c AS (SELECT bucket, count(*) AS n_cell FROM b GROUP BY bucket)
         |SELECT b.vec_id, b.bucket, c.n_cell
         |FROM b JOIN c USING (bucket)
         |WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT)
         |        / 4294967296.0
         |      < least(1.0, CAST(16 AS DOUBLE) / n_cell)""".stripMargin,

    "x_text_winnow" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |g AS (SELECT doc_id,
         |        list_transform(range(1, len(toks) - 3), i ->
         |          CAST('0x' || substr(md5(array_to_string(
         |            list_slice(toks, i, i + 4), ' ')), 1, 15) AS BIGINT)) AS grams
         |      FROM t WHERE len(toks) >= 5),
         |f AS (SELECT DISTINCT doc_id, unnest(list_distinct(
         |        list_transform(range(1, greatest(len(grams) - 3, 1) + 1), j ->
         |          list_min(list_slice(grams, j, j + 3))))) AS fp
         |      FROM g)
         |SELECT fp, count(DISTINCT doc_id) AS n_docs FROM f GROUP BY fp
         |HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, fp LIMIT 20""".stripMargin,

    "x_chunk_windows" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |w AS (SELECT doc_id, toks,
         |        CAST(greatest(ceil(CAST(len(toks) - 32 AS DOUBLE) / 24), 0) AS BIGINT) AS last_i
         |      FROM t WHERE len(toks) > 0)
         |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         |  md5(array_to_string(
         |    list_slice(toks, CAST(i AS INT) * 24 + 1, CAST(i AS INT) * 24 + 32),
         |    ' ')) AS chunk_md5
         |FROM w, unnest(range(last_i + 1)) AS u(i)""".stripMargin,

    "x_text_quality_by_source" ->
      s"""WITH t AS (SELECT doc_id, source, text, $Toks AS toks FROM documents),
         |f AS (SELECT doc_id, source,
         |  CAST(len(toks) AS INT) AS n_tokens,
         |  round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) /
         |        greatest(len(text), 1), 4) AS punct_ratio,
         |  round(CAST(len(list_filter(toks, w -> list_contains(
         |      ['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE) /
         |        greatest(len(toks), 1), 4) AS stopword_ratio
         |  FROM t),
         |q AS (SELECT doc_id, source,
         |  round(least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
         |      + stopword_ratio * CAST(0.4 AS DOUBLE)
         |      + (CAST(1.0 AS DOUBLE) - least(punct_ratio * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
         |    4) AS quality_score
         |  FROM f)
         |SELECT doc_id, source, quality_score FROM (
         |  SELECT doc_id, source, quality_score,
         |    quantile_disc(quality_score, 0.25) OVER (PARTITION BY source) AS thr
         |  FROM q)
         |WHERE quality_score >= thr""".stripMargin,

    // DuckDB's quantile_disc implements the same SQL-standard convention
    // as Spark's percentile_disc (least value with CDF >= q); discrete
    // selection returns an observed element, so the doubles hash-compare
    // bit-exactly when — and only when — the conventions agree
    "x_text_quality_quantiles" ->
      s"""WITH $QualityCte
         |SELECT source,
         |  quantile_disc(quality_score, 0.10) AS q10,
         |  quantile_disc(quality_score, 0.25) AS q25,
         |  quantile_disc(quality_score, 0.50) AS q50,
         |  quantile_disc(quality_score, 0.75) AS q75,
         |  quantile_disc(quality_score, 0.90) AS q90,
         |  count(*) AS n_docs
         |FROM q GROUP BY source""".stripMargin,

    "x_split_leakage" ->
      s"""WITH spl AS (SELECT doc_id, text,
         |    CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id, text,
         |          CAST('0x' || substr(md5(coalesce(md5(text), '__null_unit__')), 1, 8) AS BIGINT)
         |            / 4294967296.0 AS u
         |        FROM documents)),
         |t AS (SELECT doc_id, split, $Toks AS toks FROM spl),
         |sh AS (SELECT doc_id, split,
         |  CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_distinct(list_transform(range(1, len(toks) - 1),
         |              i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS sh
         |  FROM t),
         |tr AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE split = 'train'),
         |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE split <> 'train'),
         |hit AS (SELECT doc_id, count(*) AS n_hit FROM ex
         |        WHERE s IN (SELECT s FROM tr) GROUP BY doc_id)
         |SELECT sh.doc_id, CAST(len(sh.sh) AS INT) AS n_shingles,
         |  coalesce(hit.n_hit, 0) AS n_contaminated,
         |  round(CAST(coalesce(hit.n_hit, 0) AS DOUBLE) /
         |        greatest(len(sh.sh), 1), 4) AS contamination
         |FROM sh LEFT JOIN hit USING (doc_id)
         |WHERE sh.split <> 'train'""".stripMargin,

    "x_text_pii" ->
      """WITH e AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com or +1-555-01' ||
        |    lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' now' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9()\- ]{6,}[0-9]')) AS INT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g')) AS redacted_md5
        |FROM e""".stripMargin,

    "x_graph_pagerank" ->
      s"""WITH $GraphCtes,
         |r0 AS (SELECT id, CAST((SELECT 1000000000000 // n FROM n) AS BIGINT) AS r FROM ids),
         |${prIter("r0", "r1")},
         |${prIter("r1", "r2")},
         |${prIter("r2", "r3")},
         |${prIter("r3", "r4")},
         |${prIter("r4", "r5")}
         |SELECT id AS doc_id, r AS rank_micro,
         |  r / 1000000000000.0 AS pagerank
         |FROM r5""".stripMargin,

    "x_graph_hits" ->
      s"""WITH $GraphCtes,
         |hub0 AS (SELECT id, CAST((SELECT 1000000000 // n FROM n) AS BIGINT) AS h FROM ids),
         |${hitsIter(1)},
         |${hitsIter(2)},
         |${hitsIter(3)}
         |SELECT h.id AS doc_id, h.h AS hub_nano, a.a AS auth_nano,
         |  h.h / 1000000000.0 AS hub, a.a / 1000000000.0 AS authority
         |FROM hub3 h JOIN auth3 a ON h.id = a.id""".stripMargin,

    "x_eval_confusion" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv, label AS true_label
         |           FROM embeddings WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id, embedding, label FROM embeddings
         |      WHERE vec_id % 50 <> 0),
         |s AS (SELECT q.q_id, q.true_label, c.vec_id, c.label,
         |        round(${cosineSql("c.embedding", "q.qv")}, 3) AS cosine
         |      FROM c CROSS JOIN q),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |        ORDER BY cosine DESC, vec_id) AS rank FROM s),
         |v AS (SELECT q_id, true_label, label, count(*) AS votes
         |      FROM r WHERE rank <= 10 GROUP BY 1, 2, 3),
         |w AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |        ORDER BY votes DESC, label) AS rn FROM v),
         |cells AS (SELECT true_label, label AS pred_label,
         |            CAST(count(*) AS BIGINT) AS n
         |          FROM w WHERE rn = 1 GROUP BY 1, 2),
         |labels AS (SELECT DISTINCT label FROM embeddings),
         |tp AS (SELECT true_label AS label, n AS tp FROM cells
         |       WHERE true_label = pred_label),
         |fp AS (SELECT pred_label AS label, CAST(sum(n) AS BIGINT) AS fp
         |       FROM cells WHERE true_label <> pred_label GROUP BY 1),
         |fn AS (SELECT true_label AS label, CAST(sum(n) AS BIGINT) AS fn
         |       FROM cells WHERE true_label <> pred_label GROUP BY 1),
         |m AS (SELECT l.label, coalesce(tp.tp, 0) AS tp,
         |        coalesce(fp.fp, 0) AS fp, coalesce(fn.fn, 0) AS fn
         |      FROM labels l LEFT JOIN tp USING (label)
         |        LEFT JOIN fp USING (label) LEFT JOIN fn USING (label))
         |SELECT label, tp, fp, fn,
         |  CASE WHEN tp + fp = 0 THEN 0.0
         |       ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 4) END AS precision,
         |  CASE WHEN tp + fn = 0 THEN 0.0
         |       ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 4) END AS recall,
         |  CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
         |       ELSE round(2.0 * tp / (2 * tp + fp + fn), 4) END AS f1
         |FROM m""".stripMargin,

    "x_graph_degree" ->
      s"""WITH $GraphCtes
         |SELECT i.id AS doc_id, CAST(3 AS INT) AS out_deg,
         |  coalesce(c.in_deg, 0) AS in_deg,
         |  coalesce(c.in_deg, 0) = 0 AS is_orphan
         |FROM ids i LEFT JOIN
         |  (SELECT dst, count(*) AS in_deg FROM edges GROUP BY dst) c
         |  ON i.id = c.dst""".stripMargin,

    "x_embed_pca" ->
      s"""WITH pq AS (SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS xq
         |  FROM embeddings),
         |pn AS (SELECT count(*) AS n FROM pq),
         |pds AS (SELECT CAST(u.i - 1 AS INT) AS dim, CAST(sum(pq.xq[CAST(u.i AS INT)]) AS BIGINT) AS s
         |  FROM pq, UNNEST(range(1, len(pq.xq) + 1)) AS u(i) GROUP BY 1),
         |pm AS (SELECT list(CAST(round(CAST(s AS DOUBLE) / (SELECT n FROM pn)) AS BIGINT)
         |    ORDER BY dim) AS m FROM pds),
         |pc AS (SELECT vec_id,
         |    list_transform(range(1, len(xq) + 1),
         |      i -> xq[CAST(i AS INT)] - m[CAST(i AS INT)]) AS c
         |  FROM pq, pm),
         |pv0 AS (SELECT list_transform(range(1, 65),
         |    i -> CAST(0.125 AS DOUBLE)) AS v),
         |${pcaIter(0)},
         |${pcaIter(1)},
         |${pcaIter(2)},
         |${pcaIter(3)},
         |pf AS (SELECT pc.vec_id,
         |    list_reduce(list_transform(range(1, len(pc.c) + 1),
         |      i -> CAST(pc.c[CAST(i AS INT)] AS DOUBLE) * pv4.v[CAST(i AS INT)]),
         |      (a, b) -> a + b) AS s
         |  FROM pc, pv4)
         |SELECT vec_id, round(s / 1000000.0, 6) AS pc1 FROM pf""".stripMargin,

    "x_graph_neighbor_quality" ->
      s"""WITH $GraphCtes,
         |$QualityCte,
         |qq AS (SELECT doc_id AS id,
         |    CAST(round(quality_score * 10000) AS BIGINT) AS q4 FROM q),
         |inq AS (SELECT e.dst, CAST(sum(qq.q4) AS BIGINT) AS sq,
         |    count(*) AS nin
         |  FROM edges e JOIN qq ON e.src = qq.id GROUP BY e.dst)
         |SELECT qq.id AS doc_id,
         |  qq.q4 / 10000.0 AS own_quality,
         |  coalesce(inq.nin, 0) AS in_deg,
         |  CAST(inq.sq AS DOUBLE) / inq.nin / 10000.0 AS neighbor_quality
         |FROM qq LEFT JOIN inq ON qq.id = inq.dst""".stripMargin,

    "x_text_bpe_pairs" ->
      s"""WITH t AS (SELECT $Toks AS toks FROM documents),
         |w AS (SELECT unnest(toks) AS w FROM t),
         |wc AS (SELECT w, count(*) AS c FROM w GROUP BY w),
         |p AS (SELECT substr(wc.w, CAST(u.i AS INT), 2) AS pair, wc.c
         |      FROM wc, UNNEST(range(1, len(wc.w))) AS u(i))
         |SELECT pair, CAST(sum(c) AS BIGINT) AS n FROM p
         |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    // the 3-step merge loop unrolled: each step recomputes pair counts
    // over the (replace-)merged vocabulary and takes the (n desc, pair)
    // winner — identical greedy semantics to the Spark loop
    "x_text_bpe_train" ->
      s"""WITH $BpeMergeCtes
         |SELECT CAST(1 AS INT) AS rank, l AS sym_l, r AS sym_r, n FROM b1
         |UNION ALL
         |SELECT CAST(2 AS INT), l, r, n FROM b2
         |UNION ALL
         |SELECT CAST(3 AS INT), l, r, n FROM b3""".stripMargin,

    // the learned b1..b3 winners applied back to every word: the same
    // replace-all convention as the trainer's vocabulary update, so the
    // SQL encode replays the Spark encode rule for rule
    "x_text_bpe_encode" ->
      s"""WITH $BpeMergeCtes,
         |dt AS (SELECT doc_id, $Toks AS toks FROM documents),
         |dw AS (SELECT doc_id, unnest(toks) AS w FROM dt),
         |ds AS (SELECT doc_id, '<' || array_to_string(list_transform(
         |          range(1, length(w) + 1),
         |          i -> substr(w, CAST(i AS INT), 1)), '><') || '>' AS s
         |       FROM dw),
         |f1 AS (SELECT doc_id, replace(ds.s, '<'||b1.l||'><'||b1.r||'>',
         |                      '<'||b1.l||b1.r||'>') AS s FROM ds, b1),
         |f2 AS (SELECT doc_id, replace(f1.s, '<'||b2.l||'><'||b2.r||'>',
         |                      '<'||b2.l||b2.r||'>') AS s FROM f1, b2),
         |f3 AS (SELECT doc_id, replace(f2.s, '<'||b3.l||'><'||b3.r||'>',
         |                      '<'||b3.l||b3.r||'>') AS s FROM f2, b3),
         |pp AS (SELECT doc_id,
         |         length(s) - length(replace(s, '<', '')) AS pieces FROM f3),
         |ag AS (SELECT doc_id, count(*) AS n_words,
         |         CAST(sum(pieces) AS BIGINT) AS n_pieces
         |       FROM pp GROUP BY doc_id)
         |SELECT dt.doc_id, coalesce(ag.n_words, 0) AS n_words,
         |  coalesce(ag.n_pieces, 0) AS n_pieces,
         |  CASE WHEN coalesce(ag.n_words, 0) = 0 THEN 0.0
         |       ELSE round(CAST(ag.n_pieces AS DOUBLE) / ag.n_words, 4)
         |  END AS pieces_per_word
         |FROM dt LEFT JOIN ag USING (doc_id)""".stripMargin,

    "x_text_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |tb AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
         |bg0 AS (SELECT doc_id, toks[CAST(u.i AS INT)] AS w1,
         |          toks[CAST(u.i AS INT)] || ' ' || toks[CAST(u.i AS INT) + 1] AS b
         |        FROM tb, UNNEST(range(1, len(toks))) AS u(i)),
         |bgt AS (SELECT doc_id, w1, b, count(*) AS tf FROM bg0 GROUP BY 1, 2, 3),
         |cb AS (SELECT b, CAST(sum(tf) AS BIGINT) AS cb FROM bgt GROUP BY b),
         |wu AS (SELECT unnest(toks) AS w FROM t),
         |cw AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM wu GROUP BY w),
         |vv AS (SELECT count(DISTINCT w) AS v FROM wu)
         |SELECT bgt.doc_id,
         |  round(sum(bgt.tf * ln((cb.cb + 1) / CAST(cw.cw + vv.v AS DOUBLE)))
         |        / sum(bgt.tf), 4) AS mean_logprob,
         |  CAST(sum(bgt.tf) AS BIGINT) AS n_bigrams
         |FROM bgt JOIN cb USING (b) JOIN cw ON bgt.w1 = cw.w, vv
         |GROUP BY 1""".stripMargin,

    "x_text_keyphrases" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |tok AS (SELECT doc_id, CAST(u.i AS INT) - 1 AS i, toks[CAST(u.i AS INT)] AS w
         |        FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
         |ns AS (SELECT * FROM tok WHERE NOT list_contains(
         |         ['the','a','an','and','or','of','to','in','is','it'], w)),
         |mem AS (SELECT doc_id, i, w,
         |         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS isl
         |       FROM ns),
         |mem2 AS (SELECT *, count(*) OVER (PARTITION BY doc_id, isl) AS plen
         |         FROM mem),
         |ws AS (SELECT w, count(*) AS freq, CAST(sum(plen) AS BIGINT) AS deg
         |       FROM mem2 GROUP BY w),
         |wr AS (SELECT w, deg * 1000000 // freq AS ratio_q FROM ws),
         |ph AS (SELECT m.doc_id, m.isl, string_agg(m.w, ' ' ORDER BY m.i) AS phrase,
         |        CAST(sum(wr.ratio_q) AS BIGINT) AS score_q
         |       FROM mem2 m JOIN wr ON m.w = wr.w GROUP BY m.doc_id, m.isl)
         |SELECT phrase, count(*) AS n_occurrences,
         |  CAST(max(score_q) AS BIGINT) AS score_micro
         |FROM ph GROUP BY phrase ORDER BY score_micro DESC, phrase LIMIT 20""".stripMargin,

    "x_sample_kfold" ->
      """SELECT doc_id,
        |  CAST(CAST('0x' || substr(md5(coalesce(md5(text), '__null_unit__')), 1, 8)
        |    AS BIGINT) % 5 AS INT) AS fold
        |FROM documents""".stripMargin,

    "x_text_gopher_rules" ->
      s"""WITH $GopherCtes
         |SELECT doc_id, n_words,
         |  flag_word_count, flag_mean_word_len, flag_alpha, flag_symbol,
         |  flag_stopwords, keep
         |FROM g""".stripMargin,

    "x_quality_disparity" ->
      s"""WITH $GopherCtes,
         |per AS (SELECT d.source, count(*) AS n,
         |          CAST(sum(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
         |        FROM g JOIN documents d USING (doc_id) GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
         |          CAST(sum(n_keep) AS BIGINT) AS tk FROM per)
         |SELECT source, n, n_keep,
         |  (n_keep * 10000) // n AS keep_bp,
         |  (tk * 10000) // tn AS overall_bp,
         |  (n_keep * 10000) // n - (tk * 10000) // tn AS disparity_bp
         |FROM per, tot""".stripMargin,

    "x_split_temporal" ->
      """WITH s AS (SELECT o_custkey AS e,
        |  CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' - INTERVAL 30 DAY
        |         THEN 'train'
        |       WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 'test'
        |       ELSE 'embargo' END AS split
        |  FROM orders),
        |lk AS (SELECT e FROM (SELECT DISTINCT e, split FROM s)
        |       GROUP BY e HAVING count(*) > 1)
        |SELECT split, count(*) AS n_rows,
        |  count(DISTINCT e) AS n_entities,
        |  count(DISTINCT CASE WHEN e IN (SELECT e FROM lk) THEN e END)
        |    AS n_entities_leaky
        |FROM s GROUP BY 1""".stripMargin,

    "x_graph_triangles" ->
      """WITH d AS (SELECT doc_id AS src FROM documents),
        |nn AS (SELECT count(*) AS n FROM d),
        |e0 AS (SELECT src,
        |         CAST('0x' || substr(md5(src || ':' || j), 1, 8) AS BIGINT)
        |           % (SELECT n FROM nn) AS dst
        |       FROM d, unnest([1, 2, 3]) AS t(j)),
        |e1 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |       FROM e0 WHERE src <> dst)
        |SELECT x.a AS a, x.b AS b, y.b AS c
        |FROM e1 x JOIN e1 y ON x.b = y.a
        |JOIN e1 z ON z.a = x.a AND z.b = y.b""".stripMargin,

    "x_retrieval_batch" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS toks FROM documents),
         |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM toks),
         |stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
         |q AS (SELECT * FROM (VALUES (1, ['big', 'order', 'scan']),
         |        (2, ['data', 'table']),
         |        (3, ['fast', 'slow', 'value'])) AS v(qid, terms)),
         |qt AS (SELECT DISTINCT qid, unnest(terms) AS token FROM q),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM toks),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tok
         |       WHERE token IN (SELECT DISTINCT token FROM qt) GROUP BY 1, 2),
         |dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |s AS (SELECT tf.doc_id, tf.token,
         |        ln((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         |          * tf.tf * (1.2 + 1.0)
         |          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
         |      FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id) CROSS JOIN stats),
         |sq AS (SELECT qt.qid, s.doc_id, s.token, s.s FROM s JOIN qt USING (token)),
         |agg AS (SELECT qid, doc_id,
         |          round(list_reduce(list(s ORDER BY token), (x, y) -> x + y), 4) AS bm25
         |        FROM sq GROUP BY qid, doc_id),
         |r AS (SELECT CAST(qid AS BIGINT) AS qid, doc_id, bm25,
         |        CAST(row_number() OVER (PARTITION BY qid
         |          ORDER BY bm25 DESC, doc_id) AS INT) AS rank
         |      FROM agg)
         |SELECT qid, doc_id, bm25, rank FROM r WHERE rank <= 10""".stripMargin,

    "x_order_shards" ->
      """WITH w AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
        |    AS BIGINT) AS wt FROM documents),
        |r AS (SELECT doc_id, wt,
        |        row_number() OVER (ORDER BY wt DESC, doc_id) AS rn FROM w)
        |SELECT (rn - 1) % 8 AS shard, count(*) AS n_docs,
        |  CAST(sum(wt) AS BIGINT) AS tokens_total
        |FROM r GROUP BY 1""".stripMargin,

    "x_profile_table" ->
      """WITH m AS (
        |  SELECT 'l_orderkey' AS column_name, CAST(l_orderkey AS VARCHAR) AS value FROM lineitem
        |  UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
        |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
        |  UNION ALL SELECT 'l_shipdate', strftime(l_shipdate, '%Y-%m-%d %H:%M:%S.%f') FROM lineitem)
        |SELECT column_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT value) AS n_distinct,
        |  min(value) AS min_val, max(value) AS max_val
        |FROM m GROUP BY 1""".stripMargin,

    "x_eval_calibration" ->
      s"""WITH tok AS (SELECT doc_id, unnest($Toks) AS token FROM documents),
         |f AS (SELECT doc_id,
         |        CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 1024 AS b
         |      FROM tok),
         |w AS (SELECT doc_id,
         |        CAST('0x' || substr(md5('w:' || b), 1, 8) AS BIGINT) % 2001 - 1000 AS w_milli
         |      FROM f),
         |a AS (SELECT doc_id, sum(w_milli) AS wsum, count(*) AS n_tokens
         |      FROM w GROUP BY doc_id),
         |sc AS (SELECT a.doc_id, floor(wsum * 10.0 / n_tokens) / 10000.0 AS score,
         |        (d.source = 'src1') AS y
         |       FROM a JOIN documents d USING (doc_id)),
         |bi AS (SELECT least(greatest(CAST(floor((score + 1.0) * 10 / 2.0) AS BIGINT),
         |         0), 9) AS bin,
         |        CASE WHEN y THEN 1 ELSE 0 END AS yy
         |       FROM sc)
         |SELECT bin, count(*) AS n, CAST(sum(yy) AS BIGINT) AS n_pos,
         |  (CAST(sum(yy) AS BIGINT) * 10000) // count(*) AS pos_rate_bp
         |FROM bi GROUP BY 1""".stripMargin,

    "x_interval_overlap" ->
      """WITH c AS (SELECT user_id, epoch_us(ts) AS t FROM events
        |           WHERE event_type = 'click'),
        |cs AS (SELECT user_id, t,
        |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |               OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800000000
        |             THEN 1 ELSE 0 END AS nw FROM c),
        |cg AS (SELECT user_id, t, sum(nw) OVER (PARTITION BY user_id ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM cs),
        |ca AS (SELECT user_id, min(t) AS a_start, max(t) + 1800000000 AS a_end
        |       FROM cg GROUP BY user_id, sid),
        |v AS (SELECT user_id, epoch_us(ts) AS t FROM events
        |      WHERE event_type = 'view'),
        |vs AS (SELECT user_id, t,
        |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |               OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800000000
        |             THEN 1 ELSE 0 END AS nw FROM v),
        |vg AS (SELECT user_id, t, sum(nw) OVER (PARTITION BY user_id ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM vs),
        |va AS (SELECT user_id, min(t) AS b_start, max(t) + 1800000000 AS b_end
        |       FROM vg GROUP BY user_id, sid)
        |SELECT ca.user_id, a_start, b_start,
        |  least(a_end, b_end) - greatest(a_start, b_start) AS overlap_us
        |FROM ca JOIN va ON ca.user_id = va.user_id
        |WHERE a_start <= b_end AND b_start <= a_end""".stripMargin,

    "x_eval_auc" ->
      s"""WITH tok AS (SELECT doc_id, unnest($Toks) AS token FROM documents),
         |f AS (SELECT doc_id,
         |        CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 1024 AS b
         |      FROM tok),
         |w AS (SELECT doc_id,
         |        CAST('0x' || substr(md5('w:' || b), 1, 8) AS BIGINT) % 2001 - 1000 AS w_milli
         |      FROM f),
         |a AS (SELECT doc_id, sum(w_milli) AS wsum, count(*) AS n_tokens
         |      FROM w GROUP BY doc_id),
         |sc AS (SELECT a.doc_id, floor(wsum * 10.0 / n_tokens) / 10000.0 AS score,
         |        (d.source = 'src1') AS y
         |       FROM a JOIN documents d USING (doc_id)),
         |g AS (SELECT score, count(*) AS c,
         |        sum(CASE WHEN y THEN 1 ELSE 0 END) AS cp
         |      FROM sc GROUP BY 1),
         |r AS (SELECT score, c, cp,
         |        coalesce(sum(c) OVER (ORDER BY score
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
         |      FROM g)
         |SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
         |  CAST(sum(c - cp) AS BIGINT) AS n_neg,
         |  round(CAST(sum(cp * (2 * below + c + 1)) - sum(cp) * (sum(cp) + 1)
         |      AS DOUBLE) / (2.0 * sum(cp) * sum(c - cp)), 6) AS auc
         |FROM r""".stripMargin,

    "x_text_readability" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) AS INT) AS n_words,
        |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS INT) AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INT) AS n_syllables,
        |  (390 * CAST(n_words AS BIGINT) * n_words
        |    + 11800 * CAST(n_syllables AS BIGINT) * n_sentences
        |    + 410 * CAST(n_sentences AS BIGINT) * n_words)
        |    // (CAST(n_sentences AS BIGINT) * n_words) - 16000 AS fk_milli
        |FROM documents WHERE n_words > 0""".stripMargin,

    "x_mix_kl" ->
      """WITH c AS (SELECT source, count(*) AS n_docs, sqrt(count(*)) AS pw
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs,
        |        round(pw / (SELECT sum(pw) FROM c), 6) AS mix_weight FROM c),
        |t AS (SELECT sum(n_docs) AS tot FROM c)
        |SELECT source, n_docs, mix_weight,
        |  round(CAST(n_docs AS DOUBLE) / tot, 6) AS p_actual,
        |  round((CAST(n_docs AS DOUBLE) / tot) *
        |    ln(CAST(n_docs AS DOUBLE) / tot / mix_weight), 6) AS kl_term
        |FROM w, t""".stripMargin,

    "x_text_fertility" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(text)) AS BIGINT) AS n_chars,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')))
        |    AS BIGINT) AS n_bpe_tokens,
        |  CASE WHEN CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')))
        |    AS BIGINT) = 0 THEN NULL
        |    ELSE round(CAST(sum(len(text)) AS DOUBLE) /
        |      sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))), 4)
        |  END AS fertility
        |FROM documents GROUP BY 1""".stripMargin,

    "x_embed_rp" ->
      """WITH s AS (SELECT k,
        |  list_transform(generate_series(0, 63), d ->
        |    CASE WHEN CAST('0x' || substr(md5('rp:' || k || ':' || d), 1, 1)
        |      AS INT) % 2 = 0
        |    THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END) AS srow
        |  FROM range(0, 16) t(k))
        |SELECT vec_id, CAST(k AS INT) AS k,
        |  round(list_reduce(list_transform(range(1, len(embedding) + 1),
        |    i -> CAST(embedding[i] AS DOUBLE) * srow[i]), (x, y) -> x + y), 4)
        |    + 0.0 AS proj
        |FROM embeddings CROSS JOIN s""".stripMargin,

    "x_text_ppl_buckets" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |e AS (SELECT doc_id, unnest(toks) AS token FROM t),
         |f AS (SELECT doc_id, token, count(*) AS tf FROM e GROUP BY 1, 2),
         |c AS (SELECT token, CAST(sum(tf) AS BIGINT) AS cnt FROM f GROUP BY 1),
         |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tok FROM c),
         |lp AS (SELECT doc_id,
         |  round(sum(tf * ln(CAST(cnt AS DOUBLE) / n_tok)) / sum(tf), 4)
         |    AS mean_logprob
         |  FROM f JOIN c USING (token), n GROUP BY 1),
         |r AS (SELECT d.doc_id, d.lang, lp.mean_logprob,
         |  row_number() OVER (PARTITION BY d.lang
         |    ORDER BY lp.mean_logprob DESC, d.doc_id) AS rank,
         |  count(*) OVER (PARTITION BY d.lang) AS n
         |  FROM lp JOIN documents d USING (doc_id))
         |SELECT doc_id, lang, mean_logprob, rank,
         |  CASE ((rank - 1) * 3) // n WHEN 0 THEN 'head'
         |    WHEN 1 THEN 'middle' ELSE 'tail' END AS ppl_bucket
         |FROM r""".stripMargin,

    // the per-position conjunction and window derive from the SAME
    // PhraseTerms Seq the Spark query uses — editing the phrase cannot
    // silently decouple implementation from oracle
    "x_retrieval_phrase" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |h AS (SELECT doc_id,
         |  list_filter(generate_series(1, len(toks) - ${PhraseTerms.size - 1}),
         |    i -> ${PhraseTerms.zipWithIndex.map { case (w, k) =>
                 val lit = w.replace("'", "''")
                 if (k == 0) s"toks[i] = '$lit'" else s"toks[i+$k] = '$lit'"
               }.mkString(" AND ")})
         |    AS hits
         |  FROM t)
         |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_hits,
         |  CAST(hits[1] AS INT) AS first_pos
         |FROM h WHERE len(hits) > 0""".stripMargin,

    "x_privacy_forget" ->
      s"""WITH ld AS (SELECT doc_id FROM documents WHERE doc_id % 17 = 0),
         |dg AS (SELECT doc_id, md5(text) AS d FROM documents),
         |ex AS (SELECT dg.doc_id FROM dg
         |       WHERE dg.d IN (SELECT d FROM dg JOIN ld USING (doc_id))),
         |t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |  CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_distinct(list_transform(range(1, len(toks) - 1),
         |              i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS sh
         |  FROM t),
         |nd AS (SELECT x.doc_id FROM sh x
         |       JOIN sh y ON x.doc_id <> y.doc_id AND y.doc_id % 17 = 0
         |       WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
         |             len(list_distinct(x.sh || y.sh)) >= 0.7),
         |u AS (SELECT doc_id, 0 AS p FROM ld
         |      UNION ALL SELECT doc_id, 1 FROM ex
         |      UNION ALL SELECT DISTINCT doc_id, 2 FROM nd)
         |SELECT doc_id,
         |  CASE min(p) WHEN 0 THEN 'listed' WHEN 1 THEN 'exact_copy'
         |    ELSE 'near_dup' END AS reason
         |FROM u GROUP BY 1""".stripMargin,

    "x_corpus_diff" ->
      """WITH nxt AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 3
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 11 = 0),
        |a AS (SELECT doc_id, md5(text) AS da FROM documents),
        |b AS (SELECT doc_id, md5(text) AS db FROM nxt),
        |j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |        CASE WHEN b.doc_id IS NULL THEN 'removed'
        |             WHEN a.doc_id IS NULL THEN 'added'
        |             WHEN a.da IS DISTINCT FROM b.db THEN 'changed' END AS status
        |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT doc_id, status FROM j WHERE status IS NOT NULL""".stripMargin,

    "x_privacy_kanon" ->
      """SELECT doc_id, lang, source, n_chars // 100 AS len_bucket,
        |  count(*) OVER (PARTITION BY lang, source, n_chars // 100)
        |    AS class_size,
        |  count(*) OVER (PARTITION BY lang, source, n_chars // 100) < 5
        |    AS suppress
        |FROM documents""".stripMargin,

    "x_quality_outliers" ->
      """WITH b AS (SELECT doc_id, source, n_chars AS v FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY v, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY source) AS n FROM b),
        |m AS (SELECT source,
        |        sum(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END) +
        |        sum(CASE WHEN rn = n // 2 + 1 THEN v ELSE 0 END) AS med2
        |      FROM r GROUP BY source),
        |d AS (SELECT b.doc_id, b.source, b.v,
        |        abs(2 * b.v - m.med2) AS dev2
        |      FROM b JOIN m USING (source)),
        |r2 AS (SELECT *, row_number() OVER (PARTITION BY source
        |         ORDER BY dev2, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY source) AS n FROM d),
        |m2 AS (SELECT source,
        |         sum(CASE WHEN rn = (n + 1) // 2 THEN dev2 ELSE 0 END) +
        |         sum(CASE WHEN rn = n // 2 + 1 THEN dev2 ELSE 0 END) AS mad4
        |       FROM r2 GROUP BY source)
        |SELECT d.doc_id, d.source, CAST(d.v AS BIGINT) AS n_chars,
        |  CAST(d.dev2 AS BIGINT) AS dev2, CAST(m2.mad4 AS BIGINT) AS mad4,
        |  d.dev2 * 20000000 > 2500 * 14826 * m2.mad4 AS is_outlier
        |FROM d JOIN m2 USING (source)""".stripMargin,

    "x_order_curriculum" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(len(toks) AS INT) AS n_tokens,
         |  round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) /
         |        greatest(len(text), 1), 4) AS punct_ratio,
         |  round(CAST(len(list_filter(toks, w -> list_contains(
         |      ['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE) /
         |        greatest(len(toks), 1), 4) AS stopword_ratio
         |  FROM t),
         |qq AS (SELECT doc_id,
         |  round(least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
         |      + stopword_ratio * CAST(0.4 AS DOUBLE)
         |      + (CAST(1.0 AS DOUBLE) - least(punct_ratio * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
         |    4) AS q FROM f),
         |r AS (SELECT doc_id, q,
         |        row_number() OVER (ORDER BY q DESC, doc_id) AS rank,
         |        count(*) OVER () AS n FROM qq),
         |s AS (SELECT doc_id, rank, ((rank - 1) * 10) // n AS stage,
         |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |      FROM r)
         |SELECT doc_id, rank, stage,
         |  row_number() OVER (ORDER BY stage, h, doc_id) AS position
         |FROM s""".stripMargin,

    "x_dedup_edit" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 80) AS pref FROM documents),
        |tok AS (SELECT doc_id, pref,
        |  list_filter(string_split_regex(lower(pref), '[^a-z0-9'']+'),
        |    w -> len(w) > 0) AS toks FROM t),
        |shv AS (SELECT doc_id, pref, sh FROM (
        |  SELECT doc_id, pref,
        |    CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
        |         ELSE list_distinct(list_transform(range(1, len(toks) - 1),
        |                i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS sh
        |  FROM tok) WHERE len(sh) > 0),
        |ex AS (SELECT doc_id, len(pref) AS len, unnest(sh) AS s FROM shv),
        |hot AS (SELECT s FROM (SELECT s, count(*) AS df FROM ex GROUP BY s)
        |        WHERE df > 1000),
        |exc AS (SELECT * FROM ex WHERE s NOT IN (SELECT s FROM hot)),
        |cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        |         FROM exc l JOIN exc r ON l.s = r.s AND l.doc_id < r.doc_id
        |           AND abs(l.len - r.len) <= 20),
        |v AS (SELECT id_a, id_b,
        |        CAST(levenshtein(x.pref, y.pref) AS INT) AS edit_dist
        |      FROM cand JOIN shv x ON x.doc_id = cand.id_a
        |                JOIN shv y ON y.doc_id = cand.id_b)
        |SELECT id_a, id_b, edit_dist FROM v WHERE edit_dist <= 20""".stripMargin,

    "x_dedup_audit" ->
      s"""WITH $ShingleCtes,
         |e AS (SELECT id_a, id_b FROM p WHERE jaccard >= 0.7),
         |hs AS (SELECT doc_id,
         |  list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hs
         |  FROM sh WHERE len(sh) > 0),
         |sig AS (SELECT doc_id, list_transform(range(0, 32), i ->
         |  list_min(list_transform(hs,
         |    h -> ((2 * i + 1) * h + (101 * i + 17)) % 4294967311))) AS sig
         |  FROM hs),
         |bs AS (SELECT e.id_a, e.id_b,
         |  len(list_filter(range(0, 2), b ->
         |    list_slice(x.sig, b * 16 + 1, b * 16 + 16) =
         |    list_slice(y.sig, b * 16 + 1, b * 16 + 16))) > 0 AS band_match
         |  FROM e JOIN sig x ON x.doc_id = e.id_a
         |         JOIN sig y ON y.doc_id = e.id_b)
         |SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_exact,
         |  CAST(count(CASE WHEN band_match THEN 1 END) AS BIGINT) AS n_found,
         |  round(CAST(count(CASE WHEN band_match THEN 1 END) AS DOUBLE) /
         |    greatest((SELECT count(*) FROM e), 1), 4) AS recall
         |FROM bs""".stripMargin,

    "x_knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |           WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id, embedding, label FROM embeddings
         |      WHERE vec_id % 50 <> 0),
         |s AS (SELECT q.q_id, c.vec_id, c.label,
         |        round(${cosineSql("c.embedding", "q.qv")}, 3) AS cosine
         |      FROM c CROSS JOIN q),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |        ORDER BY cosine DESC, vec_id) AS rank FROM s),
         |v AS (SELECT q_id, label, CAST(count(*) AS INT) AS votes
         |      FROM r WHERE rank <= 10 GROUP BY 1, 2),
         |w AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |        ORDER BY votes DESC, label) AS rn FROM v)
         |SELECT q_id, label AS pred_label, votes FROM w WHERE rn = 1""".stripMargin,

    "x_text_ttr" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |e AS (SELECT doc_id, unnest(toks) AS tk FROM t),
         |c AS (SELECT doc_id, tk, count(*) AS n FROM e GROUP BY 1, 2),
         |a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
         |        count(*) AS n_types,
         |        CAST(count(CASE WHEN n = 1 THEN 1 END) AS BIGINT) AS n_hapax
         |      FROM c GROUP BY 1)
         |SELECT t.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
         |  coalesce(a.n_types, 0) AS n_types,
         |  coalesce(a.n_hapax, 0) AS n_hapax,
         |  CASE WHEN coalesce(a.n_tokens, 0) = 0 THEN 0.0
         |       ELSE round(CAST(a.n_types AS DOUBLE) / a.n_tokens, 4) END AS ttr,
         |  CASE WHEN coalesce(a.n_types, 0) = 0 THEN 0.0
         |       ELSE round(CAST(a.n_hapax AS DOUBLE) / a.n_types, 4) END AS hapax_frac
         |FROM t LEFT JOIN a USING (doc_id)""".stripMargin,

    "x_quality_ks" -> QualityKsSql,

    "x_dedup_containment" ->
      s"""WITH $ShingleCtes,
         |cc AS (SELECT id_a, id_b,
         |    len(list_intersect(x.sh, y.sh)) AS c,
         |    len(x.sh) AS sa, len(y.sh) AS sb
         |  FROM cand JOIN sh x ON x.doc_id = cand.id_a
         |            JOIN sh y ON y.doc_id = cand.id_b)
         |SELECT src, dst, containment, n_shingles FROM (
         |  SELECT id_a AS src, id_b AS dst,
         |    round(CAST(c AS DOUBLE) / sa, 4) AS containment,
         |    CAST(sa AS INT) AS n_shingles FROM cc
         |  UNION ALL
         |  SELECT id_b AS src, id_a AS dst,
         |    round(CAST(c AS DOUBLE) / sb, 4) AS containment,
         |    CAST(sb AS INT) AS n_shingles FROM cc)
         |WHERE containment >= 0.6 AND n_shingles >= 3""".stripMargin,

    "x_asof_nearest" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT) AS od
        |  FROM orders),
        |g AS (SELECT o_custkey, od, max(o_orderkey) AS near_okey
        |      FROM o GROUP BY 1, 2),
        |p AS (SELECT o.o_orderkey, max(g.od) AS pod
        |      FROM o JOIN g ON g.o_custkey = o.o_custkey AND g.od < o.od
        |      GROUP BY 1),
        |nx AS (SELECT o.o_orderkey, min(g.od) AS nod
        |       FROM o JOIN g ON g.o_custkey = o.o_custkey AND g.od > o.od
        |       GROUP BY 1),
        |sel AS (SELECT o.o_orderkey, o.o_custkey, o.od, p.pod, nx.nod,
        |    (nx.nod IS NULL OR (p.pod IS NOT NULL
        |      AND (o.od - p.pod) <= (nx.nod - o.od))) AS pick
        |  FROM o LEFT JOIN p ON p.o_orderkey = o.o_orderkey
        |         LEFT JOIN nx ON nx.o_orderkey = o.o_orderkey)
        |SELECT s.o_orderkey,
        |  CASE WHEN s.pick THEN gp.near_okey ELSE gn.near_okey END AS near_okey,
        |  CAST(CASE WHEN s.pick THEN s.pod - s.od ELSE s.nod - s.od END AS INT)
        |    AS gap_days
        |FROM sel s
        |LEFT JOIN g gp ON gp.o_custkey = s.o_custkey AND gp.od = s.pod
        |LEFT JOIN g gn ON gn.o_custkey = s.o_custkey AND gn.od = s.nod""".stripMargin,

    // The two window sorts MUST use a TOTAL order: with only (s_day,
    // e_day), DuckDB's f and g windows each sort independently and can
    // permute duplicate rows differently — pmax values computed under one
    // tie order get prefix-summed under another, sliding an island
    // boundary between duplicates and inflating the previous island's
    // extent (observed at sf0.1: 4 suppliers overcounted `covered`).
    // (l_orderkey, l_linenumber) makes every sort identical. Spark's side
    // computes all windows over ONE sort (identical window spec → one
    // Window operator), where any consistent tie order yields the correct
    // union — verified against a brute-force interval merge.
    "x_interval_coverage" ->
      """WITH iv AS (SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS INT) AS s_day,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
        |      + l_linenumber % 7 AS INT) AS e_day
        |  FROM lineitem),
        |f AS (SELECT l_suppkey, l_orderkey, l_linenumber, s_day, e_day,
        |    max(e_day) OVER (PARTITION BY l_suppkey
        |      ORDER BY s_day, e_day, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |g AS (SELECT *,
        |    sum(CASE WHEN pmax IS NULL OR s_day > pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY l_suppkey
        |        ORDER BY s_day, e_day, l_orderkey, l_linenumber
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM f),
        |isles AS (SELECT l_suppkey, isl, min(s_day) AS s, max(e_day) AS e,
        |    count(*) AS n
        |  FROM g GROUP BY 1, 2)
        |SELECT l_suppkey, CAST(sum(n) AS BIGINT) AS n_intervals,
        |  count(*) AS n_islands,
        |  CAST(sum(e - s + 1) AS BIGINT) AS covered,
        |  CAST(max(e) - min(s) + 1 AS INT) AS span,
        |  CAST(sum(e - s + 1) AS BIGINT) / (max(e) - min(s) + 1)
        |    AS coverage_ratio
        |FROM isles GROUP BY l_suppkey""".stripMargin
  )

  /** Shared CTEs deriving the deterministic link graph ([[Graph.deriveEdges]]):
    * 3 outlinks per doc, target = h32(src ":" j) mod n. (A `def`, not a
    * `val` — it is referenced from `oracleSql`, which initializes first.) */
  /** The unrolled 3-step BPE merge-winner chain shared by the train and
    * encode oracles: corpus word counts → boundary-delimited vocabulary →
    * pair-count winner b1 → merged v1 → winner b2 → … b3. */
  private def BpeMergeCtes: String =
    s"""t AS (SELECT $Toks AS toks FROM documents),
       |w AS (SELECT unnest(toks) AS w FROM t),
       |wc AS (SELECT w, count(*) AS c FROM w GROUP BY w),
       |v0 AS (SELECT '<' || array_to_string(list_transform(
       |          range(1, length(w) + 1),
       |          i -> substr(w, CAST(i AS INT), 1)), '><') || '>' AS s, c
       |       FROM wc),
       |y1 AS (SELECT s, c, string_split(substr(s, 2, length(s) - 2), '><') AS y FROM v0),
       |p1 AS (SELECT y[CAST(u.i AS INT)] AS l, y[CAST(u.i AS INT) + 1] AS r, c
       |       FROM y1, UNNEST(range(1, len(y))) AS u(i)),
       |b1 AS (SELECT l, r, CAST(sum(c) AS BIGINT) AS n FROM p1 GROUP BY l, r
       |       ORDER BY n DESC, l, r LIMIT 1),
       |v1 AS (SELECT replace(y1.s, '<'||b1.l||'><'||b1.r||'>',
       |                      '<'||b1.l||b1.r||'>') AS s, c FROM y1, b1),
       |y2 AS (SELECT s, c, string_split(substr(s, 2, length(s) - 2), '><') AS y FROM v1),
       |p2 AS (SELECT y[CAST(u.i AS INT)] AS l, y[CAST(u.i AS INT) + 1] AS r, c
       |       FROM y2, UNNEST(range(1, len(y))) AS u(i)),
       |b2 AS (SELECT l, r, CAST(sum(c) AS BIGINT) AS n FROM p2 GROUP BY l, r
       |       ORDER BY n DESC, l, r LIMIT 1),
       |v2 AS (SELECT replace(y2.s, '<'||b2.l||'><'||b2.r||'>',
       |                      '<'||b2.l||b2.r||'>') AS s, c FROM y2, b2),
       |y3 AS (SELECT s, c, string_split(substr(s, 2, length(s) - 2), '><') AS y FROM v2),
       |p3 AS (SELECT y[CAST(u.i AS INT)] AS l, y[CAST(u.i AS INT) + 1] AS r, c
       |       FROM y3, UNNEST(range(1, len(y))) AS u(i)),
       |b3 AS (SELECT l, r, CAST(sum(c) AS BIGINT) AS n FROM p3 GROUP BY l, r
       |       ORDER BY n DESC, l, r LIMIT 1)""".stripMargin

  /** One unrolled fixed-point HITS iteration (authority then hub, each
    * L1-renormalized to 1e9 by integer division — mirrors
    * [[graft.ops.Graph.hits]] exactly). */
  private def hitsIter(k: Int): String = {
    val prev = if (k == 1) "hub0" else s"hub${k - 1}"
    s"""ar$k AS (SELECT e.dst AS id, CAST(sum(h.h) AS BIGINT) AS s
       |  FROM edges e JOIN $prev h ON e.src = h.id GROUP BY e.dst),
       |at$k AS (SELECT CAST(coalesce(sum(s), 0) AS BIGINT) AS t FROM ar$k),
       |auth$k AS (SELECT i.id,
       |  CAST(coalesce(a.s, 0) * 1000000000 // greatest((SELECT t FROM at$k), 1) AS BIGINT) AS a
       |  FROM ids i LEFT JOIN ar$k a ON i.id = a.id),
       |hr$k AS (SELECT e.src AS id, CAST(sum(a.a) AS BIGINT) AS s
       |  FROM edges e JOIN auth$k a ON e.dst = a.id GROUP BY e.src),
       |ht$k AS (SELECT CAST(coalesce(sum(s), 0) AS BIGINT) AS t FROM hr$k),
       |hub$k AS (SELECT i.id,
       |  CAST(coalesce(hh.s, 0) * 1000000000 // greatest((SELECT t FROM ht$k), 1) AS BIGINT) AS h
       |  FROM ids i LEFT JOIN hr$k hh ON i.id = hh.id)""".stripMargin
  }

  private def GraphCtes: String =
    """n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |ids AS (SELECT doc_id AS id FROM documents),
      |edges AS (SELECT id AS src,
      |  CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8) AS BIGINT)
      |    % (SELECT n FROM n) AS dst
      |  FROM ids, (SELECT unnest([1, 2, 3]) AS j) js)""".stripMargin

  /** x_quality_ks's full oracle — also pins `s_stream_drift`, whose
    * final streamed histogram equals the batch one. */
  def QualityKsSql: String =
    s"""WITH t AS (SELECT doc_id, source, text, $Toks AS toks FROM documents),
         |f AS (SELECT doc_id, source,
         |  CAST(len(toks) AS INT) AS n_tokens,
         |  round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) /
         |        greatest(len(text), 1), 4) AS punct_ratio,
         |  round(CAST(len(list_filter(toks, w -> list_contains(
         |      ['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE) /
         |        greatest(len(toks), 1), 4) AS stopword_ratio
         |  FROM t),
         |q AS (SELECT doc_id, source,
         |  round(least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
         |      + stopword_ratio * CAST(0.4 AS DOUBLE)
         |      + (CAST(1.0 AS DOUBLE) - least(punct_ratio * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
         |    4) AS quality_score
         |  FROM f),
         |cb AS (SELECT source,
         |    least(CAST(floor(quality_score * 256) AS INT), 255) AS b,
         |    count(*) AS n
         |  FROM q GROUP BY 1, 2),
         |grid AS (SELECT s.source, g.b
         |  FROM (SELECT DISTINCT source FROM cb) s,
         |       (SELECT unnest(range(0, 256)) AS b) g),
         |dense AS (SELECT g.source, g.b, coalesce(cb.n, 0) AS n
         |  FROM grid g LEFT JOIN cb ON cb.source = g.source AND cb.b = g.b),
         |cum AS (SELECT source, b,
         |    sum(n) OVER (PARTITION BY source ORDER BY b
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM dense),
         |gl AS (SELECT b, sum(cum) AS gcum FROM cum GROUP BY b),
         |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM cb GROUP BY 1),
         |nn AS (SELECT CAST(sum(ns) AS BIGINT) AS ntot FROM tot)
         |SELECT c.source, t.ns AS n_docs,
         |  CASE WHEN nn.ntot > t.ns THEN
         |    max(abs(CAST(c.cum AS DOUBLE) / t.ns -
         |            CAST(g.gcum - c.cum AS DOUBLE) / (nn.ntot - t.ns)))
         |  END AS ks_stat
         |FROM cum c JOIN gl g USING (b) JOIN tot t ON t.source = c.source, nn
         |GROUP BY c.source, t.ns, nn.ntot""".stripMargin

  /** CTE chain `t → f → q` computing [[graft.ops.TextOps.qualityScore]]'s
    * composite (doc_id, source, quality_score) — the same arithmetic the
    * x_text_quality oracle pins field by field. */
  private def QualityCte: String =
    s"""t AS (SELECT doc_id, source, text, $Toks AS toks FROM documents),
       |f AS (SELECT doc_id, source,
       |  CAST(len(toks) AS INT) AS n_tokens,
       |  round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) /
       |        greatest(len(text), 1), 4) AS punct_ratio,
       |  round(CAST(len(list_filter(toks, w -> list_contains(
       |      ['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE) /
       |        greatest(len(toks), 1), 4) AS stopword_ratio
       |  FROM t),
       |q AS (SELECT doc_id, source,
       |  round(least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
       |      + stopword_ratio * CAST(0.4 AS DOUBLE)
       |      + (CAST(1.0 AS DOUBLE) - least(punct_ratio * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
       |    4) AS quality_score
       |  FROM f)""".stripMargin

  /** One unrolled fixed-point power-iteration step for the x_embed_pca
    * oracle: score rows against v{k} (index-order fold), accumulate
    * per-dim integer contributions, renormalize onto the 6-dp grid.
    * Mirrors [[graft.ops.Similarity.topComponentProjection]] exactly —
    * list_reduce's initial-less left fold equals Spark's aggregate with a
    * 0.0 seed because 0.0 + x == x in IEEE. */
  private def pcaIter(k: Int): String =
    s"""ps${k + 1} AS (SELECT pc.vec_id, pc.c,
       |    list_reduce(list_transform(range(1, len(pc.c) + 1),
       |      i -> CAST(pc.c[CAST(i AS INT)] AS DOUBLE) * pv$k.v[CAST(i AS INT)]),
       |      (a, b) -> a + b) AS s
       |  FROM pc, pv$k),
       |pu${k + 1} AS (SELECT CAST(u.i - 1 AS INT) AS dim,
       |    CAST(sum(CAST(round(CAST(r.c[CAST(u.i AS INT)] AS DOUBLE) * r.s) AS BIGINT)) AS BIGINT) AS u
       |  FROM ps${k + 1} r, UNNEST(range(1, len(r.c) + 1)) AS u(i) GROUP BY 1),
       |pn${k + 1} AS (SELECT list(u ORDER BY dim) AS ul,
       |    sqrt(list_reduce(list_transform(list(CAST(u AS DOUBLE) ORDER BY dim),
       |      x -> x * x), (a, b) -> a + b)) AS norm
       |  FROM pu${k + 1}),
       |pv${k + 1} AS (SELECT list_transform(ul,
       |    x -> round(CAST(x AS DOUBLE) / norm, 6)) AS v FROM pn${k + 1})""".stripMargin

  /** One unrolled fixed-point PageRank iteration — DuckDB's `//` equals
    * Spark's `DIV` on the non-negative longs involved. */
  private def prIter(prev: String, cur: String): String =
    s"""$cur AS (SELECT i.id,
       |  CAST((SELECT (15 * 1000000000000) // (100 * n) FROM n)
       |    + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
       |  FROM ids i LEFT JOIN (
       |    SELECT e.dst AS id, sum(r.r // 3) AS s
       |    FROM edges e JOIN $prev r ON e.src = r.id GROUP BY e.dst) c
       |    ON i.id = c.id)""".stripMargin
}
