package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Caches.TrackedPersist

/** Similarity search over embedding columns (`array<float>`): cosine /
  * dot-product scoring as pure Catalyst higher-order expressions, a
  * brute-force top-k baseline, and an LSH-bucketed approximate variant
  * that is the 100 TB scale path.
  *
  * Design rules:
  *   - all vector math is `zip_with`/`aggregate` lambdas over the array —
  *     codegen'd per row, no UDF, no driver-side loops;
  *   - floats are cast to double BEFORE any arithmetic and summed in array
  *     order so scores are deterministic and match a DuckDB oracle doing
  *     the same left-to-right summation;
  *   - brute-force top-k against one query vector is a map-only scan + a
  *     single k-row reduction (`orderBy.limit` → TakeOrderedAndProject);
  *     at 100 TB the per-partition top-k is computed map-side before the
  *     single-stage reduction — nothing but k rows per task crosses the
  *     shuffle;
  *   - the approximate variant buckets vectors by random-hyperplane LSH
  *     signature (deterministic md5-seeded hyperplanes) so the query only
  *     scores its own bucket — the standard IVF/LSH pruning shape.
  */
object Similarity {

  /** Element-wise double view of a float vector column. */
  private def dbl(v: Column): Column = transform(v, x => x.cast("double"))

  /** Public double view — precompute this once per row before pair joins. */
  def asDouble(v: Column): Column = dbl(v)

  /** Cosine over already-double vectors with precomputed norms: the
    * per-pair cost is one dot product. Arithmetic is identical to
    * [[cosine]] (same left-to-right dot summation, same zero-norm guard). */
  def cosinePrenormed(a: Column, normA: Column, b: Column, normB: Column): Column = {
    val d = normA * normB
    when(d === 0.0, lit(0.0))
      .otherwise(graft.functions.GraftFunctions.dotDouble(a, b) / d)
  }

  /** Dot product — left-to-right summation for determinism (native
    * [[graft.functions.DotDouble]] expression; reads float arrays
    * directly, so no per-element cast lambda wraps the input). */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dotDouble(a, b)

  /** L2 norm (native sum-of-squares inner loop; `sqrt` stays built-in). */
  def l2norm(a: Column): Column =
    sqrt(graft.functions.GraftFunctions.sumSqDouble(a))

  /** Reference HOF formulation of [[l2norm]] — identical arithmetic. */
  private[graft] def l2normHof(a: Column): Column =
    sqrt(aggregate(dbl(a), lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = l2norm(a) * l2norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Squared euclidean distance — native [[graft.functions.SqDistDouble]]
    * (the IVF/k-means assignment evaluates it once per row per centroid;
    * the HOF reference formulation is pinned in ExpressionsSpec). */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.sqDistDouble(a, b)

  /** Reference HOF formulation of [[sqDist]] — identical arithmetic. */
  private[graft] def sqDistHof(a: Column, b: Column): Column =
    aggregate(zip_with(dbl(a), dbl(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Brute-force cosine top-k neighbours of the vector with id `queryId`.
    *
    * The query vector is a one-row broadcast (crossJoin with a 1-row side
    * is planned as BroadcastNestedLoopJoin — effectively free); scoring is
    * map-only; `orderBy.limit(k)` plans as TakeOrderedAndProject, which
    * reduces each partition to its local top-k before the driver merge —
    * the exact-search baseline that still works at 10^9 vectors.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"))
    df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), round(cosine(col(vecCol), col("q_vec")), 3).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component: hash of
    * (plane index, dimension index) mapped to [-0.5, 0.5). Pure expression,
    * identical arithmetic is mirrored by the DuckDB oracle. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (conv(substring(md5(concat_ws(":", lit(plane), dim).cast("binary")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)) - 0.5

  /** Sign of the projection of `vec` on deterministic hyperplane `plane`. */
  private def planeSign(vec: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(dbl(vec), sequence(lit(0), size(vec) - 1),
        (x, i) => x * planeComponent(plane, i)),
      lit(0.0), (acc, v) => acc + v)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** Random-hyperplane LSH bucket id (`nPlanes`-bit signature) — the
    * native [[graft.functions.LshBucket]] expression: the hyperplane
    * components depend only on (plane, dim), so they md5-hash once per
    * JVM instead of once per element per row (the HOF formulation below,
    * kept as [[lshBucketHof]] for the equivalence spec, re-evaluates the
    * whole md5/conv tree per element). */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    graft.functions.GraftFunctions.lshBucket(vec, nPlanes)

  /** Reference HOF formulation of [[lshBucket]] — identical arithmetic,
    * pinned against the native expression in ExpressionsSpec. */
  private[graft] def lshBucketHof(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map(p => planeSign(vec, p) * (1 << p))
      .reduce((a, b) => a + b)

  /** LSH-bucketed approximate top-k: score only vectors sharing the query's
    * hyperplane-signature bucket. At scale the bucketed table is written
    * partitioned by bucket, so a query touches one partition (IVF shape);
    * here the bucket equi-join replaces the full scan with a pruned one.
    * Exactness is approximate by construction (that is the point); recall
    * rises with fewer planes / multi-probe.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nPlanes: Int = 4): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
      .persistTracked() // reused by the query-row lookup and the bucket scan
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("bucket"))
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(q), "bucket")
      .select(col(idCol), round(cosine(col(vecCol), col("q_vec")), 3).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Multi-probe LSH top-k: probe the query's own bucket AND every bucket
    * at Hamming distance 1 from its signature (one flipped hyperplane bit)
    * — the standard multi-probe recall recovery (Lv et al., VLDB 2007):
    * a near neighbour that lands on the wrong side of ONE hyperplane is
    * still found. The probe set is nPlanes+1 buckets, materialised as
    * nPlanes+1 broadcast rows, so the candidate scan stays a bucket
    * equi-join — each candidate has exactly one bucket and the probe
    * buckets are distinct, so no candidate duplicates. At scale (bucketed
    * table written partitioned by bucket) a probe reads nPlanes+1
    * partitions instead of 1 — recall buys a bounded, known read
    * amplification, never a full scan. */
  def lshTopKProbe(df: DataFrame, idCol: String, vecCol: String,
                   queryId: Long, k: Int, nPlanes: Int = 4): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
      .persistTracked()
    val flips = array((lit(0) +: (0 until nPlanes).map(p => lit(1 << p))): _*)
    val probes = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("bucket"),
        explode(flips).as("flip"))
      .select(col("q_vec"),
        col("bucket").bitwiseXOR(col("flip")).as("bucket"))
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(probes), "bucket")
      .select(col(idCol), round(cosine(col(vecCol), col("q_vec")), 3).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs cosine above a threshold within a blocking column — see
    * [[Dedup.embeddingNearDupPairs]]; exposed here for symmetric use as a
    * similarity operator. */
  def blockedPairs(df: DataFrame, idCol: String, vecCol: String,
                   blockCol: String, threshold: Double): DataFrame =
    Dedup.embeddingNearDupPairs(df, idCol, vecCol, blockCol, threshold)

  /** [[allPairsCosine]] with PER-GROUP block counts derived from each
    * group's size instead of one constant pinned by the caller. A fixed
    * block count is a 100-TB defect twice over: per-task pair work grows
    * as (group/blocks)² — the constant that balances 5k docs straggles
    * (or OOMs a task) at 50M — and under group SKEW one global count
    * makes the dominant group's block-pairs arbitrarily heavier than the
    * rest (measured: a 2.8x-dominant language → 8x-heavier shuffle keys,
    * wall stuck at ~2.5x the cpu/slots floor). Here blocks(g) =
    * ceil(|g| / targetBlockRows), so EVERY triangle block-pair in every
    * group carries ~targetBlockRows² comparisons — uniform task weights
    * at any corpus size or skew. The per-group count table is
    * group-cardinality-sized and joins UNHINTED (AQE broadcasts it when
    * small — same policy as the tfidf vocabulary join: a forced
    * broadcast would OOM on a high-cardinality group column). Capped at
    * 512 blocks/group — beyond that (>131k block-pairs) the explode
    * fan-out dominates and the LSH/IVF family is the right tool, not
    * the exact baseline. */
  def allPairsCosineAuto(df: DataFrame, idCol: String, vecCol: String,
                         grpCols: Seq[String],
                         targetBlockRows: Int = 2048): DataFrame =
    autoBlockedPairs(df, idCol, vecCol, struct(grpCols.map(col): _*),
      targetBlockRows)

  /** The adaptive triangle-block pair core shared by
    * [[allPairsCosineAuto]], [[knnGraph]] and [[semanticDedup]]: every
    * unordered within-group pair exactly once as (id_a < id_b, cosine),
    * with PER-GROUP block counts so no task's pair work exceeds
    * ~targetBlockRows² regardless of group size or skew. Cosine is
    * unrounded (norms precomputed once per replicated row, one fused dot
    * per pair — bit-identical to [[cosine]] on the same vectors). */
  private def autoBlockedPairs(df: DataFrame, idCol: String, vecCol: String,
                               grp: Column, targetBlockRows: Int): DataFrame = {
    require(targetBlockRows >= 1, s"targetBlockRows must be >= 1")
    val slots = df.sparkSession.sparkContext.defaultParallelism
    val counts = df.groupBy(grp.as("__g")).agg(count(lit(1)).as("__cnt"))
    // Parallelism floor, conditioned on ACTUAL slot underfill. Size alone
    // puts a small corpus (or the small groups of a skewed one) in a
    // handful of triangle blocks, so when the size-derived block-pairs
    // across ALL groups can't fill the cluster's slots, k gets a floor of
    // ~sqrt(2·slots / nGroups) (nGroups · k(k+1)/2 ≥ slots). The floor
    // must NOT apply unconditionally: an unconditional kmin =
    // sqrt(2·slots) replicates every row of every group ~kmin/2× on a
    // large cluster even when the group count alone already fills it
    // (round-12 verdict: on a 10k-slot cluster the old floor was k=142
    // for EVERY group — a corpus of many ~500-row cells would replicate
    // every row ~70× for no skew benefit). Now a many-group corpus gets
    // k from size alone, and k is additionally capped by the group size —
    // blocks beyond one row each are pure replication with no parallelism
    // left to buy. The fill/group-count summary is ONE row aggregated off
    // the cached counts table and read with first() — the established
    // driver-scalar pattern here (trainHashedLogReg's nDocs, kmeans'
    // centroid collect); an earlier broadcast-crossJoin variant kept the
    // plan lazy but grew every consumer's generated code and added a
    // materialization barrier (A/B mini-bench medians: x_mm_embed_pairs
    // 1.80→2.62 s, x_knn_graph 1.86→2.17 s walls at sf0.1). With the
    // literal, the common at-scale case (fill ≥ slots) plans EXACTLY like
    // an unfloored k = min(512, cnt, ⌈cnt/target⌉). The summary job reads
    // only the GROUP column (everything else prunes away below the
    // aggregate), and counts stays UNPERSISTED so the main action plans
    // the count join exactly as before — an InMemoryRelation there traded
    // AQE's runtime-stats broadcast for cache machinery and measured
    // slower at bench scale.
    val kSize = ceil(col("__cnt").cast("double") / targetBlockRows)
    val sumRow = counts.agg(
      sum(kSize * (kSize + lit(1)) / lit(2)).as("__fill"),
      count(lit(1)).as("__ng")).first()
    val fill = if (sumRow.isNullAt(0)) 0.0 else sumRow.getDouble(0)
    val nGroups = sumRow.getLong(1)
    val kmin: Long =
      if (nGroups == 0L || fill >= slots) 1L
      else math.ceil(math.sqrt(2.0 * slots / nGroups)).toLong
    val base = df.select(grp.as("__g"),
        col(idCol).as("__id"), dbl(col(vecCol)).as("__v"))
      .withColumn("__n", l2norm(col("__v")))
      .join(counts, Seq("__g"))
      .withColumn("__k", least(least(lit(512L), col("__cnt")),
        greatest(lit(kmin), kSize)).cast("int"))
      .withColumn("__b",
        pmod(xxhash64(col("__id").cast("string")), col("__k")).cast("int"))
      .persistTracked()
    val lhs = base
      .withColumn("__j", explode(expr("sequence(__b, __k - 1)")))
      .select(col("__g"), col("__b").as("__i"), col("__j"),
        col("__id").as("__ida"), col("__v").as("__va"), col("__n").as("__na"))
    val rhs = base
      .withColumn("__i", explode(expr("sequence(0, __b)")))
      .select(col("__g"), col("__i"), col("__b").as("__j"),
        col("__id").as("__idb"), col("__v").as("__vb"), col("__n").as("__nb"))
    lhs.repartition(col("__g"), col("__i"), col("__j"))
      .join(rhs, Seq("__g", "__i", "__j"))
      .where(col("__i") =!= col("__j") || col("__ida") < col("__idb"))
      .select(
        least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"),
        cosinePrenormed(col("__va"), col("__na"), col("__vb"), col("__nb"))
          .as("cosine"))
  }

  /** EXACT all-pairs cosine within a grouping column, parallelised by
    * triangle block-decomposition. A plain self-join on the group key puts
    * every pair of one group into a single task — with a dominant group
    * (e.g. 40% of a corpus sharing one language) that task computes
    * O(n_g²) cosines serially while the rest of the cluster idles. Here
    * each row hashes into one of `blocks` sub-blocks; a row in block i
    * fans out as the LEFT of block-pairs (i, i..B-1) and as the RIGHT of
    * (0..i, i); the equi-join on (group, i, j) then spreads the B(B+1)/2
    * block-pairs of each group across the shuffle, so per-task work drops
    * to (n_g/B)² and scales out with the partition count. Replication
    * cost is (B+1)/2 copies per side — bounded and tunable; work (the
    * pair count) is identical to the naive join. Norms are computed once
    * per replicated row BEFORE pairing, so each pair pays one fused dot
    * (native expression), not two array re-scans.
    *
    * Pairs are canonicalised to id_a < id_b (cosine is symmetric); the
    * i == j diagonal block keeps the ordered half only, so every
    * unordered pair appears exactly once. */
  def allPairsCosine(df: DataFrame, idCol: String, vecCol: String,
                     grpCols: Seq[String], blocks: Int): DataFrame = {
    // blocks = 0 would make pmod null under non-ANSI eval and silently
    // return an EMPTY pair set — fail loud instead
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    // NOTE: the persisted base below lives until the caller (or the
    // session) clears the cache — Bench/Verify clearCache() per query;
    // long-lived sessions should do the same between invocations
    val base = df.select(
        struct(grpCols.map(col): _*).as("__g"),
        col(idCol).as("__id"), dbl(col(vecCol)).as("__v"))
      .withColumn("__n", l2norm(col("__v")))
      .withColumn("__b",
        pmod(xxhash64(col("__id").cast("string")), lit(blocks)).cast("int"))
      // feeds both join sides: without persist the upstream projection
      // (vector cast + norm — and any caller-side feature extraction)
      // runs twice
      .persistTracked()
    val lhs = base
      .withColumn("__j", explode(expr(s"sequence(__b, ${blocks - 1})")))
      .select(col("__g"), col("__b").as("__i"), col("__j"),
        col("__id").as("__ida"), col("__v").as("__va"), col("__n").as("__na"))
    val rhs = base
      .withColumn("__i", explode(expr("sequence(0, __b)")))
      .select(col("__g"), col("__i"), col("__b").as("__j"),
        col("__id").as("__idb"), col("__v").as("__vb"), col("__n").as("__nb"))
    // pair GENERATION parallelism = probe-side partition count: if AQE
    // broadcasts one side the probe keeps the scan's partitioning (a few
    // tasks for a small file) and the blocks re-serialize — pin the probe
    // to a hash partitioning on the block-pair key
    lhs.repartition(col("__g"), col("__i"), col("__j"))
      .join(rhs, Seq("__g", "__i", "__j"))
      .where(col("__i") =!= col("__j") || col("__ida") < col("__idb"))
      .select(
        least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"),
        cosinePrenormed(col("__va"), col("__na"), col("__vb"), col("__nb"))
          .as("cosine"))
  }

  /** Driver-side centroid table of a (cell, cvec) frame, ordered by
    * ascending cell id — bounded k×dim doubles, the same bound every
    * IVF / k-means stage here already obeys (each one ends in a
    * centroid-sized collect by design). */
  private def collectCents(cvecs: DataFrame): Seq[(Long, Seq[Double])] =
    cvecs.select(col("cell").cast("long"), col("cvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .toSeq.sortBy(_._1)

  /** Map-only nearest-cell assignment: one native argmin
    * ([[graft.functions.NearestCentroid]]) per row against the literal
    * centroid table. First-wins ties over the ascending-cell-ordered
    * literal equal the (dist, cell) lexicographic ordering the former
    * crossJoin + row_number formulation produced — but with no k-fold row
    * blowup and no per-id window shuffle: assignment stays inside the
    * scan's whole-stage codegen span. */
  private def cellOf(vec: Column, cents: Seq[(Long, Seq[Double])]): Column =
    element_at(typedLit(cents.map(_._1)),
      graft.functions.GraftFunctions.nearestCentroid(vec, typedLit(cents.map(_._2))) + 1)

  /** Per-label centroid of an embedding column, one output row per
    * (label, dimension): posexplode → partial per-dimension sums map-side →
    * one shuffle of (label, dim) pairs. The IVF coarse-quantizer build
    * step — at scale this is how the bucket centroids for ANN routing are
    * produced. */
  /** Per-dimension corpus whitening (z-score standardization) — the
    * feature-scaling pass run before k-means / PCA when embedding dims
    * have unequal spread. Two corpus passes: ONE posexplode aggregation
    * reduces to a dim-row integer-moment table (map-side partials — dim
    * cells, never rows, cross the shuffle), broadcast back onto the
    * exploded corpus for a map-only transform. Zero-variance dims pass
    * through as z = 0 rather than dividing by zero.
    *
    * Bit-determinism contract (the [[topComponentProjection]] fixed-point
    * recipe): inputs quantize to 1e-6-grid longs, the per-dim moments
    * (n, Σx, Σx²) accumulate as exact decimal(38,0) integers — order- and
    * partitioning-independent — and
    *   z = (n·x − Σx) / sqrt(n·Σx² − (Σx)²)
    * is one correctly-rounded IEEE division over one correctly-rounded
    * sqrt of exact integers, so every engine computes the identical
    * double. The published value is fixed-point `z_micro` =
    * round(z·10^scale) as a LONG: integers carry no −0.0 and no
    * decimal-boundary sensitivity, the two failure modes a rounded-double
    * z column exposes across engines. decimal(38,0) moments hold to
    * ~1e10 rows at unit-scale embeddings; rescale the quantization grid
    * beyond that. */
  def standardize(df: DataFrame, idCol: String, vecCol: String,
                  scale: Int = 4): DataFrame = {
    val dec = "decimal(38,0)"
    val e = df
      .select(col(idCol), posexplode(dbl(col(vecCol))).as(Seq("dim", "x")))
      .select(col(idCol), col("dim"),
        round(col("x") * 1e6).cast("long").as("xq"))
    val stats = e.groupBy(col("dim"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("xq").cast(dec)).as("sq"),
        sum((col("xq").cast(dec) * col("xq").cast(dec))).as("ssq"))
      .select(col("dim"), col("n"), col("sq"),
        (col("n") * col("ssq") - col("sq") * col("sq")).as("disc"))
    e.join(broadcast(stats), "dim")
      .select(col(idCol), col("dim"),
        when(col("disc") <= 0, lit(0L)).otherwise(
          round((col("n") * col("xq").cast(dec) - col("sq")).cast("double")
            / sqrt(col("disc").cast("double")) * math.pow(10, scale))
            .cast("long")).as("z_micro"))
  }

  /** Signed random projection (Johnson–Lindenstrauss): project each
    * embedding onto `outDim` deterministic ±1 hyperplanes — the cheap
    * dimensionality reduction that preserves pairwise distances within
    * (1±ε) at outDim = O(log n / ε²), used to shrink vectors before an
    * index build or a coarse first-pass similarity scan.
    *
    * The ±1 matrix derives from md5("rp:k:d") nibble parity, computed
    * ONCE on the driver (outDim×inDim doubles, a plan literal — no
    * per-row hashing, unlike an inline-hash formulation which would
    * re-derive the matrix for every row). Scoring is map-only: the
    * corpus fans out ×outDim narrow (id, k, srow) rows and each
    * projection is one left-to-right [[dot]] — deterministic summation,
    * mirrored exactly by the oracle's list_reduce.
    *
    * Dimension contract is enforced PER ROW: [[dot]] iterates the
    * embedding's own length against the fixed ±1 row, so a vector longer
    * than `inDim` would silently read past the sign row (and the oracle's
    * out-of-range list index would return NULL — a silent cross-engine
    * divergence). The `raise_error` guard turns that into a loud job
    * failure naming the offending width instead. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    outDim: Int = 16, inDim: Int = 64): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(k: Int, d: Int): Double = {
      val h = md.digest(s"rp:$k:$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
    }
    val matrix: Seq[Seq[Double]] =
      (0 until outDim).map(k => (0 until inDim).map(d => sign(k, d)))
    df.select(col(idCol), col(vecCol),
        posexplode(typedLit(matrix)).as(Seq("k", "__srow")))
      .select(col(idCol), col("k"),
        // + 0.0 normalizes a rounded -0.0 to +0.0 (IEEE): DuckDB's round
        // keeps the sign of a tiny negative dot, Spark's drops it — the
        // one bit the hash compare would see on a value-equal zero
        when(size(col(vecCol)) === inDim,
            round(dot(col(vecCol), col("__srow")), 4) + lit(0.0))
          .otherwise(raise_error(concat(
            lit(s"randomProject expects $inDim-dim vectors; got "),
            size(col(vecCol)).cast("string")))).as("proj"))
  }

  def centroids(df: DataFrame, labelCol: String, vecCol: String,
                scale: Int = 4): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("v").cast("double")), scale).as("mean"))

  /** Per-(label, dim) centroid means in fixed-point 1e-4 units from EXACT
    * integer sums: each component quantizes to 1e-6 integer units (one
    * order-free IEEE multiply+round per value), the group aggregates an
    * exact decimal(38,0) sum, and the mean is a single IEEE division of
    * exact integers — bit-deterministic at ANY parallelism, unlike
    * [[centroids]]' float `avg` whose partial-sum order varies with
    * partitioning. No double survives to the output, so neither a signed
    * zero nor a round-half boundary can diverge across engines. */
  def centroidsMicro(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
      .select(col("label"), col("dim"),
        round(col("v") * 1e6, 0).cast("decimal(38,0)").as("xq"))
      .groupBy(col("label"), col("dim"))
      .agg(round(sum(col("xq")).cast("double") / (count(lit(1)) * lit(100.0)), 0)
        .cast("long").as("mean_micro"))

  /** IVF (inverted-file) approximate top-k with a supplied coarse
    * quantizer: [[centroids]] of `quantizerCol` are the cell centers
    * (production systems train these offline with k-means — here the
    * pre-labelled partition stands in as the trained quantizer); every
    * vector is assigned to its nearest centroid by squared L2 (broadcast
    * cross join against the tiny centroid table — map-only); the query
    * probes ONLY its own cell and scores exact cosine inside it.
    *
    * At scale the assigned table is written partitioned by cell so a probe
    * reads one partition — the IVF pruning shape; recall grows with
    * multi-probe. Deterministic end to end: same dot/dist summation order
    * as the oracle, ties broken by cell id.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              quantizerCol: String, queryId: Long, k: Int): DataFrame = {
    val cvecs = centroids(df, quantizerCol, vecCol)
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("sm"))
      .select(col("label").as("cell"),
        transform(col("sm"), s => s.getField("mean")).as("cvec"))

    val assigned = df.select(col(idCol), col(vecCol))
      .withColumn("cell", cellOf(col(vecCol), collectCents(cvecs)))
      .persistTracked()

    val q = assigned.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("cell"))
    assigned.filter(col(idCol) =!= queryId)
      .join(broadcast(q), "cell")
      .select(col(idCol), round(cosine(col(vecCol), col("q_vec")), 3).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Multi-probe IVF top-k: like [[ivfTopK]] but the query probes its
    * `probes` nearest cells instead of only its own — the standard recall
    * lever for inverted-file ANN (single-probe recall collapses when the
    * true neighbour sits just across a Voronoi boundary). Cost scales
    * linearly with the probe count while the corpus scan stays pruned to
    * `probes / nCells` of the data; at scale the assigned table is
    * partitioned by cell, so P probes read P partitions.
    *
    * Deterministic: probe cells are the P smallest (squared-L2, cell id)
    * pairs against the query vector, scoring is the same left-to-right
    * cosine as the brute-force baseline. */
  def ivfTopKMultiProbe(df: DataFrame, idCol: String, vecCol: String,
                        quantizerCol: String, queryId: Long, k: Int,
                        probes: Int): DataFrame = {
    val cvecs = centroids(df, quantizerCol, vecCol)
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("sm"))
      .select(col("label").as("cell"),
        transform(col("sm"), s => s.getField("mean")).as("cvec"))

    val assigned = df.select(col(idCol), col(vecCol))
      .withColumn("cell", cellOf(col(vecCol), collectCents(cvecs)))
      .persistTracked()

    // probe list: the query vector against the tiny centroid table —
    // k-row TakeOrderedAndProject, broadcast into the cell-pruned scan
    val qvec = df.filter(col(idCol) === queryId).select(col(vecCol).as("q_vec"))
    val probeCells = qvec.crossJoin(broadcast(cvecs))
      .select(col("q_vec"), col("cell"), sqDist(col("q_vec"), col("cvec")).as("dist"))
      .orderBy(col("dist"), col("cell"))
      .limit(probes)
      .select(col("q_vec"), col("cell"))
    assigned.filter(col(idCol) =!= queryId)
      .join(broadcast(probeCells), "cell")
      .select(col(idCol), round(cosine(col(vecCol), col("q_vec")), 3).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic distributed k-means (Lloyd's) — the IVF coarse-quantizer
    * training step. Seeds are the k vectors with the smallest md5(id)
    * (reproducible without RNG state); each iteration broadcasts the tiny
    * centroid table, assigns every vector to its nearest centroid by
    * squared L2 map-side, and reduces new centroids with one shuffle of
    * (cell, dim) partial sums. Only k×dim doubles ever reach the driver —
    * the corpus never does. Ties break by cell id; empty cells drop.
    *
    * Returns one row per (cell, dim) with the centroid mean — the same
    * shape [[centroids]] produces, feeding [[ivfTopK]]-style probing.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int, scale: Int = 4): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}
    val centSchema = StructType(Seq(
      StructField("cell", LongType), StructField("cvec", ArrayType(DoubleType))))
    def centsDf(cs: Seq[(Long, Seq[Double])]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(cs.map(c => Row(c._1, c._2)), 1), centSchema)

    // each iteration ends in a k×dim collect, so the next pass scans the
    // corpus exactly once against a literal centroid table instead of
    // re-deriving every previous iteration lazily
    var cents: Seq[(Long, Seq[Double])] = df
      .orderBy(Dedup.h32(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .select(col(idCol).cast("long"), dbl(col(vecCol)))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    for (_ <- 1 to iters) {
      // map-only argmin against the literal centroid table (sorted by
      // cell so first-wins ties == the (dist, cell) ordering)
      cents = df.select(col(idCol), col(vecCol))
        .withColumn("cell", cellOf(col(vecCol), cents.sortBy(_._1)))
        .select(col("cell"), posexplode(dbl(col(vecCol))).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        // 6-dp rounding between iterations: distributed summation order
        // is engine-specific, and unrounded ULP noise in a centroid could
        // flip a near-tie assignment next pass — rounding pins both
        // engines to identical centroids
        .agg(round(avg(col("x")), 6).as("mean"))
        .orderBy(col("cell"), col("dim"))
        .collect().toSeq
        .groupBy(_.getLong(0)).toSeq
        .map { case (cell, rows) => (cell, rows.map(_.getDouble(2))) }
    }
    centsDf(cents)
      .select(col("cell"), posexplode(col("cvec")).as(Seq("dim", "mean")))
      .select(col("cell"), col("dim"), round(col("mean"), scale).as("mean"))
  }

  /** Product quantization (PQ): split each vector into `m` contiguous
    * `subDim`-wide subvectors and train `k` centroids per subspace with
    * the deterministic [[kmeans]]. Returns one row per (sub, cell, dim)
    * with the codebook mean — the classic memory-for-recall trade under
    * IVF: m codes of log2(k) bits replace the full vector. Training cost
    * is m independent kmeans runs; everything stays broadcast-argmin +
    * narrow shuffles like the coarse quantizer. */
  def pqCodebooks(df: DataFrame, idCol: String, vecCol: String,
                  m: Int, subDim: Int, k: Int, iters: Int): DataFrame =
    (0 until m).map { s =>
      val sub = df.select(col(idCol),
        slice(col(vecCol), s * subDim + 1, subDim).as("subvec"))
      kmeans(sub, idCol, "subvec", k, iters).withColumn("sub", lit(s))
    }.reduce(_.unionByName(_)).select("sub", "cell", "dim", "mean")

  /** PQ encoding: train per-subspace codebooks ([[pqCodebooks]] chain) and
    * assign every vector its nearest code per subspace — broadcast argmin
    * over the tiny codebook, map-only per subspace. Returns one row per
    * (id, sub) with the assigned `code` (ties break by cell id, matching
    * the IVF assignment rule). */
  def pqCodes(df: DataFrame, idCol: String, vecCol: String,
              m: Int, subDim: Int, k: Int, iters: Int): DataFrame =
    (0 until m).map { s =>
      val sub = df.select(col(idCol),
        slice(col(vecCol), s * subDim + 1, subDim).as("subvec"))
      val cb = kmeans(sub, idCol, "subvec", k, iters)
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("sm"))
        .select(col("cell"), transform(col("sm"), x => x.getField("mean")).as("cvec"))
      sub.select(col(idCol), lit(s).as("sub"),
        cellOf(col("subvec"), collectCents(cb)).as("code"))
    }.reduce(_.unionByName(_))

  /** PQ asymmetric-distance top-k (ADC): score the query against PQ codes
    * through per-subspace lookup tables — distance(query, vec) ≈
    * Σ_s sqDist(query_sub_s, codebook_s[code_s(vec)]). The corpus is
    * touched only through its (id, sub, code) table; the LUT is m×k rows
    * (broadcast), so scoring is one map-side join + a per-id sum of m
    * doubles — the memory-bound PQ search shape. Exact per-pair float
    * arithmetic is preserved (m=2 keeps the sum order-insensitive:
    * two-operand IEEE addition is commutative), so the DuckDB oracle
    * replays it bit-for-bit. */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
             kNeighbors: Int, m: Int, subDim: Int, k: Int, iters: Int): DataFrame =
    pqAdcRaw(df, idCol, vecCol, queryId, m, subDim, k, iters)
      .orderBy(col("adist_raw"), col(idCol))
      .limit(kNeighbors)
      .select(col(idCol), round(col("adist_raw"), 6).as("adist"))

  /** The ADC scoring stage of [[pqTopK]]: every non-query vector's raw
    * asymmetric distance to `queryId` through the per-subspace LUTs.
    * Returns (idCol, adist_raw) — corpus-sized but two-columns narrow. */
  private[ops] def pqAdcRaw(df: DataFrame, idCol: String, vecCol: String,
                            queryId: Long, m: Int, subDim: Int, k: Int,
                            iters: Int): DataFrame = {
    val scored = (0 until m).map { s =>
      val sub = df.select(col(idCol),
        slice(col(vecCol), s * subDim + 1, subDim).as("subvec"))
      val cb = kmeans(sub, idCol, "subvec", k, iters)
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("sm"))
        .select(col("cell"), transform(col("sm"), x => x.getField("mean")).as("cvec"))
      val codes = sub.select(col(idCol),
        cellOf(col("subvec"), collectCents(cb)).as("cell"))
      // the query's distance to every codebook entry of this subspace
      val lut = sub.filter(col(idCol) === queryId)
        .select(col("subvec").as("q_sub"))
        .crossJoin(broadcast(cb))
        .select(col("cell"), sqDist(col("q_sub"), col("cvec")).as("qd"))
      codes.join(broadcast(lut), "cell").select(col(idCol), col("qd"))
    }.reduce(_.unionByName(_))
    scored.where(col(idCol) =!= queryId)
      .groupBy(col(idCol))
      .agg(sum(col("qd")).as("adist_raw"))
  }

  /** The standard production ANN composition (the IVF-PQ serving shape,
    * Jégou et al. 2011): multi-probe IVF confines the candidate set to the
    * query's `probes` nearest cells, PQ asymmetric distance ranks those
    * candidates through the m×k LUT (codes precomputed corpus-wide — the
    * index build), and only the `shortlist` best ADC candidates pay an
    * exact full-dimension cosine for the final top-k. The corpus is
    * touched by (a) the one-off cell/code assignment and (b) the probed
    * cells' narrow (id, adist) rows; the exact re-rank — the only
    * full-vector stage — runs on `shortlist` rows regardless of corpus
    * size. Every stage is deterministic, so the whole three-stage funnel
    * replays in the DuckDB oracle. */
  def annRerank(df: DataFrame, idCol: String, vecCol: String,
                quantizerCol: String, queryId: Long, k: Int, probes: Int,
                shortlist: Int, m: Int, subDim: Int, pqK: Int,
                iters: Int): DataFrame = {
    val cvecs = centroids(df, quantizerCol, vecCol)
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("sm"))
      .select(col("label").as("cell"),
        transform(col("sm"), s => s.getField("mean")).as("cvec"))
    val assigned = df.select(col(idCol), col(vecCol))
      .withColumn("cell", cellOf(col(vecCol), collectCents(cvecs)))
    val qvec = df.filter(col(idCol) === queryId).select(col(vecCol).as("q_vec"))
    val probeCells = qvec.crossJoin(broadcast(cvecs))
      .select(col("cell"), sqDist(col("q_vec"), col("cvec")).as("dist"))
      .orderBy(col("dist"), col("cell"))
      .limit(probes)
      .select(col("cell"))
    val cands = assigned.filter(col(idCol) =!= queryId)
      .join(broadcast(probeCells), "cell")
      .select(col(idCol), col(vecCol))
    val short = cands
      .join(pqAdcRaw(df, idCol, vecCol, queryId, m, subDim, pqK, iters), idCol)
      .orderBy(col("adist_raw"), col(idCol))
      .limit(shortlist)
    short.crossJoin(broadcast(qvec))
      .select(col(idCol), round(col("adist_raw"), 6).as("adist"),
        round(cosine(col(vecCol), col("q_vec")), 3).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Per-vector int8 scalar quantization: maps each component onto
    * round((x - lo) / (hi - lo) * 255) with the vector's own [lo, hi]
    * range — the classic 4x storage cut before ANN indexing. Returns a
    * struct (lo, hi, q: array<int>); dequantization is
    * lo + q/255*(hi-lo). Constant vectors (hi == lo) quantize to zeros.
    * Pure per-row expressions — map-only at any scale.
    *
    * Caveat: don't `posexplode` the `q` field of this struct directly —
    * the Generate inlines the whole expression and re-evaluates the
    * min/max per output row. Stage lo/hi/scale as plain columns in a
    * project below the explode instead (see the `x_embed_quantize` query
    * for the pattern; measured 14x difference). */
  def quantizeInt8(vec: Column): Column = {
    // array-level Cast, not a per-element transform lambda: lo/hi get
    // re-evaluated per exploded output row downstream, and Cast+ArrayMin
    // are codegen'd while a HOF lambda is interpreted per element
    val v = vec.cast("array<double>")
    val lo = array_min(v)
    val hi = array_max(v)
    val scale = when(hi === lo, lit(1.0)).otherwise(hi - lo)
    struct(
      round(lo, 4).as("lo"), round(hi, 4).as("hi"),
      transform(v, x => round((x - lo) / scale * 255).cast("int")).as("q"))
  }

  /** IVF top-k over a [[kmeans]]-trained quantizer: train `nCells`
    * centroids, assign every vector to its nearest cell (broadcast
    * map-only argmin, same shape as [[ivfTopK]]), probe the query's cell
    * with exact cosine. The full self-trained IVF pipeline — no
    * pre-existing label column required. */
  def ivfTopKTrained(df: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int, nCells: Int, iters: Int): DataFrame = {
    val cvecs = kmeans(df, idCol, vecCol, nCells, iters)
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("sm"))
      .select(col("cell"), transform(col("sm"), s => s.getField("mean")).as("cvec"))
    val assigned = df.select(col(idCol), col(vecCol))
      .withColumn("cell", cellOf(col(vecCol), collectCents(cvecs)))
      .persistTracked()
    val q = assigned.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("cell"))
    assigned.filter(col(idCol) =!= queryId)
      .join(broadcast(q), "cell")
      .select(col(idCol), round(cosine(col(vecCol), col("q_vec")), 3).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Corpus k-NN graph, cell-confined: every vector's top-`k` cosine
    * neighbours WITHIN its coarse cell (here the pre-labelled partition —
    * production trains the quantizer with [[kmeans]]), plus a `mutual`
    * flag marking edges present in both directions (the mutual-kNN graph
    * is the standard substrate for density clustering / dedup audits).
    *
    * Scale shape: in-cell pairs come from the shared
    * [[autoBlockedPairs]] adaptive triangle core — PER-CELL block counts
    * bound any task's pair work at ~targetBlockRows² even when one
    * k-means cell dominates the corpus (a fixed `l.cell = r.cell`
    * equi-join put a dominant cell's full (cell size)² on one task:
    * measured 9.9× wall at 10× data before this). Each unordered pair is
    * computed ONCE (one fused dot on prenormed rows), then mirrored into
    * both directions for ranking; the per-src top-k window partitions by
    * source id over compact (src, dst, cosine) triples — per-window work
    * is O(cell), never quadratic; the mutual check self-joins the top-k
    * table (corpus×k rows). Ties rank on the ROUNDED cosine then
    * neighbour id, so the graph replays bit-exactly in any engine. */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String,
               cellCol: String, k: Int,
               targetBlockRows: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = autoBlockedPairs(df, idCol, vecCol, struct(col(cellCol)),
        targetBlockRows)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
    // mirror each pair into both directions in ONE pass (explode, not a
    // self-union: a union would re-run the whole blocked pair join per
    // branch — measured ~2x cpu at sf1); cosine is computed in the
    // projection BELOW the Generate, so one fused dot per pair
    val directed = pairs
      .select(explode(array(
        struct(col("id_a").as("src_id"), col("id_b").as("nbr_id"), col("cosine")),
        struct(col("id_b").as("src_id"), col("id_a").as("nbr_id"), col("cosine"))))
        .as("__e"))
      .select(col("__e.src_id").as("src_id"), col("__e.nbr_id").as("nbr_id"),
        col("__e.cosine").as("cosine"))
    // cache the compact corpus x k top-k table: the mutual self-join
    // below references it twice, and without the cache each reference
    // recomputes the pair join from scratch
    val ranked = directed
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src_id"))
          .orderBy(col("cosine").desc, col("nbr_id"))))
      .where(col("rank") <= k)
      .persistTracked()
    ranked.alias("e")
      .join(ranked.select(col("nbr_id").as("_s"), col("src_id").as("_d"))
          .alias("m"),
        col("e.src_id") === col("m._s") && col("e.nbr_id") === col("m._d"),
        "left")
      .select(col("e.src_id").as("src_id"), col("e.nbr_id").as("nbr_id"),
        col("e.cosine"), col("e.rank"), col("m._s").isNotNull.as("mutual"))
  }

  /** Embedding-space benchmark decontamination — the SEMANTIC complement
    * of `TextOps.contaminationScreen`'s n-gram screen: a paraphrased eval
    * item shares no shingles with its source but still sits close in
    * embedding space. Eval/benchmark sets are legally small (thousands of
    * items, bounded here at `maxEval`), so the eval matrix collects to an
    * ordered plan-time literal and the screen is MAP-ONLY: one fused pass
    * per training vector computes every cosine, their max, and the count
    * over `threshold` inside the scan's codegen span — no shuffle, no
    * join, no k-fold row blowup at any corpus size. At a larger eval
    * scale, swap the literal for a broadcast crossJoin + groupBy; the
    * `require` names that escape hatch. Max-cosine publishes in 1e-6
    * fixed point, so no double (and no signed zero) reaches the hash. */
  def semanticDecontaminate(train: DataFrame, idCol: String, vecCol: String,
                            evalDf: DataFrame, evalVecCol: String,
                            threshold: Double, maxEval: Int = 4096): DataFrame = {
    val eval = evalDf.select(dbl(col(evalVecCol)).as("e")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq.sorted(
        Ordering.Implicits.seqOrdering[Seq, Double])
    require(eval.nonEmpty && eval.size <= maxEval,
      s"eval set must have 1..$maxEval vectors, got ${eval.size} " +
        "(use a broadcast-join screen for larger benchmark suites)")
    val coss = transform(typedLit(eval), e => cosine(col(vecCol), e))
    train.select(col(idCol),
        round(array_max(coss) * 1e6, 0).cast("long").as("max_cos_micro"),
        size(filter(coss, c => c >= lit(threshold))).cast("long").as("n_close"))
      .withColumn("contaminated", col("n_close") > 0)
  }

  /** SemDeDup-style SEMANTIC dedup: cluster the embeddings with the
    * deterministic [[kmeans]] quantizer, then WITHIN each cell drop the
    * larger id of any pair with cosine ≥ `threshold` — near-duplicate
    * MEANING rather than near-duplicate text, the step that catches
    * translations, re-renderings and templated paraphrases shingle-based
    * dedup can't see (Abbas et al. 2023, SemDeDup). The pairwise compare
    * is confined to cells AND adaptively triangle-blocked
    * ([[autoBlockedPairs]]): per-cell block counts bound any task's pair
    * work at ~targetBlockRows², so a skewed k-means cell (the common
    * case — real corpora cluster unevenly) can't put its whole
    * (cell size)² on one join key. Raising k still shrinks total pair
    * work directly. Returns kept (id, cell). Smaller-id-wins like every
    * dedup here, so the result is a pure function of the input
    * regardless of layout. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int, threshold: Double,
                    targetBlockRows: Int = 2048): DataFrame = {
    val cvecs = kmeans(df, idCol, vecCol, k, iters)
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("sm"))
      .select(col("cell"), transform(col("sm"), s => s.getField("mean")).as("cvec"))
    val assigned = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cell", cellOf(col("vec"), collectCents(cvecs)))
      .persistTracked() // feeds the pair core and the final anti-join
    // canonical pairs have id_a < id_b; the larger id of a past-threshold
    // pair is the drop (smaller-id-wins)
    val drops = autoBlockedPairs(assigned, "id", "vec", struct(col("cell")),
        targetBlockRows)
      .where(col("cosine") >= threshold)
      .select(col("id_b").as("id")).distinct()
    assigned.join(drops, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cell"))
  }

  /** Exact k-NN JOIN: every row of `queries` gets its top-k nearest
    * corpus rows by cosine — the batched form of [[bruteForceTopK]] (one
    * probe vector at a time doesn't amortize the corpus scan when scoring
    * a whole query batch, e.g. eval-set retrieval or near-dup lookups).
    *
    * Shape: the query batch is broadcast (batches are small relative to
    * the corpus), scoring is map-only over the corpus scan, and only
    * compact (q_id, id, score) triples reach the per-query top-k window —
    * |corpus|×|queries| triples is the exact-join cost floor. At larger
    * query batches or corpora, [[knnJoinIvf]] prunes candidates by cell
    * before scoring. Self pairs (query id = corpus id) are excluded. */
  def knnJoinExact(corpus: DataFrame, idCol: String, vecCol: String,
                   queries: DataFrame, qIdCol: String, qVecCol: String,
                   k: Int): DataFrame = {
    val qs = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col(idCol))
    corpus.crossJoin(broadcast(qs))
      .where(col("q_id") =!= col(idCol))
      .select(col("q_id"), col(idCol),
        round(cosine(col(vecCol), col("q_vec")), 3).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
  }

  /** k-NN majority-vote classification: each query vector takes the
    * modal label of its k nearest LABELED corpus neighbours (ties →
    * smallest label) — the retrieval-based labeling step that bootstraps
    * quality/domain classifiers from a small labeled seed set. Built on
    * [[knnJoinExact]], so the corpus scan is map-only against the
    * broadcast query batch and only (q_id, id, score) triples shuffle;
    * the label join adds one narrow (id, label) side. Returns
    * (q_id, pred_label, votes). */
  def knnClassify(corpus: DataFrame, idCol: String, vecCol: String,
                  labelCol: String, queries: DataFrame, qIdCol: String,
                  qVecCol: String, k: Int): DataFrame = {
    val nn = knnJoinExact(corpus.select(col(idCol), col(vecCol)), idCol,
      vecCol, queries, qIdCol, qVecCol, k)
    val wv = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("__lab"))
    nn.join(corpus.select(col(idCol), col(labelCol).as("__lab")), idCol)
      .groupBy(col("q_id"), col("__lab"))
      .agg(count(lit(1)).cast("int").as("votes"))
      .withColumn("__rn", row_number().over(wv))
      .where(col("__rn") === 1)
      .select(col("q_id"), col("__lab").as("pred_label"), col("votes"))
  }

  /** IVF-pruned k-NN join: corpus rows are assigned to quantizer cells
    * once (broadcast argmin, map-only — same assignment as [[ivfTopK]]);
    * each query probes only its `probes` nearest cells, so the scored
    * candidate set shrinks to ~probes/nCells of the corpus before the
    * per-query top-k window. This is the scale path for batch retrieval:
    * at 100 TB the assigned table is written partitioned by cell and a
    * query batch touches only its probed partitions. Deterministic like
    * the single-query variants (ties by cell id, then corpus id). */
  def knnJoinIvf(corpus: DataFrame, idCol: String, vecCol: String,
                 quantizerCol: String, queries: DataFrame, qIdCol: String,
                 qVecCol: String, k: Int, probes: Int): DataFrame = {
    val cvecs = centroids(corpus, quantizerCol, vecCol)
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("sm"))
      .select(col("label").as("cell"),
        transform(col("sm"), s => s.getField("mean")).as("cvec"))

    val assigned = corpus.select(col(idCol), col(vecCol))
      .withColumn("cell", cellOf(col(vecCol), collectCents(cvecs)))

    val qs = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"))
    val wp = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("cell"))
    val probeCells = qs.crossJoin(broadcast(cvecs))
      .select(col("q_id"), col("q_vec"), col("cell"),
        sqDist(col("q_vec"), col("cvec")).as("dist"))
      .withColumn("rn", row_number().over(wp))
      .where(col("rn") <= probes)
      .select(col("q_id"), col("q_vec"), col("cell"))

    val wk = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col(idCol))
    assigned.join(broadcast(probeCells), "cell")
      .where(col("q_id") =!= col(idCol))
      .select(col("q_id"), col(idCol),
        round(cosine(col(vecCol), col("q_vec")), 3).as("cosine"))
      .withColumn("rank", row_number().over(wk).cast("int"))
      .where(col("rank") <= k)
  }

  /** Top principal component of an embedding column by power iteration,
    * in fixed point — the deterministic distributed-linear-algebra core a
    * PCA-whitening / dominant-direction-removal stage needs.
    *
    * Every corpus-level summation is an exact integer sum, so the result
    * is bit-identical at any partitioning and the oracle replays it in
    * SQL:
    *   1. embeddings quantize to 1e-6 units (`round(x·1e6)` longs);
    *   2. the per-dim mean is the integer dim-sum divided once, re-rounded
    *      to the same grid; centering stays integer;
    *   3. each power step scores rows s_i = c_i·v (a per-row left-fold in
    *      index order — deterministic doubles), accumulates
    *      u_j = Σ_i round(c_ij·s_i) as LONGS, and renormalizes v on the
    *      driver from the 64 collected u_j (the bounded k×dim collect
    *      pattern every k-means stage here uses);
    *   4. the published per-vector projection is one fold + one division.
    *
    * Magnitude contract: |c_ij| ≤ 1e6·max|x|, |s_i| ≤ dim·max|c·v| — with
    * unit-scale embeddings the per-row contribution is ~1e11..1e12, so the
    * long accumulator holds ~1e6 rows per partial before overflow could
    * matter at extreme corpus sizes; rescale the quantization grid (1e-4)
    * for >1e9-row corpora.
    *
    * @return (vec_id, pc1) — the centered projection on the unit
    *         component, rounded to 6 dp in the embedding's original scale. */
  def topComponentProjection(df: DataFrame, idCol: String, vecCol: String,
                             iters: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val q = df.select(col(idCol).as("id"),
        transform(dbl(col(vecCol)), x => round(x * 1e6).cast("long")).as("xq"))
      .persistTracked() // feeds the mean pass + every power step; caller clearCache
    val n = q.count()
    require(n > 0, "topComponentProjection needs a non-empty corpus")
    val dim = q.select(size(col("xq"))).head().getInt(0)
    // dim partial-sum COLUMNS instead of a posexplode + dim-keyed shuffle:
    // map-side combine reduces every partition to one dim-long row, so the
    // exchange carries partitions×dim longs (the MinHash partial-agg trick)
    val dimSums = {
      val r = q.select((0 until dim).map(j =>
        sum(element_at(col("xq"), j + 1)).as(s"s$j")): _*).head()
      (0 until dim).map(j => r.getLong(j))
    }
    // HALF_UP (away from zero), NOT math.round (toward +inf): this is the
    // convention Spark's round() and DuckDB's round() share, so the oracle
    // replays the mean bit-for-bit
    val meanq = dimSums.map { s =>
      BigDecimal(s.toDouble / n)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }
    val centered = q.select(col("id"),
      zip_with(col("xq"), typedLit(meanq.toSeq), (x, m) => x - m).as("c"))

    // v0: the unit all-ones direction on the 6-dp grid (deterministic and
    // generically non-orthogonal to the top component)
    var v: Seq[Double] = Seq.fill(dim)(
      BigDecimal(1.0 / math.sqrt(dim.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    for (_ <- 1 to iters) {
      val s = aggregate(zip_with(col("c"), typedLit(v),
        (c, vj) => c.cast("double") * vj), lit(0.0), (acc, x) => acc + x)
      // s lives in a real column so the dim accumulator columns reference
      // it without re-evaluating the fold (CollapseProject keeps
      // multiply-referenced aliases materialized); one aggregation row
      // comes back — no explode, no dim-keyed exchange
      val u = {
        val r = centered.withColumn("s", s)
          .select((0 until dim).map(j =>
            sum(round(element_at(col("c"), j + 1).cast("double") * col("s"))
              .cast("long")).as(s"u$j")): _*).head()
        (0 until dim).map(j => r.getLong(j))
      }
      // norm in fixed index order — 64 terms, deterministic double fold.
      // A zero-variance corpus (or a v exactly orthogonal to the data)
      // yields u = 0: keep the previous direction instead of dividing by
      // zero — the projection is identically 0 either way.
      val norm = math.sqrt(u.foldLeft(0.0)((acc, uj) => acc + uj.toDouble * uj.toDouble))
      if (norm > 0.0)
        v = u.map(uj => BigDecimal(uj.toDouble / norm)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toSeq
    }
    val proj = aggregate(zip_with(col("c"), typedLit(v),
      (c, vj) => c.cast("double") * vj), lit(0.0), (acc, x) => acc + x)
    centered.select(col("id").as(idCol),
      round(proj / 1e6, 6).as("pc1"))
  }

  /** Per-query-group ranked neighbours (window form): given a candidates
    * DataFrame of (queryId, candId, score), keep the top-k per query. The
    * window partitions by query so the sort is per-group, not global. */
  def topKPerQuery(scored: DataFrame, queryCol: String, scoreCol: String,
                   k: Int): DataFrame = {
    val w = Window.partitionBy(col(queryCol)).orderBy(col(scoreCol).desc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
