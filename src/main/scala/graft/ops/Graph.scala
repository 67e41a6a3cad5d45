package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Caches.TrackedPersist

/** Link-graph analysis over a document corpus — the web-graph signals a
  * training-data pipeline derives before/alongside text quality (link-based
  * spam scoring, crawl prioritization, host authority weighting).
  *
  * The corpus tables carry no explicit link column, so the graph is
  * DERIVED deterministically: each document emits `outDeg` links whose
  * targets are md5-derived from (id, link index) — the same
  * hash-everything-into-position discipline the sampling/split operators
  * use, so the oracle replays every edge exactly.
  *
  * Scale design: edges are a map-only projection of the corpus (never
  * materialized wider than (src, dst) longs). Each PageRank iteration is
  * two compact shuffles — the rank table keyed by src into the edge join,
  * then (dst, contribution) pairs into the per-dst aggregation. Rank mass
  * is integer FIXED POINT (micro-units of 1e-12 of total mass): integer
  * sums are order- and partitioning-independent, so the result is
  * bit-deterministic across engines and cluster layouts — the same
  * discipline as [[TextOps]]'s fixed-point classifier training. The edge
  * table is persisted once and reused by all iterations.
  */
object Graph {

  /** Total rank mass in fixed-point units (1e12 = 1.0). */
  val T: Long = 1000000000000L

  /** Deterministic derived edge list: src -> h32(src ":" j) mod n for
    * j in 1..outDeg. Self-loops and duplicate targets are kept (they are
    * well-defined under PageRank and keep every out-degree exactly
    * `outDeg`, which in turn keeps the per-edge contribution an exact
    * integer division).
    *
    * ID CONTRACT: targets land in [0, n), so the doc ids must be exactly
    * the dense range 0..n-1 — with sparse or offset ids every edge points
    * at a phantom node, pagerank collapses to the bare teleport term and
    * hits normalizes against mass no real node holds. Densify ids first
    * (`row_number() - 1`) if the corpus doesn't ship them that way. */
  def deriveEdges(docs: DataFrame, idCol: String, outDeg: Int, n: Long): DataFrame = {
    // sequence(1, 0) DESCENDS, emitting [1, 0] — two phantom edges per doc
    require(outDeg >= 1, s"outDeg must be >= 1, got $outDeg")
    docs.select(col(idCol).cast("long").as("src"))
      .withColumn("j", explode(sequence(lit(1), lit(outDeg))))
      .select(col("src"),
        pmod(Dedup.h32(concat(col("src").cast("string"), lit(":"),
          col("j").cast("string"))), lit(n)).as("dst"))
  }

  /** Fixed-point PageRank with damping 0.85 over the derived link graph.
    *
    * r_{t+1}(v) = (15·T)/(100·n)  +  (85 · Σ_{u→v} r_t(u) div outDeg) div 100
    *
    * All arithmetic is integer (div = truncating division on non-negative
    * longs, identical to DuckDB's `//`), so distributed summation order
    * cannot perturb a single bit. Rank mass is conserved up to the
    * truncation loss of the integer divisions (bounded by n·(outDeg+1)
    * units per iteration — asserted in GraphSpec).
    *
    * Per iteration: one shuffle of the n-row rank table into the edge
    * join (edges pre-partitioned by src, so only ranks move), one shuffle
    * of (dst, contrib) longs into the aggregation. The corpus text never
    * enters the plan. n reaches the driver as one scalar (bounded
    * metadata). */
  def pagerank(docs: DataFrame, idCol: String, outDeg: Int = 3,
               iters: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    val ids = docs.select(col(idCol).cast("long").as("id"))
    val n = ids.count()
    require(n > 0, "pagerank needs a non-empty corpus")
    val edges = deriveEdges(docs, idCol, outDeg, n)
      .repartition(col("src")).persistTracked()
    val base = (15L * T) / (100L * n)
    var ranks = ids.withColumn("r", lit(T / n))
    for (_ <- 1 to iters) {
      val contrib = edges.join(ranks, edges("src") === ranks("id"))
        .select(col("dst"), expr(s"r DIV $outDeg").as("c"))
      val incoming = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = ids.join(incoming, ids("id") === incoming("dst"), "left")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) DIV 100")).as("r"))
    }
    // no round(): r < 2^53 is exact as a double and 1e12 is a power-of-ten
    // double, so the single IEEE division is bit-identical cross-engine —
    // rounding would only reintroduce a half-way-convention risk
    ranks.select(col("id").as(idCol), col("r").as("rank_micro"),
      (col("r") / lit(T.toDouble)).as("pagerank"))
  }

  /** Fixed-point scale for HITS (1e9 = 1.0 — nano-units; smaller than
    * PageRank's [[T]] because the L1 renormalization multiplies a score
    * (≤ scale) by the scale before dividing, and 1e9·1e9 = 1e18 still
    * fits a signed long). */
  val TH: Long = 1000000000L

  /** Fixed-point HITS (hubs & authorities) over the derived link graph —
    * the second classic web-graph signal next to [[pagerank]]: authority
    * = endorsed by good hubs (in-link quality), hub = points at good
    * authorities (out-link quality). Each iteration:
    *
    *   a(v) = Σ_{u→v} h(u)  then L1-normalize to [[TH]]
    *   h(u) = Σ_{u→v} a(v)  then L1-normalize to [[TH]]
    *
    * L1 (sum) normalization instead of the textbook L2: it keeps every
    * step INTEGER (`s·TH div Σs` — truncating division on non-negative
    * longs, identical to DuckDB's `//`), so the result is
    * bit-deterministic across engines and layouts, the same discipline as
    * [[pagerank]]. Rankings are unaffected (normalization is monotone).
    *
    * Scale: per iteration two compact shuffles (score table into the
    * src-/dst-keyed edge join, then (node, sum) pairs into the
    * aggregation); the normalizer is ONE aggregated row broadcast back.
    * Returns (idCol, hub_nano, auth_nano, hub, authority). */
  def hits(docs: DataFrame, idCol: String, outDeg: Int = 3,
           iters: Int = 3): DataFrame = {
    require(iters >= 1, s"hits needs iters >= 1, got $iters (auth scores " +
      "only exist after a half-step)")
    val ids = docs.select(col(idCol).cast("long").as("id"))
    val n = ids.count()
    require(n > 0, "hits needs a non-empty corpus")
    val edges = deriveEdges(docs, idCol, outDeg, n)
      .repartition(col("src")).persistTracked()
    var hub = ids.withColumn("h", lit(TH / n))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = edges.join(hub, edges("src") === hub("id"))
        .groupBy(col("dst")).agg(sum(col("h")).as("s"))
      val aTot = aRaw.agg(coalesce(sum(col("s")), lit(0L)).as("t"))
      auth = ids.join(aRaw, ids("id") === aRaw("dst"), "left")
        .crossJoin(broadcast(aTot))
        .select(ids("id").as("id"),
          expr(s"coalesce(s, 0) * $TH DIV greatest(t, 1)").as("a"))
      val hRaw = edges.join(auth, edges("dst") === auth("id"))
        .groupBy(col("src")).agg(sum(col("a")).as("s"))
      val hTot = hRaw.agg(coalesce(sum(col("s")), lit(0L)).as("t"))
      hub = ids.join(hRaw, ids("id") === hRaw("src"), "left")
        .crossJoin(broadcast(hTot))
        .select(ids("id").as("id"),
          expr(s"coalesce(s, 0) * $TH DIV greatest(t, 1)").as("h"))
    }
    hub.join(auth, Seq("id"))
      .select(col("id").as(idCol), col("h").as("hub_nano"),
        col("a").as("auth_nano"),
        (col("h") / lit(TH.toDouble)).as("hub"),
        (col("a") / lit(TH.toDouble)).as("authority"))
  }

  /** Link-spam composite: each document scored by the mean quality of its
    * IN-neighbors (who links to you matters more than what you say — the
    * neighborhood signal link-spam classifiers lean on).
    *
    * Determinism: quality scores are 4-dp-rounded doubles, so they lift
    * EXACTLY into 1e-4 integer units; the per-target mean is an integer
    * sum divided once at the end — order-independent, oracle-replayable.
    * Scale: one (src → quality) join shuffling the n-row score table into
    * the src-partitioned edges, one (dst, micro-units) aggregation. */
  def neighborQuality(scored: DataFrame, idCol: String,
                      scoreCol: String, outDeg: Int = 3): DataFrame = {
    val ids = scored.select(col(idCol).cast("long").as("id"),
      round(col(scoreCol) * 10000).cast("long").as("q4"))
    val n = ids.count()
    val edges = deriveEdges(scored, idCol, outDeg, n)
    val inQ = edges.join(ids, edges("src") === ids("id"))
      .groupBy(col("dst"))
      .agg(sum(col("q4")).as("sq"), count(lit(1)).as("nin"))
    ids.join(inQ, ids("id") === inQ("dst"), "left")
      .select(col("id").as(idCol),
        (col("q4") / 10000.0).as("own_quality"),
        coalesce(col("nin"), lit(0L)).as("in_deg"),
        // the sum is an exact long; the two IEEE divisions after it are
        // replayed verbatim by the oracle
        when(col("nin").isNotNull,
          col("sq") / col("nin") / lit(10000.0)).as("neighbor_quality"))
  }

  /** Degree profile of the derived graph: per-node out/in degree and the
    * share of total rank-relevant mass arriving by edge count — one
    * aggregation over the (src, dst) pairs, joined back to the id spine
    * so zero-in-degree nodes keep a row. */
  def degrees(docs: DataFrame, idCol: String, outDeg: Int = 3): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("id"))
    val n = ids.count()
    val edges = deriveEdges(docs, idCol, outDeg, n)
    val inDeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("in_deg"))
    ids.join(inDeg, ids("id") === inDeg("dst"), "left")
      .select(col("id").as(idCol), lit(outDeg).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        (coalesce(col("in_deg"), lit(0L)) === 0).as("is_orphan"))
  }

  /** Triangle listing over the derived link graph — the clustering /
    * link-farm-density signal (a spam cluster's mutual-linking shows up
    * as triangle density far above a random graph's).
    *
    * Classic two-join edge-iterator shape: edges dedup to UNDIRECTED
    * low→high orientation (each triangle then exists in exactly one
    * orientation a<b<c, counted once), then (a,b)⋈(b,c) builds wedges
    * keyed on the shared node and (a,c) membership closes them — three
    * compact (long, long) shuffles, never a node fan-out beyond real
    * degrees. (At web scale the orientation would additionally order by
    * degree so high-degree hubs never anchor the wedge build; the
    * synthetic graph's degrees are ~uniform so id order suffices.) */
  def triangles(docs: DataFrame, idCol: String, outDeg: Int = 3): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("id"))
    val n = ids.count()
    require(n > 0, "triangles needs a non-empty corpus")
    val und = deriveEdges(docs, idCol, outDeg, n)
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val wedges = und.as("x")
      .join(und.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("a"), col("x.b").as("b"), col("y.b").as("c"))
    wedges.join(und.select(col("a").as("__za"), col("b").as("__zb")),
        col("a") === col("__za") && col("c") === col("__zb"))
      .select(col("a"), col("b"), col("c"))
  }
}
