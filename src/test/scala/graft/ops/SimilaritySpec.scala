package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Recall characterization for the approximate-NN operators.
  *
  * The oracle queries (`x_ann_*`) pin bit-exact parameter choices so the
  * DuckDB replay matches hash-for-hash; THIS suite instead runs the
  * operators with production-shaped parameters and asserts they reach a
  * usable recall floor against the exact scan — the property a user of
  * the ANN path actually cares about. The synthetic embeddings are
  * near-uniform (rank-1 cosine ≈ 0.37 vs rank-100 ≈ 0.11, heavy
  * near-ties), which makes these floors conservative for real corpora
  * with cluster structure.
  */
class SimilaritySpec extends SparkSuite {

  test("topComponentProjection matches an exact in-memory fixed-point reference") {
    val df = spark.read.parquet(s"$sf0/embeddings.parquet")
    val vecs = df.select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val n = vecs.length
    val dim = vecs.head._2.length
    def half(x: Double, scale: Int): Double =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xq = vecs.map { case (id, v) =>
      id -> v.map(x => half(x * 1e6, 0).toLong) }
    val meanq = (0 until dim).map { j =>
      val s = xq.map(_._2(j)).sum
      BigDecimal(s.toDouble / n).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val c = xq.map { case (id, v) =>
      id -> v.zipWithIndex.map { case (x, j) => x - meanq(j) } }
    var v = Array.fill(dim)(half(1.0 / math.sqrt(dim.toDouble), 6))
    for (_ <- 1 to 4) {
      val u = Array.fill(dim)(0L)
      c.foreach { case (_, ci) =>
        val s = ci.zipWithIndex.foldLeft(0.0) { case (acc, (cj, j)) =>
          acc + cj.toDouble * v(j) }
        (0 until dim).foreach { j => u(j) += half(ci(j).toDouble * s, 0).toLong }
      }
      val norm = math.sqrt(u.foldLeft(0.0)((a, uj) => a + uj.toDouble * uj.toDouble))
      v = u.map(uj => half(uj.toDouble / norm, 6))
    }
    val want = c.map { case (id, ci) =>
      val s = ci.zipWithIndex.foldLeft(0.0) { case (acc, (cj, j)) =>
        acc + cj.toDouble * v(j) }
      id -> half(s / 1e6, 6)
    }.toMap
    val got = Similarity.topComponentProjection(df, "vec_id", "embedding", 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == n)
    want.foreach { case (id, exp) => assert(got(id) == exp, s"vec $id") }
    // and the projection genuinely varies (a degenerate all-equal output
    // would also "match" a broken reference)
    assert(got.values.toSet.size > 10)
  }

  test("topComponentProjection is independent of physical layout") {
    val df = spark.read.parquet(s"$sf0/embeddings.parquet")
    val a = Similarity.topComponentProjection(df, "vec_id", "embedding", 2)
      .orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
    val b = Similarity.topComponentProjection(df.repartition(11), "vec_id", "embedding", 2)
      .orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf1)

  /** Exact L2 top-k ids (the ground truth PQ's asymmetric distance
    * approximates). */
  private def exactL2Top(k: Int, queryId: Long = 0L): Set[Long] = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qv"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        Similarity.sqDist(col("embedding"), col("qv")).as("d"))
      .orderBy(col("d"), col("vec_id"))
      .limit(k)
      .select("vec_id").as[Long].collect().toSet
  }

  /** Exact cosine top-k ids (ground truth for the cosine-scored paths). */
  private def exactCosineTop(k: Int, queryId: Long = 0L): Set[Long] =
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", queryId, k)
      .select("vec_id").as[Long].collect().toSet

  test("semanticDedup drops the larger id of semantically-identical vectors") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)),
      (4L, Array(1f, 0f, 0f, 0f))) // semantic duplicate of id 1
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      k = 2, iters = 1, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    // identical vectors always co-cluster; smaller id wins
    assert(kept === Set(1L, 2L, 3L))
  }

  test("PQ with production-shaped codebooks reaches useful L2 recall") {
    // m=8 subspaces x k=16 codes = 16^8 possible codes (vs the oracle
    // query's deliberately tiny bit-exact m=2 x k=4 = 16 codes)
    val got = Similarity.pqTopK(emb, "vec_id", "embedding", queryId = 0L,
        kNeighbors = 10, m = 8, subDim = 8, k = 16, iters = 2)
      .select("vec_id").as[Long].collect().toSet
    val r10 = (got & exactL2Top(10)).size / 10.0
    val r100 = (got & exactL2Top(100)).size / 10.0
    info(s"pq m=8 k=16: recall@10=$r10 within-top100=$r100")
    assert(r100 >= 0.5, s"PQ candidates should mostly be true near neighbours ($r100)")
  }

  test("multi-probe IVF recall dominates single-probe") {
    val single = Similarity.ivfTopKMultiProbe(emb, "vec_id", "embedding",
        "label", queryId = 0L, k = 10, probes = 1)
      .select("vec_id").as[Long].collect().toSet
    val multi = Similarity.ivfTopKMultiProbe(emb, "vec_id", "embedding",
        "label", queryId = 0L, k = 10, probes = 4)
      .select("vec_id").as[Long].collect().toSet
    val t10 = exactCosineTop(10)
    val t100 = exactCosineTop(100)
    info(s"ivf probes=1: recall@10=${(single & t10).size / 10.0}; " +
      s"probes=4: recall@10=${(multi & t10).size / 10.0}")
    assert((multi & t10).size >= (single & t10).size,
      "probing more cells must not lose recall")
    assert((multi & t100).size >= 9,
      "multi-probe candidates should be true near neighbours")
  }

  test("multi-probe LSH recall dominates single-probe") {
    val single = Similarity.lshTopK(emb, "vec_id", "embedding",
        queryId = 0L, k = 10, nPlanes = 4)
      .select("vec_id").as[Long].collect().toSet
    val multi = Similarity.lshTopKProbe(emb, "vec_id", "embedding",
        queryId = 0L, k = 10, nPlanes = 4)
      .select("vec_id").as[Long].collect().toSet
    val t10 = exactCosineTop(10)
    info(s"lsh single: recall@10=${(single & t10).size / 10.0}; " +
      s"probe=Hamming<=1: recall@10=${(multi & t10).size / 10.0}")
    // the probe set strictly contains the single bucket, so the candidate
    // pool is a superset and top-k recall can only grow
    assert((multi & t10).size >= (single & t10).size,
      "probing flipped-bit buckets must not lose recall")
    assert(multi.size === 10, "probed pool must fill the full top-k")
  }

  test("IVF knn join recall vs the exact knn join, per query") {
    val queries = emb.where(col("vec_id") % 500 === 0) // a 13-query batch at sf0.01
    val exact = Similarity.knnJoinExact(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.knnJoinIvf(emb, "vec_id", "embedding", "label",
        queries, "vec_id", "embedding", k = 10, probes = 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.keySet === exact.keySet, "every query must get results")
    val recalls = exact.map { case (q, t) => (ivf(q) & t).size / 10.0 }
    val mean = recalls.sum / recalls.size
    info(f"knn-join IVF probes=3 mean recall@10 = $mean%.2f over ${recalls.size} queries")
    // near-uniform synthetic vectors: 3/8 cells probed must find a clear
    // share of true neighbours on average, and never come back empty
    assert(mean >= 0.3, f"mean recall collapsed: $mean%.2f")
    assert(ivf.values.forall(_.nonEmpty))
  }

  test("IVF-PQ rerank funnel: exact rerank recovers what ADC ranking loses") {
    // production-shaped funnel: 4/8 probed cells, PQ m=8 x k=16 shortlist
    // of 100, exact cosine on the shortlist only
    val funnel = Similarity.annRerank(emb, "vec_id", "embedding", "label",
        queryId = 0L, k = 10, probes = 4, shortlist = 100,
        m = 8, subDim = 8, pqK = 16, iters = 2)
      .select("vec_id").as[Long].collect().toSet
    // same candidate budget, but ranked by raw ADC with no exact re-rank:
    // PQ top-10 restricted to nothing (corpus-wide) — the no-rerank baseline
    val adcOnly = Similarity.pqTopK(emb, "vec_id", "embedding", queryId = 0L,
        kNeighbors = 10, m = 8, subDim = 8, k = 16, iters = 2)
      .select("vec_id").as[Long].collect().toSet
    val t10 = exactCosineTop(10)
    val funnelR = (funnel & t10).size / 10.0
    val adcR = (adcOnly & t10).size / 10.0
    info(f"funnel recall@10=$funnelR%.2f vs ADC-only $adcR%.2f")
    assert(funnel.size === 10, "funnel must fill the full top-k")
    // the exact re-rank stage must not LOSE cosine recall vs pure ADC
    // ranking at the same index parameters
    assert(funnelR >= adcR, f"re-rank regressed recall: $funnelR%.2f < $adcR%.2f")
    assert(funnelR >= 0.4, f"funnel recall collapsed: $funnelR%.2f")
  }

  test("allPairsCosine equals the naive group self-join exactly") {
    val docs = Tables.documents(spark, sf1).limit(120)
      .select(col("doc_id"), col("lang"),
        graft.ops.Multimodal.featureStub(col("text").cast("binary"), 8).as("v"))
    val naive = {
      val a = docs.select(col("lang"), col("doc_id").as("id_a"), col("v").as("va"))
      val b = docs.select(col("lang"), col("doc_id").as("id_b"), col("v").as("vb"))
      a.join(b, Seq("lang")).where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Similarity.cosine(col("va"), col("vb")), 9).as("c"))
    }.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Similarity
      .allPairsCosine(docs, "doc_id", "v", Seq("lang"), blocks = 5)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 9).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // triangle block decomposition must emit exactly the same canonical
    // pair set — every unordered pair once, bitwise-equal cosine (dot and
    // norm products are commutative, so the swapped orientation is safe)
    assert(blocked === naive)
    assert(blocked.nonEmpty)
  }

  test("allPairsCosineAuto derives blocks from the largest group, same pairs") {
    val docs = Tables.documents(spark, sf1).limit(120)
      .select(col("doc_id"), col("lang"),
        graft.ops.Multimodal.featureStub(col("text").cast("binary"), 8).as("v"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id_a"), col("id_b"), round(col("cosine"), 9).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fixed = pairs(Similarity.allPairsCosine(docs, "doc_id", "v", Seq("lang"), 5))
    // tiny target → more blocks than any group has rows; still exact
    val fine = pairs(Similarity.allPairsCosineAuto(docs, "doc_id", "v", Seq("lang"), 7))
    // huge target → collapses to 1 block (the naive self-join); still exact
    val coarse = pairs(Similarity.allPairsCosineAuto(docs, "doc_id", "v", Seq("lang"), 1 << 20))
    assert(fine === fixed)
    assert(coarse === fixed)
    assert(fixed.nonEmpty)
  }

  test("standardize whitens each dim; zero-variance dims yield z = 0") {
    val vecs = Seq(
      (1L, Array(1.0, 5.0, 7.0)), (2L, Array(2.0, 5.0, 9.0)),
      (3L, Array(3.0, 5.0, 14.0))).toDF("id", "v")
    val z = Similarity.standardize(vecs, "id", "v")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    // dim 0: mean 2, stddev_pop sqrt(2/3); z published in 1e-4 micro-units
    val s0 = math.sqrt(2.0 / 3.0)
    assert(z((1L, 0)) === math.rint(-1.0 / s0 * 1e4).toLong)
    assert(z((2L, 0)) === 0L)
    // dim 1 is constant → zero variance → z pinned to 0, no NaN/Inf
    assert(Seq(1L, 2L, 3L).forall(i => z((i, 1)) === 0L))
    // per-dim means of z are ~0 (whitened); micro-unit scale → < 10 units
    val m2 = (z((1L, 2)) + z((2L, 2)) + z((3L, 2))) / 3.0
    assert(math.abs(m2) < 10)
    // the published column is integral — no double (hence no −0.0 / no
    // half-up decimal boundary) ever reaches a cross-engine hash
    assert(Similarity.standardize(vecs, "id", "v").schema("z_micro")
      .dataType.typeName === "long")
  }

  test("knnGraph matches per-cell brute force and flags mutual edges") {
    val vecs = Tables.embeddings(spark, sf0).limit(60)
    val got = Similarity.knnGraph(vecs, "vec_id", "embedding", "label", k = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getInt(3), r.getBoolean(4)))).toMap
    val rows = vecs.select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), String.valueOf(r.get(1)),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na * nb == 0) 0.0 else dot / (na * nb)
    }
    val want = rows.flatMap { case (id, cell, v) =>
      rows.filter(o => o._2 == cell && o._1 != id)
        .map(o => (o._1, math.rint(cos(v, o._3) * 1e4) / 1e4))
        .sortBy { case (nid, c) => (-c, nid) }.take(2).zipWithIndex
        .map { case ((nid, c), i) => (id, nid, c, i + 1) }
    }
    assert(got.size === want.length)
    want.foreach { case (s, n, c, r) =>
      val (gc, gr, mutual) = got((s, n))
      assert(gc === c && gr === r, s"edge ($s,$n)")
      assert(mutual === want.exists(w => w._1 == n && w._2 == s),
        s"mutual flag ($s,$n)")
    }
  }

  test("knnGraph adaptive blocking is exact under a dominant cell") {
    // skew shape that drove the 9.9x sf1 wall before blocking: 80% of
    // rows share one cell; fine blocks (tiny target -> many sub-blocks
    // in the big cell) must emit the identical graph as coarse blocks
    // (huge target -> the kmin floor only)
    val vecs = Tables.embeddings(spark, sf0).limit(100)
      .withColumn("cell", when(col("vec_id") % 5 =!= 0, lit("big"))
        .otherwise(pmod(col("vec_id"), lit(3)).cast("string")))
    def edges(t: Int) = Similarity
      .knnGraph(vecs, "vec_id", "embedding", "cell", k = 3, targetBlockRows = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getBoolean(4))).toSet
    val fine = edges(4)
    val coarse = edges(1 << 20)
    assert(fine === coarse)
    assert(fine.nonEmpty)
  }

  test("semanticDedup adaptive blocking is exact across block granularities") {
    val vecs = Tables.embeddings(spark, sf0).limit(120)
    def kept(t: Int) = Similarity
      .semanticDedup(vecs, "vec_id", "embedding", k = 4, iters = 2,
        threshold = 0.35, targetBlockRows = t)
      .collect().map(r => (r.getLong(0), String.valueOf(r.get(1)))).toSet
    val fine = kept(4)
    val coarse = kept(1 << 20)
    assert(fine === coarse)
    assert(fine.nonEmpty)
  }

  test("randomProject matches a by-hand md5-parity projection") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(k: Int, d: Int): Double = {
      val h = md.digest(s"rp:$k:$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
    }
    val dim = 5
    val vecs = Seq((1L, Array(1.0f, 2.0f, -1.0f, 0.5f, 3.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f, 0.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.randomProject(df, "vec_id", "embedding",
        outDim = 3, inDim = dim)
      .as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size === 6)
    for ((id, v) <- vecs; k <- 0 until 3) {
      val want = (0 until dim).map(d => v(d).toDouble * sign(k, d)).sum
      assert(math.abs(got((id, k)) - math.rint(want * 1e4) / 1e4) < 1e-9,
        s"vec $id dim $k")
    }
    // the matrix is non-trivial: not all signs equal for k=0
    val s0 = (0 until dim).map(d => sign(0, d)).toSet
    assert(s0.size === 2 || dim < 4)
  }

  test("centroidsMicro: exact integer means, partition-invariant, zero unsigned") {
    // values chosen so one group's true mean is a tiny NEGATIVE number
    // that a float avg + round would emit as -0.0 on some engines — the
    // fixed-point path must yield exactly 0L, and the same bits at any
    // partitioning
    val rows = Seq(
      ("a", Array(1.0f, -1e-9f)), ("a", Array(3.0f, 1e-9f)),
      ("a", Array(2.0f, -1e-9f)),
      ("b", Array(-0.5f, 2.5f))).toDF("label", "embedding")
    val got = Similarity.centroidsMicro(rows, "label", "embedding")
      .as[(String, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", 0)) === 20000L) // mean 2.0 in 1e-4 units
    assert(got(("a", 1)) === 0L)     // tiny negative mean -> plain 0, no sign
    assert(got(("b", 0)) === -5000L && got(("b", 1)) === 25000L)
    val again = Similarity.centroidsMicro(rows.repartition(7), "label", "embedding")
      .as[(String, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(again === got)
  }

  test("semanticDecontaminate equals brute-force max-cosine screen") {
    val train = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // exact dup of eval e1
      (2L, Array(0.9f, 0.1f, 0.0f)),   // near e1
      (3L, Array(0.0f, 0.0f, 1.0f)),   // far from both
      (4L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding") // zero vec
    val eval = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (200L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontaminate(
        train, "vec_id", "embedding", eval, "embedding", threshold = 0.95)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      if (na * nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val evs = Seq(Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))
    for ((id, v) <- Seq(1L -> Array(1.0f, 0f, 0f), 2L -> Array(0.9f, 0.1f, 0f),
        3L -> Array(0f, 0f, 1.0f), 4L -> Array(0f, 0f, 0f))) {
      val cs = evs.map(e => cos(v, e))
      val (m, n, c) = got(id)
      assert(m === math.round(cs.max * 1e6), s"max_cos vec $id")
      assert(n === cs.count(_ >= 0.95).toLong && c === (n > 0), s"n_close vec $id")
    }
    // eval-order independence: reversed eval rows give identical bits
    val rev = Similarity.semanticDecontaminate(
        train, "vec_id", "embedding",
        eval.orderBy(col("vec_id").desc), "embedding", threshold = 0.95)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(rev === got)
    // oversized eval set fails loudly, naming the escape hatch
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(train, "vec_id", "embedding",
        eval, "embedding", threshold = 0.5, maxEval = 1)
    }
    assert(e.getMessage.contains("broadcast-join"), e.getMessage)
  }

  test("randomProject fails loudly on a dimension mismatch") {
    // a 6-wide vector against inDim=5 would silently read past the sign
    // row (and NULL on the oracle side) — the guard must raise instead
    val df = Seq((1L, Array.fill(6)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.randomProject(df, "vec_id", "embedding",
        outDim = 2, inDim = 5).collect()
    }
    assert(e.getMessage.contains("randomProject expects 5-dim"), e.getMessage)
  }

  test("allPairsCosine diagonal blocks drop self-pairs and duplicates") {
    val tiny = Seq((1L, "x", Array(1.0, 0.0)), (2L, "x", Array(1.0, 0.0)),
      (3L, "x", Array(0.0, 1.0)), (4L, "y", Array(1.0, 1.0)))
      .toDF("id", "g", "v")
    val got = Similarity.allPairsCosine(tiny, "id", "v", Seq("g"), blocks = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      .sortBy(p => (p._1, p._2))
    // group x: pairs (1,2)=1.0, (1,3)=0.0, (2,3)=0.0; group y: no pair
    assert(got.map(p => (p._1, p._2)) === List((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.head._3 === 1.0)
  }
}
