package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Adversarial-input hardening: real crawls contain empty documents, null
  * text, and whitespace-only pages. Every corpus operator must process
  * such rows without crashing and with defensible semantics (a null/empty
  * doc has no tokens, no shingles, no pairs). */
class EdgeInputSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a normal document with several words here"),
    (2L, ""),                    // empty
    (3L, null.asInstanceOf[String]), // null text
    (4L, "   \t\n  "),           // whitespace-only
    (5L, "a normal document with several words here")) // dup of 1
    .toDF("doc_id", "text")

  test("quality, langid, logprob, and normalize survive null/empty text") {
    assert(TextOps.qualityScore(docs).count() === 5)
    assert(TextOps.langId(docs).count() === 5)
    // null/empty docs have no tokens → no logprob row (they drop out of
    // the explode), normal docs keep theirs
    val lp = TextOps.unigramLogProb(docs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(lp === Set(1L, 5L))
    val norm = docs.select($"doc_id", TextOps.normalize($"text").as("n"))
      .as[(Long, String)].collect().toMap
    assert(norm(4L) === "")
    assert(norm(3L) === null)
  }

  test("bm25, classifier and group sketches survive null/empty/matchless input") {
    // no document contains the query terms → empty result, no crash
    assert(TextOps.bm25(docs, "doc_id", Seq("zzz_absent_term")).count() === 0)
    // null/empty docs have no tokens → no classifier row; text docs score
    val cls = TextOps.hashedLinearScore(docs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(cls === Set(1L, 5L))
    // a group whose docs all have < n tokens contributes no shingles →
    // it has no signature and silently drops from the pairing
    val grouped = docs.withColumn("src",
      org.apache.spark.sql.functions.when(col("doc_id") <= 3, "a").otherwise("b"))
    val sim = Dedup.groupMinhashSim(grouped, "src", "text")
    assert(sim.count() === 1) // only the (a, b) pair, both have >=1 tokenful doc
    val shortOnly = Seq((1L, "x y", "s1"), (2L, "p q", "s2"))
      .toDF("doc_id", "text", "src")
    assert(Dedup.groupMinhashSim(shortOnly, "src", "text").count() === 0)
    // empty query batch → empty knn join
    val emb = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.knnJoinExact(emb, "vec_id", "embedding",
      emb.where(col("vec_id") < 0), "vec_id", "embedding", 5).count() === 0)
  }

  test("dedup families treat empty/whitespace docs as content groups, never crash") {
    // exact dedup: empty and whitespace are DIFFERENT byte content; null
    // text md5's to null → its own group
    val exact = Dedup.exact(docs.where($"text".isNotNull), "text", "doc_id")
    assert(exact.count() === 3) // {normal x2}, {empty}, {whitespace}
    // near-dup pipelines: zero-shingle docs are dropped before banding —
    // only the true dup pair of tokenful docs comes back
    val mh = Dedup.minhashLshPairs(docs.where($"text".isNotNull),
        "doc_id", "text", n = 3, k = 16, bands = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh === Set((1L, 5L)))
    val pf = Dedup.prefixJaccardPairs(docs.where($"text".isNotNull),
        "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pf === Set((1L, 5L)))
  }

  test("sampling and packing ops handle degenerate strata and zero tokens") {
    val capped = Sampling.capPerStratum(
      docs.withColumn("lang", org.apache.spark.sql.functions.lit("en")),
      "doc_id", "lang", cap = 100)
    assert(capped.count() === 5)
    // zero-token docs occupy zero budget but still get a chunk assignment
    val packed = Packing.packChunks(
      docs.select($"doc_id",
        TextOps.tokenCount(org.apache.spark.sql.functions
          .coalesce($"text", org.apache.spark.sql.functions.lit("")))
          .as("n_tokens")),
      "doc_id", "n_tokens", capacity = 8, blockSize = 2)
    assert(packed.count() === 5)
    val shuffled = Packing.shuffleOrder(docs.select("doc_id"), "doc_id", 2)
    assert(shuffled.select("shuffle_pos").as[Long].collect().sorted.toSeq ===
      (0L until 5L).toSeq)
  }

  test("chunking, winnowing, splitting and keep-best survive edge docs") {
    // null/empty/whitespace docs have no tokens → zero chunk rows; the
    // normal docs chunk (7 tokens, window 4 stride 3 → 2 chunks each)
    val chunks = TextOps.chunkWindows(docs, "doc_id", "text", 4, 3)
    assert(chunks.select("doc_id").as[Long].collect().toSet === Set(1L, 5L))
    assert(chunks.count() === 4)
    // docs shorter than k have no grams → no fingerprints, no crash;
    // the two identical docs share their whole fingerprint set
    val fps = TextOps.winnowFingerprints(docs, "doc_id", "text", 3, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    assert(fps.keySet === Set(1L, 5L))
    assert(fps(1L) === fps(5L))
    // null unit hashes like any value: every row still gets exactly one
    // split and the assignment stays total
    val split = Sampling.leakageSafeSplit(
      docs.withColumn("unit", col("text")), "unit",
      Seq("train" -> 0.9, "test" -> 0.1))
    assert(split.where(col("split").isNull).count() === 0)
    assert(split.count() === 5)
    // keep-best: null text normalizes to null (its own family), the two
    // identical docs collapse to the smaller id on rank tie
    val best = Dedup.keepBest(docs,
        TextOps.normalize(col("text")), org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.coalesce(col("text"),
            org.apache.spark.sql.functions.lit(""))), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(best.contains(1L) && !best.contains(5L))
  }

  test("round-5 operators survive null/empty/degenerate input") {
    // graph ops: id spine is the doc table — null/empty text irrelevant;
    // a 1-node graph self-links and keeps all mass
    val one = Seq((0L, "only")).toDF("doc_id", "text")
    val pr1 = Graph.pagerank(one, "doc_id", 3, 2).collect()
    assert(pr1.length === 1 && pr1.head.getLong(1) > 0)
    assert(Graph.degrees(docs, "doc_id", 3).count() === 5)
    // neighborQuality over docs incl. null text: quality scores exist for
    // every row (qualityScore is null-safe), means stay in range
    val nq = Graph.neighborQuality(
      TextOps.qualityScore(docs), "doc_id", "quality_score", 3)
    assert(nq.count() === 5)
    // containment: null/empty/whitespace docs have no shingles → no pairs
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.1, minShingles = 1)
    assert(cont.as[(Long, Long, Double, Int)].collect()
      .forall(p => Set(1L, 5L)(p._1) && Set(1L, 5L)(p._2)))
    // KS drift: a source whose docs are all null/empty still gets a row
    // (its scores quantize to a bucket, the ECDF is well-defined)
    val bySrc = docs.withColumn("source",
      org.apache.spark.sql.functions.when(col("doc_id") <= 3, "a").otherwise("b"))
    assert(TextOps.qualityDrift(bySrc, "source", 64).count() === 2)
    // BPE pairs: null/empty docs contribute nothing; single-char words drop
    assert(TextOps.bpePairCounts(
      Seq((1L, "a b c"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "text", 5).count() === 0)
    // interval coverage: empty input → empty output, no crash
    assert(Intervals.coverage(
      Seq.empty[(Long, Int, Int)].toDF("k", "s", "e"), Seq("k"), "s", "e")
      .count() === 0)
    // nearest join: left rows with no right rows at all → null payload
    val l = Seq((1L, 10L)).toDF("k", "ts")
    val r = Seq.empty[(Long, Long, Long)].toDF("k", "ts", "pay")
    val nj = AsofJoin.nearestJoin(l, r, Seq("k"), "ts", "ts", Map("pay" -> "pay"))
      .as[(Long, Long, Option[Long])].collect()
    assert(nj.toSeq === Seq((1L, 10L, None)))
    // scene cuts: empty payload → zero rows
    val mm = Seq((1L, "")).toDF("id", "t")
      .select(col("id"), col("t").cast("binary").as("payload"))
    assert(Multimodal.sceneCuts(mm, "id", "payload", 4).count() === 0)
    // PCA: constant embeddings → centered zeros; projection must be 0.0
    val const = Seq((0L, Array(1.0f, 1.0f)), (1L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val pca = Similarity.topComponentProjection(const, "vec_id", "embedding", 2)
      .as[(Long, Double)].collect().toMap
    assert(pca.values.forall(_ == 0.0))
  }

  test("curation operators survive null/empty/degenerate input") {
    // snapshot diff: presence is tracked by marker columns, so a null-text
    // doc present in both snapshots is UNCHANGED (null-safe digest
    // compare), never misread as removed/added via its null digest
    assert(Curation.snapshotDiff(docs, docs, "doc_id", "text").count() === 0)
    val edited = docs.withColumn("text",
      org.apache.spark.sql.functions.when(col("doc_id") === 1, "edited")
        .otherwise(col("text")))
    val diff = Curation.snapshotDiff(docs, edited, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(diff === Map(1L -> "changed"))
    // k-anonymity: null quasi values form their own class (SQL window
    // partition groups nulls together)
    val kan = Curation.kAnonymity(docs.withColumn("q",
        org.apache.spark.sql.functions.when(col("doc_id") <= 2, "x")),
      "doc_id", Seq("q"), k = 3)
    assert(kan.count() === 5)
    assert(kan.where(col("q").isNull).select("class_size")
      .as[Long].collect().toSet === Set(3L))
    // robust outliers: single-row group → dev2 = 0, mad4 = 0, not flagged
    val single = Seq((1L, "g", 42L)).toDF("id", "grp", "v")
    val ro = Curation.robustOutliers(single, "id", "v", "grp")
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    assert(ro.toSeq === Seq((1L, "g", 42L, 0L, 0L, false)))
    // curriculum: empty input → empty output; constant score still yields
    // a total order (id tie-break) with every rank/position assigned once
    assert(Curation.curriculumOrder(
      Seq.empty[(Long, Double)].toDF("doc_id", "s"), "doc_id", col("s"))
      .count() === 0)
    val flat = (0L until 12L).map((_, 0.5)).toDF("doc_id", "s")
    val co = Curation.curriculumOrder(flat, "doc_id", col("s"), stages = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(co.map(_._2).sorted.toSeq === (1L to 12L))
    assert(co.map(_._4).sorted.toSeq === (1L to 12L))
    // edit-distance pairs: null/empty/whitespace docs have no shingles →
    // only the real dup pair (1,5) at distance 0
    val ep = Dedup.editDistancePairs(docs, "doc_id", "text",
      prefixLen = 80, maxDist = 10, n = 3)
      .as[(Long, Long, Int)].collect()
    assert(ep.toSeq === Seq((1L, 5L, 0)))
    // knnClassify: query with no corpus → no vote rows
    val emb = Seq((0L, Array(1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    assert(Similarity.knnClassify(emb.where(col("vec_id") < 0), "vec_id",
      "embedding", "label", emb, "vec_id", "embedding", 3).count() === 0)
  }
}
