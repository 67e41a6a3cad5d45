package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  test("capPerStratum caps every stratum and is layout-independent") {
    val docs = (0L until 100L).map(i => (i, if (i % 4 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val got = Sampling.capPerStratum(docs, "doc_id", "lang", cap = 10)
    val byLang = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang === Map("de" -> 10L, "en" -> 10L))
    // the kept SET must not depend on the physical layout — re-partitioned
    // input selects the same ids (hash order, not arrival order)
    val again = Sampling.capPerStratum(docs.repartition(7), "doc_id", "lang", 10)
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq ===
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("capPerStratum keeps strata smaller than the cap intact") {
    val docs = Seq((1L, "rare"), (2L, "rare"), (3L, "big"), (4L, "big"),
      (5L, "big")).toDF("doc_id", "lang")
    val got = Sampling.capPerStratum(docs, "doc_id", "lang", cap = 2)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got === Map("rare" -> 2L, "big" -> 2L))
    val all = Sampling.capPerStratum(docs, "doc_id", "lang", cap = 10)
    assert(all.count() === 5L)
  }

  test("mixSample fills per-source quotas deterministically") {
    val docs = ((0L until 90L).map(i => (i, "big")) ++
      (90L until 100L).map(i => (i, "small"))).toDF("doc_id", "source")
    val got = Sampling.mixSample(docs, "doc_id", "source", totalTarget = 40L)
    val bySrc = got.groupBy("source").count().as[(String, Long)].collect().toMap
    // weights: big 0.75, small 0.25 → quotas 30 / 10 (small capped by its
    // own size; alpha=0.5 gave it 2.5x its proportional share)
    assert(bySrc === Map("big" -> 30L, "small" -> 10L))
    val again = Sampling.mixSample(docs.repartition(7), "doc_id", "source", 40L)
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq ===
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("tokenBudgetMix fills each source until its token budget crosses") {
    // one source → weight 1.0 → budget = totalTokens exactly
    val docs = (0L until 10L).map(i => (i, "only", 5L))
      .toDF("doc_id", "source", "n_tokens")
    val got = Sampling.tokenBudgetMix(docs, "doc_id", "source", "n_tokens",
      totalTokens = 12L)
    // ranks fill 5+5 = 10 < 12, third doc's prior 10 < 12 (crosses, kept),
    // fourth's prior 15 >= 12 (dropped)
    assert(got.count() === 3)
    // deterministic under re-layout
    val again = Sampling.tokenBudgetMix(docs.repartition(7), "doc_id",
      "source", "n_tokens", totalTokens = 12L)
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq ===
      again.select("doc_id").as[Long].collect().sorted.toSeq)
    // long-doc sources fill fewer documents than short-doc sources of the
    // same weight: equal doc counts → equal budgets, 10x token length →
    // ~10x fewer docs
    val mixed = ((0L until 50L).map(i => (i, "long", 100L)) ++
      (50L until 100L).map(i => (i, "short", 10L)))
      .toDF("doc_id", "source", "n_tokens")
    val m = Sampling.tokenBudgetMix(mixed, "doc_id", "source", "n_tokens",
      totalTokens = 2000L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(m("long") === 10L && m("short") === 50L)
  }

  test("mixtureWeights sums to 1 and upweights small sources vs proportional") {
    val docs = ((0L until 90L).map(i => (i, "big")) ++
      (90L until 100L).map(i => (i, "small"))).toDF("doc_id", "source")
    val w = Sampling.mixtureWeights(docs, "source")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-4)
    // alpha = 0.5: small source gets sqrt(10)/(sqrt(90)+sqrt(10)) = 0.25,
    // far above its 0.10 proportional share
    assert(w("small")._2 > 0.10 && math.abs(w("small")._2 - 0.25) < 1e-3)
    assert(math.abs(w("big")._2 - 0.75) < 1e-3)
  }

  test("dsirSelect ranks target-like raw docs above off-domain ones") {
    // target domain talks about spark queries; raw pool has 5 docs that
    // echo the domain and 45 about something else entirely
    val target = (0L until 20L).map(i =>
      (i, "tgt", s"spark query engine plan shuffle join number$i"))
    val likeTarget = (100L until 105L).map(i =>
      (i, "raw", s"spark query engine plan shuffle join number$i"))
    val offDomain = (105L until 150L).map(i =>
      (i, "raw", s"garden hose watering flowerbed lawn seed number$i"))
    val docs = (target ++ likeTarget ++ offDomain)
      .toDF("doc_id", "source", "text")
    val got = Sampling.dsirSelect(docs, "doc_id", col("source") === "tgt",
      buckets = 512, k = 5)
    // target docs never appear in the selection; the 5 winners are
    // exactly the 5 domain-echoing raw docs (weights dominate the noise)
    val ids = got.select("doc_id").as[Long].collect().toSet
    assert(ids === (100L until 105L).toSet)
    // deterministic across layouts: same selection from repartitioned input
    val again = Sampling.dsirSelect(docs.repartition(7), "doc_id",
      col("source") === "tgt", buckets = 512, k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(again === ids)
  }

  test("leakageSafeSplit never splits a unit and tracks its weights") {
    // 300 units, 2-3 duplicate docs each — duplicates share the unit
    val docs = (0L until 900L).map(i => (i, s"unit${i % 300}"))
      .toDF("doc_id", "unit")
    val got = Sampling.leakageSafeSplit(docs, "unit",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // a unit maps to exactly one split — the no-leak property
    val perUnit = got.groupBy("unit")
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).as[Long].head()
    assert(perUnit === 1L)
    // fractions approximate the weights (hash-uniform over 300 units)
    val frac = got.groupBy("split").count().as[(String, Long)].collect().toMap
      .view.mapValues(_ / 900.0).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac)
    assert(frac("val") > 0.03 && frac("val") < 0.2, frac)
    assert(frac("test") > 0.03 && frac("test") < 0.2, frac)
    // deterministic across layouts
    val again = Sampling.leakageSafeSplit(docs.repartition(7), "unit",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(got.orderBy("doc_id").select("split").as[String].collect().toSeq ===
      again.orderBy("doc_id").select("split").as[String].collect().toSeq)
    // weights normalize: same assignment when scaled by a constant
    val scaled = Sampling.leakageSafeSplit(docs, "unit",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    assert(scaled.orderBy("doc_id").select("split").as[String].collect().toSeq ===
      got.orderBy("doc_id").select("split").as[String].collect().toSeq)
  }
}
