package graft.plans

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Scale lint over EVERY `SparkEntry.queries` plan: converts PLANS.md's
  * prose guarantees ("no cartesian, no corpus-side nested-loop join, no
  * unpartitioned corpus window") into a gate the suite enforces, so a
  * future edit can't silently re-plan an operator into a quadratic or
  * single-task shape. Each query is PLANNED (analyzed → optimized →
  * physical), not executed — the lint reads the pre-AQE physical plan,
  * which is exactly the shape AQE starts from (AQE converts exchanges and
  * splits skew; it never introduces a cartesian or nested-loop join that
  * the static plan didn't already imply).
  *
  * Three checks, with per-query allowlists that each carry the WHY:
  *
  *  1. `CartesianProductExec` — never acceptable: there is no corpus size
  *     at which an unkeyed pairwise product survives.
  *  2. `BroadcastNestedLoopJoinExec` — acceptable ONLY when the broadcast
  *     side is bounded by construction (a literal/one-row frame, a k-row
  *     centroid table, a LIMIT'ed top-k): those are the documented
  *     `crossJoin(broadcast(tiny))` scalar-fanout shapes. Allowlisted by
  *     name; anything new fails until its boundedness is argued here.
  *  3. Unpartitioned logical `Window` (empty partitionSpec) — a global
  *     sort through ONE task; acceptable only over bounded inputs
  *     (bucket/block counts, top-k frames), never over corpus rows.
  *
  * Streaming (`s_stream_*`) and lift (`l_*`) queries execute their
  * pipelines inside the query function and return a batch read of the
  * result — the lint sees that final batch plan (the streaming micro-batch
  * plans are pinned separately in their own suites).
  */
class QueryPlanLintSpec extends SparkSuite {

  /** crossJoin(broadcast(bounded)) fan-outs: the broadcast side is one
    * probe vector, a k-row centroid/codebook table, a ≤buckets-row weight
    * table, or a LIMIT'ed frame — constant-size by construction, so the
    * nested loop multiplies the corpus by a constant, never by the corpus. */
  private val bnljBounded: Set[String] = Set(
    // TPC-H scalar-subquery threshold: one aggregated row joins the group table
    "q11_important_parts", "q22_sales_opportunity",
    // one-row sketch/corpus-stat frames (HLL union, CMS totals, KMV, t-digest
    // quantile cuts, per-source sketch ≤|sources|² pairwise overlap)
    "q_sketch_union", "x_sketch_cms", "x_sketch_kmv", "x_sketch_kmv_overlap",
    "x_sketch_tdigest", "x_source_minhash",
    // ANN probes: ONE query vector / a k-row centroid/codebook table / a
    // LIMIT'ed candidate list broadcast against the (cell-pruned) corpus
    "x_ann_brute", "x_ann_ivf_probe", "x_ann_pq", "x_ann_rerank",
    // batch k-NN join: the query BATCH broadcasts (documented contract:
    // batches are small relative to the corpus; |q|×|corpus| is the exact
    // cost floor, and the IVF variant prunes candidates by cell first)
    "x_knn_join", "x_knn_join_ivf",
    // recall audit runs both knnJoin variants — same query-batch contract
    "x_ann_recall",
    // knnClassify rides knnJoinExact — same broadcast-query-batch contract
    // (eval_confusion aggregates its output)
    "x_knn_classify", "x_eval_confusion",
    // HITS L1 normalizers: one aggregated row broadcast back per half-step
    "x_graph_hits",
    // one-row frames: the n_exact pair-count scalar (audit), the corpus
    // row-count scalar fanned out for the stage cut (curriculum)
    "x_dedup_audit", "x_order_curriculum",
    // mixture/weight tables: ≤|buckets| rows by construction (kl adds a
    // one-row doc-total broadcast onto the sources-sized weight table)
    "x_mix_apply", "x_mix_dsir", "x_mix_epochs", "x_mix_tokens", "x_mix_weights",
    "x_mix_kl",
    // one-row corpus totals (N docs, avgdl, quantile threshold) fanned out
    // to per-doc scoring
    "x_pipeline_curate", "x_retrieval_rrf", "x_text_bm25", "x_text_logprob",
    "x_text_pmi", "x_text_quality_filter", "x_text_tfidf",
    // batch BM25 shares bm25's one-row avgdl/n_docs scalar fanouts
    "x_retrieval_batch",
    // one-row vocabulary-size scalar fanned out to the per-bigram scoring
    "x_text_bigram_lm",
    // one-row corpus-token-total scalar (unigramLogProb's tot) fanned out
    // to per-doc scoring; appears once per subplan of the persisted
    // scored stage
    "x_text_ppl_buckets",
    // one-row corpus-total broadcast fanned onto the ≤|sources|×buckets grid
    "x_quality_ks", "s_stream_drift",
    // one-row overall-rate broadcast onto the sources-sized gate table
    "x_quality_disparity")

  /** Unpartitioned windows over bounded frames only: two-level prefix sums
    * see bucket/block COUNTS (≤ shuffle-partition-count rows), top-k sees
    * ≤k rows, sketch rollups see ≤sketch-count rows. */
  private val globalWindowBounded: Set[String] = Set(
    // moving averages over the per-DAY aggregate (rows = distinct days,
    // bounded by the calendar, never per input row)
    "q_window_moving", "q_window_range",
    // two-level prefix sums: the global window sees per-block/bucket counts
    // (Packing.scala:49,77 — ≤ partition-count rows)
    "x_corpus_shuffle", "x_pack_chunks",
    // curriculum rank + position offsets: both global windows run over
    // bucket COUNT tables (≤buckets and ≤stages·buckets rows —
    // Curation.scala two-level prefix sums), never corpus rows
    "x_order_curriculum",
    // rank over the fused TOP-K candidate lists (≤2k rows)
    "x_retrieval_rrf",
    // cumulative weight over t-digest centroid rows (≤ compression)
    "x_sketch_tdigest",
    // rank-AUC prefix sum over the DISTINCT-SCORE table (hashedLinearScore
    // emits 4-dp fixed-point scores in [-1, 1] — ≤20001 rows by range)
    "x_eval_auc",
    // balanced-shard rank offsets: the global window sees the weight-BUCKET
    // count table (weight div 4 — bounded by max doc tokens / 4 rows)
    "x_order_shards")

  private def physicalOffenders(p: SparkPlan): Seq[String] =
    p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        s"CartesianProduct: ${c.simpleStringWithNodeId()}"
      case b: BroadcastNestedLoopJoinExec =>
        s"BNLJ(${b.buildSide}): ${b.simpleStringWithNodeId()}"
    }

  private def globalWindows(p: LogicalPlan): Seq[String] =
    p.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        s"global Window: ${w.windowExpressions.map(_.name).mkString(",")}"
    }

  test("every query plan is free of cartesian/corpus-BNLJ/global-window shapes") {
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, sf0)
        catch { case e: Throwable =>
          violations += s"$name: query function failed: ${e.getMessage}"
          null
        }
      if (df != null) {
        val qe = df.queryExecution
        val phys = physicalOffenders(qe.sparkPlan)
        val cart = phys.filter(_.startsWith("CartesianProduct"))
        val bnlj = phys.filter(_.startsWith("BNLJ"))
        if (cart.nonEmpty)
          violations += s"$name: ${cart.mkString("; ")}"
        if (bnlj.nonEmpty && !bnljBounded(name))
          violations += s"$name: ${bnlj.mkString("; ")}"
        val gw = globalWindows(qe.optimizedPlan)
        if (gw.nonEmpty && !globalWindowBounded(name))
          violations += s"$name: ${gw.mkString("; ")}"
      }
      spark.catalog.clearCache()
    }
    assert(violations.isEmpty,
      s"\n${violations.size} plan-lint violations:\n${violations.mkString("\n")}")
  }
}
