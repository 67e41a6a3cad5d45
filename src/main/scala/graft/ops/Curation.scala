package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation governance operators: snapshot diffing, k-anonymity
  * auditing, robust outlier flagging, and curriculum ordering — the
  * bookkeeping layer a production training-data pipeline runs AROUND the
  * dedup/quality/mixing core.
  *
  * Scale rules shared with the rest of the ops package:
  *   - content comparisons travel as 16-byte digests, never text;
  *   - per-group statistics use integer "doubled-median" arithmetic so
  *     every engine (and the DuckDB oracle) reproduces them bit-exactly —
  *     no interpolated-quantile convention in play;
  *   - global total orders are two-level prefix sums (bucket offsets
  *     through the one small unpartitioned window, corpus-sized windows
  *     always keyed by bucket), the same shape as [[Packing]].
  */
object Curation {

  /** Diff two corpus snapshots by document id + content digest: rows only
    * in `prev` are `removed`, only in `next` are `added`, in both with a
    * different digest are `changed`; unchanged rows are dropped (the diff
    * report is the delta, not the corpus). The full outer join carries
    * (id, 16-byte digest) — text bytes never cross the exchange, so the
    * diff costs two narrow scans at any corpus size. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    // presence markers, NOT digest nullity: a null-text row digests to a
    // null key on both sides, and reading that as "row absent" would
    // misreport it as removed/added; the null-safe <=> compare treats
    // null-vs-null as unchanged and null-vs-text as changed
    val a = prev.select(col(idCol).as("id"),
      md5(col(textCol).cast("binary")).as("__da"), lit(true).as("__pa"))
    val b = next.select(col(idCol).as("id"),
      md5(col(textCol).cast("binary")).as("__db"), lit(true).as("__pb"))
    a.join(b, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__pb").isNull, lit("removed"))
          .when(col("__pa").isNull, lit("added"))
          .when(!(col("__da") <=> col("__db")), lit("changed")))
      .where(col("status").isNotNull)
      .select(col("id").as(idCol), col("status"))
  }

  /** k-anonymity audit over a quasi-identifier tuple: every row is
    * labelled with its equivalence-class size and whether it violates the
    * `k` threshold (a class smaller than k re-identifies its members —
    * the standard release-gate check before corpus metadata ships).
    * The input projects to (id, quasi columns) BEFORE the class window,
    * so the exchange carries the identifier tuple only; null quasi values
    * group together (SQL GROUP BY semantics), matching the oracle. */
  def kAnonymity(df: DataFrame, idCol: String, quasiCols: Seq[String],
                 k: Long): DataFrame = {
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.select((idCol +: quasiCols).map(col): _*)
      .withColumn("class_size", count(lit(1)).over(w))
      .withColumn("suppress", col("class_size") < k)
  }

  /** Robust per-group outlier flags over an INTEGER measure, in exact
    * integer arithmetic end to end (the "median ± c·MAD" rule, the
    * heavy-tail-safe alternative to mean/stddev z-scores for corpus
    * stats like document length).
    *
    * Exactness trick: medians are kept DOUBLED — `med2` = lower middle +
    * upper middle order statistic (the same row twice when n is odd), so
    * an even-n median of integers never becomes an interpolated double.
    * Deviations double again (`dev2 = |2x − med2|`), their doubled median
    * is `mad4 = 4·MAD`, and the flag `|x−med| > (cMilli/1000)·1.4826·MAD`
    * becomes `dev2 · 20_000_000 > cMilli · 14826 · mad4` — pure 64-bit
    * integer comparison, reproducible in any engine with no
    * quantile-interpolation or float-summation convention involved.
    * (Headroom: |value| must stay under ~4·10^11 so `dev2 · 2·10^7`
    * fits a long — every corpus-stat measure does.)
    *
    * Both median passes are windows PARTITIONED by the group key over
    * (id, value) projections — narrow rows, keyed shuffles; per-group
    * input must fit a task's window sort, the same bound any per-group
    * order statistic has (salt or pre-aggregate histograms beyond that).
    * Returns one row per input row: (idCol, groupCol, valueCol, dev2,
    * mad4, is_outlier). `cMilli` is the cutoff in thousandths (2500 =
    * 2.5 robust z). */
  def robustOutliers(df: DataFrame, idCol: String, valueCol: String,
                     groupCol: String, cMilli: Long = 2500L): DataFrame = {
    val base = df.select(col(idCol), col(groupCol),
      col(valueCol).cast("long").as("__v"))

    def doubledMedian(in: DataFrame, vCol: String, out: String): DataFrame = {
      val wOrd = Window.partitionBy(col(groupCol))
        .orderBy(col(vCol), col(idCol))
      val wAll = Window.partitionBy(col(groupCol))
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division, and the
      // row_number comparison must stay integer-exact
      in.withColumn("__rn", row_number().over(wOrd))
        .withColumn("__n", count(lit(1)).over(wAll))
        .withColumn(out,
          sum(when(col("__rn") === expr("(__n + 1) div 2"), col(vCol))
            .otherwise(lit(0L))).over(wAll) +
          sum(when(col("__rn") === expr("__n div 2 + 1"), col(vCol))
            .otherwise(lit(0L))).over(wAll))
        .drop("__rn", "__n")
    }

    val withMed = doubledMedian(base, "__v", "__med2")
      .withColumn("dev2", abs(lit(2L) * col("__v") - col("__med2")))
    doubledMedian(withMed, "dev2", "mad4")
      .withColumn("is_outlier",
        col("dev2") * 20000000L > lit(cMilli) * 14826L * col("mad4"))
      .select(col(idCol), col(groupCol), col("__v").as(valueCol),
        col("dev2"), col("mad4"), col("is_outlier"))
  }

  /** One-pass column profile: per named column, row/null/distinct counts
    * and lexicographic min/max over a caller-provided STRING rendering —
    * the generic "what is in this table" audit run before a corpus ships.
    *
    * Shape: the table melts to (column, value) rows in ONE scan (a
    * `stack` projection, no per-column re-read), then one aggregation
    * keyed by column name; the distinct count rides the same shuffle via
    * Spark's distinct-aggregate expansion. Callers render non-string
    * columns to strings deterministically (integers verbatim, timestamps
    * via an explicit 6-digit-fraction format) so the result is
    * engine-portable — float columns belong in the histogram/t-digest
    * profilers, not here. */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // melt via explode(array(struct(...))) — pure Column construction, so
    // a name containing quotes/backticks labels its rows verbatim instead
    // of corrupting a string-built stack() expression
    val melted = df.select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("column_name"), c.cast("string").as("value"))
      }: _*)).as("__kv"))
      .select(col("__kv.column_name"), col("__kv.value"))
    melted.groupBy(col("column_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").isNull.cast("long")).as("n_null"),
        count_distinct(col("value")).as("n_distinct"),
        min(col("value")).as("min_val"),
        max(col("value")).as("max_val"))
  }

  /** Calibration (reliability) bins for a classifier score against a
    * boolean label: scores bucket into `bins` equal cuts over
    * [−1, 1], and each bin reports its observed positive rate in INTEGER
    * basis points (`(n_pos·10⁴) div n` — a float ratio would round at
    * engine-dependent .5 boundaries; basis points never do). A
    * well-calibrated scorer's rate rises with the bin index. Map-only
    * bucket assignment plus one aggregation. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame =
    df.select(
        least(greatest(floor((col(scoreCol) + 1.0) * bins / 2.0), lit(0L)),
          lit(bins - 1L)).as("bin"),
        col(labelCol).cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
      .withColumn("pos_rate_bp", expr("(n_pos * 10000) div n"))

  /** Per-group disparity audit of a boolean gate: each group's keep rate
    * in integer basis points next to the corpus-wide rate, plus the
    * signed difference — the fairness check run after any quality filter
    * (a gate that keeps 70% of one source and 20% of another is
    * re-weighting the corpus whether anyone intended it or not).
    * One aggregation to the groups-sized table, one one-row broadcast
    * back; rates are `(kept·10⁴) div n`, so no float convention. */
  def gateDisparity(df: DataFrame, groupCol: String,
                    keepCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(keepCol).cast("long")).as("n_keep"))
    val tot = per.agg(sum(col("n")).as("__tn"),
      sum(col("n_keep")).as("__tk"))
    per.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n"), col("n_keep"),
        expr("(n_keep * 10000) div n").as("keep_bp"),
        expr("(__tk * 10000) div __tn").as("overall_bp"))
      .withColumn("disparity_bp", col("keep_bp") - col("overall_bp"))
  }

  /** Group-aware temporal split with an embargo: rows before
    * `cutoff − embargo` train, rows at/after `cutoff` test, the embargo
    * gap between them is quarantined (the standard guard against
    * time-adjacent leakage). Each split reports row and entity counts
    * plus how many of its entities ALSO appear in another split — the
    * residual cross-time leakage a purely temporal split cannot remove
    * (same map-only date arithmetic on both sides; entity membership is
    * one narrow (entity, split) aggregation, never a self-join). */
  def temporalSplit(df: DataFrame, entityCol: String, tsCol: String,
                    cutoff: String, embargoDays: Int): DataFrame = {
    val split = when(col(tsCol) < to_timestamp(lit(cutoff)) -
        expr(s"INTERVAL $embargoDays DAYS"), "train")
      .when(col(tsCol) >= to_timestamp(lit(cutoff)), "test")
      .otherwise("embargo")
    val base = df.select(col(entityCol).as("__e"), split.as("split"))
    val leaky = base.distinct()
      .groupBy(col("__e")).agg(count(lit(1)).as("__ns"))
      .where(col("__ns") > 1)
      .select(col("__e"), lit(true).as("__leaky"))
    base.join(leaky, Seq("__e"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("__e")).as("n_entities"),
        count_distinct(when(col("__leaky"), col("__e")))
          .as("n_entities_leaky"))
  }

  /** Tie-corrected ROC-AUC of a score column against a boolean label via
    * the Mann–Whitney rank-sum — the ranking-quality twin of the
    * confusion-matrix evaluation (a quality classifier is used as a
    * RANKER when the pipeline keeps the top fraction, so AUC is the
    * metric that matters).
    *
    * Exactness: midranks stay DOUBLED (`mid2 = 2·cumBelow + cnt + 1`), so
    * Σ_pos mid2 = 2·R_pos is an exact integer and
    * `AUC = (Σ_pos mid2 − nPos(nPos+1)) / (2·nPos·nNeg)` is ONE final
    * double division — no per-row float ranks, no midrank-.5 convention.
    *
    * Scale: rows collapse to per-distinct-score counts FIRST (scores are
    * fixed-point by upstream construction — e.g. hashedLinearScore emits
    * 4-dp values in [−1, 1], ≤20001 distinct — so the distinct-score
    * table is bounded); the only unpartitioned window runs over that
    * bounded table, and the result is a single row. */
  def rankAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__c"),
        sum(col(labelCol).cast("long")).as("__cp"))
    val withBelow = g.withColumn("__below",
      coalesce(sum(col("__c")).over(
        Window.orderBy(col("__s"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    withBelow.agg(
        sum(col("__cp")).as("__np"),
        sum(col("__c") - col("__cp")).as("__nn"),
        sum(col("__cp") * (lit(2L) * col("__below") + col("__c") + lit(1L)))
          .as("__m2"))
      .select(col("__np").as("n_pos"), col("__nn").as("n_neg"),
        round((col("__m2") - col("__np") * (col("__np") + lit(1L)))
            .cast("double") /
          (lit(2.0) * col("__np") * col("__nn")), 6).as("auc"))
  }

  /** Right-to-be-forgotten propagation: given a (small) removal list of
    * document ids, return EVERY document the purge must reach — the
    * listed docs, every byte-exact copy anywhere in the corpus, and every
    * n-gram-Jaccard near-duplicate of a listed doc. (Deleting only the
    * listed rows is the classic compliance bug: the crawl carries copies
    * the request never named.)
    *
    * Scale: the removal list is small by construction (a legal request,
    * not a corpus), so every probe side broadcasts — exact copies via a
    * broadcast digest semi-join (16-byte keys, text never shuffles), and
    * near-dups via a broadcast of the LISTED docs' shingle postings
    * joined against the corpus shingle stream (the asymmetric small-probe
    * version of [[graft.ops.Dedup.ngramJaccardPairs]] — no corpus
    * self-join, no banding needed because one side is tiny). Reasons are
    * prioritized listed > exact_copy > near_dup; one row per doomed doc. */
  def removalPropagate(df: DataFrame, idCol: String, textCol: String,
                       listed: DataFrame, n: Int = 3,
                       threshold: Double = 0.7): DataFrame = {
    val ids = listed.select(col(idCol).as("__lid")).distinct()
    val base = df.select(col(idCol).as("__id"), col(textCol).as("__t"))
    val digests = base.select(col("__id"),
      md5(col("__t").cast("binary")).as("__d"))
    val listedDig = digests
      .join(broadcast(ids), col("__id") === col("__lid"))
      .select(col("__d")).distinct()
    val exactHits = digests.join(broadcast(listedDig), Seq("__d"))
      .select(col("__id"))

    val sh = base.select(col("__id"), Dedup.shingles(col("__t"), n).as("__sh"))
    val listedSh = sh.join(broadcast(ids), col("__id") === col("__lid"))
      .select(col("__lid"), size(col("__sh")).as("__nb"),
        explode(col("__sh")).as("__s"))
    val inter = sh
      .select(col("__id"), size(col("__sh")).as("__na"),
        explode(col("__sh")).as("__s"))
      .join(broadcast(listedSh), Seq("__s"))
      .where(col("__id") =!= col("__lid"))
      .groupBy(col("__id"), col("__lid"), col("__na"), col("__nb"))
      .agg(count(lit(1)).as("__i"))
    val nearHits = inter
      .where(col("__i").cast("double") /
        (col("__na") + col("__nb") - col("__i")) >= threshold)
      .select(col("__id")).distinct()

    ids.select(col("__lid").as("__id"), lit(0).as("__p"))
      .unionByName(exactHits.withColumn("__p", lit(1)))
      .unionByName(nearHits.withColumn("__p", lit(2)))
      .groupBy(col("__id"))
      .agg(min(col("__p")).as("__p"))
      .select(col("__id").as(idCol),
        expr("CASE __p WHEN 0 THEN 'listed' WHEN 1 THEN 'exact_copy' " +
          "ELSE 'near_dup' END").as("reason"))
  }

  /** Curriculum ordering: rank the corpus easy-to-hard by a bounded
    * [0, 1] score, cut the ranking into `stages` equal stages, and
    * shuffle WITHIN each stage by id hash (the standard "sort into
    * difficulty stages, randomize inside each stage" training order —
    * a raw global quality sort would feed the model week-long runs of
    * near-identical documents).
    *
    * Both total orders are two-level prefix sums ([[Packing]] shape):
    *   - the score rank buckets by `floor((1−score)·buckets)` — monotone
    *     in descending score, so bucket-offset + in-bucket row_number IS
    *     the global rank, and only the `buckets`-row count table crosses
    *     the unpartitioned window;
    *   - the final position buckets by (stage, id-hash range) the same
    *     way.
    * Stage cut is integer: `((rank−1)·stages) div n` — no ntile
    * convention in play. Returns (idCol, rank, stage, position). */
  def curriculumOrder(df: DataFrame, idCol: String, scoreCol: Column,
                      stages: Int = 10, buckets: Int = 1024): DataFrame = {
    require(stages >= 1 && buckets >= 1, "stages and buckets must be positive")
    val base = df.select(col(idCol), scoreCol.cast("double").as("__s"),
      Dedup.h32(col(idCol).cast("string")).as("__h"))

    // stage 1: global rank by (score desc, id) — bucket is any monotone
    // coarsening of the sort key, so the clamp at the [0,1] edges only
    // merges boundary buckets, never reorders
    val withSb = base.withColumn("__sb",
      least(greatest(floor((lit(1.0) - col("__s")) * buckets), lit(0L)),
        lit(buckets - 1L)))
    val sbOff = withSb.groupBy(col("__sb")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__sb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__sb"), col("__off"))
    val inSb = Window.partitionBy(col("__sb"))
      .orderBy(col("__s").desc, col(idCol))
    val n = df.agg(count(lit(1)).as("__n"))
    val ranked = withSb.join(sbOff, Seq("__sb"))
      .withColumn("rank", col("__off") + row_number().over(inSb))
      .crossJoin(broadcast(n))
      .withColumn("stage", expr(s"((rank - 1) * $stages) div __n"))
      .select(col(idCol), col("__h"), col("rank"), col("stage"))

    // stage 2: position by (stage, hash, id) — composite bucket
    // (stage, hash range) keeps the corpus-sized window keyed
    val withPb = ranked.withColumn("__pb",
      col("stage") * buckets + floor(col("__h") * buckets / 4294967296.0))
    val pbOff = withPb.groupBy(col("__pb")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__pb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pb"), col("__off"))
    val inPb = Window.partitionBy(col("__pb"))
      .orderBy(col("__h"), col(idCol))
    withPb.join(pbOff, Seq("__pb"))
      .withColumn("position", col("__off") + row_number().over(inPb))
      .select(col(idCol), col("rank"), col("stage"), col("position"))
  }
}
