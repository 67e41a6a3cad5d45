package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("snapshotDiff reports added/removed/changed and drops unchanged") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val next = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("doc_id", "text")
    val got = Curation.snapshotDiff(prev, next, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("kAnonymity labels class sizes and suppression at k") {
    val df = Seq((1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
      (4L, "de", "b")).toDF("doc_id", "lang", "src")
    val got = Curation.kAnonymity(df, "doc_id", Seq("lang", "src"), k = 2)
      .select("doc_id", "class_size", "suppress")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((3L, false)) && got(4L) === ((1L, true)))
  }

  test("robustOutliers matches a by-hand doubled-median computation") {
    // group g: values 10,10,10,11,100 → med=10 (med2=20), devs 0,0,0,1,90
    // → dev2 = 0,0,0,2,180; MAD: sorted dev2 = 0,0,0,2,180, doubled-median
    // of dev2 = mad4 = 0+0... n=5 → lower=(5+1)/2=3, upper=5/2+1=3 → twice
    // row 3 → mad4 = 0? sorted dev2: [0,0,0,2,180] → rn3 = 0 → mad4 = 0.
    // With mad4 = 0 only dev2 > 0 rows flag (0 > 0 false) — the standard
    // degenerate-MAD behaviour: any nonzero deviation is an outlier.
    val df = Seq((1L, "g", 10L), (2L, "g", 10L), (3L, "g", 10L),
      (4L, "g", 11L), (5L, "g", 100L)).toDF("id", "grp", "v")
    val got = Curation.robustOutliers(df, "id", "v", "grp", cMilli = 2500L)
      .select("id", "dev2", "mad4", "is_outlier")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((0L, 0L, false)))
    assert(got(4L) === ((2L, 0L, true)))
    assert(got(5L) === ((180L, 0L, true)))
  }

  test("robustOutliers even-n median interpolates exactly (doubled ints)") {
    // values 1,3 → med = 2 → med2 = 4; dev2 = |2v - 4| = 2, 2; mad4 = 4
    val df = Seq((1L, "g", 1L), (2L, "g", 3L)).toDF("id", "grp", "v")
    val got = Curation.robustOutliers(df, "id", "v", "grp")
      .select("id", "dev2", "mad4").as[(Long, Long, Long)].collect()
    assert(got.toSet === Set((1L, 2L, 4L), (2L, 2L, 4L)))
  }

  test("curriculumOrder: rank follows score desc, stages cut evenly, " +
    "position groups stages contiguously") {
    val df = (0L until 40L).map(i => (i, (i % 20).toDouble / 20.0))
      .toDF("doc_id", "s")
    val got = Curation.curriculumOrder(df, "doc_id", col("s"), stages = 4)
      .select("doc_id", "rank", "stage", "position")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sorted.toSeq === (1L to 40L))
    assert(got.map(_._4).sorted.toSeq === (1L to 40L))
    // stage = ((rank-1)*4) div 40: ranks 1-10 → 0, 11-20 → 1, ...
    got.foreach { case (_, r, st, _) => assert(st === (r - 1) * 4 / 40) }
    // positions are stage-contiguous: every stage-0 position < stage-1 …
    val byStage = got.groupBy(_._3).view.mapValues(_.map(_._4)).toMap
    for (s <- 0L until 3L)
      assert(byStage(s).max < byStage(s + 1).min)
    // within a stage the order is hash-shuffled, not rank order: with 10
    // docs per stage the odds of hash order equaling rank order are 1/10!
    val stage0 = got.filter(_._3 === 0L).sortBy(_._4).map(_._2)
    assert(stage0.toSeq !== stage0.sorted.toSeq)
  }

  test("curriculumOrder is layout-independent") {
    val df = (0L until 30L).map(i => (i, (i % 7).toDouble / 7.0))
      .toDF("doc_id", "s")
    val a = Curation.curriculumOrder(df, "doc_id", col("s"))
      .orderBy("doc_id").collect().toSeq
    val b = Curation.curriculumOrder(df.repartition(7), "doc_id", col("s"))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("editDistancePairs finds close prefixes once, verified distance") {
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot"),
      (2L, "alpha bravo charlie delta echo foxtrox"), // 1 edit
      (3L, "alpha bravo charlie delta echo foxtrot"), // exact dup of 1
      (4L, "zulu yankee xray whiskey victor uniform")).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
        prefixLen = 80, maxDist = 5, n = 3)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map((1L, 2L) -> 1, (1L, 3L) -> 0, (2L, 3L) -> 1))
  }

  test("editDistancePairs length filter never drops a qualifying pair") {
    // same text vs text + 30 extra chars: length gap > maxDist prunes it
    // BEFORE levenshtein, and that is correct (distance >= length gap)
    val docs = Seq(
      (1L, "alpha bravo charlie delta"),
      (2L, "alpha bravo charlie delta " + "x" * 30)).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
      prefixLen = 80, maxDist = 5, n = 3)
    assert(got.count() === 0)
  }

  test("editDistancePairs: sound and shingle-blocking-complete vs brute force") {
    // random-ish corpora from a tiny vocabulary: lots of shared shingles,
    // distances in range. Property (25 seeds):
    //  - SOUND: every reported (pair, dist) equals brute-force Levenshtein
    //  - COMPLETE within the blocking contract: every brute-force pair at
    //    dist <= maxDist whose prefixes share a word 3-gram is reported
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def sh3(s: String): Set[String] = {
      val t = s.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    for (seed <- 1 to 25) {
      val rnd = new scala.util.Random(seed)
      val texts = (0 until 12).map { _ =>
        (0 until (4 + rnd.nextInt(4))).map(_ => vocab(rnd.nextInt(5)))
          .mkString(" ")
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val maxDist = 8
      val got = Dedup.editDistancePairs(docs, "doc_id", "text",
          prefixLen = 40, maxDist = maxDist, n = 3)
        .as[(Long, Long, Int)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val prefs = texts.map(_.take(40))
      // soundness
      got.foreach { case ((a, b), d) =>
        assert(d === lev(prefs(a.toInt), prefs(b.toInt)), s"seed=$seed ($a,$b)")
        assert(d <= maxDist)
      }
      // completeness within the blocking contract
      for (a <- texts.indices; b <- texts.indices if a < b) {
        val d = lev(prefs(a), prefs(b))
        val blocked = (sh3(prefs(a)) intersect sh3(prefs(b))).nonEmpty
        if (d <= maxDist && blocked)
          assert(got.contains((a.toLong, b.toLong)),
            s"seed=$seed missing pair ($a,$b) d=$d")
      }
    }
  }

  test("gateDisparity: basis-point rates and signed deltas by hand") {
    val df = Seq(("a", true), ("a", true), ("a", false), ("b", false),
      ("b", false), ("b", false)).toDF("src", "keep")
    val got = Curation.gateDisparity(df, "src", "keep")
      .select("src", "n", "n_keep", "keep_bp", "overall_bp", "disparity_bp")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // overall: 2/6 = 3333 bp
    assert(got("a") === ((3L, 2L, 6666L, 3333L, 3333L)))
    assert(got("b") === ((3L, 0L, 0L, 3333L, -3333L)))
  }

  test("temporalSplit: embargo quarantined, leaky entities counted per split") {
    val df = Seq(
      (1L, "2023-01-01 00:00:00"), // train (before cutoff - 30d)
      (1L, "2023-06-15 00:00:00"), // test (after cutoff) → entity 1 leaky
      (2L, "2023-05-20 00:00:00"), // embargo (within 30d before cutoff)
      (3L, "2023-07-01 00:00:00"), // test only
      (4L, "2023-02-01 00:00:00")  // train only
    ).toDF("e", "ts").withColumn("ts", to_timestamp(col("ts")))
    val got = Curation.temporalSplit(df, "e", "ts", "2023-06-01", 30)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("train") === ((2L, 2L, 1L)))
    assert(got("test") === ((2L, 2L, 1L)))
    assert(got("embargo") === ((1L, 1L, 0L)))
  }

  test("profile: one-scan melt, null/distinct counts, string bounds") {
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
      .toDF("id", "s")
    val got = Curation.profile(df, Seq("id" -> col("id"), "s" -> col("s")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(got("id") === ((4L, 0L, 4L, Some("1"), Some("4"))))
    assert(got("s") === ((4L, 1L, 2L, Some("a"), Some("b"))))
    // ONE corpus scan: the melt is a single explode projection, not
    // per-column reads
    val plan = Curation.profile(df, Seq("id" -> col("id"), "s" -> col("s")))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), s"melt must not union per-column scans:\n$plan")
  }

  test("profile labels columns whose names contain quotes and backticks") {
    // the melt is built from Columns, not an interpolated stack() string,
    // so hostile names label their rows verbatim instead of parse-erroring
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val name = "it's `quoted`"
    val got = Curation.profile(df, Seq(name -> col("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(name -> 2L))
  }

  test("calibrationBins: integer basis points, clamped bins") {
    val df = Seq((-1.5, false), (-0.95, false), (0.05, true), (0.05, false),
      (0.05, true), (0.98, true), (1.5, true)).toDF("score", "y")
    val got = Curation.calibrationBins(df, "score", "y")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // -1.5 clamps to bin 0 with -0.95; 0.05 → bin 5 (1.05*5=5.25);
    // 0.98 → bin 9 (1.98*5=9.9); 1.5 clamps to 9
    assert(got(0L) === ((2L, 0L, 0L)))
    assert(got(5L) === ((3L, 2L, 6666L))) // 2*10000 div 3
    assert(got(9L) === ((2L, 2L, 10000L)))
  }

  test("rankAuc matches by-hand tie-corrected Mann-Whitney AUC") {
    // scores: pos {0.9, 0.5, 0.5}, neg {0.5, 0.1}
    // midranks (asc): 0.1→1; 0.5 ties (3 rows, ranks 2-4)→3; 0.9→5
    // R_pos = 5 + 3 + 3 = 11; U = 11 - 3·4/2 = 5; AUC = 5/(3·2) = 0.833333
    val df = Seq((0.9, true), (0.5, true), (0.5, true), (0.5, false),
      (0.1, false)).toDF("score", "y")
    val got = Curation.rankAuc(df, "score", "y")
      .as[(Long, Long, Double)].collect().head
    assert(got === ((3L, 2L, 0.833333)))
    // perfect separation → AUC 1; inverted → 0
    val sep = Seq((0.9, true), (0.8, true), (0.2, false)).toDF("score", "y")
    assert(Curation.rankAuc(sep, "score", "y")
      .as[(Long, Long, Double)].collect().head._3 === 1.0)
    val inv = Seq((0.1, true), (0.8, false), (0.9, false)).toDF("score", "y")
    assert(Curation.rankAuc(inv, "score", "y")
      .as[(Long, Long, Double)].collect().head._3 === 0.0)
  }

  test("removalPropagate reaches listed, exact copies, and near-dups with priority") {
    // doc 1 listed; doc 10 is a byte-exact copy of doc 1; doc 11 shares
    // most 3-grams with doc 1 (near-dup); doc 20 is unrelated. doc 2 is
    // ALSO listed and a copy of doc 1 — priority keeps it 'listed'.
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy dog again and more"
    val df = Seq(
      (1L, base), (2L, base), (10L, base), (11L, near),
      (20L, "completely different content with no shared grams at all"))
      .toDF("doc_id", "text")
    val listed = Seq(1L, 2L).toDF("doc_id")
    val got = Curation.removalPropagate(df, "doc_id", "text", listed,
        n = 3, threshold = 0.5)
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "listed", 2L -> "listed",
      10L -> "exact_copy", 11L -> "near_dup"))
  }

  test("knnClassify majority vote with deterministic tie-break") {
    // corpus: 4 vectors near +x labeled 0, 2 near +y labeled 1;
    // query at +x → label 0 by majority
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.8f, 0.2f), 0), (4L, Array(1.0f, 0.1f), 0),
      (5L, Array(0.0f, 1.0f), 1), (6L, Array(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val q = Seq((100L, Array(1.0f, 0.05f))).toDF("vec_id", "embedding")
    val got = Similarity.knnClassify(corpus, "vec_id", "embedding", "label",
        q, "vec_id", "embedding", k = 5)
      .as[(Long, Int, Int)].collect()
    assert(got.toSeq === Seq((100L, 0, 4)))
  }
}
