package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** One-off scale/cost experiments whose conclusions live in BASELINE.md.
  *
  * Not part of the bench or correctness surface — a measurement harness for
  * the two structural questions the per-query gate can't answer:
  *
  *   `Probe stream`      — how much of a Structured Streaming query's wall
  *                         time is fixed engine cost (query start/stop,
  *                         checkpoint setup, state-store init) vs per-micro-
  *                         batch cost vs data volume. Varies ONLY the batch
  *                         count (via maxFilesPerTrigger over a fixed-file
  *                         export) against identical data and identical
  *                         results, plus a restart-on-drained-checkpoint run
  *                         (pure fixed cost, zero batches).
  *
  *   `Probe dedupscale`  — how the within-bucket-quadratic dedup family
  *                         (editDistancePairs, containmentPairs) grows when
  *                         the corpus scales 1x -> 10x past the bench SF.
  *                         Replicas are deterministically perturbed
  *                         (per-replica letter->digit translate) so new data
  *                         is genuinely new text — the realistic growth mode;
  *                         an `exact` variant replicates verbatim instead,
  *                         the adversarial mode where every bucket grows k-x
  *                         and true-pair output grows k^2 per document.
  */
object Probe {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors))
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // mirror Bench's suite-sized codegen cache: with the 100-entry
      // default a single ~118-class query cycles the cache and every
      // probe repeat re-compiles from scratch, measuring the cache size
      // instead of the query (the r9 codegen-cache lesson)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // shared classloader → codegen-cache reuse across streaming drains
      // (the streamjit probe's own discovery; flip via env to reproduce
      // the churn: SPARK_GRAFT_ARTIFACT_ISOLATION=true)
      .config("spark.sql.artifact.isolation.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_ISOLATION", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.headOption match {
      case Some("stream")     => streamFixedCost(session(), sfDir)
      case Some("dedupscale") => dedupScale(session(), sfDir, exact = args.contains("exact"))
      case Some("textskew") => textSkew(session(), sfDir, exact = args.contains("exact"))
      case Some("neardupindex") => nearDupIndexScale(session(), sfDir, exact = args.contains("exact"))
      case Some("recursive") => recursiveCost(session(), sfDir)
      case Some("streamjit") => streamJit(session(), sfDir)
      case Some("incopt") => incrementalOptimize(session(), sfDir)
      case Some("knngraph") => knnGraphStages(session(), sfDir)
      case Some("editdist") => editDistStages(session(), sfDir)
      case Some("textstages") => textStages(session(), sfDir)
      case other => System.err.println(s"unknown probe: $other (stream | dedupscale [exact] | textskew [exact] | neardupindex [exact] | recursive | streamjit | incopt | knngraph | editdist | textstages)")
    }
  }

  // ------------------------------------------------------------------
  // knngraph: stage-by-stage cost of the adaptive-blocked kNN graph —
  // which phase (blocked pair join, direction mirror, top-k window,
  // mutual self-join) dominates at a given SF, to separate the O(sum
  // cell^2) pair semantics from any plan-shape overhead.
  // ------------------------------------------------------------------
  private def knnGraphStages(s: SparkSession, sfDir: String): Unit = {
    import graft.ops.Similarity
    val emb = Tables.embeddings(s, sfDir)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2fs")
      r
    }
    timed("warm (read + count)")(emb.count())
    val pairs = Similarity.allPairsCosineAuto(
      emb.withColumnRenamed("label", "cell"), "vec_id", "embedding", Seq("cell"))
    timed("pairs (blocked join)")(pairs.count())
    s.sharedState.cacheManager.clearCache()
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", "label", k = 3)
    timed("full knnGraph")(g.count())
    s.sharedState.cacheManager.clearCache()
  }

  // ------------------------------------------------------------------
  // textstages: per-stage cost of the shared text/shingle kernels that
  // feed the cpu-heaviest bench rows (x_dedup_audit 34c, x_dedup_
  // containment 33c, x_dedup_prefix 21c, x_text_train_lr 17c): how much
  // of the cpu is tokenization, the h32 hash chain, the shingle build,
  // the inverted-index string shuffle, and the pair aggregation — so a
  // per-task-work fix (guide §1.2 step 2) targets the real kernel.
  // Every timing drives a noop sink (guide §1.4), not count(), so column
  // pruning can't skip the kernel under test.
  // ------------------------------------------------------------------
  private def textStages(s: SparkSession, sfDir: String): Unit = {
    import graft.ops.{Dedup, TextOps}
    val docs = Tables.documents(s, sfDir).select("doc_id", "text", "source")
      .persist()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime - t0) / 1e9}%.2fs")
      r
    }
    timed("warm (read + count)")(docs.count())
    val tok = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
    timed("tokens + explode")(noop(tok))
    timed("tokens + explode (warm)")(noop(tok))
    timed("  + h32(token)")(noop(tok.select(col("doc_id"), Dedup.h32(col("token")).as("b"))))
    timed("  + xxhash64(token) [floor ref]")(noop(tok.select(col("doc_id"), xxhash64(col("token")).as("b"))))
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
    timed("shingles build")(noop(sh))
    val inv = sh.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
    timed("inverted explode (string key)")(noop(inv))
    timed("inverted explode -> h64 key")(noop(inv.select(col("id"), col("sz"), xxhash64(col("shingle")).as("k"))))
    val shP = sh.where(size(col("sh")) > 0).persist()
    shP.count()
    val invP = shP.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
    val pairAgg = invP.alias("l")
      .join(invP.alias("r"),
        col("l.shingle") === col("r.shingle") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("c"),
        first(col("l.sz")).as("sz_a"), first(col("r.sz")).as("sz_b"))
    timed("pair self-join + agg (string)")(noop(pairAgg))
    val invH = shP.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("shingle"))
      .select(col("id"), col("sz"), xxhash64(col("shingle")).as("shingle"))
    val pairAggH = invH.alias("l")
      .join(invH.alias("r"),
        col("l.shingle") === col("r.shingle") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("c"),
        first(col("l.sz")).as("sz_a"), first(col("r.sz")).as("sz_b"))
    timed("pair self-join + agg (h64 key)")(noop(pairAggH))
    timed("minhash sig k=32")(noop(shP.select(col("id"),
      Dedup.minhashSignature(col("sh"), 32).as("sig"))))
    timed("full lshRecallAudit")(noop(
      Dedup.lshRecallAudit(docs, "doc_id", "text", n = 3, k = 32, bands = 2,
        threshold = 0.7)))
    graft.ops.Caches.release()
    timed("full containmentPairs")(noop(
      Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.6,
        minShingles = 3)))
    graft.ops.Caches.release()
    timed("full prefixJaccardPairs")(noop(
      Dedup.prefixJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.6)))
    graft.ops.Caches.release()
    timed("full trainHashedLogReg")(noop(
      TextOps.trainHashedLogReg(docs, "doc_id", col("source") === "src1",
        dim = 64, iters = 2, lrInv = 100.0)))
    graft.ops.Caches.release()
    timed("full bigramLogProb")(noop(TextOps.bigramLogProb(docs, "doc_id")))
    graft.ops.Caches.release()
    timed("full perplexityBuckets")(noop(
      TextOps.perplexityBuckets(docs, "doc_id", "source")))
    graft.ops.Caches.release()
    shP.unpersist(); docs.unpersist()
  }

  // ------------------------------------------------------------------
  // editdist: stage-by-stage cost of editDistancePairs — candidate
  // volume from the df-capped inverted index vs the Levenshtein verify,
  // to see which phase owns the suite's slowest row.
  // ------------------------------------------------------------------
  private def editDistStages(s: SparkSession, sfDir: String): Unit = {
    import graft.ops.Dedup
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2fs")
      r
    }
    timed("warm (read + count)")(docs.count())
    val full = Dedup.editDistancePairs(docs, "doc_id", "text")
    timed("full run 1")(full.count())
    graft.ops.Caches.release(); s.catalog.clearCache()
    timed("full run 2 (warm)")(full.count())
    graft.ops.Caches.release(); s.catalog.clearCache()
    // decomposition: rebuild the internal stages the public op hides, so
    // the wall attributes to index build / candidate join / verify
    val base = docs
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id").as("id"),
        substring(col("text"), 1, 80).as("pref"))
      .withColumn("sh", Dedup.shingles(col("pref"), 3))
      .where(size(col("sh")) > 0)
      .persist()
    timed("base build")(base.count())
    val inverted = base.select(col("id"), length(col("pref")).as("len"),
        explode(col("sh")).as("shingle"))
    val counted = timed("inverted rows")(inverted.count())
    println(s"[probe]   inverted index rows = $counted")
    val cap = inverted.join(broadcast(inverted.groupBy("shingle").count()
        .where(col("count") <= 1000L).select("shingle")), "shingle")
    val cand = cap.alias("l").join(cap.alias("r"),
        expr("l.shingle = r.shingle AND l.id < r.id AND abs(l.len - r.len) <= 20"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    val rawPairs = timed("cand pairs (pre-distinct)")(cand.count())
    val distinctPairs = timed("cand distinct")(cand.distinct().count())
    println(s"[probe]   cand raw = $rawPairs  distinct = $distinctPairs")
    val d = cand.distinct()
      .join(base.select(col("id").as("id_a"), col("pref").as("pref_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("pref").as("pref_b")), "id_b")
      .select(levenshtein(col("pref_a"), col("pref_b")).as("ed"))
      .where(col("ed") <= 20)
    timed("verify (lev) from cand")(d.count())
    base.unpersist()
  }

  // ------------------------------------------------------------------
  // incopt: does optimizeIncremental's cost track the APPEND TAIL while
  // full optimize tracks the TABLE (the claimed O(new data) vs O(table)
  // maintenance model)? Grow a z-ordered table k×, append a fixed-size
  // tail each round, and time incremental vs full per round — the
  // incremental wall should stay flat as the table grows; the full
  // rewrite should grow with it.
  // ------------------------------------------------------------------
  private def incrementalOptimize(s: SparkSession, sfDir: String): Unit = {
    import graft.table.ManagedTable
    val one = s.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey", "l_quantity",
        "round(l_extendedprice, 2) AS price")
    // 10× replicated base (distinct keys per replica) so the full
    // rewrite's O(table) term dominates visibly; the appended tail stays
    // ONE fixed ~0.6%-of-base slice
    val lineitem = one.crossJoin(s.range(10).toDF("rep"))
      .selectExpr("l_orderkey + rep * 10000000 AS l_orderkey",
        "l_partkey", "l_quantity", "price")
    val tail = one.where(expr("l_orderkey % 16 = 0")) // fixed slice
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val base = graft.common.Scratch.dir("probe", "incopt")
    println(f"${"round"}%5s ${"tableRows"}%10s ${"inc_s"}%7s ${"full_s"}%7s")
    val ti = ManagedTable(s, s"$base/ti") // incremental-maintained
    val tf = ManagedTable(s, s"$base/tf") // full-optimize-maintained
    ti.write(lineitem); ti.optimize(zorderBy = Seq("l_partkey", "price"))
    tf.write(lineitem); tf.optimize(zorderBy = Seq("l_partkey", "price"))
    for (round <- 1 to 4) {
      // each round the tables have grown by (round-1) tails; the new tail
      // is identical each time, so per-round cost differences are purely
      // the maintenance footprint
      ti.append(tail)
      tf.append(tail)
      val inc = time(ti.optimizeIncremental(zorderBy = Seq("l_partkey", "price")))
      val full = time(tf.optimize(zorderBy = Seq("l_partkey", "price")))
      println(f"$round%5d ${ti.read().count()}%10d $inc%7.2f $full%7.2f")
    }
    // both maintenance styles converge to the same content
    assert(ti.read().count() == tf.read().count())
  }

  // ------------------------------------------------------------------
  // streamjit: is the heavy streaming rows' JIT wall share (r9 verdict
  // item 5) janino codegen churn — per-batch plans generating NEW
  // sources every drain — or plain HotSpot tier-up of stable code?
  // CodegenMetrics counts janino compilations directly; HotSpot's
  // CompilationMXBean counts everything. If run 2 of the same query
  // generates ~zero new janino classes, the codegen cache works across
  // drains and the JIT share is tier-up, which deeper warmup (not plan
  // pinning) addresses.
  // ------------------------------------------------------------------
  private def streamJit(s: SparkSession, sfDir: String): Unit = {
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    // the codegen cache's key set, via reflection — new keys between two
    // runs of the SAME query are exactly the sources that vary per run
    def cacheKeys(): Set[String] = {
      val module = Class.forName(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
      val inst = module.getField("MODULE$").get(null)
      val f = module.getDeclaredField("cache")
      f.setAccessible(true)
      val nfs = f.get(inst) // NonFateSharingLoadingCache wraps shaded guava
      val guava = nfs.getClass.getMethod("loadingCache").invoke(nfs)
      // invoke asMap through the public Cache INTERFACE — the impl class
      // (LocalManualCache) is package-private and rejects direct reflection
      val iface = Class.forName("org.sparkproject.guava.cache.Cache")
      val asMap = iface.getMethod("asMap").invoke(guava)
        .asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      import scala.jdk.CollectionConverters._
      asMap.keySet().asScala.map(_.toString).toSet
    }
    // round-11 (r10 verdict #5): the WHOLE streaming family plus the
    // Derby upsert row — any remaining per-drain compile source must be
    // named, not sampled from two representatives
    val qs = SparkEntry.queries.keys.toSeq.sorted.filter(_.startsWith("s_")) :+
      "l_jdbc_upsert"
    for (q <- qs) {
      println(s"-- $q")
      var prevKeys = Set.empty[String]
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
        val j0 = jit.getTotalCompilationTime
        val g0 = cg.METRIC_COMPILATION_TIME.getCount
        SparkEntry.queries(q)(s, sfDir).count()
        graft.ops.Caches.release(); s.catalog.clearCache()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        val dj = (jit.getTotalCompilationTime - j0) / 1e3
        val dg = cg.METRIC_COMPILATION_TIME.getCount - g0
        val keys = cacheKeys()
        val freshN = if (i == 1) -1 else (keys -- prevKeys).size
        println(f"run$i: wall=$wall%.2f cpu=$cpu%.1f hotspotJit=$dj%.1fs " +
          f"janinoClasses=+$dg freshSources=$freshN%d " +
          f"load=${osBean.getSystemLoadAverage}%.1f")
        if (i == 3 && freshN > 0) {
          val fresh = (keys -- prevKeys).toSeq.sortBy(_.length)
          println(s"run3 added ${fresh.size} new cached sources; samples:")
          fresh.take(2).foreach { k =>
            println("=== source (first 800 chars) ===")
            println(k.take(800))
          }
        }
        prevKeys = keys
      }
    }
  }

  // ------------------------------------------------------------------
  // recursive: where does q_recursive's wall go (r9 verdict item 2) —
  // per-run wall/cpu/gc/jit across consecutive in-JVM executions, with
  // and without whole-stage codegen, mirroring Bench's warmup protocol
  // (one sf0.001 run first). The recursion is depth x per-step DRIVER
  // cost (r7 autopsy), so the interesting split is how much of a step
  // is janino codegen vs plan/schedule.
  // ------------------------------------------------------------------
  private def recursiveCost(s: SparkSession, sfDir: String): Unit = {
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    def run(dir: String): (Double, Double, Double, Double) = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val g0 = gcMillis(); val j0 = jit.getTotalCompilationTime
      SparkEntry.queries("q_recursive")(s, dir).count()
      graft.ops.Caches.release(); s.catalog.clearCache()
      ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9,
        (gcMillis() - g0) / 1e3, (jit.getTotalCompilationTime - j0) / 1e3)
    }
    def sweep(label: String): Unit = {
      println(s"-- $label")
      val (ww, wc, _, wj) = run("/root/testdata/sf0.001")
      println(f"warm(sf0.001): wall=$ww%.2f cpu=$wc%.1f jit=$wj%.1f")
      for (i <- 1 to 4) {
        val (t, c, g, j) = run(sfDir)
        println(f"run$i: wall=$t%.2f cpu=$c%.1f gc=$g%.1f jit=$j%.1f load=${osBean.getSystemLoadAverage}%.1f")
      }
    }
    // ONE sweep: the query itself clones a session and pins whole-stage
    // codegen OFF internally (the round-10 fix), so a probe-level conf
    // toggle changes nothing — two "ON vs OFF" sweeps would measure the
    // identical configuration and mislead. The historical ON-vs-OFF
    // matrix (pre-pin) lives in BASELINE.md round 10.
    sweep("bench shape (query pins codegen OFF internally)")
  }

  // ------------------------------------------------------------------
  // stream: fixed cost vs micro-batch count
  // ------------------------------------------------------------------

  private def streamFixedCost(s: SparkSession, sfDir: String): Unit = {
    import graft.streaming.PlanProbe.CapturedRun
    val root = graft.common.Scratch.dir("probe", "stream")
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    val files = 32
    // one export, exactly `files` files, reused by every run
    val in = s"$root/in"
    Tables.events(s, sfDir).select("ts", "event_type", "value")
      .repartition(files)
      .write.option("timestampFormat", tsFmt).json(in)
    val schema = StructType.fromDDL("ts TIMESTAMP, event_type STRING, value DOUBLE")
    val prev = s.conf.get("spark.sql.shuffle.partitions")

    def run(tag: String, ckpt: String, maxFiles: Option[Int],
            stateful: Boolean): (Double, Long) = {
      val out = s"$root/out-$tag-${System.nanoTime()}"
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val t0 = System.nanoTime()
      try {
        val src0 = s.readStream.schema(schema).option("timestampFormat", tsFmt)
        val src = maxFiles.fold(src0)(k => src0.option("maxFilesPerTrigger", k)).json(in)
        val plan =
          if (stateful)
            src.withWatermark("ts", "1 hour")
              .groupBy(window(col("ts"), "1 hour"), col("event_type"))
              .agg(count(lit(1)).as("n"))
          else src.select(col("event_type"), col("value"))
        val q = plan.writeStream
          .trigger(Trigger.AvailableNow())
          .format("parquet")
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start(out)
        q.runCaptured()
        val batches = q.recentProgress.count(_.numInputRows >= 0)
        ((System.nanoTime() - t0) / 1e9, batches.toLong)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }

    // warm the streaming engine once (JIT + state-store classloading)
    run("warm", s"$root/ckpt-warm", None, stateful = true)

    println(f"${"variant"}%-34s ${"batches"}%8s ${"wall_s"}%8s")
    for ((tag, maxFiles, stateful) <- Seq(
        ("stateful 1-batch (all 32 files)", None, true),
        ("stateful 4 batches (mfpt=8)", Some(8), true),
        ("stateful 8 batches (mfpt=4)", Some(4), true),
        ("stateful 32 batches (mfpt=1)", Some(1), true),
        ("stateless 1-batch", None, false),
        ("stateless 32 batches (mfpt=1)", Some(1), false))) {
      // two runs per variant, fresh checkpoints: report both (noise floor)
      val r1 = run(tag, s"$root/ckpt-$tag-a", maxFiles, stateful)
      val r2 = run(tag, s"$root/ckpt-$tag-b", maxFiles, stateful)
      println(f"$tag%-34s ${r1._2}%8d ${r1._1}%8.2f / ${r2._1}%.2f")
    }
    // restart on a drained checkpoint: zero new batches = pure fixed cost
    val ck = s"$root/ckpt-restart"
    run("restart-seed", ck, None, stateful = true)
    val (tRestart, _) = run("restart", ck, None, stateful = true)
    println(f"${"stateful restart, drained ckpt"}%-34s ${0}%8d $tRestart%8.2f")
  }

  // ------------------------------------------------------------------
  // dedupscale: 1x..10x corpus growth for the quadratic-risk dedup family
  // ------------------------------------------------------------------

  /** `k` replicas of the sf corpus; replica 0 is the original, replica r>0
    * maps three frequent letters to digit triples unique per replica, so
    * replicas share document SHAPE (length, shingle-df profile) but not
    * shingles — scaled data is new data. With `exact`, replicas are
    * verbatim copies: the adversarial case (buckets grow k-x, every
    * replica pair is a true near-dup). */
  private def scaled(docs: DataFrame, k: Int, exact: Boolean): DataFrame = {
    val parts = (0 until k).map { r =>
      val t =
        if (r == 0 || exact) col("text")
        else translate(col("text"), "eao", f"${(r * 137) % 1000}%03d")
      docs.select((col("doc_id") * 16 + r).as("doc_id"), t.as("text"))
    }
    parts.reduce(_ unionByName _)
  }

  private def dedupScale(s: SparkSession, sfDir: String, exact: Boolean): Unit = {
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm both pipelines at 1x so the k-sweep measures data, not codegen
    graft.ops.Dedup.editDistancePairs(scaled(docs, 1, exact), "doc_id", "text").count()
    graft.ops.Dedup.containmentPairs(scaled(docs, 1, exact), "doc_id", "text").count()
    graft.ops.Caches.release(); s.catalog.clearCache()
    println(f"${"k"}%3s ${"rows"}%9s ${"edit_s"}%8s ${"edit_pairs"}%11s ${"cont_s"}%8s ${"cont_pairs"}%11s")
    for (k <- Seq(1, 2, 5, 10)) {
      val corpus = scaled(docs, k, exact)
      val rows = corpus.count()
      val (te, ne) = time(graft.ops.Dedup.editDistancePairs(corpus, "doc_id", "text").count())
      graft.ops.Caches.release(); s.catalog.clearCache()
      val (tc, nc) = time(graft.ops.Dedup.containmentPairs(corpus, "doc_id", "text").count())
      graft.ops.Caches.release(); s.catalog.clearCache()
      println(f"$k%3d $rows%9d $te%8.2f $ne%11d $tc%8.2f $nc%11d")
    }
  }

  // ------------------------------------------------------------------
  // neardupindex: per-batch cost vs index size for the streaming LSH path
  // ------------------------------------------------------------------

  /** Does [[graft.streaming.Streaming.streamNearDupIndex]]'s per-batch cost
    * stay bounded by BATCH size as the persistent index grows? 10x the
    * bench corpus ingests in fixed-size waves; each wave's drain is timed
    * against a monotonically growing corpus/LSH index. The index-side work
    * per batch is one columnar scan + an equi-join on the compact bucket
    * key (the small banded batch is the build side), so the expected shape
    * is a small per-wave slope from the O(index) scan — superlinear growth
    * would mean the index join shuffles the index side per batch and needs
    * a bucket-partitioned layout. `exact` replicates verbatim (every wave
    * is near-dup-heavy against the index — maximal candidate fan-out);
    * realistic perturbs replicas into genuinely new text. */
  private def nearDupIndexScale(s: SparkSession, sfDir: String, exact: Boolean): Unit = {
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val root = graft.common.Scratch.dir("probe", s"ndi-${if (exact) "exact" else "real"}-${System.nanoTime()}")
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    val waves = 10
    val corpus10 = scaled(docs, waves, exact).persist()
    corpus10.count()
    val schema = StructType.fromDDL("doc_id BIGINT, text STRING")
    // codegen/JIT warmup on throwaway tables so wave 0 measures the engine
    locally {
      val wr = s"$root/warm"
      docs.limit(200).write.json(s"$wr/in")
      graft.streaming.Streaming.streamNearDupIndex(
        s.readStream.schema(schema).json(s"$wr/in"),
        graft.table.ManagedTable(s, s"$wr/corpus"),
        graft.table.ManagedTable(s, s"$wr/lsh"), "doc_id", "text")
    }
    val corpusT = graft.table.ManagedTable(s, s"$root/corpus")
    val lshT = graft.table.ManagedTable(s, s"$root/lsh")
    val in = s"$root/in"
    // offline candidate census, same banding as the op: per wave, how many
    // bucket-equal smaller-id pairs the drain will verify (prior = earlier
    // wave, or same wave with smaller id). Printed beside the wall so the
    // slope can be read against CANDIDATE volume — the confound that makes
    // "wall grows with waves" ambiguous (index size and candidate count
    // both grow linearly by construction in this replay).
    val census = {
      import graft.ops.Dedup
      val bands = 32; val k = 64; val rows = k / bands
      val b = corpus10
        .select(col("doc_id").as("id"),
          pmod(col("doc_id"), lit(waves)).cast("int").as("wave"),
          Dedup.shingles(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
        .withColumn("sig", Dedup.minhashSignature(col("sh"), k))
        .select(col("id"), col("wave"), explode(transform(
          sequence(lit(0), lit(bands - 1)),
          bb => xxhash64(bb, slice(col("sig"), bb * rows + 1, lit(rows)))))
          .as("bucket"))
      b.alias("l").join(b.alias("r"),
          expr("l.bucket = r.bucket AND r.id < l.id AND r.wave <= l.wave"))
        .select(col("l.wave").as("wave"), col("l.id"), col("r.id").as("pid"))
        .distinct()
        .groupBy("wave").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    // per-wave decomposition against the CURRENT tables, isolated from
    // the drain itself: the wall growth's suspects are (a) the whole-LSH-
    // index scan the bucket probe pays per batch, (b) the whole-corpus
    // TEXT scan the exact-verify semi-join pays per batch, (c) everything
    // else (candidate-volume-proportional verify, fixed engine cost) —
    // which one grows decides which fix is real (bucket-partitioned index
    // layout only attacks (a)).
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    println(f"${"wave"}%4s ${"index_rows"}%10s ${"batch_rows"}%10s ${"cand_pairs"}%10s ${"wall_s"}%7s ${"cpu_s"}%7s ${"lshscan"}%8s ${"txtscan"}%8s ${"probejoin"}%9s")
    for (w <- 0 until waves) {
      val batch = corpus10.where(pmod(col("doc_id"), lit(waves)) === w)
      val batchRows = batch.count()
      val indexRows = if (lshT.exists) lshT.read().count() else 0L
      val tLsh = if (lshT.exists) timed(noop(lshT.read())) else 0.0
      val tTxt = if (corpusT.exists) timed(noop(corpusT.read())) else 0.0
      val tProbe = if (lshT.exists) timed {
        import graft.ops.Dedup
        val bands = 32; val k = 64; val rows = k / bands
        val banded = batch
          .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
          .where(size(col("sh")) > 0)
          .withColumn("sig", Dedup.minhashSignature(col("sh"), k))
          .select(col("id"), explode(transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows)))))
            .as("bucket"))
        noop(banded.alias("b").join(lshT.read().alias("i"),
          expr("b.bucket = i.bucket AND i.id < b.id"))
          .select(col("b.id").as("id"), col("i.id").as("prior_id")))
      } else 0.0
      batch.write.mode("append").json(in)
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      graft.streaming.Streaming.streamNearDupIndex(
        s.readStream.schema(schema).json(in), corpusT, lshT, "doc_id", "text")
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"$w%4d $indexRows%10d $batchRows%10d ${census.getOrElse(w, 0L)}%10d $dt%7.2f $dc%7.1f $tLsh%8.2f $tTxt%8.2f $tProbe%9.2f")
    }
    corpus10.unpersist()
  }

  // ------------------------------------------------------------------
  // textskew: head-key growth for the vocabulary-keyed text aggregations
  // ------------------------------------------------------------------

  /** How [[graft.ops.TextOps.bigramNovelty]] and [[TextOps.pmiTop]] behave
    * when the bigram-frequency head grows: `exact` replication multiplies
    * every head bigram's corpus frequency by k (the adversarial straggler
    * case — one key owning k× the occurrences), realistic replication
    * grows the corpus with fresh vocabulary. Linear wall in k in BOTH
    * modes means no occurrence-level key carries a straggler partition:
    * every hot key collapses in a map-side combine before its shuffle. */
  private def textSkew(s: SparkSession, sfDir: String, exact: Boolean): Unit = {
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    graft.ops.TextOps.bigramNovelty(scaled(docs, 1, exact), "doc_id", "text").count()
    graft.ops.TextOps.pmiTop(scaled(docs, 1, exact), "text", 5L, 20).count()
    graft.ops.Caches.release(); s.catalog.clearCache()
    println(f"${"k"}%3s ${"rows"}%9s ${"novelty_s"}%10s ${"nov_rows"}%9s ${"pmi_s"}%8s")
    for (k <- Seq(1, 2, 5, 10)) {
      val corpus = scaled(docs, k, exact)
      val rows = corpus.count()
      val (tn, nn) = time(graft.ops.TextOps
        .bigramNovelty(corpus, "doc_id", "text").count())
      graft.ops.Caches.release(); s.catalog.clearCache()
      val (tp, _) = time(graft.ops.TextOps.pmiTop(corpus, "text", 5L, 20).count())
      graft.ops.Caches.release(); s.catalog.clearCache()
      println(f"$k%3d $rows%9d $tn%10.2f $nn%9d $tp%8.2f")
    }
  }
}
