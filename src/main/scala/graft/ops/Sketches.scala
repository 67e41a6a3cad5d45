package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a typed, MERGEABLE
  * Spark `Aggregator` — the frequency-estimation sibling of the HLL
  * distinct sketches in `q_approx_distinct`/`q_sketch_union`.
  *
  * Scale shape: the buffer is a fixed depth×width long array (40 KB at the
  * default 5×1024), so a 100 TB token stream reduces map-side to one
  * constant-size buffer per partition per group before the shuffle — the
  * exact heavy-hitter count (`x_text_top_ngrams`) shuffles the full
  * vocabulary instead. Sketches MERGE by elementwise sum, so per-source /
  * per-day sketches persist once and any ad-hoc union (all-time, per-region)
  * is a constant-size fold that never rescans the corpus. Point lookups are
  * `min` over the depth rows; the hash positions of a literal probe token
  * are computed at PLAN time, so estimation compiles to codegen'd
  * `element_at`/`least` with no UDF in the hot path.
  *
  * Determinism: the row hashes are seeded MurmurHash3 over the token — no
  * RNG, so the sketch (and the error-contract booleans the oracle checks)
  * is a pure function of the corpus.
  */
object Sketches {

  /** Cell index of `token` in hash row `row` (seeded MurmurHash3). */
  def cmsPos(token: String, row: Int, width: Int): Int =
    math.floorMod(MurmurHash3.stringHash(token, 0x9747b28c + row), width)

  /** The typed Aggregator: String tokens → depth×width counter array. */
  case class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(b: Array[Long], tok: String): Array[Long] = {
      var d = 0
      while (d < depth) { b(d * width + cmsPos(tok, d, width)) += 1L; d += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Point estimate of `token` from a sketch COLUMN: min over the depth
    * rows at plan-time-computed positions (pure `element_at`/`least`). */
  def cmsEstimate(sk: Column, token: String, depth: Int, width: Int): Column =
    least((0 until depth).map(d =>
      element_at(sk, d * width + cmsPos(token, d, width) + 1)): _*)

  /** Elementwise-sum fold merging a collected list of sketches. */
  private def mergeAll(sks: Column, depth: Int, width: Int): Column =
    aggregate(sks, array_repeat(lit(0L), depth * width),
      (acc, x) => zip_with(acc, x, (a, b) => a + b))

  /** Two-level heavy-hitter error-contract check over the document token
    * stream: per-source sketches built in one aggregation pass, merged into
    * a global sketch (constant-size fold — the corpus is scanned exactly
    * once), then each literal probe token's estimate is checked against its
    * exact count: CMS guarantees `exact <= est` always, and
    * `est <= exact + slack·N/width` holds deterministically here (expected
    * collision mass per row is N/width; the min over `depth` rows sits far
    * under `slack`× that). The oracle recomputes the exact counts and pins
    * the booleans TRUE — a broken sketch, merge, or estimate hash-mismatches. */
  def cmsContract(df: DataFrame, textCol: String, sourceCol: String,
                  probeTokens: Seq[String], depth: Int = 5, width: Int = 1024,
                  slack: Double = 8.0): DataFrame = {
    val spark = df.sparkSession
    val cms = udaf(CountMinAgg(depth, width), Encoders.STRING)
    val toks = df.select(col(sourceCol).as("source"),
      explode(TextOps.tokens(col(textCol))).as("token"))
    val perSource = toks.groupBy(col("source"))
      .agg(cms(col("token")).as("sk"), count(lit(1)).as("n"))
    val global = perSource.agg(
      mergeAll(collect_list(col("sk")), depth, width).as("sk"),
      sum(col("n")).as("n"))
    val exact = toks.where(col("token").isin(probeTokens: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    import spark.implicits._
    probeTokens.toDF("token")
      .join(exact, Seq("token"), "left")
      .withColumn("exact_count", coalesce(col("cnt"), lit(0L))).drop("cnt")
      .crossJoin(broadcast(global))
      .select(col("token"), col("exact_count"),
        probeTokens.map(t =>
          when(col("token") === t,
            cmsEstimate(col("sk"), t, depth, width)).otherwise(lit(null)))
          .reduce(coalesce(_, _)).as("est"),
        col("n"))
      .select(col("token"), col("exact_count"),
        (col("est") >= col("exact_count") &&
          col("est") <= col("exact_count") +
            ceil(lit(slack) * col("n") / lit(width))).as("within_bound"))
  }

  // ------------------------------------------------------------------
  // t-digest quantile sketch
  // ------------------------------------------------------------------

  /** Merging t-digest (Dunning & Ertl 2019) as a typed mergeable
    * Aggregator — the quantile sibling of [[CountMinAgg]]. The buffer is a
    * fixed-capacity flat double array (`(1 + 2·8·cap)` slots: a length
    * marker + (mean, weight) pairs); values append until the scratch
    * region fills, then one in-place compression pass sorts by mean and
    * merges adjacent centroids under the uniform k0 weight ceiling
    * `W/cap` — so map-side state is constant-size and the shuffle
    * carries ≤ ~2·cap centroids per group (the q(1−q) tail-refined
    * scale would grow log(W)-fold; the uniform ceiling trades tail VALUE
    * resolution for a hard size bound, and the rank contract is what we
    * assert). Input is (value, weight) pairs, which makes digests
    * SELF-mergeable: feeding one digest's centroids into another digest
    * IS the merge, enabling the two-level per-source → global rollup
    * without rescanning raw data. Rank error of the
    * percentile-disc-style estimate is bounded by the largest cluster
    * share — ≤ ~2/cap. No RNG anywhere — the digest is a pure function
    * of the input multiset and partition boundaries, and the error
    * CONTRACT holds under any layout. */
  case class TDigestAgg(cap: Int) extends Aggregator[(Double, Double), Array[Double], Array[Double]] {
    private val scratch = 8 * cap
    def zero: Array[Double] = new Array[Double](1 + 2 * scratch)
    def reduce(b: Array[Double], in: (Double, Double)): Array[Double] = {
      var n = b(0).toInt
      if (n >= scratch) { compress(b); n = b(0).toInt }
      b(1 + 2 * n) = in._1
      b(2 + 2 * n) = in._2
      b(0) = n + 1
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      val m = b(0).toInt
      var i = 0
      while (i < m) {
        reduce(a, (b(1 + 2 * i), b(2 + 2 * i)))
        i += 1
      }
      a
    }
    def finish(b: Array[Double]): Array[Double] = {
      compress(b)
      val n = b(0).toInt
      val out = new Array[Double](2 * n)
      System.arraycopy(b, 1, out, 0, 2 * n)
      out
    }
    /** Sort pairs by mean and re-cluster under the k0 ceiling, in place. */
    private def compress(b: Array[Double]): Unit = {
      val n = b(0).toInt
      if (n <= 1) return
      val pairs = Array.tabulate(n)(i => (b(1 + 2 * i), b(2 + 2 * i)))
        .sortBy(p => (p._1, p._2))
      var total = 0.0
      pairs.foreach(total += _._2)
      val ceilW = math.max(1.0, total / cap)
      var (m, w) = pairs(0)
      var out = 0
      var i = 1
      while (i < n) {
        val (m2, w2) = pairs(i)
        if (w + w2 <= ceilW) {
          m = (m * w + m2 * w2) / (w + w2)
          w += w2
        } else {
          b(1 + 2 * out) = m; b(2 + 2 * out) = w; out += 1
          m = m2; w = w2
        }
        i += 1
      }
      b(1 + 2 * out) = m; b(2 + 2 * out) = w
      b(0) = out + 1
    }
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** Explode a flattened-centroid sketch column into (m, w) rows. */
  private def centroidRows(df: DataFrame, sk: String): DataFrame =
    df.select(explode(expr(
        s"transform(sequence(0, int(size($sk) / 2) - 1)," +
          s" i -> struct(element_at($sk, i * 2 + 1) AS m," +
          s" element_at($sk, i * 2 + 2) AS w))")).as("c"))
      .select(col("c.m").as("m"), col("c.w").as("w"))

  /** Two-level quantile error-contract check: per-group t-digests in one
    * pass over the data, merged into a global digest by re-digesting the
    * ≤cap-per-group centroid table (raw data is scanned exactly once for
    * the sketch), each probe quantile estimated percentile-disc-style
    * from the ≤cap-row global centroid table, and the estimate's TRUE
    * rank (one filtered count over the raw values per probe — the audit
    * pass) checked against q ± tol. The oracle pins the booleans TRUE:
    * a broken append, compression, merge, or estimate hash-mismatches. */
  def tdigestContract(df: DataFrame, valCol: String, groupCol: String,
                      probes: Seq[Double], cap: Int = 100,
                      tol: Double = 0.03): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val td = udaf(TDigestAgg(cap),
      ExpressionEncoder[(Double, Double)]())
    val vals = df.select(col(groupCol).as("g"),
      col(valCol).cast("double").as("v"))
    val perGroup = vals.groupBy(col("g"))
      .agg(td(col("v"), lit(1.0)).as("sk"))
    val globalSk = centroidRows(perGroup, "sk")
      .agg(td(col("m"), col("w")).as("sk"))
    // cumulative weight over the <= cap centroid rows (the one
    // unpartitioned window is bounded by the sketch size, never the data)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("m"), col("w"))
    val cum = centroidRows(globalSk, "sk")
      .withColumn("cum", sum(col("w")).over(w))
      .withColumn("total", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val ests = probes.toDF("q").crossJoin(cum)
      .where(col("cum") >= col("q") * col("total"))
      .groupBy(col("q")).agg(min(col("m")).as("est"))
    val n = vals.count()
    vals.crossJoin(broadcast(ests))
      .groupBy(col("q"), col("est"))
      .agg(count(when(col("v") <= col("est"), 1)).as("le"))
      .select(col("q"),
        (abs(col("le") / lit(n.toDouble) - col("q")) <= tol).as("within_bound"))
  }

  // ------------------------------------------------------------------
  // KMV (bottom-k) distinct-count sketch
  // ------------------------------------------------------------------

  /** 60-bit hash both engines compute bit-identically: the first 15 hex
    * chars of md5 of the value's decimal/string form, parsed base-16
    * (DuckDB: `CAST(concat('0x', substr(md5(v),1,15)) AS BIGINT)`). 60
    * bits keeps the value positive in a signed long on both sides. */
  def kmvHash(v: Column): Column =
    conv(substring(md5(v.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Bottom-k sketch of DISTINCT hash values (Bar-Yossef et al. 2002) as
    * a typed mergeable Aggregator — the distinct-count sibling of
    * [[CountMinAgg]]. Buffer = sorted array of the k smallest distinct
    * hashes seen; constant size, order-insensitive, so map-side partial
    * aggregation applies and the shuffle carries ≤ k longs per group.
    * Estimator: k < sketch capacity ⇒ the sketch IS the distinct set
    * (exact); else (k−1)·2^60 / h_(k) with relative std error ≈ 1/√(k−2).
    * Unlike HLL the sketch is a pure function of the input SET — no RNG,
    * no bias correction tables — so an oracle can replay the estimate to
    * the last bit. */
  case class BottomKAgg(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private def insert(b: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) b // distinct-set semantics: duplicates are no-ops
      else {
        val ins = -pos - 1
        if (ins >= k) b // beyond the current kth smallest: never in sketch
        else {
          val n = math.min(b.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }
    def zero: Array[Long] = Array.empty
    def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var r = a; var i = 0
      while (i < b.length) { r = insert(r, b(i)); i += 1 }
      r
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** KMV estimate from a sorted sketch COLUMN (2^60 and (k−1)·2^60 are
    * exact doubles, so the one rounded division is engine-portable). */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
          try_element_at(sk, lit(k)).cast("double"), 2))

  /** Two-level distinct-count contract: per-group bottom-k sketches in one
    * aggregation pass, merged into a global sketch with pure array SQL
    * (`slice(array_sort(array_distinct(flatten(...))))` — the k smallest
    * of a union of bottom-k sets IS the union's bottom-k), each estimate
    * emitted beside the exact distinct count, its kth hash, and the
    * 3σ-bound boolean. The oracle replays hash, kth-order statistic,
    * estimate arithmetic, and bound — a broken insert, merge, or
    * estimator hash-mismatches on `kth`/`est` directly. */
  def kmvContract(df: DataFrame, valCol: String, groupCol: String,
                  k: Int = 128): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val kmv = udaf(BottomKAgg(k), Encoders.scalaLong)
    val hashed = df.select(col(groupCol).cast("string").as("grp"),
      col(valCol).as("v"), kmvHash(col(valCol)).as("hv"))
    val perGroup = hashed.groupBy(col("grp"))
      .agg(kmv(col("hv")).as("sk"), count_distinct(col("v")).as("n_exact"))
    val merged = perGroup.agg(
      slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))),
        1, k).as("sk"))
    val globalRow = merged.crossJoin(
        hashed.agg(count_distinct(col("v")).as("n_exact")))
      .select(lit("__all__").as("grp"), col("sk"), col("n_exact"))
    perGroup.select(col("grp"), col("sk"), col("n_exact"))
      .unionByName(globalRow)
      .select(col("grp"), col("n_exact"),
        try_element_at(col("sk"), lit(k)).as("kth"),
        kmvEstimate(col("sk"), k).as("est"))
      .withColumn("within_bound",
        abs(col("est") / col("n_exact") - 1.0) <= 3.0 / math.sqrt(k - 2.0))
  }

  /** Pairwise distinct-set OVERLAP estimation from the same bottom-k
    * sketches (the theta-sketch intersection recipe on KMV state): for
    * each group pair, the union sketch is the k smallest of the two
    * sketch sets combined, θ its kth value; the fraction ρ of the
    * combined sketch's sub-θ hashes present in BOTH sketches estimates
    * |A∩B| as ρ·est(|A∪B|). Below capacity the sketches ARE the distinct
    * sets and the result is exact. Everything — sketch, θ, ρ, estimate
    * arithmetic, bound — is a pure function of the input sets, so the
    * oracle replays it bit-for-bit. Sketch pairing is a join over
    * |groups| sketch rows, never over data. */
  def kmvOverlapContract(df: DataFrame, valCol: String, groupCol: String,
                         k: Int = 128): DataFrame = {
    val kmv = udaf(BottomKAgg(k), Encoders.scalaLong)
    val hashed = df.select(col(groupCol).cast("string").as("grp"),
      col(valCol).as("v"), kmvHash(col(valCol)).as("hv"))
    val perGroup = hashed.groupBy(col("grp")).agg(kmv(col("hv")).as("sk"))
    val dv = hashed.select(col("grp"), col("v")).distinct()
    val exact = dv.as("a").join(dv.as("b"),
        col("a.v") === col("b.v") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(count(lit(1)).as("n_inter"))
    val pairs = perGroup.as("x").join(perGroup.as("y"),
        col("x.grp") < col("y.grp"))
      .select(col("x.grp").as("grp_a"), col("y.grp").as("grp_b"),
        col("x.sk").as("ska"), col("y.sk").as("skb"))
      .withColumn("u", slice(array_sort(array_distinct(
        concat(col("ska"), col("skb")))), 1, k))
      .withColumn("common", array_intersect(col("ska"), col("skb")))
    val theta = try_element_at(col("u"), lit(k))
    val estU = lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
      theta.cast("double")
    val cnt = size(filter(col("common"), h => h <= theta))
    pairs
      .join(exact, Seq("grp_a", "grp_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("est_inter",
        when(size(col("u")) < k, size(col("common")).cast("double"))
          .otherwise(round(cnt.cast("double") / lit(k.toDouble) * estU, 2)))
      .withColumn("within_bound",
        when(size(col("u")) < k, col("est_inter") === col("n_inter").cast("double"))
          .otherwise(abs(col("est_inter") - col("n_inter")) <=
            lit(3.0 / math.sqrt(k.toDouble)) * estU))
      .select("grp_a", "grp_b", "n_inter", "est_inter", "within_bound")
  }
}
