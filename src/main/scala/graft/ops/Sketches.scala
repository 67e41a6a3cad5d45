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
}
