package graft.ops

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.SparkSuite

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private val depth = 5
  private val width = 64 // tiny width so collisions actually occur

  // Zipf-ish corpus: token t_k appears ~1000/k times
  private val corpus: Seq[String] =
    (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"t_$k"))

  private def estimate(sk: Array[Long], tok: String): Long =
    (0 until depth).map(d => sk(d * width + Sketches.cmsPos(tok, d, width))).min

  test("estimates never undercount and respect the epsilon bound") {
    val agg = Sketches.CountMinAgg(depth, width)
    val sk = corpus.foldLeft(agg.zero)(agg.reduce)
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong)
    val n = corpus.size
    exact.foreach { case (tok, cnt) =>
      val est = estimate(sk, tok)
      assert(est >= cnt, s"$tok undercounted: $est < $cnt")
      assert(est <= cnt + 8 * n / width, s"$tok over bound: $est vs $cnt")
    }
    assert(estimate(sk, "never_seen") <= 8L * n / width)
  }

  test("merge of split sketches is bit-identical to the whole-corpus sketch") {
    val agg = Sketches.CountMinAgg(depth, width)
    val (a, b) = corpus.splitAt(corpus.size / 3)
    val whole = corpus.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq === whole.toSeq)
  }

  test("the distributed udaf path agrees with the local fold") {
    val agg = Sketches.CountMinAgg(depth, width)
    val local = corpus.foldLeft(agg.zero)(agg.reduce)
    val dist = corpus.toDF("token").repartition(7)
      .agg(udaf(agg, Encoders.STRING)(col("token")).as("sk"))
      .as[Array[Long]].head()
    assert(dist.toSeq === local.toSeq)
  }
}
