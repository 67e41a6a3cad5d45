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

  test("t-digest quantiles stay within rank tolerance on a skewed stream") {
    // log-skewed values (heavy head, long tail) stress the tail clusters
    val rows = (1 to 20000).map(i => ((i % 7).toString, math.pow(1.0005, i)))
    val df = rows.toDF("g", "v").repartition(13)
    val got = Sketches.tdigestContract(df, "v", "g",
        Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99), cap = 100, tol = 0.03)
      .as[(Double, Boolean)].collect().toMap
    assert(got.size === 7)
    assert(got.values.forall(identity), s"rank bound violated: $got")
    // the sketch is actually small: a whole-corpus digest at cap=100
    // stays under the 2·cap centroid bound of the uniform k0 ceiling
    val td = Sketches.TDigestAgg(100)
    val local = rows.map(_._2).foldLeft(td.zero)((b, x) => td.reduce(b, (x, 1.0)))
    assert(td.finish(local).length / 2 <= 2 * 100)
  }

  test("bottom-k sketch equals the k smallest distinct values, any split") {
    val rng = new scala.util.Random(7)
    val k = 32
    val data = Seq.fill(5000)(rng.nextLong(1L << 60)) ++
      Seq.fill(500)(rng.nextLong(40)) // force duplicates
    val expected = data.distinct.sorted.take(k)
    val agg = Sketches.BottomKAgg(k)
    val whole = data.foldLeft(agg.zero)(agg.reduce)
    assert(whole.toSeq === expected)
    // arbitrary merge tree gives the identical sketch
    val parts = data.grouped(613).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    assert(parts.reduce(agg.merge).toSeq === expected)
    // distributed udaf path with duplicates across partitions
    val dist = data.toDF("h").repartition(11)
      .agg(udaf(agg, Encoders.scalaLong)(col("h")).as("sk"))
      .as[Array[Long]].head()
    assert(dist.toSeq === expected)
  }

  test("kmvContract estimates within the 3-sigma bound on uniform keys") {
    val df = (1 to 9000).map(i => (s"g${i % 3}", i * 37L)).toDF("g", "v")
    val out = Sketches.kmvContract(df, "v", "g", k = 128)
      .as[(String, Long, Option[Long], Double, Boolean)].collect()
    assert(out.length === 4) // 3 groups + __all__
    assert(out.forall(_._5), s"bound violated: ${out.mkString(", ")}")
    val all = out.find(_._1 == "__all__").get
    assert(all._2 === 9000L)
  }
}
