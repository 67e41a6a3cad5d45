package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class GraphSpec extends SparkSuite {

  private def docs = spark.read.parquet(s"$sf0/documents.parquet")

  test("pagerank matches an exact in-memory fixed-point reference") {
    val n = docs.count()
    val edges = Graph.deriveEdges(docs, "doc_id", 3, n)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // identical integer arithmetic, sequential: the distributed result
    // must be BIT-equal (fixed point leaves no room for sum-order drift)
    var r = Array.fill(n.toInt)(Graph.T / n)
    val base = 15L * Graph.T / (100L * n)
    for (_ <- 1 to 5) {
      val in = Array.fill(n.toInt)(0L)
      edges.foreach { case (s, d) => in(d.toInt) += r(s.toInt) / 3 }
      r = in.map(s => base + 85L * s / 100L)
    }
    val got = Graph.pagerank(docs, "doc_id", 3, 5)
      .select("doc_id", "rank_micro").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got.size == n)
    r.zipWithIndex.foreach { case (exp, id) => assert(got(id.toLong) == exp, s"id=$id") }
  }

  test("pagerank conserves mass up to integer truncation loss") {
    val n = docs.count()
    val total = Graph.pagerank(docs, "doc_id", 3, 5)
      .agg(sum("rank_micro")).head.getLong(0)
    // each iteration truncates < 3 units per edge (DIV 3), < 1 per node
    // (DIV 100) and < 1 per node in the base term
    assert(total <= Graph.T)
    assert(total >= Graph.T - 5 * (3 * 3 * n + 2 * n), s"total=$total")
  }

  test("hits matches an exact in-memory fixed-point reference") {
    val n = docs.count()
    val edges = Graph.deriveEdges(docs, "doc_id", 3, n)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var hub = Array.fill(n.toInt)(Graph.TH / n)
    var auth = Array.fill(n.toInt)(0L)
    for (_ <- 1 to 3) {
      val a = Array.fill(n.toInt)(0L)
      edges.foreach { case (s, d) => a(d.toInt) += hub(s.toInt) }
      val at = math.max(a.sum, 1L)
      auth = a.map(v => v * Graph.TH / at)
      val h = Array.fill(n.toInt)(0L)
      edges.foreach { case (s, d) => h(s.toInt) += auth(d.toInt) }
      val ht = math.max(h.sum, 1L)
      hub = h.map(v => v * Graph.TH / ht)
    }
    val got = Graph.hits(docs, "doc_id", 3, 3)
      .select("doc_id", "hub_nano", "auth_nano").collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    assert(got.size == n)
    (0 until n.toInt).foreach { id =>
      assert(got(id.toLong) == ((hub(id), auth(id))), s"id=$id") }
  }

  test("hits is independent of physical layout and L1-bounded") {
    val a = Graph.hits(docs, "doc_id", 3, 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val b = Graph.hits(docs.repartition(7), "doc_id", 3, 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
    // L1 normalization: each score vector sums to TH up to truncation
    // loss (< 1 unit per node per normalization)
    val n = docs.count()
    val sums = (a.map(_._1).sum, a.map(_._2).sum)
    assert(sums._1 <= Graph.TH && sums._1 >= Graph.TH - n)
    assert(sums._2 <= Graph.TH && sums._2 >= Graph.TH - n)
  }

  test("pagerank is independent of physical layout") {
    val a = Graph.pagerank(docs, "doc_id", 3, 3)
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val b = Graph.pagerank(docs.repartition(7), "doc_id", 3, 3)
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(a == b)
  }

  test("neighborQuality: exact fixed-point means, orphans stay null") {
    val scored = TextOps.qualityScore(docs)
    val nq = Graph.neighborQuality(scored, "doc_id", "quality_score", 3)
    val n = docs.count()
    assert(nq.count() == n)
    assert(nq.agg(sum("in_deg")).head.getLong(0) == 3 * n)
    val rows = nq.collect()
    rows.foreach { r =>
      val inDeg = r.getLong(2)
      if (inDeg == 0) assert(r.isNullAt(3), s"orphan ${r.getLong(0)}")
      else {
        val v = r.getDouble(3)
        assert(v >= 0.0 && v <= 1.0, s"range ${r.getLong(0)}")
      }
    }
    // brute-force check on collected edges + scores
    val q4 = scored.select(col("doc_id"),
        round(col("quality_score") * 10000).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Graph.deriveEdges(docs, "doc_id", 3, n)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = edges.groupBy(_._2).map { case (dst, es) =>
      dst -> es.map(e => q4(e._1)).sum.toDouble / es.size / 10000.0 }
    rows.filter(_.getLong(2) > 0).foreach { r =>
      assert(r.getDouble(3) == want(r.getLong(0)), s"mean ${r.getLong(0)}")
    }
  }

  test("degrees: in-degree sums to the edge count, spine keeps orphans") {
    val n = docs.count()
    val deg = Graph.degrees(docs, "doc_id", 3)
    assert(deg.count() == n)
    assert(deg.agg(sum("in_deg")).head.getLong(0) == 3 * n)
    assert(deg.where(col("out_deg") =!= 3).count() == 0)
    val orphans = deg.where(col("is_orphan")).count()
    assert(orphans == deg.where(col("in_deg") === 0).count())
  }

  test("triangles match a brute-force count over the derived edges") {
    val n = docs.count()
    val und = Graph.deriveEdges(docs, "doc_id", 3, n)
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = for {
      (a, b) <- und; (b2, c) <- und
      if b2 == b && und.contains((a, c))
    } yield (a, b, c)
    val got = Graph.triangles(docs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    // each triangle appears exactly once, in a<b<c orientation
    got.foreach { case (a, b, c) => assert(a < b && b < c) }
    assert(got.nonEmpty, "derived graph should contain triangles")
  }
}
