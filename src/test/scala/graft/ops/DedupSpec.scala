package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("dedupClusters: driver union-find and distributed propagation agree") {
    // chain 1-2-3, clique 10-11, isolated 20/21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")

    val viaUnionFind = Dedup.dedupClusters(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

    val viaPropagation = {
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      val labels = Dedup.propagateLabels(edges)
      docs.select(col("doc_id").as("id"))
        .join(labels, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }

    val expected = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L)
    assert(viaUnionFind === expected)
    assert(viaPropagation === expected)
  }

  test("exact dedup groups by content, not by id") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(docs, "text", "doc_id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(1L -> 2L, 3L -> 1L))
  }
}
