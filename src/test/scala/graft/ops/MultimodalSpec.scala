package graft.ops

import graft.SparkSuite

/** Typed mapPartitions decode path (the batched-codec shape) agrees with
  * the expression-based stub decode. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("decodeBatch matches the expression stub dimensions") {
    val docs = Seq((1L, "hello world"), (2L, "a longer payload with bytes"))
      .toDF("doc_id", "text")
    val packed = Multimodal.pack(docs, "doc_id", "text")

    val viaExpr = packed
      .withColumn("m", Multimodal.decodeImageMetaStub(
        org.apache.spark.sql.functions.col("payload")))
      .select($"doc_id", $"m.width", $"m.height")
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    val typed = packed.select($"doc_id".as("id"), $"payload", $"content_type".as("contentType"))
      .as[Multimodal.Media]
    val viaBatch = Multimodal.decodeBatch(typed)
      .select($"id", $"width", $"height")
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    assert(viaExpr.toSeq === viaBatch.toSeq)
  }

  test("featureStub embeddings are deterministic per payload, in range") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "same bytes"), (2L, "same bytes"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      Multimodal.featureStub(col("text").cast("binary"), 8).as("emb"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(1L) === got(2L), "identical payloads must embed identically")
    assert(got(1L) !== got(3L))
    assert(got.values.forall(v => v.size == 8 && v.forall(x => x >= -0.5 && x < 0.5)))
  }

  test("sampleFrames yields zero rows for an empty payload") {
    val df = Seq((1L, ""), (2L, "abcdef")).toDF("doc_id", "text")
      .withColumn("payload", $"text".cast("binary"))
    val frames = Multimodal.sampleFrames(df, "doc_id", "payload", chunkBytes = 4)
    val perDoc = frames.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perDoc == Map(2L -> 2L)) // doc 1 absent, doc 2 has ceil(6/4)=2
  }

  test("resizeStub caps the long side and preserves aspect ratio direction") {
    val df = Seq((1L, 400L, 200L)).toDF("id", "width", "height")
      .withColumn("m", org.apache.spark.sql.functions.struct($"width", $"height"))
      .withColumn("r", Multimodal.resizeStub($"m", 100))
    val (w, h) = df.select($"r.width", $"r.height").as[(Long, Long)].head()
    assert(w === 100L && h === 50L)
  }
}
