package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and per-payload processing
  * (decode, feature-extract, resize, frame-sample) runs as expressions or
  * batched partition functions over those bytes.
  *
  * The container has no image/audio codecs, so the DECODE step itself is a
  * clearly-marked deterministic stub (md5-derived fake dimensions); the
  * Spark-side plumbing — binary schema, chunked frame sampling, batch
  * iterator shape, partitioning — is real and oracle-tested.
  *
  * Scale notes: payload bytes never hit the driver; every operator is a
  * per-row expression or a `mapPartitions` over the payload column, so the
  * plan stays embarrassingly parallel. At 100 TB the payload column
  * dominates scan width — queries that only need metadata must NOT touch
  * it, which is why metadata lives in separate top-level columns that
  * parquet can prune independently of the blob.
  */
object Multimodal {

  /** Pack a text column as a binary payload + typed metadata — the shape a
    * real ingest would give camera/scanner output. `content_type` rotates
    * deterministically by id so downstream dispatch is testable. */
  def pack(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      length(col(textCol).cast("binary")).as("byte_len"),
      when(pmod(col(idCol), lit(3)) === 0, "image/png")
        .when(pmod(col(idCol), lit(3)) === 1, "image/jpeg")
        .otherwise("audio/wav").as("content_type"))

  /** STUB DECODE — deterministic fake: derives "decoded" image dimensions
    * from an md5 hash of the payload bytes. A real deployment swaps this
    * single expression for a codec call (e.g. a batched native decoder);
    * everything around it (schema, pruning, partition shape) is unchanged. */
  def decodeImageMetaStub(payload: Column): Column = {
    val h = Dedup.h32(payload)
    struct(
      (pmod(h, lit(512)) + 64).as("width"),
      (pmod(shiftright(h, 9), lit(512)) + 64).as("height"),
      (pmod(h, lit(3)) + 1).as("channels"))
  }

  /** STUB RESIZE — deterministic fake: "resizes" by rehashing payload with
    * the target box; returns the new dimensions a real resampler would. */
  def resizeStub(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scale = lit(maxSide).cast("double") / greatest(w, h).cast("double")
    struct(
      when(scale >= 1.0, w).otherwise(floor(w * scale)).cast("long").as("width"),
      when(scale >= 1.0, h).otherwise(floor(h * scale)).cast("long").as("height"))
  }

  /** STUB FEATURE EXTRACTION — deterministic fake: a `dim`-component
    * embedding derived per component from an md5 of (payload, index),
    * mapped to [-0.5, 0.5). A real deployment swaps this one expression
    * for a batched encoder call (ONNX/JNI) with the identical column
    * shape — everything downstream (near-dup, ANN, k-NN join over the
    * produced `array<double>`) is unchanged. Identical payloads produce
    * identical embeddings, so multimodal near-dup is exercisable without
    * the codec libs. Map-only at any scale. */
  def featureStub(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      j => conv(substring(md5(concat(payload.cast("string"), lit(":"),
            j.cast("string"))), 1, 8), 16, 10).cast("double") /
          lit(4294967296.0) - lit(0.5))

  /** Frame sampling: split the payload into fixed-size byte chunks and emit
    * one row per chunk with its fingerprint — the video-frame / audio-window
    * extraction shape. Pure expressions (sequence + substring over binary),
    * so sampling N frames from a 100 TB corpus is one map-only stage. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   chunkBytes: Int): DataFrame = {
    val payload = col(payloadCol)
    val nFrames = ceil(length(payload).cast("double") / chunkBytes).cast("long")
    // sequence(0, -1) would generate a DESCENDING [0, -1] for an empty
    // payload — guard to an empty frame list instead (zero output rows)
    val frameIdxs = when(nFrames > 0, sequence(lit(0L), nFrames - 1))
      .otherwise(array().cast("array<bigint>"))
    df.select(
      col(idCol),
      explode(transform(frameIdxs,
        i => struct(
          i.as("frame_idx"),
          md5(call_function("substring", payload, i * chunkBytes + 1, lit(chunkBytes)))
            .as("frame_md5")))).as("frame"))
      .select(col(idCol), col("frame.frame_idx"), col("frame.frame_md5"))
  }

  /** One decoded-media record for the typed batch-decoder path. */
  case class Media(id: Long, payload: Array[Byte], contentType: String)

  /** Decoded features for one payload. */
  case class MediaFeatures(id: Long, byteLen: Int, width: Long, height: Long,
                           contentType: String)

  /** Batched partition decoder — the `mapPartitions` shape a real codec
    * binding uses (amortize codec init across a partition, stream rows,
    * never collect). The per-payload decode is the same deterministic stub
    * as [[decodeImageMetaStub]], computed JVM-side here.
    */
  def decodeBatch(ds: Dataset[Media]): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      // real codec would be initialized once per partition here
      it.map { m =>
        val md = java.security.MessageDigest.getInstance("MD5").digest(m.payload)
        val hex = md.take(4).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex, 16)
        MediaFeatures(m.id, m.payload.length,
          h % 512 + 64, (h >> 9) % 512 + 64, m.contentType)
      }
    }
  }
}
