package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and per-payload processing
  * (decode, feature-extract, resize, frame-sample) runs as expressions or
  * batched partition functions over those bytes.
  *
  * DECODE IS REAL wherever the format needs no codec library:
  * [[graft.functions.ImageHeaderMeta]] parses PNG IHDR chunks and JPEG
  * SOFn frame headers, [[graft.functions.AudioHeaderMeta]] walks RIFF/WAVE
  * chunks for channels/sample-rate/bit-depth/duration,
  * [[graft.functions.PcmFrameStats]] decodes the WAV `data` chunk's raw
  * int16 samples into frame RMS / zero-crossing / peak signals,
  * [[graft.functions.PpmPixelStats]] decodes P6 PPM rasters to per-channel
  * pixel means, [[graft.functions.PngPixelStats]] is a full PNG pixel
  * decode (zlib IDAT inflate + five-filter scanline reconstruction — PNG's
  * "compression" is plain zlib, no entropy-coding tables needed), and
  * [[graft.functions.JpegPixelStats]] is a full JPEG decode for BOTH
  * sequential baseline and PROGRESSIVE (SOF2 multi-scan: spectral
  * selection, successive approximation, EOBn runs) grayscale streams
  * (Huffman entropy decode honoring in-stream DHT/DQT + dequant +
  * fixed-point integer IDCT, interop-pinned against ImageIO in both
  * directions) — all byte-level, pure JVM.
  * [[packMedia]]/[[packPpm]]/[[packPng]]/[[packJpeg]]/[[packJpegProgressive]]
  * synthesize payloads carrying spec-valid streams so the oracle replays
  * every parsed field AND every decoded sample/pixel statistic — and
  * compressed audio is real too ([[packUlaw]]/[[packAlaw]]'s G.711 laws
  * replay closed-form in SQL, [[packAdpcm]]'s IMA ADPCM pins against an
  * independent Python port). Only arithmetic-coded JPEG (patent-era and
  * decoder-rare — with no independent arithmetic decoder available to
  * interop against, a self-consistent implementation would be
  * unverifiable, so the gap stays explicit) and learned feature
  * embeddings (need model weights the container lacks) remain
  * clearly-marked deterministic stubs, while the Spark-side plumbing —
  * binary schema, chunked frame sampling, batch iterator shape,
  * partitioning — is real and oracle-tested throughout.
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

  /** Pack a text column as a binary payload carrying a SPEC-VALID image
    * header: PNG rows get a real 8-byte signature + IHDR chunk, JPEG rows
    * a real SOI + SOF0 frame header (dimensions/channels derived from the
    * id by fixed arithmetic so the DuckDB oracle can replay them without
    * parsing bytes), audio rows stay raw. [[imageMeta]] then reads the
    * dimensions back OUT of the bytes — if the parser misreads an offset
    * or endianness, the oracle hash mismatches. Header synthesis is plain
    * hex-string expressions (`unhex(concat(...))`) — map-only. */
  def packMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val w = pmod(id, lit(512)) + 64
    val h = pmod(id * 7, lit(512)) + 64
    def hex8(c: Column) = lpad(hex(c), 8, "0")
    def hex4(c: Column) = lpad(hex(c), 4, "0")
    // PNG: sig(8) len=13(4) "IHDR"(4) w(4) h(4) depth=8(1) colortype(1)
    //      compression/filter/interlace(3) crc(4, unchecked) = 33 bytes
    val pngColor = when(pmod(id, lit(2)) === 0, "02").otherwise("06") // rgb / rgba
    val pngHdr = concat(lit("89504E470D0A1A0A0000000D49484452"),
      hex8(w), hex8(h), lit("08"), pngColor, lit("00000000000000"))
    // JPEG: SOI(2) SOF0 marker(2) len=8+3n(2) precision(1) h(2) w(2)
    //       ncomp(1) 3 bytes per component = 12+3n bytes
    val nComp = when(pmod(id, lit(2)) === 0, lit(1)).otherwise(lit(3))
    val jpgHdr = concat(lit("FFD8FFC0"), hex4(nComp * 3 + 8), lit("08"),
      hex4(h), hex4(w), lpad(hex(nComp), 2, "0"),
      when(pmod(id, lit(2)) === 0, lit("000000")).otherwise(lit("000000000000000000")))
    // WAV: full 44-byte RIFF/WAVE PCM header (all multi-byte fields
    // LITTLE-endian, so each is emitted byte-reversed). sample rate
    // 8000/16000 and channels 1/2 by id parity; 16-bit samples; the data
    // chunk declares the text length, so duration = tlen / byte_rate.
    def hexb(c: Column) = lpad(hex(pmod(c, lit(256))), 2, "0")
    def le16h(c: Column) = concat(hexb(c), hexb(floor(c / 256)))
    def le32h(c: Column) =
      concat(hexb(c), hexb(floor(c / 256)), hexb(floor(c / 65536)),
        hexb(floor(c / 16777216)))
    val par = pmod(id, lit(2))
    val sr = (par + 1) * 8000
    val ch = par + 1
    val byteRate = sr * ch * 2
    val dataLen = length(col(textCol).cast("binary"))
    val wavHdr = concat(
      lit("52494646"), le32h(dataLen + 36), lit("57415645"),   // RIFF size WAVE
      lit("666D7420"), le32h(lit(16)), le16h(lit(1)),          // fmt_ 16 pcm
      le16h(ch), le32h(sr), le32h(byteRate),
      le16h(ch * 2), le16h(lit(16)),                           // align bits
      lit("64617461"), le32h(dataLen))                         // data size
    val hdr = when(pmod(id, lit(3)) === 0, pngHdr)
      .when(pmod(id, lit(3)) === 1, jpgHdr)
      .otherwise(wavHdr)
    df.select(
      id,
      concat(unhex(hdr), col(textCol).cast("binary")).as("payload"),
      when(pmod(id, lit(3)) === 0, "image/png")
        .when(pmod(id, lit(3)) === 1, "image/jpeg")
        .otherwise("audio/wav").as("content_type"))
      .withColumn("byte_len", length(col("payload")))
  }

  /** REAL image-header decode: struct(format, width, height, channels)
    * parsed from PNG/JPEG header bytes, null for anything else — see
    * [[graft.functions.ImageHeaderMeta]]. */
  def imageMeta(payload: Column): Column =
    graft.functions.GraftFunctions.imageHeaderMeta(payload)

  /** REAL audio-header decode: struct(format, channels, sample_rate, bits,
    * data_bytes, seconds) parsed from RIFF/WAVE header bytes, null for
    * anything else — see [[graft.functions.AudioHeaderMeta]]. Duration is
    * header-declared (`data` size / byte rate); decoding SAMPLES still
    * needs a codec and remains out of scope. */
  def audioMeta(payload: Column): Column =
    graft.functions.GraftFunctions.audioHeaderMeta(payload)

  /** REAL PCM sample decode: one row per fixed-width audio frame with
    * (frame_idx, n_samples, rms, zero_crossings, peak) computed from the
    * WAV payload's raw 16-bit LE samples — see
    * [[graft.functions.PcmFrameStats]]. Rows whose payload is not a
    * parseable WAV produce nothing. Map-only: explode of a per-row
    * expression, no shuffle at any corpus size. */
  def pcmFrames(df: DataFrame, idCol: String, payloadCol: String,
                frameSamples: Int): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.GraftFunctions
          .pcmFrameStats(col(payloadCol), frameSamples)).as("f"))
      .select(col(idCol), col("f.frame_idx"), col("f.n_samples"),
        round(col("f.rms"), 4).as("rms"),
        col("f.zero_crossings"), col("f.peak"))

  /** Pack a text column as a COMPLETE spec-valid G.711 μ-LAW WAV
    * (formatTag 7, 8-bit mono 8 kHz): each text byte IS one μ-law code, so
    * the compressed stream needs no encoder expression — only the RIFF/fmt
    * header synthesizes (same hex-literal construction as [[packMedia]]'s
    * PCM header, fmt size 18 with cbSize 0 as non-PCM requires). Map-only. */
  def packUlaw(df: DataFrame, idCol: String, textCol: String): DataFrame =
    packG711(df, idCol, textCol, formatTag = 7)

  /** [[packUlaw]]'s A-law sibling: WAV formatTag 6, the same
    * one-code-byte-per-sample layout. */
  def packAlaw(df: DataFrame, idCol: String, textCol: String): DataFrame =
    packG711(df, idCol, textCol, formatTag = 6)

  private def packG711(df: DataFrame, idCol: String, textCol: String,
                       formatTag: Int): DataFrame = {
    def hexb(c: Column) = lpad(hex(pmod(c, lit(256))), 2, "0")
    def le16h(c: Column) = concat(hexb(c), hexb(floor(c / 256)))
    def le32h(c: Column) =
      concat(hexb(c), hexb(floor(c / 256)), hexb(floor(c / 65536)),
        hexb(floor(c / 16777216)))
    val dataLen = length(col(textCol).cast("binary"))
    // RIFF chunks are word-aligned: an odd data payload carries one zero
    // pad byte, excluded from the data chunk size but included in the
    // RIFF size (decoders clamp to the declared size, so stats are
    // unchanged; strict parsers that walk past `data` stay aligned).
    val pad = pmod(dataLen, lit(2))
    val hdr = concat(
      lit("52494646"), le32h(dataLen + pad + 50), lit("57415645"), // RIFF size WAVE
      lit("666D7420"), le32h(lit(18)), le16h(lit(formatTag)), // fmt_ 18 g711
      le16h(lit(1)), le32h(lit(8000)), le32h(lit(8000)),      // mono 8kHz
      le16h(lit(1)), le16h(lit(8)), le16h(lit(0)),            // align bits cb
      lit("66616374"), le32h(lit(4)), le32h(dataLen),         // fact samples
      lit("64617461"), le32h(dataLen))                        // data size
    df.select(col(idCol),
      concat(unhex(hdr), col(textCol).cast("binary"),
        unhex(when(pad === 1, "00").otherwise(""))).as("payload"),
      lit("audio/basic").as("content_type"))
  }

  /** Pack a text column as a COMPLETE spec-valid IMA ADPCM WAV (formatTag
    * 0x11): the text's int16 LE sample stream 4:1-compressed through the
    * standard step/index adaptation — see
    * [[graft.functions.AdpcmWavEncode]]. Map-only. */
  def packAdpcm(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.GraftFunctions.adpcmWavEncode(col(textCol)).as("payload"),
        lit("audio/wav").as("content_type"))
      .where(col("payload").isNotNull)

  /** REAL μ-law decode + frame stats: [[packUlaw]] payloads expand through
    * the closed-form G.711 law and fold into the same per-frame
    * (rms, zero_crossings, peak) rows as [[pcmFrames]] — codec-blind
    * downstream. Map-only explode, no shuffle at any corpus size. */
  def ulawFrames(df: DataFrame, idCol: String, payloadCol: String,
                 frameSamples: Int): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.GraftFunctions
          .ulawFrameStats(col(payloadCol), frameSamples)).as("f"))
      .select(col(idCol), col("f.frame_idx"), col("f.n_samples"),
        round(col("f.rms"), 4).as("rms"),
        col("f.zero_crossings"), col("f.peak"))

  /** REAL A-law decode + frame stats — [[ulawFrames]] under the other
    * G.711 companding law. Map-only. */
  def alawFrames(df: DataFrame, idCol: String, payloadCol: String,
                 frameSamples: Int): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.GraftFunctions
          .alawFrameStats(col(payloadCol), frameSamples)).as("f"))
      .select(col(idCol), col("f.frame_idx"), col("f.n_samples"),
        round(col("f.rms"), 4).as("rms"),
        col("f.zero_crossings"), col("f.peak"))

  /** REAL IMA ADPCM decode + frame stats over the reconstructed samples —
    * the compressed-audio sibling of [[pcmFrames]]. Map-only. */
  def adpcmFrames(df: DataFrame, idCol: String, payloadCol: String,
                  frameSamples: Int): DataFrame =
    df.select(col(idCol),
        md5(hex(col(payloadCol))).as("wav_md5"),
        explode(graft.functions.GraftFunctions
          .adpcmFrameStats(col(payloadCol), frameSamples)).as("f"))
      .select(col(idCol), col("wav_md5"), col("f.frame_idx"), col("f.n_samples"),
        round(col("f.rms"), 4).as("rms"),
        col("f.zero_crossings"), col("f.peak"))

  /** Frequency-domain audio features: per 64-sample PCM frame, the
    * quantized-coefficient DFT power at bins 1..8 plus each frame's
    * dominant bin — see [[graft.functions.PcmSpectral]] for why every
    * value is exact integer arithmetic (an SQL oracle replays each bit).
    * The dominant bin is the spectral analogue of the RMS gate: pitch /
    * band-energy signals for audio curation. Map-only decode + explode;
    * the per-frame argmax is a `max_by`-free struct max over the 8
    * bin rows — keyed by (id, frame), never a global window. */
  def audioSpectral(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val frames = df.select(col(idCol),
        explode(graft.functions.GraftFunctions.pcmSpectral(col(payloadCol))).as("s"))
      .select(col(idCol), col("s.frame_idx"), col("s.bin"), col("s.power"))
    // ties break to the LOWEST bin: struct max on (power, -bin)
    val dom = frames
      .groupBy(col(idCol), col("frame_idx"))
      .agg(max(struct(col("power"), (-col("bin")).as("nb"))).as("m"))
      .select(col(idCol), col("frame_idx"),
        (-col("m.nb")).cast("int").as("dom_bin"),
        col("m.power").as("dom_power"))
    frames.join(dom, Seq(idCol, "frame_idx"))
  }

  /** Doc-level audio gating over the decoded PCM frames: a clip's
    * "active" fraction is the share of frames whose (4-dp-rounded) RMS
    * clears `rmsFloor`; clips below `minActive` drop — the silence /
    * dead-air filter of an audio training pipeline. One map-only decode +
    * one per-id aggregation; the gate compares the ROUNDED rms so the
    * oracle replays each keep/drop decision exactly. */
  def audioActivityGate(df: DataFrame, idCol: String, payloadCol: String,
                        frameSamples: Int, rmsFloor: Double,
                        minActive: Double): DataFrame =
    pcmFrames(df, idCol, payloadCol, frameSamples)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("rms") >= rmsFloor, 1L).otherwise(0L)).as("active_frames"))
      .withColumn("active_frac",
        round(col("active_frames").cast("double") / col("n_frames"), 4))
      .where(col("active_frac") >= minActive)

  /** Pack a text column as a REAL P6 PPM payload: spec-valid ASCII header
    * (dimensions by fixed id arithmetic, maxval 255) followed by the text
    * bytes as the raster. Width is small and height is derived from the
    * text length so most payloads carry a truncated raster — exactly what
    * crawled image corpora look like — and the decoder's
    * available-bytes clamp is exercised on every row. Map-only. */
  def packPpm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val w = pmod(id, lit(16)) + 4
    val h = pmod(id * 3, lit(16)) + 4
    df.select(id,
      concat(
        lit("P6\n").cast("binary"),
        concat(w.cast("string"), lit(" "), h.cast("string"), lit("\n255\n"))
          .cast("binary"),
        col(textCol).cast("binary")).as("payload"),
      lit("image/x-portable-pixmap").as("content_type"))
  }

  /** REAL nearest-neighbor resize for P6 PPM payloads: `side`×`side` RGB
    * thumbnail bytes sampled from the complete raster rows present — the
    * cheap perceptual-fingerprint / preview step, and the normalization
    * that feeds image near-dup hashing. Emits the thumbnail hex plus its
    * md5 fingerprint; rows that carry no complete raster row drop. */
  def ppmThumbnails(df: DataFrame, idCol: String, payloadCol: String,
                    side: Int): DataFrame =
    df.select(col(idCol),
        graft.functions.GraftFunctions.ppmThumbnail(col(payloadCol), side)
          .as("thumb"))
      .where(col("thumb").isNotNull)
      // fingerprint the HEX rendering (not the raw bytes): DuckDB's md5 is
      // varchar-only, and hashing the same uppercase-hex text keeps the
      // oracle replay exact
      .select(col(idCol), hex(col("thumb")).as("thumb_hex"))
      .withColumn("thumb_md5", md5(col("thumb_hex")))

  /** Image near-dup over P6 PPM payloads: perceptual dHash (9×7 grayscale
    * grid, 56 bits — [[graft.functions.PpmDHash]]) banded into 4×14-bit
    * equi-join keys, candidate pairs verified by hamming distance. The
    * pigeonhole guarantee is exact: any pair within `maxHamming` ≤ 3 bits
    * shares at least one unchanged band, so banding loses nothing while
    * the join stays an equi-join on a compact (band, key) — the same
    * blocked shape as the SimHash text near-dup, never all-pairs. Only
    * (id, 56-bit hash) tuples cross the shuffle; payload bytes never do. */
  def imageNearDup(df: DataFrame, idCol: String, payloadCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, s"4 bands of 14 bits are exact only to distance 3+1-1=3, got $maxHamming")
    val sigs = df
      .select(col(idCol).as("__id"),
        graft.functions.GraftFunctions.ppmDHash(col(payloadCol)).as("__dh"))
      .where(col("__dh").isNotNull)
    val banded = sigs.select(col("__id"), col("__dh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("__b"),
          shiftright(col("__dh"), 14 * b).bitwiseAND(lit(0x3fffL)).as("__k"))): _*))
        .as("__band"))
      .select(col("__id"), col("__dh"),
        col("__band.__b").as("__b"), col("__band.__k").as("__k"))
    val lhs = banded.select(col("__b"), col("__k"),
      col("__id").as("id_a"), col("__dh").as("__dha"))
    val rhs = banded.select(col("__b"), col("__k"),
      col("__id").as("id_b"), col("__dh").as("__dhb"))
    lhs.join(rhs, Seq("__b", "__k"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(__dha ^ __dhb)").cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct() // a close pair can share several bands
  }

  /** REAL pixel decode for P6 PPM payloads: per-channel means over the
    * complete pixels actually present — see
    * [[graft.functions.PpmPixelStats]]. */
  def ppmPixels(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.GraftFunctions.ppmPixelStats(col(payloadCol)).as("px"))
      .where(col("px").isNotNull)
      .select(col(idCol), col("px.width"), col("px.height"), col("px.n_pixels"),
        round(col("px.mean_r"), 4).as("mean_r"),
        round(col("px.mean_g"), 4).as("mean_g"),
        round(col("px.mean_b"), 4).as("mean_b"))

  /** Pack a text column as a COMPLETE spec-valid PNG: 8-bit raster (the
    * text bytes cycled to fill width×height×channels), all five scanline
    * filters in rotation, one level-6 zlib IDAT stream, real chunk CRCs —
    * see [[graft.functions.PngEncode]]. Dimensions and color type derive
    * from the id by fixed arithmetic (like [[packPpm]]) so an independent
    * golden can rebuild every payload byte-for-byte. Map-only. */
  def packPng(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val w = (pmod(id, lit(16)) + 4).cast("int")
    val h = (pmod(id * 3, lit(16)) + 4).cast("int")
    // rotate gray (1 ch) / RGB (3 ch) / RGBA (4 ch) by id so every bpp the
    // decoder supports appears in every corpus slice
    val ct = when(pmod(id, lit(3)) === 0, 0)
      .when(pmod(id, lit(3)) === 1, 2).otherwise(6).cast("int")
    df.select(id,
      graft.functions.GraftFunctions
        .pngEncode(col(textCol), w, h, ct).as("payload"),
      lit("image/png").as("content_type"))
  }

  /** Pack a text column as a COMPLETE spec-valid baseline JPEG (ITU-T
    * T.81): grayscale 8-bit sequential DCT with the Annex K quantization
    * and Huffman tables — a real JPEG any standard decoder reads (interop
    * pinned against the JDK's ImageIO reader in MultimodalSpec). Raster
    * and dimensions derive from (id, text) by the same fixed arithmetic
    * as [[packPng]], and every transform is fixed-point integer, so an
    * independent golden rebuilds each payload byte-for-byte. Map-only. */
  def packJpeg(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val w = (pmod(id, lit(16)) + 4).cast("int")
    val h = (pmod(id * 3, lit(16)) + 4).cast("int")
    df.select(id,
      graft.functions.GraftFunctions
        .jpegEncode(col(textCol), w, h).as("payload"),
      lit("image/jpeg").as("content_type"))
  }

  /** [[packJpeg]]'s PROGRESSIVE sibling: the same raster and quantized
    * coefficients emitted as a spec-valid SOF2 multi-scan stream (six-scan
    * successive-approximation script — see
    * [[graft.functions.JpegCodec.encodeProgressive]]). Because progressive
    * is a lossless reordering, [[jpegPixels]] decodes it to EXACTLY the
    * baseline payload's statistics; only the payload bytes (and md5)
    * differ. Map-only. */
  def packJpegProgressive(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val w = (pmod(id, lit(16)) + 4).cast("int")
    val h = (pmod(id * 3, lit(16)) + 4).cast("int")
    df.select(id,
      graft.functions.GraftFunctions
        .jpegEncodeProgressive(col(textCol), w, h).as("payload"),
      lit("image/jpeg").as("content_type"))
  }

  /** REAL JPEG pixel decode: Huffman-decode the entropy stream, dequantize
    * against the stream's own DQT, run the fixed-point integer IDCT, and
    * average the cropped raster — see [[graft.functions.JpegPixelStats]].
    * The mean publishes in fixed-point micro-units (exact integer pixel
    * sum / exact count, one IEEE division). */
  def jpegPixels(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    def micro(c: Column) = round(c * 1e4).cast("long")
    df.select(col(idCol),
        md5(hex(col(payloadCol))).as("jpeg_md5"),
        graft.functions.GraftFunctions.jpegPixelStats(col(payloadCol)).as("px"))
      .where(col("px").isNotNull)
      .select(col(idCol), col("jpeg_md5"),
        col("px.width"), col("px.height"), col("px.n_pixels"),
        micro(col("px.mean_gray")).as("mean_gray_micro"))
  }

  /** REAL PNG pixel decode: zlib-inflate the IDAT stream, reconstruct
    * every scanline filter, and average the raster per channel — see
    * [[graft.functions.PngPixelStats]]. Means publish as fixed-point
    * micro-units (exact integer byte sums / exact pixel count, one IEEE
    * division — no rounded double crosses an engine boundary). */
  def pngPixels(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    def micro(c: Column) = round(c * 1e4).cast("long")
    df.select(col(idCol),
        md5(hex(col(payloadCol))).as("png_md5"),
        graft.functions.GraftFunctions.pngPixelStats(col(payloadCol)).as("px"))
      .where(col("px").isNotNull)
      .select(col(idCol), col("png_md5"),
        col("px.width"), col("px.height"),
        col("px.color_type").cast("long").as("color_type"), col("px.n_pixels"),
        micro(col("px.mean_r")).as("mean_r_micro"),
        micro(col("px.mean_g")).as("mean_g_micro"),
        micro(col("px.mean_b")).as("mean_b_micro"))
  }

  /** STUB DECODE — deterministic fake: derives "decoded" image dimensions
    * from an md5 hash of the payload bytes. Kept for the batch-iterator
    * path and as the no-header fallback; the image queries use the REAL
    * [[imageMeta]] parser. */
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

  /** Exact-cut scene segmentation over the sampled frame stream: a scene
    * boundary wherever a frame's content hash differs from its
    * predecessor — the identical-frame-collapse pass a video pipeline
    * runs before any perceptual pass (static scenes are the overwhelming
    * frame mass in screen recordings / slides; the dHash near-dup path is
    * the perceptual complement). Every window partitions by the clip id,
    * so per-clip work is one sort inside one exchange and the payload
    * bytes never cross it — only (id, frame_idx, 16-byte md5) rows do.
    *
    * @return per clip: n_frames, n_scenes, longest same-content run. */
  def sceneCuts(df: DataFrame, idCol: String, payloadCol: String,
                chunkBytes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byIdx = Window.partitionBy(col(idCol)).orderBy(col("frame_idx"))
    val run = byIdx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sampleFrames(df, idCol, payloadCol, chunkBytes)
      .withColumn("__cut",
        (lag(col("frame_md5"), 1).over(byIdx).isNull ||
          col("frame_md5") =!= lag(col("frame_md5"), 1).over(byIdx)).cast("int"))
      .withColumn("__scene", sum(col("__cut")).over(run))
      .groupBy(col(idCol), col("__scene"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col(idCol))
      .agg(sum(col("__len")).as("n_frames"),
        count(lit(1)).as("n_scenes"),
        max(col("__len")).as("max_static_run"))
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
