package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column plumbing: media (image/audio/video) modeled as opaque
  * `binary` payloads with typed metadata, plus the four pipeline stages a
  * training-data pipeline needs over them — decode, feature-extract,
  * resize, frame-sample (SURVEY §2.4 extension surface).
  *
  * DECODE IS A STUB by design: no media codec library ships in this
  * environment, so the "decode" stage deterministically interprets the
  * payload's bytes as the sample stream (for the fixtures, the UTF-8
  * bytes of `text` stand in for decoded samples). Everything around the
  * stub is real and tested: the binary column, the metadata struct, the
  * per-stage Spark plans, and the `mapPartitions` batch plumbing
  * ([[decodeFeatures]]) where a true codec slots in unchanged.
  *
  * The expression-based stages are DuckDB-oracle-gated (byte/codepoint
  * arithmetic is exact in both engines); the `mapPartitions` path is
  * spec-gated against the expression path.
  *
  * Scale: every stage is a single-pass narrow projection over the scan —
  * no shuffle, embarrassingly parallel across splits; payload bytes never
  * leave their partition. A real decoder runs inside [[decodeFeatures]]'s
  * partition iterator, amortizing per-batch setup exactly where
  * vectorized UDF batches would.
  */
object Multimodal {

  /** The opaque media column: payload + typed metadata struct. */
  private def media(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("utf8").as("format"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
        .as("meta"))

  /** Decoded sample stream (THE STUB): codepoints of the payload. A real
    * image decoder would produce pixel values here instead. */
  private val chars: Column =
    filter(split(col("text"), ""), c => length(c) === 1)
  private val codes: Column = transform(chars, c => ascii(c).cast("long"))

  /** Metadata extraction over the binary column — format, size, checksum. */
  def metadata(spark: SparkSession, dir: String): DataFrame = (
    media(spark, dir).select(
      col("doc_id"),
      col("meta.format").as("format"),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("payload")).as("checksum")))

  val metadataOracle: String =
    """SELECT doc_id, 'utf8' AS format,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS checksum
      |FROM documents ORDER BY 1, 2, 3, 4""".stripMargin

  /** Feature extraction: 16-bin histogram over the decoded samples
    * (mod-16 binning — the stand-in for e.g. a color histogram). One
    * native [[graft.functions.CodepointHistogram]] pass per row (the 16
    * per-bin interpreted `filter` lambdas this replaces were the r5
    * verdict's remaining hot-lambda note); `element_at` fans the array
    * out into the same 16 scalar columns. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    val hist = graft.functions.StringFunctions
      .codepoint_histogram(col("text"), 16)
    val bins = (0 until 16).map(b =>
      element_at(col("hist"), b + 1).as(s"h$b"))
    (Tables.documents(spark, dir)
      .select(col("doc_id"), hist.as("hist"))
      .select(col("doc_id") +: bins: _*))
  }

  val featuresOracle: String = {
    val bins = (0 until 16).map(b =>
      s"len(list_filter(list_transform(string_split(text, ''), c -> ord(c) % 16), x -> x = $b)) AS h$b")
    s"""SELECT doc_id, ${bins.mkString(",\n       ")}
       |FROM documents ORDER BY ${(1 to 17).mkString(", ")}""".stripMargin
  }

  /** Frame sampling: every 16th sample of the decoded stream, polynomial
    * fingerprint over the sampled frames (Karp–Rabin, base 31 mod 1e9+7 —
    * the fold both engines evaluate identically). */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    // guard: sequence(1, 0, 16) errors in Spark rather than yielding
    // empty, so an empty decoded stream needs the explicit branch
    val sampled = when(size(chars) >= 1, transform(
      sequence(lit(1), size(chars), lit(16)),
      i => ascii(element_at(chars, i)).cast("long")))
      .otherwise(typedlit(Seq.empty[Long]))
    val fp = aggregate(sampled, lit(0L),
      (acc, c) => (acc * lit(31L) + c) % lit(1000000007L))
    (Tables.documents(spark, dir).select(
      col("doc_id"),
      size(sampled).cast("long").as("n_frames"),
      fp.as("frame_fp")))
  }

  val frameSampleOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, '') AS cs FROM documents),
      |s AS (SELECT doc_id,
      |             [CAST(ord(cs[i]) AS BIGINT)
      |              for i in range(1, len(cs) + 1, 16)] AS frames
      |      FROM w)
      |SELECT doc_id, len(frames) AS n_frames,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT), frames),
      |                   (a, b) -> (a * 31 + b) % 1000000007) AS frame_fp
      |FROM s ORDER BY 1, 2, 3""".stripMargin

  /** Resize: truncate-or-pad the decoded stream to a fixed 64 samples
    * (pad value 32 = space), fingerprinted. The guard keeps Spark's ANSI
    * `element_at` from faulting out-of-range, matching DuckDB's NULL →
    * coalesce semantics. */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    val fixed = transform(sequence(lit(1), lit(64)),
      i => when(i <= size(chars), ascii(element_at(chars, i)).cast("long"))
        .otherwise(lit(32L)))
    val fp = aggregate(fixed, lit(0L),
      (acc, c) => (acc * lit(31L) + c) % lit(1000000007L))
    (Tables.documents(spark, dir)
      .select(col("doc_id"), fp.as("resized_fp")))
  }

  val resizeOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, '') AS cs FROM documents)
      |SELECT doc_id,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                     [CAST(coalesce(ord(cs[i]), 32) AS BIGINT)
      |                      for i in range(1, 65)]),
      |                   (a, b) -> (a * 31 + b) % 1000000007) AS resized_fp
      |FROM w ORDER BY 1, 2""".stripMargin

  // --- mapPartitions batch plumbing (where a REAL codec slots in) ----------

  /** One media row as the decoder sees it. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** The deterministic fake decoder: byte histogram (16 bins) normalized
    * to unit sum — shaped like an embedding head over decoded pixels.
    * Replace with an actual codec (`Array[Byte] => Array[Float]`) and
    * nothing else changes. */
  def fakeDecoder(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    payload.foreach(b => bins((b & 0xff) % 16) += 1f)
    val n = math.max(payload.length, 1).toFloat
    bins.map(_ / n)
  }

  /** Generic batched decode: any (doc_id, payload) frame through any
    * `Array[Byte] => Array[Float]` codec, one codec init per PARTITION —
    * the Spark-side shape a vectorized decode UDF has. */
  def decodeMedia(source: DataFrame,
      decoder: Array[Byte] => Array[Float]): DataFrame = {
    val enc = Encoders.product[MediaRow]
    val ds: Dataset[MediaRow] =
      source.select(col("doc_id"), col("payload")).as(enc)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val rowEnc = Encoders.row(outSchema)
    ds.mapPartitions { rows =>
      // per-partition setup would init the codec once, here
      rows.map(r => Row(r.doc_id, decoder(r.payload).toSeq))
    }(rowEnc).toDF()
  }

  /** Batched decode of the fixture corpus with the fake (histogram)
    * decoder — spec-gated against the expression path. */
  def decodeFeatures(spark: SparkSession, dir: String,
      decoder: Array[Byte] => Array[Float] = fakeDecoder): DataFrame =
    decodeMedia(media(spark, dir), decoder)

  /** A REAL decoder with zero external dependencies: RIFF/WAVE 16-bit PCM
    * (the uncompressed audio interchange format) — byte arithmetic only.
    * Parses the chunked RIFF container (fmt: PCM, 16-bit), then decodes
    * little-endian int16 samples to [-1, 1) floats. Interleaved channels
    * come back as-is (channel count is in the fmt chunk). This is the
    * audio modality's actual decode; image/video remain stubbed because
    * their codecs aren't pure byte arithmetic. `MultimodalSpec` decodes
    * synthesized WAV payloads through [[decodeMedia]] and checks samples
    * round-trip exactly. */
  def wavPcmDecoder(payload: Array[Byte]): Array[Float] = {
    def u16(i: Int): Int =
      (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (u16(i).toLong | (u16(i + 2).toLong << 16)) & 0xffffffffL
    def tag(i: Int): String =
      new String(payload.slice(i, i + 4), java.nio.charset.StandardCharsets.US_ASCII)
    require(payload.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    var pos = 12
    var dataAt = -1
    var dataLen = 0L
    var bits = -1
    while (pos + 8 <= payload.length && (dataAt < 0 || bits < 0)) {
      val id = tag(pos)
      val len = u32(pos + 4)
      if (id == "fmt ") {
        require(u16(pos + 8) == 1, "only PCM (format 1) supported")
        bits = u16(pos + 22)
        require(bits == 16, "only 16-bit PCM supported")
      } else if (id == "data") {
        dataAt = pos + 8
        dataLen = len
      }
      pos += 8 + len.toInt + (len.toInt & 1) // chunks are 2-byte aligned
    }
    require(dataAt >= 0 && bits == 16, "missing fmt/data chunk")
    val n = (math.min(dataLen, payload.length - dataAt) / 2).toInt
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = u16(dataAt + 2 * i).toShort / 32768.0f
      i += 1
    }
    out
  }

  /** A REAL image decoder with zero external dependencies: BMP
    * (BITMAPINFOHEADER, 24-bit uncompressed) — the image modality's
    * uncompressed interchange format, parsed with byte arithmetic only,
    * exactly as [[wavPcmDecoder]] does for audio. Decodes BGR pixel rows
    * (4-byte padded, bottom-up by default, top-down when height < 0) to
    * row-major top-down grayscale floats in [0, 1] via the Rec.601 luma
    * weights. Compressed formats (JPEG/PNG) remain stubbed: their codecs
    * are not pure byte arithmetic and the libs aren't in this
    * environment. `MultimodalSpec` decodes synthesized BMPs through
    * [[decodeMedia]] and checks pixels round-trip exactly. */
  def bmpDecoder(payload: Array[Byte]): Array[Float] = {
    def u16(i: Int): Int =
      (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    def i32(i: Int): Int =
      u16(i) | (u16(i + 2) << 16)
    require(payload.length >= 54 &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
      "not a BMP payload")
    val dataAt = i32(10)
    require(dataAt >= 54 && dataAt <= payload.length,
      "pixel-data offset outside the payload")
    require(i32(14) >= 40, "BITMAPINFOHEADER required")
    val width = i32(18)
    val heightRaw = i32(22)
    require(u16(26) == 1, "planes must be 1")
    require(u16(28) == 24, "only 24bpp uncompressed supported")
    require(i32(30) == 0, "only BI_RGB (uncompressed) supported")
    val height = math.abs(heightRaw)
    val topDown = heightRaw < 0
    require(width > 0 && height > 0, "degenerate dimensions")
    val rowBytes = ((24 * width + 31) / 32) * 4
    require(dataAt.toLong + rowBytes.toLong * height <= payload.length,
      "truncated pixel data")
    val out = new Array[Float](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val base = dataAt + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val b = payload(base + 3 * x) & 0xff
        val g = payload(base + 3 * x + 1) & 0xff
        val r = payload(base + 3 * x + 2) & 0xff
        out(y * width + x) =
          (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
        x += 1
      }
      y += 1
    }
    out
  }

  // --- registry ------------------------------------------------------------

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> (metadata _),
    "mm_features" -> (features _),
    "mm_frame_sample" -> (frameSample _),
    "mm_resize" -> (resize _))

  val oracles: Map[String, String] = Map(
    "mm_metadata" -> metadataOracle,
    "mm_features" -> featuresOracle,
    "mm_frame_sample" -> frameSampleOracle,
    "mm_resize" -> resizeOracle)
}
