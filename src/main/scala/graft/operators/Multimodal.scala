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
    * (mod-16 binning — the stand-in for e.g. a color histogram). */
  def features(spark: SparkSession, dir: String): DataFrame = {
    val bins = (0 until 16).map(b =>
      size(filter(codes, x => x % 16 === b)).cast("long").as(s"h$b"))
    (Tables.documents(spark, dir)
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

  /** Batched decode over partitions: the iterator amortizes per-batch
    * decoder setup per PARTITION (not per row) — the Spark-side shape a
    * vectorized decode UDF has. Returns (doc_id, features). */
  def decodeFeatures(spark: SparkSession, dir: String,
      decoder: Array[Byte] => Array[Float] = fakeDecoder): DataFrame = {
    val enc = Encoders.product[MediaRow]
    val ds: Dataset[MediaRow] = media(spark, dir)
      .select(col("doc_id"), col("payload")).as(enc)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val rowEnc = Encoders.row(outSchema)
    ds.mapPartitions { rows =>
      // per-partition setup would init the codec once, here
      rows.map(r => Row(r.doc_id, decoder(r.payload).toSeq))
    }(rowEnc).toDF()
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
