package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** JSONL ingest for document corpora — the arrival format of most web
  * text dumps (one JSON object per line).
  *
  * Design for 100 TB ingest:
  *   - schema is ENFORCED, never inferred — `inferSchema` is a full
  *     extra pass over the corpus before the real one;
  *   - parsing is PERMISSIVE with corrupt rows QUARANTINED into their
  *     own frame (never silently dropped, never failing the job N hours
  *     in): a crawl dump always contains malformed lines, and the
  *     quarantine's row count is the ingest health metric;
  *   - the split shares ONE parse pass via a persisted frame (Spark
  *     disallows filtering on only the corrupt-record column of a
  *     streaming-parsed relation, and two separate reads would parse the
  *     corpus twice). Callers ingesting truly massive dumps can instead
  *     write the parsed frame to parquet once and split from there —
  *     [[TextIngestSpec]] covers both the split and the round-trip.
  */
object TextIngest {

  /** The documents-table schema (`TESTDATA.md`), JSONL-side. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  private val Corrupt = "_corrupt_record"

  /** A JSONL ingest: the parsed frame, the quarantined raw lines, and
    * [[release]], which drops the shared parse cache once BOTH frames
    * have been consumed (long-lived sessions otherwise accumulate one
    * cached corpus per ingest — the round-5 streaming-helper leak, same
    * medicine). */
  final case class JsonlIngest(good: DataFrame, quarantine: DataFrame,
      release: () => Unit)

  /** Read a JSONL corpus: (parsed, quarantined) frames off ONE shared
    * parse pass. Call `release()` after consuming both. */
  def readJsonl(spark: SparkSession, path: String): JsonlIngest = {
    val raw = spark.read
      .schema(documentSchema.add(StructField(Corrupt, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val good = raw.filter(col(Corrupt).isNull).drop(Corrupt)
    val quarantine = raw.filter(col(Corrupt).isNotNull)
      .select(col(Corrupt).as("raw_line"))
    JsonlIngest(good, quarantine, () => { raw.unpersist(); () })
  }

  /** Write a documents frame as JSONL (one object per line, Spark's
    * native json sink — splittable output, one file per partition). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a CSV corpus with the same discipline as [[readJsonl]]:
    * enforced schema (no inference pass), PERMISSIVE parse, malformed
    * rows quarantined off one shared parse, `release()` to drop the
    * cache. Multiline/quote handling stays at Spark's RFC-4180 defaults
    * (quoted fields may contain the delimiter); header expected. */
  def readCsv(spark: SparkSession, path: String): JsonlIngest = {
    val raw = spark.read
      .schema(documentSchema.add(StructField(Corrupt, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .option("header", "true")
      .option("escape", "\"") // RFC-4180 doubled quotes, not backslash
      .csv(path)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val good = raw.filter(col(Corrupt).isNull).drop(Corrupt)
    val quarantine = raw.filter(col(Corrupt).isNotNull)
      .select(col(Corrupt).as("raw_line"))
    JsonlIngest(good, quarantine, () => { raw.unpersist(); () })
  }

  /** Write a documents frame as headered CSV (RFC-4180 quoting). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(path)
}
