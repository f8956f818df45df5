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

  /** Read a JSONL corpus: (parsed, quarantined) frames. Quarantined rows
    * carry the raw offending line. */
  def readJsonl(spark: SparkSession,
      path: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(documentSchema.add(StructField(Corrupt, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val good = raw.filter(col(Corrupt).isNull).drop(Corrupt)
    val quarantine = raw.filter(col(Corrupt).isNotNull)
      .select(col(Corrupt).as("raw_line"))
    (good, quarantine)
  }

  /** Write a documents frame as JSONL (one object per line, Spark's
    * native json sink — splittable output, one file per partition). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
