package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming variant of exact deduplication
  * (`graft.operators.Dedup.exact` is the batch/oracle-gated form) — the
  * continuous-ingest shape of a training-data pipeline: documents arrive
  * on a stream and duplicates must be collapsed incrementally.
  *
  * Two forms, both spec-gated against the batch results:
  *   - [[exactAggStreaming]]: the md5-keyed `groupBy` aggregate (min
  *     keeper id + copy count) in complete mode — bit-identical to the
  *     batch query on the finite replay.
  *   - [[dropDupStreaming]]: Spark's stateful `dropDuplicates` on the
  *     content hash — the keep-first-arrival operator. Which doc_id
  *     survives depends on arrival order (nondeterministic across
  *     replays), so the spec compares the surviving KEY SET, which is
  *     order-independent.
  *
  * State story at scale: both operators keep one state row per distinct
  * md5 (32 bytes + counters). On an unbounded source the state must be
  * bounded — `dropDuplicatesWithinWatermark` once documents carry an
  * event-time column (the fixture has none), which drops a key's state
  * after the watermark passes it: dedup stays exact within the horizon,
  * and the horizon is the recall/memory trade the pipeline owner picks.
  */
object StreamingDedup {

  /** Stage the single-file fixture into a watchable directory and return
    * the streaming documents frame (same planted duplicates as the batch
    * query: every 10th doc recurs at doc_id + 200000) plus the staging
    * dir for post-consume cleanup. */
  private def streamingDocs(spark: SparkSession,
      dir: String): (DataFrame, java.nio.file.Path) = {
    val (raw, streamDir, _) = StreamingStaging.stageParquetStream(
      spark, dir, "documents", "graft_stream_docs")
    val d = raw.select(col("doc_id"), col("text"))
    (d.unionAll(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))), streamDir)
  }

  /** Batch form of the same planted-duplicate corpus. */
  private def batchDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    d.unionAll(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
  }

  private def exactAggOf(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Batch twin for the equality spec (≡ `Dedup.exact` modulo the shared
    * corpus helper). */
  def exactAggBatch(spark: SparkSession, dir: String): DataFrame =
    exactAggOf(batchDocs(spark, dir))

  /** Streaming md5-keyed dedup aggregate, run to completion on the finite
    * replay. */
  def exactAggStreaming(spark: SparkSession, dir: String): DataFrame = {
    val sink = s"graft_stream_dedup_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val (docs, streamDir) = streamingDocs(spark, dir)
    StreamingStaging.runAndConsume(spark, sink, streamDir)(
      exactAggOf(docs)
        .writeStream.format("memory").queryName(sink).outputMode("complete")
        .start())
  }

  /** Streaming keep-first dedup: stateful `dropDuplicates` on the content
    * hash, append mode. */
  def dropDupStreaming(spark: SparkSession, dir: String): DataFrame = {
    val sink = s"graft_stream_dropdup_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val (docs, streamDir) = streamingDocs(spark, dir)
    StreamingStaging.runAndConsume(spark, sink, streamDir)(
      docs
        .withColumn("text_hash", md5(col("text")))
        .dropDuplicates("text_hash")
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .start())
  }
}
