package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING index maintenance — the continuous-ingest twin of the
  * persisted IVF-PQ index's delta append
  * ([[graft.operators.Similarity.appendToIvfPqIndex]]): a crawl lands
  * embeddings on a stream, and every micro-batch is assigned to the
  * FROZEN centroids, encoded with the FROZEN codebook, and appended
  * into only its cells' postings partitions. The index artifact grows
  * continuously; queries ([[graft.operators.Similarity.annIvfPqIndexed]]
  * / `searchIvfPqIndex`) read it between batches with no coordination —
  * parquet readers see whole files, and a partially-visible batch only
  * means a few very new vectors are not yet searchable (the same
  * freshness contract every streaming search service has).
  *
  * Exactly-once: `foreachBatch` is at-least-once on retry, and a
  * double-applied append would duplicate postings. The standard
  * idempotent-foreachBatch recipe guards it — a commit-log marker per
  * batchId inside the index artifact (`_append_log/batch-N`, created
  * AFTER the append's parquet commit): a retried batch sees its marker
  * and becomes a no-op. `StreamingIndexAppendSpec` pins both the replay
  * equality (streamed-maintained index ≡ the batch build+append on the
  * same splits, query-row bit-exact) and the idempotency (re-applying a
  * committed batch changes no postings file).
  */
object StreamingIndexAppend {

  /** Commit-log-guarded append of one micro-batch (vec_id, embedding)
    * against the frozen artifacts at `indexDir`. */
  private[streaming] def appendBatch(spark: SparkSession, indexDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val log = java.nio.file.Paths.get(indexDir, "_append_log")
    java.nio.file.Files.createDirectories(log)
    val marker = log.resolve(s"batch-$batchId")
    if (java.nio.file.Files.exists(marker)) return
    graft.operators.Similarity.appendToIvfPqIndexProd(spark, batch, indexDir)
    java.nio.file.Files.createFile(marker)
  }

  /** Build the index on the base split (vec_id % 8 ≠ 7), replay the
    * delta split as a file-source stream staged as TWO files with
    * `maxFilesPerTrigger = 1` — two "days" of crawl, two micro-batches —
    * appending each batch through the idempotent commit log, then run
    * the standard indexed query over the full corpus. */
  def indexDeltaStreaming(spark: SparkSession, dir: String,
      indexDir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(spark, dir)
    graft.operators.Similarity.buildIvfPqIndexProdOn(spark,
      e.filter(col("vec_id") % 8 =!= 7), indexDir)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_idxapp")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_idxapp_ckpt")
    try {
      e.filter(col("vec_id") % 16 === 7).coalesce(1)
        .write.mode("append").parquet(streamDir.toString)
      e.filter(col("vec_id") % 16 === 15).coalesce(1)
        .write.mode("append").parquet(streamDir.toString)
      val stream = spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
      val query = stream.writeStream
        .foreachBatch((b: DataFrame, id: Long) =>
          appendBatch(spark, indexDir)(b, id))
        .option("checkpointLocation", ckpt.toString)
        .start()
      try query.processAllAvailable() finally query.stop()
    } finally {
      StreamingStaging.deleteRecursively(streamDir)
      StreamingStaging.deleteRecursively(ckpt)
    }
    graft.operators.Similarity.annIvfPqIndexed(spark, dir, indexDir)
  }
}
