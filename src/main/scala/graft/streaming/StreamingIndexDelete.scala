package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING erasure — the takedown-queue twin of the batch delete
  * ([[graft.operators.Similarity.deleteFromIvfPqIndex]]): privacy and
  * takedown requests arrive continuously, and each micro-batch of ids
  * becomes one committed tombstone batch against the live index. The
  * postings are never touched on the delete path (tombstones are an id
  * list; physical purge rides the compaction cadence), so a delete
  * batch costs O(|ids|) no matter how large the index has grown —
  * which is exactly why the queue can be drained as a stream instead
  * of a nightly job.
  *
  * Exactly-once: `foreachBatch` is at-least-once on retry; the batch
  * API's commit-log marker (`_delete_log/batch-<id>`) makes a
  * re-delivered micro-batch a no-op, the same contract as
  * [[StreamingIndexAppend]]. `StreamingIndexDeleteSpec` pins the
  * streamed cadence bit-equal to one monolithic batch delete of the
  * union, and that the deleted ids are gone from the query while
  * ranks stay dense.
  */
object StreamingIndexDelete {

  /** Commit-log-guarded tombstone append of one micro-batch of
    * (vec_id) rows against the index at `indexDir`. */
  private[streaming] def deleteBatch(spark: SparkSession, indexDir: String)(
      batch: DataFrame, batchId: Long): Unit =
    graft.operators.Similarity.deleteFromIvfPqIndex(spark, batch,
      indexDir, s"stream-$batchId")

  /** Build the full-corpus index, replay a two-batch takedown stream
    * (vec_id % 16 = 5, then % 16 = 13 — union = % 8 = 5) as a
    * file-source stream with `maxFilesPerTrigger = 1`, then run the
    * standard indexed query: the erased ids neither query nor appear
    * as neighbors, and the result is bit-equal to one batch delete of
    * the union on a control index. */
  def indexDeleteStreaming(spark: SparkSession, dir: String,
      indexDir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(spark, dir)
    graft.operators.Similarity.buildIvfPqIndexProdOn(spark, e, indexDir)
    val ids = e.select(col("vec_id"))
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_idxdel")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_idxdel_ckpt")
    try {
      ids.filter(col("vec_id") % 16 === 5).coalesce(1)
        .write.mode("append").parquet(streamDir.toString)
      ids.filter(col("vec_id") % 16 === 13).coalesce(1)
        .write.mode("append").parquet(streamDir.toString)
      val stream = spark.readStream.schema(ids.schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
      val query = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          deleteBatch(spark, indexDir)(b, id)
        }
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
