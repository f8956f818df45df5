package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming twin of [[graft.operators.TextAnalysis.decontaminateBloom]]:
  * the corpus arrives on a stream and is screened against the (static)
  * benchmark suite — the shape of contamination checking at INGEST time,
  * where flagging a document as it lands is far cheaper than a later
  * corpus-wide sweep.
  *
  * The bloom bitmask is built ONCE from the static test side (the same
  * 128 KiB dense literal as batch — `TextAnalysis.bloomWordsOf`) and
  * compiled into the stream's scan as a per-row predicate: k O(1) bit
  * probes, no state, no join for the overwhelming majority of clean
  * shingles. Only bloom survivors reach the stream-static exact-confirm
  * join, and the single streaming aggregation counts matches per doc —
  * state ∝ contaminated documents, never stream volume.
  *
  * Spec-pinned bit-equal to the batch operator on the finite replay.
  */
object StreamingDecontaminate {

  /** Stage the fixture parquet into a watchable dir (hard link when
    * possible); return (streaming documents frame, staging dir). */
  private def streamingDocs(spark: SparkSession,
      dir: String): (DataFrame, java.nio.file.Path) = {
    val (docs, streamDir, _) = StreamingStaging.stageParquetStream(
      spark, dir, "documents", "graft_stream_deco")
    (docs, streamDir)
  }

  /** Per-document contamination counts over the streamed corpus — the
    * batch operator's output shape, for the equality spec. */
  def bloomStreaming(spark: SparkSession, dir: String): DataFrame = {
    val sink = s"graft_stream_deco_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // static side: the benchmark suite's distinct shingles + their bloom
    // (persisted — the bloom build and every micro-batch's confirm join
    // reuse it; dropped after the stream is consumed). Split boundaries,
    // bucket hash and shingle width come from the batch operator's own
    // helpers, so batch≡stream equality holds by construction.
    val testShingles = TextAnalysis.testShinglesOf(
        TextAnalysis.contaminationShingled(
          graft.sources.Tables.documents(spark, dir)
            .select(col("doc_id"), col("text"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val words = TextAnalysis.bloomWordsOf(testShingles)
      val (docs, streamDir) = streamingDocs(spark, dir)
      StreamingStaging.runAndConsume(spark, sink, streamDir) {
        // the same native array-level bloom probe as batch: each
        // micro-batch document's shingle array filters through the
        // 128 KiB bitmask in one scan-side loop, and the explode emits
        // only survivors (∝ contamination)
        val flagged = TextAnalysis.contaminationShingled(docs)
          .filter(col("bucket") < 90)
          .select(col("doc_id"),
            graft.functions.SketchScalarFunctions
              .bloom_shingle_filter(col("sh"), words).as("sh_pass"))
          .select(col("doc_id"), explode(col("sh_pass")).as("sh"))
          .join(testShingles, Seq("sh")) // stream-static exact confirm
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shared"))
        flagged
          .writeStream.format("memory").queryName(sink).outputMode("complete")
          .start()
      }
    } finally testShingles.unpersist()
  }
}
