package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis

/** Streaming twin of [[graft.operators.TextAnalysis.lineDedup]]: the
  * boilerplate strip at INGEST time. The frequent-line set is built ONCE
  * from the static history (the same conf-capped DF aggregation as
  * batch — `TextAnalysis.lineDedupFrequentSet`), then every arriving
  * document is rebuilt minus its known-boilerplate lines by the same
  * native one-pass expression. The streaming side is COMPLETELY
  * stateless — a per-row projection, no watermark, no store — which is
  * the point: once the boilerplate census exists, applying it to a new
  * crawl costs a scan, whether that scan is batch or a stream.
  *
  * Spec-pinned bit-equal to the batch operator on the finite replay.
  */
object StreamingLineDedup {

  /** The streamed corpus minus its frequent lines — the batch operator's
    * output shape, for the equality spec. */
  def lineDedupStreaming(spark: SparkSession, dir: String): DataFrame = {
    val sink =
      s"graft_stream_ld_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val set = TextAnalysis.lineDedupFrequentSet(spark, dir)
    val (docs, streamDir, _) = StreamingStaging.stageParquetStream(
      spark, dir, "documents", "graft_stream_ld")
    StreamingStaging.runAndConsume(spark, sink, streamDir) {
      TextAnalysis.lineDedupStrip(docs, set)
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .start()
    }
  }
}
