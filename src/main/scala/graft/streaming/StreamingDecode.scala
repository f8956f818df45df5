package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal

/** Streaming twin of the multimodal decode path: documents arrive on a
  * file stream and the IDENTICAL `mm_decode_png` dataflow runs per
  * micro-batch — payload synthesis, the real zlib/filter PNG codec
  * inside the `mapPartitions` batch plumbing, and the fingerprint
  * projection. Every stage is stateless, so the batch operator's own
  * code streams as a plain projection: no state store, no watermark,
  * payload bytes never leave their split. This is the media-ingest
  * shape of a crawl pipeline — decode features as documents LAND —
  * and it pins the codec plumbing's "streaming-friendly" design claim
  * as a spec (`StreamingDecodeSpec`: stream ≡ batch bit-for-bit)
  * rather than a comment. */
object StreamingDecode {

  def decodePngStreaming(spark: SparkSession, dir: String): DataFrame = {
    val sink = s"graft_stream_decode_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val (raw, streamDir, _) = StreamingStaging.stageParquetStream(
      spark, dir, "documents", "graft_stream_decode")
    StreamingStaging.runAndConsume(spark, sink, streamDir) {
      Multimodal.decodePngOn(raw)
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .start()
    }
  }
}
