package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis

/** Streaming twin of the Count-Min sketch build behind
  * `sketch_heavy_hitters`: the same bucket expressions
  * (`TextAnalysis.cmsTokensOf` / `cmsSketchOf` — shared Column code, so
  * batch and stream hash identically) run as a standard streaming
  * aggregation over a documents stream.
  *
  * This is the sketch's NATIVE habitat: counters merge by addition, so
  * Spark's incremental state store IS the sketch — aggregation state is
  * at most d·W = 1024 rows (8 KiB of longs) no matter how long the
  * stream runs or how large the corpus grows, with no watermark needed
  * (nothing is ever evicted; the state cannot grow). Complete-mode
  * output emits the current sketch each trigger — at 100 TB/day this is
  * a continuously-maintained token-frequency summary queryable at any
  * moment, the streaming analogue of the batch build.
  *
  * Determinism: pure integer counters, no floats, no ordering
  * sensitivity — the final sketch on a finite replay equals the batch
  * sketch bit-for-bit (`StreamingSketchSpec`).
  */
object StreamingSketch {

  /** Replay the documents fixture through the streaming sketch build and
    * return the final (r, bkt, c) counters. */
  def cmsSketchStreaming(spark: SparkSession, dir: String): DataFrame = {
    val (docs, streamDir, _) = StreamingStaging.stageParquetStream(
      spark, dir, "documents", "graft_stream_cms")
    val sketch = TextAnalysis.cmsSketchOf(TextAnalysis.cmsTokensOf(docs))
    val sink = s"graft_stream_cms_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    StreamingStaging.runAndConsume(spark, sink, streamDir)(
      sketch
        .writeStream.format("memory").queryName(sink).outputMode("complete")
        .start())
  }

  /** Streaming twin of the HLL register build behind
    * `sketch_distinct_hll`: the native max-merge register aggregate
    * (`HllRegisters`) IS the streaming state — 64 bytes per language in
    * the state store, never growing, no watermark needed (max-merge
    * state cannot shrink or grow). The same shared Columns
    * (`TextAnalysis.hllHashedOf` / `hllRegistersOf` / `hllEstimated`)
    * run batch and stream, so the finite replay's final estimates equal
    * the batch query's bit-for-bit (`StreamingSketchSpec`). */
  def hllSketchStreaming(spark: SparkSession, dir: String): DataFrame = {
    val (docs, streamDir, _) = StreamingStaging.stageParquetStream(
      spark, dir, "documents", "graft_stream_hll")
    val regs = TextAnalysis.hllRegistersOf(TextAnalysis.hllHashedOf(docs))
    val sink = s"graft_stream_hll_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    TextAnalysis.hllEstimated(
      StreamingStaging.runAndConsume(spark, sink, streamDir)(
        regs
          .writeStream.format("memory").queryName(sink).outputMode("complete")
          .start()))
  }

  /** PRODUCTION-SINK variant of [[hllSketchStreaming]]: the identical
    * per-micro-batch register build, but the per-language register state
    * lands in PARQUET through `foreachBatch` — executors write the files
    * directly, no memory sink, no driver materialization (the same
    * pattern as
    * [[StreamingIncremental.incrementalStreamingToParquet]]).
    * `complete` output + overwrite makes each micro-batch a consistent
    * whole snapshot of the (bounded, 64 B/language) register table, so
    * the writer is idempotent under micro-batch retry. The estimate tail
    * runs over the parquet READ-BACK, as a downstream consumer would —
    * at 100 TB/day this is a continuously-refreshed distinct-count
    * summary table any engine can read. `StreamingSketchSpec` pins
    * parquet ≡ memory ≡ batch. */
  def hllSketchStreamingToParquet(spark: SparkSession, dir: String,
      outDir: String): DataFrame = {
    val (docs, streamDir, _) = StreamingStaging.stageParquetStream(
      spark, dir, "documents", "graft_stream_hllpq")
    val regs = TextAnalysis.hllRegistersOf(TextAnalysis.hllHashedOf(docs))
    try {
      val query = regs
        .writeStream
        .outputMode("complete")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("overwrite").parquet(outDir)
        }
        .start()
      try query.processAllAvailable() finally query.stop()
    } finally StreamingStaging.deleteRecursively(streamDir)
    TextAnalysis.hllEstimated(spark.read.parquet(outDir))
  }
}
