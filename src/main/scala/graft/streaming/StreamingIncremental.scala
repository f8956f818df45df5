package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming twin of [[graft.operators.Dedup.incremental]]: a crawl
  * DELTA arrives on a stream and near-dedups against the STATIC history
  * snapshot — the continuous-ingest shape of corpus maintenance at
  * 100 TB, built on Structured Streaming's stream-static join (the
  * history band index and shingle store are the static sides; Spark
  * re-plans them per micro-batch, so a nightly index refresh is picked
  * up without restarting the stream).
  *
  * Dataflow per micro-batch, sharing the batch operator's own column
  * expressions (`Dedup.bandHashes` / `Dedup.withShingles` — scan-side
  * scalar expressions, so they run on a stream unchanged):
  *   1. delta docs → minhash band hashes (narrow projection, no state);
  *   2. stream-static join on (band, bandHash) against the history band
  *      index → candidate pairs ∝ true cross-duplicates;
  *   3. stream-static join against the history shingle store + exact
  *      Jaccard confirm ≥ 0.6 (bloom-style: the bands only prefilter,
  *      the confirm decides);
  *   4. ONE streaming aggregation keyed (delta_id, hist_id) collapses
  *      multi-band collisions — state is one row per confirmed pair,
  *      ∝ true duplicates, never corpus or delta size.
  *
  * Memory shape note: the delta's shingle array rides through the band
  * explode (×numBands per doc) so the confirm can compute exact Jaccard
  * without a second stream read (stream-stream self-joins need
  * watermarks the replay doesn't have). That duplication is
  * micro-batch-local — rows in flight, never state — and bounded by
  * numBands × the batch's shingle volume; the batch operator avoids it
  * with a candidate-id semi-join re-read, which a stream cannot do.
  * The per-delta verdict rollup (min dup id / match count / best
  * Jaccard) runs as a plain batch query over the sink — downstream of
  * the stream, as a consumer would.
  *
  * The spec pins bit-equality with the batch operator on the finite
  * replay ([[graft.operators.Dedup.incremental]]'s planted fixture:
  * originals are history, the +100000 truncated copies are the delta).
  */
object StreamingIncremental {

  /** Stage the fixture parquet into a watchable dir; return the
    * streaming DELTA frame (the planted truncated copies of every 20th
    * doc, exactly `Dedup.withNearDups`' delta branch) + staging dir. */
  private def streamingDelta(spark: SparkSession,
      dir: String): (DataFrame, java.nio.file.Path) = {
    val (raw, streamDir, _) = StreamingStaging.stageParquetStream(
      spark, dir, "documents", "graft_stream_inc")
    val delta = Dedup.plantedDelta(raw.select(col("doc_id"), col("text")))
    (delta, streamDir)
  }

  /** The static sides a real pipeline persists (bucketed by join key via
    * Layouts at scale): the history band index and shingle store. */
  private def staticSides(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val history = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val histBands = Dedup.bandHashes(history)
      .select(col("doc_id").as("hist_id"),
        posexplode(col("bands")).as(Seq("band", "bandHash")))
    val histSh = Dedup.withShingles(history)
      .select(col("doc_id").as("hist_id"), col("sh").as("b_sh"))
    (histBands, histSh)
  }

  /** Steps 1–4 over a delta stream: band hashes, stream-static candidate
    * join, exact-Jaccard confirm, the one pair-keyed streaming
    * aggregation. Shared by both sink variants so the dataflow cannot
    * drift between the gate surface and the production path. */
  private def confirmedPairs(delta: DataFrame, histBands: DataFrame,
      histSh: DataFrame): DataFrame = {
    val deltaBands = Dedup.withShingles(delta)
      .select(col("doc_id").as("delta_id"),
        graft.functions.SketchScalarFunctions
          .minhash_bands_of(col("sh"), Dedup.NumHashes, Dedup.NumBands)
          .as("bands"),
        col("sh").as("a_sh"))
      .select(col("delta_id"), col("a_sh"),
        posexplode(col("bands")).as(Seq("band", "bandHash")))
    val jac = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
      size(array_union(col("a_sh"), col("b_sh"))).cast("double")
    deltaBands
      .join(histBands, Seq("band", "bandHash"))
      .join(histSh, Seq("hist_id"))
      .select(col("delta_id"), col("hist_id"), jac.as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .groupBy(col("delta_id"), col("hist_id"))
      .agg(max(col("jaccard")).as("jaccard"))
  }

  /** The batch operator's per-delta output shape over a pair set. */
  private def verdicts(pairs: DataFrame): DataFrame =
    pairs
      .groupBy(col("delta_id"))
      .agg(min(col("hist_id")).as("dup_of"),
        count(lit(1)).as("n_dups"),
        max(col("jaccard")).as("best_jaccard"))

  /** Per-delta verdict over the streamed pair set — the batch operator's
    * output shape, for the equality spec. */
  def incrementalStreaming(spark: SparkSession, dir: String): DataFrame = {
    val sink = s"graft_stream_inc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val (histBands, histSh) = staticSides(spark, dir)
    val (delta, streamDir) = streamingDelta(spark, dir)
    verdicts(StreamingStaging.runAndConsume(spark, sink, streamDir) {
      confirmedPairs(delta, histBands, histSh)
        .writeStream.format("memory").queryName(sink).outputMode("complete")
        .start()
    })
  }

  /** PRODUCTION-SINK variant: the identical per-micro-batch dataflow,
    * but the confirmed-pair state lands in PARQUET through
    * `foreachBatch` — executors write the files directly; no memory
    * sink, no driver materialization (every other twin collects through
    * the memory sink, a documented gate/demo surface). `complete`
    * output + overwrite makes each micro-batch a consistent whole
    * snapshot of the pair state, so the writer is idempotent under
    * micro-batch retry — exactly the contract foreachBatch demands.
    * Returns the verdict rollup read back FROM the parquet, as a
    * downstream consumer would; `StreamingIncrementalSpec` pins
    * equality with the memory-sink twin (and therefore with the batch
    * operator). */
  def incrementalStreamingToParquet(spark: SparkSession, dir: String,
      outDir: String): DataFrame = {
    val (histBands, histSh) = staticSides(spark, dir)
    val (delta, streamDir) = streamingDelta(spark, dir)
    try {
      val query = confirmedPairs(delta, histBands, histSh)
        .writeStream
        .outputMode("complete")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("overwrite").parquet(outDir)
        }
        .start()
      try query.processAllAvailable() finally query.stop()
    } finally StreamingStaging.deleteRecursively(streamDir)
    verdicts(spark.read.parquet(outDir))
  }
}
