package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming variant of the event-time hourly aggregation
  * (`graft.operators.Events.hourlyAgg` is the batch/oracle-gated form).
  * The reference has no streaming surface (SURVEY §2.4); this is the
  * Spark-native extension: the same parquet fixture replayed through
  * `readStream` → 1-hour tumbling window aggregate → in-memory sink.
  *
  * `StreamingEventsSpec` asserts the streaming result row-for-row equals
  * the equivalent batch aggregation on the same input.
  *
  * Notes:
  *   - `complete` output mode: the fixture is a finite replay, and with
  *     append mode the final windows would stay open at end-of-stream
  *     (no later event advances the watermark past them). A production
  *     deployment on an unbounded source would use
  *     `withWatermark("ts", …)` + append so state is dropped as windows
  *     close — the aggregation expression is identical.
  *   - no `countDistinct`: distinct aggregation is unsupported in
  *     streaming; the batch query's `n_users` column is the one
  *     difference from `Events.hourlyAgg` (use
  *     `approx_count_distinct` when an estimate suffices).
  *   - determinism: the double `value` sum goes through decimal(18,6)
  *     exactly like the batch side, so streaming/batch equality is
  *     bit-exact, not approximate.
  *
  * Scale: identical shuffle shape to the batch aggregate — partial
  * aggregation map-side, one exchange on (window, event_type); state
  * size is #open-windows × #types, bounded under a watermark.
  */
object StreamingEvents {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  /** The shared aggregation: 1-hour tumbling window × event_type. */
  private def hourlyAggOf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Batch form of the exact same aggregation, for the equality spec. */
  def hourlyAggBatch(spark: SparkSession, dir: String): DataFrame =
    hourlyAggOf(graft.sources.Tables.events(spark, dir))

  /** Per-user 4-hour-gap session aggregate — the shared expression for
    * batch and streaming (`session_window` carries start/end; count and
    * decimal-exact value sum per session). */
  private def sessionAggOf(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  def sessionAggBatch(spark: SparkSession, dir: String): DataFrame =
    sessionAggOf(graft.sources.Tables.events(spark, dir))

  /** Streaming sessionization: `session_window` + watermark in append
    * mode, the genuinely stateful streaming path (merging session state
    * per user, emitting a session only once the watermark passes its
    * close). On the finite fixture the last sessions would sit in state
    * forever — the replay appends one far-future sentinel event after the
    * real file so the watermark sweeps every real session out, then
    * filters the sentinel user from the result. */
  def sessionizeStreaming(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val (raw, streamDir, rawSchema) = StreamingStaging.stageParquetStream(
      spark, dir, "events", "graft_stream_sessions")
    val events = raw
      .transform(graft.sources.Tables.normalizeEventTs)
      .withWatermark("ts", "1 second")
    val sink = s"graft_stream_sessions_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    StreamingStaging.runAndDrive(spark, sink, streamDir)(
      sessionAggOf(events)
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .start()) { query =>
      query.processAllAvailable()
      // Sentinel: one event far past the fixture's horizon (in the raw
      // schema's own ts type) advances the watermark so every real
      // session closes and is appended.
      val farTs = StreamingStaging.sentinelTs(spark, path)
      val sentinelUser = -1L
      import scala.jdk.CollectionConverters._
      val sentinel = spark.createDataFrame(
        List(org.apache.spark.sql.Row(
          -1L, farTs, sentinelUser, "sentinel", 0.0, "{}")).asJava,
        rawSchema)
      sentinel.write.mode("append").parquet(streamDir.toString)
      query.processAllAvailable()
    }
      .filter(col("user_id") =!= -1L)
  }

  /** Replay the events fixture through Structured Streaming and return
    * the final windowed aggregate (runs the stream to completion on the
    * finite input, then reads the in-memory sink). */
  def hourlyAggStreaming(spark: SparkSession, dir: String): DataFrame = {
    // ts normalizes to a micros timestamp whatever the fixture stored —
    // same dispatch as Tables.events
    val (raw, streamDir, _) = StreamingStaging.stageParquetStream(
      spark, dir, "events", "graft_stream_events")
    val events = raw
      .transform(graft.sources.Tables.normalizeEventTs)
    val sink = s"graft_stream_hourly_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    StreamingStaging.runAndConsume(spark, sink, streamDir)(
      hourlyAggOf(events)
        .writeStream.format("memory").queryName(sink).outputMode("complete")
        .start())
  }
}
