package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization: the `flatMapGroupsWithState` form of
  * `Events.sessionize` / `StreamingEvents.sessionizeStreaming`.
  *
  * `session_window` covers the declarative path; this operator is the
  * explicit-state path a pipeline needs the moment session logic stops
  * being "gap timeout" — per-session caps, value-dependent boundaries,
  * mid-session emission. State per user: the one open session (closed
  * sessions emit immediately, in-batch); an event-time timeout set to the
  * session close emits the final session once the watermark passes it, so
  * state is bounded by #active-users and append mode stays correct.
  *
  * Determinism contract (same as the batch/oracle form): per-session
  * value sums go element-wise through decimal(18,6) (BigDecimal.valueOf +
  * HALF_UP at scale 6 — exactly Spark's double→decimal cast) so the
  * emitted doubles equal `Events.sessionize`'s bit-for-bit;
  * `StreamingSessionsSpec` pins it.
  */
object StreamingSessions {

  private val GapUs = 4L * 3600 * 1000 * 1000

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)
  /** Open-session state: micros bounds + exact decimal sum (string-carried
    * so the state encoder stays a simple product). */
  final case class Open(startUs: Long, lastUs: Long, n: Long, sum: String)

  private def us(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(u: Long): Timestamp = {
    val t = new Timestamp(u / 1000L)
    t.setNanos(((u % 1000000L) * 1000L).toInt)
    t
  }

  private def dec(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP)

  private def emit(o: Open, key: Long): Session =
    Session(key, toTs(o.startUs), toTs(o.lastUs + GapUs), o.n,
      new java.math.BigDecimal(o.sum).doubleValue)

  /** The state function: merge this batch's events (sorted by event time)
    * into the open session, emitting every session that closes; on
    * event-time timeout emit the final open session. */
  private def stateFn(key: Long, events: Iterator[Ev],
      state: GroupState[Open]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit(_, key)).iterator
      state.remove()
      return out
    }
    val sorted = events.toArray.sortBy(e => (us(e.ts), e.value))
    var open = state.getOption.orNull
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = us(e.ts)
      if (open == null) {
        open = Open(t, t, 1L, dec(e.value).toPlainString)
      } else if (t - open.lastUs >= GapUs) {
        closed += emit(open, key)
        open = Open(t, t, 1L, dec(e.value).toPlainString)
      } else {
        open = Open(open.startUs, math.max(open.lastUs, t), open.n + 1,
          new java.math.BigDecimal(open.sum).add(dec(e.value)).toPlainString)
      }
    }
    if (open != null) {
      state.update(open)
      // fire once the watermark passes the session close (+1 ms guards
      // the micro→milli truncation)
      state.setTimeoutTimestamp((open.lastUs + GapUs) / 1000L + 1L)
    }
    closed.result().iterator
  }

  /** The staged session stream both sinks consume: fixture replay →
    * watermark → custom-state sessionizer. */
  private def sessionPipeline(spark: SparkSession, dir: String,
      prefix: String): (org.apache.spark.sql.Dataset[Session],
      java.nio.file.Path, org.apache.spark.sql.types.StructType) = {
    import spark.implicits._
    val (raw, streamDir, rawSchema) = StreamingStaging.stageParquetStream(
      spark, dir, "events", prefix)
    val events = raw
      .transform(graft.sources.Tables.normalizeEventTs)
      .withWatermark("ts", "1 second")
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
    val sessions = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
    (sessions, streamDir, rawSchema)
  }

  /** Append the far-future sentinel event that advances the watermark
    * past every real session so open sessions time out and emit. */
  private def pushSentinel(spark: SparkSession, path: String,
      streamDir: java.nio.file.Path,
      rawSchema: org.apache.spark.sql.types.StructType): Unit = {
    import scala.jdk.CollectionConverters._
    val farTs = StreamingStaging.sentinelTs(spark, path)
    val sentinel = spark.createDataFrame(
      List(org.apache.spark.sql.Row(
        -1L, farTs, -1L, "sentinel", 0.0, "{}")).asJava,
      rawSchema)
    sentinel.write.mode("append").parquet(streamDir.toString)
  }

  /** Replay the events fixture through the custom-state sessionizer
    * (same staging + far-future sentinel as
    * [[StreamingEvents.sessionizeStreaming]]). */
  def sessionizeCustomState(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val (sessions, streamDir, rawSchema) = sessionPipeline(
      spark, dir, "graft_stream_fmgws")
    val sink = s"graft_fmgws_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    StreamingStaging.runAndDrive(spark, sink, streamDir)(
      sessions.toDF()
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .start()) { query =>
      query.processAllAvailable()
      pushSentinel(spark, path, streamDir, rawSchema)
      query.processAllAvailable()
    }
      .filter(col("user_id") =!= -1L)
  }

  /** [[sessionizeCustomState]] with the PRODUCTION sink: Spark's native
    * append-mode parquet FILE sink (the [[StreamingLeaderboard]] sink
    * mode — each closed session emits exactly once, which is the file
    * sink's `_spark_metadata` manifest contract: atomic per-batch
    * commits, no double-appends on retry, batch readers see only
    * committed files). The sentinel user is filtered BEFORE the sink so
    * the table only ever holds real sessions. At 100 TB/day this is the
    * continuously-growing sessions table a downstream join or training
    * pipeline consumes. `StreamingSessionsSpec` pins
    * parquet ≡ memory ≡ batch. */
  def sessionizeCustomStateToParquet(spark: SparkSession, dir: String,
      outDir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val (sessions, streamDir, rawSchema) = sessionPipeline(
      spark, dir, "graft_stream_fmgwspq")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sess_ckpt")
    try {
      val query = sessions.toDF()
        .filter(col("user_id") =!= -1L)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .start()
      try {
        query.processAllAvailable()
        pushSentinel(spark, path, streamDir, rawSchema)
        query.processAllAvailable()
      } finally query.stop()
    } finally {
      StreamingStaging.deleteRecursively(streamDir)
      StreamingStaging.deleteRecursively(ckpt)
    }
    spark.read.parquet(outDir)
  }
}
