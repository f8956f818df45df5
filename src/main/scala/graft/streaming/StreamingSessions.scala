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

  /** Replay the events fixture through the custom-state sessionizer
    * (same staging + far-future sentinel as
    * [[StreamingEvents.sessionizeStreaming]]). */
  def sessionizeCustomState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = s"$dir/events.parquet"
    val (raw, streamDir, rawSchema) = StreamingStaging.stageParquetStream(
      spark, dir, "events", "graft_stream_fmgws")
    val events = raw
      .transform(graft.sources.Tables.normalizeEventTs)
      .withWatermark("ts", "1 second")
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
    val sessions = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
    val sink = s"graft_fmgws_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    StreamingStaging.runAndDrive(spark, sink, streamDir)(
      sessions.toDF()
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .start()) { query =>
      query.processAllAvailable()
      val farTs = StreamingStaging.sentinelTs(spark, path)
      import scala.jdk.CollectionConverters._
      val sentinel = spark.createDataFrame(
        List(org.apache.spark.sql.Row(
          -1L, farTs, -1L, "sentinel", 0.0, "{}")).asJava,
        rawSchema)
      sentinel.write.mode("append").parquet(streamDir.toString)
      query.processAllAvailable()
    }
      .filter(col("user_id") =!= -1L)
  }
}
