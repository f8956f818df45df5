package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Events.funnel` — the ordered view → click →
  * purchase conversion funnel as a custom-state operator: per user the
  * state is THREE timestamps (first view; first click strictly after
  * it; first purchase strictly after that), folded over each batch's
  * events in event-time order, emitted once the watermark passes the
  * end of the replay (event-time timeout, the [[StreamingSessions]]
  * sentinel pattern). This is the CEP shape with O(1) state — no event
  * buffering, because the sequence recurrence only ever moves forward.
  *
  * Ordering contract: within a batch events fold sorted by ts (strict
  * `>` stage comparisons make same-timestamp ties deterministic in
  * either fold order); across batches the fold is exact when batches
  * arrive in event-time order, which the staged finite replay
  * guarantees. Under real out-of-order arrival the watermark bounds
  * how late a stage event may come, and a production deployment of a
  * FORWARD-only recurrence accepts the standard CEP trade: a
  * stage-completing event arriving after a later stage was locked in
  * would need buffering to re-resolve (the same horizon trade
  * documented on [[StreamingDedup]]).
  *
  * `StreamingFunnelSpec` pins the streamed rows bit-equal to the batch
  * `events_funnel` (which hash-matches its DuckDB oracle).
  */
object StreamingFunnel {

  /** Conversion window in micros — must equal `Events.FunnelWindow`. */
  private val WindowUs = 12L * 3600 * 1000 * 1000

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  /** Forward-only funnel state: stage micros, −1 = unreached. */
  final case class FSt(vUs: Long, cUs: Long, pUs: Long, lastUs: Long)
  final case class FunnelRow(user_id: Long, v_ts: Option[Timestamp],
      c_ts: Option[Timestamp], p_ts: Option[Timestamp], steps: Long,
      completed: Boolean, funnel_us: Option[Long])

  private def us(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(u: Long): Timestamp = {
    val t = new Timestamp(u / 1000L)
    t.setNanos(((u % 1000000L) * 1000L).toInt)
    t
  }

  private def emit(s: FSt, key: Long): FunnelRow = {
    val v = Option(s.vUs).filter(_ >= 0)
    val c = Option(s.cUs).filter(_ >= 0)
    val p = Option(s.pUs).filter(_ >= 0)
    FunnelRow(key, v.map(toTs), c.map(toTs), p.map(toTs),
      if (p.isDefined) 3L else if (c.isDefined) 2L
      else if (v.isDefined) 1L else 0L,
      p.isDefined,
      for (pu <- p; vu <- v) yield pu - vu)
  }

  private def stateFn(key: Long, events: Iterator[Ev],
      state: GroupState[FSt]): Iterator[FunnelRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit(_, key)).iterator
      state.remove()
      return out
    }
    var s = state.getOption.getOrElse(FSt(-1L, -1L, -1L, -1L))
    events.toArray.sortBy(e => us(e.ts)).foreach { e =>
      val t = us(e.ts)
      e.event_type match {
        case "view" if s.vUs < 0 => s = s.copy(vUs = t)
        case "click" if s.vUs >= 0 && t > s.vUs &&
            t <= s.vUs + WindowUs && s.cUs < 0 =>
          s = s.copy(cUs = t)
        case "purchase" if s.cUs >= 0 && t > s.cUs &&
            t <= s.cUs + WindowUs && s.pUs < 0 =>
          s = s.copy(pUs = t)
        case _ => ()
      }
      s = s.copy(lastUs = math.max(s.lastUs, t))
    }
    state.update(s)
    // fire once the watermark passes a day beyond the user's last event
    // (the sentinel batch pushes it 30 days ahead, closing every user)
    state.setTimeoutTimestamp(s.lastUs / 1000L + 24L * 3600 * 1000)
    Iterator.empty
  }

  /** Replay the events fixture through the streaming funnel (staging +
    * far-future sentinel, as in [[StreamingSessions]]). */
  def funnelStreaming(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = s"$dir/events.parquet"
    val (raw, streamDir, rawSchema) = StreamingStaging.stageParquetStream(
      spark, dir, "events", "graft_stream_funnel")
    val events = raw
      .transform(graft.sources.Tables.normalizeEventTs)
      .withWatermark("ts", "1 second")
      .select(col("user_id"), col("ts"), col("event_type")).as[Ev]
    val rows = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
    val sink = s"graft_funnel_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    StreamingStaging.runAndDrive(spark, sink, streamDir)(
      rows.toDF()
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
