package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Events.funnel` / `Events.funnelStages` — the
  * ordered k-stage conversion funnel as a custom-state operator: per
  * user the state is K timestamps (stage i+1 = first `stages(i)` event
  * strictly after stage i and within the window), folded over each
  * batch's events in event-time order, emitted once the watermark
  * passes the end of the replay (event-time timeout, the
  * [[StreamingSessions]] sentinel pattern). This is the CEP shape with
  * O(1) state — no event buffering, because the sequence recurrence
  * only ever moves forward, and the state size is k·8 bytes regardless
  * of a user's event volume.
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
  * `events_funnel` (which hash-matches its DuckDB oracle);
  * `FunnelStagesSpec` pins the k = 4 parameterization against the batch
  * k-stage form on the same fixture.
  */
object StreamingFunnel {

  /** Conversion window in micros — must equal `Events.FunnelWindow`. */
  private val WindowUs = 12L * 3600 * 1000 * 1000

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  /** Forward-only k-stage funnel state: per-stage micros, −1 =
    * unreached. */
  final case class FSt(stageUs: Array[Long], lastUs: Long)
  final case class FunnelRow(user_id: Long,
      stage_ts: Seq[Option[Timestamp]], steps: Long, completed: Boolean,
      funnel_us: Option[Long])

  private def us(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(u: Long): Timestamp = {
    val t = new Timestamp(u / 1000L)
    t.setNanos(((u % 1000000L) * 1000L).toInt)
    t
  }

  private def emit(s: FSt, key: Long): FunnelRow = {
    // forward-only: reached stages are a prefix, so steps = depth of
    // the deepest reached stage
    val steps = s.stageUs.lastIndexWhere(_ >= 0) + 1
    val done = s.stageUs.last >= 0
    FunnelRow(key,
      s.stageUs.toSeq.map(u => if (u >= 0) Some(toTs(u)) else None),
      steps.toLong, done,
      if (done) Some(s.stageUs.last - s.stageUs.head) else None)
  }

  private def stateFn(stages: Seq[String], windowUs: Long)(key: Long,
      events: Iterator[Ev], state: GroupState[FSt]): Iterator[FunnelRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit(_, key)).iterator
      state.remove()
      return out
    }
    var s = state.getOption.getOrElse(
      FSt(Array.fill(stages.size)(-1L), -1L))
    events.toArray.sortBy(e => us(e.ts)).foreach { e =>
      val t = us(e.ts)
      val i = stages.indexOf(e.event_type)
      if (i >= 0 && s.stageUs(i) < 0 &&
          (i == 0 || (s.stageUs(i - 1) >= 0 && t > s.stageUs(i - 1) &&
            t <= s.stageUs(i - 1) + windowUs))) {
        val arr = s.stageUs.clone(); arr(i) = t
        s = s.copy(stageUs = arr)
      }
      s = s.copy(lastUs = math.max(s.lastUs, t))
    }
    state.update(s)
    // fire once the watermark passes a day beyond the user's last event
    // (the sentinel batch pushes it 30 days ahead, closing every user)
    state.setTimeoutTimestamp(s.lastUs / 1000L + 24L * 3600 * 1000)
    Iterator.empty
  }

  /** Replay the events fixture through the 3-stage streaming funnel
    * with the batch row's column names — the `events_funnel` twin. */
  def funnelStreaming(spark: SparkSession, dir: String): DataFrame =
    funnelStagesStreaming(spark, dir,
      Seq("view", "click", "purchase"), WindowUs)
      .withColumnsRenamed(Map(
        "s1_ts" -> "v_ts", "s2_ts" -> "c_ts", "s3_ts" -> "p_ts"))

  /** Replay the events fixture through the k-stage streaming funnel
    * (staging + far-future sentinel, as in [[StreamingSessions]]) —
    * output columns (user_id, s1_ts…sk_ts, steps, completed,
    * funnel_us), matching `Events.funnelStages`. */
  def funnelStagesStreaming(spark: SparkSession, dir: String,
      stages: Seq[String], windowUs: Long): DataFrame = {
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
        GroupStateTimeout.EventTimeTimeout)(stateFn(stages, windowUs))
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
      .select((Seq(col("user_id")) ++
        stages.indices.map(i =>
          col("stage_ts").getItem(i).as(s"s${i + 1}_ts")) ++
        Seq(col("steps"), col("completed"), col("funnel_us"))): _*)
  }
}
