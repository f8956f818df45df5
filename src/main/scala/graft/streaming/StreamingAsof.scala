package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join: the `flatMapGroupsWithState` form of
  * `Events.asofJoin` — for each purchase, the most recent click by the
  * same user at-or-before the purchase (inclusive), carried forward as
  * O(1) state per user.
  *
  * This mirrors the batch union+window formulation exactly: events
  * process per user in (ts, tag, event_id) order (clicks tagged 0 sort
  * before purchases at the same timestamp — a click at exactly the
  * purchase ts is eligible; equal-ts clicks resolve to the highest
  * event_id, because later rows in the sort order overwrite the carry),
  * each click overwrites the one-row "last click" state, each purchase
  * emits immediately against it. State per user is ONE click — the same
  * O(1)-per-row state the batch window form has, and the shape kdb's
  * `aj` and Flink's event-time temporal join keep.
  *
  * Ordering contract: within a batch, events sort by event time; across
  * batches, the watermark bounds how late an event may arrive. A
  * purchase that arrives in a LATER batch than a click with a GREATER
  * timestamp would join against that future click — exactly the row the
  * watermark has declared impossible (it would be late beyond the
  * allowed lateness). Purchases emit in their arrival batch, so no
  * end-of-stream flush or timeout is needed.
  *
  * `StreamingAsofSpec` pins the streamed rows bit-equal to
  * `Events.asofJoin` (which itself hash-matches its DuckDB oracle).
  */
object StreamingAsof {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long,
      value: Double, event_type: String)
  final case class LastClick(tsUs: Long, event_id: Long, value: Double)
  final case class Joined(purchase_id: Long, user_id: Long,
      purchase_ts: Timestamp, click_id: Long, click_ts: Timestamp,
      click_value: Double)

  private def us(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(u: Long): Timestamp = {
    val t = new Timestamp(u / 1000L)
    t.setNanos(((u % 1000000L) * 1000L).toInt)
    t
  }

  /** Merge one batch: replay the user's events in the batch sorted by
    * (ts, tag, event_id); clicks overwrite the carry, purchases emit. */
  private def stateFn(key: Long, events: Iterator[Ev],
      state: GroupState[LastClick]): Iterator[Joined] = {
    val sorted = events.toArray.sortBy(e =>
      (us(e.ts), if (e.event_type == "click") 0 else 1, e.event_id))
    var last = state.getOption.orNull
    val out = Seq.newBuilder[Joined]
    sorted.foreach { e =>
      if (e.event_type == "click") {
        last = LastClick(us(e.ts), e.event_id, e.value)
      } else if (last != null) {
        out += Joined(e.event_id, key, e.ts, last.event_id,
          toTs(last.tsUs), last.value)
      }
    }
    if (last != null) state.update(last)
    out.result().iterator
  }

  /** The staged joined stream both sinks consume. */
  private def joinedPipeline(spark: SparkSession, dir: String,
      prefix: String): (org.apache.spark.sql.Dataset[Joined],
      java.nio.file.Path) = {
    import spark.implicits._
    val (raw, streamDir, _) = StreamingStaging.stageParquetStream(
      spark, dir, "events", prefix)
    val events = raw
      .transform(graft.sources.Tables.normalizeEventTs)
      .withWatermark("ts", "1 second")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        col("event_type")).as[Ev]
    val joined = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(stateFn)
    (joined, streamDir)
  }

  /** Replay the events fixture through the streaming as-of join (same
    * hard-link staging as the other streaming helpers; no sentinel —
    * purchases emit in their own batch). */
  def asofJoinStreaming(spark: SparkSession, dir: String): DataFrame = {
    val (joined, streamDir) = joinedPipeline(spark, dir, "graft_stream_asof")
    val sink = s"graft_sasof_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    StreamingStaging.runAndConsume(spark, sink, streamDir)(
      joined.toDF()
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .start())
  }

  /** [[asofJoinStreaming]] with the PRODUCTION sink: the append-mode
    * parquet FILE sink ([[StreamingLeaderboard]]'s mode — each purchase
    * joins and emits exactly once, the manifest's atomic per-batch
    * commit contract). No sentinel is needed: purchases emit in their
    * arrival batch, so end-of-replay state flushes nothing. At scale
    * this is the continuously-growing attribution table (purchase →
    * most recent click) downstream revenue jobs read.
    * `StreamingAsofSpec` pins parquet ≡ memory ≡ batch. */
  def asofJoinStreamingToParquet(spark: SparkSession, dir: String,
      outDir: String): DataFrame = {
    val (joined, streamDir) = joinedPipeline(spark, dir, "graft_stream_asofpq")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_asof_ckpt")
    try {
      val query = joined.toDF()
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .start()
      try query.processAllAvailable()
      finally query.stop()
    } finally {
      StreamingStaging.deleteRecursively(streamDir)
      StreamingStaging.deleteRecursively(ckpt)
    }
    spark.read.parquet(outDir)
  }
}
