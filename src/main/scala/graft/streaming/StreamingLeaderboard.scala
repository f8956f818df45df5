package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Events.hourlyTop` — the windowed leaderboard as a
  * custom-state operator: per (hour, event_type) bucket keep ONLY the
  * current top-[[K]] (value, event_id) pairs and emit the ranked rows
  * once the watermark closes the hour. Window functions don't exist on
  * streams; the bounded-heap state is the streaming form of what
  * `TopKPerKeyExec` does in batch — O(K) state per open bucket, state
  * count bounded by (open hours × event types), removed at emission.
  *
  * Determinism: values pass through untouched (no arithmetic), and the
  * state keeps the exact batch ordering key (value DESC, event_id ASC) —
  * so on the finite replay the emitted rows equal the batch query's
  * bit-for-bit (`StreamingLeaderboardSpec`).
  */
object StreamingLeaderboard {

  private val K = 3
  private val HourUs = 3600L * 1000 * 1000

  final case class Ev(ts: Timestamp, event_type: String, event_id: Long,
      value: Double)
  /** Bounded leaderboard state: parallel arrays keep the encoder a plain
    * product; invariant: sorted by (value DESC, event_id ASC), length ≤ K. */
  final case class Board(ids: Seq[Long], values: Seq[Double])
  final case class Ranked(hour_ts: Timestamp, event_type: String,
      event_id: Long, value: Double, rnk: Long)

  private def us(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(u: Long): Timestamp = {
    val t = new Timestamp(u / 1000L)
    t.setNanos(((u % 1000000L) * 1000L).toInt)
    t
  }

  private def merge(b: Board, id: Long, v: Double): Board = {
    val entries = (b.ids.zip(b.values) :+ (id, v))
      .sortBy { case (i, x) => (-x, i) }.take(K)
    Board(entries.map(_._1), entries.map(_._2))
  }

  private def stateFn(key: (Long, String), events: Iterator[Ev],
      state: GroupState[Board]): Iterator[Ranked] = {
    if (state.hasTimedOut) {
      val out = state.getOption.toSeq.flatMap { b =>
        b.ids.zip(b.values).zipWithIndex.map { case ((id, v), i) =>
          Ranked(toTs(key._1), key._2, id, v, i + 1L)
        }
      }
      state.remove()
      return out.iterator
    }
    var board = state.getOption.getOrElse(Board(Nil, Nil))
    events.foreach(e => board = merge(board, e.event_id, e.value))
    state.update(board)
    // fire once the watermark passes the end of this hour (+1 ms guards
    // the micro→milli truncation)
    state.setTimeoutTimestamp((key._1 + HourUs) / 1000L + 1L)
    Iterator.empty
  }

  /** The staged ranked stream both sinks consume: fixture replay →
    * watermark → bounded-heap leaderboard state. */
  private def rankedPipeline(spark: SparkSession, dir: String,
      prefix: String): (org.apache.spark.sql.Dataset[Ranked],
      java.nio.file.Path, org.apache.spark.sql.types.StructType) = {
    import spark.implicits._
    val (raw, streamDir, rawSchema) = StreamingStaging.stageParquetStream(
      spark, dir, "events", prefix)
    val events = raw
      .transform(graft.sources.Tables.normalizeEventTs)
      .withWatermark("ts", "1 second")
      .select(col("ts"), col("event_type"), col("event_id"), col("value"))
      .as[Ev]
    val ranked = events
      .groupByKey(e => (us(e.ts) / HourUs * HourUs, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
    (ranked, streamDir, rawSchema)
  }

  /** Append the far-future sentinel event that advances the watermark
    * past every real hour so the open buckets time out and emit. */
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

  /** Replay the events fixture through the streaming leaderboard (same
    * staging + far-future sentinel pattern as [[StreamingSessions]]). */
  def hourlyTopStreaming(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val (ranked, streamDir, rawSchema) = rankedPipeline(
      spark, dir, "graft_stream_lead")
    val sink = s"graft_stream_lead_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    StreamingStaging.runAndDrive(spark, sink, streamDir)(
      ranked.toDF()
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .start()) { query =>
      query.processAllAvailable()
      pushSentinel(spark, path, streamDir, rawSchema)
      query.processAllAvailable()
    }
      .filter(col("event_id") =!= -1L)
  }

  /** [[hourlyTopStreaming]] with the PRODUCTION sink: Spark's native
    * append-mode parquet FILE sink. Unlike the `foreachBatch`
    * snapshot-overwrite twins ([[StreamingIncremental]],
    * [[StreamingSketch]] — whose complete-mode output makes overwrite
    * the idempotent choice), an append-mode leaderboard emits each
    * closed hour exactly once, which is precisely the contract the file
    * sink's `_spark_metadata` manifest provides: files commit atomically
    * per micro-batch, a retried batch never double-appends, and batch
    * readers of the SAME path honor the manifest — so the read-back
    * below sees exactly the committed rows. At 100 TB/day this is a
    * continuously-growing ranked-results table any engine can consume.
    * The sentinel bucket is filtered BEFORE the sink so the files only
    * ever hold real rows. `StreamingLeaderboardSpec` pins
    * parquet ≡ memory ≡ batch. */
  def hourlyTopStreamingToParquet(spark: SparkSession, dir: String,
      outDir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val (ranked, streamDir, rawSchema) = rankedPipeline(
      spark, dir, "graft_stream_leadpq")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lead_ckpt")
    try {
      val query = ranked.toDF()
        .filter(col("event_id") =!= -1L)
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
