package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming leaderboard must equal the batch `events_hourly_top`
  * rows bit-for-bit on the finite replay: values carry no arithmetic and
  * the state keeps the batch ordering key, so even the doubles match
  * exactly. */
class StreamingLeaderboardSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming hourly top-3 equals the batch query exactly") {
    val batch = graft.operators.Events.hourlyTop(spark, dir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    val streamed = StreamingLeaderboard.hourlyTopStreaming(spark, dir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("native parquet file sink equals the memory-sink twin and the batch query") {
    val batch = graft.operators.Events.hourlyTop(spark, dir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    val outDir = java.nio.file.Files.createTempDirectory("graft_lead_out")
    try {
      val sunk = StreamingLeaderboard
        .hourlyTopStreamingToParquet(spark, dir, outDir.toString).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSet
      assert(batch.nonEmpty)
      assert(sunk == batch)
      // the sink's exactly-once manifest must be present: batch readers
      // of this path see only files the stream committed
      assert(java.nio.file.Files.exists(outDir.resolve("_spark_metadata")))
    } finally StreamingStaging.deleteRecursively(outDir)
  }
}
