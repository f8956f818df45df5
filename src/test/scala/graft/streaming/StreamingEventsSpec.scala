package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming replay of the hourly aggregation must equal the batch
  * result bit-for-bit (decimal-exact sums, same window grid). */
class StreamingEventsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming hourly aggregate equals the batch aggregate exactly") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getTimestamp(0), r.getString(1))
    val batch = StreamingEvents.hourlyAggBatch(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    val streamed = StreamingEvents.hourlyAggStreaming(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming sessionization (watermarked session_window) equals batch") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))
    val batch = StreamingEvents.sessionAggBatch(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(3), r.getDouble(4))).toMap
    val streamed = StreamingEvents.sessionizeStreaming(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }
}
