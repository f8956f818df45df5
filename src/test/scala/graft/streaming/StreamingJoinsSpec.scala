package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The watermarked stream-stream interval join must produce exactly the
  * batch bin-bucketed range join's rows (which in turn hash-match the
  * DuckDB inequality-join oracle). */
class StreamingJoinsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("stream-stream interval join equals the batch range join") {
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val batch = graft.operators.Events.rangeJoin(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4),
        r.getLong(5))).toMap
    val streamed = StreamingJoins.rangeJoinStreaming(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4),
        r.getLong(5))).toMap
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }
}
