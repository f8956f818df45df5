package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom-state (`flatMapGroupsWithState`) sessionizer must produce
  * exactly the batch `session_window` sessions — same boundaries, counts,
  * and bit-identical decimal-exact value sums. */
class StreamingSessionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("flatMapGroupsWithState sessionization equals batch session_window") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))
    val batch = StreamingEvents.sessionAggBatch(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(3), r.getDouble(4))).toMap
    val custom = StreamingSessions.sessionizeCustomState(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(batch.nonEmpty)
    assert(custom == batch)
  }
}
