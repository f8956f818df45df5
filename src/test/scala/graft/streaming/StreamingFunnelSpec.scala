package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming funnel must equal the batch `events_funnel` rows
  * bit-for-bit on the finite replay: stage timestamps carry no
  * arithmetic, and the forward-only recurrence is the batch layered
  * window minima folded in event-time order. */
class StreamingFunnelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming funnel equals the batch layered-window form") {
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getLong(0) -> (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))
    }.toMap
    val batch = keyed(graft.operators.Events.funnel(spark, dir).collect())
    val streamed = keyed(StreamingFunnel.funnelStreaming(spark, dir)
      .select("user_id", "v_ts", "c_ts", "p_ts", "steps", "completed",
        "funnel_us").collect())
    assert(batch.nonEmpty)
    // every batch user appears, incl. 0-stage drop-off rows
    assert(streamed == batch)
    // the fixture exercises every stage depth
    assert(batch.values.map(_._4).toSet == Set(0L, 1L, 2L, 3L) ||
      batch.values.map(_._4).toSet == Set(1L, 2L, 3L),
      s"stage depths seen: ${batch.values.map(_._4).toSet}")
  }
}
