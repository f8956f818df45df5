package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming incremental dedup (delta stream vs static history band
  * index, stream-static joins) must reproduce the batch operator's
  * verdicts bit-for-bit on the finite replay — Jaccard doubles included
  * (both sides divide the same int sizes). */
class StreamingIncrementalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming incremental dedup equals the batch verdicts exactly") {
    val batch = graft.operators.Dedup.incremental(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val streamed = StreamingIncremental.incrementalStreaming(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(batch.nonEmpty, "fixture must plant cross-duplicates")
    assert(streamed == batch)
    // every verdict is a planted copy resolving to a history doc no
    // later than its own original (min over matches — the original
    // itself, or an even-earlier doc the original near-duplicates)
    batch.foreach { case (deltaId, (dupOf, _, _)) =>
      assert(deltaId >= 100000L && dupOf <= deltaId - 100000L)
    }
  }
}
