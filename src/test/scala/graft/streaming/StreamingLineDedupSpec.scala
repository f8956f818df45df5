package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming line-dedup (static frequent-line set, stateless
  * per-document strip) must reproduce the batch operator's rebuilt
  * texts and removal counts exactly on the finite replay. */
class StreamingLineDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming line dedup equals the batch strip exactly") {
    val batch = graft.operators.TextAnalysis.lineDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val streamed = StreamingLineDedup.lineDedupStreaming(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(batch.values.exists(_._2 > 0L),
      "fixture sources must be big enough to strip something")
    assert(streamed == batch)
  }
}
