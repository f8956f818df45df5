package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming bloom decontamination (static bloom literal + static
  * exact-confirm set, stream-static join) must reproduce the batch
  * operator's per-document contamination counts exactly on the finite
  * replay. */
class StreamingDecontaminateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming bloom decontamination equals the batch counts exactly") {
    val batch = graft.operators.TextAnalysis.decontaminate(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = StreamingDecontaminate.bloomStreaming(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty, "fixture must have contaminated train docs")
    assert(streamed == batch)
  }
}
