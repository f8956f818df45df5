package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming decode twin must reproduce `mm_decode_png`'s batch
  * output bit-for-bit on the finite replay: same payload synthesis,
  * same real codec, same fingerprints — through the streaming engine's
  * per-micro-batch execution of the identical stateless dataflow. */
class StreamingDecodeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming PNG decode equals the batch fingerprints exactly") {
    val batch = graft.operators.Multimodal.decodePng(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val streamed = StreamingDecode.decodePngStreaming(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }
}
