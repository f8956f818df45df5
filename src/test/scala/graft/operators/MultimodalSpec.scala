package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The mapPartitions decode plumbing must agree with the expression-based
  * feature path (same byte histogram, normalized), proving a real codec
  * can slot into [[Multimodal.decodeFeatures]] without touching the
  * Spark-side shape. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("mapPartitions decode equals the expression histogram (normalized)") {
    val viaExpr = Multimodal.features(spark, dir).collect()
      .map { r =>
        val total = (1 to 16).map(r.getLong).sum.toFloat
        r.getLong(0) -> (1 to 16).map(i => r.getLong(i) / total).toVector
      }.toMap
    val viaPartitions = Multimodal.decodeFeatures(spark, dir).collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble.toFloat).toVector
      }.toMap
    assert(viaExpr.nonEmpty)
    assert(viaPartitions.keySet == viaExpr.keySet)
    viaExpr.foreach { case (id, expected) =>
      val actual = viaPartitions(id)
      expected.zip(actual).foreach { case (e, a) =>
        assert(math.abs(e - a) < 1e-6f, s"doc $id: $expected vs $actual")
      }
    }
  }

  /** Minimal RIFF/WAVE writer for the spec: 16-bit PCM mono, 8 kHz. */
  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("REAL decode: synthesized WAV/PCM payloads round-trip through decodeMedia") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a ramp, a square wave, extremes, and an empty clip
    val clips: Seq[(Long, Array[Short])] = Seq(
      1L -> Array.tabulate(64)(i => (i * 512 - 16384).toShort),
      2L -> Array.tabulate(32)(i => if (i % 2 == 0) 16000.toShort else (-16000).toShort),
      3L -> Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue),
      4L -> Array.empty[Short])
    val df = clips.map { case (id, s) => (id, wavBytes(s)) }
      .toDF("doc_id", "payload")
    val decoded = Multimodal.decodeMedia(df, Multimodal.wavPcmDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(decoded.keySet == clips.map(_._1).toSet)
    clips.foreach { case (id, s) =>
      val expect = s.map(_ / 32768.0f).toSeq
      assert(decoded(id) == expect, s"clip $id")
    }
    // corrupt payloads fail loudly, not silently
    val bad = Seq((9L, Array.fill[Byte](44)(0))).toDF("doc_id", "payload")
    val e = intercept[Exception] {
      Multimodal.decodeMedia(bad, Multimodal.wavPcmDecoder).collect()
    }
    assert(e.getMessage != null)
  }

  test("payload metadata carries byte-accurate sizes") {
    val rows = Multimodal.metadata(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) == "utf8"))
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("resize fingerprints are stable across runs (fixed 64-sample frame)") {
    val a = Multimodal.resize(spark, dir).collect().toSeq
    val b = Multimodal.resize(spark, dir).collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
