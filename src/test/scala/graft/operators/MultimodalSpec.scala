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

  /** Minimal 24bpp BMP writer for the spec: BGR rows, 4-byte padded,
    * bottom-up unless topDown. `pixels` is row-major TOP-DOWN (r,g,b). */
  private def bmpBytes(width: Int, height: Int,
      pixels: Seq[(Int, Int, Int)], topDown: Boolean = false): Array[Byte] = {
    val rowBytes = ((24 * width + 31) / 32) * 4
    val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * height)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * height)
      .putInt(0).putInt(54) // reserved, pixel-data offset
      .putInt(40).putInt(width).putInt(if (topDown) -height else height)
      .putShort(1).putShort(24).putInt(0).putInt(rowBytes * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val storedRows = // file stores bottom-up unless topDown
      if (topDown) 0 until height else (height - 1) to 0 by -1
    for (y <- storedRows) {
      var written = 0
      for (x <- 0 until width) {
        val (r, g, b) = pixels(y * width + x)
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
        written += 3
      }
      while (written < rowBytes) { bb.put(0.toByte); written += 1 }
    }
    bb.array()
  }

  test("REAL decode: synthesized BMPs round-trip through decodeMedia") {
    import spark.implicits._
    // 3x2 with distinct channel extremes exercises padding + BGR order +
    // the bottom-up flip; the top-down variant must decode identically
    val px = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255),
      (255, 255, 255), (0, 0, 0), (128, 128, 128))
    val expect = px.map { case (r, g, b) =>
      (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f }
    val df = Seq(
        (1L, bmpBytes(3, 2, px)),
        (2L, bmpBytes(3, 2, px, topDown = true)),
        (3L, bmpBytes(1, 1, Seq((7, 70, 200)))))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeMedia(df, Multimodal.bmpDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L) == expect)
    assert(out(2L) == expect) // orientation-normalized
    assert(out(3L).size == 1)
    // corrupt and unsupported payloads fail loudly
    val bad = Seq((9L, "not a bitmap at all".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    intercept[Exception] {
      Multimodal.decodeMedia(bad, Multimodal.bmpDecoder).collect()
    }
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
