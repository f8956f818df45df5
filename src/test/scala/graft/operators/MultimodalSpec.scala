package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-trip specs for every pure-JVM codec through the mapPartitions
  * decode plumbing, plus in-Spark replays of the mm oracle arithmetic:
  * every mm query consumes REAL codec output, so each spec re-derives the
  * expected value from `text`/the synthesized pixels independently. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("mm_features histograms the real PNG-decoded pixels") {
    val got = Multimodal.features(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector).toMap
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty && got.size == texts.length)
    texts.foreach { case (id, text) =>
      val px = Multimodal.pngPixels(text)
      val expect = Array.fill(16)(0L)
      px.foreach(b => expect((b & 0xff) % 16) += 1L)
      assert(got(id) == expect.toVector, s"doc $id")
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

  test("REAL decode: compressed PNGs round-trip through decodeMedia") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    // ≥5 rows so every PNG filter type (y % 5) is exercised; a wide image
    // so the deflated stream spans multiple 512-byte IDAT chunks
    val images: Seq[(Long, Array[Byte], Int)] = Seq(
      (1L, Array.tabulate[Byte](16 * 7)(i => (i * 37 % 256).toByte), 16),
      (2L, Array.fill[Byte](256 * 8)(rng.nextInt(256).toByte), 256),
      (3L, Array.fill[Byte](4)(0), 2), // constant-black tiny image
      (4L, Array.tabulate[Byte](3 * 5)(i => (255 - i).toByte), 3))
    val df = images.map { case (id, px, w) =>
      (id, Multimodal.pngEncode(px, w))
    }.toDF("doc_id", "payload")
    val out = Multimodal.decodeMedia(df, Multimodal.pngDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    images.foreach { case (id, px, _) =>
      val expect = px.map(b => (b & 0xff) / 255.0f).toSeq
      assert(out(id) == expect, s"image $id")
    }
    // multi-IDAT is actually on for the wide image (512-byte chunks)
    val wide = Multimodal.pngEncode(images(1)._2, 256)
    var pos = 8
    var idatCount = 0
    while (pos + 8 <= wide.length) {
      val len = ((wide(pos) & 0xff) << 24) | ((wide(pos + 1) & 0xff) << 16) |
        ((wide(pos + 2) & 0xff) << 8) | (wide(pos + 3) & 0xff)
      if (new String(wide, pos + 4, 4, "US-ASCII") == "IDAT") idatCount += 1
      pos += 12 + len
    }
    assert(idatCount >= 2, s"expected multi-IDAT, got $idatCount chunk(s)")
  }

  test("PNG decoder handles truecolor RGB and rejects corrupt payloads") {
    // hand-built RGB PNG (color type 2, filter 0 rows) — the decoder must
    // apply the same Rec.601 luma as the BMP path
    def rgbPng(width: Int, height: Int, px: Seq[(Int, Int, Int)]): Array[Byte] = {
      val raw = new java.io.ByteArrayOutputStream()
      for (y <- 0 until height) {
        raw.write(0) // filter: None
        for (x <- 0 until width) {
          val (r, g, b) = px(y * width + x)
          raw.write(r); raw.write(g); raw.write(b)
        }
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw.toByteArray); deflater.finish()
      val zbuf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      val out = new java.io.ByteArrayOutputStream()
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        def be32(v: Long): Unit = (24 to 0 by -8)
          .foreach(s => out.write(((v >>> s) & 0xff).toInt))
        be32(data.length.toLong)
        val tb = typ.getBytes("US-ASCII")
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        be32(crc.getValue)
      }
      chunk("IHDR", java.nio.ByteBuffer.allocate(13)
        .putInt(width).putInt(height).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array())
      chunk("IDAT", zbuf.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
    val px = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (128, 128, 128))
    val expect = px.map { case (r, g, b) =>
      (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f }
    assert(Multimodal.pngDecoder(rgbPng(2, 2, px)).toSeq == expect)
    // corruption surfaces as clear errors, never silent wrong pixels
    val good = Multimodal.pngEncode(Array.tabulate[Byte](32)(_.toByte), 16)
    intercept[IllegalArgumentException] { // flipped payload byte → CRC fail
      val bad = good.clone(); bad(40) = (bad(40) ^ 0x1).toByte
      Multimodal.pngDecoder(bad)
    }
    intercept[IllegalArgumentException] { // truncated stream
      Multimodal.pngDecoder(good.take(good.length - 8))
    }
    intercept[IllegalArgumentException] { // not a PNG at all
      Multimodal.pngDecoder("definitely not a png".getBytes("US-ASCII"))
    }
  }

  test("mm_decode_png fingerprints equal the text-derived oracle pixels") {
    // the in-Spark replay of the DuckDB oracle arithmetic: codepoint % 256,
    // space-padded to a 16-wide raster, Karp–Rabin base 31 mod 1e9+7
    val got = Multimodal.decodePng(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty && got.size == texts.length)
    texts.foreach { case (id, text) =>
      val px = Multimodal.pngPixels(text)
      val fp = px.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
      assert(got(id) == ((px.length.toLong, fp)), s"doc $id")
    }
  }

  test("REAL decode: LZW-compressed GIFs round-trip through decodeMedia") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // the large random image drives the LZW table past 4096 entries, so
    // code-width growth AND the clear/reset path are both exercised
    val images: Seq[(Long, Array[Byte], Int)] = Seq(
      (1L, Array.tabulate[Byte](16 * 7)(i => (i * 37 % 256).toByte), 16),
      (2L, Array.fill[Byte](128 * 128)(rng.nextInt(256).toByte), 128),
      (3L, Array.fill[Byte](64 * 4)(5), 8), // constant runs compress hard
      (4L, Array.tabulate[Byte](3 * 5)(i => (255 - i).toByte), 3))
    val df = images.map { case (id, px, w) =>
      (id, Multimodal.gifEncode(px, w))
    }.toDF("doc_id", "payload")
    val out = Multimodal.decodeMedia(df, Multimodal.gifDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    images.foreach { case (id, px, _) =>
      // grayscale palette entry (v, v, v) comes back as float luma —
      // same rounding as the BMP/PNG decoders
      val expect = px.map { bb =>
        val v = bb & 0xff
        (0.299f * v + 0.587f * v + 0.114f * v) / 255.0f
      }.toSeq
      assert(out(id) == expect, s"image $id")
    }
    // corruption fails loudly: a bad magic and a truncated stream
    intercept[IllegalArgumentException] {
      Multimodal.gifDecoder("GIF99a not really".getBytes("US-ASCII"))
    }
    intercept[Exception] {
      val good = Multimodal.gifEncode(Array.tabulate[Byte](64)(_.toByte), 8)
      Multimodal.gifDecoder(good.take(good.length / 2))
    }
    // hostile image descriptor claiming 65535x65535: the Long product cap
    // must fire before any allocation sized from the wrapped Int product
    val hostile = Multimodal.gifEncode(Array.tabulate[Byte](64)(_.toByte), 8)
    // descriptor sits after the 13-byte header + global color table:
    // 2C left(2) top(2) width(2) height(2) packed
    val hpacked = hostile(10) & 0xff
    val desc = 13 + (if ((hpacked & 0x80) != 0) 3 << ((hpacked & 7) + 1) else 0)
    assert((hostile(desc) & 0xff) == 0x2C, "descriptor offset")
    hostile(desc + 5) = 0xff.toByte; hostile(desc + 6) = 0xff.toByte
    hostile(desc + 7) = 0xff.toByte; hostile(desc + 8) = 0xff.toByte
    val big = intercept[IllegalArgumentException] {
      Multimodal.gifDecoder(hostile)
    }
    assert(big.getMessage.contains("too large"))
  }

  test("REAL decode: constant-block JPEGs round-trip exactly (incl. restarts)") {
    import spark.implicits._
    // constant 8×8 blocks have only a DC coefficient; with ExactQuant
    // (DC step 8) the quantized DC is the level-shifted value itself, so
    // the lossy pipeline is bit-exact — the property mm_decode_jpeg's
    // oracle leans on. 4×3 blocks of every-other value + restart markers
    // every 5 MCUs (12 MCUs → RST0, RST1 mid-scan).
    def blockImage(vals: Seq[Int], blocksX: Int): Array[Byte] = {
      val blocksY = vals.length / blocksX
      Array.tabulate[Byte](blocksX * 8 * blocksY * 8) { i =>
        val xx = i % (blocksX * 8); val yy = i / (blocksX * 8)
        vals((yy / 8) * blocksX + (xx / 8)).toByte
      }
    }
    val vals = Seq(0, 255, 128, 1, 254, 127, 63, 192, 31, 17, 200, 99)
    val img = blockImage(vals, 4)
    val payloads = Seq(
      1L -> Jpeg.encodeGray(img, 32, Jpeg.ExactQuant),
      2L -> Jpeg.encodeGray(img, 32, Jpeg.ExactQuant, restartEvery = 5))
    val df = payloads.toDF("doc_id", "payload")
    val out = Multimodal.decodeMedia(df, Multimodal.jpegDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val expect = img.map(b => (b & 0xff) / 255.0f).toSeq
    assert(out(1L) == expect)
    assert(out(2L) == expect, "restart-marker path must decode identically")
    // the DRI payload really contains restart markers
    val hex = payloads(1)._2.map(b => f"${b & 0xff}%02x").mkString
    assert(hex.contains("ffd0") && hex.contains("ffd1"))
  }

  test("JPEG general path: odd dimensions crop, quant error is bounded") {
    val rng = new scala.util.Random(11)
    // 21×13 random image: MCU grid is 3×2 blocks, edge blocks padded —
    // decode must crop back to the SOF dims. All-ones quant bounds the
    // reconstruction error to DCT rounding (≪ 1 gray level per pixel on
    // average; assert a conservative per-pixel ceiling).
    val px = Array.fill[Byte](21 * 13)(rng.nextInt(256).toByte)
    val (w, h, got) = Jpeg.decodeGray(Jpeg.encodeGray(px, 21, Jpeg.UnitQuant))
    assert(w == 21 && h == 13 && got.length == px.length)
    val maxErr = px.indices.map(i => math.abs((px(i) & 0xff) - (got(i) & 0xff))).max
    assert(maxErr <= 2, s"unit-quant max error $maxErr")
    // the realistic Annex K table on a smooth gradient stays visually
    // faithful (coarse high-frequency steps never fire on smooth input)
    val grad = Array.tabulate[Byte](64 * 32)(i => ((i % 64) * 4).toByte)
    val (_, _, gotStd) = Jpeg.decodeGray(Jpeg.encodeGray(grad, 64, Jpeg.StdQuant))
    val gradErr = grad.indices.map(i =>
      math.abs((grad(i) & 0xff) - (gotStd(i) & 0xff))).max
    assert(gradErr <= 16, s"std-quant gradient max error $gradErr")
    // corruption fails loudly, never silent wrong pixels
    intercept[IllegalArgumentException] {
      Jpeg.decodeGray("not a jpeg".getBytes("US-ASCII"))
    }
    intercept[Exception] {
      val good = Jpeg.encodeGray(px, 21, Jpeg.UnitQuant)
      Jpeg.decodeGray(good.take(good.length / 2))
    }
    intercept[IllegalArgumentException] { // progressive SOF2 rejected clearly
      val prog = Jpeg.encodeGray(px, 21, Jpeg.UnitQuant)
      val at = prog.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
      prog(at + 1) = 0xc2.toByte
      Jpeg.decodeGray(prog)
    }
    // a hostile SOF0 claiming 65535x65535 (~4.3e9 px) must hit the Long
    // product cap, not wrap Int into a NegativeArraySizeException or
    // attempt a multi-GB allocation
    val hostile = Jpeg.encodeGray(px, 21, Jpeg.UnitQuant)
    val sof = hostile.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    // SOF0 layout: FF C0 len(2) prec(1) height(2) width(2) ...
    hostile(sof + 5) = 0xff.toByte; hostile(sof + 6) = 0xff.toByte
    hostile(sof + 7) = 0xff.toByte; hostile(sof + 8) = 0xff.toByte
    val big = intercept[IllegalArgumentException] { Jpeg.decodeGray(hostile) }
    assert(big.getMessage.contains("too large"))
  }

  /** The decoder's JFIF YCbCr→RGB tail, re-derived independently. */
  private def jfifRgb(yv: Int, cb: Int, cr: Int): Seq[Int] = {
    def cl(v: Double): Int =
      math.max(0, math.min(255, math.floor(v).toInt))
    Seq(
      cl(yv.toDouble + 1.402 * (cr - 128) + 0.5),
      cl(yv.toDouble - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5),
      cl(yv.toDouble + 1.772 * (cb - 128) + 0.5))
  }

  test("COLOR JPEG: constant-block 4:2:0 round-trips exactly (incl. restarts)") {
    // 32×32 image = 2×2 interleaved MCUs: 16 distinct constant luma
    // blocks + 4 distinct constant chroma blocks per plane, so any
    // mistake in the MCU interleave order, per-component predictors or
    // chroma upsample geometry moves a value and fails the comparison.
    val yVals = (0 until 16).map(i => 16 * i + 8)
    val cbVals = Seq(40, 90, 140, 190)
    val crVals = Seq(200, 150, 100, 50)
    val y = Array.tabulate[Byte](32 * 32) { i =>
      val xx = i % 32; val yy = i / 32
      yVals((yy / 8) * 4 + xx / 8).toByte
    }
    def chroma(vals: Seq[Int]) = Array.tabulate[Byte](16 * 16) { i =>
      val xx = i % 16; val yy = i / 16
      vals((yy / 8) * 2 + xx / 8).toByte
    }
    val cb = chroma(cbVals)
    val cr = chroma(crVals)
    val expect = (0 until 32).flatMap { yy =>
      (0 until 32).flatMap { xx =>
        jfifRgb(yVals((yy / 8) * 4 + xx / 8),
          cbVals((yy / 16) * 2 + xx / 16),
          crVals((yy / 16) * 2 + xx / 16))
      }
    }
    for (restart <- Seq(0, 1, 3)) {
      val payload = Jpeg.encodeYcbcr420(y, cb, cr, 32, 32,
        Jpeg.ExactQuant, Jpeg.ExactQuant, restartEvery = restart)
      val (w, h, rgb) = Jpeg.decodeColor(payload)
      assert(w == 32 && h == 32 && rgb.length == 32 * 32 * 3)
      assert(rgb.map(_ & 0xff).toSeq == expect, s"restartEvery=$restart")
    }
    // the DRI payload really carries restart markers
    val hex = Jpeg.encodeYcbcr420(y, cb, cr, 32, 32,
      Jpeg.ExactQuant, Jpeg.ExactQuant, restartEvery = 1)
      .map(b => f"${b & 0xff}%02x").mkString
    assert(hex.contains("ffd0") && hex.contains("ffd1"))
  }

  test("PROGRESSIVE JPEG: the 4-scan SA script decodes identically to baseline") {
    // same quantized coefficients reach the decoder through the
    // progressive grammar (DC/AC first scans at Al=1, refinement to
    // Al=0 with EOB-run coding), so the decoded pixels must equal the
    // BASELINE round trip bit-for-bit — on arbitrary images. Random
    // content exercises EOBRUN spans, ZRL folds inside refinement, and
    // inline correction bits; the gradient under StdQuant exercises
    // long zero runs and coarse-quant sparsity.
    val rng = new scala.util.Random(37)
    val cases = Seq(
      (21, 13, Jpeg.UnitQuant, "random"),
      (32, 24, Jpeg.StdQuant, "random"),
      (64, 32, Jpeg.StdQuant, "gradient"),
      (8, 8, Jpeg.UnitQuant, "random"))
    for ((w, h, quant, kind) <- cases) {
      val px =
        if (kind == "random") Array.fill[Byte](w * h)(rng.nextInt(256).toByte)
        else Array.tabulate[Byte](w * h)(i => ((i % w) * 4).toByte)
      val (bwid, bhei, base) = Jpeg.decodeGray(Jpeg.encodeGray(px, w, quant))
      val (pwid, phei, prog) =
        Jpeg.decodeGray(Jpeg.encodeGrayProgressive(px, w, quant))
      assert(pwid == bwid && phei == bhei)
      assert(prog.toSeq == base.toSeq, s"${w}x$h $kind: progressive != baseline")
    }
    // band-SPLIT scripts — the shape real crawl progressives use
    // (DC; AC 1–5; AC 6–63; refinements per band) — must also decode
    // identically: per-band EOB runs and the scan sequencing differ,
    // the reconstructed coefficients do not
    val rng2 = new scala.util.Random(43)
    val px2 = Array.fill[Byte](29 * 17)(rng2.nextInt(256).toByte)
    val (_, _, baseSplit) = Jpeg.decodeGray(Jpeg.encodeGray(px2, 29, Jpeg.StdQuant))
    for (bands <- Seq(Seq((1, 5), (6, 63)), Seq((1, 2), (3, 9), (10, 63)))) {
      val (_, _, progSplit) = Jpeg.decodeGray(
        Jpeg.encodeGrayProgressive(px2, 29, Jpeg.StdQuant, bands))
      assert(progSplit.toSeq == baseSplit.toSeq, s"band split $bands")
    }
    // degenerate band splits rejected at encode time
    intercept[IllegalArgumentException] {
      Jpeg.encodeGrayProgressive(px2, 29, Jpeg.StdQuant, Seq((1, 30)))
    }
    // constant blocks + ExactQuant: progressive round trip is bit-exact
    // against the SOURCE, same contract as the baseline oracle path
    val vals = Seq(0, 255, 128, 1, 254, 127, 63, 192, 31, 17, 200, 99)
    val img = Array.tabulate[Byte](32 * 24) { i =>
      val xx = i % 32; val yy = i / 32
      vals((yy / 8) * 4 + xx / 8).toByte
    }
    val (_, _, got) =
      Jpeg.decodeGray(Jpeg.encodeGrayProgressive(img, 32, Jpeg.ExactQuant))
    assert(got.toSeq == img.toSeq)
  }

  test("PROGRESSIVE COLOR JPEG decodes identically to the baseline color path") {
    // progressive color is the most common web-JPEG shape: interleaved
    // DC scans over 16×16 MCUs + per-component AC band scans with
    // refinement to Al=0. Identical quantized coefficients reach the
    // decoder, so pixels must equal the BASELINE color round trip
    // bit-for-bit — random planes exercise chroma EOB runs, per-comp
    // predictors and the padded-vs-data block grids (odd dims).
    val rng = new scala.util.Random(41)
    for ((w, h) <- Seq((32, 32), (21, 13))) {
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val y = Array.fill[Byte](w * h)(rng.nextInt(256).toByte)
      val cb = Array.fill[Byte](cw * ch)(rng.nextInt(256).toByte)
      val cr = Array.fill[Byte](cw * ch)(rng.nextInt(256).toByte)
      val (bw2, bh2, base) = Jpeg.decodeColor(
        Jpeg.encodeYcbcr420(y, cb, cr, w, h, Jpeg.UnitQuant, Jpeg.UnitQuant))
      val (pw2, ph2, prog) = Jpeg.decodeColor(
        Jpeg.encodeYcbcr420Progressive(y, cb, cr, w, h,
          Jpeg.UnitQuant, Jpeg.UnitQuant))
      assert(pw2 == bw2 && ph2 == bh2)
      assert(prog.toSeq == base.toSeq, s"${w}x$h: progressive != baseline color")
    }
    // constant-MCU planes + ExactQuant: bit-exact against the source
    // JFIF conversion, same contract as the baseline 4:2:0 test
    val yVals = (0 until 16).map(i => 16 * i + 8)
    val cbVals = Seq(40, 90, 140, 190)
    val crVals = Seq(200, 150, 100, 50)
    val y = Array.tabulate[Byte](32 * 32) { i =>
      val xx = i % 32; val yy = i / 32
      yVals((yy / 8) * 4 + xx / 8).toByte
    }
    def chroma(vals: Seq[Int]) = Array.tabulate[Byte](16 * 16) { i =>
      val xx = i % 16; val yy = i / 16
      vals((yy / 8) * 2 + xx / 8).toByte
    }
    val (_, _, rgb) = Jpeg.decodeColor(Jpeg.encodeYcbcr420Progressive(
      y, chroma(cbVals), chroma(crVals), 32, 32,
      Jpeg.ExactQuant, Jpeg.ExactQuant))
    val expect = (0 until 32).flatMap { yy =>
      (0 until 32).flatMap { xx =>
        jfifRgb(yVals((yy / 8) * 4 + xx / 8),
          cbVals((yy / 16) * 2 + xx / 16), crVals((yy / 16) * 2 + xx / 16))
      }
    }
    assert(rgb.map(_ & 0xff).toSeq == expect)
  }

  test("COLOR JPEG: 4:4:4 and 4:2:2 sampling grids round-trip exactly") {
    // 16×16 image, distinct constants per 8×8 block in every plane, so
    // a wrong MCU geometry or chroma-upsample stride moves a value.
    val yVals = Seq(30, 80, 130, 180)
    val y = Array.tabulate[Byte](16 * 16) { i =>
      val xx = i % 16; val yy = i / 16
      yVals((yy / 8) * 2 + xx / 8).toByte
    }
    // 4:4:4 — full-resolution chroma, MCU = one 8×8 block per component
    val cbVals = Seq(60, 110, 160, 210)
    val crVals = Seq(220, 170, 120, 70)
    def fullChroma(vals: Seq[Int]) = Array.tabulate[Byte](16 * 16) { i =>
      val xx = i % 16; val yy = i / 16
      vals((yy / 8) * 2 + xx / 8).toByte
    }
    val p444 = Jpeg.encodeYcbcr(y, fullChroma(cbVals), fullChroma(crVals),
      16, 16, 1, 1, Jpeg.ExactQuant, Jpeg.ExactQuant)
    val (w444, h444, rgb444) = Jpeg.decodeColor(p444)
    assert(w444 == 16 && h444 == 16)
    val expect444 = (0 until 16).flatMap { yy =>
      (0 until 16).flatMap { xx =>
        jfifRgb(yVals((yy / 8) * 2 + xx / 8),
          cbVals((yy / 8) * 2 + xx / 8), crVals((yy / 8) * 2 + xx / 8))
      }
    }
    assert(rgb444.map(_ & 0xff).toSeq == expect444)
    // 4:2:2 — chroma halved horizontally only: plane 8×16, two 8×8
    // blocks stacked vertically, each covering a 16×8 image band
    val cb22 = Seq(50, 200)
    val cr22 = Seq(190, 40)
    def halfChroma(vals: Seq[Int]) = Array.tabulate[Byte](8 * 16) { i =>
      vals((i / 8) / 8).toByte
    }
    val p422 = Jpeg.encodeYcbcr(y, halfChroma(cb22), halfChroma(cr22),
      16, 16, 2, 1, Jpeg.ExactQuant, Jpeg.ExactQuant, restartEvery = 1)
    val (w422, h422, rgb422) = Jpeg.decodeColor(p422)
    assert(w422 == 16 && h422 == 16)
    val expect422 = (0 until 16).flatMap { yy =>
      (0 until 16).flatMap { xx =>
        jfifRgb(yVals((yy / 8) * 2 + xx / 8), cb22(yy / 8), cr22(yy / 8))
      }
    }
    assert(rgb422.map(_ & 0xff).toSeq == expect422)
  }

  test("COLOR JPEG general path: odd dims crop, quant error bounded, errors loud") {
    val rng = new scala.util.Random(23)
    // 21×13: MCU grid 2×1, luma 42 edge-padded blocks cropped back; the
    // chroma planes are smooth so 4:2:0's replication upsample dominates
    // the error budget only through the DCT rounding of each plane.
    val w = 21; val h = 13
    val y = Array.tabulate[Byte](w * h)(i => ((i * 7) % 256).toByte)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val cb = Array.tabulate[Byte](cw * ch)(i => (60 + (i % 5)).toByte)
    val cr = Array.tabulate[Byte](cw * ch)(i => (180 - (i % 7)).toByte)
    val (gw, gh, rgb) = Jpeg.decodeColor(
      Jpeg.encodeYcbcr420(y, cb, cr, w, h, Jpeg.UnitQuant, Jpeg.UnitQuant))
    assert(gw == w && gh == h && rgb.length == w * h * 3)
    // compare against the JFIF conversion of the ORIGINAL planes: with
    // all-ones quant each plane's reconstruction error is DCT rounding
    // (≤ 2 gray levels), amplified ≤ ~2× by the color matrix
    var maxErr = 0
    for (yy <- 0 until h; xx <- 0 until w) {
      val exp = jfifRgb(y(yy * w + xx) & 0xff,
        cb((yy / 2) * cw + xx / 2) & 0xff, cr((yy / 2) * cw + xx / 2) & 0xff)
      for (c <- 0 until 3) {
        val gotV = rgb((yy * w + xx) * 3 + c) & 0xff
        maxErr = math.max(maxErr, math.abs(gotV - exp(c)))
      }
    }
    assert(maxErr <= 6, s"unit-quant color max error $maxErr")
    // wrong-front rejections are clean and specific
    val gray = Jpeg.encodeGray(y, w, Jpeg.UnitQuant)
    val color = Jpeg.encodeYcbcr420(y, cb, cr, w, h)
    val e1 = intercept[IllegalArgumentException] { Jpeg.decodeGray(color) }
    assert(e1.getMessage.contains("single-component"))
    val e2 = intercept[IllegalArgumentException] { Jpeg.decodeColor(gray) }
    assert(e2.getMessage.contains("3-component"))
    intercept[Exception] { Jpeg.decodeColor(color.take(color.length / 2)) }
    // mismatched plane sizes rejected at encode time
    intercept[IllegalArgumentException] {
      Jpeg.encodeYcbcr420(y, cb.take(3), cr, w, h)
    }
  }

  test("mm_decode_jpeg_color fingerprints equal the oracle pixels") {
    // in-Spark replay of the DuckDB oracle: Y from the 8×-upsampled
    // raster, Cb/Cr from the top-left/top-right of each 2×2 raster
    // group, the same binary64 JFIF conversion, fingerprint interleaved
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    def kr(vs: Iterator[Int]): Long =
      vs.foldLeft(0L)((a, b) => (a * 31 + b) % 1000000007L)
    val got = Multimodal.decodeJpegColor(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    texts.foreach { case (id, text) =>
      val px = Multimodal.pngPixels(text)
      val h = px.length / 16
      val hh = h + (h & 1)
      val fp = kr(for {
        yy <- Iterator.range(0, hh * 8)
        xx <- Iterator.range(0, 128)
        v <- jfifRgb(
          px(math.min(yy / 8, h - 1) * 16 + xx / 8) & 0xff,
          px(math.min((yy / 16) * 2, h - 1) * 16 + (xx / 16) * 2) & 0xff,
          px(math.min((yy / 16) * 2, h - 1) * 16 + (xx / 16) * 2 + 1) & 0xff
        ).iterator
      } yield v)
      assert(got(id) == ((hh * 8L * 128L * 3L, fp)), s"color jpeg doc $id")
    }
  }

  test("REAL decode: MJPEG AVI samples every Nth compressed frame") {
    import spark.implicits._
    // 5 constant 8×8 frames (exact JPEG round trip), stride 2 keeps 0, 2, 4
    val vals = Seq(10, 60, 110, 160, 210)
    val frames = vals.map(v => Array.fill[Byte](64)(v.toByte))
    val avi = Multimodal.aviEncodeMjpeg(frames, 8, 8)
    val df = Seq((1L, avi)).toDF("doc_id", "payload")
    val out = Multimodal.decodeMedia(df, Multimodal.aviFrameSampler(2))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val expect = Seq(0, 2, 4).flatMap(f =>
      Seq.fill(64)(vals(f) / 255.0f))
    assert(out(1L) == expect)
    assert(Multimodal.aviFrameSampler(1)(avi).length == 5 * 64)
  }

  test("mm_decode_jpeg / mm_video_mjpeg fingerprints equal the oracle pixels") {
    // in-Spark replay of the DuckDB oracle arithmetic: the 16-wide raster
    // upsampled 8×8 per pixel (JPEG), and 64-fold per sampled frame (MJPEG)
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    def kr(vs: Iterator[Int]): Long =
      vs.foldLeft(0L)((a, b) => (a * 31 + b) % 1000000007L)
    val gotJpeg = Multimodal.decodeJpeg(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val gotMjpeg = Multimodal.videoMjpeg(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    texts.foreach { case (id, text) =>
      val px = Multimodal.pngPixels(text)
      val h = px.length / 16
      val jfp = kr(for {
        yy <- Iterator.range(0, h * 8)
        xx <- Iterator.range(0, 128)
      } yield px((yy / 8) * 16 + (xx / 8)) & 0xff)
      assert(gotJpeg(id) == ((px.length * 64L, jfp)), s"jpeg doc $id")
      // MJPEG: 4 pixels per 16×16 frame (2×2 grid of constant 8×8
      // blocks), every 2nd frame kept
      val sampledFrames = (0 until px.length / 4).filter(_ % 2 == 0)
      val mfp = kr(sampledFrames.iterator.flatMap(fr => for {
        yy <- Iterator.range(0, 16)
        xx <- Iterator.range(0, 16)
      } yield px(fr * 4 + (yy / 8) * 2 + (xx / 8)) & 0xff))
      assert(gotMjpeg(id) == ((sampledFrames.size * 256L, mfp)), s"mjpeg doc $id")
    }
  }

  test("REAL decode: AVI frame sampling keeps every Nth frame, top-down") {
    import spark.implicits._
    // 5 distinct 4x4 frames; stride 2 keeps frames 0, 2, 4
    val frames = (0 until 5).map(f =>
      Array.tabulate[Byte](16)(i => (f * 40 + i).toByte))
    val avi = Multimodal.aviEncode(frames, 4, 4)
    val df = Seq((1L, avi)).toDF("doc_id", "payload")
    val out = Multimodal.decodeMedia(df, Multimodal.aviFrameSampler(2))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // gray pixels come back as float luma of (v, v, v) — same rounding
    // as the BMP/PNG decoders
    val expect = Seq(0, 2, 4).flatMap(f => frames(f)).map { bb =>
      val v = bb & 0xff
      (0.299f * v + 0.587f * v + 0.114f * v) / 255.0f
    }
    assert(out(1L) == expect)
    // stride 1 keeps everything
    assert(Multimodal.aviFrameSampler(1)(avi).length == 5 * 16)
    // corrupt container fails loudly
    intercept[IllegalArgumentException] {
      Multimodal.aviFrameSampler(2)("RIFFxxxxNOTAVI".getBytes("US-ASCII"))
    }
  }

  test("mediaMetadata parses container headers without decoding pixels") {
    val px = Array.tabulate[Byte](16 * 3)(i => (i * 11).toByte)
    assert(Multimodal.mediaMetadata(Multimodal.pngEncode(px, 16)) ==
      (("png", 16, 3, 1)))
    assert(Multimodal.mediaMetadata(Multimodal.gifEncode(px, 16)) ==
      (("gif", 16, 3, 1)))
    val frames = (0 until 5).map(_ => Array.fill[Byte](16)(7))
    assert(Multimodal.mediaMetadata(Multimodal.aviEncode(frames, 4, 4)) ==
      (("avi", 4, 4, 5)))
    assert(Multimodal.mediaMetadata(
      Multimodal.aviEncodeMjpeg(frames.map(_ => Array.fill[Byte](64)(9)), 8, 8)) ==
      (("avi", 8, 8, 5)))
    // WAV: width = samples per channel, height = channels
    val bb = java.nio.ByteBuffer.allocate(44 + 32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 32)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(32000)
      .putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(32)
    assert(Multimodal.mediaMetadata(bb.array()) == (("wav", 8, 2, 1)))
    // BMP: dims from the BITMAPINFOHEADER, |height| for bottom-up files
    val bmp = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
      .putInt(40).putInt(6).putInt(-2).putShort(1).putShort(24)
    assert(Multimodal.mediaMetadata(bmp.array()) == (("bmp", 6, 2, 1)))
    // raw JPEG: the SOI→SOFn marker walk; sequential frames report
    // "jpeg", progressive SOF2 "jpeg_prog" — across gray and 4:2:0 color
    val jpx = Array.tabulate[Byte](24 * 16)(i => (i * 7).toByte)
    val jch = Array.tabulate[Byte](12 * 8)(i => (i * 11).toByte)
    assert(Multimodal.mediaMetadata(Jpeg.encodeGray(jpx, 24)) ==
      (("jpeg", 24, 16, 1)))
    assert(Multimodal.mediaMetadata(Jpeg.encodeGrayProgressive(jpx, 24)) ==
      (("jpeg_prog", 24, 16, 1)))
    assert(Multimodal.mediaMetadata(
      Jpeg.encodeYcbcr420(jpx, jch, jch, 24, 16)) == (("jpeg", 24, 16, 1)))
    assert(Multimodal.mediaMetadata(
      Jpeg.encodeYcbcr420Progressive(jpx, jch, jch, 24, 16)) ==
      (("jpeg_prog", 24, 16, 1)))
    // a JPEG that ends before any SOF marker is rejected cleanly
    intercept[IllegalArgumentException] {
      Multimodal.mediaMetadata(
        Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))
    }
    // unknown containers and headerless AVIs are rejected cleanly
    intercept[IllegalArgumentException] {
      Multimodal.mediaMetadata("no such container".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.mediaMetadata(
        "RIFF    AVI LIST".getBytes("ISO-8859-1"))
    }
  }

  test("mm_metadata / mm_frame_sample / mm_resize replay from the text raster") {
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    val gotMeta = Multimodal.metadata(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val gotFrames = Multimodal.frameSample(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val gotResize = Multimodal.resize(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, text) =>
      val px = Multimodal.pngPixels(text)
      val h = px.length / 16
      val expectMeta = (id % 6) match {
        case 0 => ("png", 16L, h.toLong, 1L)
        case 1 => ("gif", 16L, h.toLong, 1L)
        case 2 => ("avi", 4L, 4L, (px.length / 16).toLong)
        case 3 => ("jpeg", 16L, h.toLong, 1L)
        case 4 => ("jpeg_prog", 16L, h.toLong, 1L)
        case _ => ("wav", px.length.toLong, 1L, 1L) // mono: width = samples
      }
      assert(gotMeta(id) == expectMeta, s"metadata doc $id")
      // frame sampling: 16-px frames, every 4th kept
      val nf = px.length / 16
      val kept = (0 until nf).filter(_ % 4 == 0)
      val ffp = kept.foldLeft(0L) { (acc, fr) =>
        (fr * 16 until (fr + 1) * 16).foldLeft(acc)((a, i) =>
          (a * 31 + (px(i) & 0xff)) % 1000000007L)
      }
      assert(gotFrames(id) == ((kept.size.toLong, ffp)), s"frames doc $id")
      // resize: nearest-neighbor 16×h → 8×8
      var rfp = 0L
      for (ty <- 0 until 8; tx <- 0 until 8)
        rfp = (rfp * 31 + (px((ty * h / 8) * 16 + tx * 2) & 0xff)) % 1000000007L
      assert(gotResize(id) == rfp, s"resize doc $id")
    }
  }

  test("wavEncode round-trips through wavPcmDecoder sample-exact") {
    val s = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue, 12345)
    val back = Multimodal.wavPcmDecoder(Multimodal.wavEncode(s))
    assert(back.length == s.length)
    s.indices.foreach(i =>
      assert(math.round(back(i) * 32768f) == s(i).toInt, s"sample $i"))
  }

  test("mm_audio_features extracts integer-exact features from real WAV decode") {
    val got = Multimodal.audioFeatures(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty && got.size == texts.length)
    texts.foreach { case (id, text) =>
      val s = Multimodal.pngPixels(text).map(b => ((b & 0xff) - 128) * 256)
      val peak = s.map(v => math.abs(v).toLong).max
      val energy = s.map(v => v.toLong * v).sum
      val zc = s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong
      assert(got(id) == ((s.length.toLong, peak, energy, zc)), s"doc $id")
    }
  }

  test("mm_video_features extracts integer-exact motion features from real AVI decode") {
    val got = Multimodal.videoFeatures(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty && got.size == texts.length)
    texts.foreach { case (id, text) =>
      val px = Multimodal.pngPixels(text).map(_ & 0xff)
      val frames = px.grouped(16).toVector
      val lumas = frames.map(_.map(_.toLong).sum)
      val diffs = frames.sliding(2).map { p =>
        (0 until 16).map(i => math.abs(p(1)(i) - p(0)(i)).toLong).sum
      }.toVector
      val expect = (frames.length.toLong, diffs.sum, lumas.max,
        diffs.count(_ > Multimodal.SceneCutDiff).toLong)
      assert(got(id) == expect, s"doc $id")
    }
  }
}
