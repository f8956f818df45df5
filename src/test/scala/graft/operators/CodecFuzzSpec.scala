package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz over every pure-JVM codec entry point: a decoder
  * fed garbage must either decode or throw a CLEAN exception. What it
  * must never do — the failure classes the hostile-header guards exist
  * for — is wrap an Int into a NegativeArraySizeException, NPE, blow
  * the stack, or attempt an absurd allocation. Three corpora per codec:
  * pure random bytes (wrong or accidental magic), single-byte
  * mutations of a valid payload (bit rot / truncated proxies hitting
  * every parser state), and prefix truncations of a valid payload.
  *
  * Seeded `scala.util.Random` throughout — failures reproduce exactly.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private val decoders: Seq[(String, Array[Byte] => Array[Float])] = Seq(
    "wav" -> Multimodal.wavPcmDecoder _,
    "bmp" -> Multimodal.bmpDecoder _,
    "png" -> Multimodal.pngDecoder _,
    "gif" -> Multimodal.gifDecoder _,
    "jpeg" -> Multimodal.jpegDecoder _,
    "jpeg_color" -> Multimodal.jpegColorDecoder _,
    "jpeg_prog" -> Multimodal.jpegDecoder _,
    "jpeg_prog_color" -> Multimodal.jpegColorDecoder _,
    "avi" -> Multimodal.aviFrameSampler(2) _)

  /** Run one payload; fail the suite only on the banned failure classes. */
  private def mustFailCleanly(codec: String, tag: String,
      decode: Array[Byte] => Array[Float], payload: Array[Byte]): Unit =
    try { decode(payload); () }
    catch {
      case e @ (_: NegativeArraySizeException | _: NullPointerException |
                _: StackOverflowError | _: OutOfMemoryError) =>
        fail(s"$codec/$tag: banned failure ${e.getClass.getSimpleName}: " +
          s"${e.getMessage} (len=${payload.length})")
      case _: Exception => () // clean rejection — the expected outcome
    }

  /** Minimal valid WAV (mono 16-bit PCM) — same shape MultimodalSpec
    * round-trips. */
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

  /** Minimal valid bottom-up 24bpp BMP of a grayscale ramp. */
  private def bmpBytes(width: Int, height: Int): Array[Byte] = {
    val rowBytes = ((24 * width + 31) / 32) * 4
    val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * height)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * height)
      .putInt(0).putInt(54)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(rowBytes * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (height - 1) to 0 by -1) {
      var written = 0
      for (x <- 0 until width) {
        val v = ((y * width + x) * 5 % 256).toByte
        bb.put(v).put(v).put(v)
        written += 3
      }
      while (written < rowBytes) { bb.put(0.toByte); written += 1 }
    }
    bb.array()
  }

  private def validPayloads: Map[String, Array[Byte]] = {
    val px = Array.tabulate[Byte](24 * 16)(i => (i * 7).toByte)
    Map(
      "bmp" -> bmpBytes(24, 16),
      "png" -> Multimodal.pngEncode(px, 24),
      "gif" -> Multimodal.gifEncode(px, 24),
      "jpeg" -> Jpeg.encodeGray(px, 24, Jpeg.StdQuant),
      "jpeg_color" -> Jpeg.encodeYcbcr420(px,
        Array.tabulate[Byte](12 * 8)(i => (i * 11).toByte),
        Array.tabulate[Byte](12 * 8)(i => (255 - i * 13).toByte), 24, 16),
      "jpeg_prog" -> Jpeg.encodeGrayProgressive(px, 24, Jpeg.StdQuant),
      "jpeg_prog_color" -> Jpeg.encodeYcbcr420Progressive(px,
        Array.tabulate[Byte](12 * 8)(i => (i * 11).toByte),
        Array.tabulate[Byte](12 * 8)(i => (255 - i * 13).toByte), 24, 16),
      "avi" -> Multimodal.aviEncode(Seq(px, px, px), 24, 16),
      "wav" -> wavBytes(Array.tabulate[Short](256)(i => (i * 121).toShort)))
  }

  test("random payloads never hit a banned failure class") {
    val rng = new scala.util.Random(0xC0DEC5L)
    for ((codec, decode) <- decoders; _ <- 0 until 250) {
      val payload = new Array[Byte](rng.nextInt(1024))
      rng.nextBytes(payload)
      mustFailCleanly(codec, "random", decode, payload)
    }
  }

  test("mediaMetadata survives the full fuzz corpus cleanly") {
    // the header-only probe walks every container family's length
    // fields — it gets the same three corpora as the decoders (random,
    // single-byte mutations, truncations), over ALL valid payloads
    // including raw baseline/progressive JPEG
    val rng = new scala.util.Random(0x5EEDAE7AL)
    val sniff: Array[Byte] => Array[Float] =
      p => { Multimodal.mediaMetadata(p); Array(1f) }
    for (_ <- 0 until 500) {
      val payload = new Array[Byte](rng.nextInt(1024))
      rng.nextBytes(payload)
      mustFailCleanly("meta", "random", sniff, payload)
    }
    for ((codec, good) <- validPayloads) {
      assert(sniff(good).nonEmpty, s"meta: valid $codec payload must sniff")
      for (_ <- 0 until 200) {
        val mutated = good.clone()
        mutated(rng.nextInt(mutated.length)) = rng.nextInt(256).toByte
        mustFailCleanly("meta", s"mutate-$codec", sniff, mutated)
      }
      for (_ <- 0 until 40)
        mustFailCleanly("meta", s"trunc-$codec", sniff,
          good.take(rng.nextInt(good.length)))
    }
  }

  test("single-byte mutations of valid payloads fail cleanly or decode") {
    val rng = new scala.util.Random(0xBADF00DL)
    val valid = validPayloads
    for ((codec, decode) <- decoders) {
      val good = valid(codec)
      // sanity: the unmutated payload decodes
      assert(decode(good).nonEmpty, s"$codec: valid payload must decode")
      for (_ <- 0 until 400) {
        val mutated = good.clone()
        mutated(rng.nextInt(mutated.length)) = rng.nextInt(256).toByte
        mustFailCleanly(codec, "mutate", decode, mutated)
      }
    }
  }

  test("prefix truncations of valid payloads fail cleanly") {
    val rng = new scala.util.Random(0x7501CA7EL)
    val valid = validPayloads
    for ((codec, decode) <- decoders; _ <- 0 until 60) {
      val good = valid(codec)
      val cut = rng.nextInt(good.length)
      mustFailCleanly(codec, s"truncate@$cut", decode, good.take(cut))
    }
  }

  test("PNG with a zlib FDICT header is rejected, not an infinite loop") {
    // FDICT makes Inflater return 0 with needsInput=false and
    // needsDictionary=true forever — a crafted payload must hit the
    // dictionary require, not hang the task. Patch the IDAT body's
    // first two bytes to CMF=0x78 FLG=0x20 (FDICT set, check valid:
    // 0x7820 % 31 == 0) and re-stamp the chunk CRC so the CRC gate
    // passes and the inflate loop is actually reached.
    val good = validPayloads("png")
    val idat = good.indexOfSlice("IDAT".getBytes("US-ASCII"))
    assert(idat > 0, "IDAT chunk present")
    val len = ((good(idat - 4) & 0xff) << 24) | ((good(idat - 3) & 0xff) << 16) |
      ((good(idat - 2) & 0xff) << 8) | (good(idat - 1) & 0xff)
    val hostile = good.clone()
    hostile(idat + 4) = 0x78.toByte
    hostile(idat + 5) = 0x20.toByte
    val crc = new java.util.zip.CRC32()
    crc.update(hostile, idat, 4 + len) // type + data
    val c = crc.getValue
    hostile(idat + 4 + len) = ((c >>> 24) & 0xff).toByte
    hostile(idat + 5 + len) = ((c >>> 16) & 0xff).toByte
    hostile(idat + 6 + len) = ((c >>> 8) & 0xff).toByte
    hostile(idat + 7 + len) = (c & 0xff).toByte
    val e = intercept[IllegalArgumentException] {
      Multimodal.pngDecoder(hostile)
    }
    assert(e.getMessage.contains("dictionary"))
  }

  test("WAV with a near-2^32 chunk length terminates instead of spinning") {
    // len=0xFFFFFFF8 truncates to Int -8, making the old Int advance
    // 8 + (-8) + 0 = 0 — the chunk walk would spin forever on an
    // unrecognized chunk id. The Long advance must terminate cleanly.
    val good = wavBytes(Array.tabulate[Short](16)(_.toShort))
    val bb = java.nio.ByteBuffer.allocate(good.length + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(good, 0, 12) // RIFF....WAVE
    bb.put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
    bb.put(good, 12, good.length - 12)
    val hostile = bb.array()
    val t = new Thread(() => mustFailCleanly("wav", "hugechunk",
      Multimodal.wavPcmDecoder _, hostile))
    t.setDaemon(true)
    t.start()
    t.join(10000)
    assert(!t.isAlive, "wav decoder hung on a crafted 0xFFFFFFF8 chunk length")
    // same shape with an ODD wrapped length (advance would go negative)
    val bb2 = java.nio.ByteBuffer.allocate(good.length + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.put(good, 0, 12)
    bb2.put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF7)
    bb2.put(good, 12, good.length - 12)
    mustFailCleanly("wav", "oddhugechunk", Multimodal.wavPcmDecoder _, bb2.array())
  }

  test("JPEG DHT/DQT segments shorter than their tables are rejected") {
    val good = validPayloads("jpeg")
    // shrink the DHT segment length so the declared tables overrun it:
    // parsing must fail with the clean truncation message, not silently
    // consume bytes of the following segment
    val dht = good.indexOfSlice(Seq(0xff.toByte, 0xc4.toByte))
    assert(dht > 0)
    val hostileDht = good.clone()
    hostileDht(dht + 2) = 0
    hostileDht(dht + 3) = 10 // len 10 < 2 + 17 needed for one table header
    val e = intercept[IllegalArgumentException] { Jpeg.decodeGray(hostileDht) }
    assert(e.getMessage.contains("truncated DHT") ||
      e.getMessage.contains("truncated segment"))
    val dqt = good.indexOfSlice(Seq(0xff.toByte, 0xdb.toByte))
    assert(dqt > 0)
    val hostileDqt = good.clone()
    hostileDqt(dqt + 2) = 0
    hostileDqt(dqt + 3) = 30 // len 30 < 2 + 65 needed for one 8-bit table
    val e2 = intercept[IllegalArgumentException] { Jpeg.decodeGray(hostileDqt) }
    assert(e2.getMessage.contains("truncated DQT") ||
      e2.getMessage.contains("truncated segment"))
  }

  test("AVI with a truncated strf chunk is rejected cleanly") {
    val good = validPayloads("avi")
    val strf = good.indexOfSlice("strf".getBytes("US-ASCII"))
    assert(strf > 0)
    val hostile = good.clone()
    hostile(strf + 4) = 20 // declared len 20 < the 28 data bytes read
    hostile(strf + 5) = 0; hostile(strf + 6) = 0; hostile(strf + 7) = 0
    val e = intercept[IllegalArgumentException] {
      Multimodal.aviFrameSampler(2)(hostile)
    }
    assert(e.getMessage.contains("strf") || e.getMessage.contains("truncated"))
  }

  test("progressive JPEG with an unbounded scan count is rejected, not a DoS") {
    // each scan pays a full block-grid walk; a crafted payload
    // repeating one tiny DC-refinement scan thousands of times would
    // turn a few KB into minutes of decode. The scan cap must fire
    // with a clean message.
    val good = validPayloads("jpeg_prog")
    val eoiAt = good.length - 2
    assert((good(eoiAt) & 0xff) == 0xff && (good(eoiAt + 1) & 0xff) == 0xd9)
    // a DC-refinement scan (no Huffman): SOS header + 6/8 of the blocks'
    // worth of raw bits — repeated 200 times before the EOI
    val refineScan = Array[Byte](0xff.toByte, 0xda.toByte, 0, 8,
      1, 1, 0, 0, 0, 0x10) ++ Array.fill[Byte](2)(0x55)
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(good, 0, eoiAt)
    (0 until 200).foreach(_ => bb.write(refineScan))
    bb.write(good, eoiAt, 2)
    val e = intercept[IllegalArgumentException] {
      Jpeg.decode(bb.toByteArray)
    }
    assert(e.getMessage.contains("too many progressive scans"))
  }

  test("SOF dimension cap scales with component count, not just pixels") {
    // a 3-component 4:2:0 payload claiming 16384x16384: the Y plane
    // ALONE is exactly the grayscale cap (2^28 samples), so a naive
    // width*height bound would admit it and the decoder would attempt
    // multi-GB coefficient allocations — the summed-plane cap must
    // reject the ~1.5x total BEFORE any allocation
    val color = validPayloads("jpeg_color").clone()
    val sof = color.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    assert(sof > 0)
    color(sof + 5) = 0x40; color(sof + 6) = 0 // height 16384
    color(sof + 7) = 0x40; color(sof + 8) = 0 // width 16384
    val e = intercept[IllegalArgumentException] { Jpeg.decode(color) }
    assert(e.getMessage.contains("plane samples"))
    // progressive carries the tighter 2^26 bound (per-component
    // coefficient planes live for the whole scan script): 8192x8192
    // color — Y alone exactly at the grayscale bound — must reject
    val prog = validPayloads("jpeg_prog_color").clone()
    val sof2 = prog.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte))
    assert(sof2 > 0)
    prog(sof2 + 5) = 0x20; prog(sof2 + 6) = 0 // height 8192
    prog(sof2 + 7) = 0x20; prog(sof2 + 8) = 0 // width 8192
    val e2 = intercept[IllegalArgumentException] { Jpeg.decode(prog) }
    assert(e2.getMessage.contains("plane samples"))
  }

  test("JPEG table ids above 3 fail with the clean range message") {
    val good = validPayloads("jpeg")
    // DQT: FF DB len(2) then the id nibble in the first table byte
    val dqt = good.indexOfSlice(Seq(0xff.toByte, 0xdb.toByte))
    assert(dqt > 0)
    val hostile = good.clone()
    hostile(dqt + 4) = 0x05.toByte // 8-bit precision nibble 0, id 5
    val e = intercept[IllegalArgumentException] { Jpeg.decodeGray(hostile) }
    assert(e.getMessage.contains("out of range"))
    // DHT class nibble 2-15 would silently overwrite the AC table slot
    // via `else acTabs(...)` — it must be rejected, not misfiled
    val dht = good.indexOfSlice(Seq(0xff.toByte, 0xc4.toByte))
    assert(dht > 0)
    val hostile2 = good.clone()
    hostile2(dht + 4) = 0x20.toByte // class 2, id 0
    val e2 = intercept[IllegalArgumentException] { Jpeg.decodeGray(hostile2) }
    assert(e2.getMessage.contains("class"))
  }
}
