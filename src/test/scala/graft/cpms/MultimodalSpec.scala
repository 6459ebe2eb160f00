package graft.cpms

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private lazy val assets =
    Multimodal.assetsFromDocuments(Tables.documents(spark, "/root/testdata/sf0.001"))

  test("asset table carries binary payloads + typed metadata") {
    val r = assets.head()
    assert(r.getAs[Array[Byte]]("content").nonEmpty)
    assert(Set("image", "audio", "video").contains(r.getAs[String]("kind")))
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes") > 0)
  }

  test("stub decode is deterministic, partition-parallel, schema-typed") {
    val d1 = Multimodal.decode(assets).orderBy("asset_id").collect()
    val d2 = Multimodal.decode(assets.repartition(7)).orderBy("asset_id").collect()
    assert(d1.length === 500)
    assert(d1.map(_.toString).sameElements(d2.map(_.toString)),
           "decode must not depend on partitioning")
    d1.foreach { r =>
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("height") >= 64)
      assert(r.getAs[collection.Seq[Float]]("feature").length === 8)
    }
  }

  test("resize clamps the long side and preserves aspect ordering") {
    val out = Multimodal.resize(Multimodal.decode(assets), maxSide = 256).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("out_width") <= 256 && r.getAs[Int]("out_height") <= 256)
      assert((r.getAs[Int]("out_width") <= r.getAs[Int]("out_height")) ===
             (r.getAs[Int]("width") <= r.getAs[Int]("height")))
    }
  }

  // --- real-codec fixtures -------------------------------------------
  // A 3x2 24-bit bottom-up BMP, built byte-by-byte: top row R,G,B;
  // bottom row white,black,gray(128). Row stride = 3*3 -> padded to 12.
  private def bmpFixture: Array[Byte] = {
    val rowBytes = 12
    val pixOff = 54
    val size = pixOff + rowBytes * 2
    val out = Array.ofDim[Byte](size)
    def le32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, size); le32(10, pixOff)
    le32(14, 40) // BITMAPINFOHEADER
    le32(18, 3); le32(22, 2) // width, height (bottom-up)
    out(26) = 1 // planes
    out(28) = 24 // bpp
    le32(30, 0) // BI_RGB
    // pixel rows are BGR; file stores BOTTOM row first
    val bottom = Seq((255, 255, 255), (0, 0, 0), (128, 128, 128))
    val top = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255)) // R, G, B
    for ((row, y) <- Seq(bottom, top).zipWithIndex; ((r, g, b), x) <- row.zipWithIndex) {
      val o = pixOff + y * rowBytes + x * 3
      out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
    }
    out
  }

  // A 2x2 binary PPM (P6) with a comment line: all four pixels (10,20,30).
  private def ppmFixture: Array[Byte] = {
    val header = "P6\n# fixture\n2 2\n255\n".getBytes("US-ASCII")
    header ++ Array.fill(4)(Array(10.toByte, 20.toByte, 30.toByte)).flatten
  }

  test("real BMP codec: header dims + pixel-scan features from a crafted fixture") {
    val row = Multimodal.decodeBmp(7L, bmpFixture)
      .getOrElse(fail("BMP fixture not recognized by the real codec"))
    assert(row.getInt(2) === 3 && row.getInt(3) === 2) // width, height
    val feat = row.getSeq[Float](5)
    // channel means over {R,G,B,white,black,gray}: each channel sums to
    // 255 (own primary) + 255 (white) + 128 (gray) = 638 -> 638/6/255
    val expected = 638.0 / 6 / 255
    assert(math.abs(feat(0) - expected) < 1e-6)
    assert(math.abs(feat(1) - expected) < 1e-6)
    assert(math.abs(feat(2) - expected) < 1e-6)
    assert(feat(4) > 0.0f, "luma std must be positive for a non-flat image")
    assert(math.abs(feat(5) - 2.0f / 3) < 1e-6) // squareness min/max
  }

  test("real PPM codec: P6 with comments decodes to exact flat-color features") {
    val row = Multimodal.decodePpm(8L, ppmFixture)
      .getOrElse(fail("PPM fixture not recognized by the real codec"))
    assert(row.getInt(2) === 2 && row.getInt(3) === 2)
    val feat = row.getSeq[Float](5)
    assert(math.abs(feat(0) - 10f / 255) < 1e-6)
    assert(math.abs(feat(1) - 20f / 255) < 1e-6)
    assert(math.abs(feat(2) - 30f / 255) < 1e-6)
    assert(feat(4) === 0.0f, "flat image has zero luma std")
  }

  test("decode dispatches per payload: real codec for BMP/PPM, stub for the rest") {
    import spark.implicits._
    val mixed = Seq(
      (1L, "image", bmpFixture),
      (2L, "image", ppmFixture),
      (3L, "image", "not an image at all".getBytes("UTF-8")))
      .toDF("asset_id", "kind", "content")
    val out = Multimodal.decode(mixed).orderBy("asset_id").collect()
    assert(out(0).getInt(2) === 3 && out(0).getInt(3) === 2) // real BMP dims
    assert(out(1).getInt(2) === 2 && out(1).getInt(3) === 2) // real PPM dims
    // the stub's synthetic dims start at 64 — proves row 3 fell through
    assert(out(2).getInt(2) >= 64 && out(2).getInt(3) >= 64)
    // and the whole frame keeps the decoded schema
    assert(out.forall(_.getSeq[Float](5).length === 8))
  }

  test("truncated/forged headers are rejected to the stub, not crashed on") {
    val truncated = bmpFixture.take(30) // cuts inside the DIB header
    val forged = "BM then just text that is not a bitmap".getBytes("UTF-8")
    assert(Multimodal.decodeBmp(1L, truncated).isEmpty)
    assert(Multimodal.decodeBmp(2L, forged).isEmpty)
    val badPpm = "P6\n9999 9999\n255\nxx".getBytes("US-ASCII") // data too short
    assert(Multimodal.decodePpm(3L, badPpm).isEmpty)
    // end-to-end they still decode (via the stub) instead of throwing
    assert(Multimodal.decodeOne(4L, "image", truncated) != null)
  }

  test("forged BMP dims that overflow Int arithmetic are rejected, not crashed on") {
    def le32(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = v.toByte; a(i + 1) = (v >> 8).toByte
      a(i + 2) = (v >> 16).toByte; a(i + 3) = (v >> 24).toByte
    }
    // width > ~715M: w*3+3 overflows Int, which would make the row stride
    // negative and slip the bounds check — must reject on a ~58-byte payload
    val hugeW = bmpFixture.clone()
    le32(hugeW, 18, 0x40000000); le32(hugeW, 22, 1)
    assert(Multimodal.decodeBmp(1L, hugeW).isEmpty)
    // height = Int.MinValue: abs() stays negative — must reject
    val minH = bmpFixture.clone()
    le32(minH, 22, Int.MinValue)
    assert(Multimodal.decodeBmp(2L, minH).isEmpty)
    // w AND h both near 2^31: rowBytesL (~8.6e9) * h overflows LONG to a
    // negative product, which would slip the bounds check if the reject
    // happened after the multiply — must reject cleanly (not via a
    // swallowed AIOOBE falling through to the stub)
    val hugeWH = bmpFixture.clone()
    le32(hugeWH, 18, Int.MaxValue); le32(hugeWH, 22, Int.MaxValue)
    assert(Multimodal.decodeBmp(5L, hugeWH).isEmpty)
    // and the full chain falls back to the stub instead of throwing
    assert(Multimodal.decodeOne(3L, "image", hugeW).getSeq[Float](5).length === 8)
    assert(Multimodal.decodeOne(4L, "image", minH).getSeq[Float](5).length === 8)
  }

  test("PPM header terminated by \\r\\n decodes with unshifted pixels") {
    val crlf = "P6\n2 2\r\n255\r\n".getBytes("US-ASCII") ++
      Array.fill(4)(Array(10.toByte, 20.toByte, 30.toByte)).flatten
    val row = Multimodal.decodePpm(9L, crlf)
      .getOrElse(fail("CRLF PPM header not recognized"))
    val feat = row.getSeq[Float](5)
    assert(math.abs(feat(0) - 10f / 255) < 1e-6, "pixel reads must not shift by one")
    assert(math.abs(feat(1) - 20f / 255) < 1e-6)
    assert(math.abs(feat(2) - 30f / 255) < 1e-6)
    // a non-whitespace byte right after maxval is not a P6 header
    val bad = "P6\n2 2\n255X".getBytes("US-ASCII") ++ Array.fill(12)(7.toByte)
    assert(Multimodal.decodePpm(10L, bad).isEmpty)
  }

  // --- PNG fixtures ----------------------------------------------------
  // Test-side PNG ENCODER: builds a spec-correct PNG byte-by-byte with a
  // chosen filter type per scanline, so every unfilter branch
  // (None/Sub/Up/Average/Paeth) is exercised against known pixels.
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length)
    bb.put(typ.getBytes("US-ASCII"))
    bb.put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  private def pngFixture(w: Int, h: Int, colorType: Int, filters: Seq[Int],
                         px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val bpp = if (colorType == 6) 4 else 3
    val stride = w * bpp
    val rows = Array.tabulate(h) { y =>
      val r = new Array[Int](stride)
      for (x <- 0 until w) {
        val (rr, gg, bb) = px(x, y)
        r(x * bpp) = rr; r(x * bpp + 1) = gg; r(x * bpp + 2) = bb
        if (bpp == 4) r(x * bpp + 3) = 255
      }
      r
    }
    val filtered = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val ft = filters(y % filters.length)
      filtered.write(ft)
      for (x <- 0 until stride) {
        val a = if (x >= bpp) rows(y)(x - bpp) else 0
        val b = if (y > 0) rows(y - 1)(x) else 0
        val c = if (x >= bpp && y > 0) rows(y - 1)(x - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case _ =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        filtered.write((rows(y)(x) - pred) & 0xff)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1024)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w); ihdr.putInt(h)
    ihdr.put(8.toByte); ihdr.put(colorType.toByte)
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      pngChunk("IHDR", ihdr.array()) ++
      pngChunk("IDAT", comp.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  private val pngPx: (Int, Int) => (Int, Int, Int) =
    (x, y) => ((x * 40 + y * 10) % 256, (x * 7 + y * 90) % 256, (x * 130 + y * 3) % 256)

  test("real PNG codec: every filter type (0-4) unfilters to exact pixel features") {
    val w = 3; val h = 5
    val row = Multimodal.decodePng(11L, pngFixture(w, h, 2, Seq(0, 1, 2, 3, 4), pngPx))
      .getOrElse(fail("PNG fixture not recognized by the real codec"))
    assert(row.getInt(2) === w && row.getInt(3) === h)
    val feat = row.getSeq[Float](5)
    val pix = for { y <- 0 until h; x <- 0 until w } yield pngPx(x, y)
    val n = (w * h).toDouble
    assert(math.abs(feat(0) - pix.map(_._1).sum / n / 255) < 1e-6)
    assert(math.abs(feat(1) - pix.map(_._2).sum / n / 255) < 1e-6)
    assert(math.abs(feat(2) - pix.map(_._3).sum / n / 255) < 1e-6)
    assert(feat(4) > 0.0f, "luma std must be positive for a non-flat image")
  }

  test("real PNG codec: RGBA decodes with alpha ignored — features equal the RGB twin") {
    val rgb = Multimodal.decodePng(12L, pngFixture(4, 4, 2, Seq(1, 4), pngPx))
      .getOrElse(fail("RGB PNG not recognized"))
    val rgba = Multimodal.decodePng(13L, pngFixture(4, 4, 6, Seq(1, 4), pngPx))
      .getOrElse(fail("RGBA PNG not recognized"))
    assert(rgb.getSeq[Float](5) === rgba.getSeq[Float](5))
  }

  test("real PNG codec: agrees with a reference encoder (ImageIO) on random content") {
    val rnd = new scala.util.Random(42)
    val w = 23; val h = 17
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var (sumR, sumG, sumB) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
      sumR += r; sumG += g; sumB += b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out), "ImageIO PNG writer unavailable")
    val row = Multimodal.decodePng(14L, out.toByteArray)
      .getOrElse(fail("ImageIO-encoded PNG not recognized by the real codec"))
    assert(row.getInt(2) === w && row.getInt(3) === h)
    val feat = row.getSeq[Float](5)
    val n = (w * h).toDouble
    assert(math.abs(feat(0) - sumR / n / 255) < 1e-6)
    assert(math.abs(feat(1) - sumG / n / 255) < 1e-6)
    assert(math.abs(feat(2) - sumB / n / 255) < 1e-6)
  }

  test("forged/unsupported PNGs are rejected to the stub, not crashed on") {
    val good = pngFixture(3, 3, 2, Seq(0), pngPx)
    // forged IHDR dims: decompressed size must be bounded BEFORE allocation
    val huge = good.clone()
    val bb = java.nio.ByteBuffer.wrap(huge)
    bb.putInt(16, 0x40000000); bb.putInt(20, 0x40000000)
    assert(Multimodal.decodePng(1L, huge).isEmpty)
    // truncated IDAT (short zlib stream) and truncated chunk framing
    assert(Multimodal.decodePng(2L, good.dropRight(20)).isEmpty)
    // interlaced and palette images are not this codec's business
    val interlaced = good.clone(); interlaced(28) = 1
    assert(Multimodal.decodePng(3L, interlaced).isEmpty)
    val palette = good.clone(); palette(25) = 3
    assert(Multimodal.decodePng(4L, palette).isEmpty)
    // the full chain falls back to the stub instead of throwing
    assert(Multimodal.decodeOne(5L, "image", huge).getSeq[Float](5).length === 8)
    // and a well-formed PNG dispatches to the REAL codec end to end
    assert(Multimodal.decodeOne(6L, "image", good).getInt(2) === 3)
  }

  /** 16-bit PCM RIFF/WAVE fixture from a per-frame sample function
    * (values in [-1, 1], channel-interleaved).
    */
  private def wavFixture(sampleRate: Int, channels: Int, nFrames: Int)
                        (sample: (Int, Int) => Double): Array[Byte] = {
    val dataLen = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (i <- 0 until nFrames; c <- 0 until channels)
      bb.putShort(math.round(sample(i, c) * 32767).toShort)
    bb.array()
  }

  test("real WAV codec: sine fixture yields exact geometry and textbook signal features") {
    val sr = 8000; val n = 4000 // 0.5 s
    val amp = 0.5
    val wav = wavFixture(sr, 1, n)((i, _) => amp * math.sin(2 * math.Pi * 440 * i / sr))
    val row = Multimodal.decodeWav(21L, wav)
      .getOrElse(fail("WAV fixture not recognized by the real codec"))
    assert(row.getString(1) === "audio")
    assert(row.getInt(2) === sr && row.getInt(3) === 1 && row.getInt(4) === n)
    val feat = row.getSeq[Float](5)
    assert(math.abs(feat(0) - amp / math.sqrt(2)) < 0.01, s"rms off: ${feat(0)}")
    assert(math.abs(feat(1) - amp) < 0.01, s"peak off: ${feat(1)}")
    // a 440 Hz tone at 8 kHz crosses zero ~2*440 times per second
    assert(math.abs(feat(2) - 2.0 * 440 / sr) < 0.01, s"zcr off: ${feat(2)}")
    assert(math.abs(feat(3)) < 0.01, s"sine must have ~zero DC offset: ${feat(3)}")
    assert(math.abs(feat(4) - 0.5 / 60.0) < 1e-4, s"duration share off: ${feat(4)}")
  }

  test("real WAV codec: stereo averages channels; DC fixture shows offset not rms surprise") {
    val wav = wavFixture(16000, 2, 100)((_, c) => if (c == 0) 0.4 else -0.4)
    val row = Multimodal.decodeWav(22L, wav).getOrElse(fail("stereo WAV rejected"))
    assert(row.getInt(3) === 2)
    val feat = row.getSeq[Float](5)
    assert(math.abs(feat(0)) < 1e-4, "opposite-phase channels must cancel")
    val dc = Multimodal.decodeWav(23L, wavFixture(16000, 1, 100)((_, _) => 0.25))
      .getOrElse(fail("DC WAV rejected"))
    assert(math.abs(dc.getSeq[Float](5).apply(3) - 0.25) < 0.01)
  }

  test("forged/unsupported WAVs are rejected to the stub, not crashed on") {
    val good = wavFixture(8000, 1, 64)((i, _) => math.sin(i * 0.1))
    // forged data-chunk length running past the payload
    val forged = good.clone()
    java.nio.ByteBuffer.wrap(forged).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue)
    assert(Multimodal.decodeWav(1L, forged).isEmpty)
    // truncated payload (data chunk shorter than declared)
    assert(Multimodal.decodeWav(2L, good.dropRight(16)).isEmpty)
    // non-PCM (format tag 3 = IEEE float) and 8-bit depth are not ours
    val float32 = good.clone()
    java.nio.ByteBuffer.wrap(float32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 3)
    assert(Multimodal.decodeWav(3L, float32).isEmpty)
    val bits8 = good.clone()
    java.nio.ByteBuffer.wrap(bits8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(34, 8)
    assert(Multimodal.decodeWav(4L, bits8).isEmpty)
    // the full chain falls back to the stub instead of throwing...
    assert(Multimodal.decodeOne(5L, "audio", forged).getSeq[Float](5).length === 8)
    // ...and a well-formed WAV dispatches to the REAL codec end to end
    assert(Multimodal.decodeOne(6L, "audio", good).getInt(2) === 8000)
  }

  test("WAV chunk walk tolerates fmt after data (RIFF does not order chunks)") {
    val good = wavFixture(8000, 1, 64)((i, _) => math.sin(i * 0.1))
    // rebuild with the data chunk BEFORE fmt: RIFF header, data, fmt
    val dataLen = 64 * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.put(good, 44, dataLen)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2)
      .putShort(16)
    val row = Multimodal.decodeWav(30L, bb.array())
      .getOrElse(fail("fmt-after-data WAV fell back to the stub"))
    assert(row.getInt(2) === 8000 && row.getInt(4) === 64)
    // features equal the fmt-first spelling bit for bit
    val ref = Multimodal.decodeWav(31L, good).get
    assert(row.getSeq[Float](5) === ref.getSeq[Float](5))
  }

  // --- perceptual dHash ----------------------------------------------

  /** Deterministic 24x16 RGB noise, components <= 240 (shift headroom). */
  private def noisePixels(seed: Long): Array[Byte] = {
    val rgb = new Array[Byte](3 * 24 * 16)
    for (p <- 0 until 24 * 16; c <- 0 until 3) {
      val raw = ((graft.functions.TextHashes.mix64(seed + p) >>> (8 * c)) & 0xff).toInt
      rgb(p * 3 + c) = (raw - (raw >> 4)).toByte
    }
    rgb
  }

  test("dHash is invariant to container re-encode and uniform brightness shift") {
    val base = noisePixels(42L)
    val shifted = base.map(b => ((b & 0xff) + 8).toByte)
    val ppm = Multimodal.decodeOne(1L, "image", Multimodal.encodePpm(24, 16, base))
    val bmp = Multimodal.decodeOne(2L, "image", Multimodal.encodeBmp(24, 16, base))
    val bright = Multimodal.decodeOne(3L, "image", Multimodal.encodeBmp(24, 16, shifted))
    val hPpm = ppm.getLong(6)
    assert(hPpm === bmp.getLong(6), "re-encode must not move the dHash")
    assert(hPpm === bright.getLong(6), "+8 brightness (no clamp) must not move the dHash")
    // an unrelated noise image sits near the 32-bit Hamming expectation
    val other = Multimodal.decodeOne(4L, "image",
      Multimodal.encodePpm(24, 16, noisePixels(4242L)))
    val dist = java.lang.Long.bitCount(hPpm ^ other.getLong(6))
    assert(dist > 10, s"unrelated images too close: Hamming $dist")
    // stub decodes carry a null dhash; audio carries the energy hash
    val wav = Multimodal.decodeOne(5L, "audio",
      wavFixture(8000, 1, 160)((i, _) => math.sin(i * 0.3)))
    assert(!wav.isNullAt(6), "real WAV decode must carry the energy dhash")
    assert(Multimodal.decodeOne(6L, "image", "not an image".getBytes).isNullAt(6))
  }

  test("audio dhash is gain-invariant; q123 finds planted half-volume re-encodes") {
    // same waveform at three gains -> identical energy-delta fingerprint
    def wav(gain: Double) = wavFixture(8000, 1, 2048)((i, _) =>
      gain * (0.4 * math.sin(2 * math.Pi * 300 * i / 8000.0) +
              0.3 * math.sin(2 * math.Pi * 7 * i / 8000.0)))
    val h1 = Multimodal.decodeWav(1L, wav(1.0)).get.getLong(6)
    val h2 = Multimodal.decodeWav(2L, wav(0.5)).get.getLong(6)
    val h3 = Multimodal.decodeWav(3L, wav(0.25)).get.getLong(6)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 3, "half volume moved the fingerprint")
    assert(java.lang.Long.bitCount(h1 ^ h3) <= 3, "quarter volume moved the fingerprint")
    // a different waveform lands far away
    val other = Multimodal.decodeWav(4L, wavFixture(8000, 1, 2048)((i, _) =>
      0.5 * math.sin(2 * math.Pi * 1100 * i / 8000.0) *
        math.sin(2 * math.Pi * 13 * i / 8000.0))).get.getLong(6)
    assert(java.lang.Long.bitCount(h1 ^ other) > 10,
           s"unrelated audio too close: ${java.lang.Long.bitCount(h1 ^ other)}")

    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val planted = docs.filter(col("doc_id") % 10 === 0).count()
    val pairs = graft.SparkEntry.queries("q123_audio_neardup")(
      spark, "/root/testdata/sf0.001").collect()
    val plantedPairs = pairs.filter(r =>
      r.getLong(1) === r.getLong(0) + Multimodal.NearDupOffset)
    assert(plantedPairs.length === planted,
           s"expected $planted planted audio pairs, got ${plantedPairs.length}")
    assert(pairs.length === plantedPairs.length,
           s"unrelated audio paired: ${pairs.filterNot(r =>
             r.getLong(1) === r.getLong(0) + Multimodal.NearDupOffset).mkString(", ")}")
  }

  test("q121: planted re-encoded near-dup pairs found, unrelated images not paired") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val planted = docs.filter(col("doc_id") % 10 === 0).count()
    val pairs = graft.SparkEntry.queries("q121_image_neardup")(
      spark, "/root/testdata/sf0.001").collect()
    // every planted (doc, doc + offset) pair surfaces, at Hamming 0
    val plantedPairs = pairs.filter(r =>
      r.getLong(1) === r.getLong(0) + Multimodal.NearDupOffset)
    assert(plantedPairs.length === planted,
           s"expected $planted planted pairs, got ${plantedPairs.length}")
    assert(plantedPairs.forall(_.getInt(2) === 0),
           "planted brightness-shift re-encodes must land at Hamming 0")
    // no unrelated pair sneaks under the radius (noise images are far)
    assert(pairs.length === plantedPairs.length,
           s"unrelated images paired: ${pairs.filterNot(r =>
             r.getLong(1) === r.getLong(0) + Multimodal.NearDupOffset).mkString(", ")}")
    // determinism across partitionings
    val again = graft.SparkEntry.queries("q121_image_neardup")(
      spark, "/root/testdata/sf0.001").collect()
    assert(pairs.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("imageNearDupStream: re-encoded arrival flagged via the persisted dhash index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-dhashidx").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // corpus index: the base images only (no planted dups)
    Multimodal.buildDhashIndex(
      spark, Multimodal.syntheticImageAssets(docs, dupEvery = 0), idx)
    // arrivals: a brightness-shifted BMP re-encode of corpus image 5's
    // pixels (same seed the corpus builder used), and unrelated noise
    val seed5 = docs.filter(col("doc_id") === 5L).head().getAs[String]("text")
    val base = {
      val rgb = new Array[Byte](3 * 24 * 16)
      var hsh = 1125899906842597L
      seed5.getBytes("UTF-8").foreach(b => hsh = 31 * hsh + (b & 0xff))
      for (p <- 0 until 24 * 16; c <- 0 until 3) {
        val raw = ((graft.functions.TextHashes.mix64(hsh + p) >>> (8 * c)) & 0xff).toInt
        rgb(p * 3 + c) = ((raw - (raw >> 4)) + 8).toByte
      }
      rgb
    }
    val mem = MemoryStream[(Long, String, Array[Byte])]
    mem.addData(
      (800001L, "image", Multimodal.encodeBmp(24, 16, base)),
      (800002L, "image", Multimodal.encodePpm(24, 16, noisePixels(999L))))
    val out = Multimodal.imageNearDupStream(
      mem.toDF().toDF("asset_id", "kind", "content"), spark, idx)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("img_dups").start()
    try q.processAllAvailable() finally q.stop()
    val flagged = spark.table("img_dups").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(flagged.exists(f => f._1 === 800001L && f._2 === 5L && f._3 === 0),
           s"re-encoded arrival not flagged against corpus image 5: ${flagged.toSeq}")
    assert(!flagged.exists(_._1 === 800002L),
           s"unrelated noise image falsely flagged: ${flagged.toSeq}")
    // a forged geometry sidecar must be rejected, never silently probed
    val p = new org.apache.hadoop.fs.Path(idx, "_dhash_geometry")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sout = fs.create(p, true)
    try sout.write("8 8".getBytes("UTF-8")) finally sout.close()
    val e = intercept[IllegalArgumentException] {
      Multimodal.imageNearDupStream(
        mem.toDF().toDF("asset_id", "kind", "content"), spark, idx)
    }
    assert(e.getMessage.contains("geometry"))
  }

  // ---- JPEG (javax.imageio) ------------------------------------------

  /** Blocky fixture aligned to the 8x9 dHash grid: each cell is a
    * uniform gray block on one of 12 luma levels 16 apart, with
    * horizontally-adjacent cells FORCED onto distinct levels — every
    * gradient bit is decided by a >=16-luma margin, far above the ~2-4
    * luma a quality-0.9 JPEG block transform perturbs cell means by.
    * (Equal-luma neighbors would make those bits coin flips under any
    * lossy codec.)
    */
  private def blockyPixels(w: Int, h: Int, seed: Long): Array[Byte] = {
    val level = new Array[Int](8 * 9)
    for (r <- 0 until 8; c <- 0 until 9) {
      var l = math.floorMod(graft.functions.TextHashes.mix64(seed + r * 9 + c), 12).toInt
      if (c > 0 && l == level(r * 9 + c - 1)) l = (l + 1) % 12
      level(r * 9 + c) = l
    }
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (40 + 16 * level((y * 8 / h) * 9 + (x * 9 / w))).toByte
      val p = (y * w + x) * 3
      rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
    }
    rgb
  }

  private def jpegBytes(w: Int, h: Int, rgb: Array[Byte],
                        quality: Float = 0.9f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(p) & 0xff) << 16) | ((rgb(p + 1) & 0xff) << 8) |
                       (rgb(p + 2) & 0xff))
    }
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    baos.toByteArray
  }

  test("JPEG decodes real dims/features; BMP->JPEG re-encode lands within dHash tolerance") {
    val (w, h) = (72, 40)
    val rgb = blockyPixels(w, h, 7L)
    val bmp = Multimodal.decodeOne(1L, "image", Multimodal.encodeBmp(w, h, rgb))
    val jpg = Multimodal.decodeOne(2L, "image", jpegBytes(w, h, rgb))
    assert(jpg.getString(1) === "image")
    assert(jpg.getInt(2) === w && jpg.getInt(3) === h,
           "JPEG dims must come from the real header")
    assert(!jpg.isNullAt(6), "real JPEG decode must carry a dHash")
    // features match the lossless decode closely (JPEG is lossy; the
    // channel/luma means drift by less than ~2/255)
    val fb = bmp.getSeq[Float](5); val fj = jpg.getSeq[Float](5)
    for (i <- 0 until 8)
      assert(math.abs(fb(i) - fj(i)) < 0.02f,
             s"feature $i drifted: ${fb(i)} vs ${fj(i)}")
    // lossy re-encode: within q121's <=3-bit band tolerance, not exact-0
    val dist = java.lang.Long.bitCount(bmp.getLong(6) ^ jpg.getLong(6))
    assert(dist <= 3, s"BMP->JPEG dHash drifted too far: Hamming $dist")
    // an unrelated blocky image stays far away
    val other = Multimodal.decodeOne(3L, "image",
      jpegBytes(w, h, blockyPixels(w, h, 4242L)))
    assert(java.lang.Long.bitCount(jpg.getLong(6) ^ other.getLong(6)) > 10)
  }

  test("forged/truncated JPEGs are rejected to the stub, not crashed on") {
    // SOI magic followed by garbage
    val forged = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte) ++
      "not actually a jpeg entropy stream".getBytes("UTF-8")
    assert(Multimodal.decodeJpeg(1L, forged).isEmpty)
    assert(Multimodal.decodeOne(1L, "image", forged).isNullAt(6),
           "forged JPEG must fall to the stub (null dhash)")
    // truncated: cut a real payload mid entropy stream
    val good = jpegBytes(72, 40, blockyPixels(72, 40, 7L))
    val truncated = good.take(good.length / 2)
    val row = Multimodal.decodeOne(2L, "image", truncated)
    // either rejected to the stub or decoded as a real partial frame —
    // never a crashed task; the JDK reader throws, so expect the stub
    assert(Multimodal.decodeJpeg(2L, truncated).isEmpty || !row.isNullAt(6))
    // forged SOF dims claiming a multi-gigapixel frame: rejected from
    // the HEADER, before any pixel allocation
    val patched = good.clone()
    var i = 2
    var sof = -1
    while (sof < 0 && i < patched.length - 9) {
      val m = patched(i + 1) & 0xFF
      if ((patched(i) & 0xFF) == 0xFF && (m == 0xC0 || m == 0xC2)) sof = i
      i += 1
    }
    assert(sof > 0, "fixture jpeg has no SOF marker?")
    // SOF payload: len(2) precision(1) height(2) width(2)
    patched(sof + 5) = 0xEA.toByte; patched(sof + 6) = 0x60.toByte // h=60000
    patched(sof + 7) = 0xEA.toByte; patched(sof + 8) = 0x60.toByte // w=60000
    assert(Multimodal.decodeJpeg(3L, patched).isEmpty,
           "3.6-gigapixel SOF must be rejected at the header")
  }

  test("frame sampling emits capped every-k indices for videos only") {
    val out = Multimodal.sampleFrames(Multimodal.decode(assets), everyK = 10, cap = 8)
    val vids = out.filter(col("kind") === "video").collect()
    assert(vids.nonEmpty)
    vids.foreach { r =>
      val idx = r.getAs[collection.Seq[Int]]("frame_idx")
      assert(idx.length <= 8 && idx.headOption.contains(0))
      assert(idx.forall(_ % 10 === 0))
    }
    out.filter(col("kind") =!= "video").collect().foreach { r =>
      assert(r.getAs[collection.Seq[Int]]("frame_idx") === collection.Seq(0))
    }
  }
}
