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
