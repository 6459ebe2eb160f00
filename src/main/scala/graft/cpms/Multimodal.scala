package graft.cpms

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extraction / resize /
  * frame-sampling as partition-parallel transforms.
  *
  * The decode step dispatches on payload magic bytes: uncompressed 24-bit
  * BMP and binary PPM (P6) payloads go through a REAL pure-JVM codec
  * ([[decodeBmp]]/[[decodePpm]] — header parse + full pixel scan into
  * mean-color/luma features); any other format falls back to the
  * documented STUB ([[fakeDecode]], deterministic fake features from the
  * payload bytes) because this environment ships no image/audio
  * libraries. Everything around the codec — the asset schema, the batched
  * mapPartitions plumbing, partitioning, and output shapes — is the real
  * production path; adding a JNI/ffmpeg/etc. branch next to the BMP/PPM
  * ones changes no plan shape.
  */
object Multimodal {

  /** Asset table schema: one row per media object. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("n_bytes", LongType))))))

  /** Build an asset table from `documents` (text bytes standing in for
    * media payloads — deterministic, schema-faithful).
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
                 (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      to_binary(col("text"), lit("utf-8")).as("content"),
      struct(col("source"),
             octet_length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Decoded-image schema produced by the (stub) decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** STUB decode: deterministic pseudo-decode of a payload. A real
    * implementation calls the codec here — per partition, batched — and
    * nothing else in the pipeline changes.
    */
  private[cpms] def fakeDecode(assetId: Long, kind: String, content: Array[Byte]): Row = {
    var h = 1125899906842597L
    var i = 0
    while (i < content.length) { h = 31 * h + (content(i) & 0xff); i += 1 }
    val width  = 64 + math.floorMod(h, 1024).toInt
    val height = 64 + math.floorMod(h >>> 17, 1024).toInt
    val frames = if (kind == "video") 1 + math.floorMod(h >>> 29, 240).toInt else 1
    val feat = Array.tabulate(8) { j =>
      (math.floorMod(graft.functions.TextHashes.mix64(h + j), 2000) / 1000.0f) - 1.0f
    }
    Row(assetId, kind, width, height, frames, feat.toSeq)
  }

  /** 8-float feature vector from decoded RGB pixels: channel means, luma
    * mean/std (all /255), squareness, and the dimension shares — real
    * content-derived features with a fixed, schema-stable width.
    */
  private def pixelFeatures(w: Int, h: Int,
                            sumR: Long, sumG: Long, sumB: Long,
                            sumLuma: Double, sumLuma2: Double): Array[Float] = {
    val n = w.toLong * h
    val mR = sumR.toDouble / n
    val mG = sumG.toDouble / n
    val mB = sumB.toDouble / n
    val mL = sumLuma / n
    val varL = math.max(0.0, sumLuma2 / n - mL * mL)
    Array((mR / 255.0).toFloat, (mG / 255.0).toFloat, (mB / 255.0).toFloat,
          (mL / 255.0).toFloat, (math.sqrt(varL) / 255.0).toFloat,
          (math.min(w, h).toDouble / math.max(w, h)).toFloat,
          (w.toDouble / (w + h)).toFloat, (h.toDouble / (w + h)).toFloat)
  }

  private def luma(r: Int, g: Int, b: Int): Double =
    0.299 * r + 0.587 * g + 0.114 * b

  /** REAL codec: uncompressed 24-bit bottom-up-or-top-down BMP
    * (BITMAPINFOHEADER). Parses the header for dimensions and scans every
    * pixel (BGR byte order, rows padded to 4 bytes) for the feature
    * vector. Returns None when the payload is not a BMP this codec
    * handles (wrong magic/bpp/compression or truncated pixel data).
    */
  private[cpms] def decodeBmp(assetId: Long, content: Array[Byte]): Option[Row] = {
    def u16(i: Int) = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8)
    def i32(i: Int) = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8) |
      ((content(i + 2) & 0xff) << 16) | ((content(i + 3) & 0xff) << 24)
    if (content.length < 54 || content(0) != 'B' || content(1) != 'M') return None
    val pixOff = i32(10)
    val w = i32(18)
    val hRaw = i32(22)
    if (hRaw == Int.MinValue) return None // abs() would stay negative
    val h = math.abs(hRaw)
    val bpp = u16(28)
    val compression = i32(30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0) return None
    // stride in Long: w near 2^31/3 overflows the Int product, which would
    // make rowBytes negative and slip past the bounds check below
    val rowBytesL = ((w.toLong * 3 + 3) / 4) * 4
    if (pixOff < 54) return None
    // reject BEFORE multiplying: rowBytesL * h overflows Long for forged
    // w,h both near 2^31, and a negative product would slip past the
    // bounds check below (h >= 1 and rowBytesL >= 4 here, so the
    // division is safe)
    if (h > (Long.MaxValue - pixOff) / rowBytesL) return None
    if (pixOff.toLong + rowBytesL * h > content.length) return None
    val rowBytes = rowBytesL.toInt // <= content.length after the check above
    var (sumR, sumG, sumB) = (0L, 0L, 0L)
    var (sumL, sumL2) = (0.0, 0.0)
    var y = 0
    while (y < h) {
      // negative height = top-down row order; positive = bottom-up
      val row = pixOff + (if (hRaw < 0) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val b = content(row + x * 3) & 0xff
        val g = content(row + x * 3 + 1) & 0xff
        val r = content(row + x * 3 + 2) & 0xff
        sumR += r; sumG += g; sumB += b
        val l = luma(r, g, b)
        sumL += l; sumL2 += l * l
        x += 1
      }
      y += 1
    }
    Some(Row(assetId, "image", w, h, 1,
             pixelFeatures(w, h, sumR, sumG, sumB, sumL, sumL2).toSeq))
  }

  /** REAL codec: binary PPM (P6, maxval <= 255). Parses the ASCII header
    * (with # comments) and scans the RGB triples. None when not a P6 this
    * codec handles.
    */
  private[cpms] def decodePpm(assetId: Long, content: Array[Byte]): Option[Row] = {
    if (content.length < 2 || content(0) != 'P' || content(1) != '6') return None
    var i = 2
    def skipSpace(): Unit = {
      var more = true
      while (more && i < content.length) {
        val c = content(i).toChar
        if (c.isWhitespace) i += 1
        else if (c == '#') { while (i < content.length && content(i) != '\n') i += 1 }
        else more = false
      }
    }
    def int(): Int = {
      skipSpace()
      var v = 0L
      var any = false
      while (i < content.length && content(i).toChar.isDigit) {
        v = math.min(v * 10 + (content(i) - '0'), 1L << 30); i += 1; any = true
      }
      if (any) v.toInt else -1
    }
    val w = int(); val h = int(); val maxval = int()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    // exactly one whitespace after maxval, then binary data — but tolerate
    // the \r\n some Windows writers emit; anything else is not a P6 header
    if (i >= content.length || !content(i).toChar.isWhitespace) return None
    if (content(i) == '\r' && i + 1 < content.length && content(i + 1) == '\n') i += 2
    else i += 1
    if (i + 3L * w * h > content.length) return None
    var (sumR, sumG, sumB) = (0L, 0L, 0L)
    var (sumL, sumL2) = (0.0, 0.0)
    var p = 0
    val n = w * h
    while (p < n) {
      val r = content(i + p * 3) & 0xff
      val g = content(i + p * 3 + 1) & 0xff
      val b = content(i + p * 3 + 2) & 0xff
      sumR += r; sumG += g; sumB += b
      val l = luma(r, g, b)
      sumL += l; sumL2 += l * l
      p += 1
    }
    Some(Row(assetId, "image", w, h, 1,
             pixelFeatures(w, h, sumR, sumG, sumB, sumL, sumL2).toSeq))
  }

  /** One payload through the codec chain: real BMP/PPM decode when the
    * magic bytes match, else the stub. Codec exceptions on forged payloads
    * fall through to the stub rather than failing the Spark task —
    * untrusted binary is exactly what this path ingests.
    */
  private[cpms] def decodeOne(assetId: Long, kind: String, content: Array[Byte]): Row = {
    import scala.util.Try
    Try(decodeBmp(assetId, content)).toOption.flatten
      .orElse(Try(decodePpm(assetId, content)).toOption.flatten)
      .getOrElse(fakeDecode(assetId, kind, content))
  }

  /** Partition-parallel batch decode: the Scala analogue of a batched
    * `mapInPandas` — one iterator pass per partition, constant memory,
    * no driver involvement. Repartition upstream by size/kind when codec
    * cost is skewed.
    */
  def decode(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    assets.select("asset_id", "kind", "content")
      .mapPartitions { rows =>
        rows.map { r => decodeOne(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)) }
      }(enc)
  }

  /** "Resize": deterministic derived dimensions (stub for a real resampler,
    * expressed as codegen-friendly column math — no UDF).
    */
  def resize(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame sampling for videos: every k-th frame index, capped — pure
    * column math (`sequence`), exploded downstream by the consumer.
    */
  def sampleFrames(decoded: DataFrame, everyK: Int, cap: Int): DataFrame =
    decoded.withColumn("frame_idx",
      when(col("kind") === "video",
           slice(sequence(lit(0), col("n_frames") - 1, lit(everyK)), 1, cap))
        .otherwise(array(lit(0))))
}
