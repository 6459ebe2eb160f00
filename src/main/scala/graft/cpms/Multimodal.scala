package graft.cpms

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extraction / resize /
  * frame-sampling as partition-parallel transforms.
  *
  * The actual codec step is STUBBED (this environment ships no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the
  * payload bytes. Everything around the stub — the asset schema, the
  * batched mapPartitions plumbing, partitioning, and output shapes — is
  * the real production path; swapping `fakeDecode` for a JNI/ffmpeg/etc.
  * call changes no plan shape.
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

  /** Partition-parallel batch decode: the Scala analogue of a batched
    * `mapInPandas` — one iterator pass per partition, constant memory,
    * no driver involvement. Repartition upstream by size/kind when codec
    * cost is skewed.
    */
  def decode(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    assets.select("asset_id", "kind", "content")
      .mapPartitions { rows =>
        rows.map { r => fakeDecode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)) }
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
