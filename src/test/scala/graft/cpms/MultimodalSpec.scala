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
