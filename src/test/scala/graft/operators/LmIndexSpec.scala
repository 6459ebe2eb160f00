package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted bigram-LM index is CCNet's deployment artifact: a fixed
  * model + fixed cuts applied to every new dump. Probing the corpus
  * through the index must reproduce batch q143 bit-for-bit (same nll,
  * same buckets), and novel text must take the add-one smoothing floor
  * (ln(1/v) per fully-unseen event) rather than crash or score zero.
  */
class LmIndexSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("index probe == batch q143 on the corpus; novel text takes the smoothing floor") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-index").toString + "/lm"
    Prep.buildLmIndex(spark, sf, dir)

    val probed = Prep.lmBucketStream(
        Tables.documents(spark, sf).select("doc_id", "lang", "text"),
        spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.SparkEntry.queries("q143_ccnet_buckets")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(probed.nonEmpty)
    assert(probed === batch,
           "index probe diverges from the batch CCNet composition")

    // fully-novel arrival: every event unseen -> per-event contribution
    // ln(1/v), so nll = round(-ln(1/v), 4) under the scaled-int spelling
    val v = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).distinct().count()
    val novel = Seq((9001L, "en", "zzq1 zzq2 zzq3 zzq4")).toDF("doc_id", "lang", "text")
    val r = Prep.lmBucketStream(novel, spark, dir).collect()
    assert(r.length === 1)
    val expected = BigDecimal(-math.floor(math.log(1.0 / v) * 1e6 + 0.5) / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getDouble(2) === expected,
           s"novel-text nll ${r(0).getDouble(2)} != smoothing floor $expected")
    assert(r(0).getString(4) === "tail", "off-distribution text must land in tail")

    // unknown language -> null cuts -> quarantine to tail
    val noLang = Seq((9002L, "xx", "the a of to in")).toDF("doc_id", "lang", "text")
    val r2 = Prep.lmBucketStream(noLang, spark, dir).collect()
    assert(r2(0).getString(4) === "tail")
  }

  test("the gate actually streams: micro-batched verdicts == batch, doc-for-doc") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-stream").toString + "/lm"
    Prep.buildLmIndex(spark, sf, dir)

    val batch = Prep.lmBucketStream(
        Tables.documents(spark, sf).select("doc_id", "lang", "text"),
        spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getLong(3), r.getString(4))).toMap

    val corpus = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    implicit val sctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val (half1, half2) = corpus.splitAt(corpus.size / 2)
    mem.addData(half1: _*)
    mem.addData(half2: _*)
    val q = Prep.lmBucketStream(
        mem.toDF().toDF("doc_id", "lang", "text"), spark, dir)
      .writeStream.format("memory").queryName("lm_buckets")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("lm_buckets")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getLong(3), r.getString(4))).toMap
    assert(got.size === batch.size, "stream dropped or duplicated documents")
    batch.foreach { case (id, b) =>
      assert(got(id) === b, s"doc $id: stream verdict ${got(id)} != batch $b")
    }
  }
}
