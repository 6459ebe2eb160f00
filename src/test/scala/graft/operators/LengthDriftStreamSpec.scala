package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The streaming length-drift monitor must agree with the batch audit:
  * windowed bin counts emitted by the watermark path equal the batch
  * aggregate, the KS report over them equals q158 for every closed
  * window, a planted stub flood out-scores organic slices, and an
  * arrival LONGER than anything the corpus reference has seen still
  * contributes its sup-gap (the union-grid property).
  */
class LengthDriftStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stream bin counts equal batch; closed-window KS matches q158; stubs flag high") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(minutes: Long) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars")
      .collect().map(r => (ts(r.getLong(0)), r.getString(1), r.getLong(2)))

    val mem = MemoryStream[(java.sql.Timestamp, String, Long)]
    mem.addData(docs.toSeq: _*)
    mem.addData((ts(1000000L), "sentinel", 1L)) // closes every doc window
    val q = Prep.lengthBinCountsStream(
        mem.toDF().toDF("ts", "source", "n_chars"), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("len_counts")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def fresh(table: String) = spark.createDataFrame(
      spark.table(table).collect().toList.asJava, spark.table(table).schema)
    val streamed = fresh("len_counts")

    // 1) counts parity with the batch core over the same rows
    val batchCounts = Prep.windowedLengthBins(
      docs.toSeq.toDF("ts", "source", "n_chars"), "1 hour")
    assert(streamed.collect().map(_.toString).sorted.toSeq ===
             batchCounts.collect().map(_.toString).sorted.toSeq,
           "watermark path dropped/duplicated windowed bin counts")

    // 2) KS report over streamed counts equals q158 (same reference
    // derivation: corpus bins from the landed counts)
    val ref = streamed.groupBy("b").agg(sum("n_wb").cast("long").as("cc"))
    val report = Prep.lengthDriftReport(streamed, ref)
      .collect().map(_.toString).sorted.toSeq
    val q158 = graft.SparkEntry.queries("q158_window_length_drift")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(report === q158, "streamed KS report diverges from the batch audit")

    // 3) a planted stub flood (one window of 3-char docs) must
    // out-score every organic slice against the CORPUS reference
    val stubs = (0 until 40).map(i => (ts(2000000L + i), "srcstub", 3L))
    val mem2 = MemoryStream[(java.sql.Timestamp, String, Long)]
    mem2.addData(docs.toSeq ++ stubs: _*)
    mem2.addData((ts(9000000L), "sentinel", 1L))
    val q2 = Prep.lengthBinCountsStream(
        mem2.toDF().toDF("ts", "source", "n_chars"), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("len_counts2")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val corpusRef = Prep.corpusLengthBins(spark, sf)
    val rep2 = Prep.lengthDriftReport(fresh("len_counts2"), corpusRef)
      .collect().map(r => (r.getString(1), r.getDouble(3)))
    val stubKs = rep2.filter(_._1 == "srcstub").map(_._2)
    val organicMax = rep2.filter(p => p._1 != "srcstub" && p._1 != "sentinel")
      .map(_._2).max
    assert(stubKs.nonEmpty && stubKs.min > organicMax,
           s"stub slice (${stubKs.toSeq}) must out-score organic max $organicMax")

    // 4) novel-bin arrival: one window of docs far LONGER than any
    // corpus doc — its bin is outside the reference support, and the
    // union grid must still charge the full gap (KS -> 1.0 for a
    // slice entirely beyond the reference CDF's last step)
    val whales = (0 until 5).map(i =>
      (ts(3000000L + i), "srcwhale", 100000000L))
    val mem3 = MemoryStream[(java.sql.Timestamp, String, Long)]
    mem3.addData(whales: _*)
    mem3.addData((ts(9000000L), "sentinel", 1L))
    val q3 = Prep.lengthBinCountsStream(
        mem3.toDF().toDF("ts", "source", "n_chars"), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("len_counts3")
      .outputMode("append").start()
    try q3.processAllAvailable() finally q3.stop()
    val rep3 = Prep.lengthDriftReport(fresh("len_counts3"), corpusRef)
      .collect().map(r => (r.getString(1), r.getDouble(3))).toMap
    assert(rep3("srcwhale") === 1.0,
           s"beyond-reference slice must hit the full sup-gap: $rep3")
  }
}
