package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The streaming drift monitor must agree with the batch audit: windowed
  * term counts emitted by the watermark path equal the batch aggregate,
  * and the per-window KL report over them equals q124's rows for every
  * CLOSED window. Also: a planted spammy slice must out-score every
  * organic slice.
  */
class DriftStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stream counts equal batch; closed-window report matches q124; spam flags high") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(minutes: Long) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
      .collect().map(r => (ts(r.getLong(0)), r.getString(1), r.getString(2)))

    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    mem.addData(docs.toSeq: _*)
    // a sentinel far in the future closes every document window; its own
    // window stays open and never emits
    mem.addData((ts(1000000L), "sentinel", "x"))
    val q = Prep.driftTermCountsStream(
        mem.toDF().toDF("ts", "source", "text"), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // rebuild as a fresh frame: the memory-sink View resists the
    // self-join attribute dedup driftReport's slice rollup needs (real
    // sinks hand foreachBatch a plain frame, which joins fine)
    def fresh(table: String) = spark.createDataFrame(
      spark.table(table).collect().toList.asJava, spark.table(table).schema)
    val streamed = fresh("drift_counts")

    // 1) counts parity with the batch core over the same rows
    val batchCounts = Prep.windowedTermCounts(
      docs.toSeq.toDF("ts", "source", "text"), "1 hour")
    val a = streamed.collect().map(_.toString).sorted.toSeq
    val b = batchCounts.collect().map(_.toString).sorted.toSeq
    assert(a === b, "watermark path dropped/duplicated windowed counts")

    // 2) report over streamed counts equals q124 (same docs, same ts rule)
    val report = Prep.driftReport(streamed, spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val q124 = graft.SparkEntry.queries("q124_source_drift_windows")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(report === q124, "streamed drift report diverges from the batch audit")

    // 3) a planted spammy slice (one window of repeated junk) must
    // out-score every organic (window, source) slice
    val spam = (0 until 30).map(i =>
      (ts(2000000L + i), "srcspam", "buy cheap pills now " * 8))
    val mem2 = MemoryStream[(java.sql.Timestamp, String, String)]
    mem2.addData(docs.toSeq ++ spam: _*)
    mem2.addData((ts(9000000L), "sentinel", "x"))
    val q2 = Prep.driftTermCountsStream(
        mem2.toDF().toDF("ts", "source", "text"), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("drift_counts2")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val rep2 = Prep.driftReport(fresh("drift_counts2"), spark, sf)
      .collect().map(r => (r.getString(1), r.getDouble(3)))
    val spamKl = rep2.filter(_._1 == "srcspam").map(_._2)
    val organicMax = rep2.filter(_._1 != "srcspam").map(_._2).max
    assert(spamKl.nonEmpty && spamKl.min > organicMax,
           s"spam slice (${spamKl.toSeq}) must out-score organic max $organicMax")
  }

  test("startDriftMonitor lands closed-window KL reports equal to the batch audit") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(minutes: Long) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
      .collect().map(r => (ts(r.getLong(0)), r.getString(1), r.getString(2)))
    val reportDir = java.nio.file.Files
      .createTempDirectory("graft-drift-report").toString + "/reports"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-drift-ckpt").toString
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    mem.addData(docs.toSeq: _*)
    mem.addData((ts(1000000L), "sentinel", "x"))
    Prep.startDriftMonitor(mem.toDF().toDF("ts", "source", "text"),
                           spark, sf, reportDir, ckpt)
      .awaitTermination()
    val landed = spark.read.parquet(reportDir)
      .select("win_ms", "source", "n_terms", "kl")
      .collect().map(_.toString).sorted.toSeq
    val q124 = graft.SparkEntry.queries("q124_source_drift_windows")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(landed === q124,
           "landed drift reports diverge from the batch audit")
  }
}
