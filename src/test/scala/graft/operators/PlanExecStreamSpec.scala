package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming plan EXECUTOR must realize exactly the manifests the
  * batch composition derives: after the drift monitor and epoch planner
  * land their artifacts over the feed, startPlanExecutor's sampled
  * per-(window, source, epoch) manifests equal batch q141 row-for-row
  * on every closed window. Completes the drift → plan → sample loop
  * in-stream. Same fixture rule as EpochPlanStreamSpec: ts = doc_id
  * minutes, a far-future sentinel closes every document window.
  */
class PlanExecStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("startPlanExecutor lands manifests equal to the batch composition") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(minutes: Long) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
      .collect().map(r => (ts(r.getLong(0)), r.getLong(0), r.getString(1),
                           r.getString(2)))

    val base = java.nio.file.Files
      .createTempDirectory("graft-plan-exec").toString
    val reportDir = s"$base/reports"
    val planDir = s"$base/plans"
    val outDir = s"$base/manifests"

    // phase 1: drift monitor lands closed-window KL
    val mem1 = MemoryStream[(java.sql.Timestamp, Long, String, String)]
    mem1.addData(docs.toSeq: _*)
    mem1.addData((ts(1000000L), -1L, "sentinel", "x"))
    Prep.startDriftMonitor(
        mem1.toDF().toDF("ts", "doc_id", "source", "text"),
        spark, sf, reportDir, s"$base/ckpt-drift")
      .awaitTermination()

    // phase 2: planner lands per-window plans
    val mem2 = MemoryStream[(java.sql.Timestamp, Long, String, String)]
    mem2.addData(docs.toSeq: _*)
    mem2.addData((ts(1000000L), -1L, "sentinel", "x"))
    Prep.startEpochPlanner(
        mem2.toDF().toDF("ts", "doc_id", "source", "text"),
        spark, sf, reportDir, planDir, s"$base/ckpt-plan")
      .awaitTermination()

    // phase 3: the executor samples the same feed against landed plans
    val mem3 = MemoryStream[(java.sql.Timestamp, Long, String, String)]
    mem3.addData(docs.toSeq: _*)
    mem3.addData((ts(1000000L), -1L, "sentinel", "x"))
    Prep.startPlanExecutor(
        mem3.toDF().toDF("ts", "doc_id", "source", "text"),
        spark, planDir, outDir, s"$base/ckpt-exec")
      .awaitTermination()

    val landed = spark.read.parquet(outDir)
      .select("win_ms", "source", "epoch", "n_docs", "n_tokens", "doc_digest")
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.SparkEntry.queries("q141_windowed_plan_execute")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(landed.nonEmpty, "executor landed no manifests")
    assert(landed === batch,
           "streamed shard manifests diverge from the batch composition")
  }

  test("startPlanExecutor refuses to start without landed plans") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, String)]
    val base = java.nio.file.Files
      .createTempDirectory("graft-plan-exec-miss").toString
    val e = intercept[IllegalArgumentException] {
      Prep.startPlanExecutor(
        mem.toDF().toDF("ts", "doc_id", "source", "text"),
        spark, s"$base/nonexistent", s"$base/out", s"$base/ckpt")
    }
    assert(e.getMessage.contains("no landed plans"))
  }
}
