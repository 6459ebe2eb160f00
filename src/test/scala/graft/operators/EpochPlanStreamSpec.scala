package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming epoch planner must close the DoReMi loop exactly: drift
  * monitor lands per-window KL, the planner joins each closed window's
  * source statistics to it through epochPlanCore, and the landed plans
  * equal the batch composition (q138) row-for-row on every closed
  * window. Same fixture rule as DriftStreamSpec: ts = doc_id minutes, a
  * far-future sentinel closes every document window.
  */
class EpochPlanStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("startEpochPlanner lands per-window plans equal to the batch composition") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(minutes: Long) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
      .collect().map(r => (ts(r.getLong(0)), r.getString(1), r.getString(2)))

    val base = java.nio.file.Files
      .createTempDirectory("graft-epoch-plan").toString
    val reportDir = s"$base/reports"
    val planDir = s"$base/plans"

    // phase 1: the drift monitor lands closed-window KL
    val mem1 = MemoryStream[(java.sql.Timestamp, String, String)]
    mem1.addData(docs.toSeq: _*)
    mem1.addData((ts(1000000L), "sentinel", "x"))
    Prep.startDriftMonitor(mem1.toDF().toDF("ts", "source", "text"),
                           spark, sf, reportDir, s"$base/ckpt-drift")
      .awaitTermination()

    // phase 2: the planner joins closed stats windows to the landed KL
    val mem2 = MemoryStream[(java.sql.Timestamp, String, String)]
    mem2.addData(docs.toSeq: _*)
    mem2.addData((ts(1000000L), "sentinel", "x"))
    Prep.startEpochPlanner(mem2.toDF().toDF("ts", "source", "text"),
                           spark, sf, reportDir, planDir, s"$base/ckpt-plan")
      .awaitTermination()

    val landed = spark.read.parquet(planDir)
      .select("win_ms", "source", "avail_tokens", "target_tokens",
              "planned_tokens", "epochs", "capped")
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.SparkEntry.queries("q138_windowed_epoch_plan")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(landed.nonEmpty, "planner landed no plans")
    assert(landed === batch,
           "streamed epoch plans diverge from the batch composition")
  }
}
