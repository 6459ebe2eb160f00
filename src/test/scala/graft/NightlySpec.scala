package graft

import org.scalatest.funsuite.AnyFunSuite

/** The nightly runbook end-to-end on the small corpus: every stage
  * lands its artifact, the audit gate passes, and the report carries
  * every stage with positive rows.
  */
class NightlySpec extends AnyFunSuite with SparkSpec {

  test("Nightly.run lands every artifact and the audit gate is clean") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-nightly-spec").toString
    val report = Nightly.run(spark, "/root/testdata/sf0.001", out)
    assert(report.contains("\"audit_violations\":0"), report)
    for (a <- Seq("curated", "training_set", "shards", "bounds",
                  "plan", "order"))
      assert(spark.read.parquet(s"$out/$a").count() > 0, s"$a is empty")
    // report on disk matches what run() returned
    val disk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/report.json")), "UTF-8").trim
    assert(disk == report)
    for (st <- Seq("curate", "training_set", "shards", "bounds",
                   "epoch_plan", "training_order", "audit"))
      assert(report.contains(s""""stage":"$st""""), s"missing stage $st")
  }
}
