package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The nightly runbook end-to-end on the small corpus: every stage
  * lands its artifact, both audit gates pass, and the report carries
  * every stage with positive rows. Then: seeded corruption of the
  * planner artifacts (a deleted order row, a doubled manifest row) is
  * named by the order audit — the condition under which Nightly.main
  * exits 1.
  */
class NightlySpec extends AnyFunSuite with SparkSpec {

  test("Nightly.run lands every artifact and the audit gate is clean") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-nightly-spec").toString
    val report = Nightly.run(spark, "/root/testdata/sf0.001", out)
    assert(report.contains("\"audit_violations\":0"), report)
    for (a <- Seq("curated", "training_set", "shards", "bounds",
                  "plan", "manifest", "order"))
      assert(spark.read.parquet(s"$out/$a").count() > 0, s"$a is empty")
    // report on disk matches what run() returned
    val disk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/report.json")), "UTF-8").trim
    assert(disk == report)
    for (st <- Seq("curate", "training_set", "shards", "bounds",
                   "epoch_plan", "manifest", "training_order", "audit"))
      assert(report.contains(s""""stage":"$st""""), s"missing stage $st")

    // ---- seeded corruption: the order audit names each damage ----
    val plan = s"$out/plan"; val man = s"$out/manifest"; val ord = s"$out/order"
    def audits(p: String, m: String, o: String) =
      operators.Prep.auditTrainingOrder(spark, p, m, o)
        .collect().map(r => (r.getString(2), r.getString(0), r.getLong(1)))

    // a DELETED order row: drop one (epoch, shard, pos) instance
    val o0 = spark.read.parquet(ord)
    val victim = o0.orderBy("epoch", "shard", "pos").limit(1).collect()(0)
    val (vE, vS) = (victim.getAs[Long]("epoch"), victim.getAs[Long]("shard"))
    o0.filter(!(col("epoch") === vE && col("shard") === vS &&
                col("pos") === victim.getAs[Long]("pos")))
      .write.mode("overwrite").parquet(s"$out/order_hole")
    val vHole = audits(plan, man, s"$out/order_hole")
    assert(vHole.exists(_._1 == "pos_density"),
           s"deleted order row not named:\n${vHole.mkString("\n")}")
    assert(vHole.exists(v => v._1 == "order_manifest_docs" && v._3 == vE),
           s"order/manifest doc count drift not named:\n${vHole.mkString("\n")}")
    assert(vHole.exists(v => v._1 == "order_manifest_digest" && v._3 == vE),
           s"order/manifest digest drift not named:\n${vHole.mkString("\n")}")

    // a DOUBLED manifest row: one (source, epoch) manifest appears twice
    val m0 = spark.read.parquet(man)
    m0.unionByName(m0.limit(1))
      .write.mode("overwrite").parquet(s"$out/manifest_dup")
    val vDup = audits(plan, s"$out/manifest_dup", ord)
    assert(vDup.exists(_._1 == "manifest_dup"),
           s"doubled manifest row not named:\n${vDup.mkString("\n")}")

    // and a swapped doc_id with IDENTICAL token count: counts balance,
    // only the digest can catch it
    val swapped = o0.withColumn("doc_id",
        when(col("epoch") === vE && col("shard") === vS &&
             col("pos") === victim.getAs[Long]("pos"),
             col("doc_id") + 1000000L).otherwise(col("doc_id")))
    swapped.write.mode("overwrite").parquet(s"$out/order_swap")
    val vSwap = audits(plan, man, s"$out/order_swap")
    assert(vSwap.exists(v => v._1 == "order_manifest_digest" && v._3 == vE),
           s"swapped doc_id not named by digest:\n${vSwap.mkString("\n")}")
    assert(!vSwap.exists(_._1 == "order_manifest_docs"),
           "counts should balance in the swap scenario")
  }
}
