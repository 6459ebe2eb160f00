package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** auditPackedIdsExport: a clean export audits clean; seeded corruption
  * (flipped ids, a deleted shard row, a truncated boundary sidecar) is
  * flagged at exactly the damaged (split, bin) with the right check.
  */
class ExportAuditSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-audit-spec").toString

  test("a clean EOS export with its boundary sidecar audits clean") {
    val out = tmp()
    Curation.exportPackedTokenIdsSep(spark, dir, out + "/ids")
    Curation.packBoundaryRows(
        Curation.trainingSetVerdict(spark, dir)
          .filter(col("keep") === 1L).select("doc_id"), spark, dir)
      .write.mode("overwrite").parquet(out + "/bounds")
    val v = Curation.auditPackedIdsExport(
      spark, out + "/ids", Some(out + "/bounds"), Some(Curation.EosId))
    assert(v.count() == 0L, v.collect().mkString("\n"))
  }

  test("corrupted ids are flagged at exactly the damaged bin, as md5 + count") {
    val out = tmp()
    Curation.exportPackedTokenIds(spark, dir, out + "/ids")
    // damage ONE shard row: drop the first id of (train, bin 0)
    val shards = spark.read.parquet(out + "/ids")
    val hit = col("split") === "train" && col("bin") === 0L
    shards.withColumn("ids",
        when(hit, expr("slice(ids, 2, size(ids) - 1)")).otherwise(col("ids")))
      .write.mode("overwrite").parquet(out + "/ids_bad")
    val v = Curation.auditPackedIdsExport(spark, out + "/ids_bad")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(v.toSet == Set(("train", 0L, "ids_md5"), ("train", 0L, "n_ids")),
           v.mkString("\n"))
  }

  test("a missing shard row breaks bin density; a truncated sidecar breaks the universe") {
    val out = tmp()
    Curation.exportPackedTokenIds(spark, dir, out + "/ids")
    Curation.packBoundaryRows(
        Curation.trainingSetVerdict(spark, dir)
          .filter(col("keep") === 1L).select("doc_id"), spark, dir)
      .write.mode("overwrite").parquet(out + "/bounds")
    val shards = spark.read.parquet(out + "/ids")
    assert(shards.filter(col("split") === "train").count() > 1,
           "need >1 train bin for the density check to bite")
    shards.filter(!(col("split") === "train" && col("bin") === 0L))
      .write.mode("overwrite").parquet(out + "/ids_hole")
    val v = Curation.auditPackedIdsExport(
        spark, out + "/ids_hole", Some(out + "/bounds"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(v.contains(("train", -1L, "bin_density")), v.mkString("\n"))
    assert(v.contains(("train", 0L, "boundary_universe")), v.mkString("\n"))
  }

  test("a duplicated shard row cannot mask a hole it exactly compensates") {
    val out = tmp()
    Curation.exportPackedTokenIds(spark, dir, out + "/ids")
    val shards = spark.read.parquet(out + "/ids")
    assert(shards.filter(col("split") === "train").count() > 1,
           "need >1 train bin for the density check to bite")
    // bins {0, 1, ..} -> {0, 0, ..}: drop bin 1, duplicate bin 0. A
    // rows-only density count sees mn==0 && mx+1==n and passes both
    // the hole AND the dup silently
    val hole = shards.filter(!(col("split") === "train" && col("bin") === 1L))
    val dup = shards.filter(col("split") === "train" && col("bin") === 0L)
    hole.unionByName(dup)
      .write.mode("overwrite").parquet(out + "/ids_dup_hole")
    val v = Curation.auditPackedIdsExport(spark, out + "/ids_dup_hole")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(v.contains(("train", -1L, "bin_density")),
           s"hole slipped the density check:\n${v.mkString("\n")}")
    assert(v.contains(("train", -1L, "bin_duplicate")),
           s"dup slipped the duplicate check:\n${v.mkString("\n")}")
  }

  test("packReportFromExport over the landed sidecar equals batch q152") {
    val out = tmp()
    Curation.packBoundaryRows(
        Curation.trainingSetVerdict(spark, dir)
          .filter(col("keep") === 1L).select("doc_id"), spark, dir)
      .write.mode("overwrite").parquet(out + "/bounds")
    val shipped = Curation.packReportFromExport(spark, out + "/bounds")
      .collect().map(_.toString).sorted.toSeq
    val predicted = graft.SparkEntry.queries("q152_pack_efficiency")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(shipped == predicted,
           s"shipped:\n${shipped.mkString("\n")}\npredicted:\n${predicted.mkString("\n")}")
  }
}
