package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the curation family beyond the DuckDB hash oracle. */
class CurationSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q59 split is exhaustive, deterministic, and near the 75/12.5/12.5 design") {
    val counts = SparkEntry.queries("q59_train_split")(spark, sf)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet === Set("train", "val", "test"))
    // md5 is uniform: expect 0.75 +- a few sigma at n=500
    assert(math.abs(counts("train") / n - 0.75) < 0.08,
           s"train share off: $counts")
    // determinism: a second run partitions identically
    val again = SparkEntry.queries("q59_train_split")(spark, sf)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === counts)
  }

  test("q61 scrubs every planted address and leaves no @ behind") {
    val rows = SparkEntry.queries("q61_pii_scrub")(spark, sf)
      .select(col("scrubbed"), col("n_redactions")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === 2L, "exactly two planted addresses per doc")
      assert(!r.getString(0).contains("@"), s"unredacted address: ${r.getString(0)}")
      assert(r.getString(0).contains("<EMAIL>"))
    }
  }

  test("exportCurated writes kept docs partitioned by split, consistent with q65") {
    val out = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    Curation.exportCurated(spark, sf, out)
    val expected = Curation.curate(spark, sf)
      .filter(col("keep") === 1L)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val written = spark.read.parquet(out)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(written === expected)
    assert(written.values.sum > 0)
    // the partition layout itself: one dir per split, prunable at read
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("split=")).toSet
    assert(dirs === expected.keySet.map("split=" + _))
    // dropped docs (keep=0) must not leak into the corpus
    val total = Curation.curate(spark, sf).count()
    assert(written.values.sum < total, "export kept everything — filter lost")
  }

  test("q62 samples exactly k per stratum (or the whole stratum when smaller)") {
    val perLang = SparkEntry.queries("q62_stratified_sample")(spark, sf)
      .groupBy("lang").count().collect().map(r => r.getLong(1))
    assert(perLang.forall(_ <= 20))
    assert(perLang.nonEmpty)
  }
}
