package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The append-aware DerivedCache path: when the corpus table grows by
  * pure file addition, the refresh derives over ONLY the added files
  * and merges into the landed artifact — and the merged bytes equal a
  * from-scratch rebuild. Any non-append change (rewrite, delete) falls
  * back to the full derivation.
  */
class IncrementalCacheSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def freshCorpus(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-incr-spec").toString
    Seq((1L, "a b a"), (2L, "b c")).toDF("id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    dir
  }

  private def counts(df: DataFrame): DataFrame =
    df.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("c"))

  private def rows(df: DataFrame): Set[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("append refreshes via delta-only derivation and equals a full rebuild") {
    val d = freshCorpus()
    var fullRuns = 0
    var deltaFiles = Seq.empty[String]
    def serve() = DerivedCache.orBuildIncremental(spark, d, "inc_counts_v1")(
      { fullRuns += 1; counts(spark.read.parquet(d + "/documents.parquet")) })(
      { files => deltaFiles = files
        counts(spark.read.parquet(files: _*)) })(
      { (old, dl) => old.unionByName(dl)
          .groupBy("w").agg(sum("c").cast("long").as("c")) })

    assert(rows(serve()) == Set(("a", 2L), ("b", 2L), ("c", 1L)))
    assert(fullRuns == 1 && deltaFiles.isEmpty)
    // cache hit: neither path runs
    serve()
    assert(fullRuns == 1 && deltaFiles.isEmpty)

    // append one file (the nightly-crawl shape): delta-only refresh
    Seq((3L, "c d")).toDF("id", "text")
      .write.mode("append").parquet(d + "/documents.parquet")
    val refreshed = rows(serve())
    assert(fullRuns == 1, "append must not trigger the full derivation")
    assert(deltaFiles.size == 1 && deltaFiles.head.contains("documents.parquet"),
           s"delta must see exactly the appended file, saw: $deltaFiles")
    // the merged artifact equals a from-scratch derivation of the grown corpus
    assert(refreshed ==
             rows(counts(spark.read.parquet(d + "/documents.parquet"))),
           "incrementally merged artifact diverged from a full rebuild")
    // and the refreshed artifact serves as a plain hit afterwards
    deltaFiles = Nil
    serve()
    assert(fullRuns == 1 && deltaFiles.isEmpty)
  }

  test("a chain of nightly appends stays delta-only and exact at every step") {
    val d = freshCorpus()
    var fullRuns = 0
    var deltaRuns = 0
    var lastDelta = Seq.empty[String]
    def serve() = DerivedCache.orBuildIncremental(spark, d, "inc_chain_v1")(
      { fullRuns += 1; counts(spark.read.parquet(d + "/documents.parquet")) })(
      { files => deltaRuns += 1; lastDelta = files
        counts(spark.read.parquet(files: _*)) })(
      { (old, dl) => old.unionByName(dl)
          .groupBy("w").agg(sum("c").cast("long").as("c")) })
    serve()
    // three consecutive nights: each refresh sees ONLY its own slice
    for (night <- 1 to 3) {
      Seq((10L + night, s"night$night words")).toDF("id", "text")
        .write.mode("append").parquet(d + "/documents.parquet")
      val got = rows(serve())
      assert(fullRuns == 1, s"night $night re-ran the full derivation")
      assert(deltaRuns == night, s"night $night: wrong delta count")
      assert(lastDelta.size == 1,
             s"night $night delta saw ${lastDelta.size} files (want 1)")
      assert(got == rows(counts(
               spark.read.parquet(d + "/documents.parquet"))),
             s"night $night diverged from a full rebuild")
      assert(got.exists(_._1 == s"night$night"))
    }
  }

  test("a rewritten corpus falls back to the full derivation") {
    val d = freshCorpus()
    var fullRuns = 0
    var deltaRuns = 0
    def serve() = DerivedCache.orBuildIncremental(spark, d, "inc_counts_v1")(
      { fullRuns += 1; counts(spark.read.parquet(d + "/documents.parquet")) })(
      { files => deltaRuns += 1; counts(spark.read.parquet(files: _*)) })(
      { (old, dl) => old.unionByName(dl)
          .groupBy("w").agg(sum("c").cast("long").as("c")) })
    serve()
    // full REWRITE (compaction): old files replaced, not appended
    Seq((1L, "x"), (2L, "y")).toDF("id", "text")
      .write.mode("overwrite").parquet(d + "/documents.parquet")
    val after = rows(serve())
    assert(fullRuns == 2 && deltaRuns == 0,
           "a rewrite must rebuild from scratch, never merge")
    assert(after == Set(("x", 1L), ("y", 1L)))
  }
}
