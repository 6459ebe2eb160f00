package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Append-aware source_stats: after a nightly append, the persisted
  * stats rebuild from the two incremental partial artifacts and equal
  * the one-pass corpus derivation exactly — and the refresh provably
  * never re-reads the pre-existing corpus files.
  */
class SourceStatsIncrSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def doc(id: Long, src: String, text: String) =
    (id, src, text, "en", text.length.toLong)

  private def writeDocs(dir: String, mode: String,
                        rows: Seq[(Long, String, String, String, Long)]): Unit =
    rows.toDF("doc_id", "source", "text", "lang", "n_chars")
      .repartition(1)
      .write.mode(mode).parquet(dir + "/documents.parquet")

  private def freshCorpus(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-srcstats-incr").toString
    writeDocs(dir, "overwrite", Seq(
      doc(1L, "web", "the cat sat on the mat and it is fine"),
      doc(2L, "web", "a dog ran to the park and the dog is fast"),
      doc(3L, "books", "in the beginning there is a long story of it all"),
      doc(4L, "books", "the story goes on and on and it is a good one")))
    dir
  }

  test("after an append, stats from merged partials equal the one-pass derivation") {
    val d = freshCorpus()
    // cold build: lands source_term_counts_v1 + source_quality_parts_v1
    val cold = Prep.sourceStats(spark, d).collect().map(_.toSeq).toSet
    assert(cold.nonEmpty)
    // nightly append: a new file with a new source and more web docs
    writeDocs(d, "append", Seq(
      doc(5L, "web", "the cat and the dog sat in a park of the town"),
      doc(6L, "wiki", "an article of facts is it not the best thing")))
    val refreshed = Prep.sourceStats(spark, d).collect().map(_.toSeq).toSet
    val onePass = Prep.sourceStatsPlan(spark, d).collect().map(_.toSeq).toSet
    assert(refreshed == onePass,
           s"merged partials diverged from the one-pass plan:\n" +
             s"merged:  ${refreshed.mkString("\n  ")}\n" +
             s"onepass: ${onePass.mkString("\n  ")}")
    assert(refreshed != cold, "append must change the stats")
    assert(refreshed.exists(_.head == "wiki"), "appended source missing")
  }

  test("the refresh never re-reads pre-existing corpus files") {
    val d = freshCorpus()
    Prep.sourceStats(spark, d).collect()
    // corrupt every ORIGINAL data file in place, keeping (name, length,
    // mtime) identical so the manifest still reads "unchanged". Parquet
    // reads of these files now throw — so if the refresh (or the
    // source_stats rebuild it triggers) touched any pre-existing file,
    // this test would fail with a read error instead of passing
    val tableDir = new java.io.File(d, "documents.parquet")
    val originals = tableDir.listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
                   !f.getName.startsWith("."))
    assert(originals.nonEmpty)
    originals.foreach { f =>
      val mtime = f.lastModified
      val garbage = Array.fill[Byte](f.length.toInt)('x'.toByte)
      java.nio.file.Files.write(f.toPath, garbage)
      assert(f.setLastModified(mtime))
    }
    writeDocs(d, "append", Seq(
      doc(7L, "wiki", "a fresh page of the day and it is good")))
    val refreshed = Prep.sourceStats(spark, d).collect()
    assert(refreshed.exists(_.getString(0) == "wiki"),
           "appended slice missing from the refreshed stats")
    assert(refreshed.exists(_.getString(0) == "web"),
           "pre-existing sources must survive the merge untouched")
  }
}
