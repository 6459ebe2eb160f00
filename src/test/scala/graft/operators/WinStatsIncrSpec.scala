package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Append-aware windowed plan stats: the (win_ms, source, term) counts
  * and per-(win_ms, source) quality partials merge additively from the
  * appended slice — including a slice that lands INSIDE an existing
  * window — and the rebuilt plan-stats table equals the one-pass
  * derivation exactly; pre-existing corpus bytes are never re-read.
  */
class WinStatsIncrSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def doc(id: Long, src: String, text: String) =
    (id, src, text, "en", text.length.toLong)

  private def writeDocs(dir: String, mode: String,
                        rows: Seq[(Long, String, String, String, Long)]): Unit =
    rows.toDF("doc_id", "source", "text", "lang", "n_chars")
      .repartition(1)
      .write.mode(mode).parquet(dir + "/documents.parquet")

  // doc_id = minutes: ids 0-59 share hour-window 0, 60-119 window 1
  private def freshCorpus(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-winstats-incr").toString
    writeDocs(dir, "overwrite", Seq(
      doc(1L, "web", "the cat sat on the mat and it is fine today"),
      doc(5L, "web", "a dog ran to the park and the dog is fast"),
      doc(8L, "books", "in the beginning there is a long story of it"),
      doc(65L, "web", "the story goes on and on and it is a good one")))
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("after an append into an existing window, stats equal the one-pass plan") {
    val d = freshCorpus()
    val cold = rows(Prep.windowedPlanStats(spark, d))
    assert(cold.nonEmpty)
    // the slice lands one doc INSIDE window 0 (id 9) and one in a brand
    // new window (id 130), plus a new source
    writeDocs(d, "append", Seq(
      doc(9L, "web", "the cat and the dog met in a park of the town"),
      doc(130L, "wiki", "an article of facts is it not the best one")))
    val refreshed = rows(Prep.windowedPlanStats(spark, d))
    val onePass = rows(Prep.windowedPlanStatsPlan(spark, d))
    assert(refreshed == onePass,
           s"merged windowed partials diverged from one-pass:\n" +
             s"merged:  ${refreshed.mkString("\n  ")}\n" +
             s"onepass: ${onePass.mkString("\n  ")}")
    assert(refreshed != cold, "append must change the windowed stats")
  }

  test("the windowed refresh never re-reads pre-existing corpus files") {
    val d = freshCorpus()
    Prep.windowedPlanStats(spark, d).collect()
    Prep.sourceTermCounts(spark, d).count() // ref layer landed too
    val tableDir = new java.io.File(d, "documents.parquet")
    tableDir.listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
                   !f.getName.startsWith("."))
      .foreach { f =>
        val mtime = f.lastModified
        java.nio.file.Files.write(
          f.toPath, Array.fill[Byte](f.length.toInt)('x'.toByte))
        assert(f.setLastModified(mtime))
      }
    writeDocs(d, "append", Seq(
      doc(9L, "wiki", "a fresh page of the day and it is good")))
    val refreshed = Prep.windowedPlanStats(spark, d).collect()
    assert(refreshed.exists(_.getString(1) == "wiki"),
           "appended slice missing from refreshed windowed stats")
    assert(refreshed.exists(_.getString(1) == "web"),
           "pre-existing windows must survive the merge untouched")
  }
}
