package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Append-aware bigram LM counts: the (a, b) count artifact merges
  * additively from the appended slice only, and the rescored per-doc
  * NLL table equals the one-pass derivation exactly. The scoring pass
  * itself remains a full corpus scan BY DESIGN — every doc's score is
  * a function of the global smoothed LM — so the equality here is the
  * whole guarantee: incremental counts change nothing but the bill.
  */
class BigramIncrSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def writeDocs(dir: String, mode: String,
                        rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, text) => (id, "web", text, "en", text.length.toLong) }
      .toDF("doc_id", "source", "text", "lang", "n_chars")
      .repartition(1)
      .write.mode(mode).parquet(dir + "/documents.parquet")

  private def freshCorpus(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bigram-incr").toString
    writeDocs(dir, "overwrite", Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "a cat and a dog met on the mat")))
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("after an append, NLL from merged counts equals the one-pass plan") {
    val d = freshCorpus()
    val cold = rows(Prep.bigramNll(spark, d))
    assert(cold.nonEmpty)
    writeDocs(d, "append", Seq(
      (4L, "the cat met the dog on the log"),
      (5L, "a mat and a log sat by the door")))
    // evict the session's cached vocab/count stats — the append grew
    // the vocabulary, and the smoothing V must be the new one (the
    // standard corpus-change hook; persisted artifacts self-refresh)
    TrainingData.invalidate(d)
    val refreshed = rows(Prep.bigramNll(spark, d))
    val onePass = rows(Prep.bigramNllPlan(spark, d))
    assert(refreshed == onePass,
           "NLL from incrementally-merged counts diverged from one-pass")
    assert(refreshed != cold, "append must shift the global LM scores")
  }

  test("the count refresh never re-reads pre-existing corpus files") {
    val d = freshCorpus()
    Prep.bigramCounts(spark, d).collect()
    // corrupt the original files in place (same name/len/mtime): any
    // read of them now throws, so a passing refresh proves the delta
    // touched only the appended file
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
    writeDocs(d, "append", Seq((9L, "new words only here")))
    val merged = Prep.bigramCounts(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // old counts survive the merge; the appended slice's bigrams land
    assert(merged(("on", "the")) == 3L, s"old count lost: $merged")
    assert(merged(("new", "words")) == 1L, s"delta count missing: $merged")
  }
}
