package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Append-aware NB quality gate: the (term, n_pt, n_nt) class-count
  * artifact merges additively from the appended slice only,
  * bit-identical to a full recount with old corpus bytes provably
  * unread; the at-ingest scorer streams arrivals against the persisted
  * counts and agrees with the in-query q161 scores exactly.
  */
class NbIncrSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def writeDocs(dir: String, mode: String,
                        rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, text) =>
        // short docs label negative; stopword-dense 40+-token docs positive
        (id, "web", text, "en", text.length.toLong)
      }
      .toDF("doc_id", "source", "text", "lang", "n_chars")
      .repartition(1)
      .write.mode(mode).parquet(dir + "/documents.parquet")

  private val posText =
    (("the cat is on a mat and it is the dog of a log " * 3).trim)
  private val negText = "zzq1 zzq2 zzq3"

  private def freshCorpus(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-nb-incr").toString
    writeDocs(dir, "overwrite", Seq(
      (1L, posText), (2L, posText + " extra"), (3L, negText),
      (4L, "zzq4 zzq5 the")))
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  private def recount(d: String) =
    graft.Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("term"),
              round(least(lit(1.0), size(split(col("text"), " ")) / 64.0) *
                (lit(0.5) + size(filter(split(col("text"), " "),
                    t => array_contains(
                      array(TrainingData.enStop.map(lit): _*), t)))
                  .cast("double") / size(split(col("text"), " "))) * 10000, 0)
                .cast("long").as("qi"))
      .groupBy("term")
      .agg(coalesce(sum(when(col("qi") >= Prep.NbHiInt, 1L)), lit(0L))
             .cast("long").as("n_pt"),
           coalesce(sum(when(col("qi") <= Prep.NbLoInt, 1L)), lit(0L))
             .cast("long").as("n_nt"))
      .filter(col("n_pt") + col("n_nt") > 0)

  test("append merge equals a full recount; old corpus bytes never re-read") {
    val d = freshCorpus()
    val cold = rows(Prep.nbClassCounts(spark, d))
    assert(cold === rows(recount(d)), "cold artifact != independent recount")

    // corrupt the pre-existing corpus file in place (same name/length):
    // a passing refresh proves the delta derivation read only the
    // appended file
    val docDir = new java.io.File(d + "/documents.parquet")
    docDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      val mtime = f.lastModified
      val raf = new java.io.RandomAccessFile(f, "rw")
      try { raf.seek(4); raf.write(Array.fill(32)(0x5A.toByte)) }
      finally raf.close()
      // the manifest keys files by name|len|mtime — restore mtime so the
      // corrupted file still registers as UNCHANGED and the refresh takes
      // the delta path this test exists to prove
      assert(f.setLastModified(mtime))
    }
    writeDocs(d, "append", Seq((5L, posText + " appended"), (6L, "zzq9")))
    val merged = rows(Prep.nbClassCounts(spark, d))
    assert(merged !== cold, "append must change the class counts")

    // heal the corruption and recount from scratch for the equality
    writeDocs(d + "-truth", "overwrite", Seq(
      (1L, posText), (2L, posText + " extra"), (3L, negText),
      (4L, "zzq4 zzq5 the"),
      (5L, posText + " appended"), (6L, "zzq9")))
    assert(merged === rows(recount(d + "-truth")),
           "merged counts != full recount over the logical corpus")
  }

  test("streamed ingest scores equal the in-query q161 scores") {
    val sf = "/root/testdata/sf0.001"
    val theta = graft.SparkEntry.queries("q161_nb_distill")(spark, sf)
      .select("theta").head().getLong(0)
    // batch truth from the self-contained in-query derivation
    val batch = Prep.nbDocScores(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

    val corpus = graft.Tables.documents(spark, sf)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(corpus: _*)
    val q = Prep.nbScoreStream(mem.toDF().toDF("doc_id", "text"),
                               spark, sf, theta)
      .writeStream.format("memory").queryName("nb_scores")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("nb_scores")
      .collect().map(r => (r.getLong(0),
                           (r.getLong(2), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(got.size === corpus.size, "stream dropped or duplicated documents")
    batch.foreach { case (id, sInt) =>
      val (gotS, gotBin, gotKeep) = got(id)
      assert(gotS === sInt, s"doc $id: stream s_int $gotS != batch $sInt")
      val bin = math.min(math.max(math.floor(sInt / 5e7), -10), 9).toLong
      assert(gotBin === bin)
      assert(gotKeep === (bin >= theta))
    }
  }
}
