package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The continuous-crawl loop: startCorpusMaintenance lands each curated
  * micro-batch as a pure file append and the persisted cluster-label
  * artifact self-refreshes over exactly the appended slice. After the
  * second batch the labels must equal the known clustering of the grown
  * corpus — including a new min-id representative and a bridge doc
  * merging two previously-separate clusters — and the refresh must take
  * the DELTA path: every batch-1 corpus file is corrupted in place
  * (same name/len/mtime) before batch 2 runs, so a full re-resolve (or
  * any read of old corpus bytes) would throw.
  */
class CorpusMaintenanceSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // Each doc: 60 common + 2 cluster-tag + 2 doc-tag = 64 distinct tokens.
  // Quality = least(1, 64/64) * (0.5 + 0 stopwords) = 0.5 -> passes the
  // ingest gate (>= 0.5). Within-cluster Jaccard = 62/66 ~ .939 >= .9;
  // cross-cluster = 60/68 ~ .88 < .9; n_chars all equal (3-char tokens).
  private val c60 = (1 to 60).map(i => f"c$i%02d").mkString(" ")
  private def txt(ct: String, dt: String) = s"$c60 ${ct}1 ${ct}2 ${dt}1 ${dt}2"

  private val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private def row(id: Long, ct: String, dt: String) =
    (new java.sql.Timestamp(t0.getTime + id * 60000L),
     id, "web", txt(ct, dt), "en")

  test("two maintenance batches keep cluster labels current via the delta path") {
    implicit val sctx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-corpus-maint").toString
    val corpus = s"$base/corpus"
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, String, String)]
    def stream = mem.toDF().toDF("ts", "doc_id", "source", "text", "lang")
    def run(): Unit =
      Curation.startCorpusMaintenance(stream, corpus, s"$base/ckpt")
        .awaitTermination()

    // batch 1: cluster A {10, 11}, cluster B {30, 31}, singleton 20
    mem.addData(
      row(10L, "aa", "ad"), row(11L, "aa", "ae"),
      row(30L, "bb", "bd"), row(31L, "bb", "be"),
      row(20L, "ss", "sd"))
    run()
    def labels = Curation.dedupClusters(spark, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(labels == Set((10L, 10L, 1L), (11L, 10L, 0L),
                         (30L, 30L, 1L), (31L, 30L, 0L)),
           s"unexpected batch-1 clusters: $labels")
    val docsLanded = spark.read.parquet(s"$corpus/documents.parquet")
    assert(docsLanded.columns.toSet ==
             Set("doc_id", "source", "text", "lang", "n_chars", "epoch"),
           s"unexpected corpus schema: ${docsLanded.columns.mkString(",")}")
    assert(docsLanded.count() == 5L)

    // corrupt every batch-1 corpus file in place: batch 2's refresh must
    // come from the persisted index artifacts + the appended slice only
    val tableDir = new java.io.File(corpus, "documents.parquet")
    val parts = Option(tableDir.listFiles).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles).getOrElse(Array.empty))
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
                   !f.getName.startsWith("."))
    assert(parts.nonEmpty, "no batch-1 part files found to corrupt")
    parts.foreach { f =>
      val mtime = f.lastModified
      java.nio.file.Files.write(
        f.toPath, Array.fill[Byte](f.length.toInt)('x'.toByte))
      assert(f.setLastModified(mtime))
    }

    // batch 2: 5 joins A as its new min-id rep; 70 BRIDGES A and B
    mem.addData(row(5L, "aa", "af"), row(70L, "aa", "bb"))
    run()
    val merged = labels
    assert(merged == Set((5L, 5L, 1L), (10L, 5L, 0L), (11L, 5L, 0L),
                         (30L, 5L, 0L), (31L, 5L, 0L), (70L, 5L, 0L)),
           s"batch-2 labels diverged (delta merge broken?): $merged")
    Curation.invalidate(corpus) // evicts memos + the DerivedCache artifacts
  }
}
