package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The read-optimized corpus layout [[Curation.compactCorpus]] writes must
  * actually deliver its three promises: lossless rewrite, partition
  * pruning on lang, and quality-clustered files whose row-group stats a
  * quality-floor scan can skip on.
  */
class CompactionSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("compactCorpus: lossless, one file per lang, lang prunes, quality pushes down, files quality-sorted") {
    val out = java.nio.file.Files.createTempDirectory("graft-compact")
      .toString + "/corpus"
    Curation.compactCorpus(spark, sf, out)

    val src = graft.Tables.documents(spark, sf)
    val back = spark.read.parquet(out)
    // lossless: same rows, quality column added
    assert(back.count() === src.count())
    assert(back.columns.toSet === (src.columns.toSet + "quality"))

    // layout: hive lang= dirs, exactly one data file each at the default
    // filesPerLang = 1
    val root = new java.io.File(out)
    val langDirs = root.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirs.map(_.getName).sorted.toSeq ===
             Seq("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh"))
    langDirs.foreach { dir =>
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
             s"${dir.getName}: expected 1 compacted file, got ${files.length}")
    }

    // a lang predicate becomes a PARTITION filter (no data read outside
    // the partition), and a quality floor pushes down to the parquet scan
    val scan = back.filter(col("lang") === "en" && col("quality") >= 0.9)
    val plan = scan.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[isnotnull\\(lang#\\d+\\), \\(lang#\\d+ = en\\)\\]"
             .r.findFirstIn(plan).isDefined,
           s"lang predicate did not prune partitions:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(quality,0.9)"),
           s"quality floor not pushed to the scan:\n$plan")
    val filesRead = scan.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }).sum
    assert(filesRead === 1L, s"pruned scan read $filesRead files, expected 1")

    // within a file rows are quality-clustered (desc), so row-group
    // min/max on quality is tight — read the single-file partition in
    // file order and assert monotonicity
    val qs = spark.read.parquet(out + "/lang=en")
      .select("quality").collect().map(_.getDouble(0))
    assert(qs.nonEmpty)
    assert(qs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
           "compacted file is not quality-sorted")
  }

  test("compactInto: the compacted snapshot is a drop-in corpus dir for the whole engine") {
    val newDir = java.nio.file.Files.createTempDirectory("graft-corpus2").toString
    Curation.compactInto(spark, sf, newDir)

    // registry queries are layout-transparent: identical results on the
    // original file and the compacted partitioned directory — including
    // the EMBEDDINGS- and EVENTS-backed ones, which read the tables
    // compactInto copies alongside the rewritten documents
    for (q <- Seq("q32_text_quality", "q86_keyword_search", "q30_dedup_exact",
                  "q40_ann_brute", "q94_quantize_embeddings", "q69_funnel")) {
      val a = graft.SparkEntry.queries(q)(spark, sf)
        .collect().map(_.toString).sorted
      val b = graft.SparkEntry.queries(q)(spark, newDir)
        .collect().map(_.toString).sorted
      assert(a.sameElements(b), s"$q diverged on the compacted snapshot")
    }

    // index builders consume the compacted snapshot directly; the probe
    // matches the in-line ranking computed FROM that snapshot
    val idx = newDir + "/postings"
    TrainingData.buildPostingsIndex(spark, newDir, idx)
    val terms = Seq("hash", "join", "scan", "window")
    val probe = TrainingData.bm25Search(spark, idx, terms)
      .collect().map(_.toString)
    val inline = graft.SparkEntry.queries("q98_bm25_rank")(spark, newDir)
      .collect().map(_.toString)
    assert(probe.sameElements(inline),
           "postings probe diverged on the compacted snapshot")
  }
}
