package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full staged funnel at ingest, wired:
  * [[Curation.startCorpusMaintenance]] with a [[Curation.FunnelGate]]
  * scores every arriving doc through all four q163 stages (length floor
  * → q32 quality → unigram-LM mean log-probability → tuned NB bin)
  * against the PERSISTED model layers and routes it — corpus or
  * quarantine — by the composed verdict. Pins: (1) stream verdicts ==
  * the batch q163 table doc-for-doc (kept set, quarantined set, and
  * each quarantined doc's exact batch bin AND first-rejecting stage);
  * (2) keepers ∪ quarantine == the stateless ingest verdict's
  * quality-passers (the gate reroutes, never drops); (3) ZERO NB model
  * derives in-stream across two epochs ([[Prep.nbDerives]], the
  * ivfFits pattern — the unigram layer rides the same build-once
  * closure, resolved before the first micro-batch).
  */
class FunnelGateSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("gated maintenance routes by the batch q163 funnel with zero in-stream derives") {
    implicit val sctx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-funnel-gate").toString
    val corpus = s"$base/corpus"

    // batch truth: the self-contained q163 table (model trained on the
    // full corpus, theta tuned inline) — the gate must reproduce its
    // verdict columns exactly on the same docs
    val batchRows = Prep.filterStack(spark, sf)
      .select("doc_id", "theta", "bin", "keep", "reject_stage")
      .collect()
    val theta = batchRows.head.getLong(1)
    val binOf = batchRows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val keepOf = batchRows.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val stageOf = batchRows.map(r => r.getLong(0) -> r.getString(4)).toMap

    val srcDocs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text", "lang")
      .collect()
      .map(r => (new java.sql.Timestamp(1767225600000L + r.getLong(0)),
                 r.getLong(0), r.getString(1), r.getString(2),
                 r.getString(3)))
      .toSeq
    // the stateless verdict decides which docs reach the funnel at all
    val passers = Curation.ingestVerdict(
        graft.Tables.documents(spark, sf).select("doc_id", "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectKeep = passers.filter(keepOf)
    val expectQuar = passers.filterNot(keepOf)
    assert(expectKeep.nonEmpty && expectQuar.nonEmpty,
           s"the funnel does not split sf0.001 (keep=${expectKeep.size}, " +
           s"quar=${expectQuar.size}) — the routing pin would be vacuous")

    // land BOTH model layers BEFORE the stream so the pin below counts
    // only in-stream derives
    Prep.nbClassCounts(spark, sf).count()
    Prep.sourceTermCounts(spark, sf).count()
    val derivesBefore = Prep.nbDerives.get()

    val mem = MemoryStream[(java.sql.Timestamp, Long, String, String, String)]
    def stream = mem.toDF().toDF("ts", "doc_id", "source", "text", "lang")
    def run(): Unit =
      Curation.startCorpusMaintenance(stream, corpus, s"$base/ckpt",
          refreshEvery = 0,
          funnelGate = Some(Curation.FunnelGate(modelDir = sf,
                                                theta = theta)))
        .awaitTermination()
    val (half1, half2) = srcDocs.splitAt(srcDocs.size / 2)
    mem.addData(half1: _*)
    run() // epoch 0
    mem.addData(half2: _*)
    run() // epoch 1

    assert(Prep.nbDerives.get() === derivesBefore,
           "the gate re-derived the NB model in-stream")

    val landed = spark.read.parquet(s"$corpus/documents.parquet")
    assert(landed.select("epoch").distinct().count() === 2L,
           "expected one epoch partition per maintenance run")
    val gotKeep = landed.select("doc_id").collect().map(_.getLong(0)).toSet
    val quar = spark.read.parquet(corpus + "_funnel_quarantine")
      .select("doc_id", "fs_bin", "fs_reject_stage")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(gotKeep === expectKeep,
           s"kept set diverged: missing=${(expectKeep -- gotKeep).take(5)} " +
           s"extra=${(gotKeep -- expectKeep).take(5)}")
    assert(quar.keySet === expectQuar,
           s"quarantine set diverged: missing=${(expectQuar -- quar.keySet).take(5)} " +
           s"extra=${(quar.keySet -- expectQuar).take(5)}")
    quar.foreach { case (id, (bin, stage)) =>
      assert(bin === binOf(id),
             s"doc $id quarantined with bin $bin != batch ${binOf(id)}")
      assert(stage === stageOf(id),
             s"doc $id attributed to stage $stage != batch ${stageOf(id)}")
    }
    Curation.invalidate(corpus)
  }

  test("funnelScorer's plan streams directly: update-mode verdicts == batch doc-for-doc") {
    // the scorer claims BATCH OR STREAM via the one-aggregation shape
    // (grouping-key convention, no post-aggregation self-join) — cover
    // the claim on a genuine streaming frame, not just foreachBatch
    val theta = Prep.filterStack(spark, sf).select("theta").head().getLong(0)
    val score = Prep.funnelScorer(spark, sf, theta)
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
                        r.getDouble(4), r.getLong(5), r.getLong(6),
                        r.getBoolean(11), r.getString(12)))
    val cols = Seq("doc_id", "source", "qi", "n_tokens", "lp4", "s_int",
                   "bin", "pass_len", "pass_quality", "pass_lm",
                   "pass_nb", "keep", "reject_stage")
    val batch = score(graft.Tables.documents(spark, sf)
        .select("doc_id", "source", "text"))
      .select(cols.head, cols.tail: _*).collect().map(key).toMap

    val corpus = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val (half1, half2) = corpus.splitAt(corpus.size / 2)
    mem.addData(half1: _*)
    mem.addData(half2: _*)
    val q = score(mem.toDF().toDF("doc_id", "source", "text"))
      .select(cols.head, cols.tail: _*)
      .writeStream.format("memory").queryName("funnel_verdicts")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("funnel_verdicts").collect().map(key).toMap
    assert(got.size === batch.size, "stream dropped or duplicated documents")
    batch.foreach { case (id, b) =>
      assert(got(id) === b, s"doc $id: stream verdict ${got(id)} != batch $b")
    }
  }

  test("q165 degrades to NULL post-side columns when the funnel eats the whole corpus") {
    // Observed on the mutated ScaleUp corpus: every doc fails the lm
    // gate, t_kept = 0, and the un-guarded spelling threw ANSI
    // DIVIDE_BY_ZERO. Construct the degenerate case deterministically:
    // positive-class docs (high qi) whose near-unique vocabulary fails
    // the lm gate, negative-class docs that fail the length floor —
    // both NB classes populated (the theta tuning and the class-prior
    // log-odds stay well-defined), yet ZERO docs survive. The report
    // must land pre-side numbers and NULL post_share/shift/weight.
    val base = java.nio.file.Files
      .createTempDirectory("graft-funnel-degenerate").toString
    // 64 tokens, 4 stopwords (qi = (0.5 + 4/64) * 10000 = 5625 >= hi
    // class 5500) and 60 doc-unique terms: with 6 such docs + shorts,
    // every unique term has p ~ 1/total, mean logp << -3.45 -> lm kill
    val posDocs = (0L until 6L).map { i =>
      val uniq = (0 until 60).map(j => s"w${i}_$j")
      (i, (Seq("the", "a", "of", "to") ++ uniq).mkString(" "),
       "en", s"src${i % 2}")
    }
    // 8 tokens: fails len (< 16) and qi <= 0.125 * 1.5e4 < lo class 3000
    val negDocs = (6L until 12L).map { i =>
      (i, (0 until 8).map(j => s"n${i}_$j").mkString(" "),
       "en", s"src${i % 2}")
    }
    (posDocs ++ negDocs).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$base/documents.parquet")

    val fs = Prep.filterStack(spark, base)
      .select("doc_id", "keep", "reject_stage").collect()
    assert(fs.length === 12 && fs.forall(!_.getBoolean(1)),
           "degenerate corpus must reject every doc")
    assert(fs.exists(_.getString(2) == "len") &&
             fs.exists(r => r.getString(2) == "lm" || r.getString(2) == "nb"),
           s"kills must span stages: ${fs.map(_.getString(2)).toSeq}")

    val shift = graft.SparkEntry
      .queries("q165_funnel_mixture_shift")(spark, base).collect()
    assert(shift.length === 2, "one row per source")
    shift.foreach { r =>
      assert(r.getLong(r.fieldIndex("kept_docs")) === 0L)
      assert(!r.isNullAt(r.fieldIndex("pre_share")),
             "pre-side must still report")
      for (c <- Seq("post_share", "shift", "resample_weight"))
        assert(r.isNullAt(r.fieldIndex(c)),
               s"$c must be NULL on a zero-kept corpus, got ${r.get(r.fieldIndex(c))}")
    }
    // the siblings must also survive the degenerate corpus (q168 with
    // NULL sampled_share/residual, not a throw)
    for (q <- Seq("q164_filter_funnel", "q166_funnel_ablation",
                  "q168_resample_audit", "q170_funnel_overlap"))
      assert(graft.SparkEntry.queries(q)(spark, base).collect().nonEmpty,
             s"$q threw or returned empty on the zero-kept corpus")
    // ... and the resample must yield an EMPTY sample, not a throw:
    // every r_int is NULL, so every membership test `u < rate` is false
    assert(graft.SparkEntry.queries("q167_funnel_resample")(spark, base)
             .collect().isEmpty,
           "q167 must return an empty sample on a zero-kept corpus")
    // the streaming thinner agrees: KNOWN sources of a zero-kept corpus
    // drop everything (the q167 semantics), while a source the funnel
    // never saw keeps (no enrichment evidence to thin by)
    val thin = Prep.resampleThinner(spark, base)
    val probe = Seq((0L, "src0"), (1L, "src1"), (2L, "never_seen"))
      .toDF("doc_id", "source")
    assert(thin(probe).collect().map(_.getString(1)).toSeq ===
             Seq("never_seen"),
           "thinner must drop known zero-kept sources and keep unknown ones")
  }
}
