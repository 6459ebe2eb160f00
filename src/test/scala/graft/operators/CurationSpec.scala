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

  test("ingestStream dedups re-crawled content and scores in-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, java.sql.Timestamp)]
    val named = mem.toDF().toDF("doc_id", "text", "lang", "source", "ts")
    val q = Curation.ingestStream(named).writeStream
      .outputMode("append").format("memory").queryName("ingest_out").start()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    // goodText passes the quality gate (>=64 tokens, stopword-rich);
    // shortText fails it (8 tokens -> quality ~0.1)
    val goodText = Array.fill(32)("the value is").mkString(" ")
    val shortText = "tiny fragment of text with no stopwords here at"
    mem.addData((1L, goodText, "en", "crawl", ts))
    mem.addData((2L, goodText, "en", "crawl", ts))  // re-crawl, same content
    mem.addData((3L, shortText, "en", "crawl", ts))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ingest_out").collect()
    assert(out.length === 1, s"expected 1 kept doc, got ${out.length}")
    assert(out.head.getAs[Long]("doc_id") === 1L)
    assert(out.head.getAs[String]("split").nonEmpty)
  }

  test("incrementalNearDup flags a re-ingested corpus doc via stream-static band join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    // a doc copied verbatim from the corpus MUST collide in every band;
    // a novel doc shares no shingles with anything
    val src = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").filter(col("doc_id") === 7L).head()
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val out = TrainingData.incrementalNearDup(stream, spark, sf)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("incdup_out").start()
    mem.addData((900001L, src.getString(1)), (900002L, "utterly novel content here"))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("incdup_out")
      .select("doc_id", "matched_id", "jaccard").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(flagged.exists(f => f._1 == 900001L && f._2 == 7L && f._3 == 1.0),
           s"verbatim copy not flagged against its source: ${flagged.toSeq}")
    assert(!flagged.exists(_._1 == 900002L), "novel doc falsely flagged")
  }

  test("bloomFrontierFilter drops re-crawled corpus content in-stream, keeps new docs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    // the sketch is a build-once broadcast artifact: bytes cached per dir
    val bloom = Curation.corpusBloom(spark, sf)
    assert(bloom.length > 0)
    assert(Curation.corpusBloom(spark, sf) eq bloom,
           "corpus bloom must be cached per snapshot, not rebuilt")
    // the cache key is (session, dir): a different session must NOT be
    // served an artifact built by (and bound to) another session
    val other = spark.newSession()
    val bloomOther = Curation.corpusBloom(other, sf)
    assert(!(bloomOther eq bloom),
           "per-corpus cache leaked an artifact across sessions")
    assert(java.util.Arrays.equals(bloomOther, bloom),
           "same corpus must yield an identical sketch in any session")
    // every corpus text must hit the filter (no false negatives, ever)
    val corpus = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val survivors = Curation.bloomFrontierFilter(corpus, bloom).count()
    assert(survivors === 0, s"$survivors re-crawled docs slipped the sketch")
    // streaming: re-ingested corpus text dropped, novel text passes
    val src = corpus.filter(col("doc_id") === 7L).head().getString(1)
    val mem = MemoryStream[(Long, String)]
    val out = Curation.bloomFrontierFilter(mem.toDF().toDF("doc_id", "text"), bloom)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("bloom_frontier_out").start()
    mem.addData((900001L, src), (900002L, "utterly novel frontier content"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("bloom_frontier_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(900001L), "re-crawled doc must be pruned")
    assert(kept.contains(900002L), "novel doc must pass the frontier filter")
  }

  test("incrementalOverlap flags a copied span inside an otherwise-novel streamed doc") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-fpidx").toString + "/fp"
    TrainingData.buildFingerprintIndex(spark, sf, idx)
    // a 12-token span copied from corpus doc 7 (>= k+w-1 = 7 guarantees a
    // shared fingerprint) embedded in novel surroundings
    val span = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") === 7L).head().getAs[String]("text")
      .split(" ").take(12).mkString(" ")
    val plagiarized = s"totally fresh opening words here $span and a novel tail too"
    val mem = MemoryStream[(Long, String)]
    val out = TrainingData.incrementalOverlap(
      mem.toDF().toDF("doc_id", "text"), spark, idx)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("overlap_out").start()
    mem.addData((900001L, plagiarized), (900002L, "utterly novel words only nothing shared"))
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("overlap_out")
      .groupBy("doc_id", "matched_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.exists(h => h._1 == 900001L && h._2 == 7L && h._3 >= 1),
           s"copied span not flagged: ${hits.toSeq}")
    assert(!hits.exists(_._1 == 900002L), "novel doc falsely flagged")
  }

  test("persisted band index: micro-batches scan the index table, never re-shingle the corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    TrainingData.buildBandIndex(spark, sf, idx)
    val src = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").filter(col("doc_id") === 7L).head()
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val out = TrainingData.incrementalNearDup(stream, spark, sf, indexDir = Some(idx))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("incdup_idx_out").start()
    mem.addData((900001L, src.getString(1)))
    q.processAllAvailable()
    mem.addData((900002L, "utterly novel content here"))
    q.processAllAvailable()
    // the SECOND micro-batch's physical plan: static side must be a scan
    // of the persisted band table, not of documents.parquet
    val lastPlan = q match {
      case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
        w.streamingQuery.lastExecution.executedPlan.toString
      case other => fail(
        s"StreamingQuery is a ${other.getClass.getName}, not the " +
          "StreamingQueryWrapper this plan assertion expects — a Spark " +
          "upgrade moved the internal wrapper; update this cast.")
    }
    q.stop()
    assert(!lastPlan.contains("documents.parquet"),
           s"micro-batch still rescans the corpus:\n$lastPlan")
    assert(lastPlan.contains("graft-bandidx"),
           s"micro-batch does not scan the band index:\n$lastPlan")
    // semantics unchanged vs the index-less path
    val flagged = spark.table("incdup_idx_out")
      .select("doc_id", "matched_id", "jaccard").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(flagged.exists(f => f._1 == 900001L && f._2 == 7L && f._3 == 1.0),
           s"verbatim copy not flagged via the index: ${flagged.toSeq}")
    assert(!flagged.exists(_._1 == 900002L), "novel doc falsely flagged")
  }

  test("startCurationIngest lands keepers split-partitioned, exactly-once across epochs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val corpus = java.nio.file.Files.createTempDirectory("graft-stream-corpus").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val textA = Array.fill(32)("the value is").mkString(" ") // quality-pass
    val textB = Array.fill(40)("it is a fact").mkString(" ") // quality-pass
    val mem = MemoryStream[(Long, String, String, String, java.sql.Timestamp)]
    val named = mem.toDF().toDF("doc_id", "text", "lang", "source", "ts")
    // epoch 1
    mem.addData((1L, textA, "en", "crawl", ts))
    Curation.startCurationIngest(named, corpus, ckpt).awaitTermination()
    // epoch 2: one new doc + one re-crawl of epoch-1 content (must dedup
    // across epochs via checkpointed watermark state)
    mem.addData((2L, textB, "en", "crawl", ts), (3L, textA, "en", "crawl", ts))
    Curation.startCurationIngest(named, corpus, ckpt).awaitTermination()
    val out = spark.read.parquet(corpus)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L), s"expected exactly docs 1 and 2 once each, got $ids")
    assert(out.select("split").distinct().collect()
             .forall(r => Set("train", "val", "test")(r.getString(0))))
    assert(out.select("epoch").distinct().count() === 2, "each epoch owns its partition")
    // layout: epoch dirs at the top, split dirs under them
    val epochDirs = new java.io.File(corpus).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("epoch=")).toSeq
    assert(epochDirs.size === 2, s"epoch partitions: $epochDirs")
  }

  test("exportTrainingSet lands keepers split-partitioned, bins consistent with q122") {
    val out = java.nio.file.Files.createTempDirectory("graft-trainset").toString + "/set"
    Curation.exportTrainingSet(spark, sf, out)
    // layout: one hive partition per split that kept any docs
    val verdict = SparkEntry.queries("q122_training_set")(spark, sf)
      .filter(col("keep") === 1L).collect()
    assert(verdict.nonEmpty, "budget kept nothing — fixture too small")
    val splits = verdict.map(_.getAs[String]("split")).distinct.sorted
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === splits.toSeq.map(s => s"split=$s"),
           s"partition layout $dirs != kept splits $splits")
    // read-back rows equal the verdict's keepers, bins included
    val back = spark.read.parquet(out)
      .select("doc_id", "split", "n_tok", "first_bin", "last_bin", "n_bins")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                 r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val want = verdict
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"),
                 r.getAs[Long]("n_tok"), r.getAs[Long]("first_bin"),
                 r.getAs[Long]("last_bin"), r.getAs[Long]("n_bins"))).toSet
    assert(back === want, "exported rows diverge from the q122 verdict")
    // per split: budget respected, packing gapless from bin 0
    verdict.groupBy(_.getAs[String]("split")).foreach { case (sp, rows) =>
      val total = rows.map(_.getAs[Long]("n_tok")).sum
      assert(total <= Curation.SplitBudget, s"$sp over budget: $total")
      assert(rows.map(_.getAs[Long]("first_bin")).min === 0L,
             s"$sp packing must start at bin 0")
      assert(rows.map(_.getAs[Long]("last_bin")).max ===
               (total - 1) / Prep.PackBudget,
             s"$sp packing must be gapless (no empty trailing bins)")
    }
    // text rides along for the trainer
    assert(spark.read.parquet(out).columns.contains("text"))
  }

  test("packedSequences: full bins hold exactly 512 tokens; streams reassemble losslessly") {
    val seqs = Curation.packedSequences(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getSeq[String](4)))
    assert(seqs.nonEmpty)
    seqs.groupBy(_._1).foreach { case (sp, rows) =>
      val maxBin = rows.map(_._2).max
      rows.foreach { case (_, bin, n, toks) =>
        assert(n === toks.length.toLong)
        if (bin < maxBin)
          assert(n === Prep.PackBudget, s"$sp bin $bin not full: $n")
      }
      // bins are contiguous from 0
      assert(rows.map(_._2).sorted.toSeq === (0L to maxBin).toSeq,
             s"$sp has bin gaps")
      // the concatenated stream equals the kept docs' tokens in doc_id
      // order — no token lost, duplicated, or reordered by the slicing
      val stream = rows.sortBy(_._2).flatMap(_._4).toSeq
      val verdict = SparkEntry.queries("q122_training_set")(spark, sf)
        .filter(col("keep") === 1L && col("split") === sp)
        .select("doc_id").collect().map(_.getLong(0)).sorted
      val docsTok = graft.Tables.documents(spark, sf)
        .filter(col("doc_id").isin(verdict: _*))
        .select("doc_id", "text").collect()
        .sortBy(_.getLong(0)).flatMap(_.getString(1).split(" ")).toSeq
      assert(stream === docsTok, s"$sp reassembled stream diverges")
    }
    // the export sink lands the same sequences split-partitioned
    val out = java.nio.file.Files.createTempDirectory("graft-packed").toString + "/seqs"
    Curation.exportPackedSequences(spark, sf, out)
    val back = spark.read.parquet(out)
      .select("split", "bin", "n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(back === seqs.map(t => (t._1, t._2, t._3)).toSet,
           "exported sequences diverge from packedSequences")
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("split=")),
           "export must be split-partitioned")
  }

  test("q62 samples exactly k per stratum (or the whole stratum when smaller)") {
    val perLang = SparkEntry.queries("q62_stratified_sample")(spark, sf)
      .groupBy("lang").count().collect().map(r => r.getLong(1))
    assert(perLang.forall(_ <= 20))
    assert(perLang.nonEmpty)
  }

  test("invalidate releases per-corpus cached state and forces re-resolution") {
    // own corpus dir so cross-suite cache keys can't interfere with the
    // shared session's counters
    val dir = "/root/testdata/sf0.001"
    val bloomBefore = Curation.corpusBloom(spark, dir)
    val clustersBefore = Curation.dedupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    TrainingData.ivfIndex(spark, dir, 4)._2.count() // materialize the persist
    val fitsAfterBuild = TrainingData.ivfFits.get()
    TrainingData.ivfIndex(spark, dir, 4) // cached — no refit
    assert(TrainingData.ivfFits.get() === fitsAfterBuild)
    val idsBefore = spark.sparkContext.getPersistentRDDs.keySet
    Curation.invalidate(dir)
    val released = idsBefore -- spark.sparkContext.getPersistentRDDs.keySet
    // the IVF assignment unpins (cluster resolution no longer pins
    // executor memory at all — labels serve from the DerivedCache
    // parquet, which invalidate deletes from disk instead)
    assert(released.size >= 1,
           s"expected >=1 persisted RDDs released, got ${released.size}")
    assert(!new java.io.File(
             DerivedCache.artifactDir(dir, "cluster_labels_v1")).exists,
           "invalidate must drop the persisted cluster-label artifact")
    // re-resolution actually happens: the IVF index refits...
    TrainingData.ivfIndex(spark, dir, 4)
    assert(TrainingData.ivfFits.get() === fitsAfterBuild + 1,
           "ivfIndex did not refit after invalidate")
    // ...and clustering re-resolves to the same (deterministic) labels
    val clustersAfter = Curation.dedupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clustersAfter === clustersBefore)
    // the membership sketch also rebuilds (same content -> same bits)
    val bloomAfter = Curation.corpusBloom(spark, dir)
    assert(!(bloomAfter eq bloomBefore), "bloom cache must evict on invalidate")
    assert(java.util.Arrays.equals(bloomAfter, bloomBefore),
           "rebuilt sketch must be deterministic for an unchanged corpus")
  }

  test("postings index: probes scan only the index, push the term filter, and match the in-line rankings") {
    val idx = java.nio.file.Files.createTempDirectory("graft-postings")
      .toString + "/postings"
    TrainingData.buildPostingsIndex(spark, sf, idx)
    val terms = Seq("hash", "join", "scan", "window")
    val probe = TrainingData.bm25Search(spark, idx, terms)
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
           s"BM25 probe re-scans the corpus:\n$plan")
    assert(plan.contains("graft-postings"),
           s"BM25 probe does not scan the postings table:\n$plan")
    assert(plan.contains("In(term") || plan.contains("In(`term`"),
           s"term predicate not pushed to the postings scan:\n$plan")
    // serving path == in-line q98, row for row (same snapshot, same fp
    // spelling — bit-identical scores, same rounded-score/doc_id order)
    val inline = SparkEntry.queries("q98_bm25_rank")(spark, sf)
      .collect().map(_.toString)
    assert(probe.collect().map(_.toString).sameElements(inline),
           "postings-index BM25 diverged from the in-line ranking")
    // conjunctive probe == in-line q86 on the same snapshot
    val kw = TrainingData.searchKeywords(spark, idx, Seq("hash", "join", "scan"))
      .orderBy("doc_id").collect().map(_.toString)
    val q86 = SparkEntry.queries("q86_keyword_search")(spark, sf)
      .orderBy("doc_id").collect().map(_.toString)
    assert(kw.sameElements(q86),
           "postings-index keyword search diverged from the in-line q86")
  }

  test("q145: boundaries tile each q129 bin from offset 0, strictly increasing") {
    val bins = SparkEntry.queries("q129_packed_sequences")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = SparkEntry.queries("q145_pack_boundaries")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet === bins.keySet,
           "boundary table must cover exactly q129's bins")
    for (r <- rows) {
      val key = (r.getString(0), r.getLong(1))
      val bs = r.getString(3).split(" ").map(_.toLong).toSeq
      assert(bs.length === r.getLong(2).toInt)
      assert(bs.head === 0L, s"$key first piece must start the bin")
      assert(bs.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
             s"$key boundaries not strictly increasing")
      assert(bs.last < bins(key),
             s"$key boundary past the bin's token count")
    }
  }
}
