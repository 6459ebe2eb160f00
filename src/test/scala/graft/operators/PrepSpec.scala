package graft.operators

import graft.SparkSpec
import graft.functions.Compress
import graft.functions.Compress.deflate_ratio
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the training-prep operators (q108-q113) beyond the
  * DuckDB oracles: packing-layout algebra, chunk coverage/overlap
  * geometry, deflate-signal behavior (no SQL oracle exists for q111),
  * and redaction completeness.
  */
class PrepSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("q108: packing layout is gapless and bin spans match token arithmetic") {
    val rows = q("q108_sequence_pack")
      .orderBy("source", "doc_id")
      .collect()
    assert(rows.length === 500)
    val bySrc = rows.groupBy(_.getString(0))
    for ((_, docs) <- bySrc) {
      var off = 0L
      for (r <- docs) {
        val (nTok, first, last, nBins) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(first === off / Prep.PackBudget)
        assert(last === (off + nTok - 1) / Prep.PackBudget)
        assert(nBins === last - first + 1)
        off += nTok
      }
    }
  }

  test("q109: chunks cover every token and overlap by exactly the stride gap") {
    val chunks = q("q109_doc_chunks").collect()
    val nTok = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet === nTok.keySet) // every doc chunked, none invented
    for ((doc, cs) <- byDoc) {
      val n = nTok(doc)
      val sorted = cs.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) === 0L)
      // chunk ci covers positions [ci*stride, ci*stride + chunk_tok)
      val covered = sorted.map { r =>
        val start = r.getLong(1) * Prep.ChunkStride
        (start, start + r.getLong(2))
      }
      assert(covered.head._1 === 0L)
      assert(covered.last._2 === n) // last chunk ends exactly at doc end
      covered.sliding(2).foreach {
        case Array((s1, e1), (s2, _)) =>
          assert(s2 === s1 + Prep.ChunkStride) // fixed stride
          assert(s2 < e1) // strictly overlapping windows
        case _ => ()
      }
    }
  }

  test("deflate_ratio: deterministic, bounded, and orders repetitive below prose") {
    val rep = UTF8String.fromString(("spam ham " * 200).trim)
    val prose = UTF8String.fromString(
      (1 to 200).map(i => s"w${i * 2654435761L % 9973}").mkString(" "))
    val r1 = Compress.deflateRatio(rep)
    val r2 = Compress.deflateRatio(rep)
    assert(r1 === r2) // deterministic
    assert(r1 > 0.0 && r1 < 0.1) // 2-word template compresses away
    val p = Compress.deflateRatio(prose)
    assert(p > r1 * 3) // diverse text is far less compressible
    assert(Compress.deflateRatio(UTF8String.fromString("")) === 1.0)
    // expression path (codegen) agrees with the direct call
    val viaExpr = spark.range(1).select(
      deflate_ratio(lit(("spam ham " * 200).trim))).head.getDouble(0)
    assert(viaExpr === r1)
  }

  test("q111: per-source rollup flags the corpus as highly compressible word-salad") {
    val rows = q("q111_compress_quality").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val avg = r.getDouble(2)
      assert(avg > 0.0 && avg < 1.0, s"ratio out of range: $avg")
      assert(r.getLong(1) === 25L)
    }
  }

  test("redactPii leaves no detectable PII behind") {
    val df = q("q113_pii_redact")
    assert(df.count() === 500)
    // counts: exactly one planted instance of each class per doc
    val bad = df.filter(
      col("n_email") =!= 1 || col("n_phone") =!= 1 || col("n_ip") =!= 1)
    assert(bad.count() === 0)
    // re-scan the REDACTED text: all three patterns must be gone
    val id = col("doc_id")
    val planted = concat(
      col("text"), lit(" contact user"), (id % 97).cast("string"),
      lit("@mail"), (id % 7).cast("string"),
      lit(".org call +1-555-"), lpad((id % 1000).cast("string"), 3, "0"),
      lit("-"), lpad(((id * 7) % 10000).cast("string"), 4, "0"),
      lit(" from "), (id % 223 + 1).cast("string"),
      lit("."), (id % 256).cast("string"),
      lit("."), ((id * 3) % 256).cast("string"),
      lit("."), ((id * 7) % 256).cast("string"))
    val red = graft.Tables.documents(spark, sf)
      .select(Prep.redactPii(planted).as("t"))
    val leftover = red.filter(
      col("t").rlike(Prep.EmailPat) || col("t").rlike(Prep.PhonePat) ||
        col("t").rlike(Prep.Ipv4Pat))
    assert(leftover.count() === 0)
    // and the placeholders are present
    assert(red.filter(!col("t").contains("<EMAIL>") ||
      !col("t").contains("<PHONE>") || !col("t").contains("<IP>")).count() === 0)
  }

  test("ingestStream(redactPii=true): redact-then-hash dedups re-crawls that differ only in PII") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, java.sql.Timestamp)]
    val named = mem.toDF().toDF("doc_id", "text", "lang", "source", "ts")
    val q = Curation.ingestStream(named, redactPii = true).writeStream
      .outputMode("append").format("memory").queryName("prep_ingest_out").start()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val page = Array.fill(32)("the value is").mkString(" ")
    // same page crawled twice with rotating injected PII — only the
    // session email/IP differ, so redact-then-hash must collapse them
    mem.addData((1L, page + " contact a@x.org from 10.1.2.3", "en", "crawl", ts))
    mem.addData((2L, page + " contact b@y.org from 10.9.9.9", "en", "crawl", ts))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("prep_ingest_out").collect()
    assert(out.length === 1, s"expected 1 kept doc after PII-blind dedup, got ${out.length}")
    val text = out.head.getAs[String]("text")
    assert(text.contains("<EMAIL>") && text.contains("<IP>"))
    assert(!text.contains("a@x.org") && !text.contains("10.1.2.3"))
  }

  test("chunkDocs chunks a crawl stream micro-batch by micro-batch (ingest composition)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, java.sql.Timestamp)]
    val named = mem.toDF().toDF("doc_id", "text", "lang", "source", "ts")
    val q = Prep.chunkDocs(Curation.ingestStream(named)).writeStream
      .outputMode("append").format("memory").queryName("prep_chunk_out").start()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    // 100 tokens -> two 64/48 windows: [0, 64) and [48, 100)
    val page = Array.fill(25)("the value is a").mkString(" ")
    mem.addData((1L, page, "en", "crawl", ts))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("prep_chunk_out")
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L))
    assert(out.map(_.getLong(2)).toSeq === Seq(64L, 52L))
    // stream chunks equal the batch spelling on the same doc
    val batch = Prep.chunkDocs(
      Seq((1L, page)).toDF("doc_id", "text")).orderBy("chunk_idx").collect()
    assert(out.map(_.toString).toSeq === batch.map(_.toString).toSeq)
  }

  test("q110: nll is finite and positive for every scored doc") {
    val rows = q("q110_bigram_lm_score").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val nll = r.getDouble(2)
      assert(!nll.isNaN && !nll.isInfinite && nll > 0.0)
    }
  }

  test("q130: planted shared passage yields one exact span in each carrier") {
    import spark.implicits._
    // 30 shared tokens → gram positions p..p+10 all duplicated → ONE
    // merged span of exactly 30 tokens in each carrier document.
    val shared = (0 until 30).map(i => s"dup$i").mkString(" ")
    def filler(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val a = filler("a", 25) + " " + shared + " " + filler("z", 25)
    val b = shared + " " + filler("b", 40)
    val c = filler("c", 80)
    val out = Prep.substringDedup(
      Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    for (r <- out) {
      assert(r.getLong(1) === 1L, "one maximal span")
      assert(r.getLong(2) === 30L, "span covers exactly the shared passage")
    }
    val share1 = out.find(_.getLong(0) == 1L).get.getDouble(3)
    assert(share1 === 30.0 / 80.0, "span share of the 80-token carrier")
  }

  test("q130: intra-doc repeat is caught; adjacency merges, gaps do not") {
    import spark.implicits._
    val run = (0 until 20).map(i => s"r$i").mkString(" ")
    // Back-to-back copies: duplicated gram positions 0 and 20 are
    // adjacent (p == prev + G) — one merged span covering the whole
    // 40-token doc.
    val adjacent = run + " " + run
    val out = Prep.substringDedup(Seq((7L, adjacent)).toDF("doc_id", "text"))
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 1L)
    assert(out.head.getLong(2) === 40L)
    assert(out.head.getDouble(3) === 1.0)
    // A 10-token unique gap keeps the occurrences as SEPARATE spans —
    // the gap tokens are not duplicated and must not be counted.
    val gap = (0 until 10).map(i => s"g$i").mkString(" ")
    val out2 = Prep.substringDedup(
      Seq((8L, run + " " + gap + " " + run)).toDF("doc_id", "text"))
      .collect()
    assert(out2.head.getLong(1) === 2L)
    assert(out2.head.getLong(2) === 40L)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q134 apply: the earlier carrier keeps the passage, the later loses it") {
    import spark.implicits._
    val shared = (0 until 30).map(i => s"dup$i").mkString(" ")
    def filler(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val a = filler("a", 25) + " " + shared + " " + filler("z", 25)
    val bTail = filler("b", 40)
    val out = Prep.substringDedupApply(
      Seq((1L, a), (2L, shared + " " + bTail), (3L, filler("c", 80)))
        .toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    // doc 1 carries the canonical occurrence: nothing removed
    assert(out(0).getLong(2) === 80L)
    assert(out(0).getString(3) === md5hex(a))
    // doc 2's copy is cut: span [0, 30) removed, the 40 filler tokens stay
    assert(out(1).getLong(2) === 40L)
    assert(out(1).getString(3) === md5hex(bTail))
    // doc 3 untouched
    assert(out(2).getLong(2) === 80L)
  }

  test("q134 apply: one copy survives period-1 repetition; exact dup doc empties") {
    import spark.implicits._
    // 50 identical tokens: every gram identical; canonical [0,20) is
    // protected, removable [1,50) — exactly the first G-token run survives
    val xs = Seq.fill(50)("x").mkString(" ")
    val uniq = (0 until 40).map(i => s"u$i").mkString(" ")
    val out = Prep.substringDedupApply(
      Seq((1L, xs), (2L, uniq), (3L, uniq)).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === Prep.SubstrG)
    assert(out(0).getString(3) ===
      md5hex(Seq.fill(Prep.SubstrG.toInt)("x").mkString(" ")))
    // doc 2 is canonical for all of doc 3's grams: doc 3 empties entirely
    assert(out(1).getLong(2) === 40L)
    assert(out(1).getString(3) === md5hex(uniq))
    assert(out(2).getLong(2) === 0L)
    assert(out(2).getString(3) === md5hex(""))
  }

  test("q139: full epochs are exact corpus copies; fractional epoch is a strict subset") {
    // the grant decomposes as planned = full * avail + rate * avail —
    // epochs 1..full must replicate the ENTIRE source (same doc count,
    // same token total, same digest as epoch 1) and the one fractional
    // epoch, if present, must be a proper hash-selected subset
    val plan = q("q136_epoch_plan").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val sourceStats = graft.Tables.documents(spark, sf)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("source").agg(count(lit(1)).as("nd"), sum("nt").as("tok"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = q("q139_epoch_plan_execute").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    assert(rows.nonEmpty)
    for ((src, epochs) <- rows.groupBy(_._1)) {
      val (avail, planned) = plan(src)
      val (nDocs, nTok) = sourceStats(src)
      val full = planned / avail
      val sorted = epochs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq,
             s"$src epochs not dense from 1")
      val (fullRows, partRows) = sorted.partition(_._2 <= full)
      for ((_, _, d, t, dg) <- fullRows) {
        assert(d === nDocs, s"$src full epoch is not a whole corpus copy")
        assert(t === nTok)
        assert(dg === fullRows.head._5, s"$src full-epoch digests differ")
      }
      assert(partRows.length <= 1, s"$src more than one fractional epoch")
      for ((_, _, d, t, _) <- partRows) {
        assert(d < nDocs && t < nTok,
               s"$src fractional epoch must be a proper subset")
      }
      // realized tokens track the grant: full part is exact, the sampled
      // remainder concentrates around rate*avail (loose 3-sigma-ish bound)
      val realized = sorted.map(_._4).sum
      val slack = math.max(600L, planned - full * avail)
      assert(math.abs(realized - planned) <= slack,
             s"$src realized $realized vs planned $planned (slack $slack)")
    }
  }

  test("q142: per-epoch positions dense; instances biject; epochs reshuffle differently") {
    val rows = q("q142_training_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every sampled (doc, epoch) instance appears exactly once
    val instances = Prep.epochSampledDocs(spark, sf)
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(t => (t._4, t._1)).toSet === instances)
    assert(rows.length === instances.size)
    // dense 0..n-1 positions within each (epoch, shard)
    for (((_, _), g) <- rows.groupBy(t => (t._1, t._2)))
      assert(g.map(_._3).sorted.toSeq === (0L until g.length).toSeq)
    // consecutive epochs must order the shared docs differently (the
    // reshuffle-each-epoch contract): compare doc sequences of two
    // epochs restricted to docs present in both
    val byEpoch = rows.groupBy(_._1)
    if (byEpoch.size >= 2) {
      val es = byEpoch.keys.toSeq.sorted.take(2)
      val o1 = byEpoch(es(0)).sortBy(t => (t._2, t._3)).map(_._4)
      val o2 = byEpoch(es(1)).sortBy(t => (t._2, t._3)).map(_._4)
      val shared = o1.toSet intersect o2.toSet
      assert(o1.filter(shared) !== o2.filter(shared),
             "epochs must not share an ordering")
    }
  }

  test("q143: buckets are nll-monotone and split token mass into ~thirds") {
    val rows = q("q143_ccnet_buckets").collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getLong(3), r.getString(4)))
    assert(rows.nonEmpty)
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    for ((lang, g) <- rows.groupBy(_._1)) {
      // monotone: sorting by nll never decreases the bucket
      val byScore = g.sortBy(_._2).map(t => order(t._4))
      assert(byScore.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
             s"$lang buckets not monotone in nll")
      // thirds at value granularity: each cut lands within one
      // straddling value's token mass of an exact third
      val tot = g.map(_._3).sum
      val maxVal = g.groupBy(_._2).values.map(_.map(_._3).sum).max
      val headTok = g.filter(_._4 == "head").map(_._3).sum
      val tailTok = g.filter(_._4 == "tail").map(_._3).sum
      assert(headTok <= tot / 3 && headTok + maxVal > tot / 3 - maxVal,
             s"$lang head share off: $headTok of $tot (maxVal $maxVal)")
      assert(tailTok >= tot - 2 * (tot / 3) - maxVal,
             s"$lang tail share off: $tailTok of $tot")
    }
  }

  test("q144: head kept whole, tail dropped, middle hash-sampled near half") {
    val rows = q("q144_ccnet_sample").collect()
      .map(r => (r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.filter(_._1 == "head").forall(_._2 == 1L))
    assert(rows.filter(_._1 == "tail").forall(_._2 == 0L))
    val mid = rows.filter(_._1 == "middle")
    if (mid.length >= 20) {
      val rate = mid.count(_._2 == 1L).toDouble / mid.length
      assert(rate > 0.25 && rate < 0.75,
             s"middle keep-rate $rate not near the 50% cutoff")
    }
  }

  test("q135: shard positions are a dense bijection, stable across partitionings") {
    val a = q("q135_shard_shuffle").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(a.length.toLong === nDocs, "every doc assigned exactly once")
    assert(a.map(_._1).distinct.length === a.length)
    // within each shard: positions are exactly 0..count-1
    for ((shard, rows) <- a.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
             s"shard $shard positions not dense")
    // repartitioning the input must not move a single doc
    val b = Prep.shardShuffle(
        graft.Tables.documents(spark, sf).repartition(7, col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sorted.toSeq === b.toSeq)
    // hash order breaks doc_id locality: consecutive positions in some
    // shard are non-consecutive doc_ids
    val byShard = a.groupBy(_._2).values.maxBy(_.length).sortBy(_._3).map(_._1)
    assert(byShard.sliding(2).exists(p => math.abs(p(1) - p(0)) > 1))
  }
}
