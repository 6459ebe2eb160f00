package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The nightly runbook end-to-end on the small corpus: every stage
  * lands its artifact, both audit gates pass, and the report carries
  * every stage with positive rows. Then: seeded corruption of the
  * planner artifacts (a deleted order row, a doubled manifest row) is
  * named by the order audit — the condition under which Nightly.main
  * exits 1.
  */
class NightlySpec extends AnyFunSuite with SparkSpec {

  /** The nightly runs on a COPY of the small corpus: its DerivedCache
    * key is then unique to this run, so the report's artifact
    * freshness table is deterministic (the shared tmp cache can carry
    * artifacts other suites/sessions landed for the real sf0.001 dir,
    * with freshness depending on suite order).
    */
  private def copyCorpus(src: String): String = {
    val s = java.nio.file.Paths.get(src)
    val dst = java.nio.file.Files.createTempDirectory("graft-nightly-corpus")
    val walk = java.nio.file.Files.walk(s)
    try walk.forEach { p =>
      val t = dst.resolve(s.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
    dst.toString
  }

  test("Nightly with a WARC crawl dir: crawl artifacts land fresh, manifests land, night N+1 serves") {
    import spark.implicits._
    import sources.Crawl
    val corpus = copyCorpus("/root/testdata/sf0.001")
    // a small real WARC corpus: 5 hosts cross-linked, one trap host
    // serving one-template ?sid spellings
    val warc = java.nio.file.Files
      .createTempDirectory("graft-nightly-warc").toString
    val docs = ((1 to 20).map { i =>
      val host = s"h${i % 5}.com"
      val links =
        s"<a href='http://h${(i + 1) % 5}.com/p$i'>x</a>" +
          s"<a href='http://h${(i + 2) % 5}.com/q$i'>y</a>"
      // letter paths: an honest host's pages must not collapse onto
      // one digit-template (that is exactly what a TRAP looks like).
      // Captures spread over three DAYS so the due-queue's interval
      // channel (base 86400 s) has both due and not-yet-due pages.
      val path = ('a' + (i % 26)).toChar
      (i.toLong, s"http://$host/$path", links,
       java.sql.Timestamp.valueOf(
         s"2026-03-0${1 + (i % 3)} 0${i % 9}:00:00"))
    } ++ (21 to 32).map { i =>
      (i.toLong, s"http://trap.example/cal/$i?sid=$i", "<p>cal</p>",
       java.sql.Timestamp.valueOf("2026-03-01 01:00:00"))
    } :+ ((100L, "http://h0.com/maps/feed.xml",
      // a captured sitemap declaring a page changed AFTER its last
      // capture — the due-queue's lastmod channel (name matches
      // nothing; the content sniff must admit it)
      "<urlset><url><loc>http://h0.com/f</loc>" +
        "<lastmod>2026-03-09</lastmod></url></urlset>",
      java.sql.Timestamp.valueOf("2026-03-01 02:00:00"))) :+
      // an AMP twin declaring its canonical — the only capture that
      // knows http://h1.com/clean exists. The alias manifest must
      // land the pair, and the frontier must DISCOVER the clean form
      // through it: the sole inbound link points at the captured
      // (hence seen-dead) amp spelling
      ((101L, "http://h1.com/amp",
        "<link rel=\"canonical\" href=\"http://h1.com/clean\">amp body",
        java.sql.Timestamp.valueOf("2026-03-01 03:00:00"))) :+
      ((102L, "http://h2.com/linker",
        "<a href='http://h1.com/amp'>the amp spelling</a>" +
          // links into the dead and backing-off hosts planted below
          // (uncaptured pages, so only the health/backoff caps can
          // decide their frontier fate)
          (1 to 4).map(i =>
            s"<a href='http://down.example/new$i'>d$i</a>").mkString +
          "<a href='http://busy.example/other'>b</a>",
        java.sql.Timestamp.valueOf("2026-03-01 03:00:00"))) :+
      // the fetch-plan gates: an interval-due page whose host's
      // robots.txt has since DISALLOWED it (evicts from the plan —
      // "never"), and an interval-due page whose host later asked
      // for a pause via Retry-After (defers — "not yet", planted as
      // a raw 503 below)
      ((103L, "http://stale.example/old", "<p>old stale page</p>",
        java.sql.Timestamp.valueOf("2026-03-01 01:00:00"))) :+
      ((104L, "http://stale.example/robots.txt",
        "User-agent: *\nDisallow: /old",
        java.sql.Timestamp.valueOf("2026-03-01 01:00:00"))) :+
      ((105L, "http://throttle.example/page", "<p>throttled page</p>",
        java.sql.Timestamp.valueOf("2026-03-01 01:00:00")))
    ).toDF("doc_id", "url", "text", "ts")
    Crawl.writeWarc(docs, warc)
    // writeWarc emits 200s only — the error-serving hosts are crafted
    // raw records appended into the same corpus dir: down.example
    // answers SIX straight 404s (health verdict 'dead' -> one
    // recovery probe), busy.example answers a 503 with a Retry-After
    // window still open at the corpus' own as-of instant (cap 0)
    def rawRec(uri: String, statusLine: String, body: String,
               extra: Seq[String] = Seq.empty): Array[Byte] = {
      val block = s"$statusLine\r\nContent-Type: text/html\r\n" +
        extra.map(_ + "\r\n").mkString + "\r\n" + body
      val bb = block.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-03-01T04:00:00Z\r\n" +
        s"Content-Length: ${bb.length}\r\n\r\n").getBytes("UTF-8") ++
        bb ++ "\r\n\r\n".getBytes("UTF-8")
    }
    def gzBytes(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val os = new java.util.zip.GZIPOutputStream(bos)
      os.write(b); os.close()
      bos.toByteArray
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(warc, "errors.warc.gz"),
      (1 to 6).map(i => gzBytes(rawRec(s"http://down.example/n$i",
        "HTTP/1.1 404 Not Found", "<html>gone</html>")))
        .reduce(_ ++ _) ++
      gzBytes(rawRec("http://busy.example/hot",
        "HTTP/1.1 503 Service Unavailable", "overloaded",
        Seq("Retry-After: 2592000"))) ++
      // throttle.example's pause rides a DIFFERENT path than its due
      // page: the window is host-level, the due verdict page-level
      gzBytes(rawRec("http://throttle.example/api",
        "HTTP/1.1 503 Service Unavailable", "overloaded",
        Seq("Retry-After: 2592000"))))
    val out = java.nio.file.Files
      .createTempDirectory("graft-nightly-crawl").toString
    val report = Nightly.run(spark, corpus, out, Some(warc))
    assert(report.contains("\"audit_violations\":0"), report)
    for (st <- Seq("crawl_edges", "crawl_ranks", "crawl_traps",
                   "crawl_health", "crawl_aliases", "crawl_frontier",
                   "crawl_refetch", "crawl_fetch_plan"))
      assert(report.contains(s""""stage":"$st""""), s"missing stage $st")
    // the crawl-tier freshness table rides the report, all fresh
    assert(report.contains("\"crawl_artifacts\":[{"), report)
    val crawlSect = report.split("\"crawl_artifacts\":")(1)
    assert(crawlSect.contains("\"fresh\":true") &&
           !crawlSect.contains("\"fresh\":false"), crawlSect)
    for (a <- Seq("crawl_link_edges_v1", "crawl_host_rank_v1",
                  "crawl_trust_rank_v1", "crawl_trap_verdicts_v1"))
      assert(crawlSect.contains(s""""artifact":"$a""""), crawlSect)
    // the manifests landed and carry real content
    val verdicts = spark.read.parquet(s"$out/crawl/trap_verdicts")
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(verdicts("trap.example") === "trap")
    assert(verdicts.count(_._2 == "ok") >= 5)
    val frontier = spark.read.parquet(s"$out/crawl/frontier")
    assert(frontier.count() > 0)
    // the trap host's frontier collapsed to its probe
    assert(frontier.filter(col("host") === "trap.example").count() <= 1)
    // the alias manifest landed the canonical declaration, and the
    // frontier DISCOVERED the clean form through it: the only inbound
    // link names the captured amp spelling, which is seen-dead — only
    // alias resolution can surface the declared target
    val aliases = spark.read.parquet(s"$out/crawl/aliases")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(aliases("http://h1.com/amp") === "http://h1.com/clean")
    val h1 = frontier.filter(col("host") === "h1.com")
      .collect().map(_.getString(1)).toSet
    assert(h1.contains("http://h1.com/clean"),
      s"the canonical target must be discovered through the alias: $h1")
    assert(!h1.contains("http://h1.com/amp"),
      "the captured amp spelling must not re-enter the frontier")
    // the health and backoff manifests landed with the planted
    // verdicts, and the frontier composed them into per-host caps:
    // the dead host keeps ONE recovery probe of its four unseen
    // links; the host inside its Retry-After window gets nothing
    val health = spark.read.parquet(s"$out/crawl/health")
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(health("down.example") === "dead", health.toString)
    assert(health("h0.com") === "ok")
    val backoff = spark.read.parquet(s"$out/crawl/backoff")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(backoff.keySet === Set("busy.example", "throttle.example"))
    assert(frontier.filter(col("host") === "down.example").count() === 1,
      "a dead host earns exactly its recovery probe")
    assert(frontier.filter(col("host") === "busy.example").count() === 0,
      "an open Retry-After window means zero fetches")
    // the fetch plan composes the due queue with the validators and
    // the two host-level gates: robots disallow EVICTS (stale
    // .example/old is interval-due but its host's current robots.txt
    // forbids it — the one evicted row), an open Retry-After window
    // only ANNOTATES (throttle.example/page keeps its due verdict,
    // not_before_s carries the window's expiry)
    val plan = spark.read.parquet(s"$out/crawl/fetch_plan")
    val dueRows = spark.read.parquet(s"$out/crawl/due_queue")
      .select("canon_url").collect().map(_.getString(0)).toSet
    assert(dueRows.contains("http://stale.example/old"),
      s"the robots-blocked page must still be DUE: $dueRows")
    val planRows = plan.select("canon_url").collect()
      .map(_.getString(0)).toSet
    assert(!planRows.contains("http://stale.example/old"),
      "a page the host's current robots.txt forbids must leave the plan")
    assert(plan.count() === dueRows.size - 1,
      "the plan is the due queue minus the robots-evicted row")
    assert(plan.columns.toSet === Set("canon_url", "channel",
      "if_modified_since", "if_none_match", "conditional",
      "not_before_s"))
    val throttled = plan
      .filter(col("canon_url") === "http://throttle.example/page")
      .collect()
    assert(throttled.length === 1, "the throttled page stays due")
    val expectNb = java.time.Instant.parse("2026-03-01T04:00:00Z")
      .getEpochSecond + 2592000L
    assert(throttled.head.getAs[Long]("not_before_s") === expectNb,
      "not_before_s is the host's requested window expiry")
    assert(plan.filter(col("canon_url") === "http://h0.com/f" &&
        col("not_before_s").isNull).count() === 1,
      "a host that never asked for a pause drains unannotated")
    assert(spark.read.parquet(s"$out/crawl/refetch_queue").count() > 0)
    // the actionable work list: interval-due pages (captured days
    // before the snapshot's as-of) plus the sitemap-declared page
    val dq = spark.read.parquet(s"$out/crawl/due_queue")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dq.nonEmpty, "the due queue must carry interval-due pages")
    assert(dq.values.toSet.subsetOf(
      Set("interval", "cache_control", "lastmod", "both")))
    assert(dq.contains("http://h0.com/f") &&
           dq("http://h0.com/f") != "interval",
      s"the declared-newer page must be due on the lastmod channel: $dq")
    assert(dq.valuesIterator.contains("interval"),
      s"day-1 captures must be interval-due at the day-3 as-of: $dq")
    // night N+1 pays SERVE cost: the derive counters do not move —
    // edges, ranks, AND the frontier/refetch manifests (the two
    // full-corpus gunzip+parse passes the review pass moved behind
    // DerivedCache)
    val e0 = operators.WebGraph.linkEdgeDerives.get()
    val r0 = operators.WebGraph.rankDerives.get()
    val m0 = operators.WebGraph.crawlManifestDerives.get()
    val out2 = java.nio.file.Files
      .createTempDirectory("graft-nightly-crawl2").toString
    val report2 = Nightly.run(spark, corpus, out2, Some(warc))
    assert(report2.contains("\"audit_violations\":0"), report2)
    assert(operators.WebGraph.linkEdgeDerives.get() === e0,
           "night N+1 re-derived the crawl edge table")
    assert(operators.WebGraph.rankDerives.get() === r0,
           "night N+1 re-derived a rank table")
    assert(operators.WebGraph.crawlManifestDerives.get() === m0,
           "night N+1 re-parsed the corpus for a manifest")
    // the per-night outDir copies still land from the served artifact
    for (a <- Seq("trap_verdicts", "frontier", "refetch_queue"))
      assert(spark.read.parquet(s"$out2/crawl/$a").count() > 0)
  }

  test("Nightly.run lands every artifact and the audit gate is clean") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-nightly-spec").toString
    val report = Nightly.run(spark, copyCorpus("/root/testdata/sf0.001"), out)
    assert(report.contains("\"audit_violations\":0"), report)
    for (a <- Seq("curated", "training_set", "shards", "bounds",
                  "plan", "manifest", "order",
                  "anneal_plan", "anneal_manifest", "source_stats"))
      assert(spark.read.parquet(s"$out/$a").count() > 0, s"$a is empty")
    // the health stage lands every audit-family table beside report.json
    for (q <- Nightly.HealthQueries)
      assert(spark.read.parquet(s"$out/health/$q").count() > 0,
             s"health table $q is empty")
    // report on disk matches what run() returned
    val disk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/report.json")), "UTF-8").trim
    assert(disk == report)
    for (st <- Seq("curate", "training_set", "shards", "bounds",
                   "epoch_plan", "manifest", "anneal", "training_order",
                   "health", "audit"))
      assert(report.contains(s""""stage":"$st""""), s"missing stage $st")
    // the DerivedCache freshness table rides the report: after a clean
    // night over an unchanged corpus, artifacts serve (fresh) and
    // nothing is pending a rebuild — the next run's derive bill is
    // visible before it is paid. (Staleness flagging is pinned in
    // DerivedCacheSpec's lifecycle-disambiguation test.)
    assert(report.contains("\"artifacts\":[{"),
           "report must carry the DerivedCache freshness table")
    assert(report.contains("\"fresh\":true"), report)
    assert(!report.contains("\"fresh\":false"),
           s"clean run over an unchanged corpus reports a stale artifact: $report")

    // ---- seeded corruption: the order audit names each damage ----
    val plan = s"$out/plan"; val man = s"$out/manifest"; val ord = s"$out/order"
    def audits(p: String, m: String, o: String) =
      operators.Prep.auditTrainingOrder(spark, p, m, o)
        .collect().map(r => (r.getString(2), r.getString(0), r.getLong(1)))

    // a DELETED order row: drop one (epoch, shard, pos) instance
    val o0 = spark.read.parquet(ord)
    val victim = o0.orderBy("epoch", "shard", "pos").limit(1).collect()(0)
    val (vE, vS) = (victim.getAs[Long]("epoch"), victim.getAs[Long]("shard"))
    o0.filter(!(col("epoch") === vE && col("shard") === vS &&
                col("pos") === victim.getAs[Long]("pos")))
      .write.mode("overwrite").parquet(s"$out/order_hole")
    val vHole = audits(plan, man, s"$out/order_hole")
    assert(vHole.exists(_._1 == "pos_density"),
           s"deleted order row not named:\n${vHole.mkString("\n")}")
    assert(vHole.exists(v => v._1 == "order_manifest_docs" && v._3 == vE),
           s"order/manifest doc count drift not named:\n${vHole.mkString("\n")}")
    assert(vHole.exists(v => v._1 == "order_manifest_digest" && v._3 == vE),
           s"order/manifest digest drift not named:\n${vHole.mkString("\n")}")

    // a DOUBLED manifest row: one (source, epoch) manifest appears twice
    val m0 = spark.read.parquet(man)
    m0.unionByName(m0.limit(1))
      .write.mode("overwrite").parquet(s"$out/manifest_dup")
    val vDup = audits(plan, s"$out/manifest_dup", ord)
    assert(vDup.exists(_._1 == "manifest_dup"),
           s"doubled manifest row not named:\n${vDup.mkString("\n")}")

    // and a swapped doc_id with IDENTICAL token count: counts balance,
    // only the digest can catch it
    val swapped = o0.withColumn("doc_id",
        when(col("epoch") === vE && col("shard") === vS &&
             col("pos") === victim.getAs[Long]("pos"),
             col("doc_id") + 1000000L).otherwise(col("doc_id")))
    swapped.write.mode("overwrite").parquet(s"$out/order_swap")
    val vSwap = audits(plan, man, s"$out/order_swap")
    assert(vSwap.exists(v => v._1 == "order_manifest_digest" && v._3 == vE),
           s"swapped doc_id not named by digest:\n${vSwap.mkString("\n")}")
    assert(!vSwap.exists(_._1 == "order_manifest_docs"),
           "counts should balance in the swap scenario")

    // ---- anneal chain: grant-envelope and digest violations ----
    val aPlan = s"$out/anneal_plan"; val aMan = s"$out/anneal_manifest"
    val stats = s"$out/source_stats"
    def aAudit(m: String) =
      operators.Prep.auditAnnealExecute(spark, aPlan, m, stats)
        .collect().map(r => (r.getString(2), r.getString(0), r.getLong(1)))
    assert(aAudit(aMan).isEmpty, "clean anneal chain must audit clean")
    val m0a = spark.read.parquet(aMan)
    val firstA = m0a.orderBy("source", "epoch").limit(1).collect()(0)
    val (aS, aE) = (firstA.getString(0), firstA.getAs[Long]("epoch"))
    // n_tokens pushed above the grant envelope: over-delivery
    m0a.withColumn("n_tokens",
        when(col("source") === aS && col("epoch") === aE,
             col("n_tokens") + 100000000L).otherwise(col("n_tokens")))
      .write.mode("overwrite").parquet(s"$out/anneal_over")
    val vOver = aAudit(s"$out/anneal_over")
    assert(vOver.exists(v => v._1 == "grant_tokens" && v._2 == aS),
           s"over-delivery not named:\n${vOver.mkString("\n")}")
    // a flipped full-copy digest: the cross-manifest identity breaks.
    // The flip must land on a grant that INCLUDES a full corpus copy
    // (alloc_tok DIV n_s >= 1) AND whose source has at least two such
    // manifests — the only regime where the pairwise identity bites —
    // so derive that victim from the landed plan + stats, and require
    // it to exist (this corpus's budget grants full copies)
    val nS = spark.read.parquet(stats)
      .select("source", "avail_tokens").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullPairs = spark.read.parquet(aPlan).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter { case (src, _, alloc) => alloc / nS(src) >= 1L }
    val digestable = fullPairs.groupBy(_._1).filter(_._2.length >= 2)
    assert(digestable.nonEmpty,
           s"need a source with >=2 full-copy grants to exercise the " +
             s"digest identity; plan grants: ${fullPairs.mkString(", ")}")
    val (dS, dE, _) = digestable.head._2.head
    m0a.withColumn("doc_digest",
        when(col("source") === dS && col("epoch") === dE,
             col("doc_digest") + 1L).otherwise(col("doc_digest")))
      .write.mode("overwrite").parquet(s"$out/anneal_digflip")
    val vDig = aAudit(s"$out/anneal_digflip")
    assert(vDig.exists(v => v._1 == "full_copy_digest" && v._2 == dS),
           s"digest flip not named:\n${vDig.mkString("\n")}")
  }
}
