package graft.sources

import graft.SparkSpec
import graft.operators.WebGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scheduler signals composed INTO the streaming frontier doors
  * ([[Crawl.frontierStream]] / [[Crawl.frontierStreamLive]]): trap
  * verdicts (q190), rank budgets (q180), site/mirror families
  * (q183/q189), the asset-extension skip, the tiered exact seen set,
  * and per-epoch budget renewal. The batch tier computes these as
  * nightly artifacts; a LIVE crawler is exactly where a calendar trap
  * or clone farm burns budget fastest, so the stream door must
  * consume the same frames with the same semantics as the batch
  * compositions (q191's body for traps, budgetByRank for ranks,
  * familyCaps for families).
  */
class FrontierSchedulerSpec extends AnyFunSuite with SparkSpec {

  private def page(id: Long, url: String, links: Seq[String],
                   ts: String = "2026-03-01T00:00:00"): String = {
    val html = links.zipWithIndex
      .map { case (l, i) => s"""<a href="$l">x$i</a>""" }.mkString(" ")
    s"""{"doc_id":$id,"url":"$url","text":"${html.replace("\"", "\\\"")}","lang":"en","ts":"$ts"}"""
  }

  private def parsedOf(lines: Seq[String]): DataFrame = {
    import spark.implicits._
    Crawl.parseCrawl(lines.toDF("value"))
  }

  private def runStream(lines: Seq[Seq[String]], name: String,
                        mk: DataFrame => DataFrame)
      : Set[(String, String, Long)] = {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[String]
    val fr = mk(Crawl.parseCrawl(mem.toDF().toDF("value")))
    val q = fr.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      for (batch <- lines) {
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
  }

  // ------------------------------------------------------------------
  // Trap verdicts (q190 -> the stream door)
  // ------------------------------------------------------------------

  test("trap frame: a trap host emits exactly its probe; stream == the q191 batch door") {
    // trap.com serves 5 spellings of ONE template (expansion 5 >= 3);
    // honest.org serves 4 digit-free paths (expansion 1)
    val trapUrls = (1 to 5).map(i => s"http://trap.com/cal/page$i")
    val honestUrls = Seq("a", "b", "c", "d").map(p => s"http://honest.org/$p")
    val lines = Seq(page(1, "http://s.net/1", trapUrls ++ honestUrls))
    import spark.implicits._
    val cand = (trapUrls ++ honestUrls).toDF("canon_url")
    val verdicts = WebGraph.crawlTraps(cand, threshold = 3.0)
      .select("host", "verdict")
    assert(verdicts.filter(col("verdict") === "trap")
      .collect().map(_.getString(0)).toSet === Set("trap.com"))
    // the q191 batch composition over the same candidate set
    val expected = WebGraph.frontierFromSets(
        cand.limit(0).select(col("canon_url").as("url")),
        cand.select(col("canon_url").as("url")), perHostCap = 3)
      .join(verdicts.hint("shuffle_hash"), Seq("host"))
      .filter(col("rk") <=
        when(col("verdict") === "trap", 1L).otherwise(3L))
      .select("host", "url", "rk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = runStream(Seq(lines), "sched_trap",
      p => Crawl.frontierStream(p, Array.emptyByteArray, perHostCap = 3,
        trapVerdicts = Some(verdicts)))
    assert(got === expected)
    assert(got.count(_._1 == "trap.com") === 1,
           "a trap host must emit exactly its probe URL")
    assert(got.count(_._1 == "honest.org") === 3)
  }

  // ------------------------------------------------------------------
  // Rank budgets (q180 -> the stream door)
  // ------------------------------------------------------------------

  test("rank frame: caps split the budget rank-proportionally; unranked hosts fail open") {
    import spark.implicits._
    // budget 4 over ranks 3e12 : 1e12 -> caps 3 and 1 (exact integer)
    val ranks = Seq(("big.com", 3000000000000L),
                    ("small.org", 1000000000000L))
      .toDF("host", "rank_e12")
    val caps = WebGraph.rankCaps(ranks, budget = 4L)
    assert(caps.collect().map(r => (r.getString(0), r.getLong(2))).toSet
      === Set(("big.com", 3L), ("small.org", 1L)))
    val links = (1 to 4).flatMap(i => Seq(
      s"http://big.com/p$i", s"http://small.org/p$i",
      s"http://new.net/p$i"))
    val got = runStream(Seq(Seq(page(1, "http://s.net/1", links))),
      "sched_rank",
      p => Crawl.frontierStream(p, Array.emptyByteArray, perHostCap = 8,
        rankCaps = Some(caps)))
    assert(got.count(_._1 == "big.com") === 3)
    assert(got.count(_._1 == "small.org") === 1)
    // a host the rank table has never seen keeps its politeness cap
    assert(got.count(_._1 == "new.net") === 4)
  }

  test("health + backoff frames compose through the rank-cap slot: a dead host probes, a backing-off host emits nothing") {
    import spark.implicits._
    // q203's verdicts rendered as caps: dead -> probe 1, degraded ->
    // half cap; q202's active window -> cap 0 ("not yet" is explicit)
    val health = Seq(
      ("dead.com", 10L, 10L, 1.0, "dead"),
      ("flaky.org", 10L, 6L, 0.6, "degraded"),
      ("fine.net", 10L, 0L, 0.0, "ok"))
      .toDF("host", "n_captures", "n_err", "err_share", "verdict")
    val backoff = Seq(("wait.io", 3L, 2000L))
      .toDF("host", "n_backoffs", "backoff_until_s")
    val caps = WebGraph.healthCaps(health, perHostCap = 8L)
      .unionByName(WebGraph.backoffCaps(backoff, asofS = 1000L))
    assert(caps.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("dead.com" -> 1L, "flaky.org" -> 4L, "wait.io" -> 0L))
    val links = (1 to 6).flatMap(i => Seq(s"http://dead.com/p$i",
      s"http://flaky.org/p$i", s"http://wait.io/p$i",
      s"http://fine.net/p$i"))
    val got = runStream(Seq(Seq(page(1, "http://s.net/1", links))),
      "sched_health",
      p => Crawl.frontierStream(p, Array.emptyByteArray, perHostCap = 8,
        rankCaps = Some(caps)))
    assert(got.count(_._1 == "dead.com") === 1,
      "a dead host earns exactly its recovery probe")
    assert(got.count(_._1 == "flaky.org") === 4)
    assert(got.count(_._1 == "wait.io") === 0,
      "an active Retry-After window means zero fetches, not a probe")
    assert(got.count(_._1 == "fine.net") === 6, "healthy hosts fail open")
    // an EXPIRED backoff window drops out entirely — fail open
    assert(WebGraph.backoffCaps(backoff, asofS = 3000L).count() === 0)
  }

  test("live door: a 503 Retry-After pauses its host in the SAME query; a dying host collapses to its probe") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("http_status",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("retry_after",
        org.apache.spark.sql.types.StringType)))
    def row(id: Long, url: String, text: String, status: Integer,
            ra: String, ts: String): String = {
      val t = if (text == null) "null" else s""""$text""""
      val r = if (ra == null) "null" else s""""$ra""""
      s"""{"doc_id":$id,"url":"$url","text":$t,"ts":"$ts","http_status":$status,"retry_after":$r}"""
    }
    def linksTo(id: Long, urls: Seq[String], ts: String): String =
      row(id, s"http://s.net/$id",
        urls.map(u => s"<a href='$u'>x</a>").mkString, 200, null, ts)
    val mem = MemoryStream[String]
    val parsed = mem.toDF().toDF("value")
      .withColumn("e", org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.col("value"), schema))
      .selectExpr("false as corrupt", "e.doc_id as doc_id",
        "e.url as url", "e.text as text", "to_timestamp(e.ts) as ts",
        "e.http_status as http_status", "e.retry_after as retry_after")
    val fr = Crawl.frontierStreamLive(parsed, Array.emptyByteArray,
      agent = "graftbot", perHostCap = 8, healthMinCaptures = 4L)
    val q = fr.writeStream.format("memory").queryName("frontier_status")
      .outputMode("append").start()
    def hostRows(h: String): Int =
      spark.table("frontier_status").collect()
        .count(_.getString(0) == h)
    try {
      // batch 1: busy.io answers 503 + Retry-After 3600 at T0. Its
      // window is open until T0+1h on the EVENT clock.
      mem.addData(row(1, "http://busy.io/hot", "overloaded", 503,
                      "3600", "2026-03-01T00:00:00"))
      q.processAllAvailable()
      // batch 2: candidates INSIDE the window (T0+10m) are skipped
      // without spending a slot — in the same running query
      mem.addData(linksTo(2, Seq("http://busy.io/a", "http://busy.io/b"),
                          "2026-03-01T00:10:00"))
      q.processAllAvailable()
      assert(hostRows("busy.io") === 0,
        "an open Retry-After window means zero fetches")
      // batch 3: candidates PAST the window (T0+2h) emit normally
      mem.addData(linksTo(3, Seq("http://busy.io/a", "http://busy.io/b"),
                          "2026-03-01T02:00:00"))
      q.processAllAvailable()
      assert(hostRows("busy.io") === 2, "an expired window fails open")
      // dying.net: four straight 404s cross the observation floor
      // with share 1.0 — the NEXT batch's five candidates collapse
      // to the single recovery probe, live
      mem.addData((1 to 4).map(i =>
        row(10L + i, s"http://dying.net/p$i", "err body", 404, null,
            "2026-03-01T03:00:00")): _*)
      q.processAllAvailable()
      mem.addData(linksTo(20, (1 to 5).map(i => s"http://dying.net/new$i"),
                          "2026-03-01T04:00:00"))
      q.processAllAvailable()
      assert(hostRows("dying.net") === 1,
        "a dead host earns exactly its recovery probe, in-run")
    } finally q.stop()
  }

  test("live door: the Retry-After gate holds for the RESOLVED fetch target, not the spelling") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("http_status",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("retry_after",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("redirect",
        org.apache.spark.sql.types.StringType)))
    def row(id: Long, url: String, text: String, status: Integer,
            ra: String, redirect: String, ts: String): String = {
      val t = if (text == null) "null" else s""""$text""""
      val r = if (ra == null) "null" else s""""$ra""""
      val rd = if (redirect == null) "null" else s""""$redirect""""
      s"""{"doc_id":$id,"url":"$url","text":$t,"ts":"$ts","http_status":$status,"retry_after":$r,"redirect":$rd}"""
    }
    val mem = MemoryStream[String]
    val parsed = mem.toDF().toDF("value")
      .withColumn("e", org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.col("value"), schema))
      .selectExpr("false as corrupt", "e.doc_id as doc_id",
        "e.url as url", "e.text as text", "to_timestamp(e.ts) as ts",
        "e.http_status as http_status", "e.retry_after as retry_after",
        "e.redirect as redirect")
    // the spelling and target hosts share one budget group, so the
    // live 301 map can carry a candidate across them
    val fam = Seq(("sp.com", "tg.com"), ("tg.com", "tg.com"))
      .toDF("host", "component")
    val fr = Crawl.frontierStreamLive(parsed, Array.emptyByteArray,
      agent = "graftbot", perHostCap = 8, families = Some(fam))
    val q = fr.writeStream.format("memory").queryName("frontier_rback")
      .outputMode("append").start()
    def rows(): Seq[String] =
      spark.table("frontier_rback").collect().map(_.getString(1)).toSeq
    try {
      // batch 1 at T0: tg.com asks for an hour's pause, and a 301
      // sp.com/x -> tg.com/x is discovered (its target candidate is
      // itself inside the fresh window — nothing emits)
      mem.addData(
        row(1, "http://tg.com/hot", "overloaded", 503, "3600", null,
            "2026-03-01T00:00:00"),
        row(2, "http://sp.com/x", null, 301, null, "http://tg.com/x",
            "2026-03-01T00:00:00"))
      q.processAllAvailable()
      assert(rows().isEmpty, "the discovery candidate sits in the window")
      // batch 2 at T0+10m: the SPELLING is offered as a link. sp.com
      // never asked for a pause — but the fetch this emission buys
      // goes to tg.com, whose window is open: emitting it here is
      // exactly the violation the header forbids
      mem.addData(row(3, "http://s.net/1",
        "<a href='http://sp.com/x'>x</a>", 200, null, null,
        "2026-03-01T00:10:00"))
      q.processAllAvailable()
      assert(rows().isEmpty,
        "a free spelling must not smuggle a fetch into its target's open window")
      // batch 3 at T0+2h: the window expired — the same offer emits
      // the resolved target
      mem.addData(row(4, "http://s.net/2",
        "<a href='http://sp.com/x'>x</a>", 200, null, null,
        "2026-03-01T02:00:00"))
      q.processAllAvailable()
      assert(rows() === Seq("http://tg.com/x"),
        "past the window the resolved target emits normally")
    } finally q.stop()
  }

  // ------------------------------------------------------------------
  // Site/mirror families (q183/q189 -> the stream door)
  // ------------------------------------------------------------------

  test("family frame: a 3-host mirror family draws ONE shared budget across batches") {
    import spark.implicits._
    val fam = Seq(("m1.com", "m1.com"), ("m2.com", "m1.com"),
                  ("m3.com", "m1.com")).toDF("host", "component")
    val b1 = Seq(page(1, "http://s.net/1", Seq(
      "http://m1.com/a", "http://m1.com/b",
      "http://m2.com/a", "http://m2.com/b",
      "http://solo.org/a", "http://solo.org/b")))
    // batch 2 re-offers + the third mirror alias: budget already spent
    val b2 = Seq(page(2, "http://s.net/2", Seq(
      "http://m3.com/a", "http://m3.com/b", "http://solo.org/c")))
    val got = runStream(Seq(b1, b2), "sched_family",
      p => Crawl.frontierStream(p, Array.emptyByteArray, perHostCap = 3,
        families = Some(fam)))
    val famRows = got.filter(r => r._1.startsWith("m"))
    // ONE budget of 3 across all three aliases (byte-order: m1/a,
    // m1/b, m2/a land; m2/b and everything m3 finds it exhausted)
    assert(famRows.map(_._2) === Set("http://m1.com/a", "http://m1.com/b",
                                     "http://m2.com/a"))
    assert(famRows.map(_._3) === Set(1L, 2L, 3L))
    // a host outside every family keys on itself, budget untouched
    assert(got.count(_._1 == "solo.org") === 3)
  }

  // ------------------------------------------------------------------
  // Asset-extension skip
  // ------------------------------------------------------------------

  test("asset links never reach the budget (default on); asset crawls opt out; batch door agrees") {
    val links = Seq("http://a.com/img.jpg", "http://a.com/bundle.zip",
                    "http://a.com/paper.pdf", "http://a.com/page",
                    "http://a.com/style.css",
                    // a PATH-LESS page on a .zip gTLD host: the skip
                    // is path-anchored, so a TLD never reads as an
                    // archive and the domain's front page still crawls
                    "http://example.zip/")
    val lines = Seq(page(1, "http://s.net/1", links))
    // cap 2: if assets consumed budget, /page (byte-order after
    // /bundle.zip and /img.jpg) would starve
    val got = runStream(Seq(lines), "sched_assets",
      p => Crawl.frontierStream(p, Array.emptyByteArray, perHostCap = 2))
    assert(got === Set(("a.com", "http://a.com/page", 1L),
                       ("example.zip", "http://example.zip", 1L)))
    val optOut = runStream(Seq(lines), "sched_assets_in",
      p => Crawl.frontierStream(p, Array.emptyByteArray, perHostCap = 8,
        skipAssets = false))
    // canonicalization strips the root slash off the path-less link
    assert(optOut.map(_._2) ===
      (links.dropRight(1).toSet + "http://example.zip"))
    val batch = Crawl.frontier(parsedOf(lines), perHostCap = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(batch === Set(("a.com", "http://a.com/page"),
                         ("example.zip", "http://example.zip")))
  }

  // ------------------------------------------------------------------
  // Tiered exact seen set
  // ------------------------------------------------------------------

  test("seen tier: bloom-only loses false positives; bloom + exact anti-join loses ZERO") {
    val links = Seq("http://a.com/p1", "http://a.com/p2",
                    "http://a.com/p3", "http://a.com/p4")
    // p2 is genuinely captured; the others are new
    val lines = Seq(page(1, "http://s.net/1", links),
                    page(2, "http://a.com/p2", Seq.empty))
    val parsed = parsedOf(lines)
    // an ADVERSARIAL sketch: built over captures of every candidate
    // URL, so each genuinely-new candidate probes positive — the
    // deterministic worst case of the lossy fast path (a real FP,
    // just planted instead of probabilistic)
    val adv = Crawl.seenUrlBloom(
      parsedOf(links.zipWithIndex.map { case (u, i) =>
        page(10L + i, u, Seq.empty) } ++ lines),
      expectedItems = 1000L, numBits = 1L << 20)
    val bloomOnly = runStream(Seq(lines), "seen_bloom_only",
      p => Crawl.frontierStream(p, adv, perHostCap = 8))
    assert(bloomOnly.isEmpty,
      "the adversarial sketch must drop every candidate as probably-seen")
    // same sketch + the exact tier: every false positive survives the
    // anti-join; output == the batch door's exact anti-join frontier
    val exact = runStream(Seq(lines), "seen_exact",
      p => Crawl.frontierStream(p, adv, perHostCap = 8,
        seenExact = Some(Crawl.seenUrls(parsed))))
    val expected = Crawl.frontier(parsed, perHostCap = 8).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(exact === expected)
    assert(exact.map(_._2) ===
      Set("http://a.com/p1", "http://a.com/p3", "http://a.com/p4"))
  }

  test("seenUrlBloom refuses to inline a sketch past the byte bound") {
    val parsed = parsedOf(Seq(page(1, "http://a.com/1", Seq.empty)))
    val e = intercept[IllegalArgumentException] {
      Crawl.seenUrlBloom(parsed, expectedItems = 10L,
        numBits = 1L << 30, maxBytes = 1L << 20)
    }
    assert(e.getMessage.contains("inline bound"))
  }

  // ------------------------------------------------------------------
  // Budget renewal per event-time epoch
  // ------------------------------------------------------------------

  test("budget epochs: a host re-earns its cap each event-time window; within-epoch budget still binds") {
    val t0 = "2026-03-01T00:00:00" // epoch E
    val t1 = "2026-03-01T00:05:00" // +300 s -> epoch E+3 at 100 s
    val b1 = Seq(page(1, "http://s.net/1",
      Seq("http://a.com/p1", "http://a.com/p2", "http://a.com/p3"),
      ts = t0))
    // same epoch: budget spent, p3 stays starved
    val b2 = Seq(page(2, "http://s.net/2",
      Seq("http://a.com/p3"), ts = t0))
    // new epoch: fresh budget — p3 (still uncaptured -> a legitimate
    // re-offer) and p4 emit, p5 hits the renewed cap
    val b3 = Seq(page(3, "http://s.net/3",
      Seq("http://a.com/p3", "http://a.com/p4", "http://a.com/p5"),
      ts = t1))
    val got = runStream(Seq(b1, b2, b3), "sched_epochs",
      p => Crawl.frontierStream(p, Array.emptyByteArray, perHostCap = 2,
        budgetEpochS = 100L))
    assert(got === Set(
      ("a.com", "http://a.com/p1", 1L), ("a.com", "http://a.com/p2", 2L),
      ("a.com", "http://a.com/p3", 1L), ("a.com", "http://a.com/p4", 2L)))
  }

  // ------------------------------------------------------------------
  // The live door composes the same frames
  // ------------------------------------------------------------------

  test("live door: family shares one budget AND a member host's robots still gate inside the family") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val fam = Seq(("m1.com", "m1.com"), ("m2.com", "m1.com"))
      .toDF("host", "component")
    val mem = MemoryStream[String]
    val fr = Crawl.frontierStreamLive(
      Crawl.parseCrawl(mem.toDF().toDF("value")),
      Array.emptyByteArray, agent = "graftbot", perHostCap = 3,
      families = Some(fam))
    val q = fr.writeStream.format("memory").queryName("sched_live_fam")
      .outputMode("append").start()
    try {
      // m2's robots arrive first; m1 has none (fail open)
      mem.addData(
        s"""{"doc_id":1,"url":"http://m2.com/robots.txt","text":"User-agent: *\\nDisallow: /private/","lang":"en","ts":"2026-03-01T00:00:00"}""",
        page(2, "http://s.net/1", Seq(
          "http://m1.com/a", "http://m2.com/private/x",
          "http://m2.com/a", "http://m2.com/b")))
      q.processAllAvailable()
      val got = spark.table("sched_live_fam").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // byte-order across the family: m1/a, m2/a, m2/b (m2/private/x
      // is robots-gated by ITS host's rules and consumes nothing)
      assert(got === Set(
        ("m1.com", "http://m1.com/a", 1L),
        ("m2.com", "http://m2.com/a", 2L),
        ("m2.com", "http://m2.com/b", 3L)))
    } finally q.stop()
  }

  // ------------------------------------------------------------------
  // All frames at once — the composition a production door runs
  // ------------------------------------------------------------------

  test("capstone: robots + trap + rank + family + exact seen compose in one door across batches") {
    import spark.implicits._
    val robotsBody = "User-agent: *\nDisallow: /private/"
    val corpus = parsedOf(Seq(
      page(1, "http://seen.net/old", Seq.empty),
      s"""{"doc_id":2,"url":"http://m1.com/robots.txt","text":"${robotsBody.replace("\n", "\\n")}","lang":"en","ts":"2026-03-01T00:00:00"}"""))
    val seen = Crawl.seenUrls(corpus)
    val robots = Crawl.compiledRobots(corpus, "graftbot")
    val traps = Seq(("trap.com", "trap"), ("m1.com", "ok"),
                    ("m2.com", "ok"), ("solo.org", "ok"))
      .toDF("host", "verdict")
    val caps = Seq(("solo.org", 2L)).toDF("host", "cap")
    val fam = Seq(("m1.com", "m1.com"), ("m2.com", "m1.com"))
      .toDF("host", "component")
    val b1 = Seq(page(10, "http://s.net/1", Seq(
      "http://seen.net/old",        // exact-seen: dies in the anti-join
      "http://trap.com/cal/1", "http://trap.com/cal/2", // probe only
      "http://m1.com/private/x",    // robots: gated, costs nothing
      "http://m1.com/a", "http://m1.com/b",
      "http://solo.org/a", "http://solo.org/b",
      "http://solo.org/c",          // rank cap 2: starved
      "http://a.com/img.jpg")))     // asset: never reaches the budget
    // batch 2: the second mirror alias finds the family budget spent
    val b2 = Seq(page(11, "http://s.net/2", Seq(
      "http://m2.com/a", "http://trap.com/cal/3")))
    val got = runStream(Seq(b1, b2), "sched_capstone",
      p => Crawl.frontierStream(p, Array.emptyByteArray, perHostCap = 2,
        robots = Some(robots), seenExact = Some(seen),
        trapVerdicts = Some(traps), families = Some(fam),
        rankCaps = Some(caps)))
    assert(got === Set(
      ("trap.com", "http://trap.com/cal/1", 1L),    // probe, once
      ("m1.com", "http://m1.com/a", 1L),            // family budget...
      ("m1.com", "http://m1.com/b", 2L),            // ...fills here
      ("solo.org", "http://solo.org/a", 1L),
      ("solo.org", "http://solo.org/b", 2L)))       // rank cap 2
  }

  // ------------------------------------------------------------------
  // Plan pins: every frame is web-sized — none may broadcast
  // ------------------------------------------------------------------

  test("plan: robots/trap/rank/family frames and the exact-seen anti-join all ride the shuffle path") {
    import spark.implicits._
    // the streaming planner runs with AQE off, and the static
    // ReuseExchange rule (what the streaming door actually gets) only
    // shows in a non-adaptive plan — match that here
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val parsed = parsedOf(Seq(
      page(1, "http://s.net/1",
        Seq("http://a.com/p1", "http://a.com/p2")),
      page(2, "http://a.com/p1", Seq.empty)))
    val seen = Seq("http://a.com/p1").toDF("url")
    val robots = Seq(("a.com", "", 0.0))
      .toDF("host", "_robots_rules", "_robots_delay")
    val traps = Seq(("a.com", "ok")).toDF("host", "verdict")
    val caps = Seq(("a.com", 4L)).toDF("host", "cap")
    val fam = Seq(("a.com", "a.com")).toDF("host", "component")
    // adversarial sketch so the anti-join leg is non-empty in-plan
    val adv = Crawl.seenUrlBloom(parsed, expectedItems = 100L,
      numBits = 1L << 16)
    val gated = Crawl.gatedCandidates(
      Crawl.streamCandidates(parsed, adv, sitemaps = false,
        seenExact = Some(seen)),
      perHostCap = 8, robots = Some(robots), crawlDelayWindow = 0.0,
      trapVerdicts = Some(traps), families = Some(fam),
      rankCaps = Some(caps), budgetEpochS = 0L)
    val p = gated.queryExecution.executedPlan.toString
    // host/url-keyed frames grow with the web: the no-broadcast rule
    assert(!p.contains("BroadcastHashJoin"),
           s"a web-sized frame reached a broadcast join:\n$p")
    // 5 shuffle joins: seen anti, robots, trap, rank, family
    assert(p.split("ShuffledHashJoin").length - 1 >= 5,
           s"expected 5 shuffle-pinned joins:\n$p")
    assert(p.linesIterator.exists(l =>
             l.contains("ShuffledHashJoin") && l.contains("LeftAnti")),
           s"the exact-seen anti-join left the shuffle path:\n$p")
    // ONE candidate pass: the exact tier must not re-run the link
    // extraction per branch (the rejected union-split design did —
    // one Generate means one parse+explode per micro-batch)
    assert(p.split("Generate explode\\(extract_links").length - 1 === 1,
           s"the seen tier re-evaluates the candidate extraction:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("plan: the r19 alias and declared frames ride the shuffle path (both page-scale)") {
    import spark.implicits._
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val parsed = parsedOf(Seq(
        page(1, "http://s.net/1",
          Seq("http://a.com/p1", "http://a.com/p2"))))
      // alias table = resolveRedirects output: page-scale, must never
      // broadcast into the candidate projection
      val aliases = Seq(("http://a.com/p1", "http://a.com/final"))
        .toDF("url", "final_url")
      val cand = Crawl.streamCandidates(parsed, Array.emptyByteArray,
        sitemaps = false, aliases = Some(aliases))
      val pc = cand.queryExecution.executedPlan.toString
      assert(!pc.contains("BroadcastHashJoin"),
             s"the page-scale alias table reached a broadcast join:\n$pc")
      assert(pc.contains("ShuffledHashJoin"), pc)
      // declared-freshness frame in the refetch door: near-unique page
      // key — same rule (the rank join was already pinned in r18)
      val ranks = Seq(("a.com", 1000000000000L)).toDF("host", "rank_e12")
      val declared = Seq(("http://a.com/p1", "hourly"))
        .toDF("canon_url", "changefreq")
      // refetch frames carry validator columns (the WARC shape)
      val rparsed = Seq((false, 1L, "http://a.com/p1", "v1",
          java.sql.Timestamp.valueOf("2026-03-01 00:00:00"),
          null.asInstanceOf[String], null.asInstanceOf[String]))
        .toDF("corrupt", "doc_id", "url", "text", "ts",
              "last_modified", "etag")
      val rf = Crawl.refetchStream(rparsed, ranks,
        declared = Some(declared))
      val pr = rf.queryExecution.executedPlan.toString
      assert(!pr.contains("BroadcastHashJoin"),
             s"a page/host-scale refetch frame reached a broadcast:\n$pr")
      assert(pr.split("ShuffledHashJoin").length - 1 >= 2,
             s"expected declared + rank joins shuffle-pinned:\n$pr")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("live door: trap frame collapses a trap host to its probe") {
    import spark.implicits._
    val verdicts = Seq(("trap.com", "trap"), ("honest.org", "ok"))
      .toDF("host", "verdict")
    val got = runStream(Seq(Seq(page(1, "http://s.net/1", Seq(
        "http://trap.com/cal/page1", "http://trap.com/cal/page2",
        "http://honest.org/a", "http://honest.org/b")))),
      "sched_live_trap",
      p => Crawl.frontierStreamLive(p, Array.emptyByteArray,
        agent = "graftbot", perHostCap = 3,
        trapVerdicts = Some(verdicts)))
    assert(got.count(_._1 == "trap.com") === 1)
    assert(got.count(_._1 == "honest.org") === 2)
  }
}
