package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Crawl.frontierStream]] — the live-crawler door. The streaming twin
  * must agree with the batch [[Crawl.frontier]] when fed the same
  * corpus in one micro-batch (same seen set, same robots, same caps,
  * same byte-order ranks), and across micro-batches its single
  * per-host state must do BOTH politeness jobs at once: a URL
  * discovered again in a later batch never re-emits, and total
  * emissions per host never exceed the cap — with state bounded at
  * `cap` hashes per host by construction.
  */
class FrontierStreamSpec extends AnyFunSuite with SparkSpec {

  private def page(id: Long, url: String, links: Seq[String]): String = {
    val html = links.zipWithIndex
      .map { case (l, i) => s"""<a href="$l">x$i</a>""" }.mkString(" ")
    s"""{"doc_id":$id,"url":"$url","text":"${html.replace("\"", "\\\"")}","lang":"en","ts":"2026-03-01T00:00:00"}"""
  }

  private def robotsLine(id: Long, host: String, body: String): String =
    s"""{"doc_id":$id,"url":"http://$host/robots.txt","text":"${body.replace("\n", "\\n")}","lang":"en","ts":"2026-03-01T00:00:00"}"""

  private def parsedOf(lines: Seq[String]): DataFrame = {
    import spark.implicits._
    Crawl.parseCrawl(lines.toDF("value"))
  }

  // a bloom sized far past the fixture (2^20 bits for <10 urls) so a
  // false positive cannot flake the parity assertion
  private def bloomOf(parsed: DataFrame): Array[Byte] =
    Crawl.seenUrlBloom(parsed, expectedItems = 1000L, numBits = 1L << 20)

  private def runStream(lines: Seq[Seq[String]], bloom: Array[Byte],
                        cap: Int, robots: Option[DataFrame],
                        window: Double = 0.0,
                        name: String = "frontier_out"): Set[(String, String, Long)] = {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[String]
    val fr = Crawl.frontierStream(
      Crawl.parseCrawl(mem.toDF().toDF("value")), bloom,
      perHostCap = cap, robots = robots, crawlDelayWindow = window)
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

  test("single batch: stream equals the batch frontier (seen set, robots gate, caps, ranks)") {
    val robotsBody = "User-agent: *\nDisallow: /private/"
    val lines = Seq(
      page(1, "http://a.com/1", Seq(
        "http://a.com/p1", "http://a.com/p2", "http://a.com/p3",
        "http://a.com/p4",            // 4 fresh on a.com; cap 3 drops p4
        "http://a.com/private/x",     // robots-disallowed
        "http://a.com/seen",          // captured below -> seen
        "http://b.org/x")),
      page(2, "http://a.com/seen", Seq("http://a.com/p1")), // dup discovery
      robotsLine(3, "a.com", robotsBody))
    val batchParsed = parsedOf(lines)
    val expected = Crawl.frontier(batchParsed, perHostCap = 3,
        robotsAgent = Some("graftbot")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // sanity on the fixture itself: the cap bit, robots bit, seen bit
    assert(expected === Set(
      ("a.com", "http://a.com/p1", 1L), ("a.com", "http://a.com/p2", 2L),
      ("a.com", "http://a.com/p3", 3L), ("b.org", "http://b.org/x", 1L)))
    val got = runStream(Seq(lines), bloomOf(batchParsed), 3,
      Some(Crawl.compiledRobots(batchParsed, "graftbot")),
      name = "frontier_parity")
    assert(got === expected)
  }

  test("seenUrlBloom on an empty corpus is the empty sketch, not a null") {
    import spark.implicits._
    val empty = Seq.empty[(Boolean, String)].toDF("corrupt", "url")
    assert(Crawl.seenUrlBloom(empty).isEmpty)
  }

  test("cross-batch: re-discoveries never re-emit, the budget holds across batches, rk continues") {
    val b1 = Seq(page(1, "http://s.com/1",
      Seq("http://a.com/p1", "http://a.com/p2")))
    val b2 = Seq(page(2, "http://s.com/2",
      Seq("http://a.com/p1",                      // dup of batch-1 emission
          "http://a.com/p3", "http://a.com/p4",
          "http://a.com/p5")))                    // over the cap=4 budget
    val got = runStream(Seq(b1, b2), Array.emptyByteArray, 4, None,
      name = "frontier_xbatch")
    assert(got === Set(
      ("a.com", "http://a.com/p1", 1L), ("a.com", "http://a.com/p2", 2L),
      ("a.com", "http://a.com/p3", 3L), ("a.com", "http://a.com/p4", 4L)))
  }

  test("crawl-delay tightens a declaring host's cap; silent hosts keep the full budget") {
    val robotsBody = "User-agent: *\nDisallow:\nCrawl-delay: 10"
    val lines = Seq(
      page(1, "http://x.net/1", Seq(
        "http://a.com/p1", "http://a.com/p2", "http://a.com/p3",
        "http://a.com/p4",
        "http://b.org/q1", "http://b.org/q2", "http://b.org/q3",
        "http://b.org/q4")),
      robotsLine(2, "a.com", robotsBody))
    val parsed = parsedOf(lines)
    // window 30 s / delay 10 s -> a.com may take 3; b.org keeps 8
    val got = runStream(Seq(lines), Array.emptyByteArray, 8,
      Some(Crawl.compiledRobots(parsed, "graftbot")), window = 30.0,
      name = "frontier_delay")
    val aCom = got.filter(_._1 == "a.com").map(_._2)
    val bOrg = got.filter(_._1 == "b.org").map(_._2)
    assert(aCom === Set("http://a.com/p1", "http://a.com/p2",
                        "http://a.com/p3"))
    assert(bOrg.size === 4)
    // and the batch door agrees on the tightened cap
    val batch = Crawl.frontier(parsed, perHostCap = 8,
        robotsAgent = Some("graftbot"), crawlDelayWindow = 30.0)
      .filter(col("host") === "a.com").collect().map(_.getString(1)).toSet
    assert(batch === aCom)
  }

  test("live door: robots in-stream — fail-open before arrival, gate after, newest wins, delay tightens") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[String]
    val fr = Crawl.frontierStreamLive(
      Crawl.parseCrawl(mem.toDF().toDF("value")),
      Array.emptyByteArray, agent = "graftbot",
      perHostCap = 8, crawlDelayWindow = 30.0)
    val q = fr.writeStream.format("memory").queryName("frontier_live")
      .outputMode("append").start()
    def emitted(): Set[(String, String, Long)] =
      spark.table("frontier_live").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    try {
      // batch 1: no robots captured yet -> fail-open, /private/ emits
      mem.addData(page(1, "http://s.com/1",
        Seq("http://a.com/p1", "http://a.com/private/x")))
      q.processAllAvailable()
      assert(emitted() === Set(
        ("a.com", "http://a.com/p1", 1L),
        ("a.com", "http://a.com/private/x", 2L)))
      // batch 2: robots arrives WITH candidates — rules apply to the
      // same batch's candidates (/private/y gated), prior emissions
      // stay consumed
      mem.addData(
        robotsLine(2, "a.com", "User-agent: *\nDisallow: /private/"),
        page(3, "http://s.com/2",
          Seq("http://a.com/p2", "http://a.com/private/y")))
      q.processAllAvailable()
      assert(emitted() === Set(
        ("a.com", "http://a.com/p1", 1L),
        ("a.com", "http://a.com/private/x", 2L),
        ("a.com", "http://a.com/p2", 3L)))
      // batch 3: a NEWER robots capture (later ts) clears the path
      // rules but declares Crawl-delay: 10 -> cap tightens to
      // floor(30/10) = 3, already spent -> p3 must NOT emit
      mem.addData(
        s"""{"doc_id":4,"url":"http://a.com/robots.txt","text":"User-agent: *\\nDisallow:\\nCrawl-delay: 10","lang":"en","ts":"2026-03-02T00:00:00"}""",
        page(5, "http://s.com/3", Seq("http://a.com/p3")))
      q.processAllAvailable()
      assert(emitted().size === 3, "tightened budget must stop emission")
    } finally q.stop()
  }

  test("saturation: 200 hosts over 3 batches — budget exact, rk dense, no emission past the cap") {
    // the bounded-state claim, exercised wide: every host saturates
    // its cap exactly once across batches, rk is dense 1..cap per
    // host, and re-offers of already-emitted URLs change nothing
    val cap = 4
    def batch(round: Int): Seq[String] = (0 until 200).map { h =>
      // 3 candidates per host per round, overlapping one URL with the
      // previous round (u{round} re-offers; u{round+1}, u{round+2} new)
      page(round * 1000 + h, s"http://src$round.net/$h",
        (round to round + 2).map(j => s"http://h$h.com/u$j"))
    }
    val got = runStream(Seq(batch(0), batch(1), batch(2)),
      Array.emptyByteArray, cap, None, name = "frontier_sat")
    val byHost = got.groupBy(_._1)
    // sources never emit (nothing links to them); 200 content hosts
    assert(byHost.keySet === (0 until 200).map(h => s"h$h.com").toSet)
    for ((h, rows) <- byHost) {
      // rounds offer u0..u4 total (5 distinct) but the cap stops at 4
      assert(rows.size === cap, s"$h emitted ${rows.size}")
      assert(rows.map(_._3) === (1 to cap).map(_.toLong).toSet,
             s"$h ranks not dense: ${rows.map(_._3)}")
      assert(rows.map(_._2).subsetOf(
        (0 to 4).map(j => s"http://$h/u$j").toSet))
    }
  }

  test("sitemap recursion: an index reaches its child's pages across micro-batches; robots hints join the candidates") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    def capOf(id: Long, url: String, body: String): String =
      s"""{"doc_id":$id,"url":"$url","text":"${body.replace("\"", "\\\"").replace("\n", "\\n")}","lang":"en","ts":"2026-03-01T00:00:00"}"""
    val mem = MemoryStream[String]
    val fr = Crawl.frontierStream(
      Crawl.parseCrawl(mem.toDF().toDF("value")),
      Array.emptyByteArray, perHostCap = 8, sitemaps = true)
    val q = fr.writeStream.format("memory").queryName("frontier_smrec")
      .outputMode("append").start()
    def emitted(): Set[String] =
      spark.table("frontier_smrec").collect().map(_.getString(1)).toSet
    try {
      // batch 1: robots declares the sitemap INDEX (name matches
      // nothing page-like) -> the hint itself becomes a candidate.
      // The GZIPPED sitemap hint survives too: 'gz' is an asset
      // extension, but sitemap-shaped .xml.gz URLs are exempt from
      // the skip (before round 20 the hint silently died here).
      mem.addData(capOf(1, "http://h.com/robots.txt",
        "User-agent: *\nDisallow:\n" +
          "Sitemap: http://h.com/maps/index.xml\n" +
          "Sitemap: http://h.com/maps/sitemap-big.xml.gz"))
      q.processAllAvailable()
      assert(emitted() === Set("http://h.com/maps/index.xml",
                               "http://h.com/maps/sitemap-big.xml.gz"))
      // batch 2: the fetched index (sniffs as <sitemapindex>; its
      // FILENAME matches the sitemap rlike in neither half) emits its
      // child sitemap as a fetch candidate — including a GZ child
      mem.addData(capOf(2, "http://h.com/maps/index.xml",
        "<sitemapindex><sitemap><loc>http://h.com/maps/a.xml</loc>" +
          "</sitemap><sitemap><loc>http://h.com/maps/sitemap2.xml.gz" +
          "</loc></sitemap></sitemapindex>"))
      q.processAllAvailable()
      assert(emitted() === Set("http://h.com/maps/index.xml",
                               "http://h.com/maps/sitemap-big.xml.gz",
                               "http://h.com/maps/a.xml",
                               "http://h.com/maps/sitemap2.xml.gz"))
      // batch 3: the fetched CHILD (name 'a.xml' — only the content
      // sniff can recognize it) yields its pages
      mem.addData(capOf(3, "http://h.com/maps/a.xml",
        "<urlset><url><loc>http://h.com/deep/1</loc></url>" +
          "<url><loc>http://h.com/deep/2</loc></url></urlset>"))
      q.processAllAvailable()
      assert(emitted() === Set("http://h.com/maps/index.xml",
        "http://h.com/maps/sitemap-big.xml.gz",
        "http://h.com/maps/a.xml", "http://h.com/maps/sitemap2.xml.gz",
        "http://h.com/deep/1", "http://h.com/deep/2"))
    } finally q.stop()
  }

  test("alias collapse: a redirect family resolved through the landed table spends one budget slot") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    // the landed redirect-resolution table: a 3-hop chain a->b->c->d,
    // built by the REAL batch resolver over canonical urls
    val redirects = Seq(
      ("http://h.com/a", "http://h.com/b"),
      ("http://h.com/b", "http://h.com/c"),
      ("http://h.com/c", "http://h.com/d"))
      .toDF("src_url", "dst_url")
    val urls = Seq("http://h.com/a", "http://h.com/b", "http://h.com/c")
      .toDF("url")
    val aliases = graft.operators.WebGraph
      .resolveRedirects(urls, redirects, maxHops = 4)
    val mem = MemoryStream[String]
    val fr = Crawl.frontierStream(
      Crawl.parseCrawl(mem.toDF().toDF("value")),
      Array.emptyByteArray, perHostCap = 8, aliases = Some(aliases))
    val q = fr.writeStream.format("memory").queryName("frontier_alias")
      .outputMode("append").start()
    try {
      // the chain's spellings arrive across batches — every one
      // resolves to the final target, which emits exactly once
      mem.addData(page(1, "http://s.net/1", Seq("http://h.com/a")))
      q.processAllAvailable()
      mem.addData(page(2, "http://s.net/2",
        Seq("http://h.com/b", "http://h.com/c", "http://h.com/x")))
      q.processAllAvailable()
      val got = spark.table("frontier_alias").collect()
        .map(r => (r.getString(1), r.getLong(2))).toSet
      assert(got === Set(("http://h.com/d", 1L), ("http://h.com/x", 2L)),
        s"a 3-hop alias family must consume exactly one slot: $got")
    } finally q.stop()
  }

  test("canonical twins collapse at the frontier: a page declaring a canonical spends one budget slot") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    // the landed alias table from the CANONICAL channel this time: a
    // prior crawl captured the AMP twin declaring its clean form — an
    // alias URL canonicalization alone can NEVER collapse (different
    // path), built by the REAL extractors end to end
    val captured = Seq(
      (1L, "http://h.com/p.amp",
       """<link rel="canonical" href="http://h.com/p">"""))
      .toDF("doc_id", "url", "text")
      .withColumn("corrupt", lit(false))
    val edges = Crawl.aliasEdges(
      captured.withColumn("http_status", lit(200))
        .withColumn("redirect", lit(null).cast("string")))
    // NOTE the frontier resolves CANONICALIZED candidate urls, so the
    // alias table must be keyed the same way (the streamCandidates
    // contract) — canonicalize both sides before resolution
    val canonEdges = edges.select(
      Urls.canonicalize(col("src_url")).as("src_url"),
      Urls.canonicalize(col("dst_url")).as("dst_url"), col("via"))
    val aliases = graft.operators.WebGraph.resolveAliasEdges(
      canonEdges.select(col("src_url").as("url")), canonEdges, 2)
    val mem = MemoryStream[String]
    val fr = Crawl.frontierStream(
      Crawl.parseCrawl(mem.toDF().toDF("value")),
      Array.emptyByteArray, perHostCap = 8, aliases = Some(aliases))
    val q = fr.writeStream.format("memory").queryName("frontier_canon")
      .outputMode("append").start()
    try {
      // both spellings of the page arrive as candidates — the
      // canonical-declared twin collapses to ONE emission
      mem.addData(page(1, "http://s.net/1",
        Seq("http://h.com/p.amp", "http://h.com/p")))
      q.processAllAvailable()
      val got = spark.table("frontier_canon").collect()
        .map(r => (r.getString(1), r.getLong(2))).toSet
      assert(got === Set(("http://h.com/p", 1L)),
        s"a canonical twin must spend one budget slot: $got")
    } finally q.stop()
  }

  test("live alias learning: a 301 family discovered mid-run collapses in the SAME running query") {
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
      org.apache.spark.sql.types.StructField("redirect",
        org.apache.spark.sql.types.StringType)))
    def row(id: Long, url: String, text: String, redirect: String,
            ts: String = "2026-03-01T00:00:00"): String = {
      val t = if (text == null) "null" else s""""$text""""
      val r = if (redirect == null) "null" else s""""$redirect""""
      s"""{"doc_id":$id,"url":"$url","text":$t,"ts":"$ts","redirect":$r}"""
    }
    val mem = MemoryStream[String]
    val parsed = mem.toDF().toDF("value")
      .withColumn("e", from_json(col("value"), schema))
      .selectExpr("false as corrupt", "e.doc_id as doc_id",
        "e.url as url", "e.text as text", "to_timestamp(e.ts) as ts",
        "e.redirect as redirect")
    val fr = Crawl.frontierStreamLive(parsed, Array.emptyByteArray,
      agent = "graftbot", perHostCap = 8)
    val q = fr.writeStream.format("memory").queryName("frontier_lalias")
      .outputMode("append").start()
    def emitted(): Seq[(String, Long)] =
      spark.table("frontier_lalias").collect()
        .filter(_.getString(0) == "h.com")
        .map(r => (r.getString(1), r.getLong(2))).sortBy(_._2).toSeq
    try {
      // batch 1: the crawl DISCOVERS a 301 a->b (the redirect target
      // rides as a candidate — that is discovery; the alias installs
      // into h.com's state in the same batch)
      mem.addData(row(1, "http://h.com/a", null, "http://h.com/b"))
      q.processAllAvailable()
      assert(emitted() === Seq(("http://h.com/b", 1L)))
      // batch 2: b turns out to 301 too, b->c — the second hop
      mem.addData(row(2, "http://h.com/b", null, "http://h.com/c",
                      ts = "2026-03-01T01:00:00"))
      q.processAllAvailable()
      assert(emitted() === Seq(("http://h.com/b", 1L),
                               ("http://h.com/c", 2L)))
      // batch 3: EVERY spelling of the family arrives as a candidate
      // — all three resolve through the LIVE map (a needs both hops)
      // onto the already-fetched final target: ZERO new slots spent,
      // in the same running query, no nightly landing in between
      mem.addData(row(3, "http://s.net/1",
        """<a href="http://h.com/a">x</a><a href="http://h.com/b">y</a>""" +
          """<a href="http://h.com/c">z</a>""", null,
        ts = "2026-03-01T02:00:00"))
      q.processAllAvailable()
      assert(emitted() === Seq(("http://h.com/b", 1L),
                               ("http://h.com/c", 2L)),
        "a discovered 301 family must spend no further budget slots")
    } finally q.stop()
  }

  test("file-based loop closure: readCrawlStream -> frontierStream -> parquet fetch list") {
    val dir = java.nio.file.Files.createTempDirectory("graft-frstream")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    java.nio.file.Files.write(in.resolve("s0.jsonl"),
      (page(1, "http://a.com/1",
        Seq("http://a.com/p1", "http://b.org/x")) + "\n").getBytes("UTF-8"))
    val fr = Crawl.frontierStream(
      Crawl.readCrawlStream(spark, in.toString),
      Array.emptyByteArray, perHostCap = 8)
    val q = Crawl.startFrontierSink(fr, dir.resolve("out").toString,
      dir.resolve("ckpt").toString)
    try q.awaitTermination(60000L) finally q.stop()
    val out = spark.read.parquet(dir.resolve("out").toString)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("a.com", "http://a.com/p1"),
                       ("b.org", "http://b.org/x")))
  }
}
