package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The recrawl EXECUTION tier: [[Crawl.trapStream]] (live q190
  * verdicts) and [[Crawl.refetchStream]] / [[Crawl.startRefetchSink]]
  * (q188's pricing turned into per-window conditional-GET fetch
  * lists). Both must agree with their batch twins on the same
  * corpus — trap verdicts with `WebGraph.crawlTraps`, refetch scores
  * with q188's rank x (1 + changes) spelling.
  */
class RefetchStreamSpec extends AnyFunSuite with SparkSpec {

  private def cap(id: Long, url: String, text: String,
                  ts: String = "2026-03-01T00:00:00",
                  lastMod: String = null,
                  etag: String = null): String = {
    val lm = if (lastMod == null) "" else s""","last_modified":"$lastMod""""
    val et = if (etag == null) "" else s""","etag":"$etag""""
    s"""{"doc_id":$id,"url":"$url","text":"$text","lang":"en","ts":"$ts"$lm$et}"""
  }

  // ------------------------------------------------------------------
  // trapStream == crawlTraps
  // ------------------------------------------------------------------

  test("trapStream: verdicts match the batch crawlTraps after N micro-batches; verdict trips live") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    // trap host: 6 one-template spellings across 2 batches; honest: 3
    def trapCap(i: Long) =
      cap(i, s"http://trap.com/cal/page$i", s"t$i")
    def okCap(i: Long) =
      cap(100 + i, s"http://honest.org/${"abc".charAt(i.toInt)}", s"h$i")
    val b1 = (1L to 3L).map(trapCap) ++ (0L to 2L).map(okCap)
    val b2 = (4L to 6L).map(trapCap) ++ Seq(trapCap(4)) // re-arrival
    val mem = MemoryStream[String]
    val ts = Crawl.trapStream(
      Crawl.parseCrawl(mem.toDF().toDF("value")), threshold = 3.0)
    val q = ts.writeStream.format("memory").queryName("trap_stream")
      .outputMode("append").start()
    def latest(): Map[String, (Long, Long, Double, String)] =
      spark.table("trap_stream").collect()
        .map(r => (r.getString(0),
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
        .groupBy(_._1).map { case (h, rs) =>
          (h, rs.map(_._2).maxBy(_._1)) } // n_urls monotone -> latest
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      // 3 urls / 1 template = 3.0 -> the verdict trips IN THE BATCH
      // that exposes it, before any nightly pass
      assert(latest()("trap.com")._4 === "trap")
      assert(latest()("honest.org")._4 === "ok")
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // parity with the batch operator over the full corpus
    val batch = graft.operators.WebGraph.crawlTraps(
        Crawl.parseCrawl((b1 ++ b2).toDF("value"))
          .select(Urls.canonicalize(col("url")).as("canon_url")),
        threshold = 3.0)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(latest() === batch)
  }

  test("trapStream past maxTrack: the saturation sketch is idempotent under re-arrivals") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    // 40 distinct one-template URLs with maxTrack 8: the URL set
    // saturates into the HLL; templates (1 distinct) stay exact
    def caps(lo: Int, hi: Int) = (lo until hi).map(i =>
      cap(i.toLong, s"http://t.com/cal/page$i", s"b$i"))
    val mem = MemoryStream[String]
    val ts = Crawl.trapStream(
      Crawl.parseCrawl(mem.toDF().toDF("value")),
      threshold = 3.0, maxTrack = 8)
    val q = ts.writeStream.format("memory").queryName("trap_sat")
      .outputMode("append").start()
    def latest(): (Long, Long, String) = {
      val rows = spark.table("trap_sat").collect()
        .filter(_.getString(0) == "t.com")
        .map(r => (r.getLong(1), r.getLong(2), r.getString(4)))
      rows.maxBy(_._1)
    }
    try {
      mem.addData(caps(0, 40): _*); q.processAllAvailable()
      val (n1, t1, v1) = latest()
      assert(t1 === 1L, "template space is tiny and must stay exact")
      assert(n1 >= 8L && n1 <= 60L,
             s"saturated estimate out of band: $n1") // ±~7% of 40
      assert(v1 === "trap")
      // re-offering the SAME 40 URLs must not move the estimate — the
      // drift a per-arrival overflow counter would have shown
      mem.addData(caps(0, 40): _*); q.processAllAvailable()
      val (n2, t2, _) = latest()
      assert(n2 === n1, s"re-arrivals moved the estimate: $n1 -> $n2")
      assert(t2 === 1L)
    } finally q.stop()
  }

  test("trap loop closure: landed trapStream -> latestTrapVerdicts -> the frontier's trap frame") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-traploop")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val lines =
      (1L to 4L).map(i => cap(i, s"http://trap.com/cal/page$i", s"t$i")) ++
      Seq(cap(9, "http://honest.org/about", "h"))
    java.nio.file.Files.write(in.resolve("c0.jsonl"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    // live detection lands as append parquet...
    val ts = Crawl.trapStream(
      Crawl.readCrawlStream(spark, in.toString), threshold = 3.0)
    val q = ts.writeStream.format("parquet")
      .option("path", dir.resolve("verdicts").toString)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    // ...reduces to latest-per-host == the batch operator...
    val latest = Crawl.latestTrapVerdicts(
      spark.read.parquet(dir.resolve("verdicts").toString))
    val batch = graft.operators.WebGraph.crawlTraps(
        Crawl.parseCrawl(lines.toDF("value"))
          .select(Urls.canonicalize(col("url")).as("canon_url")),
        threshold = 3.0)
    assert(latest.collect().map(_.toSeq).toSet ===
           batch.collect().map(_.toSeq).toSet)
    // ...and feeds the next cadence's frontier as its trap frame
    val got = {
      implicit val sctx = spark.sqlContext
      val mem = MemoryStream[String]
      val fr = Crawl.frontierStream(
        Crawl.parseCrawl(mem.toDF().toDF("value")),
        Array.emptyByteArray, perHostCap = 3,
        trapVerdicts = Some(latest.select("host", "verdict")))
      val q2 = fr.writeStream.format("memory").queryName("trap_loop_fr")
        .outputMode("append").start()
      try {
        mem.addData(cap(20, "http://s.net/1",
          "<a href='http://trap.com/cal/page7'>a</a>" +
          "<a href='http://trap.com/cal/page8'>b</a>" +
          "<a href='http://honest.org/x'>c</a>" +
          "<a href='http://honest.org/y'>d</a>"))
        q2.processAllAvailable()
      } finally q2.stop()
      spark.table("trap_loop_fr").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    }
    assert(got.count(_._1 == "trap.com") === 1,
           "the landed live verdict must cap the trap host to 1 probe")
    assert(got.count(_._1 == "honest.org") === 2)
  }

  test("live trap loop: a host trips in batch k inside ONE running frontier and its emission collapses to the probe in batch k+1") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    def page(id: Long, url: String, links: Seq[String]): String = {
      val html = links.zipWithIndex
        .map { case (l, i) => s"""<a href='$l'>x$i</a>""" }.mkString(" ")
      cap(id, url, html)
    }
    val mem = MemoryStream[String]
    val fr = Crawl.frontierStreamLive(
      Crawl.parseCrawl(mem.toDF().toDF("value")),
      Array.emptyByteArray, agent = "graftbot", perHostCap = 3,
      trapThreshold = 3.0)
    val q = fr.writeStream.format("memory").queryName("trap_live_loop")
      .outputMode("append").start()
    def byHost(): Map[String, Set[String]] =
      spark.table("trap_live_loop").collect()
        .map(r => (r.getString(0), r.getString(1)))
        .groupBy(_._1).map { case (h, rs) => h -> rs.map(_._2).toSet }
    try {
      // batch 1: honest traffic — trap.com has shown 2 urls over 2
      // templates (expansion 1.0), so its candidates emit normally
      mem.addData(
        page(1, "http://trap.com/a", Seq("http://trap.com/cal/page1")),
        page(2, "http://trap.com/b", Seq.empty),
        page(3, "http://honest.org/1", Seq("http://honest.org/x")))
      q.processAllAvailable()
      assert(byHost()("trap.com") === Set("http://trap.com/cal/page1"))
      // batch 2 (= batch k): the crawl fetches trap.com's calendar —
      // 9 one-template spellings take the host to 11 urls over 3
      // templates (expansion 3.67 >= 3): TRIPPED, in the same running
      // query, no restart, no nightly pass
      mem.addData((1L to 9L).map(i =>
        page(10 + i, s"http://trap.com/cal/p$i", Seq.empty)): _*)
      q.processAllAvailable()
      // batch 3 (= batch k+1): new discoveries on both hosts — the
      // tripped host's effective cap is 1 and it already emitted 2,
      // so NOTHING more emits; the honest host keeps its budget
      mem.addData(
        page(30, "http://s.net/1", Seq(
          "http://trap.com/cal/p77", "http://trap.com/cal/p78",
          "http://honest.org/y")))
      q.processAllAvailable()
      val m = byHost()
      assert(m("trap.com") === Set("http://trap.com/cal/page1"),
        s"a tripped host must stop emitting past its probe: $m")
      assert(m("honest.org") === Set("http://honest.org/x",
                                     "http://honest.org/y"))
    } finally q.stop()
  }

  test("live trap + families: one member tripping collapses the WHOLE family's budget (the conservative-member rule, live)") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    def page(id: Long, url: String, links: Seq[String]): String = {
      val html = links.zipWithIndex
        .map { case (l, i) => s"""<a href='$l'>x$i</a>""" }.mkString(" ")
      cap(id, url, html)
    }
    // m1.com and m2.com are one mirror family; m2 is the trap alias
    val fam = Seq(("m1.com", "fam1"), ("m2.com", "fam1"))
      .toDF("host", "component")
    val mem = MemoryStream[String]
    val fr = Crawl.frontierStreamLive(
      Crawl.parseCrawl(mem.toDF().toDF("value")),
      Array.emptyByteArray, agent = "graftbot", perHostCap = 4,
      families = Some(fam), trapThreshold = 3.0)
    val q = fr.writeStream.format("memory").queryName("trap_live_fam")
      .outputMode("append").start()
    def famEmits(): Set[String] =
      spark.table("trap_live_fam").collect()
        .filter(r => r.getString(0).startsWith("m"))
        .map(_.getString(1)).toSet
    try {
      // batch 1: one emission on the family budget (via m1)
      mem.addData(page(1, "http://s.net/1", Seq("http://m1.com/a")))
      q.processAllAvailable()
      assert(famEmits() === Set("http://m1.com/a"))
      // batch 2: the trap ALIAS m2 exposes itself — 9 one-template
      // captures (9 urls / 1 template, expansion 9 >= 3)
      mem.addData((1L to 9L).map(i =>
        page(10 + i, s"http://m2.com/cal/p$i", Seq.empty)): _*)
      q.processAllAvailable()
      // batch 3: new discoveries on BOTH members — the family's
      // effective cap is now 1 (the tripped member budgets the whole
      // farm: a mirror family IS one site) and 1 is already spent
      mem.addData(page(30, "http://s.net/2",
        Seq("http://m1.com/b", "http://m2.com/cal/p77")))
      q.processAllAvailable()
      assert(famEmits() === Set("http://m1.com/a"),
        s"a tripped member must cap the whole family: ${famEmits()}")
    } finally q.stop()
  }

  // ------------------------------------------------------------------
  // refetchStream: fused change+validator state, q188 pricing
  // ------------------------------------------------------------------

  test("refetchStream: q188 score from the rank frame, validators ride recency, transitions count") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 4000000000000L), ("b.org", 1000000000000L))
      .toDF("host", "rank_e12")
    val mem = MemoryStream[String]
    val rf2 = Crawl.refetchStream(
      parsedWithValidators0(mem.toDF().toDF("value")), ranks)
    val q = rf2.writeStream.format("memory").queryName("refetch_stream")
      .outputMode("append").start()
    def latest(): Map[String, (Long, Long, Long, String, String)] =
      spark.table("refetch_stream").collect()
        .map(r => (r.getString(0), (r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5), r.getString(6))))
        .groupBy(_._1).map { case (u, rs) =>
          (u, rs.map(_._2).maxBy(_._1)) } // n_captures monotone
    try {
      // batch 1: page A v1 with etag; page B v1, no validators
      mem.addData(
        cap(1, "http://a.com/x", "v1", "2026-03-01T00:00:00",
          lastMod = "Sun, 01 Mar 2026 00:00:00 GMT", etag = "e1"),
        cap(2, "http://b.org/y", "w1"))
      q.processAllAvailable()
      // batch 2: A changes (v2, new etag); B unchanged (same body)
      mem.addData(
        cap(3, "http://a.com/x", "v2", "2026-03-02T00:00:00",
          etag = "e2"),
        cap(4, "http://b.org/y", "w1", "2026-03-02T00:00:00"))
      q.processAllAvailable()
      val m = latest()
      // A: 2 captures, 1 transition, score = 4e12 * (1+1); the newer
      // capture carried only an ETag -> etag e2, last_modified keeps
      // nothing (the newer validator row replaces the older pair)
      assert(m("http://a.com/x") ===
        (2L, 1L, 8000000000000L, null, "e2"))
      // B: 2 captures, 0 transitions, score = 1e12 * 1, no validators
      assert(m("http://b.org/y") === (2L, 0L, 1000000000000L, null, null))
    } finally q.stop()
  }

  private def parsedWithValidators0(raw: DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("last_modified",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("etag",
        org.apache.spark.sql.types.StringType)))
    raw.withColumn("e", from_json(col("value"), schema))
      .select(lit(false).as("corrupt"),
        col("e.doc_id").as("doc_id"), col("e.url").as("url"),
        col("e.text").as("text"),
        to_timestamp(col("e.ts")).as("ts"),
        col("e.last_modified").as("last_modified"),
        col("e.etag").as("etag"))
  }

  /** [[parsedWithValidators0]] + an `http_status` column — the
    * status-aware door's WARC-shaped input.
    */
  private def parsedWithStatus(raw: DataFrame): DataFrame = {
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
        org.apache.spark.sql.types.IntegerType)))
    raw.withColumn("e", from_json(col("value"), schema))
      .select(lit(false).as("corrupt"),
        col("e.doc_id").as("doc_id"), col("e.url").as("url"),
        col("e.text").as("text"),
        to_timestamp(col("e.ts")).as("ts"),
        lit(null).cast("string").as("last_modified"),
        lit(null).cast("string").as("etag"),
        col("e.http_status").as("http_status"))
  }

  private def scap(id: Long, url: String, text: String, status: Int,
                   ts: String): String =
    s"""{"doc_id":$id,"url":"$url","text":"$text","ts":"$ts","http_status":$status}"""

  // ------------------------------------------------------------------
  // status-aware pricing (round 20): error bodies are not content
  // ------------------------------------------------------------------

  test("status-aware pricing: error bodies never fingerprint, a 200-404-200 flap counts once, err_streak decays the price; recrawlStatus agrees") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 1000000000000L)).toDF("host", "rank_e12")
    val mem = MemoryStream[String]
    val rf = Crawl.refetchStream(
      parsedWithStatus(mem.toDF().toDF("value")), ranks)
    val q = rf.writeStream.format("memory").queryName("refetch_status")
      .outputMode("append").start()
    def latest(u: String): (Long, Long, Long, Long) = {
      val rows = spark.table("refetch_status").collect()
        .filter(_.getString(0) == u)
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
                   r.getLong(7)))
      rows.maxBy(_._1) // n_captures is monotone -> latest
    }
    // the history, one batch per capture so arrival order is pinned:
    // 200 A, 404 (unique error body), 404 (ANOTHER unique error
    // body — the naive-fingerprint bait), 200 A (same body back)
    try {
      mem.addData(scap(1, "http://a.com/p", "A", 200,
                       "2026-03-01T00:00:00"))
      q.processAllAvailable()
      assert(latest("http://a.com/p") ===
        ((1L, 0L, 1000000000000L, 0L)))
      mem.addData(scap(2, "http://a.com/p", "err body 1", 404,
                       "2026-03-01T01:00:00"))
      q.processAllAvailable()
      // entering error: ONE change, streak 1 -> price
      // 1e12 * (1+1) div (1+1) = 1e12
      assert(latest("http://a.com/p") ===
        ((2L, 1L, 1000000000000L, 1L)))
      mem.addData(scap(3, "http://a.com/p", "err body 2", 404,
                       "2026-03-01T02:00:00"))
      q.processAllAvailable()
      // a DIFFERENT error body is not a transition: still 1 change,
      // streak 2 -> price 2e12 div 3 (exact BIGINT floor)
      assert(latest("http://a.com/p") ===
        ((3L, 1L, 666666666666L, 2L)))
      mem.addData(scap(4, "http://a.com/p", "A", 200,
                       "2026-03-01T03:00:00"))
      q.processAllAvailable()
      // recovery to the SAME body: the flap counted once in total;
      // the streak resets and the price recovers to 1e12 * 2
      assert(latest("http://a.com/p") ===
        ((4L, 1L, 2000000000000L, 0L)))
    } finally q.stop()
    // the batch twin on the identical history agrees column-for-column
    val caps = Seq(
      ("http://a.com/p", java.lang.Long.valueOf(11L), 1000L,
       Integer.valueOf(200), false, 1L),
      ("http://a.com/p", java.lang.Long.valueOf(22L), 2000L,
       Integer.valueOf(404), false, 2L),
      ("http://a.com/p", java.lang.Long.valueOf(33L), 3000L,
       Integer.valueOf(404), false, 3L),
      ("http://a.com/p", java.lang.Long.valueOf(11L), 4000L,
       Integer.valueOf(200), false, 4L))
      .toDF("canon_url", "fp", "ts_s", "http_status", "revisit",
            "doc_id")
    val b = graft.operators.WebGraph.recrawlStatus(caps).collect().head
    assert((b.getAs[Long]("n_captures"), b.getAs[Long]("n_changes"),
            b.getAs[Long]("err_streak")) === ((4L, 1L, 0L)))
  }

  test("due mode: dueErrCancel cancels a dead page's timer; a recovery re-arms it with learned history") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 1000000000000L)).toDF("host", "rank_e12")
    val mem = MemoryStream[String]
    val rf = Crawl.refetchStream(
      parsedWithStatus(mem.toDF().toDF("value")), ranks,
      dueBaseS = 7200L, dueLateS = 0L, dueErrCancel = 2)
    val q = rf.writeStream.format("memory").queryName("refetch_dead")
      .outputMode("append").start()
    def nRows(u: String): Int =
      spark.table("refetch_dead").collect()
        .count(_.getString(0) == u)
    try {
      // T0: healthy capture; then two error captures -> streak 2 =
      // the cancel bound. (Due instants shrink as changes accrue but
      // the cancel must keep every one of them from firing.)
      mem.addData(scap(1, "http://a.com/dead", "A", 200,
                       "2026-03-01T00:00:00"))
      q.processAllAvailable()
      mem.addData(scap(2, "http://a.com/dead", "e1", 404,
                       "2026-03-01T00:10:00"))
      q.processAllAvailable()
      mem.addData(scap(3, "http://a.com/dead", "e2", 404,
                       "2026-03-01T00:20:00"))
      q.processAllAvailable()
      assert(nRows("http://a.com/dead") === 3) // the capture emissions
      // the event clock sails hours past every plausible due instant:
      // a dead page must NOT keep surfacing in fetch lists (pre-r20
      // it re-fired at base interval forever)
      mem.addData(scap(4, "http://a.com/clock", "c", 200,
                       "2026-03-01T06:00:00"))
      q.processAllAvailable()
      mem.addData(scap(5, "http://a.com/clock2", "c", 200,
                       "2026-03-01T12:00:00"))
      q.processAllAvailable()
      assert(nRows("http://a.com/dead") === 3,
        "a cancelled due timer must not fire")
      // the page comes back: streak resets, the timer re-arms from
      // the recovery capture (n_changes 1 -> interval 3600 s), and
      // the next quiet hour fires it again
      mem.addData(scap(6, "http://a.com/dead", "A", 200,
                       "2026-03-01T13:00:00"))
      q.processAllAvailable()
      assert(nRows("http://a.com/dead") === 4) // the capture emission
      mem.addData(scap(7, "http://a.com/clock3", "c", 200,
                       "2026-03-01T15:00:00"))
      q.processAllAvailable()
      assert(nRows("http://a.com/dead") === 5,
        "a recovered page re-enters the due rotation")
    } finally q.stop()
  }

  test("heartbeats fire due timers on a fully quiet crawl: a batch of ONLY ticks wakes the due page") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 1000000000000L)).toDF("host", "rank_e12")
    val capsMem = MemoryStream[String]
    val tickMem = MemoryStream[java.sql.Timestamp]
    val rf = Crawl.refetchStream(
      parsedWithValidators0(capsMem.toDF().toDF("value")), ranks,
      dueBaseS = 7200L, dueLateS = 0L,
      heartbeats = Some(tickMem.toDF().toDF("ts")))
    val q = rf.writeStream.format("memory").queryName("refetch_hb")
      .outputMode("append").start()
    def rows(): Seq[String] =
      spark.table("refetch_hb").collect().map(_.getString(0)).toSeq
    try {
      // the page's ONLY capture; due instant T0+2h. Then the crawl
      // goes fully quiet — no further captures at all.
      capsMem.addData(cap(1, "http://a.com/x", "v1",
                          "2026-03-01T00:00:00"))
      q.processAllAvailable()
      assert(rows() === Seq("http://a.com/x"))
      // batches of ONLY heartbeat ticks: the crawler's clock advances
      // the watermark past the due instant, the timer fires, and no
      // page state was created for the ticks themselves
      tickMem.addData(java.sql.Timestamp.valueOf("2026-03-01 01:00:00"))
      q.processAllAvailable()
      assert(rows() === Seq("http://a.com/x"), "not due yet at T0+1h")
      tickMem.addData(java.sql.Timestamp.valueOf("2026-03-01 03:00:00"))
      q.processAllAvailable()
      assert(rows() === Seq("http://a.com/x", "http://a.com/x"),
        "a tick-only batch must fire the due page")
      assert(!rows().exists(_.contains("tick://")),
        "heartbeats must never emit or key real output")
    } finally q.stop()
  }

  test("dueMaxFires bounds due-mode state: unanswered wakeups evict after k fires; a re-arrival re-learns") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 1000000000000L)).toDF("host", "rank_e12")
    val mem = MemoryStream[String]
    val rf = Crawl.refetchStream(
      parsedWithValidators0(mem.toDF().toDF("value")), ranks,
      dueBaseS = 3600L, dueLateS = 0L, dueMaxFires = 2)
    val q = rf.writeStream.format("memory").queryName("refetch_bound")
      .outputMode("append").start()
    def capsOf(u: String): Seq[Long] =
      spark.table("refetch_bound").collect()
        .filter(_.getString(0) == u).map(_.getLong(2)).toSeq
    try {
      mem.addData(cap(1, "http://a.com/cold", "v1",
                      "2026-03-01T00:00:00"))
      q.processAllAvailable()
      // two quiet hours -> two unanswered wakeups = the bound: the
      // second fire is the LAST, then the state evicts
      mem.addData(cap(2, "http://a.com/clock", "c",
                      "2026-03-01T01:30:00"))
      q.processAllAvailable()
      mem.addData(cap(3, "http://a.com/clock2", "c",
                      "2026-03-01T02:40:00"))
      q.processAllAvailable()
      assert(capsOf("http://a.com/cold") === Seq(1L, 1L, 1L),
        "capture + exactly two unanswered wakeups")
      // hours more of quiet clock: NO further fires — the state is
      // gone, not just silent
      mem.addData(cap(4, "http://a.com/clock3", "c",
                      "2026-03-01T09:00:00"))
      q.processAllAvailable()
      assert(capsOf("http://a.com/cold") === Seq(1L, 1L, 1L))
      // the page re-arrives: a from-scratch history (n_captures
      // restarts at 1 — the documented eviction loss) and the due
      // rotation resumes
      mem.addData(cap(5, "http://a.com/cold", "v1",
                      "2026-03-01T10:00:00"))
      q.processAllAvailable()
      mem.addData(cap(6, "http://a.com/clock4", "c",
                      "2026-03-01T11:30:00"))
      q.processAllAvailable()
      assert(capsOf("http://a.com/cold") === Seq(1L, 1L, 1L, 1L, 1L),
        "re-learned page fires again after eviction")
    } finally q.stop()
  }

  // ------------------------------------------------------------------
  // due-time wakeups: the door as a SCHEDULER, not a re-pricer
  // ------------------------------------------------------------------

  test("due wakeups: a hot page the crawl stops touching re-emits when its interval elapses; a cold page does not") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 1000000000000L)).toDF("host", "rank_e12")
    val mem = MemoryStream[String]
    // base 7200 s: page A (3 captures, 2 changes) earns interval
    // 7200/3 = 2400 s; page B (1 capture) keeps the full 7200 s
    val rf = Crawl.refetchStream(
      parsedWithValidators0(mem.toDF().toDF("value")), ranks,
      dueBaseS = 7200L, dueLateS = 0L)
    val q = rf.writeStream.format("memory").queryName("refetch_due")
      .outputMode("append").start()
    def rowsOf(u: String): Seq[(Long, Long, String)] =
      spark.table("refetch_due").collect()
        .filter(_.getString(0) == u)
        .map(r => (r.getLong(2), r.getLong(3), r.getString(6))).toSeq
    try {
      // batch 1: A churns through 3 versions by T0+2h (due T0+2h40m);
      // cold B captures once at T0+2h (due T0+4h)
      mem.addData(
        cap(1, "http://a.com/x", "v1", "2026-03-01T00:00:00",
            etag = "e1"),
        cap(2, "http://a.com/x", "v2", "2026-03-01T01:00:00",
            etag = "e2"),
        cap(3, "http://a.com/x", "v3", "2026-03-01T02:00:00",
            etag = "e3"),
        cap(4, "http://b.org/y", "w1", "2026-03-01T02:00:00"))
      q.processAllAvailable()
      assert(rowsOf("http://a.com/x") === Seq((3L, 2L, "e3")))
      // batch 2: an unrelated page advances the event clock to T0+3h
      // — past A's due instant, NOT past B's. A fires with NO new
      // arrival, carrying its conditional-GET columns.
      mem.addData(cap(5, "http://c.io/z", "c1", "2026-03-01T03:00:00"))
      q.processAllAvailable()
      assert(rowsOf("http://a.com/x") ===
        Seq((3L, 2L, "e3"), (3L, 2L, "e3")),
        "the due wakeup must emit the page's current row once")
      assert(rowsOf("http://b.org/y").size === 1,
        "a cold page's far-off due instant must not fire")
      // batch 3: clock to T0+3h30m — below A's re-armed instant
      // (T0+3h40m) and below B's: no further fires
      mem.addData(cap(6, "http://d.io/w", "d1", "2026-03-01T03:30:00"))
      q.processAllAvailable()
      assert(rowsOf("http://a.com/x").size === 2)
      assert(rowsOf("http://b.org/y").size === 1)
    } finally q.stop()
  }

  test("due mode's default lateness tolerance absorbs an half-hour-late capture (the old 60s default silently dropped it)") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 1000000000000L)).toDF("host", "rank_e12")
    val mem = MemoryStream[String]
    // dueLateS left at its DEFAULT: the watermark delay is the drop
    // cutoff due mode introduces, and a WARC replay batch routinely
    // carries captures half an hour out of order
    val rf = Crawl.refetchStream(
      parsedWithValidators0(mem.toDF().toDF("value")), ranks,
      dueBaseS = 7200L)
    val q = rf.writeStream.format("memory").queryName("refetch_due_late")
      .outputMode("append").start()
    def capsOf(u: String): Seq[Long] =
      spark.table("refetch_due_late").collect()
        .filter(_.getString(0) == u).map(_.getLong(2)).toSeq
    try {
      // batch 1 ends with the event clock at T0+1h -> watermark T0
      mem.addData(
        cap(1, "http://a.com/x", "v1", "2026-03-01T00:00:00"),
        cap(2, "http://a.com/clock", "m1", "2026-03-01T01:00:00"))
      q.processAllAvailable()
      // batch 2: a capture 30 min behind the clock — INSIDE the
      // default hour tolerance, so it must count (under the pre-r20
      // 60 s default the watermark sat at T0+59m and this row died)
      mem.addData(cap(3, "http://a.com/x", "v2", "2026-03-01T00:30:00"))
      q.processAllAvailable()
      assert(capsOf("http://a.com/x") === Seq(1L, 2L),
        "an half-hour-late capture must survive the default tolerance")
    } finally q.stop()
  }

  test("validatorsStream idleTtlS: eviction is output-invisible (replacement recency) and the TTL watermark is the real drop cutoff") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Crawl.validatorsStream(
        parsedWithValidators0(mem.toDF().toDF("value")), idleTtlS = 3600L)
      .writeStream.format("memory").queryName("val_ttl")
      .outputMode("append").start()
    def etagsOf(u: String): Seq[String] =
      spark.table("val_ttl").collect().filter(_.getString(0) == u)
        .map(_.getString(3)).toSeq
    try {
      mem.addData(
        cap(1, "http://a.com/idle", "v1", "2026-03-01T00:00:00",
            lastMod = "Sun, 01 Mar 2026 00:00:00 GMT", etag = "e1"),
        cap(2, "http://b.org/live", "w1", "2026-03-01T00:00:00",
            etag = "f1"))
      q.processAllAvailable()
      // b keeps capturing; the event clock moves far past a's TTL
      // horizon, so a's state evicts on the event clock
      mem.addData(cap(3, "http://b.org/live", "w2",
                      "2026-03-01T05:00:00", etag = "f2"))
      q.processAllAvailable()
      mem.addData(cap(4, "http://b.org/live", "w3",
                      "2026-03-01T08:00:00", etag = "f3"))
      q.processAllAvailable()
      // batch 4: (i) a LATE capture of c — event time T0+2h, already
      // 6 h behind the watermark = beyond the TTL tolerance — is
      // DROPPED, the documented loss semantics; (ii) a's re-arrival
      // (ahead of the watermark) re-learns and emits normally —
      // latest-capture replacement makes the eviction itself
      // output-invisible, which is exactly why the TTL is safe here
      mem.addData(
        cap(5, "http://c.net/late", "x1", "2026-03-01T02:00:00",
            etag = "g1"),
        cap(6, "http://a.com/idle", "v2", "2026-03-01T07:30:00",
            etag = "e2"))
      q.processAllAvailable()
      assert(etagsOf("http://c.net/late") === Seq.empty,
        "a capture older than the TTL watermark must drop")
      val aRows = spark.table("val_ttl").collect()
        .filter(_.getString(0) == "http://a.com/idle")
        .map(r => (r.getString(1), r.getString(3))).toSeq
      assert(aRows === Seq(
        ("Sun, 01 Mar 2026 00:00:00 GMT", "e1"), (null, "e2")))
      // the active page's validator recency was never disturbed
      assert(etagsOf("http://b.org/live") === Seq("f1", "f2", "f3"))
    } finally q.stop()
  }

  test("sitemapLastmod: a sitemap announcing a NEWER lastmod surfaces the page with no capture of it; re-offers and stale declares never trigger") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 1000000000000L)).toDF("host", "rank_e12")
    def smap(id: Long, url: String, entries: (String, String)*): String = {
      val body = entries.map { case (u, lm) =>
        s"<url><loc>$u</loc><lastmod>$lm</lastmod></url>" }
        .mkString("<urlset>", "", "</urlset>")
      cap(id, url, body)
    }
    val mem = MemoryStream[String]
    val rf = Crawl.refetchStream(
      parsedWithValidators0(mem.toDF().toDF("value")), ranks,
      sitemapLastmod = true)
    val q = rf.writeStream.format("memory").queryName("refetch_lastmod")
      .outputMode("append").start()
    def rowsOf(u: String): Seq[(Long, String)] =
      spark.table("refetch_lastmod").collect()
        .filter(_.getString(0) == u)
        .map(r => (r.getLong(2), r.getString(6))).toSeq
    try {
      // batch 1: page A captured on 2026-03-01 with an etag
      mem.addData(cap(1, "http://a.com/x", "v1", "2026-03-01T00:00:00",
                      etag = "e1"))
      q.processAllAvailable()
      assert(rowsOf("http://a.com/x").size === 1)
      // batch 2: a sitemap (name matches nothing — content sniff)
      // announces A changed on 03-03 and an UNKNOWN page on 03-09.
      // A surfaces with its conditional-GET token, no capture of A;
      // the never-captured page creates nothing (not refetchable).
      mem.addData(smap(2, "http://a.com/maps/m.xml",
        "http://a.com/x" -> "2026-03-03",
        "http://a.com/never" -> "2026-03-09"))
      q.processAllAvailable()
      assert(rowsOf("http://a.com/x") === Seq((1L, "e1"), (1L, "e1")),
        "the declared-newer announcement must surface the page once")
      assert(rowsOf("http://a.com/never") === Seq.empty)
      // batch 3: the SAME sitemap re-offered, plus a STALE declare
      // (02-20, older than the capture): neither triggers
      mem.addData(smap(3, "http://a.com/maps/m.xml",
        "http://a.com/x" -> "2026-03-03"))
      q.processAllAvailable()
      mem.addData(smap(4, "http://a.com/maps/m2.xml",
        "http://a.com/x" -> "2026-02-20"))
      q.processAllAvailable()
      assert(rowsOf("http://a.com/x").size === 2,
        "re-offers and stale declares must not re-trigger")
      // batch 5: a genuinely newer declare (03-07) triggers again
      mem.addData(smap(5, "http://a.com/maps/m3.xml",
        "http://a.com/x" -> "2026-03-07"))
      q.processAllAvailable()
      assert(rowsOf("http://a.com/x").size === 3)
    } finally q.stop()
  }

  test("due wakeups land: a page captured only in window 1 appears in a later WINDOW's parquet with its conditional-GET columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-due-land")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val ranks = Seq(("a.com", 3000000000000L), ("b.org", 1000000000000L))
      .toDF("host", "rank_e12")
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(in.resolve(name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    // cadenced AvailableNow runs over ONE checkpoint — the
    // startFrontierSink scheduler shape. Window 0: hot page A (3
    // captures, 2 changes -> interval 2400 s) plus cold B. Window 1:
    // only unrelated traffic far past A's due instant — A must FIRE
    // during the drain and land in that window's list, B must not.
    val windows = Seq(
      Seq(cap(1, "http://a.com/x", "v1", "2026-03-01T00:00:00",
              etag = "e1"),
          cap(2, "http://a.com/x", "v2", "2026-03-01T01:00:00",
              etag = "e2"),
          cap(3, "http://a.com/x", "v3", "2026-03-01T02:00:00",
              etag = "e3"),
          cap(4, "http://b.org/y", "w1", "2026-03-01T02:00:00")),
      Seq(cap(5, "http://c.io/z", "c1", "2026-03-01T03:00:00")),
      Seq(cap(6, "http://d.io/w", "d1", "2026-03-01T03:10:00")))
    for ((lines, i) <- windows.zipWithIndex) {
      write(s"w$i.jsonl", lines)
      val rf = Crawl.refetchStream(
        parsedWithValidators0(spark.readStream.text(in.toString)),
        ranks, dueBaseS = 7200L, dueLateS = 0L)
      val q = Crawl.startRefetchSink(rf, dir.resolve("out").toString,
        dir.resolve("ckpt").toString, topKPerWindow = 10)
      q.awaitTermination(120000L)
    }
    val out = spark.read.parquet(dir.resolve("out").toString)
    // A's due fire lands in SOME later window (the timeout batch may
    // run inside the same AvailableNow drain or at the next cadence —
    // either way it is a window with NO arrival of A), carrying the
    // cumulative state (2 changes) and the newest conditional-GET
    // token; cold B never surfaces past its arrival window
    val later = out.filter(col("window_id").cast("long") >= 1L)
      .collect().map(r => r.getAs[String]("canon_url") ->
        ((r.getAs[Long]("n_changes"), r.getAs[String]("if_none_match"))))
    val aFires = later.filter(_._1 == "http://a.com/x").map(_._2)
    assert(aFires.nonEmpty,
      s"the due fire must land in a later window: ${later.map(_._1).toSeq}")
    assert(aFires.toSet === Set((2L, "e3")))
    assert(!later.exists(_._1 == "http://b.org/y"),
      "a cold page must not surface in a due window")
  }

  test("due wakeups + sitemapLastmod: a stale announcement-only batch must NOT re-arm the timer into a premature fire") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 1000000000000L)).toDF("host", "rank_e12")
    val mem = MemoryStream[String]
    val rf = Crawl.refetchStream(
      parsedWithValidators0(mem.toDF().toDF("value")), ranks,
      dueBaseS = 7200L, dueLateS = 0L, sitemapLastmod = true)
    val q = rf.writeStream.format("memory").queryName("refetch_rearm")
      .outputMode("append").start()
    def aCount(): Int = spark.table("refetch_rearm").collect()
      .count(_.getString(0) == "http://a.com/x")
    try {
      // A captured at T0 (1 capture -> interval 7200 s, due T0+2h)
      mem.addData(cap(1, "http://a.com/x", "v1", "2026-03-01T00:00:00"))
      q.processAllAvailable()
      // clock to T0+3h: A due-fires once, re-arms at ~T0+5h
      mem.addData(cap(2, "http://c.io/z", "c1", "2026-03-01T03:00:00"))
      q.processAllAvailable()
      assert(aCount() === 2)
      // a STALE sitemap re-offer for A (announcement-only batch for
      // A's key): before the r19 review fix this re-derived the timer
      // from the unchanged lastCapTs — already past — flooring it to
      // watermark+1s and forcing a spurious wakeup on the next clock
      // advance
      mem.addData(
        s"""{"doc_id":3,"url":"http://a.com/maps/m.xml","text":"<urlset><url><loc>http://a.com/x</loc><lastmod>2026-02-20</lastmod></url></urlset>","ts":"2026-03-01T03:30:00"}""")
      q.processAllAvailable()
      // clock to T0+4h — below the honest re-arm (~T0+5h): no fire
      mem.addData(cap(4, "http://d.io/w", "d1", "2026-03-01T04:00:00"))
      q.processAllAvailable()
      assert(aCount() === 2,
        "a stale announcement-only batch must not cause a wakeup")
    } finally q.stop()
  }

  test("due wakeups and idle TTL are mutually exclusive (one event-time timer per group)") {
    import spark.implicits._
    val ranks = Seq(("a.com", 1L)).toDF("host", "rank_e12")
    val parsed = parsedWithValidators0(Seq.empty[String].toDF("value"))
    assertThrows[IllegalArgumentException](
      Crawl.refetchStream(parsed, ranks, dueBaseS = 10L, idleTtlS = 10L))
  }

  // ------------------------------------------------------------------
  // the live price: declared freshness + validator staleness
  // ------------------------------------------------------------------

  test("declared blend: stream score equals declaredFreshnessQueue (q193) on shared pages") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 4000000000000L), ("b.org", 1000000000000L))
      .toDF("host", "rank_e12")
    val declared = Seq(("http://a.com/x", "hourly"),
                       ("http://b.org/y", "yearly"))
      .toDF("canon_url", "changefreq")
    val lines = Seq(
      cap(1, "http://a.com/x", "v1", "2026-03-01T00:00:00"),
      cap(2, "http://a.com/x", "v2", "2026-03-02T00:00:00"),
      cap(3, "http://b.org/y", "w1", "2026-03-01T00:00:00"),
      cap(4, "http://b.org/y", "w1", "2026-03-02T00:00:00"),
      cap(5, "http://a.com/z", "u1", "2026-03-01T00:00:00"))
    // batch twin: q193's exact spelling over the same corpus
    val stats = graft.operators.WebGraph.recrawlPriority(
        Crawl.parseCrawl(lines.toDF("value"))
          .select(Urls.canonicalize(col("url")).as("canon_url"),
                  xxhash64(col("text")).as("fp")))
      .select(col("canon_url"), col("n_changes"),
              Urls.host(col("canon_url")).as("host"))
    val batch = graft.operators.WebGraph
      .declaredFreshnessQueue(stats, ranks, declared, topK = 100)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(batch === Map(
      "http://a.com/x" -> 56000000000000L, // 4e12 * (1+1) * (1+6)
      "http://b.org/y" -> 1000000000000L,  // 1e12 * 1 * 1
      "http://a.com/z" -> 4000000000000L)) // 4e12 * 1 * 1
    // stream: same ranks, same declared frame, staleness off
    val mem = MemoryStream[String]
    val rf = Crawl.refetchStream(
      parsedWithValidators0(mem.toDF().toDF("value")), ranks,
      declared = Some(declared))
    val q = rf.writeStream.format("memory").queryName("refetch_decl")
      .outputMode("append").start()
    try {
      mem.addData(lines: _*)
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("refetch_decl").collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(stream === batch,
      s"stream price must equal the q193 batch blend: $stream")
  }

  test("validator staleness: tokens aging past staleBoostS step the price up; token-less pages are neutral") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 1000000000000L), ("b.org", 1000000000000L))
      .toDF("host", "rank_e12")
    val mem = MemoryStream[String]
    val rf = Crawl.refetchStream(
      parsedWithValidators0(mem.toDF().toDF("value")), ranks,
      staleBoostS = 3600L)
    val q = rf.writeStream.format("memory").queryName("refetch_stale")
      .outputMode("append").start()
    try {
      // A's validators arrive at T0; its newest capture (T0+2h)
      // carries none -> validator age 7200 s = 2 stale steps.
      // B never carries validators -> neutral factor 1.
      mem.addData(
        cap(1, "http://a.com/x", "v1", "2026-03-01T00:00:00",
            etag = "e1"),
        cap(2, "http://a.com/x", "v2", "2026-03-01T02:00:00"),
        cap(3, "http://b.org/y", "w1", "2026-03-01T02:00:00"))
      q.processAllAvailable()
      val m = spark.table("refetch_stale").collect()
        .map(r => r.getString(0) -> (r.getLong(4), r.getString(6))).toMap
      // A: 1e12 * (1+1 change) * (1 + 7200 div 3600) = 6e12; the aged
      // etag still rides as the conditional-GET token
      assert(m("http://a.com/x") === ((6000000000000L, "e1")))
      // B: 1e12 * 1 * 1 — no token, nothing to go stale
      assert(m("http://b.org/y") === ((1000000000000L, null)))
    } finally q.stop()
  }

  // ------------------------------------------------------------------
  // startRefetchSink: ranked, windowed, exactly-once lists
  // ------------------------------------------------------------------

  test("startRefetchSink: three windows land ranked by score with conditional-GET columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-refetch")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val ranks = Seq(("a.com", 3000000000000L), ("b.org", 1000000000000L))
      .toDF("host", "rank_e12")
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(in.resolve(name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    // three files -> three AvailableNow windows is not guaranteed
    // (the file source may batch them); drive three separate
    // AvailableNow runs over ONE checkpoint instead — the cadenced-
    // scheduler shape startFrontierSink documents
    val windows = Seq(
      Seq(cap(1, "http://a.com/x", "v1",
            etag = "e1"),
          cap(2, "http://b.org/y", "w1")),
      Seq(cap(3, "http://a.com/x", "v2", "2026-03-02T00:00:00",
            etag = "e2"),
          cap(4, "http://b.org/y", "w1", "2026-03-02T00:00:00")),
      Seq(cap(5, "http://a.com/x", "v3", "2026-03-03T00:00:00",
            etag = "e3")))
    for ((lines, i) <- windows.zipWithIndex) {
      write(s"w$i.jsonl", lines)
      val rf = Crawl.refetchStream(
        parsedWithValidators0(spark.readStream.text(in.toString)),
        ranks)
      val q = Crawl.startRefetchSink(rf, dir.resolve("out").toString,
        dir.resolve("ckpt").toString, topKPerWindow = 10)
      q.awaitTermination(120000L)
    }
    val out = spark.read.parquet(dir.resolve("out").toString)
    val wids = out.select(col("window_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(wids.size === 3, s"expected 3 windows, got $wids")
    // window 2 (third run): only A updated -> one row, rk 1, its
    // cumulative state (3 captures, 2 changes), newest etag
    val w2 = out.filter(col("window_id") === wids.max).collect()
    assert(w2.length === 1)
    val r = w2.head
    assert(r.getAs[String]("canon_url") === "http://a.com/x")
    assert(r.getAs[Long]("rk") === 1L)
    assert(r.getAs[Long]("n_changes") === 2L)
    assert(r.getAs[Long]("score_e12") === 9000000000000L)
    assert(r.getAs[String]("if_none_match") === "e3")
    // the second window ranks A (score 3e12*2) above B (1e12*1)
    val w1 = out.filter(col("window_id") === wids.toSeq.sorted.apply(1))
      .orderBy("rk").collect()
    assert(w1.map(_.getAs[String]("canon_url")).toSeq ===
      Seq("http://a.com/x", "http://b.org/y"))
    assert(w1.map(_.getAs[Long]("score_e12")).toSeq ===
      Seq(6000000000000L, 1000000000000L))
  }

  test("startRefetchSink: maxPerHostPerWindow keeps one hot host from filling a window") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-refetch-ph")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val ranks = Seq(("a.com", 9000000000000L), ("b.org", 1000000000000L))
      .toDF("host", "rank_e12")
    java.nio.file.Files.write(in.resolve("w0.jsonl"),
      Seq(cap(1, "http://a.com/x1", "v"), cap(2, "http://a.com/x2", "v"),
          cap(3, "http://a.com/x3", "v"), cap(4, "http://b.org/y", "w"))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val rf = Crawl.refetchStream(
      parsedWithValidators0(spark.readStream.text(in.toString)), ranks)
    val q = Crawl.startRefetchSink(rf, dir.resolve("out").toString,
      dir.resolve("ckpt").toString, topKPerWindow = 10,
      maxPerHostPerWindow = 2)
    q.awaitTermination(120000L)
    val got = spark.read.parquet(dir.resolve("out").toString)
      .orderBy("rk").collect().map(_.getAs[String]("canon_url")).toSeq
    // a.com outranks b.org 9:1 and offers 3 pages, but keeps only its
    // top 2 per window (byte-order tie-break); b.org still lands
    assert(got === Seq("http://a.com/x1", "http://a.com/x2",
                       "http://b.org/y"))
  }
}
