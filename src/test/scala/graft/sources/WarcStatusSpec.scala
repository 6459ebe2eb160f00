package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HTTP status and redirect handling in the WARC front end: the
  * `http_status` / `redirect` columns (appended after the typed-frame
  * contract), [[Crawl.okResponses]]' 2xx gate, [[Crawl.redirectEdges]]
  * alias edges with relative-Location resolution, and the frontier
  * following 3xx targets.
  */
class WarcStatusSpec extends AnyFunSuite with SparkSpec {

  private def rec(uri: String, statusLine: String, body: String,
                  extra: Seq[String] = Seq.empty,
                  date: String = "2026-03-01T00:00:00Z"): Array[Byte] = {
    val block = (s"$statusLine\r\nContent-Type: text/html\r\n" +
      extra.map(_ + "\r\n").mkString + "\r\n" + body)
    val bb = block.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\nContent-Length: ${bb.length}" +
      "\r\n\r\n").getBytes("UTF-8") ++ bb ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val os = new java.util.zip.GZIPOutputStream(bos)
    os.write(b); os.close()
    bos.toByteArray
  }

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-status")
    java.nio.file.Files.write(d.resolve("s.warc.gz"),
      gz(rec("http://a.com/ok", "HTTP/1.1 200 OK",
             """<a href="http://a.com/linked">x</a> page body""")) ++
      gz(rec("http://a.com/moved", "HTTP/1.1 301 Moved Permanently",
             "<html>moved</html>",
             Seq("Location: http://b.org/new-home"))) ++
      gz(rec("http://a.com/rel", "HTTP/1.1 302 Found",
             "", Seq("Location: /relative/target"))) ++
      gz(rec("http://a.com/gone", "HTTP/1.1 404 Not Found",
             "<html>the classic error page</html>")))
    d.toString
  }

  test("http_status lands; 3xx Location resolves (relative too); non-3xx has no redirect") {
    val parsed = Crawl.readWarc(spark, dir).cache()
    try {
      val m = parsed.filter(!col("corrupt"))
        .select("url", "http_status", "redirect").collect()
        .map(r => r.getString(0) ->
          ((if (r.isNullAt(1)) -1 else r.getInt(1)),
           Option(r.getString(2)))).toMap
      assert(m("http://a.com/ok") === ((200, None)))
      assert(m("http://a.com/moved") ===
        ((301, Some("http://b.org/new-home"))))
      assert(m("http://a.com/rel") ===
        ((302, Some("http://a.com/relative/target"))))
      assert(m("http://a.com/gone") === ((404, None)))
    } finally parsed.unpersist()
  }

  test("okResponses keeps 2xx and statusless, drops errors and redirect stubs") {
    val parsed = Crawl.readWarc(spark, dir)
    val kept = Crawl.okResponses(parsed).filter(!col("corrupt"))
      .select("url").collect().map(_.getString(0)).toSet
    assert(kept === Set("http://a.com/ok"))
    // a statusless (JSONL-shaped) frame passes through untouched
    import spark.implicits._
    val jsonlish = Seq((false, "http://x/1", "body",
                        null.asInstanceOf[Integer]))
      .toDF("corrupt", "url", "text", "http_status")
    assert(Crawl.okResponses(jsonlish).count() === 1)
  }

  test("redirectEdges emits alias edges; frontier follows the targets") {
    val parsed = Crawl.readWarc(spark, dir, extractHtml = false)
    val edges = Crawl.redirectEdges(parsed).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(edges === Set(
      ("http://a.com/moved", "http://b.org/new-home", 301),
      ("http://a.com/rel", "http://a.com/relative/target", 302)))
    val f = Crawl.frontier(parsed, perHostCap = 8)
      .collect().map(_.getString(1)).toSet
    assert(f === Set("http://a.com/linked", "http://b.org/new-home",
                     "http://a.com/relative/target"))
  }

  private def recAt(uri: String, date: String,
                    extra: Seq[String]): Array[Byte] = {
    val block = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      extra.map(_ + "\r\n").mkString + "\r\nbody"
    val bb = block.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\nContent-Length: ${bb.length}" +
      "\r\n\r\n").getBytes("UTF-8") ++ bb ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("revalidation metadata lands; revisitValidators keeps the latest capture per canonical page") {
    val d = java.nio.file.Files.createTempDirectory("graft-validators")
    java.nio.file.Files.write(d.resolve("s.warc.gz"),
      gz(recAt("http://a.com/p", "2026-03-01T00:00:00Z",
        Seq("Last-Modified: Mon, 02 Feb 2026 10:00:00 GMT",
            "ETag: \"v1\""))) ++
      // a junk-variant recapture a day later with fresher validators:
      // it canonicalizes onto the same page and must win
      gz(recAt("http://a.com/p?utm_source=x", "2026-03-02T00:00:00Z",
        Seq("Last-Modified: Tue, 03 Feb 2026 10:00:00 GMT",
            "ETag: W/\"v2\""))) ++
      gz(recAt("http://b.org/none", "2026-03-01T00:00:00Z", Seq.empty)))
    val parsed = Crawl.readWarc(spark, d.toString)
    // raw columns: appended after the contract, null when absent
    val raw = parsed.filter(!col("corrupt"))
      .select("url", "last_modified", "etag").collect()
      .map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(raw("http://b.org/none") === ((None, None)))
    assert(raw("http://a.com/p") ===
      ((Some("Mon, 02 Feb 2026 10:00:00 GMT"), Some("\"v1\""))))
    val v = Crawl.revisitValidators(parsed).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getString(3),
          Option(r.getTimestamp(2)).map(_.toString).orNull)))
      .toMap
    // one row: the validator-less page has nothing to revalidate with
    assert(v.keySet === Set("http://a.com/p"))
    assert(v("http://a.com/p") ===
      (("Tue, 03 Feb 2026 10:00:00 GMT", "W/\"v2\"",
        "2026-02-03 10:00:00.0")))
  }

  test("validatorsStream: live conditional-GET table agrees with the batch roll-up") {
    val d = java.nio.file.Files.createTempDirectory("graft-valstream")
    // two files -> two micro-batches (maxFilesPerTrigger = 1); the
    // second batch carries the fresher capture of the SAME page under
    // a junk variant, so state must update across batches
    java.nio.file.Files.write(d.resolve("a.warc.gz"),
      gz(recAt("http://a.com/p", "2026-03-01T00:00:00Z",
        Seq("Last-Modified: Mon, 02 Feb 2026 10:00:00 GMT",
            "ETag: \"v1\""))))
    // WARC 1.1 millisecond-precision date: the stream threads the
    // timestamp through state at epoch-micros, so captured_ts must
    // round-trip the .123 — not truncate to whole seconds
    java.nio.file.Files.write(d.resolve("b.warc.gz"),
      gz(recAt("http://a.com/p?utm_source=x", "2026-03-02T00:00:00.123Z",
        Seq("Last-Modified: Tue, 03 Feb 2026 10:00:00 GMT",
            "ETag: W/\"v2\""))))
    val q = Crawl.validatorsStream(
        Crawl.readWarcStream(spark, d.toString, maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName("val_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val emissions = spark.table("val_stream")
      .orderBy(col("captured_ts"))
      .collect().map(r => (r.getString(0), r.getString(3))).toSeq
    // one emission per batch, the second reflecting the update
    assert(emissions === Seq(("http://a.com/p", "\"v1\""),
                             ("http://a.com/p", "W/\"v2\"")))
    // latest emission == the batch roll-up, column for column
    val lastStream = spark.table("val_stream")
      .orderBy(col("captured_ts").desc).limit(1)
      .collect().map(_.toString).toSeq
    val batch = Crawl.revisitValidators(Crawl.readWarc(spark, d.toString))
      .collect().map(_.toString).toSeq
    assert(lastStream === batch)
    // and the sub-second part genuinely survived the state round-trip
    val ts = spark.table("val_stream")
      .orderBy(col("captured_ts").desc).limit(1)
      .collect().head.getAs[java.sql.Timestamp]("captured_ts")
    assert(ts.toString === "2026-03-02 00:00:00.123")
  }

  test("robots status gate: an error page's body never compiles as a host's rules") {
    val d = java.nio.file.Files.createTempDirectory("graft-robots404")
    // a.com serves its robots as an HTML 404 whose body HAPPENS to
    // contain Disallow-looking text; b.org serves a real 200 one
    java.nio.file.Files.write(d.resolve("s.warc.gz"),
      gz(rec("http://a.com/robots.txt", "HTTP/1.1 404 Not Found",
             "User-agent: *\nDisallow: /")) ++
      gz(rec("http://b.org/robots.txt", "HTTP/1.1 200 OK",
             "User-agent: *\nDisallow: /private/")) ++
      gz(rec("http://c.net/home", "HTTP/1.1 200 OK",
             """<a href="http://a.com/page">a</a>""" +
             """ <a href="http://b.org/private/x">b</a>""" +
             """ <a href="http://b.org/open">c</a>""")))
    val parsed = Crawl.readWarc(spark, d.toString, extractHtml = false)
    // only the 2xx capture lifts to the host-keyed robots frame
    val hosts = Crawl.robotsTexts(parsed)
      .collect().map(_.getString(0)).toSet
    assert(hosts === Set("b.org"))
    // so a.com fails OPEN (404 => no rules, RFC 9309) while b.org's
    // real rules gate
    val f = Crawl.frontier(parsed, perHostCap = 8,
        robotsAgent = Some("graftbot"))
      .collect().map(_.getString(1)).toSet
    assert(f === Set("http://a.com/page", "http://b.org/open"))
  }

  test("failClosed5xx: a 5xx LATEST robots capture disallows the host; 4xx and 2xx behave as before") {
    val d = java.nio.file.Files.createTempDirectory("graft-rb5xx")
    java.nio.file.Files.write(d.resolve("r.warc.gz"),
      // a.com: an old 2xx body, then a NEWER 503 outage capture
      gz(rec("http://a.com/robots.txt", "HTTP/1.1 200 OK",
             "User-agent: *\nDisallow: /private/")) ++
      gz(rec("http://a.com/robots.txt",
             "HTTP/1.1 503 Service Unavailable",
             "<html>overloaded</html>",
             date = "2026-03-02T00:00:00Z")) ++
      // b.org: plain 404 — no rules either way
      gz(rec("http://b.org/robots.txt", "HTTP/1.1 404 Not Found",
             "<html>nope</html>")) ++
      // c.net: healthy 2xx rules
      gz(rec("http://c.net/robots.txt", "HTTP/1.1 200 OK",
             "User-agent: *\nDisallow: /private/")))
    val parsed = Crawl.readWarc(spark, d.toString, extractHtml = false)
    def rulesOf(frame: org.apache.spark.sql.DataFrame)
        : Map[String, String] =
      frame.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the DEFAULT door: non-2xx captures drop before latest-per-host,
    // so a.com's OLD 2xx body still rules through the outage
    val open = rulesOf(Crawl.compiledRobots(parsed, "graftbot"))
    assert(Robots.allowedCompiled("http://a.com/page", open("a.com")))
    assert(!Robots.allowedCompiled("http://a.com/private/x",
                                   open("a.com")))
    // the STRICT door: the 503 is a.com's latest capture -> complete
    // disallow (RFC 9309 unavailability); 404 stays fail-open (null
    // rules); 2xx hosts unchanged
    val strict = rulesOf(
      Crawl.compiledRobots(parsed, "graftbot", failClosed5xx = true))
    assert(!Robots.allowedCompiled("http://a.com/page", strict("a.com")))
    assert(!Robots.allowedCompiled("http://a.com/anything",
                                   strict("a.com")))
    assert(strict("b.org") == null)
    assert(Robots.allowedCompiled("http://b.org/x",
      if (strict("b.org") == null) "" else strict("b.org")))
    assert(!Robots.allowedCompiled("http://c.net/private/x",
                                   strict("c.net")))
    assert(Robots.allowedCompiled("http://c.net/page", strict("c.net")))
    // and the frame composes into the stream door like any robots
    // frame: a.com emits nothing, c.net's rules gate normally
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val fr = Crawl.frontierStream(
      Crawl.parseCrawl(mem.toDF().toDF("value")),
      Array.emptyByteArray, perHostCap = 8,
      robots = Some(Crawl.compiledRobots(parsed, "graftbot",
        failClosed5xx = true)))
    val q = fr.writeStream.format("memory").queryName("fr_5xx")
      .outputMode("append").start()
    try {
      mem.addData(
        """{"doc_id":1,"url":"http://s.net/1","text":"<a href=\"http://a.com/p1\">a</a> <a href=\"http://c.net/p1\">c</a> <a href=\"http://c.net/private/x\">p</a>","lang":"en","ts":"2026-03-01T00:00:00"}""")
      q.processAllAvailable()
      val got = spark.table("fr_5xx").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === Set(("c.net", "http://c.net/p1")))
    } finally q.stop()
  }

  test("failClosed5xx: a binary-routed 5xx latest robots capture still disallows (text-null shapes enter the recency window)") {
    // a 503 whose error body carries a binary content-type routes to
    // the PAYLOAD path (text null) — before round 19 it never entered
    // the strict door's latest-capture window and the older 2xx body
    // kept ruling through the outage, the exact divergence
    // failClosed5xx exists to close
    def recBin(uri: String, statusLine: String,
               date: String): Array[Byte] = {
      val body = Array[Byte](0x47, 0x49, 0x46, 0x38) // GIF8
      val head = (s"$statusLine\r\nContent-Type: image/gif\r\n\r\n")
        .getBytes("UTF-8")
      val block = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: $date\r\nContent-Length: ${block.length}" +
        "\r\n\r\n").getBytes("UTF-8") ++ block ++
        "\r\n\r\n".getBytes("UTF-8")
    }
    val d = java.nio.file.Files.createTempDirectory("graft-rb5xxbin")
    java.nio.file.Files.write(d.resolve("r.warc.gz"),
      gz(rec("http://a.com/robots.txt", "HTTP/1.1 200 OK",
             "User-agent: *\nDisallow: /private/")) ++
      gz(recBin("http://a.com/robots.txt",
                "HTTP/1.1 503 Service Unavailable",
                date = "2026-03-02T00:00:00Z")))
    val parsed = Crawl.readWarc(spark, d.toString, extractHtml = false)
    def rulesOf(frame: org.apache.spark.sql.DataFrame)
        : Map[String, String] =
      frame.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val strict = rulesOf(
      Crawl.compiledRobots(parsed, "graftbot", failClosed5xx = true))
    assert(!Robots.allowedCompiled("http://a.com/page", strict("a.com")),
           "the text-null 503 is the latest capture and must disallow")
    // the default fail-open door is unchanged: 2xx body still rules
    val open = rulesOf(Crawl.compiledRobots(parsed, "graftbot"))
    assert(Robots.allowedCompiled("http://a.com/page", open("a.com")))
    assert(!Robots.allowedCompiled("http://a.com/private/x",
                                   open("a.com")))
  }

  test("failClosed5xx: a robots.txt REVISIT record (content unchanged) keeps the newest real body ruling, never fails open") {
    // a conditional re-fetch of robots.txt answered 304 lands as a
    // WARC revisit record (text null). It is the host's LATEST
    // capture — but it asserts the previous body is STILL VALID, so
    // the strict door must keep enforcing the captured Disallow
    // rules, not fall open because the latest row has no text
    def revisit304(uri: String, date: String): Array[Byte] = {
      val block = "HTTP/1.1 304 Not Modified\r\nETag: \"r1\"\r\n\r\n"
        .getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: $date\r\nWARC-Profile: http://netpreserve.org/" +
        s"warc/1.1/revisit/server-not-modified\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8") ++
        block ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val d = java.nio.file.Files.createTempDirectory("graft-rbrev")
    java.nio.file.Files.write(d.resolve("r.warc.gz"),
      gz(rec("http://a.com/robots.txt", "HTTP/1.1 200 OK",
             "User-agent: *\nDisallow: /private/")) ++
      gz(revisit304("http://a.com/robots.txt",
                    "2026-03-02T00:00:00Z")))
    val parsed = Crawl.readWarc(spark, d.toString, extractHtml = false)
    val strict = Crawl.compiledRobots(parsed, "graftbot",
        failClosed5xx = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!Robots.allowedCompiled("http://a.com/private/x",
                                   strict("a.com")),
      "a 304 revisit must not erase the captured Disallow rules")
    assert(Robots.allowedCompiled("http://a.com/page", strict("a.com")))
  }

  test("RFC 9111 headers land verbatim; max_age_s interprets them (garbage directives ignored)") {
    val d = java.nio.file.Files.createTempDirectory("graft-cc")
    java.nio.file.Files.write(d.resolve("cc.warc.gz"),
      gz(rec("http://c.com/ma", "HTTP/1.1 200 OK", "body",
             Seq("Cache-Control: public, max-age=3600"))) ++
      gz(rec("http://c.com/nostore", "HTTP/1.1 200 OK", "body",
             Seq("Cache-Control: NO-STORE, private"))) ++
      gz(rec("http://c.com/garbage", "HTTP/1.1 200 OK", "body",
             Seq("Cache-Control: max-age=soon, stale-while-revalidate=60"))) ++
      gz(rec("http://c.com/smaxage", "HTTP/1.1 200 OK", "body",
             Seq("Cache-Control: s-maxage=30"))) ++
      gz(rec("http://c.com/expires", "HTTP/1.1 200 OK", "body",
             // capture date 2026-03-01T00:00:00Z; expiry 2 h later
             Seq("Expires: Sun, 01 Mar 2026 02:00:00 GMT"))) ++
      gz(rec("http://c.com/expired", "HTTP/1.1 200 OK", "body",
             Seq("Expires: Sat, 01 Mar 2025 00:00:00 GMT"))) ++
      gz(rec("http://c.com/silent", "HTTP/1.1 200 OK", "body")))
    val parsed = Crawl.readWarc(spark, d.toString)
      .select(col("url"), col("cache_control"), col("expires"),
        Crawl.max_age_s(col("cache_control"), col("expires"),
                        col("ts")).as("ma"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    // headers land verbatim
    assert(parsed("http://c.com/ma")._1 === "public, max-age=3600")
    assert(parsed("http://c.com/expires")._2 ===
      "Sun, 01 Mar 2026 02:00:00 GMT")
    // interpretation: the declared lifetime in seconds
    assert(parsed("http://c.com/ma")._3 === Some(3600L))
    assert(parsed("http://c.com/nostore")._3 === Some(0L),
      "no-store = revalidate now")
    assert(parsed("http://c.com/garbage")._3 === None,
      "a non-numeric max-age is garbage, not zero")
    assert(parsed("http://c.com/smaxage")._3 === None,
      "s-maxage binds shared caches, not this consumer")
    assert(parsed("http://c.com/expires")._3 === Some(7200L),
      "Expires minus capture instant")
    assert(parsed("http://c.com/expired")._3 === Some(0L),
      "a past Expires floors at zero, never negative")
    assert(parsed("http://c.com/silent")._3 === None)
  }

  test("Retry-After lands verbatim; retry_after_s accepts both spec forms and ignores garbage") {
    val d = java.nio.file.Files.createTempDirectory("graft-ra")
    java.nio.file.Files.write(d.resolve("ra.warc.gz"),
      gz(rec("http://r.com/secs", "HTTP/1.1 503 Service Unavailable",
             "overloaded", Seq("Retry-After: 120"))) ++
      gz(rec("http://r.com/date", "HTTP/1.1 429 Too Many Requests",
             "slow down",
             // capture date 2026-03-01T00:00:00Z; retry 10 min later
             Seq("Retry-After: Sun, 01 Mar 2026 00:10:00 GMT"))) ++
      gz(rec("http://r.com/garbage", "HTTP/1.1 503 Service Unavailable",
             "x", Seq("Retry-After: soon"))) ++
      gz(rec("http://r.com/past", "HTTP/1.1 503 Service Unavailable",
             "x", Seq("Retry-After: Sat, 01 Mar 2025 00:00:00 GMT"))) ++
      gz(rec("http://r.com/silent", "HTTP/1.1 503 Service Unavailable",
             "x")))
    val rows = Crawl.readWarc(spark, d.toString)
      .select(col("url"), col("retry_after"),
        Crawl.retry_after_s(col("retry_after"), col("ts")).as("ra"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(rows("http://r.com/secs") === (("120", Some(120L))))
    assert(rows("http://r.com/date")._2 === Some(600L))
    assert(rows("http://r.com/garbage") === (("soon", None)),
      "a garbage Retry-After is ignored, never zero")
    assert(rows("http://r.com/past")._2 === Some(0L),
      "a past date floors at zero")
    assert(rows("http://r.com/silent") === ((null, None)))
    // and hostBackoff prices the host from the usable signals only:
    // 120 at T0 loses to 600 at T0 (max of the expiry instants)
    val b = graft.operators.WebGraph.hostBackoff(
        Crawl.readWarc(spark, d.toString)
          .select(graft.sources.Urls.host(col("url")).as("host"),
            col("http_status"), col("ts").cast("long").as("ts_s"),
            Crawl.retry_after_s(col("retry_after"), col("ts"))
              .as("retry_after_s")))
      .collect()
    assert(b.length === 1)
    assert(b.head.getAs[Long]("n_backoffs") === 3L) // secs, date, past
    assert(b.head.getAs[Long]("backoff_until_s") ===
      java.time.Instant.parse("2026-03-01T00:10:00Z").getEpochSecond)
  }

  test("soft-404: the documented status-remap composition demotes a lying 200") {
    import spark.implicits._
    // page history: a real body, then two DISTINCT short error bodies
    // served as 200s — the transport lie. Naive pricing reads two
    // content changes and keeps the page hot; the remap hands the
    // pricing the truth and the dead page leaves the queue.
    val caps0 = Seq(
      (1L, "http://a.com/p", "a real article with substance", 1000L),
      (2L, "http://a.com/p",
       "<html>Page Not Found - v1</html>", 2000L),
      (3L, "http://a.com/p",
       "<html>sorry, this page does not exist - v2</html>", 3000L))
      .toDF("doc_id", "url", "body", "ts_s")
      .select(col("url").as("canon_url"),
        org.apache.spark.sql.functions.xxhash64(col("body")).as("fp"),
        col("ts_s"), lit(200).as("http_status"),
        lit(false).as("revisit"), col("doc_id"), col("body"))
    def queue(remap: Boolean) = {
      val st = if (remap)
          when(Crawl.soft404(col("body"), col("http_status")), 404)
            .otherwise(col("http_status"))
        else col("http_status")
      graft.operators.WebGraph.recrawlStatusQueue(
        caps0.withColumn("http_status", st), dueBaseS = 7200L,
        errDemote = 2).collect()
    }
    val naive = queue(remap = false)
    assert(naive.length === 1 &&
      naive.head.getAs[Long]("n_changes") === 2L,
      "without the remap the lie prices as churn")
    assert(queue(remap = true).isEmpty,
      "the remap demotes the lying page out of the queue")
  }

  test("due mode: a declared max-age caps the Cho/Garcia-Molina interval (the host's own revisit clock wins)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("c.com", 1000000000000L)).toDF("host", "rank_e12")
    // a never-changing page (cho interval = full base 7200 s) that
    // declares max-age=1800: the due wakeup must fire on the
    // DECLARED clock, 4x sooner
    def ccap(id: Long, url: String, cc: String, ts: String): String = {
      val c = if (cc == null) "null" else s""""$cc""""
      s"""{"doc_id":$id,"url":"$url","text":"same body","ts":"$ts","cache_control":$c}"""
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cache_control",
        org.apache.spark.sql.types.StringType)))
    val mem = MemoryStream[String]
    val parsed = mem.toDF().toDF("value")
      .withColumn("e", from_json(col("value"), schema))
      .selectExpr("false as corrupt", "e.doc_id as doc_id",
        "e.url as url", "e.text as text", "to_timestamp(e.ts) as ts",
        "cast(null as string) as last_modified",
        "cast(null as string) as etag",
        "e.cache_control as cache_control",
        "cast(null as string) as expires")
    val q = Crawl.refetchStream(parsed, ranks,
        dueBaseS = 7200L, dueLateS = 0L)
      .writeStream.format("memory").queryName("refetch_maxage")
      .outputMode("append").start()
    def nRows(u: String): Int =
      spark.table("refetch_maxage").collect().count(_.getString(0) == u)
    try {
      mem.addData(
        ccap(1, "http://c.com/capped", "max-age=1800",
             "2026-03-01T00:00:00"),
        ccap(2, "http://c.com/plain", null, "2026-03-01T00:00:00"))
      q.processAllAvailable()
      // clock to T0+45m: past the DECLARED due instant (T0+30m),
      // far short of the learned one (T0+2h) — only the declaring
      // page fires
      mem.addData(ccap(3, "http://c.com/clock", null,
                       "2026-03-01T00:45:00"))
      q.processAllAvailable()
      assert(nRows("http://c.com/capped") === 2,
        "the declared max-age must bind the due instant")
      assert(nRows("http://c.com/plain") === 1,
        "an undeclared page keeps the learned interval")
      // same-second declaration pair in ONE batch, added in arrival-
      // REVERSED order: the state fold's (ts, doc_id) tiebreak must
      // pick the batch declaredLifetime window's winner (newest
      // doc_id = max-age 1800), not the arrival winner
      mem.addData(
        ccap(20, "http://c.com/tie", "max-age=1800",
             "2026-03-01T01:00:00"),
        ccap(10, "http://c.com/tie", "max-age=600",
             "2026-03-01T01:00:00"))
      q.processAllAvailable()
      // clock to +12m past the tie pair: the 600 s lifetime would be
      // due, the winning 1800 s one is not
      mem.addData(ccap(30, "http://c.com/clock2", null,
                       "2026-03-01T01:12:00"))
      q.processAllAvailable()
      assert(nRows("http://c.com/tie") === 1,
        "the losing same-second declaration must not shorten the clock")
      // clock past +30m: now it fires
      mem.addData(ccap(31, "http://c.com/clock3", null,
                       "2026-03-01T01:35:00"))
      q.processAllAvailable()
      assert(nRows("http://c.com/tie") === 2)
      // and the batch twin picks the same winner
      val caps = Seq(
        ("http://c.com/tie", 3600L, Integer.valueOf(200), false, 20L,
         java.lang.Long.valueOf(1800L)),
        ("http://c.com/tie", 3600L, Integer.valueOf(200), false, 10L,
         java.lang.Long.valueOf(600L)))
        .toDF("canon_url", "ts_s", "http_status", "revisit", "doc_id",
              "max_age_s")
      val dl = graft.operators.WebGraph.declaredLifetime(caps).collect()
      assert(dl.length === 1 && dl.head.getLong(1) === 1800L)
    } finally q.stop()
  }
}
