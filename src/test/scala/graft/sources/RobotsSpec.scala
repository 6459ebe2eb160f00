package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Robots]] — RFC 9309 robots.txt parsing/evaluation and its place
  * in the crawl loop: group selection, longest-match allow/disallow,
  * `*`/`$` metacharacters, fail-open/fail-closed null policy, the
  * codegen'd expression, and the end-to-end frontier gate where the
  * robots body itself arrives as a crawl capture.
  */
class RobotsSpec extends AnyFunSuite with SparkSpec {

  private val agent = "graftbot"

  private def ok(url: String, body: String): Boolean =
    Robots.allowed(url, body, agent)

  test("basic disallow with longest-match allow override") {
    val body =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/public.html""".stripMargin
    assert(!ok("http://a.com/private/x", body))
    assert(ok("http://a.com/private/public.html", body))
    assert(ok("http://a.com/open", body))
    assert(ok("http://a.com", body), "hostless path defaults to /")
  }

  test("specific agent group overrides the wildcard group entirely") {
    val body =
      """User-agent: googlebot
        |User-agent: graftbot
        |Disallow: /both/
        |
        |User-agent: *
        |Disallow: /all/""".stripMargin
    assert(!ok("http://a.com/both/x", body))
    assert(ok("http://a.com/all/x", body),
           "specific group wins — wildcard rules must not merge in")
    assert(!Robots.allowed("http://a.com/all/x", body, "otherbot"),
           "unknown agents fall back to the * group")
  }

  test("a User-agent line after rules starts a FRESH group") {
    val body =
      """User-agent: graftbot
        |Disallow: /g/
        |User-agent: otherbot
        |Disallow: /o/""".stripMargin
    assert(!ok("http://a.com/g/x", body))
    assert(ok("http://a.com/o/x", body),
           "the second group's rules must not leak into the first")
  }

  test("* spans, $ anchors, query participates in the match target") {
    val body =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /cgi/*?session=""".stripMargin
    assert(!ok("http://a.com/docs/file.pdf", body))
    assert(ok("http://a.com/docs/file.pdfx", body), "anchored must not prefix")
    assert(ok("http://a.com/docs/file.pdf?x=1", body),
           "$ anchors the full path+query")
    assert(!ok("http://a.com/cgi/run?session=42", body))
    assert(ok("http://a.com/cgi/run?other=1", body))
  }

  test("empty Disallow allows all; comments and unknown directives skip") {
    val body =
      """# robots for everyone
        |User-agent: *
        |Crawl-delay: 10
        |Sitemap: http://a.com/sitemap.xml
        |Disallow:   # empty = allow all
        |garbage line without a colon""".stripMargin
    assert(ok("http://a.com/anything", body))
  }

  test("URL fragments don't match; null body fails open, null url closed") {
    val body = "User-agent: *\nDisallow: /x"
    assert(!ok("http://a.com/x", body))
    assert(!ok("http://a.com/x#frag", body),
           "the fragment is stripped from the match target, /x still matches")
    assert(ok("http://a.com/y#frag", body))
    assert(Robots.allowed("http://a.com/p", null, agent))
    assert(!Robots.allowed(null, "", agent))
    assert(Robots.allowed("http://a.com/p", "", agent))
  }

  test("group binding is exact-or-prefix, never substring (RFC 9309 §2.2.1)") {
    // a group for a DIFFERENT product ("graftbot-news") must not bind
    // to "graftbot" — under bidirectional-substring matching it would,
    // and its (empty or permissive) rules would displace the site's
    // wildcard Disallows entirely (fail-open against site policy)
    val body =
      """User-agent: graftbot-news
        |Allow: /
        |
        |User-agent: *
        |Disallow: /private/""".stripMargin
    assert(!ok("http://a.com/private/x", body),
           "the graftbot-news group must not bind; * still disallows")
    // a one-letter token is the degenerate substring hijack
    val oneLetter =
      """User-agent: b
        |Allow: /
        |
        |User-agent: *
        |Disallow: /private/""".stripMargin
    assert(!ok("http://a.com/private/x", oneLetter))
    // group token as PREFIX of the product token DOES bind
    val prefix =
      """User-agent: graft
        |Disallow: /g/
        |
        |User-agent: *
        |Disallow: /w/""".stripMargin
    assert(!ok("http://a.com/g/x", prefix), "prefix group binds")
    assert(ok("http://a.com/w/x", prefix),
           "specific group replaces * entirely")
  }

  test("a matching specific group with NO rules still suppresses * (allow all)") {
    val body =
      """User-agent: graftbot
        |Crawl-delay: 5
        |
        |User-agent: *
        |Disallow: /""".stripMargin
    assert(ok("http://a.com/anything", body),
           "RFC 9309: the most specific group is selected even if empty")
  }

  test("compiled path agrees with the direct path on every case") {
    val bodies = Seq(
      "User-agent: *\nDisallow: /private/\nAllow: /private/public.html",
      "User-agent: graftbot\nDisallow: /g/\nUser-agent: *\nDisallow: /w/",
      "User-agent: *\nDisallow: /*.pdf$\nDisallow: /cgi/*?session=",
      "User-agent: *\nDisallow:",
      "", null)
    val urls = Seq("http://a.com/private/x",
      "http://a.com/private/public.html", "http://a.com/g/x",
      "http://a.com/w/x", "http://a.com/docs/file.pdf",
      "http://a.com/cgi/run?session=42", "http://a.com/open")
    for (b <- bodies; u <- urls) {
      val compiled = Robots.compile(b, agent)
      assert(Robots.allowedCompiled(u, compiled) ===
             Robots.allowed(u, b, agent),
             s"compiled/direct disagree on ($u, $b)")
    }
  }

  test("crawl-delay and request-rate bind per group; units and garbage handled") {
    assert(Robots.crawlDelay(
      "User-agent: *\nCrawl-delay: 10\nDisallow: /x", agent) === 10.0)
    // request-rate n/t: 1 req per 10 s -> 10 s interval
    assert(Robots.crawlDelay(
      "User-agent: *\nRequest-rate: 1/10", agent) === 10.0)
    // unit suffixes: 2/1m -> 30 s interval; 1/1h -> 3600 s
    assert(Robots.crawlDelay(
      "User-agent: *\nRequest-rate: 2/1m", agent) === 30.0)
    assert(Robots.crawlDelay(
      "User-agent: *\nRequest-rate: 1/1h", agent) === 3600.0)
    // both spellings: the max (most conservative) wins
    assert(Robots.crawlDelay(
      "User-agent: *\nCrawl-delay: 5\nRequest-rate: 1/20", agent) === 20.0)
    // a specific group's delay replaces the wildcard's, like rules
    val grouped =
      """User-agent: graftbot
        |Crawl-delay: 3
        |
        |User-agent: *
        |Crawl-delay: 60""".stripMargin
    assert(Robots.crawlDelay(grouped, agent) === 3.0)
    assert(Robots.crawlDelay(grouped, "otherbot") === 60.0)
    // garbage / absent -> -1
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: soon", agent) === -1.0)
    assert(Robots.crawlDelay("User-agent: *\nDisallow: /x", agent) === -1.0)
    assert(Robots.crawlDelay(null, agent) === -1.0)
  }

  test("a malformed empty User-agent never hijacks the * group") {
    val body =
      """User-agent:
        |Disallow: /
        |User-agent: *
        |Disallow: /tmp/""".stripMargin
    assert(ok("http://a.com/page", body),
           "the empty-agent group must not bind to every crawler")
    assert(!ok("http://a.com/tmp/x", body), "the * group still applies")
  }

  test("a '/' inside the query is not the path start; query-only targets get the root") {
    val body = "User-agent: *\nDisallow: /priv"
    assert(ok("http://h.com?a=/priv", body),
           "the real path is '/', the '/priv' lives in the query")
    assert(!ok("http://h.com/priv?x=1", body))
    val qbody = "User-agent: *\nDisallow: /?session="
    assert(!ok("http://h.com?session=1", qbody),
           "query-only target matches as /?session=...")
  }

  test("expression form: codegen column and SQL agree; null policy holds") {
    import spark.implicits._
    val body = "User-agent: *\nDisallow: /no/"
    val df = Seq(
      ("http://a.com/no/x", body),
      ("http://a.com/yes", body),
      ("http://a.com/no/x", null.asInstanceOf[String]), // no robots: open
      (null.asInstanceOf[String], body)                 // no url: closed
    ).toDF("url", "robots_txt")
    val viaCol = df.select(
        Robots.robots_allowed(col("url"), col("robots_txt"),
                              lit(agent)).as("a"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(viaCol === Seq(false, true, true, false))
    graft.functions.Functions.register(spark)
    df.createOrReplaceTempView("robots_in")
    val viaSql = spark.sql(
      s"SELECT coalesce(robots_allowed(url, coalesce(robots_txt, ''), " +
        s"'$agent'), false) AS a FROM robots_in")
      .collect().map(_.getBoolean(0)).toSeq
    assert(viaSql === viaCol)
  }

  // ---- the loop: robots arrives as a capture, gates the frontier ----

  private def warcRec(uri: String, body: String,
                      ctype: String = "text/html"): Array[Byte] = {
    val block = s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n" + body
    val bb = block.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-03-01T00:00:00Z\r\nContent-Length: ${bb.length}" +
      "\r\n\r\n").getBytes("UTF-8") ++ bb ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val os = new java.util.zip.GZIPOutputStream(bos)
    os.write(b); os.close()
    bos.toByteArray
  }

  test("patternMatches agrees with reference regex semantics on 20k seeded cases") {
    // Differential fuzz of the longest-match core that now guards
    // every frontier path: translate each robots pattern to the regex
    // the RFC semantics describe ('*' = any run, trailing '$' = end
    // anchor, everything else literal, match = PREFIX of the target)
    // and compare decisions on random paths over a small alphabet
    // (collision-rich so matches actually happen).
    def reference(path: String, pattern: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val pat = if (anchored) pattern.dropRight(1) else pattern
      val rx = pat.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*")
      val full = if (anchored) rx else rx + ".*"
      java.util.regex.Pattern.compile(s"^$full$$",
        java.util.regex.Pattern.DOTALL).matcher(path).matches()
    }
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "ab/*.?"
    def randStr(maxLen: Int, withMeta: Boolean): String = {
      val n = rnd.nextInt(maxLen + 1)
      val chars = if (withMeta) alphabet else "ab/.?"
      (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }
    var checked = 0
    for (_ <- 1 to 20000) {
      val path = "/" + randStr(8, withMeta = false)
      val pattern0 = "/" + randStr(6, withMeta = true)
      val pattern = if (rnd.nextBoolean()) pattern0 + "$" else pattern0
      // mid-pattern '$' is literal in our parser and messy to mirror
      // in the reference — the RFC only defines a TRAILING '$'
      if (!pattern.dropRight(1).contains('$')) {
        checked += 1
        assert(Robots.patternMatches(path, pattern) ===
                 reference(path, pattern),
               s"path=$path pattern=$pattern")
      }
    }
    assert(checked > 19000)
  }

  test("parsers never throw on seeded garbage (robots, sitemap urls, sitemap bodies)") {
    val rnd = new scala.util.Random(20260817L)
    val chars = "<>/&#:*$ \n\r\tabSU!][%"
    for (_ <- 1 to 2000) {
      val s = (0 until rnd.nextInt(400))
        .map(_ => chars(rnd.nextInt(chars.length))).mkString
      Robots.parseRules(s, "graftbot")
      Robots.crawlDelay(s, "graftbot")
      Robots.sitemapUrls(s)
      Sitemaps.parse(s)
    }
  }

  test("frontier(robotsAgent): disallowed discoveries never reach the fetch list") {
    val dir = java.nio.file.Files.createTempDirectory("graft-robots")
    java.nio.file.Files.write(dir.resolve("s.warc.gz"),
      gz(warcRec("http://b.org/robots.txt",
        "User-agent: *\nDisallow: /private/\n", ctype = "text/plain")) ++
      gz(warcRec("http://a.com/1",
        """<a href="http://b.org/private/secret">no</a>
          |<a href="http://b.org/open/page">yes</a>
          |<a href="http://c.net/anything">open-host</a>""".stripMargin)))
    val parsed = Crawl.readWarc(spark, dir.toString, extractHtml = false)
    val withRobots = Crawl.frontier(parsed, perHostCap = 8,
        robotsAgent = Some(agent))
      .collect().map(r => r.getString(1)).toSet
    assert(withRobots === Set("http://b.org/open/page",
                              "http://c.net/anything"))
    // without the gate the disallowed URL is present (control)
    val without = Crawl.frontier(parsed, perHostCap = 8)
      .collect().map(r => r.getString(1)).toSet
    assert(without.contains("http://b.org/private/secret"))
  }

  test("the robots body parses once per HOST, not once per candidate") {
    import spark.implicits._
    // one page on a.com discovering 200 URLs on b.org; b.org has a
    // robots.txt. Under the compiled gate, b.org's body parses when
    // robots_compile projects the host row — NOT once per candidate.
    val links = (1 to 200)
      .map(i => s"""<a href="http://b.org/p$i">x</a>""").mkString("\n")
    val dir = java.nio.file.Files.createTempDirectory("graft-robots-n")
    java.nio.file.Files.write(dir.resolve("s.warc.gz"),
      gz(warcRec("http://b.org/robots.txt",
        "User-agent: *\nDisallow: /private/\n", ctype = "text/plain")) ++
      gz(warcRec("http://a.com/1", links)))
    val parsed = Crawl.readWarc(spark, dir.toString, extractHtml = false)
      .cache()
    parsed.count() // materialize before counting parses
    Robots.parseCount.set(0L)
    val n = Crawl.frontier(parsed, perHostCap = 1000,
      robotsAgent = Some(agent)).count()
    parsed.unpersist()
    assert(n >= 200L, s"expected the 200 discoveries, got $n")
    val parses = Robots.parseCount.get
    // one compile per host row (b.org) with slack for plan-level
    // re-evaluation; the old body-join path paid one parse per
    // candidate (200+)
    assert(parses < 20L,
      s"robots body parsed $parses times for 200 candidates on one host")
  }

  test("frontier(crawlDelayWindow): a declared Crawl-delay tightens the host cap") {
    // b.org declares Crawl-delay: 10; window 30 s -> cap floor(30/10)=3.
    // c.net declares none -> keeps perHostCap.
    val bLinks = (1 to 6)
      .map(i => s"""<a href="http://b.org/p$i">x</a>""").mkString("\n")
    val cLinks = (1 to 6)
      .map(i => s"""<a href="http://c.net/p$i">x</a>""").mkString("\n")
    val dir = java.nio.file.Files.createTempDirectory("graft-delay")
    java.nio.file.Files.write(dir.resolve("s.warc.gz"),
      gz(warcRec("http://b.org/robots.txt",
        "User-agent: *\nCrawl-delay: 10\n", ctype = "text/plain")) ++
      gz(warcRec("http://a.com/1", bLinks + "\n" + cLinks)))
    val parsed = Crawl.readWarc(spark, dir.toString, extractHtml = false)
    val f = Crawl.frontier(parsed, perHostCap = 5,
        robotsAgent = Some(agent), crawlDelayWindow = 30.0)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val byHost = f.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byHost("b.org") === 3, s"delay cap: $byHost")
    assert(byHost("c.net") === 5, s"no-delay host keeps perHostCap: $byHost")
    // batch default (no window): delay ignored, both hosts at perHostCap
    val f0 = Crawl.frontier(parsed, perHostCap = 5,
        robotsAgent = Some(agent))
      .collect().map(r => r.getString(0)).toSeq
    assert(f0.count(_ == "b.org") === 5)
    // min-1 probe guarantee: a huge delay still yields one fetch
    val f1 = Crawl.frontier(parsed, perHostCap = 5,
        robotsAgent = Some(agent), crawlDelayWindow = 1.0)
      .collect().map(r => r.getString(0)).toSeq
    assert(f1.count(_ == "b.org") === 1, "min-1 probe guarantee")
  }
}
