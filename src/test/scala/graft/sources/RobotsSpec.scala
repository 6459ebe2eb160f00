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
}
