package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Sitemaps]] — XML urlset / sitemapindex / plain-text parsing, the
  * codegen'd expression, and the frontier integration where a sitemap
  * capture surfaces pages nothing links to yet.
  */
class SitemapsSpec extends AnyFunSuite with SparkSpec {

  test("urlset: page locs parse; entities decode; CDATA unwraps") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>http://a.com/page1</loc>
        |       <lastmod>2026-01-01</lastmod></url>
        |  <url><loc>http://a.com/q?x=1&amp;y=2</loc></url>
        |  <url><loc><![CDATA[http://a.com/cdata?a=1&b=2]]></loc></url>
        |</urlset>""".stripMargin
    assert(Sitemaps.parse(xml).toSeq === Seq(
      Sitemaps.Entry("http://a.com/page1", "page", "2026-01-01"),
      Sitemaps.Entry("http://a.com/q?x=1&y=2", "page"),
      Sitemaps.Entry("http://a.com/cdata?a=1&b=2", "page")))
  }

  test("lastmod: either order inside a block, absent -> null, bare loc never binds one") {
    val xml =
      """<urlset>
        |  <url><lastmod>2026-02-03T04:05:06Z</lastmod>
        |       <loc>http://a.com/before</loc></url>
        |  <url><loc>http://a.com/after</loc>
        |       <lastmod>2026-02-04</lastmod></url>
        |  <url><loc>http://a.com/none</loc></url>
        |</urlset>
        |<lastmod>2026-09-09</lastmod>
        |<loc>http://a.com/bare</loc>""".stripMargin
    assert(Sitemaps.parse(xml).toSeq === Seq(
      Sitemaps.Entry("http://a.com/before", "page", "2026-02-03T04:05:06Z"),
      Sitemaps.Entry("http://a.com/after", "page", "2026-02-04"),
      Sitemaps.Entry("http://a.com/none", "page"),
      // the stray lastmod outside any block must NOT attach
      Sitemaps.Entry("http://a.com/bare", "page")))
    // index children carry lastmod too (the protocol's staleness
    // signal for whole shards)
    val idx =
      """<sitemapindex><sitemap><loc>http://a/s1.xml</loc>
        |<lastmod>2026-03-01</lastmod></sitemap></sitemapindex>""".stripMargin
    assert(Sitemaps.parse(idx).toSeq ===
      Seq(Sitemaps.Entry("http://a/s1.xml", "sitemap", "2026-03-01")))
  }

  test("changefreq/priority: valid values land, garbage degrades to null, either order binds") {
    val xml =
      """<urlset>
        |  <url><loc>http://a.com/full</loc><lastmod>2026-01-02</lastmod>
        |       <changefreq>Daily</changefreq><priority>0.80</priority></url>
        |  <url><priority>1.0</priority><changefreq>never</changefreq>
        |       <loc>http://a.com/before</loc></url>
        |  <url><loc>http://a.com/garbage</loc>
        |       <changefreq>fortnightly</changefreq>
        |       <priority>2.5</priority></url>
        |  <url><loc>http://a.com/junkpri</loc>
        |       <priority>not-a-number</priority></url>
        |  <url><loc>http://a.com/none</loc></url>
        |</urlset>""".stripMargin
    assert(Sitemaps.parse(xml).toSeq === Seq(
      Sitemaps.Entry("http://a.com/full", "page", "2026-01-02",
                     "daily", "0.80"),
      Sitemaps.Entry("http://a.com/before", "page", null, "never", "1.0"),
      // out-of-vocabulary changefreq and out-of-range priority -> null
      Sitemaps.Entry("http://a.com/garbage", "page"),
      Sitemaps.Entry("http://a.com/junkpri", "page"),
      Sitemaps.Entry("http://a.com/none", "page")))
  }

  test("repeated <loc> in one block: each emits (first keeps the parked metadata)") {
    val xml =
      """<urlset>
        |  <url><lastmod>2026-01-01</lastmod>
        |       <loc>http://a.com/first</loc>
        |       <loc>http://a.com/second</loc></url>
        |  <url><loc>http://a.com/next</loc></url>
        |</urlset>""".stripMargin
    assert(Sitemaps.parse(xml).toSeq === Seq(
      Sitemaps.Entry("http://a.com/first", "page", "2026-01-01"),
      Sitemaps.Entry("http://a.com/second", "page"),
      Sitemaps.Entry("http://a.com/next", "page")))
  }

  test("robots Sitemap: directives — group-independent, comment-stripped, absolute-only") {
    val body =
      """User-agent: someoneelse
        |Disallow: /
        |Sitemap: http://a.com/sitemap.xml  # primary
        |User-agent: *
        |sitemap: https://a.com/s2.xml
        |Sitemap: /relative/ignored.xml
        |Sitemap:
        |""".stripMargin
    assert(Robots.sitemapUrls(body).toSeq === Seq(
      "http://a.com/sitemap.xml", "https://a.com/s2.xml"))
    assert(Robots.sitemapUrls(null).isEmpty)
  }

  test("Crawl.sitemapHints: host-keyed declared sitemaps off a crawl frame") {
    import spark.implicits._
    val lines = Seq(
      """{"doc_id":1,"url":"http://a.com/robots.txt","text":"User-agent: *\nDisallow: /x\nSitemap: http://a.com/s.xml\nSitemap: http://a.com/s2.xml","lang":"en","ts":"2026-03-01T00:00:00"}""",
      """{"doc_id":2,"url":"http://b.org/robots.txt","text":"User-agent: *\nDisallow:","lang":"en","ts":"2026-03-01T00:00:00"}""")
    val hints = Crawl.sitemapHints(Crawl.parseCrawl(lines.toDF("value")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(hints === Set(("a.com", "http://a.com/s.xml"),
                         ("a.com", "http://a.com/s2.xml")))
  }

  test("sitemapindex children are kind=sitemap; mixed bare locs default to page") {
    val xml =
      """<sitemapindex>
        |  <sitemap><loc>http://a.com/sitemap-1.xml</loc></sitemap>
        |  <sitemap><loc>http://a.com/sitemap-2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemaps.parse(xml).toSeq === Seq(
      Sitemaps.Entry("http://a.com/sitemap-1.xml", "sitemap"),
      Sitemaps.Entry("http://a.com/sitemap-2.xml", "sitemap")))
    assert(Sitemaps.parse("<loc>http://x.org/bare</loc>").toSeq ===
      Seq(Sitemaps.Entry("http://x.org/bare", "page")))
    // a bare <loc> AFTER a closed container is a page — the container
    // kind must not leak past its closing tag
    assert(Sitemaps.parse(
      "<sitemapindex><sitemap><loc>http://a/s.xml</loc></sitemap>" +
        "</sitemapindex><loc>http://a/bare</loc>").toSeq === Seq(
      Sitemaps.Entry("http://a/s.xml", "sitemap"),
      Sitemaps.Entry("http://a/bare", "page")))
  }

  test("plain-text form: one URL per line; junk lines skip") {
    val txt =
      """http://a.com/1
        |not a url
        |https://b.org/2
        |""".stripMargin
    assert(Sitemaps.parse(txt).toSeq === Seq(
      Sitemaps.Entry("http://a.com/1", "page"),
      Sitemaps.Entry("https://b.org/2", "page")))
  }

  test("malformed XML degrades: parseable locs land, junk drops, no throw") {
    assert(Sitemaps.parse(
      """<urlset><url><loc>http://a.com/ok</loc></url>
        |<url><loc>ftp://nope/x</loc></url>
        |<url><loc>http://a.com/unterminated""".stripMargin).toSeq ===
      Seq(Sitemaps.Entry("http://a.com/ok", "page"),
          Sitemaps.Entry("http://a.com/unterminated", "page")))
    assert(Sitemaps.parse(null).isEmpty)
    assert(Sitemaps.parse("").isEmpty)
    assert(Sitemaps.parse("<urlset></urlset>").isEmpty)
  }

  test("sniff recognizes both forms and rejects HTML") {
    assert(Sitemaps.sniff("<?xml version=\"1.0\"?><urlset>..."))
    assert(Sitemaps.sniff("<sitemapindex>"))
    assert(Sitemaps.sniff("http://a.com/1\nhttp://a.com/2"))
    assert(!Sitemaps.sniff("<!doctype html><html>..."))
    assert(!Sitemaps.sniff(null))
  }

  test("expression form agrees with the Scala parser") {
    import spark.implicits._
    val xml = "<urlset><url><loc>http://a.com/p</loc></url></urlset>"
    graft.functions.Functions.register(spark)
    Seq(xml).toDF("text").createOrReplaceTempView("sm_in")
    val rows = spark.sql(
        "SELECT inline(extract_sitemap(text)) FROM sm_in")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("http://a.com/p", "page")))
  }

  // ---- frontier integration ------------------------------------------

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

  test("frontier(sitemaps=true): unlinked sitemap pages join the fetch list") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sitemap")
    java.nio.file.Files.write(dir.resolve("s.warc.gz"),
      gz(warcRec("http://a.com/sitemap.xml",
        """<urlset>
          |<url><loc>http://a.com/unlinked-page</loc></url>
          |<url><loc>http://a.com/linked</loc></url>
          |</urlset>""".stripMargin, ctype = "application/xml")) ++
      gz(warcRec("http://a.com/home",
        """<a href="http://a.com/linked">l</a>""")))
    val parsed = Crawl.readWarc(spark, dir.toString, extractHtml = false)
    val withSm = Crawl.frontier(parsed, perHostCap = 8, sitemaps = true)
      .collect().map(_.getString(1)).toSet
    assert(withSm === Set("http://a.com/unlinked-page",
                          "http://a.com/linked"))
    val withoutSm = Crawl.frontier(parsed, perHostCap = 8)
      .collect().map(_.getString(1)).toSet
    assert(withoutSm === Set("http://a.com/linked"),
           "without sitemaps only the linked page is discoverable")
    // index entries surface as kind=sitemap via sitemapEntries
    val kinds = Crawl.sitemapEntries(parsed)
      .select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("page"))
  }

  test("declaredHints: latest sitemap hints per page win by capture recency; arbitrary filenames sniff by content") {
    def recAt(uri: String, body: String, date: String): Array[Byte] = {
      val block = ("HTTP/1.1 200 OK\r\nContent-Type: application/xml" +
        "\r\n\r\n" + body).getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: $date\r\nContent-Length: ${block.length}" +
        "\r\n\r\n").getBytes("UTF-8") ++ block ++
        "\r\n\r\n".getBytes("UTF-8")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-declhints")
    java.nio.file.Files.write(dir.resolve("s.warc.gz"),
      // day 1: the host declares daily churn, lastmod 02-20; the
      // file's NAME matches nothing — only the content sniff admits it
      gz(recAt("http://a.com/maps/feed.xml",
        "<urlset><url><loc>http://a.com/x</loc>" +
          "<changefreq>daily</changefreq>" +
          "<lastmod>2026-02-20</lastmod></url></urlset>",
        "2026-03-01T00:00:00Z")) ++
      // day 2: a re-published sitemap updates the hints — latest wins
      gz(recAt("http://a.com/maps/feed.xml",
        "<urlset><url><loc>http://a.com/x</loc>" +
          "<changefreq>hourly</changefreq>" +
          "<lastmod>2026-03-02</lastmod></url>" +
          "<url><loc>http://a.com/y</loc></url></urlset>",
        "2026-03-02T00:00:00Z")))
    val parsed = Crawl.readWarc(spark, dir.toString, extractHtml = false)
    val hints = Crawl.declaredHints(parsed).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(hints("http://a.com/x") === (("hourly", "2026-03-02")))
    assert(hints("http://a.com/y") === ((null, null)))
    // and the frame feeds BOTH scheduler consumers directly: the
    // lastmod column drives q197's trigger...
    import spark.implicits._
    val lastCaps = Seq(("http://a.com/x",
        java.sql.Timestamp.valueOf("2026-03-01 00:00:00")
          .getTime / 1000))
      .toDF("canon_url", "last_ts_s")
    val due = graft.operators.WebGraph.lastmodDue(
        lastCaps, Crawl.declaredHints(parsed))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(due("http://a.com/x") === 1L,
      "the re-published lastmod (03-02) is newer than the capture")
  }
}
