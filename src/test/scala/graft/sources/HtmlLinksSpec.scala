package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Html.extractLinks]] / [[HtmlLinks]] / [[Crawl.linkEdges]] — the
  * link-graph front end. Resolution fixtures (RFC 3986 §5 cases),
  * degradation on malformed markup, the codegen'd expression end to
  * end (Column and SQL forms), and a WARC fixture driven through
  * `readWarc(extractHtml = false) -> linkEdges -> edgesFromLinks ->
  * degrees` — the whole real-corpus path.
  */
class HtmlLinksSpec extends AnyFunSuite with SparkSpec {

  private val base = "http://ex.com/dir/page.html"

  private def links(html: String, b: String = base): Seq[String] =
    Html.extractLinks(html, b).toSeq

  test("absolute, root-relative, relative, scheme-relative, query-only") {
    assert(links(
      """<a href="https://other.org/x">1</a>
        |<a href="/root/y">2</a>
        |<a href="sub/z.html">3</a>
        |<a href="//cdn.ex.com/w">4</a>
        |<a href="?page=2">5</a>""".stripMargin) === Seq(
      "https://other.org/x",
      "http://ex.com/root/y",
      "http://ex.com/dir/sub/z.html",
      "http://cdn.ex.com/w",
      "http://ex.com/dir/page.html?page=2"))
  }

  test("dot segments resolve and never escape the root") {
    assert(links("""<a href="../up.html">u</a>""") ===
      Seq("http://ex.com/up.html"))
    assert(links("""<a href="../../../../deep.html">d</a>""") ===
      Seq("http://ex.com/deep.html"))
    assert(links("""<a href="./same.html">s</a>""") ===
      Seq("http://ex.com/dir/same.html"))
  }

  test("non-navigational schemes, bare fragments, empty hrefs drop") {
    assert(links(
      """<a href="javascript:void(0)">j</a><a href="#top">f</a>
        |<a href="mailto:x@y.z">m</a><a href="tel:+1555">t</a>
        |<a href="data:text/plain,hi">d</a><a href="">e</a>
        |<a href="about:blank">a</a><a name="anchor-only">n</a>
        |<a href="ftp://files.ex.com/f">ftp</a>""".stripMargin) === Seq())
  }

  test("fragments strip; entity-decoded hrefs; quote styles; <area>") {
    assert(links(
      """<a href="/x#section">1</a>
        |<a href="/q?a=1&amp;b=2">2</a>
        |<a href='/single'>3</a>
        |<a href=/unquoted>4</a>
        |<area href="/map-target">5</area>""".stripMargin) === Seq(
      "http://ex.com/x", "http://ex.com/q?a=1&b=2",
      "http://ex.com/single", "http://ex.com/unquoted",
      "http://ex.com/map-target"))
  }

  test("<base href> rebases; first base wins; base resolves against page") {
    assert(links(
      """<base href="https://cdn.ex.com/assets/">
        |<a href="img/x.html">1</a>
        |<base href="http://ignored.com/">
        |<a href="/rooted">2</a>""".stripMargin) === Seq(
      "https://cdn.ex.com/assets/img/x.html",
      "https://cdn.ex.com/rooted"))
    // relative <base> resolves against the capture URL first
    assert(links("""<base href="sub/"><a href="x">1</a>""") ===
      Seq("http://ex.com/dir/sub/x"))
  }

  test("a late <base> affects only SUBSEQUENT links (position rule)") {
    // the href before the base resolves against the capture URL; a
    // retroactive whole-document rebase would move it to the CDN
    assert(links(
      """<a href="early.html">1</a>
        |<base href="https://cdn.ex.com/assets/">
        |<a href="late.html">2</a>""".stripMargin) === Seq(
      "http://ex.com/dir/early.html",
      "https://cdn.ex.com/assets/late.html"))
    // an anchor OPEN across the base boundary: its href appeared
    // before the base, so it keeps the capture-URL resolution
    assert(Html.extractAnchors(
      """<a href="open.html">text <base href="https://cdn.ex.com/x/"> more</a>""",
      base).toSeq ===
      Seq(("http://ex.com/dir/open.html", "text more")))
  }

  test("links inside script/style/comments never extract") {
    assert(links(
      """<script>var a = '<a href="/ghost1">x</a>';</script>
        |<style>a[href="/ghost2"] {}</style>
        |<!-- <a href="/ghost3">c</a> -->
        |<a href="/real">r</a>""".stripMargin) === Seq("http://ex.com/real"))
  }

  test("dedup keeps first-seen order; other tags' hrefs ignored") {
    assert(links(
      """<a href="/b">1</a><a href="/a">2</a><a href="/b">3</a>
        |<link href="/stylesheet.css"><img src="/pic.png">""".stripMargin)
      === Seq("http://ex.com/b", "http://ex.com/a"))
  }

  test("malformed markup degrades: parseable links still land") {
    assert(links("""<a href="/ok">fine</a><a href="/unterminated""") ===
      Seq("http://ex.com/ok"))
    assert(links("<a\nhref='/multiline'\ndisabled>x</a>") ===
      Seq("http://ex.com/multiline"))
    assert(Html.extractLinks(null, base).isEmpty)
  }

  test("unparseable base: absolute links survive, relative drop") {
    assert(links("""<a href="http://abs.com/x">a</a><a href="/rel">r</a>""",
                 "garbage-base") === Seq("http://abs.com/x"))
    assert(links("""<a href="/rel">r</a>""", null) === Seq())
  }

  test("expression form: Column and SQL agree with the Scala scanner") {
    import spark.implicits._
    val html =
      """<a href="/x">1</a><a href="http://o.org/y#f">2</a>"""
    val df = Seq((html, base)).toDF("text", "url")
    val viaCol = df.select(
        HtmlExpr.extract_links(col("text"), col("url")).as("l"))
      .collect()(0).getSeq[String](0)
    graft.functions.Functions.register(spark)
    df.createOrReplaceTempView("links_in")
    val viaSql = spark.sql(
        "SELECT extract_links(text, url) AS l FROM links_in")
      .collect()(0).getSeq[String](0)
    val expected = Html.extractLinks(html, base).toSeq
    assert(viaCol === expected)
    assert(viaSql === expected)
    // null BASE coalesces to "": absolute links still extract,
    // relatives drop; only a null TEXT nulls the result
    val nullBase = Seq((html, null.asInstanceOf[String])).toDF("text", "url")
      .select(HtmlExpr.extract_links(col("text"), col("url")).as("l"))
      .collect()(0).getSeq[String](0)
    assert(nullBase === Seq("http://o.org/y"))
    val nullText = Seq((null.asInstanceOf[String], base)).toDF("text", "url")
      .select(HtmlExpr.extract_links(col("text"), col("url")).as("l"))
      .collect()(0)
    assert(nullText.isNullAt(0))
  }

  test("hyphenated custom elements are not anchors/areas/bases") {
    // A-Frame-style markup: <a-entity href> must not fabricate a link,
    // </a-xxx> must not close a real anchor, <base-x> must not rebase
    assert(links("""<a-entity href="/scene">inner</a-entity>""") === Seq())
    assert(Html.extractAnchors(
      """<a href="/real">keep </a-widget>going</a>""", base).toSeq ===
      Seq(("http://ex.com/real", "keep going")))
    assert(links("""<base-x href="http://evil.com/"><a href="/p">x</a>""")
      === Seq("http://ex.com/p"))
  }

  // ---- anchor text ---------------------------------------------------

  test("anchors: visible text, nested tags strip, occurrences keep") {
    assert(Html.extractAnchors(
      """<a href="/x">Annual <b>Report</b> &amp; Notes</a>
        |<a href="/x">home</a>
        |<a href="/y"> spaced   text </a>""".stripMargin, base).toSeq === Seq(
      ("http://ex.com/x", "Annual Report & Notes"),
      ("http://ex.com/x", "home"),
      ("http://ex.com/y", "spaced text")))
  }

  test("anchors: nested <a> ends the previous one; EOF keeps the tail; area is empty") {
    assert(Html.extractAnchors(
      """<a href="/1">first <a href="/2">second</a>""".stripMargin, base)
      .toSeq === Seq(("http://ex.com/1", "first"),
                     ("http://ex.com/2", "second")))
    assert(Html.extractAnchors(
      """<area href="/map">""", base).toSeq === Seq(("http://ex.com/map", "")))
    // script inside an anchor never leaks into its text
    assert(Html.extractAnchors(
      """<a href="/s">ok<script>var x="bad"</script> tail</a>""",
      base).toSeq === Seq(("http://ex.com/s", "ok tail")))
  }

  test("anchors: text caps at 256 chars; extractLinks stays consistent") {
    val long = "w " * 400
    val a = Html.extractAnchors(s"""<a href="/big">$long</a>""", base)
    assert(a.length === 1 && a(0)._2.length <= 256)
    val html = """<a href="/1">x</a><a href="/2">y</a><a href="/1">z</a>"""
    assert(Html.extractLinks(html, base).toSeq ===
      Html.extractAnchors(html, base).map(_._1).distinct.toSeq)
  }

  test("anchorEdges: expression path lands (src, dst, anchor) rows") {
    import spark.implicits._
    val parsed = Seq(
      (false, "http://a.com/p",
       """<a href="http://b.org/x">Link One</a><a href="/local">Two</a>"""))
      .toDF("corrupt", "url", "text")
    val rows = Crawl.anchorEdges(parsed).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set(
      ("http://a.com/p", "http://b.org/x", "Link One"),
      ("http://a.com/p", "http://a.com/local", "Two")))
  }

  // ---- the real-corpus path: WARC -> linkEdges -> host graph --------

  private def warcRec(uri: String, body: String): Array[Byte] = {
    val block = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
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

  test("WARC raw read -> linkEdges -> edgesFromLinks -> degrees") {
    val dir = java.nio.file.Files.createTempDirectory("graft-linkwarc")
    java.nio.file.Files.write(dir.resolve("s.warc.gz"),
      gz(warcRec("http://a.com/1",
        """<html><body><a href="http://b.org/x">b</a>
          |<a href="/self">s</a><a href="//c.net/y">c</a>
          |</body></html>""".stripMargin)) ++
      gz(warcRec("http://b.org/2",
        """<html><a href="http://a.com/back">a</a>
          |<script>var x = '<a href="http://ghost.io/">g</a>';</script>
          |</html>""".stripMargin)))
    val parsed = Crawl.readWarc(spark, dir.toString, extractHtml = false)
    val edges = graft.operators.WebGraph.edgesFromLinks(
      Crawl.linkEdges(parsed))
    val e = edges.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // a.com/self is a same-host link -> self-loop drops at the host level
    assert(e === Set("a.com" -> "b.org", "a.com" -> "c.net",
                     "b.org" -> "a.com"))
    val d = graft.operators.WebGraph.degrees(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(d === Map("a.com" -> ((2L, 1L)), "b.org" -> ((1L, 1L)),
                     "c.net" -> ((0L, 1L))))
  }

  // ------------------------------------------------------------------
  // <link rel=canonical> (round 20): the HTML-declared alias channel
  // ------------------------------------------------------------------

  private def canon(html: String, b: String = base): Option[String] =
    Option(Html.extractCanonical(html, b))

  test("rel=canonical: token-list rel, case-insensitivity, relative href, entity decode") {
    assert(canon(
      """<link rel="canonical" href="https://ex.com/clean">""")
      === Some("https://ex.com/clean"))
    // rel is a token LIST, matched case-insensitively
    assert(canon(
      """<link rel="Alternate CANONICAL" href="/c?a=1&amp;b=2">""")
      === Some("http://ex.com/c?a=1&b=2"))
    // a relative href resolves against the page
    assert(canon("""<link rel=canonical href=clean.html>""")
      === Some("http://ex.com/dir/clean.html"))
    // substring tokens never match; stylesheet links ignored
    assert(canon(
      """<link rel="canonicalish" href="/no">
        |<link rel="stylesheet" href="/style.css">""".stripMargin)
      === None)
  }

  test("rel=canonical: first usable declaration wins; unresolvable ones are skipped, not fatal") {
    assert(canon(
      """<link rel="canonical" href="javascript:void(0)">
        |<link rel="canonical" href="https://ex.com/first-usable">
        |<link rel="canonical" href="https://ex.com/second">"""
        .stripMargin) === Some("https://ex.com/first-usable"))
  }

  test("rel=canonical: base-aware at the link's position; script/comment text never declares") {
    assert(canon(
      """<base href="https://cdn.example/a/">
        |<link rel="canonical" href="c.html">""".stripMargin)
      === Some("https://cdn.example/a/c.html"))
    assert(canon(
      """<script>var s='<link rel="canonical" href="/ghost">';</script>
        |<!-- <link rel="canonical" href="/ghost2"> -->"""
        .stripMargin) === None)
  }

  test("canonicalEdges: 2xx pages declare, error pages never do, self-declarations drop; aliasEdges resolves with redirect priority") {
    import spark.implicits._
    val parsed = Seq(
      // a tracking variant declaring its clean form
      (1L, "http://a.com/p?utm_x=1",
       """<link rel="canonical" href="http://a.com/p">""",
       Integer.valueOf(200), null.asInstanceOf[String]),
      // self-declaration: no edge
      (2L, "http://a.com/self",
       """<link rel="canonical" href="http://a.com/self">""",
       Integer.valueOf(200), null.asInstanceOf[String]),
      // an error page's markup describes the error, not the document
      (3L, "http://a.com/err",
       """<link rel="canonical" href="http://a.com/ghost">""",
       Integer.valueOf(404), null.asInstanceOf[String]),
      // a page captured twice — once as a 200 declaring a canonical,
      // later as a 301: both channels emit an edge, the redirect wins
      (4L, "http://a.com/both",
       """<link rel="canonical" href="http://a.com/doc-says">""",
       Integer.valueOf(200), null.asInstanceOf[String]),
      (5L, "http://a.com/both", "<html>moved</html>",
       Integer.valueOf(301), "http://a.com/transport-says"))
      .toDF("doc_id", "url", "text", "http_status", "redirect")
      .withColumn("corrupt", lit(false))
    val ce = Crawl.canonicalEdges(parsed).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ce === Map(
      "http://a.com/p?utm_x=1" -> "http://a.com/p",
      "http://a.com/both" -> "http://a.com/doc-says"))
    val resolved = graft.operators.WebGraph.resolveAliasEdges(
        parsed.select(col("url")), Crawl.aliasEdges(parsed), 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(resolved("http://a.com/p?utm_x=1") === "http://a.com/p")
    assert(resolved("http://a.com/both") ===
      "http://a.com/transport-says",
      "conflict policy: the transport beats the document")
    assert(resolved("http://a.com/err") === "http://a.com/err")
  }
}
