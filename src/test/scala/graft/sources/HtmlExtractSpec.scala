package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** [[Html.extractText]] — the deterministic tag-strip extractor every
  * WARC body passes through by default — and the HTTP response-block
  * processing behind it ([[Crawl.httpText]]/[[Crawl.dechunk]]):
  * header-terminator variants, chunked transfer-encoding, declared
  * charsets, Content-Encoding, and the HTML gate. Malformed input
  * must DEGRADE (tag-strip what is parseable, count what is not),
  * never throw.
  */
class HtmlExtractSpec extends AnyFunSuite {

  // ---- extractText ---------------------------------------------------

  test("nested tags strip to prose with cell/list boundaries preserved") {
    assert(Html.extractText(
      "<div><p>Hello <b>world</b></p><p>again</p></div>") ===
      "Hello world again")
    assert(Html.extractText(
      "<table><tr><td>a</td><td>b</td></tr></table>") === "a b",
      "adjacent cells must not glue tokens")
    assert(Html.extractText("<ul><li>one</li><li>two</li></ul>") ===
      "one two")
  }

  test("character references decode; unknown/out-of-range stay verbatim") {
    assert(Html.extractText(
      "a &amp; b &lt;tag&gt; &#65;&#x42; &nbsp;c") === "a & b <tag> AB c")
    assert(Html.extractText("&quot;x&quot; &apos;y&apos;") === "\"x\" 'y'")
    assert(Html.extractText("keep &unknown; and &#xFFFFFFFF; raw") ===
      "keep &unknown; and &#xFFFFFFFF; raw")
    assert(Html.extractText("lone & ampersand") === "lone & ampersand")
    // a reference decoded AFTER tag removal lands as literal text,
    // exactly as a browser renders escaped markup
    assert(Html.extractText("<p>&lt;script&gt;alert(1)&lt;/script&gt;</p>")
      === "<script>alert(1)</script>")
  }

  test("script/style subtrees and comments drop wholesale") {
    assert(Html.extractText(
      "<p>keep</p><script>var x = \"</p>no</p>\";</script>" +
        "<style>p { color: red }</style><p>tail</p>") === "keep tail")
    assert(Html.extractText("<SCRIPT src=\"x.js\">gone()</SCRIPT>ok") ===
      "ok", "raw-text elements match case-insensitively")
    assert(Html.extractText("a<!-- <p>gone</p> -->b") === "a b")
    assert(Html.extractText("<scripted-thing>visible</scripted-thing>") ===
      "visible", "<script must only match the exact tag name")
  }

  test("malformed markup degrades to tag-strip, never throws") {
    assert(Html.extractText("text <unclosed attr=\"oops") === "text",
      "unterminated tag drops the unparseable tail")
    assert(Html.extractText("a<!-- never closed") === "a")
    assert(Html.extractText("a<script>never closed") === "a")
    assert(Html.extractText("5 < 6 and 7 > 2") === "5 < 6 and 7 > 2",
      "a bare '<' before a non-tag char is literal text")
    assert(Html.extractText("<a href=\"x>y\">link</a>") === "link",
      "'>' inside a quoted attribute value must not end the tag")
    assert(Html.extractText("") === "")
    assert(Html.extractText(null) === null)
  }

  test("whitespace normalizes to single spaces (the corpus tokenizer contract)") {
    assert(Html.extractText("<p>\n  line one\n</p>\n<p>line\ttwo</p>") ===
      "line one line two")
    assert(Html.extractText("   leading and trailing   ") ===
      "leading and trailing")
  }

  // ---- extractMainText (opt-in boilerplate removal) ------------------

  test("extractMainText: nav/link-farm blocks drop by link density, prose survives") {
    val page = "<html><body>" +
      "<nav><a href='/'>Home</a> <a href='/a'>About</a> " +
      "<a href='/c'>Contact</a> <a href='/d'>Shop</a> " +
      "<a href='/e'>Careers here now</a></nav>" +
      "<article><p>The quick brown fox jumps over the lazy dog near " +
      "the river bank.</p></article>" +
      "<footer><a href='/t'>Terms</a> <a href='/p'>Privacy</a></footer>" +
      "</body></html>"
    assert(Html.extractMainText(page) ===
      "The quick brown fox jumps over the lazy dog near the river bank.")
  }

  test("extractMainText: short blocks, code blocks, and javascript mentions drop") {
    val page = "<div>Menu</div>" +
      "<p>This sentence is long enough to be real content for sure.</p>" +
      "<p>if (x) { return y; } else { return z; } and more words here</p>" +
      "<p>Please enable javascript to view this site properly and fully.</p>" +
      "<h2>Buy now</h2>"
    assert(Html.extractMainText(page) ===
      "This sentence is long enough to be real content for sure.")
  }

  test("extractMainText: a prose block with an inline link keeps (low link density)") {
    val page = "<p>For more than enough background detail consult " +
      "<a href='/ref'>this reference</a> before continuing with the " +
      "procedure described below.</p>"
    val out = Html.extractMainText(page)
    assert(out.contains("this reference") && out.contains("procedure"),
           out)
    assert(Html.extractMainText(null) === null)
    assert(Html.extractMainText("") === "")
  }

  test("extractBlocks: link density accounting and block boundaries") {
    val bs = Html.extractBlocks(
      "<p>plain words here</p><p><a>all link text</a></p>")
    assert(bs.length === 2, bs)
    assert(bs(0).linkDensity === 0.0)
    assert(bs(1).linkDensity === 1.0, bs(1))
    assert(bs(0).words === 3)
  }

  test("sniffHtml: doctype/html root match, prose does not") {
    assert(Html.sniffHtml("<!DOCTYPE html><html><body>x</body></html>"))
    assert(Html.sniffHtml("  \n<html lang=\"en\">"))
    assert(Html.sniffHtml("<?xml version=\"1.0\"?><html>x</html>"))
    assert(!Html.sniffHtml("plain prose with a < b comparisons"))
    assert(!Html.sniffHtml(null))
  }

  // ---- dechunk -------------------------------------------------------

  private def b(s: String) = s.getBytes("ISO-8859-1")

  test("dechunk: hex sizes, extensions, CRLF and bare-LF framing") {
    assert(Crawl.dechunk(b("5\r\nHello\r\n6\r\n world\r\n0\r\n\r\n"))
      .map(new String(_, "UTF-8")) === Right("Hello world"))
    assert(Crawl.dechunk(b("5;ext=1\r\nHello\r\n0\r\n\r\n"))
      .map(new String(_, "UTF-8")) === Right("Hello"),
      "chunk extensions must be ignored")
    assert(Crawl.dechunk(b("5\nHello\n0\n\n"))
      .map(new String(_, "UTF-8")) === Right("Hello"),
      "bare-LF chunk framing (non-compliant servers) must parse")
    assert(Crawl.dechunk(b("A\r\n0123456789\r\n0\r\n"))
      .map(new String(_, "UTF-8")) === Right("0123456789"),
      "hex chunk sizes")
  }

  test("dechunk: malformed framing is Left(reason), never a throw") {
    assert(Crawl.dechunk(b("XYZ\r\nHello\r\n0\r\n\r\n")).isLeft)
    assert(Crawl.dechunk(b("FFFFFFFFFF\r\nHello")).isLeft,
      "chunk size past Int range is damage, not an allocation")
    assert(Crawl.dechunk(b("10\r\nshort")).isLeft,
      "a chunk overrunning the block is damage")
    assert(Crawl.dechunk(b("5\r\nHello\r\n")).isLeft,
      "a body missing its terminating 0-chunk is damage")
  }

  // ---- httpText ------------------------------------------------------

  private def right(e: Either[String, String]): String =
    e.getOrElse(fail(s"expected Right, got $e"))

  test("httpText: CRLF and bare-LF header terminators both strip; earliest wins") {
    val crlf = b("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nbody text")
    assert(right(Crawl.httpText(crlf, extractHtml = true)) === "body text")
    val lf = b("HTTP/1.1 200 OK\nContent-Type: text/plain\n\nbody text")
    assert(right(Crawl.httpText(lf, extractHtml = true)) === "body text",
      "bare-LF headers (non-compliant servers) leave no header block in text")
    val noSep = b("HTTP/1.1 200 OK\r\nContent-Type: text/plain")
    assert(right(Crawl.httpText(noSep, extractHtml = true))
      .startsWith("HTTP/1.1"), "no terminator -> whole block serves as text")
  }

  test("httpText: chunked transfer-encoding de-chunks; malformed chunking is Left") {
    val ok = b("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Type: text/plain\r\n\r\n5\r\nHello\r\n6\r\n world\r\n0\r\n\r\n")
    assert(right(Crawl.httpText(ok, extractHtml = true)) === "Hello world")
    val bad = b("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "NOTHEX\r\nHello\r\n0\r\n\r\n")
    assert(Crawl.httpText(bad, extractHtml = true).isLeft)
  }

  test("httpText: declared charset decodes, UTF-8 fallback, bad charset degrades") {
    val latin = b("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain; charset=ISO-8859-1\r\n\r\n") ++
      Array[Byte]('c', 'a', 'f', 0xE9.toByte)
    assert(right(Crawl.httpText(latin, extractHtml = true)) === "café")
    val quoted = b("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain; charset=\"ISO-8859-1\"\r\n\r\n") ++
      Array[Byte](0xE9.toByte)
    assert(right(Crawl.httpText(quoted, extractHtml = true)) === "é")
    val unknownCs = b("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain; charset=no-such-cs\r\n\r\nplain")
    assert(right(Crawl.httpText(unknownCs, extractHtml = true)) === "plain",
      "an unknown charset falls back to UTF-8, never throws")
    // malformed UTF-8 degrades to replacement chars (the historical
    // `new String` policy), never a throw
    val broken = b("HTTP/1.1 200 OK\r\n\r\n") ++
      Array[Byte](0xFF.toByte, 0xFE.toByte)
    assert(right(Crawl.httpText(broken, extractHtml = true)).nonEmpty)
  }

  test("httpText: in-document <meta charset> prescan fills a silent HTTP header") {
    // HTML5 meta form, no charset in the HTTP header
    val meta = b("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><head><meta charset=\"iso-8859-1\"></head><body>caf") ++
      Array[Byte](0xE9.toByte) ++ b("</body></html>")
    assert(right(Crawl.httpText(meta, extractHtml = true)) === "café")
    // legacy http-equiv form
    val equiv = b("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"></head><body>caf") ++
      Array[Byte](0xE9.toByte) ++ b("</body></html>")
    assert(right(Crawl.httpText(equiv, extractHtml = true)) === "café")
    // the transport header is authoritative over a conflicting meta
    val conflict = b("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n\r\n" +
      "<html><head><meta charset=\"utf-16\"></head><body>plain</body></html>")
    assert(right(Crawl.httpText(conflict, extractHtml = true)) === "plain")
    // a garbage meta name degrades to the UTF-8 fallback, never throws
    val junk = b("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><head><meta charset=\"no-such-cs\"></head><body>ok</body></html>")
    assert(right(Crawl.httpText(junk, extractHtml = true)) === "ok")
  }

  test("httpText: Content-Encoding gzip inflates; a lying header fails open") {
    val payload = {
      val bos = new java.io.ByteArrayOutputStream()
      val os = new java.util.zip.GZIPOutputStream(bos)
      os.write(b("inflated body")); os.close()
      bos.toByteArray
    }
    val gz = b("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Content-Type: text/plain\r\n\r\n") ++ payload
    assert(right(Crawl.httpText(gz, extractHtml = true)) === "inflated body")
    val lying = b("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Content-Type: text/plain\r\n\r\nnot actually gzip")
    assert(right(Crawl.httpText(lying, extractHtml = true)) ===
      "not actually gzip", "a mis-declared encoding serves the raw bytes")
  }

  test("httpText: the HTML gate — declared type, sniff fallback, plain text untouched") {
    val html = b("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
      "<html><body><p>Hello &amp; goodbye</p><script>x()</script></body></html>")
    assert(right(Crawl.httpText(html, extractHtml = true)) ===
      "Hello & goodbye")
    assert(right(Crawl.httpText(html, extractHtml = false))
      .contains("<body>"), "extractHtml=false keeps the raw markup")
    val sniffed = b("HTTP/1.1 200 OK\r\n\r\n<!DOCTYPE html><html><body>sniffed</body></html>")
    assert(right(Crawl.httpText(sniffed, extractHtml = true)) === "sniffed",
      "no Content-Type -> the sniffer decides")
    val plain = b("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
      "a <tagless comparison: 1 < 2")
    assert(right(Crawl.httpText(plain, extractHtml = true)) ===
      "a <tagless comparison: 1 < 2",
      "declared plain text must never be tag-stripped")
  }
}
