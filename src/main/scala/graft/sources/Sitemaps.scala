package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap parsing (sitemaps.org protocol, XML + plain-text forms) —
  * the crawl frontier's SECOND source: outlink discovery
  * ([[Html.extractLinks]]) finds what pages link; sitemaps declare
  * what the HOST says exists, including pages nothing links to yet.
  * Like robots.txt, sitemap bodies arrive through the crawl itself
  * (a capture of `/sitemap.xml` is just another response record —
  * [[Crawl.sitemapEntries]] lifts them), so the loop stays closed.
  *
  * Parsed forms, all total and garbage-tolerant (a malformed document
  * yields the entries that do parse, never a throw):
  *   - `<urlset>` page sitemaps: each `<url>`'s `<loc>` → a `page`
  *     entry
  *   - `<sitemapindex>` index files: each `<sitemap>`'s `<loc>` → a
  *     `sitemap` entry (the caller fetches those next round)
  *   - plain-text sitemaps (one URL per line, the protocol's legacy
  *     form): every `http(s)://` line → a `page` entry
  * `<loc>` text is entity-decoded (ampersands in URLs are routinely
  * escaped in XML) and trimmed; entries must be http(s) and ≤2048
  * chars; CDATA-wrapped locs unwrap. A `<loc>` outside any
  * `<url>`/`<sitemap>` container counts as a page (the sloppy-but-
  * common form).
  */
object Sitemaps {

  /** One entry: absolute URL + kind ("page" | "sitemap") + the
    * block's three protocol freshness fields, null when absent:
    *   - `<lastmod>` verbatim (callers parse with try_to_timestamp;
    *     the protocol allows both dates and full W3C datetimes);
    *   - `<changefreq>` normalized to its lowercase protocol token
    *     (always/hourly/daily/weekly/monthly/yearly/never — anything
    *     else degrades to null, never a throw);
    *   - `<priority>` kept only when it parses as a decimal in
    *     [0.0, 1.0] (the protocol's declared range; garbage → null).
    * These are the AUTHORITATIVE freshness hints real recrawl
    * schedulers blend with observed change rates
    * ([[graft.operators.WebGraph.recrawlPriority]], the
    * Cho/Garcia-Molina declared-x-observed blend): a host declaring
    * fresh lastmods / short changefreqs earns refetches without
    * burning budget on probing.
    */
  final case class Entry(url: String, kind: String,
                         lastmod: String = null,
                         changefreq: String = null,
                         priority: String = null)

  /** The protocol's `<changefreq>` vocabulary (sitemaps.org §XML tag
    * definitions); anything else is garbage and degrades to null.
    */
  private val ChangeFreqs = Set("always", "hourly", "daily", "weekly",
                                "monthly", "yearly", "never")

  /** `<changefreq>` text → its normalized token, or null. */
  private[sources] def normChangeFreq(text: String): String = {
    if (text == null) return null
    val t = text.trim.toLowerCase(java.util.Locale.ROOT)
    if (ChangeFreqs.contains(t)) t else null
  }

  /** `<priority>` text → itself iff it parses in [0.0, 1.0], else
    * null (returned verbatim-trimmed, so "0.80" round-trips — callers
    * cast to double).
    */
  private[sources] def normPriority(text: String): String = {
    if (text == null) return null
    val t = text.trim
    try {
      val v = java.lang.Double.parseDouble(t)
      if (v >= 0.0 && v <= 1.0 && !v.isNaN) t else null
    } catch { case _: NumberFormatException => null }
  }

  def parse(body: String): Array[Entry] = {
    if (body == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    val looksXml = {
      var i = 0
      val n = math.min(body.length, 512)
      var found = false
      while (i < n && !found) {
        if (body.charAt(i) == '<') found = true
        i += 1
      }
      found
    }
    if (!looksXml) {
      // plain-text form: one URL per line
      body.linesIterator.foreach { raw =>
        val line = raw.trim
        if (line.length <= 2048 &&
            (line.regionMatches(true, 0, "http://", 0, 7) ||
             line.regionMatches(true, 0, "https://", 0, 8)))
          out += Entry(line, "page")
      }
      return out.toArray
    }
    val n = body.length
    var i = 0
    var kind = "page" // container context; default for bare <loc>
    // pending <url>/<sitemap> block: loc and lastmod may come in
    // either order, so both park until the block closes (or the next
    // block opens / EOF — missing close tags still emit)
    var inContainer = false
    var pendUrl: String = null
    var pendKind = "page"
    var pendLm: String = null
    var pendCf: String = null
    var pendPr: String = null
    def flush(): Unit = {
      if (pendUrl != null)
        out += Entry(pendUrl, pendKind, pendLm, pendCf, pendPr)
      pendUrl = null; pendLm = null; pendCf = null; pendPr = null
    }
    // tag text content, CDATA-unwrapped; returns (text, nextIndex)
    def tagText(lt: Int, close: String): (String, Int) = {
      val gt = body.indexOf('>', lt)
      if (gt < 0) return (null, n)
      val cl = body.indexOf(close, gt + 1)
      val end = if (cl < 0) n else cl
      var text = body.substring(gt + 1, end).trim
      if (text.startsWith("<![CDATA[")) {
        text = text.substring(9)
        val cd = text.indexOf("]]>")
        if (cd >= 0) text = text.substring(0, cd)
        text = text.trim
      }
      (text, if (cl < 0) n else cl + 1)
    }
    while (i < n) {
      val lt = body.indexOf('<', i)
      if (lt < 0) { flush(); return out.toArray }
      // tagAt requires a name delimiter, so "url" can't match inside
      // "<urlset" nor "sitemap" inside "<sitemapindex". Closing
      // container tags reset the context so a bare <loc> AFTER a
      // container is a page (the documented default), not a leak of
      // the previous container's kind.
      if (tagAt(body, lt, "url")) {
        flush(); kind = "page"; inContainer = true; i = lt + 1
      } else if (tagAt(body, lt, "sitemap")) {
        flush(); kind = "sitemap"; inContainer = true; i = lt + 1
      } else if (lt + 1 < n && body.charAt(lt + 1) == '/' &&
                 (tagAt(body, lt + 1, "url") ||
                  tagAt(body, lt + 1, "sitemap") ||
                  tagAt(body, lt + 1, "urlset") ||
                  tagAt(body, lt + 1, "sitemapindex"))) {
        flush(); kind = "page"; inContainer = false; i = lt + 2
      } else if (tagAt(body, lt, "loc")) {
        val (text, next) = tagText(lt, "</loc")
        i = next
        if (text != null) {
          // entity-decode (&amp; in sitemap URLs is the XML norm)
          val sb = new java.lang.StringBuilder(text.length)
          var k = 0
          while (k < text.length) {
            val c = text.charAt(k)
            if (c == '&') k = Html.entity(text, k, sb)
            else { sb.append(c); k += 1 }
          }
          val url = sb.toString
          if (url.length <= 2048 &&
              (url.regionMatches(true, 0, "http://", 0, 7) ||
               url.regionMatches(true, 0, "https://", 0, 8))) {
            if (inContainer) {
              // the protocol allows ONE loc per block; a malformed
              // repeated <loc> flushes the pending entry (metadata
              // parked so far attaches to the FIRST loc) and starts a
              // fresh one, so no entry is silently lost
              if (pendUrl != null) flush()
              pendUrl = url; pendKind = kind
            } else out += Entry(url, kind)
          }
        }
      } else if (tagAt(body, lt, "lastmod")) {
        val (text, next) = tagText(lt, "</lastmod")
        i = next
        if (inContainer && text != null && text.nonEmpty &&
            text.length <= 64 && pendLm == null)
          pendLm = text
      } else if (tagAt(body, lt, "changefreq")) {
        val (text, next) = tagText(lt, "</changefreq")
        i = next
        if (inContainer && text != null && text.length <= 64 &&
            pendCf == null)
          pendCf = normChangeFreq(text)
      } else if (tagAt(body, lt, "priority")) {
        val (text, next) = tagText(lt, "</priority")
        i = next
        if (inContainer && text != null && text.length <= 64 &&
            pendPr == null)
          pendPr = normPriority(text)
      } else i = lt + 1
    }
    flush()
    out.toArray
  }

  /** Tag-start check: `<name` followed by `>`, `/`, whitespace — so
    * `<url>` never matches inside `<urlset>`.
    */
  private def tagAt(s: String, lt: Int, name: String): Boolean =
    s.regionMatches(true, lt + 1, name, 0, name.length) && {
      val j = lt + 1 + name.length
      j >= s.length || {
        val c = s.charAt(j)
        c == '>' || c == '/' || Character.isWhitespace(c)
      }
    }

  /** Does this body look like a sitemap? Root-element sniff over the
    * first 1024 chars (after any XML declaration/comments), plus the
    * plain-text form's URL-per-line shape.
    */
  def sniff(body: String): Boolean = {
    if (body == null) return false
    val head = body.substring(0, math.min(body.length, 1024))
    val l = head.toLowerCase(java.util.Locale.ROOT)
    l.contains("<urlset") || l.contains("<sitemapindex") || {
      val first = body.linesIterator.map(_.trim).find(_.nonEmpty)
      first.exists(s => s.regionMatches(true, 0, "http://", 0, 7) ||
                        s.regionMatches(true, 0, "https://", 0, 8))
    }
  }

  /** Column form: `extract_sitemap(text)` →
    * array<struct<url, kind>>.
    */
  def extract_sitemap(text: Column): Column =
    Bridge.column(SitemapEntries(Bridge.expression(text)))

  /** Declared `<lastmod>` text → its epoch DAY (long; null on
    * garbage) — the ONE spelling of the declared-instant comparison,
    * shared by [[graft.operators.WebGraph.lastmodDue]] (the q197
    * batch twin) and the stream door's live channel
    * ([[Crawl.refetchStream]] `sitemapLastmod`): date prefix (full
    * W3C datetimes compare by their date), calendar datediff — exact
    * across engines, no timezone in the comparison path.
    */
  def lastmod_day(lastmod: Column): Column = {
    import org.apache.spark.sql.functions._
    datediff(
      try_to_timestamp(substring(lastmod, 1, 10), lit("yyyy-MM-dd"))
        .cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
  }

  def entriesU8(s: UTF8String): ArrayData =
    new GenericArrayData(parse(s.toString).map { e =>
      def u8(v: String): UTF8String =
        if (v == null) null else UTF8String.fromString(v)
      InternalRow(UTF8String.fromString(e.url),
                  UTF8String.fromString(e.kind),
                  u8(e.lastmod), u8(e.changefreq), u8(e.priority))
        .asInstanceOf[Any]
    })
}

/** `extract_sitemap(text)` — sitemap entries of an XML/plain-text
  * sitemap body, as array<struct<url:string, kind:string,
  * lastmod:string, changefreq:string, priority:string>> with kind
  * "page" or "sitemap" and the three freshness fields null when the
  * block declares none (or declares garbage).
  */
case class SitemapEntries(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("url", StringType, nullable = false),
                   StructField("kind", StringType, nullable = false),
                   StructField("lastmod", StringType, nullable = true),
                   StructField("changefreq", StringType, nullable = true),
                   StructField("priority", StringType, nullable = true))),
    containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Sitemaps.entriesU8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sources.Sitemaps.entriesU8($c)")
  override protected def withNewChildInternal(c: Expression): SitemapEntries =
    copy(child = c)
  override def prettyName: String = "extract_sitemap"
}
