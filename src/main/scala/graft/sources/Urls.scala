package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the stage every web-crawl curation pipeline
  * runs between fetch and dedup (the reference stops at per-row scoring,
  * src/ingestion.py:21-38; RefinedWeb §3.1 / FineWeb run URL filtering
  * and canonical-URL dedup as the FIRST corpus gates, before any content
  * pass). Two raw capture URLs that differ only in scheme/host case, a
  * `www.` prefix, a default port, tracking parameters, parameter order,
  * a trailing slash, userinfo, or a fragment are the SAME page; crawl
  * frontiers and revisit resolution must collapse them or every content
  * stage downstream pays for the duplicates.
  *
  * Everything here is column math over built-in functions (regexp +
  * array higher-order functions), so the canonicalizer inlines into
  * whole-stage codegen and costs one projection over the scan — no UDF,
  * no shuffle, linear in URL bytes at any corpus size. The DuckDB
  * spelling of the SAME steps is single-sourced in [[canonSqlCtes]] so
  * the oracle queries (q172–q175) cannot drift from the Spark tree.
  *
  * Canonical form (RFC 3986 §6 normalizations plus the crawl-standard
  * aggressive ones):
  *   - fragment dropped; userinfo dropped
  *   - scheme and host lowercased; leading `www.` stripped
  *   - default ports stripped (`:80` for http, `:443` for https);
  *     non-default ports kept
  *   - trailing `/` runs stripped from the path (root `/` == no path)
  *   - tracking query parameters dropped (`utm_*` prefix family plus
  *     the [[TrackingParams]] list); survivors sorted byte-wise so
  *     parameter order never splits a page
  *   - inputs with no parseable `scheme://host` canonicalize to NULL
  *     (the caller's unparseable bucket — never a throw)
  */
object Urls {

  /** Exact-name tracking parameters dropped by [[canonicalize]] (the
    * `utm_*` family is matched by prefix). The click-identifier set
    * every public canonicalizer strips: ad-click ids (fbclid/gclid/
    * msclkid/dclid/twclid), mail-campaign ids (mc_cid/mc_eid), session
    * share ids (igshid), referrer tags (ref/ref_src), and analytics
    * campaign ids (s_kwcid/_ga).
    */
  val TrackingParams: Seq[String] = Seq(
    "fbclid", "gclid", "msclkid", "dclid", "twclid",
    "mc_cid", "mc_eid", "igshid", "ref", "ref_src", "s_kwcid", "_ga")

  private val SchemePat = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** IDN oracle vectors — the unicode hosts the PLANTED q172 capture
    * URLs spell and their punycode forms. Single-sourced three ways:
    * [[canonSqlCtes]] maps exactly these spellings (DuckDB cannot
    * punycode — the oracle carries the vectors literally, while the
    * Spark side runs the GENERAL java.net.IDN conversion), the q172
    * plant cycles through them, and UrlsSpec pins each pair against
    * `java.net.IDN.toASCII` so the literals provably cannot drift
    * from the real implementation.
    */
  val IdnOracleVectors: Seq[(String, String)] = Seq(
    "bücher.example" -> "xn--bcher-kva.example",
    "münchen.example" -> "xn--mnchen-3ya.example",
    "büro.example" -> "xn--bro-hoa.example")

  /** JVM shim the [[IdnHost]] codegen calls: a non-ASCII host maps to
    * its IDNA ASCII (punycode) form, lowercased — two spellings of
    * one Unicode host must not escape family caps, seen dedup, and
    * rank joins as distinct hosts. ASCII hosts (the universal case,
    * including already-encoded `xn--` forms) return UNTOUCHED via the
    * fast path — zero allocation on the hot form. A host IDNA cannot
    * convert (embedded whitespace, overlong labels) keeps its input
    * spelling: deterministic, never a throw — such hosts were never
    * fetchable anyway, and NULLing them here would silently drop rows
    * canonicalize's host guard already handles.
    */
  def idnAsciiHost(s: UTF8String): UTF8String = {
    // ASCII detection on the UTF-8 BYTES (a non-ASCII code point
    // always carries a high bit): the universal all-ASCII host takes
    // this path with zero allocation — no toString copy per row
    var i = 0
    val n = s.numBytes
    while (i < n) {
      if (s.getByte(i) < 0) {
        return try UTF8String.fromString(
          java.net.IDN.toASCII(s.toString)
            .toLowerCase(java.util.Locale.ROOT))
        catch { case scala.util.control.NonFatal(_) => s }
      }
      i += 1
    }
    s
  }

  private def idnHost(h: Column): Column =
    Bridge.column(IdnHost(Bridge.expression(h)))

  /** Canonical URL of `url`, or NULL when no `scheme://host` parses.
    * r20: one codegen'd JVM scan per row ([[canonicalizeJvm]]) — the
    * column-math spelling below ([[canonicalizeRef]]) ran ~15 chained
    * regex/array expressions per row, each re-scanning the string; the
    * scanner does one pass and only allocates the output. Behavior is
    * bit-identical: [[canonicalizeRef]] stays as the executable
    * reference and UrlsDiffSpec proves equality over the full planted
    * URL corpus plus adversarial edge cases; the q172-q200 oracles
    * re-verify the collapsed behavior end-to-end.
    */
  def canonicalize(url: Column): Column =
    Bridge.column(CanonUrl(Bridge.expression(url)))

  /** The original column-math canonicalizer — kept as the executable
    * REFERENCE for [[canonicalize]] (UrlsDiffSpec pins the JVM scanner
    * against this tree input-for-input; the DuckDB twin in
    * [[canonSqlCtes]] spells the same steps for the oracles).
    */
  private[sources] def canonicalizeRef(url: Column): Column = {
    val u = regexp_replace(coalesce(url, lit("")), "(?s)#.*$", "")
    val schemeName =
      lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = regexp_replace(
      regexp_extract(u, s"$SchemePat([^/?#]*)", 1), "^[^@]*@", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    // IDN step LAST (after lowercase + www-strip): a Unicode host
    // maps to its punycode ASCII form, so bücher.example and
    // xn--bcher-kva.example are ONE host everywhere downstream
    val host = idnHost(regexp_replace(
      lower(regexp_replace(hostport, ":[0-9]+$", "")), "^www\\.", ""))
    val portPart = when(
      port === "" ||
        (schemeName === "http" && port === "80") ||
        (schemeName === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val path = regexp_replace(
      regexp_extract(u, s"$SchemePat[^/?#]*([^?#]*)", 1), "/+$", "")
    val qraw = regexp_extract(u, "(?s)\\?(.*)$", 1)
    val params = array_sort(filter(split(qraw, "&"), p => keepParam(p)))
    val qs = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(schemeName =!= "" && host =!= "",
      concat(schemeName, lit("://"), host, portPart, path, qs))
      .otherwise(lit(null).cast("string"))
  }

  private def keepParam(p: Column): Column = {
    val name = substring_index(p, "=", 1)
    p =!= "" &&
      !(name.startsWith("utm_") || name.isin(TrackingParams: _*))
  }

  /** The URL's bare host (lowercased, `www.`-stripped), or NULL when no
    * `scheme://host` parses — the strict sibling of
    * [[Crawl.hostOf]]'s `'warc'`-fallback stratum key, for link-graph
    * vertices where a fallback would alias every garbage URL into one
    * mega-node. r20: one JVM scan ([[hostJvm]]); [[hostRef]] is the
    * original column-math reference UrlsDiffSpec pins it against.
    */
  def host(url: Column): Column =
    Bridge.column(HostOf(Bridge.expression(url)))

  private[sources] def hostRef(url: Column): Column = {
    val auth = regexp_replace(regexp_extract(
      coalesce(url, lit("")), s"$SchemePat([^/?#]*)", 1), "^[^@]*@", "")
    val h = idnHost(regexp_replace(
      regexp_replace(lower(auth), ":[0-9]+$", ""), "^www\\.", ""))
    when(h =!= "", h).otherwise(lit(null).cast("string"))
  }

  // ------------------------------------------------------------------
  // One-pass JVM scanners behind [[canonicalize]] / [[host]] (r20).
  // Semantics replicate the reference column trees EXACTLY — every
  // structural character is ASCII, so scanning on the decoded string is
  // safe, and the two case-folds that can see non-ASCII (the host) go
  // through UTF8String.toLowerCase, the same kernel Spark's lower()
  // uses. UrlsDiffSpec proves input-for-input equality.
  // ------------------------------------------------------------------

  private val TrackingSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TrackingParams.foreach(s.add)
    s
  }

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  /** (authorityStart, authorityEnd, userinfoStrippedStart) of `s` bounded
    * by `end`, or null when no `scheme://` parses at position 0. The
    * extra terminator set matches the reference regexes: authority stops
    * at '/', '?', '#'.
    */
  private def scanAuthority(s: String, end: Int): Array[Int] = {
    if (end == 0) return null
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return null
    var i = 1
    while (i < end && isSchemeChar(s.charAt(i))) i += 1
    if (i + 3 > end || s.charAt(i) != ':' || s.charAt(i + 1) != '/' ||
        s.charAt(i + 2) != '/') return null
    val aStart = i + 3
    var aEnd = aStart
    while (aEnd < end && {
        val c = s.charAt(aEnd); c != '/' && c != '?' && c != '#' }) aEnd += 1
    // userinfo: strip through the FIRST '@' ("^[^@]*@" cannot cross one)
    var hpStart = aStart
    var j = aStart
    while (j < aEnd && hpStart == aStart) {
      if (s.charAt(j) == '@') hpStart = j + 1
      j += 1
    }
    Array(i, aStart, aEnd, hpStart)
  }

  /** Trailing ":digits+" port of s[from, end): (hostEnd, portStart) —
    * portStart == end means no port (the ":([0-9]+)$" reference regex
    * needs >= 1 digit and matches only at the very end).
    */
  private def scanPort(s: String, from: Int, end: Int): (Int, Int) = {
    var k = end - 1
    while (k >= from && s.charAt(k) >= '0' && s.charAt(k) <= '9') k -= 1
    if (k >= from && k < end - 1 && s.charAt(k) == ':') (k, k + 1) else (end, end)
  }

  /** Lowercase + `www.`-strip + IDN of a raw host slice (the shared tail
    * of both scanners). Returns "" for an empty slice.
    */
  private def foldHost(raw: String): String = {
    var host = UTF8String.fromString(raw).toLowerCase.toString
    if (host.startsWith("www.")) host = host.substring(4)
    idnAsciiHost(UTF8String.fromString(host)).toString
  }

  /** One-pass JVM body of [[canonicalize]]; null input and unparseable
    * inputs both map to null (the reference's coalesce-then-guard).
    */
  def canonicalizeJvm(u0: UTF8String): UTF8String = {
    if (u0 == null) return null
    val s = u0.toString
    // fragment strips first: "(?s)#.*$" cuts at the FIRST '#'
    val hEnd = { val i = s.indexOf('#'); if (i >= 0) i else s.length }
    val auth = scanAuthority(s, hEnd)
    if (auth == null) return null
    val schemeEnd = auth(0); val aEnd = auth(2); val hpStart = auth(3)
    val scheme = s.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    val (hostEnd, portStart) = scanPort(s, hpStart, aEnd)
    val port = if (portStart < aEnd) s.substring(portStart, aEnd) else ""
    val host = foldHost(s.substring(hpStart, hostEnd))
    if (host.isEmpty) return null
    // path: authority end up to the first '?' (fragment already gone),
    // with every trailing '/' stripped ("/+$")
    var qMark = -1
    var m = aEnd
    while (m < hEnd && qMark < 0) {
      if (s.charAt(m) == '?') qMark = m
      m += 1
    }
    val pathEnd0 = if (qMark >= 0) qMark else hEnd
    var pathEnd = pathEnd0
    while (pathEnd > aEnd && s.charAt(pathEnd - 1) == '/') pathEnd -= 1
    val path = s.substring(aEnd, pathEnd)
    // query: split on '&', drop empties and tracking names, byte-sort
    val qs = if (qMark < 0) "" else {
      val parts = s.substring(qMark + 1, hEnd).split("&", -1)
      val kept = new java.util.ArrayList[UTF8String]()
      var x = 0
      while (x < parts.length) {
        val p = parts(x)
        if (p.nonEmpty) {
          val eq = p.indexOf('=')
          val name = if (eq >= 0) p.substring(0, eq) else p
          if (!(name.startsWith("utm_") || TrackingSet.contains(name)))
            kept.add(UTF8String.fromString(p))
        }
        x += 1
      }
      if (kept.isEmpty) ""
      else {
        // array_sort on strings = UTF8String binary (unsigned byte) order
        java.util.Collections.sort(kept)
        val sb = new java.lang.StringBuilder("?")
        var y = 0
        while (y < kept.size) {
          if (y > 0) sb.append('&')
          sb.append(kept.get(y).toString)
          y += 1
        }
        sb.toString
      }
    }
    val portPart =
      if (port.isEmpty || (scheme == "http" && port == "80") ||
          (scheme == "https" && port == "443")) ""
      else ":" + port
    UTF8String.fromString(scheme + "://" + host + portPart + path + qs)
  }

  /** One-pass JVM body of [[host]]. Unlike [[canonicalizeJvm]] the
    * reference tree never strips the fragment (authority just also
    * terminates at '#'), and folds case BEFORE the port strip — both
    * orders agree because port digits are case-blind.
    */
  def hostJvm(u0: UTF8String): UTF8String = {
    if (u0 == null) return null
    val s = u0.toString
    val auth = scanAuthority(s, s.length)
    if (auth == null) return null
    val hpStart = auth(3)
    val (hostEnd, _) = scanPort(s, hpStart, auth(2))
    val host = foldHost(s.substring(hpStart, hostEnd))
    if (host.isEmpty) null else UTF8String.fromString(host)
  }

  /** The classic crawl-scheduler extension skip list: path extensions
    * that name binary assets a TEXT crawler should never spend fetch
    * budget on (images, media, archives, office/binary blobs, and
    * page-furniture like css/js/fonts). Deliberately excludes html/
    * htm/php/asp/jsp/txt/xml — page-shaped, and xml/txt carry
    * sitemaps. An ASSET crawl (favicon mining, image corpora) opts
    * out via `skipAssets = false` on the frontier doors.
    */
  val AssetExtensions: Seq[String] = Seq(
    // images
    "jpg", "jpeg", "png", "gif", "webp", "bmp", "ico", "svg", "tif",
    "tiff", "avif", "heic",
    // audio / video
    "mp3", "wav", "ogg", "oga", "flac", "aac", "m4a", "mp4", "m4v",
    "avi", "mov", "mkv", "webm", "wmv", "flv", "mpg", "mpeg",
    // archives / packages
    "zip", "gz", "tgz", "bz2", "xz", "7z", "rar", "tar", "jar", "war",
    "apk", "dmg", "iso", "deb", "rpm", "msi", "exe", "bin",
    // documents / office blobs (binary, not HTML)
    "pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx", "odt", "ods",
    "odp", "ps", "eps", "epub",
    // page furniture
    "css", "js", "mjs", "map", "woff", "woff2", "ttf", "otf", "eot",
    "swf")

  /** True when the URL's PATH ends in an [[AssetExtensions]] member
    * (query/fragment stripped first). What keeps a version-suffixed
    * path like `/v1.2026` crawlable is the ALLOWLIST — `2026` does
    * match the extension pattern but is not an asset extension; the
    * {1,6}-char bound merely rejects long trailing tokens (a dotted
    * slug like `release.20260816-notes` must not read as having an
    * extension at all). The extraction is
    * anchored to the PATH component — `scheme://authority(/path)` —
    * so a path-less URL contributes no extension: `https://example
    * .zip` (the .zip/.mov gTLDs are real) is a site's front page, not
    * an archive, and canonicalization strips the root slash, so a
    * host-suffix match would silently blackhole whole domains. Pure
    * codegen projection — the frontier doors run it BEFORE any budget
    * accounting so a `.jpg` link never consumes a host's politeness
    * cap.
    */
  def isAsset(url: Column): Column = {
    val path = regexp_extract(coalesce(url, lit("")),
      s"$SchemePat[^/?#]*(/[^?#]*)", 1)
    val ext = lower(regexp_extract(path, "\\.([A-Za-z0-9]{1,6})$", 1))
    ext.isin(AssetExtensions: _*)
  }

  /** Sitemap-shaped gzip URL — `.../sitemap*.xml.gz`, the compressed
    * form sitemaps.org explicitly allows and large indexes routinely
    * publish. `gz` sits in [[AssetExtensions]] (correctly: archives
    * are not text-crawl targets), so without this exemption the
    * frontier doors' asset skip silently dead-ends every discovery
    * path into a gzipped sitemap (robots `Sitemap:` hints and
    * `<sitemapindex>` children alike). The frontier doors keep such
    * URLs as FETCH candidates: `!isAsset(url) || isSitemapGz(url)`.
    * Note the recursion still stops at the BODY — gz sitemap bodies
    * are not decoded by the capture-side content sniff
    * ([[Crawl.isSitemapCapture]] reads text, and a gz body never
    * decodes to one); a crawler that fetches one re-enters it
    * DECOMPRESSED (the fetcher's Content-Encoding layer), at which
    * point the sniff admits it. Anchored to the path's last segment,
    * like [[isAsset]], so a query string never hides the shape.
    */
  def isSitemapGz(url: Column): Column = {
    val path = regexp_extract(coalesce(url, lit("")),
      s"$SchemePat[^/?#]*(/[^?#]*)", 1)
    lower(path).rlike("sitemap[^/?#]*\\.xml\\.gz$")
  }

  // ------------------------------------------------------------------
  // DuckDB spelling — single-sourced so the q172–q175 oracles evaluate
  // the very same normalization steps the Spark tree does.
  // ------------------------------------------------------------------

  private def trackingInList: String =
    TrackingParams.map(p => s"'$p'").mkString(", ")

  /** The oracle's IDN step: DuckDB cannot punycode, so the SQL twin
    * maps the [[IdnOracleVectors]] spellings LITERALLY (UrlsSpec pins
    * each literal against java.net.IDN.toASCII — the vectors cannot
    * drift from the general implementation the Spark tree runs).
    * Hosts outside the vector table pass through unchanged, exactly
    * like [[idnAsciiHost]]'s ASCII fast path.
    */
  private def idnCaseSql(hostExpr: String): String = {
    val whens = IdnOracleVectors
      .map { case (u, a) => s"WHEN '$u' THEN '$a'" }.mkString(" ")
    s"(CASE $hostExpr $whens ELSE $hostExpr END)"
  }

  /** CTE chain text computing `canon_url` from a relation `src` that
    * carries a `url` column (all of `src`'s columns pass through).
    * Splice as: `WITH <yourCtes>, ${Urls.canonSqlCtes("plant")} SELECT
    * ... FROM canon`.
    */
  def canonSqlCtes(src: String): String =
    s"""uc0 AS (SELECT *, regexp_replace(url, '(?s)#.*$$', '') AS u FROM $src),
       |uc1 AS (SELECT *,
       |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_replace(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
       |                   '^[^@]*@', '') AS hostport,
       |    regexp_replace(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
       |                   '/+$$', '') AS path,
       |    regexp_extract(u, '(?s)\\?(.*)$$', 1) AS qraw
       |  FROM uc0),
       |uc2 AS (SELECT *,
       |    ${idnCaseSql("""regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')),
       |                   '^www\.', '')""")} AS chost,
       |    regexp_extract(hostport, ':([0-9]+)$$', 1) AS cport,
       |    list_sort(list_filter(string_split(qraw, '&'),
       |      p -> p <> '' AND NOT (starts_with(split_part(p, '=', 1), 'utm_')
       |        OR split_part(p, '=', 1) IN ($trackingInList)))) AS cparams
       |  FROM uc1),
       |canon AS (SELECT *,
       |    CASE WHEN scheme <> '' AND chost <> '' THEN
       |      scheme || '://' || chost ||
       |      CASE WHEN cport = '' OR (scheme = 'http' AND cport = '80')
       |                OR (scheme = 'https' AND cport = '443')
       |           THEN '' ELSE ':' || cport END ||
       |      path ||
       |      CASE WHEN len(cparams) > 0
       |           THEN '?' || array_to_string(cparams, '&') ELSE '' END
       |    ELSE NULL END AS canon_url
       |  FROM uc2)""".stripMargin
}

/** `idn_ascii_host(host)` — IDNA ASCII (punycode) form of a host,
  * lowercased; ASCII inputs (including `xn--` forms) pass through on
  * a zero-copy fast path, unconvertible inputs keep their spelling
  * ([[Urls.idnAsciiHost]]). Codegen'd static call; result is non-null
  * on non-null input, so defineCodeGen's null contract holds.
  */
/** `canon_url(url)` — one-pass canonical URL ([[Urls.canonicalizeJvm]]);
  * null for null/unparseable input, so codegen carries the explicit
  * null-out (defineCodeGen's non-null contract does not hold here).
  */
case class CanonUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Urls.canonicalizeJvm(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.sources.Urls.canonicalizeJvm($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): CanonUrl =
    copy(child = c)
  override def prettyName: String = "canon_url"
}

/** `url_host(url)` — one-pass bare host ([[Urls.hostJvm]]); same null
  * contract as [[CanonUrl]].
  */
case class HostOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Urls.hostJvm(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.sources.Urls.hostJvm($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): HostOf =
    copy(child = c)
  override def prettyName: String = "url_host"
}

case class IdnHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Urls.idnAsciiHost(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.sources.Urls.idnAsciiHost($c)")
  override protected def withNewChildInternal(c: Expression): IdnHost =
    copy(child = c)
  override def prettyName: String = "idn_ascii_host"
}
