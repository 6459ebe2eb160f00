package graft.sources

/** Deterministic pure-JVM HTML-to-text extraction — the stage every
  * real Common-Crawl consumer (CCNet, C4, FineWeb) runs between the
  * WARC fetch and curation, so the quality/LM/NB gates score prose
  * tokens instead of `<div class=...>` markup. Reference analogue: the
  * reference pipeline ingests already-clean text (ingestion.py feeds
  * plain records), so this is the extension surface a crawl-fed
  * deployment needs, not a port.
  *
  * The DEFAULT ([[extractText]]) is tag-strip extraction, which keeps
  * every piece of prose; [[extractMainText]] layers the opt-in
  * C4/jusText-style boilerplate classification on top (block
  * granularity, link density + length rules). Tag-strip rules:
  *   - `<script>`/`<style>` subtrees and `<!-- comments -->` are
  *     dropped wholesale (their content is code, never prose);
  *   - every other tag is replaced by a single space (the C4
  *     convention — cell/list item boundaries must not glue tokens);
  *   - character references decode after tag removal (`&amp;` -> `&`,
  *     `&#65;`/`&#x41;` -> `A`), so an escaped `&lt;script&gt;` lands
  *     as literal text exactly as a browser renders it;
  *   - whitespace runs collapse to one space (the corpus tokenizer is
  *     `split(text, ' ')` — embedded newlines would glue tokens).
  *
  * Malformed markup DEGRADES, never throws: a bare `<` before a
  * non-tag character is literal text (the HTML5 tokenizer rule, so
  * `5 < 6` survives), an unterminated tag/comment/script drops the
  * unparseable tail, an out-of-range numeric reference stays verbatim.
  * Both extractors are pure total `String => String` — applied
  * per-row inside the WARC member parser (batch and stream share
  * them), or via `readCrawl(extractHtml = true)` on a crawl frame.
  */
object Html {

  private val named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** True if the tag name starting at `i` ends at `j` (attribute list,
    * whitespace, `/` or `>` follows) — guards `<script>` matching so
    * `<scripted-thing>` stays a generic tag.
    */
  private def nameEnds(s: String, j: Int): Boolean =
    j >= s.length || { val c = s.charAt(j)
      c == '>' || c == '/' || Character.isWhitespace(c) }

  /** Skip a raw-text element (`script`/`style`): from the opening `<`
    * to just past the matching case-insensitive `</name ... >`.
    * Unterminated -> end of input (the degrade-to-tag-strip path; a
    * browser also swallows to EOF).
    */
  private def skipRawText(s: String, from: Int, name: String): Int = {
    val close = "</" + name
    var i = from
    while (i < s.length) {
      val j = s.indexOf('<', i)
      if (j < 0) return s.length
      if (s.regionMatches(true, j, close, 0, close.length) &&
          nameEnds(s, j + close.length)) {
        val gt = s.indexOf('>', j)
        return if (gt < 0) s.length else gt + 1
      }
      i = j + 1
    }
    s.length
  }

  /** Skip a generic tag from its `<`: to just past the closing `>`,
    * honoring quoted attribute values (`<a title="x>y">`).
    * Unterminated -> end of input.
    */
  private def skipTag(s: String, from: Int): Int = {
    var i = from + 1
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    s.length
  }

  /** Decode one character reference starting at the `&` at `i`; append
    * to `out` and return the next index. Unknown/out-of-range
    * references stay verbatim (the literal `&` is emitted and scanning
    * resumes after it — deterministic, never a throw).
    */
  private[sources] def entity(s: String, i: Int,
                              out: java.lang.StringBuilder): Int = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 12) { out.append('&'); return i + 1 }
    val body = s.substring(i + 1, semi)
    val decoded: Option[String] =
      if (body.startsWith("#x") || body.startsWith("#X"))
        scala.util.Try(Integer.parseInt(body.substring(2), 16)).toOption
          .filter(cp => cp > 0 && cp <= 0x10FFFF &&
                        !Character.isSurrogate(cp.toChar))
          .map(cp => new String(Character.toChars(cp)))
      else if (body.startsWith("#"))
        scala.util.Try(Integer.parseInt(body.substring(1))).toOption
          .filter(cp => cp > 0 && cp <= 0x10FFFF &&
                        !Character.isSurrogate(cp.toChar))
          .map(cp => new String(Character.toChars(cp)))
      else named.get(body)
    decoded match {
      case Some(t) => out.append(t); semi + 1
      case None    => out.append('&'); i + 1
    }
  }

  /** Extract the text of `html` (null-safe; a null document stays
    * null). Pure and deterministic — the same bytes always extract to
    * the same text on any engine.
    */
  def extractText(html: String): String = {
    if (html == null) return null
    val n = html.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(false, i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          out.append(' ')
        } else if (html.regionMatches(true, i, "<script", 0, 7) &&
                   nameEnds(html, i + 7)) {
          i = skipRawText(html, skipTag(html, i), "script")
          out.append(' ')
        } else if (html.regionMatches(true, i, "<style", 0, 6) &&
                   nameEnds(html, i + 6)) {
          i = skipRawText(html, skipTag(html, i), "style")
          out.append(' ')
        } else if (html.regionMatches(false, i, "<![CDATA[", 0, 9)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
          out.append(' ')
        } else if (i + 1 < n && {
          val d = html.charAt(i + 1)
          Character.isLetter(d) || d == '/' || d == '!' || d == '?'
        }) {
          i = skipTag(html, i)
          out.append(' ')
        } else {
          // bare '<' before a non-tag char is literal text (HTML5
          // tokenizer rule) — `5 < 6` survives extraction
          out.append(c); i += 1
        }
      } else if (c == '&') {
        i = entity(html, i, out)
      } else { out.append(c); i += 1 }
    }
    // collapse every whitespace run (spaces the tag replacements
    // injected, source newlines/tabs) to ONE space and trim — the
    // corpus tokenizer splits on single spaces
    val s = out
    val res = new java.lang.StringBuilder(s.length)
    var k = 0
    var pendingSpace = false
    while (k < s.length) {
      val ch = s.charAt(k)
      if (Character.isWhitespace(ch)) pendingSpace = res.length > 0
      else {
        if (pendingSpace) { res.append(' '); pendingSpace = false }
        res.append(ch)
      }
      k += 1
    }
    res.toString
  }

  // ---- block-aware main-content extraction (opt-in) -----------------

  /** Tags that delimit text BLOCKS for boilerplate classification —
    * the candidate units of jusText/C4-style filtering.
    */
  private val blockTags = Set(
    "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "title",
    "section", "article", "header", "footer", "nav", "aside", "form",
    "hr", "dt", "dd", "dl", "figure", "figcaption", "main")

  /** One candidate block: collapsed text, total non-space chars, and
    * chars emitted inside `<a>` anchors (link density's numerator).
    */
  private[sources] final case class Block(text: String, chars: Int,
                                          linkChars: Int) {
    def words: Int = if (text.isEmpty) 0 else text.count(_ == ' ') + 1
    def linkDensity: Double =
      if (chars == 0) 0.0 else linkChars.toDouble / chars
  }

  /** Scan `html` into candidate blocks, tracking anchor depth so each
    * block knows its link density. Same degradation rules as
    * [[extractText]] (shared tag/entity/raw-text helpers); block-level
    * tags cut block boundaries, inline tags are spaces.
    */
  private[sources] def extractBlocks(html: String): Seq[Block] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val cur = new java.lang.StringBuilder
    var curChars = 0
    var curLink = 0
    var anchorDepth = 0
    var pendingSpace = false
    def emitChar(ch: Char): Unit =
      if (Character.isWhitespace(ch)) pendingSpace = cur.length > 0
      else {
        if (pendingSpace) { cur.append(' '); pendingSpace = false }
        cur.append(ch)
        curChars += 1
        if (anchorDepth > 0) curLink += 1
      }
    def emit(t: String): Unit = {
      var k = 0
      while (k < t.length) { emitChar(t.charAt(k)); k += 1 }
    }
    def cut(): Unit = {
      if (cur.length > 0) out += Block(cur.toString, curChars, curLink)
      cur.setLength(0); curChars = 0; curLink = 0; pendingSpace = false
    }
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(false, i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          pendingSpace = cur.length > 0
        } else if (html.regionMatches(true, i, "<script", 0, 7) &&
                   nameEnds(html, i + 7)) {
          i = skipRawText(html, skipTag(html, i), "script"); cut()
        } else if (html.regionMatches(true, i, "<style", 0, 6) &&
                   nameEnds(html, i + 6)) {
          i = skipRawText(html, skipTag(html, i), "style"); cut()
        } else if (html.regionMatches(false, i, "<![CDATA[", 0, 9)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
          pendingSpace = cur.length > 0
        } else if (i + 1 < n && {
          val d = html.charAt(i + 1)
          Character.isLetter(d) || d == '/' || d == '!' || d == '?'
        }) {
          // read the tag name to classify block vs inline vs anchor —
          // requiring a name delimiter so <a-entity>/<div-x> custom
          // elements classify as generic inline tags, not <a>/<div>
          var p = i + 1
          val closing = p < n && html.charAt(p) == '/'
          if (closing) p += 1
          val start = p
          while (p < n && (Character.isLetterOrDigit(html.charAt(p))))
            p += 1
          val name = if (nameEnds(html, p))
              html.substring(start, p).toLowerCase(java.util.Locale.ROOT)
            else ""
          i = skipTag(html, i)
          if (name == "a") {
            if (closing) anchorDepth = math.max(0, anchorDepth - 1)
            else anchorDepth += 1
            pendingSpace = cur.length > 0
          } else if (blockTags.contains(name)) cut()
          else pendingSpace = cur.length > 0
        } else { emitChar(c); i += 1 }
      } else if (c == '&') {
        val tmp = new java.lang.StringBuilder
        i = entity(html, i, tmp)
        emit(tmp.toString)
      } else { emitChar(c); i += 1 }
    }
    cut()
    out.toSeq
  }

  /** Opt-in MAIN-CONTENT extraction: [[extractBlocks]] + deterministic
    * boilerplate classification — the C4/jusText line rules at block
    * granularity. A block survives iff:
    *   - it has at least 5 words (menu items, buttons, bare headings
    *     drop — the C4 line-length rule);
    *   - its link density is <= 0.5 (nav bars and link farms drop —
    *     the jusText rule);
    *   - it contains neither `{` nor the word `javascript` (leaked
    *     code/templates drop — the C4 content rules).
    * Kept blocks join with single spaces (the tokenizer contract).
    * This is intentionally NOT the default WARC path — [[extractText]]
    * preserves ALL prose and never risks dropping legitimate short
    * content; main-content mode is the aggressive C4-style gate a
    * curation pipeline opts into via `readWarc(mainContent = true)`.
    */
  def extractMainText(html: String): String = {
    if (html == null) return null
    extractBlocks(html)
      .filter { b =>
        b.words >= 5 && b.linkDensity <= 0.5 &&
          !b.text.contains("{") &&
          !b.text.toLowerCase(java.util.Locale.ROOT).contains("javascript")
      }
      .map(_.text).mkString(" ")
  }

  // ---- outlink extraction (the link-graph front end) ----------------

  /** Extract the outlinks of `html` resolved against `baseUrl`:
    * `href` of every `<a>`/`<area>` tag (honoring a `<base href>`
    * override, entity-decoding the attribute value), resolved to an
    * absolute http(s) URL with fragments stripped and RFC 3986 dot
    * segments removed. Non-navigational schemes (`javascript:`,
    * `mailto:`, `tel:`, `data:`, `about:` ...), bare fragments, empty
    * hrefs, and >2048-char monsters drop. Distinct, first-seen order.
    * Same degradation discipline as [[extractText]] (shared
    * tag/entity/raw-text helpers): malformed markup yields the links
    * that do parse, never a throw. Feeds [[Crawl.linkEdges]] /
    * [[graft.operators.WebGraph]] — run it on a RAW body
    * (`readWarc(extractHtml = false)`), extraction destroys markup.
    */
  def extractLinks(html: String, baseUrl: String): Array[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    extractAnchors(html, baseUrl).foreach(seen += _._1)
    seen.toArray
  }

  /** The document's declared canonical URL (`<link rel="canonical"
    * href=...>` — RFC 6596), resolved absolute, or null when none
    * parses. The HTML-declared alias channel production dedup leans
    * on at least as heavily as 301 chains: a page saying "I am a
    * spelling of THAT url" collapses with it before content dedup.
    * Rules: the FIRST usable declaration wins (the de-facto consumer
    * rule for the duplicate-declaration corner); `rel` is a
    * space-separated token list matched case-insensitively
    * (`rel="canonical alternate"` counts); the href entity-decodes
    * and resolves against the `<base>` in effect at the link's
    * position (the [[extractAnchors]] position rule); declarations
    * anywhere in the document count (lenient — spec-strict head-only
    * would miss the broken-but-common body placements), but
    * script/style/comment/CDATA text is never markup. Unresolvable
    * or non-navigational hrefs are skipped, and scanning continues —
    * a later usable declaration still counts. Same degradation
    * discipline as [[extractText]]: malformed markup yields what
    * parses, never a throw.
    */
  def extractCanonical(html: String, baseUrl: String): String = {
    if (html == null) return null
    var curBase = baseUrl
    var baseSeen = false
    val n = html.length
    var i = 0
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.regionMatches(false, i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.regionMatches(true, i, "<script", 0, 7) &&
                   nameEnds(html, i + 7)) {
          i = skipRawText(html, skipTag(html, i), "script")
        } else if (html.regionMatches(true, i, "<style", 0, 6) &&
                   nameEnds(html, i + 6)) {
          i = skipRawText(html, skipTag(html, i), "style")
        } else if (html.regionMatches(false, i, "<![CDATA[", 0, 9)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
                   (Character.isLetter(html.charAt(i + 1)) ||
                    html.charAt(i + 1) == '/')) {
          var p = i + 1
          val closing = html.charAt(p) == '/'
          if (closing) p += 1
          val start = p
          while (p < n && Character.isLetterOrDigit(html.charAt(p))) p += 1
          val name = if (nameEnds(html, p))
              html.substring(start, p).toLowerCase(java.util.Locale.ROOT)
            else ""
          val end = skipTag(html, i)
          val terminated = end > i + 1 && html.charAt(end - 1) == '>'
          if (terminated && !closing && name == "base" && !baseSeen) {
            val h = attrValue(html, p, end, "href")
            if (h != null) {
              baseSeen = true
              val b = resolveHref(h, baseUrl)
              if (b != null) curBase = b
            }
          } else if (terminated && !closing && name == "link") {
            val rel = attrValue(html, p, end, "rel")
            if (rel != null && rel.split("\\s+")
                  .exists(_.equalsIgnoreCase("canonical"))) {
              val h = attrValue(html, p, end, "href")
              if (h != null) {
                val r = resolveHref(h, curBase)
                if (r != null) return r
              }
            }
          }
          i = end
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' ||
                                 html.charAt(i + 1) == '?')) {
          i = skipTag(html, i)
        } else i += 1
      } else i += 1
    }
    null
  }

  /** Anchor-text cap — enough for any real anchor, bounds the row. */
  private val MaxAnchorChars = 256

  /** Like [[extractLinks]] but keeps each link's ANCHOR TEXT — the
    * classic relevance/quality signal (what OTHER pages call this
    * URL): one (resolved_url, anchor_text) pair per `<a>`/`<area>`
    * occurrence, in document order, NOT deduplicated (ten pages
    * linking "home" vs one linking "annual report 2026" is the
    * signal). Anchor text is the visible text to the matching close
    * tag — nested inline tags become spaces, script/style subtrees
    * drop, entities decode, whitespace collapses; a nested/unclosed
    * `<a>` terminates the previous anchor (the browser rule). `<area>`
    * links carry an empty anchor.
    */
  def extractAnchors(html: String, baseUrl: String): Array[(String, String)] = {
    if (html == null) return Array.empty
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // the base IN EFFECT at the current document position: hrefs
    // resolve eagerly against it as they appear, so a link BEFORE a
    // late <base> resolves against the capture URL and links after it
    // against the base (the HTML position rule — a whole-document
    // retroactive rebase would move early links to the wrong origin).
    // Only the first <base href> is respected, per spec.
    var curBase = baseUrl
    var baseSeen = false
    // open anchor state: resolved href + text accumulator
    var openHref: String = null
    val text = new java.lang.StringBuilder
    var pendingSpace = false
    def emitChar(ch: Char): Unit = if (openHref != null) {
      if (Character.isWhitespace(ch)) pendingSpace = text.length > 0
      else if (text.length + (if (pendingSpace) 1 else 0) < MaxAnchorChars) {
        if (pendingSpace) { text.append(' '); pendingSpace = false }
        text.append(ch)
      }
    }
    def closeAnchor(): Unit = if (openHref != null) {
      pairs += ((openHref, text.toString))
      openHref = null; text.setLength(0); pendingSpace = false
    }
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(false, i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          pendingSpace = text.length > 0
        } else if (html.regionMatches(true, i, "<script", 0, 7) &&
                   nameEnds(html, i + 7)) {
          i = skipRawText(html, skipTag(html, i), "script")
          pendingSpace = text.length > 0
        } else if (html.regionMatches(true, i, "<style", 0, 6) &&
                   nameEnds(html, i + 6)) {
          i = skipRawText(html, skipTag(html, i), "style")
          pendingSpace = text.length > 0
        } else if (html.regionMatches(false, i, "<![CDATA[", 0, 9)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
          pendingSpace = text.length > 0
        } else if (i + 1 < n && (Character.isLetter(html.charAt(i + 1)) ||
                                 html.charAt(i + 1) == '/')) {
          var p = i + 1
          val closing = html.charAt(p) == '/'
          if (closing) p += 1
          val start = p
          while (p < n && Character.isLetterOrDigit(html.charAt(p))) p += 1
          // the alnum run must END the tag name (nameEnds): a
          // hyphenated custom element (<a-entity href>, A-Frame's
          // literal markup) is NOT an anchor — without this guard its
          // href fabricates a link and </a-xxx> closes real anchors
          val name = if (nameEnds(html, p))
              html.substring(start, p).toLowerCase(java.util.Locale.ROOT)
            else ""
          val end = skipTag(html, i)
          // an unterminated tag (EOF before '>') is a truncated
          // capture — harvesting its href would fabricate a link
          val terminated = end > i + 1 && html.charAt(end - 1) == '>'
          if (name == "a") {
            closeAnchor() // </a>, or a nested <a> ends the previous one
            if (terminated && !closing) {
              val h = attrValue(html, p, end, "href")
              // resolve NOW, against the base in effect here; an
              // unresolvable href opens no anchor (its pair would
              // drop anyway, and the next <a>/EOF closes identically)
              if (h != null) { openHref = resolveHref(h, curBase) }
            }
          } else if (terminated && !closing && name == "area") {
            closeAnchor()
            val h = attrValue(html, p, end, "href")
            if (h != null) {
              val r = resolveHref(h, curBase)
              if (r != null) pairs += ((r, ""))
            }
          } else if (terminated && !closing && name == "base" &&
                     !baseSeen) {
            val h = attrValue(html, p, end, "href")
            if (h != null) {
              baseSeen = true
              // the base itself resolves against the CAPTURE url (it
              // cannot be relative to itself); unresolvable -> keep
              val b = resolveHref(h, baseUrl)
              if (b != null) curBase = b
            }
            pendingSpace = text.length > 0
          } else pendingSpace = text.length > 0
          i = end
        } else if (i + 1 < n &&
                   (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          i = skipTag(html, i)
          pendingSpace = text.length > 0
        } else { emitChar(c); i += 1 }
      } else if (c == '&') {
        val tmp = new java.lang.StringBuilder
        i = entity(html, i, tmp)
        var k = 0
        while (k < tmp.length) { emitChar(tmp.charAt(k)); k += 1 }
      } else { emitChar(c); i += 1 }
    }
    closeAnchor() // EOF closes a dangling anchor with its text so far
    pairs.toArray  // hrefs resolved eagerly at their document position
  }

  /** Value of attribute `attr` inside the tag spanning
    * `[nameEnd, tagEnd)`, entity-decoded; null when absent. Handles
    * double/single-quoted and unquoted values; attribute names match
    * case-insensitively (the HTML rule).
    */
  private def attrValue(s: String, nameEnd: Int, tagEnd: Int,
                        attr: String): String = {
    var i = nameEnd
    val end = math.min(tagEnd, s.length)
    while (i < end) {
      // skip to the next attribute name
      while (i < end && (Character.isWhitespace(s.charAt(i)) ||
               s.charAt(i) == '/')) i += 1
      val an = i
      while (i < end && !Character.isWhitespace(s.charAt(i)) &&
             s.charAt(i) != '=' && s.charAt(i) != '>' &&
             s.charAt(i) != '/') i += 1
      if (i <= an) return null
      val name = s.substring(an, i)
      while (i < end && Character.isWhitespace(s.charAt(i))) i += 1
      var value: String = null
      if (i < end && s.charAt(i) == '=') {
        i += 1
        while (i < end && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < end && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
          val q = s.charAt(i)
          val vs = i + 1
          var ve = vs
          while (ve < end && s.charAt(ve) != q) ve += 1
          value = s.substring(vs, ve)
          i = math.min(ve + 1, end)
        } else {
          val vs = i
          while (i < end && !Character.isWhitespace(s.charAt(i)) &&
                 s.charAt(i) != '>') i += 1
          value = s.substring(vs, i)
        }
      }
      if (name.equalsIgnoreCase(attr)) {
        if (value == null) return null
        // entity-decode (&amp; in URLs is routine)
        val out = new java.lang.StringBuilder(value.length)
        var k = 0
        while (k < value.length) {
          val ch = value.charAt(k)
          if (ch == '&') k = entity(value, k, out)
          else { out.append(ch); k += 1 }
        }
        return out.toString
      }
    }
    null
  }

  private val droppedSchemes = Array(
    "javascript:", "mailto:", "tel:", "data:", "about:", "ftp:", "file:")

  /** Resolve `href` against `base` to an absolute http(s) URL with the
    * fragment stripped — RFC 3986 §5 reference resolution, total and
    * deterministic (null for non-navigational/unresolvable refs, never
    * a throw; `java.net.URI` throws on real-world hrefs, so this is a
    * hand-rolled lite resolver).
    */
  private[sources] def resolveHref(href0: String, base: String): String = {
    if (href0 == null) return null
    // browsers strip embedded tab/newline/CR before parsing
    val href = href0.trim.filterNot(c => c == '\t' || c == '\n' || c == '\r')
    if (href.isEmpty || href.length > 2048 || href.startsWith("#"))
      return null
    val lower = href.toLowerCase(java.util.Locale.ROOT)
    var d = 0
    while (d < droppedSchemes.length) {
      if (lower.startsWith(droppedSchemes(d))) return null
      d += 1
    }
    def noFrag(s: String): String = {
      val h = s.indexOf('#'); if (h < 0) s else s.substring(0, h)
    }
    if (lower.startsWith("http://") || lower.startsWith("https://"))
      return noFrag(href)
    // any other explicit scheme is non-navigational
    val colon = href.indexOf(':')
    val slash = href.indexOf('/')
    if (colon > 0 && (slash < 0 || colon < slash) &&
        href.substring(0, colon).forall(ch =>
          Character.isLetterOrDigit(ch) || ch == '+' || ch == '-' || ch == '.') &&
        Character.isLetter(href.charAt(0)))
      return null
    // need a parseable base from here on
    if (base == null) return null
    val bl = base.toLowerCase(java.util.Locale.ROOT)
    if (!bl.startsWith("http://") && !bl.startsWith("https://")) return null
    val schemeEnd = base.indexOf("://") + 3
    val authEnd0 = base.indexWhere(c => c == '/' || c == '?' || c == '#',
                                   schemeEnd)
    val authEnd = if (authEnd0 < 0) base.length else authEnd0
    if (authEnd == schemeEnd) return null // hostless base
    val origin = base.substring(0, authEnd)
    if (href.startsWith("//"))
      return noFrag(base.substring(0, schemeEnd - 3) + ":" + href)
    val h = noFrag(href)
    val qIdx = h.indexOf('?')
    val (hPath, hQuery) =
      if (qIdx < 0) (h, "") else (h.substring(0, qIdx), h.substring(qIdx))
    if (h.startsWith("/"))
      return origin + removeDotSegments(hPath) + hQuery
    if (hPath.isEmpty) // query-only reference: keep base path
      return {
        val bp0 = if (authEnd >= base.length) "" else base.substring(authEnd)
        val bPath = noFrag(bp0)
        val bq = bPath.indexOf('?')
        origin + (if (bq < 0) bPath else bPath.substring(0, bq)) + hQuery
      }
    // relative path: merge with the base directory
    val bp0 = if (authEnd >= base.length) "/" else noFrag(base.substring(authEnd))
    val bq = bp0.indexOf('?')
    val bPath = if (bq < 0) bp0 else bp0.substring(0, bq)
    val dir = {
      val ls = bPath.lastIndexOf('/')
      if (ls < 0) "/" else bPath.substring(0, ls + 1)
    }
    origin + removeDotSegments(dir + hPath) + hQuery
  }

  /** RFC 3986 §5.2.4 dot-segment removal (also collapses `//` runs —
    * deterministic, never escapes above the root).
    */
  private[sources] def removeDotSegments(path: String): String = {
    val trailing = path.endsWith("/") || path.endsWith("/.") ||
      path.endsWith("/..")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    path.split("/").foreach {
      case "" | "." => ()
      case ".."     => if (out.nonEmpty) out.remove(out.length - 1)
      case seg      => out += seg
    }
    "/" + out.mkString("/") + (if (trailing && out.nonEmpty) "/" else "")
  }

  /** Does this body look like an HTML document? Used when an HTTP
    * response declares no Content-Type: sniffs the first bytes for a
    * doctype or `<html` root (case-insensitive), so plain-text bodies
    * are never mangled by tag-stripping.
    */
  def sniffHtml(body: String): Boolean = {
    if (body == null) return false
    val head = body.substring(0, math.min(body.length, 512))
    var i = 0
    while (i < head.length && Character.isWhitespace(head.charAt(i))) i += 1
    head.regionMatches(true, i, "<!doctype", 0, 9) ||
      head.regionMatches(true, i, "<html", 0, 5) ||
      head.toLowerCase(java.util.Locale.ROOT).contains("<html")
  }
}
