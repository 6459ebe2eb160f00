package graft.sources

/** Deterministic pure-JVM HTML-to-text extraction — the stage every
  * real Common-Crawl consumer (CCNet, C4, FineWeb) runs between the
  * WARC fetch and curation, so the quality/LM/NB gates score prose
  * tokens instead of `<div class=...>` markup. Reference analogue: the
  * reference pipeline ingests already-clean text (ingestion.py feeds
  * plain records), so this is the extension surface a crawl-fed
  * deployment needs, not a port.
  *
  * Scope is tag-strip extraction, NOT boilerplate removal:
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
  * The function is a pure total `String => String` — applied per-row
  * inside the WARC member parser (batch and stream share it), or via
  * [[Crawl.extractHtml]] on an already-typed crawl frame.
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
  private def entity(s: String, i: Int, out: java.lang.StringBuilder): Int = {
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
