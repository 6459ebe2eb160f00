package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309 lite) — the politeness half of the
  * crawl loop the per-host frontier cap
  * ([[graft.operators.WebGraph.frontierFromSets]]) doesn't cover: a
  * frontier URL must also be ALLOWED by its host's robots rules. The
  * rules arrive through the crawl itself (a capture of
  * `/robots.txt` is just another response record —
  * [[Crawl.robotsTexts]] lifts them to a host-keyed frame), so the
  * loop stays closed: fetch → parse → extract links → canonicalize →
  * subtract seen → cap per host → drop robots-disallowed → fetch.
  *
  * Semantics implemented (RFC 9309 §2):
  *   - groups: consecutive `User-agent:` lines head a group; rules
  *     bind to the nearest preceding group
  *   - group selection: a group whose agent token is a
  *     case-insensitive substring of (or equal to) the crawler's
  *     product token wins over the `*` group; all matching groups'
  *     rules merge (the RFC's "most specific group" reduced to
  *     token-match vs wildcard — full product-token precedence needs
  *     a registry of agent names this library doesn't own)
  *   - rule selection: the LONGEST matching rule wins; `allow` beats
  *     `disallow` at equal length; no match → allowed
  *   - patterns: `*` matches any run, `$` anchors the end (the RFC's
  *     two metacharacters); empty `Disallow:` is an explicit
  *     allow-all; comments (`#`) and unknown directives skip
  *   - a missing/empty/unparseable robots.txt allows everything
  *     (fail-open, the crawl-ecosystem convention)
  *
  * Parsing is total and deterministic — garbage lines skip, never
  * throw. Evaluation is pure column math via a codegen'd expression
  * ([[RobotsAllowed]]): the per-row parse is bounded because the
  * frontier is politeness-capped per host, so at most `perHostCap`
  * rows re-parse any one (small) robots body.
  */
object Robots {

  /** One rule: allow?, original pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse `body` and return the rules applicable to `agent`
    * (lowercase product token, e.g. "graftbot"). Null/empty body →
    * no rules (allow all).
    */
  def parseRules(body: String, agent: String): Array[Rule] = {
    if (body == null) return Array.empty
    val want = if (agent == null) "" else
      agent.toLowerCase(java.util.Locale.ROOT)
    val specific = scala.collection.mutable.ArrayBuffer.empty[Rule]
    val wildcard = scala.collection.mutable.ArrayBuffer.empty[Rule]
    // group state: does the CURRENT group apply to us / to *? A rule
    // line closes the agent-header run, so a later User-agent starts
    // a fresh group.
    var groupSpecific = false
    var groupWildcard = false
    var inAgentRun = false
    body.linesIterator.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#'); if (h < 0) raw else raw.substring(0, h)
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!inAgentRun) { groupSpecific = false; groupWildcard = false }
              inAgentRun = true
              val v = value.toLowerCase(java.util.Locale.ROOT)
              // an EMPTY agent value is a malformed header (RFC 9309:
              // ignore) — without the nonEmpty guard it would match
              // every crawler via want.contains("") and its rules
              // would suppress the legitimate * group
              if (v == "*") groupWildcard = true
              else if (v.nonEmpty && want.nonEmpty &&
                       (want.contains(v) || v.contains(want)))
                groupSpecific = true
            case "disallow" | "allow" =>
              inAgentRun = false
              val rule = Rule(key == "allow", value)
              if (groupSpecific) specific += rule
              if (groupWildcard) wildcard += rule
            case _ => inAgentRun = false // crawl-delay, sitemap, unknown
          }
        }
      }
    }
    (if (specific.nonEmpty) specific else wildcard).toArray
  }

  /** Does `pattern` (with `*` any-run and trailing-`$` end-anchor
    * metacharacters) match a PREFIX of `path` (or, with `$`, the
    * whole of it)? Iterative greedy-with-backtrack glob — linear-ish,
    * never throws, no regex compilation.
    */
  private[sources] def patternMatches(path: String, pattern: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern
    // match pat against path allowing '*' to span; require full-pat
    // consumption; position reached = prefix match (or exact if $)
    var pi = 0; var si = 0
    var starPi = -1; var starSi = -1
    while (si < path.length) {
      if (pi < pat.length &&
          (pat.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (starPi >= 0) {
        starSi += 1; si = starSi; pi = starPi + 1
      } else {
        // pattern consumed (or mismatch): prefix match iff pat done
        return pi >= pat.length && !anchored
      }
      if (pi >= pat.length && !anchored) return true
    }
    // path exhausted: remaining pattern must be only '*'s
    var k = pi
    while (k < pat.length && pat.charAt(k) == '*') k += 1
    k >= pat.length
  }

  /** Longest-match decision over `rules` for `path` (the URL path +
    * optional `?query`); allow wins ties; no match → allowed. An
    * empty-pattern disallow is the RFC's explicit allow-all.
    */
  def isAllowed(path: String, rules: Array[Rule]): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (r.pattern.isEmpty) {
        // "Disallow:" (empty) = allow all; matches with length 0
        if (bestLen < 0) { bestLen = 0; bestAllow = true }
      } else if (patternMatches(path, r.pattern)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
      i += 1
    }
    bestAllow
  }

  /** Full check from a URL: extracts the path+query (the robots match
    * target; scheme/host/fragment are not matched) and evaluates.
    * Null url → disallowed (nothing to fetch); null body → allowed.
    */
  def allowed(url: String, body: String, agent: String): Boolean = {
    if (url == null) return false
    val schemeEnd = url.indexOf("://")
    // the authority ends at the FIRST of '/', '?', '#' — a '/' inside
    // the query ("?a=/x") must not be mistaken for the path start
    val authStart = if (schemeEnd < 0) 0 else schemeEnd + 3
    var i = authStart
    while (i < url.length && url.charAt(i) != '/' &&
           url.charAt(i) != '?' && url.charAt(i) != '#') i += 1
    val frag = url.indexOf('#', i)
    val rest = if (frag < 0) url.substring(i) else url.substring(i, frag)
    // query-only targets get the implicit root: "?a=1" -> "/?a=1"
    val path = if (rest.isEmpty) "/"
      else if (rest.charAt(0) == '?') "/" + rest
      else rest
    isAllowed(path, parseRules(body, agent))
  }

  /** Column form: `robots_allowed(url, robots_body, agent)` — never
    * null. Fail-open on a missing body (no robots.txt captured →
    * allowed: the crawl-ecosystem convention), fail-closed on a
    * missing url (nothing to fetch). The null policy lives HERE as
    * column math so the expression itself stays a plain null-safe
    * ternary inside whole-stage codegen.
    */
  def robots_allowed(url: Column, body: Column, agent: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    coalesce(
      Bridge.column(RobotsAllowed(
        Bridge.expression(url),
        Bridge.expression(coalesce(body, lit(""))),
        Bridge.expression(coalesce(agent, lit(""))))),
      lit(false))
  }

  /** UTF8String shim the generated code calls directly. */
  def allowedU8(url: UTF8String, body: UTF8String,
                agent: UTF8String): Boolean =
    allowed(url.toString, body.toString, agent.toString)
}

/** `robots_allowed(url, robots_body, agent)` — null-safe ternary
  * (null on any null child; [[Robots.robots_allowed]] layers the
  * fail-open/fail-closed null policy on top with column math).
  */
case class RobotsAllowed(first: Expression, second: Expression,
                         third: Expression) extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(u: Any, b: Any, a: Any): Any =
    Robots.allowedU8(u.asInstanceOf[UTF8String],
                     b.asInstanceOf[UTF8String],
                     a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (u, b, a) => s"graft.sources.Robots.allowedU8($u, $b, $a)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RobotsAllowed =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "robots_allowed"
}
