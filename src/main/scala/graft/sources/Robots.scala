package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StringType}
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
  *   - group selection: a group binds to the crawler iff its agent
  *     token EQUALS the crawler's product token or is a PREFIX of it
  *     (case-insensitive) — the RFC 9309 §2.2.1 / Google rule. A
  *     bidirectional-substring match would let a group for a
  *     DIFFERENT bot ("graftbot-news", or any one-letter token) bind
  *     and, because a specific group fully replaces `*`, silently
  *     discard the site's wildcard Disallows (fail-open against site
  *     policy). All matching specific groups' rules merge; any
  *     specific match suppresses the `*` group entirely
  *   - rule selection: the LONGEST matching rule wins; `allow` beats
  *     `disallow` at equal length; no match → allowed
  *   - patterns: `*` matches any run, `$` anchors the end (the RFC's
  *     two metacharacters); empty `Disallow:` is an explicit
  *     allow-all; comments (`#`) and unknown directives skip
  *   - `Crawl-delay: <seconds>` and `Request-rate: <n>/<t>[smh]`
  *     (de-facto extensions real crawlers honor) bind to their group
  *     like rules; the effective per-host fetch interval is the max
  *     of the two spellings — surfaced by [[crawlDelay]] /
  *     [[robots_delay]] and consumed by [[Crawl.frontier]]'s
  *     politeness cap
  *   - a missing/empty/unparseable robots.txt allows everything
  *     (fail-open, the crawl-ecosystem convention)
  *
  * Parsing is total and deterministic — garbage lines skip, never
  * throw.
  *
  * Scale shape — parse once per HOST, match once per CANDIDATE: the
  * full-body parse (group selection over a body of up to ~500 KiB) is
  * a host-keyed projection ([[robots_compile]]) over
  * [[Crawl.robotsTexts]] — one row per host — emitting the compiled
  * rule group as a compact newline-joined string (only the rules that
  * bind to this agent survive). Per-candidate work
  * ([[robots_allowed_c]]) is then a longest-match scan over the
  * compiled rules, and the frontier's robots join ships compiled
  * rules (typically tens of bytes) instead of raw bodies. A host with
  * 10⁶ discovered URLs pays ONE body parse, not 10⁶ — the bound is
  * structural, pinned by [[graft.sources.RobotsSpec]] counting
  * parses. The uncompiled 3-arg [[robots_allowed]] stays for ad-hoc
  * row-at-a-time checks where the body is already in hand.
  */
object Robots {

  /** One rule: allow?, original pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** Applicable directives for one (body, agent): the rule group plus
    * the effective fetch interval in seconds (-1 = none declared).
    */
  final case class Group(rules: Array[Rule], delaySeconds: Double)

  /** Test hook: full-body parses performed by this JVM (local-mode
    * executors share it). The frontier's parse-once-per-host bound is
    * pinned against this counter — an AtomicLong bump is noise next
    * to a body parse.
    */
  val parseCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Parse `body` and return the group applicable to `agent`
    * (lowercase product token, e.g. "graftbot"). Null/empty body →
    * no rules (allow all), no delay.
    */
  def parseGroup(body: String, agent: String): Group = {
    if (body == null) return Group(Array.empty, -1.0)
    parseCount.incrementAndGet()
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
    // did ANY specific group header match? (a specific group with no
    // rules still suppresses * — RFC 9309: the most specific group
    // is selected, then its rules apply)
    var sawSpecific = false
    var specificDelay = -1.0
    var wildcardDelay = -1.0
    def bindDelay(seconds: Double): Unit = if (seconds > 0) {
      if (groupSpecific)
        specificDelay = math.max(specificDelay, seconds)
      if (groupWildcard)
        wildcardDelay = math.max(wildcardDelay, seconds)
    }
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
              // ignore). Match = exact token or group-token-is-prefix-
              // of-product-token ONLY ("graftbot" binds groups
              // "graftbot" and "graft", NOT "graftbot-news")
              if (v == "*") groupWildcard = true
              else if (v.nonEmpty && want.nonEmpty && want.startsWith(v)) {
                groupSpecific = true; sawSpecific = true
              }
            case "disallow" | "allow" =>
              inAgentRun = false
              val rule = Rule(key == "allow", value)
              if (groupSpecific) specific += rule
              if (groupWildcard) wildcard += rule
            case "crawl-delay" =>
              inAgentRun = false
              bindDelay(
                try value.toDouble catch { case _: Exception => -1.0 })
            case "request-rate" =>
              // "n/t[smh]": n requests per t seconds/minutes/hours →
              // interval t*unit/n seconds; garbage → no delay
              inAgentRun = false
              val slash = value.indexOf('/')
              if (slash > 0) {
                val n = try value.substring(0, slash).trim.toDouble
                        catch { case _: Exception => -1.0 }
                val rest = value.substring(slash + 1).trim
                  .toLowerCase(java.util.Locale.ROOT)
                val (num, unit) =
                  if (rest.endsWith("m")) (rest.dropRight(1), 60.0)
                  else if (rest.endsWith("h")) (rest.dropRight(1), 3600.0)
                  else if (rest.endsWith("s")) (rest.dropRight(1), 1.0)
                  else (rest, 1.0)
                val t = try num.trim.toDouble
                        catch { case _: Exception => -1.0 }
                if (n > 0 && t > 0) bindDelay(t * unit / n)
              }
            case _ => inAgentRun = false // sitemap, unknown
          }
        }
      }
    }
    if (sawSpecific) Group(specific.toArray, specificDelay)
    else Group(wildcard.toArray, wildcardDelay)
  }

  /** Rules half of [[parseGroup]] (the pre-round-17 surface). */
  def parseRules(body: String, agent: String): Array[Rule] =
    parseGroup(body, agent).rules

  /** `Sitemap:` directives of a robots body — the sitemaps.org
    * discovery channel (RFC 9309 treats it as an unrecognized but
    * well-formed line; the sitemaps protocol defines it as
    * GROUP-INDEPENDENT, so every agent sees every declaration
    * regardless of User-agent runs). Absolute http(s) URLs only, the
    * [[Sitemaps.parse]] validation; comments stripped like rule
    * lines. A crawler fetches these next and feeds the bodies through
    * [[Sitemaps.parse]] / the frontier's sitemap leg — pages nothing
    * links to yet become fetchable without waiting for discovery.
    */
  def sitemapUrls(body: String): Array[String] = {
    if (body == null) return Array.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    body.linesIterator.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#'); if (h < 0) raw else raw.substring(0, h)
      }
      val line = noComment.trim
      if (line.length > 8 &&
          line.regionMatches(true, 0, "sitemap:", 0, 8)) {
        val v = line.substring(8).trim
        if (v.length <= 2048 &&
            (v.regionMatches(true, 0, "http://", 0, 7) ||
             v.regionMatches(true, 0, "https://", 0, 8)))
          out += v
      }
    }
    out.toArray
  }

  /** Effective fetch interval (seconds) the host requests of `agent`
    * via Crawl-delay / Request-rate; -1 when none declared (or body
    * missing). */
  def crawlDelay(body: String, agent: String): Double =
    parseGroup(body, agent).delaySeconds

  // ---- compiled form: parse once per host, match per candidate ----

  /** Serialize the applicable rule group as a compact string: one
    * rule per line, `A`/`D` + pattern (patterns are line-trimmed so
    * can never contain a newline). "" = no rules = allow all. The
    * frontier computes this ONCE per host and joins candidates to the
    * compiled string instead of the raw body.
    */
  def compile(body: String, agent: String): String = {
    val rules = parseRules(body, agent)
    if (rules.isEmpty) ""
    else {
      val sb = new java.lang.StringBuilder(rules.length * 16)
      var i = 0
      while (i < rules.length) {
        if (i > 0) sb.append('\n')
        sb.append(if (rules(i).allow) 'A' else 'D')
        sb.append(rules(i).pattern)
        i += 1
      }
      sb.toString
    }
  }

  /** Longest-match decision over a [[compile]]d rule string — a
    * single scan, no per-row parsing or array allocation. Empty
    * compiled = no rules = allowed.
    */
  def isAllowedCompiled(path: String, compiled: String): Boolean = {
    if (compiled == null || compiled.isEmpty) return true
    var bestLen = -1
    var bestAllow = true
    var start = 0
    val n = compiled.length
    while (start < n) {
      var end = compiled.indexOf('\n', start)
      if (end < 0) end = n
      if (end > start) {
        val allow = compiled.charAt(start) == 'A'
        val patLen = end - start - 1
        if (patLen == 0) {
          // "Disallow:" (empty) = allow all; matches with length 0
          if (bestLen < 0) { bestLen = 0; bestAllow = true }
        } else {
          val pattern = compiled.substring(start + 1, end)
          if (patternMatches(path, pattern)) {
            if (patLen > bestLen ||
                (patLen == bestLen && allow && !bestAllow)) {
              bestLen = patLen; bestAllow = allow
            }
          }
        }
      }
      start = end + 1
    }
    bestAllow
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

  /** The robots match target of a URL: path + `?query`, fragment
    * stripped, scheme/host not matched. Null-free for non-null url.
    */
  private def matchTarget(url: String): String = {
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
    if (rest.isEmpty) "/"
    else if (rest.charAt(0) == '?') "/" + rest
    else rest
  }

  /** Full check from a URL: extracts the path+query (the robots match
    * target; scheme/host/fragment are not matched) and evaluates.
    * Null url → disallowed (nothing to fetch); null body → allowed.
    */
  def allowed(url: String, body: String, agent: String): Boolean = {
    if (url == null) return false
    isAllowed(matchTarget(url), parseRules(body, agent))
  }

  /** [[allowed]] against a pre-[[compile]]d rule string. */
  def allowedCompiled(url: String, compiled: String): Boolean = {
    if (url == null) return false
    isAllowedCompiled(matchTarget(url), compiled)
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

  /** Column form of [[compile]]: the agent's rule group as a compact
    * string — a host-keyed projection computes this ONCE per host.
    * Null body → "" (no rules; the fail-open spelling survives the
    * compile hop). */
  def robots_compile(body: Column, agent: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    Bridge.column(RobotsCompile(
      Bridge.expression(coalesce(body, lit(""))),
      Bridge.expression(coalesce(agent, lit("")))))
  }

  /** Column form of [[allowedCompiled]] — never null: fail-open on a
    * missing compiled group (host without robots.txt → left-join
    * null → allowed), fail-closed on a missing url. */
  def robots_allowed_c(url: Column, compiled: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    coalesce(
      Bridge.column(RobotsAllowedCompiled(
        Bridge.expression(url),
        Bridge.expression(coalesce(compiled, lit(""))))),
      lit(false))
  }

  /** Column form of [[crawlDelay]]: effective fetch interval in
    * seconds, null when the host declares none (or no body). Like the
    * compile, a once-per-host projection. */
  def robots_delay(body: Column, agent: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit, when}
    val d = Bridge.column(RobotsDelay(
      Bridge.expression(coalesce(body, lit(""))),
      Bridge.expression(coalesce(agent, lit("")))))
    when(d > 0.0, d)
  }

  /** UTF8String shims the generated code calls directly. */
  def allowedU8(url: UTF8String, body: UTF8String,
                agent: UTF8String): Boolean =
    allowed(url.toString, body.toString, agent.toString)
  def compileU8(body: UTF8String, agent: UTF8String): UTF8String =
    UTF8String.fromString(compile(body.toString, agent.toString))
  def allowedCompiledU8(url: UTF8String, compiled: UTF8String): Boolean =
    allowedCompiled(url.toString, compiled.toString)
  def delayU8(body: UTF8String, agent: UTF8String): Double =
    crawlDelay(body.toString, agent.toString)
  def sitemapUrlsU8(body: UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sitemapUrls(body.toString)
        .map(UTF8String.fromString(_).asInstanceOf[Any]))

  /** Column form of [[sitemapUrls]]: null body → empty array (a host
    * without robots.txt declares nothing). */
  def robots_sitemaps(body: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    Bridge.column(RobotsSitemaps(
      Bridge.expression(coalesce(body, lit("")))))
  }
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

/** `robots_compile(robots_body, agent)` — the agent's applicable rule
  * group serialized one-rule-per-line (`A`/`D` + pattern); "" = allow
  * all. Null-safe binary; compute once per HOST, never per candidate.
  */
case class RobotsCompile(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(b: Any, a: Any): Any =
    Robots.compileU8(b.asInstanceOf[UTF8String],
                     a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, a) => s"graft.sources.Robots.compileU8($b, $a)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): RobotsCompile =
    copy(left = l, right = r)
  override def prettyName: String = "robots_compile"
}

/** `robots_allowed_c(url, compiled)` — longest-match over a
  * pre-compiled rule string: the per-CANDIDATE half of the robots
  * gate (no body parse in this path). Null-safe binary;
  * [[Robots.robots_allowed_c]] layers the null policy on top.
  */
case class RobotsAllowedCompiled(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(u: Any, c: Any): Any =
    Robots.allowedCompiledU8(u.asInstanceOf[UTF8String],
                             c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (u, c) => s"graft.sources.Robots.allowedCompiledU8($u, $c)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): RobotsAllowedCompiled =
    copy(left = l, right = r)
  override def prettyName: String = "robots_allowed_c"
}

/** `robots_delay(robots_body, agent)` — effective Crawl-delay /
  * Request-rate fetch interval in seconds; -1 when none declared.
  * Null-safe binary; [[Robots.robots_delay]] maps -1 to null.
  */
case class RobotsDelay(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(b: Any, a: Any): Any =
    Robots.delayU8(b.asInstanceOf[UTF8String],
                   a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, a) => s"graft.sources.Robots.delayU8($b, $a)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): RobotsDelay =
    copy(left = l, right = r)
  override def prettyName: String = "robots_delay"
}

/** `robots_sitemaps(robots_body)` — the body's `Sitemap:` directives
  * as array<string> (group-independent per the sitemaps protocol).
  */
case class RobotsSitemaps(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType,
                                         containsNull = false)
  override protected def nullSafeEval(b: Any): Any =
    Robots.sitemapUrlsU8(b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.sources.Robots.sitemapUrlsU8($b)")
  override protected def withNewChildInternal(c: Expression): RobotsSitemaps =
    copy(child = c)
  override def prettyName: String = "robots_sitemaps"
}
