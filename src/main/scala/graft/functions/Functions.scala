package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.LongType

/** SQL registration for the engine's custom expressions, so pure-SQL users
  * get the same surface as the Column API:
  *
  *   graft.functions.Functions.register(spark)
  *   spark.sql("SELECT simhash64(split(text,' ')), minhash_sig(toks, 96) ...")
  */
object Functions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got: $other")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      reg.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage),
        builder)

    add("simhash64", "simhash64(tokens) - 64-bit SimHash of array<string>") {
      exprs => SimHash64(exprs.head)
    }
    add("minhash_sig", "minhash_sig(tokens, k) - MinHash signature array<bigint>") {
      exprs => MinHashSig(exprs.head, intArg(exprs(1), "minhash_sig"))
    }
    add("hamming64", "hamming64(a, b) - Hamming distance of two int64 fingerprints") {
      // SQL integer literals are IntegerType; normalize to long here since
      // the expression declares no input types (AbstractDataType is
      // private[sql])
      exprs => Hamming64(Cast(exprs.head, LongType), Cast(exprs(1), LongType))
    }
    add("word_shingles", "word_shingles(tokens, n) - distinct word n-gram shingles") {
      exprs => WordShingles(exprs.head, intArg(exprs(1), "word_shingles"))
    }
    add("top_k_by", "top_k_by(payload, ord, k) - k largest payloads by ord, descending") {
      exprs => TopKByAgg(exprs.head, exprs(1), intArg(exprs(2), "top_k_by"))
        .toAggregateExpression()
    }
    add("srp_sig", "srp_sig(vec, bits, table) - signed-random-projection LSH signature") {
      exprs => SrpSig(exprs.head, intArg(exprs(1), "srp_sig"), intArg(exprs(2), "srp_sig"))
    }
    add("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays") {
      exprs => CosineSim(exprs.head, exprs(1))
    }
    add("extract_html", "extract_html(text) - deterministic HTML tag-strip extraction") {
      exprs => graft.sources.HtmlExtract(exprs.head)
    }
    add("extract_main_html", "extract_main_html(text) - C4/jusText main-content extraction") {
      exprs => graft.sources.HtmlMainExtract(exprs.head)
    }
    add("extract_links", "extract_links(text, base_url) - absolute outlinks of an HTML body") {
      exprs => graft.sources.HtmlLinks(exprs.head, exprs(1))
    }
    // the SQL spelling carries the SAME null policy as the Column
    // wrapper (Robots.robots_allowed): body coalesces to '' (missing
    // robots.txt fails OPEN) and the result to false (missing url
    // fails CLOSED). The bare expression would return NULL on a null
    // body, which WHERE treats as false — silently disallowing every
    // host without a captured robots.txt.
    add("robots_allowed", "robots_allowed(url, robots_body, agent) - RFC 9309 robots.txt check; fail-open on null body, fail-closed on null url") {
      exprs =>
        import org.apache.spark.sql.catalyst.expressions.Coalesce
        Coalesce(Seq(
          graft.sources.RobotsAllowed(
            exprs.head,
            Coalesce(Seq(exprs(1), Literal(""))),
            Coalesce(Seq(exprs(2), Literal("")))),
          Literal(false)))
    }
    add("robots_compile", "robots_compile(robots_body, agent) - agent's robots rule group, compiled (one rule per line); compute once per host") {
      exprs =>
        import org.apache.spark.sql.catalyst.expressions.Coalesce
        graft.sources.RobotsCompile(
          Coalesce(Seq(exprs.head, Literal(""))),
          Coalesce(Seq(exprs(1), Literal(""))))
    }
    add("robots_allowed_c", "robots_allowed_c(url, compiled) - robots check against a robots_compile'd rule group; fail-open on null rules, fail-closed on null url") {
      exprs =>
        import org.apache.spark.sql.catalyst.expressions.Coalesce
        Coalesce(Seq(
          graft.sources.RobotsAllowedCompiled(
            exprs.head,
            Coalesce(Seq(exprs(1), Literal("")))),
          Literal(false)))
    }
    add("robots_delay", "robots_delay(robots_body, agent) - Crawl-delay/Request-rate fetch interval in seconds; -1 when none declared") {
      exprs =>
        import org.apache.spark.sql.catalyst.expressions.Coalesce
        graft.sources.RobotsDelay(
          Coalesce(Seq(exprs.head, Literal(""))),
          Coalesce(Seq(exprs(1), Literal(""))))
    }
    add("extract_anchors", "extract_anchors(text, base_url) - link occurrences with anchor text") {
      exprs => graft.sources.HtmlAnchors(exprs.head, exprs(1))
    }
    add("extract_canonical", "extract_canonical(text, base_url) - the document's declared <link rel=canonical> URL, absolute; NULL when none parses") {
      exprs => graft.sources.HtmlCanonical(exprs.head, exprs(1))
    }
    add("extract_sitemap", "extract_sitemap(text) - sitemap entries (url, kind, lastmod, changefreq, priority) of an XML/text sitemap") {
      exprs => graft.sources.SitemapEntries(exprs.head)
    }
    add("robots_sitemaps", "robots_sitemaps(robots_body) - Sitemap: directives of a robots.txt body (group-independent)") {
      exprs =>
        import org.apache.spark.sql.catalyst.expressions.Coalesce
        graft.sources.RobotsSitemaps(
          Coalesce(Seq(exprs.head, Literal(""))))
    }
    add("sq_dist", "sq_dist(a, b) - squared euclidean distance of two numeric arrays") {
      exprs => SqDist(exprs.head, exprs(1))
    }
    add("norm_sq", "norm_sq(a) - squared L2 norm of a numeric array") {
      exprs => NormSq(exprs.head)
    }
    // Bloom build/probe for SQL users. Probe-side note: might_contain
    // requires its filter argument to be a constant or an uncorrelated
    // scalar subquery — `might_contain((SELECT bloom_agg(h) FROM b), h2)`
    // — the same restriction Spark's own runtime filters obey.
    add("bloom_agg",
        "bloom_agg(h, items, bits) - Bloom filter (binary) over int64 hashes") {
      exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs.head, exprs(1), exprs(2)).toAggregateExpression()
    }
    add("might_contain",
        "might_contain(bloom, h) - h possibly in the sketch; no false negatives") {
      exprs =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))
    }
    add("heavy_hitters",
        "heavy_hitters(item, k) - SpaceSaving frequent-items sketch; " +
          "array<struct<term,est,err>> desc, est-err <= true <= est") {
      exprs => HeavyHittersAgg(exprs.head, intArg(exprs(1), "heavy_hitters"))
        .toAggregateExpression()
    }
  }
}
