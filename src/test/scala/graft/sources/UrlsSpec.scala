package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[Urls.canonicalize]] / [[Urls.host]] — the URL normalization every
  * crawl capture passes before dedup/filtering. Fixture-driven: each
  * case is a (raw, expected-canonical) pair evaluated through the real
  * column expression (not a Scala mirror), so the spec pins the exact
  * tree the q172–q175 oracles compare against DuckDB.
  */
class UrlsSpec extends AnyFunSuite with SparkSpec {

  private def canon(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().toIndexedSeq.map(r => Option(r.getString(0)))
  }

  private def host(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.host(col("url")).as("h"))
      .collect().toIndexedSeq.map(r => Option(r.getString(0)))
  }

  test("scheme/host case, www, fragment, userinfo normalize away") {
    assert(canon(
      "HTTP://WWW.Example.COM/Path",
      "http://example.com/Path#section-2",
      "https://user:pw@example.com/Path",
      "http://example.com/Path") === Seq(
      Some("http://example.com/Path"),
      Some("http://example.com/Path"),
      Some("https://example.com/Path"),
      Some("http://example.com/Path")))
  }

  test("path CASE is preserved; only scheme and host lowercase") {
    assert(canon("HTTPS://EXAMPLE.com/CaseSensitive/Path") ===
      Seq(Some("https://example.com/CaseSensitive/Path")))
  }

  test("default ports strip, non-default ports survive") {
    assert(canon(
      "https://a.com:443/x", "http://a.com:80/x",
      "https://a.com:80/x", "http://a.com:8080/x") === Seq(
      Some("https://a.com/x"), Some("http://a.com/x"),
      Some("https://a.com:80/x"), Some("http://a.com:8080/x")))
  }

  test("trailing slash runs strip; root collapses to bare origin") {
    assert(canon(
      "http://a.com/x/", "http://a.com/x///",
      "http://a.com/", "http://a.com") === Seq(
      Some("http://a.com/x"), Some("http://a.com/x"),
      Some("http://a.com"), Some("http://a.com")))
  }

  test("tracking params drop; survivors sort; empty query disappears") {
    assert(canon(
      "http://a.com/x?b=2&utm_source=feed&a=1",
      "http://a.com/x?a=1&b=2",
      "http://a.com/x?utm_campaign=z&fbclid=123&gclid=9&ref=tw",
      "http://a.com/x?z=1&y=2&x=3") === Seq(
      Some("http://a.com/x?a=1&b=2"),
      Some("http://a.com/x?a=1&b=2"),
      Some("http://a.com/x"),
      Some("http://a.com/x?x=3&y=2&z=1")))
    // a param NAMED like a value stays; only exact names / utm_ prefix drop
    assert(canon("http://a.com/x?refresh=1&utmost=2") ===
      Seq(Some("http://a.com/x?refresh=1&utmost=2")))
  }

  test("unparseable inputs canonicalize to NULL, never throw") {
    assert(canon("not a url", "", "example.com/no-scheme",
                 "http://", "ftp remnant ://x") ===
      Seq(None, None, None, None, None))
  }

  test("canonicalize is idempotent") {
    import spark.implicits._
    val raw = Seq(
      "HTTP://WWW.A.com:80/X/?b=2&utm_source=s&a=1#f",
      "https://u:p@B.org:8443/y///",
      "http://c.net/z?fbclid=1").toDF("url")
    val once = raw.select(Urls.canonicalize(col("url")).as("url"))
    val twice = once.select(Urls.canonicalize(col("url")).as("url"))
    assert(once.collect().toSeq === twice.collect().toSeq)
  }

  test("host: userinfo/port/www handled; garbage is NULL, not a token") {
    assert(host(
      "https://user:pw@WWW.Ex.COM:8443/p", "http://a.com", "junk",
      "http://b.com:99999/x") === Seq(
      Some("ex.com"), Some("a.com"), None, Some("b.com")))
  }

  test("IDN hosts: unicode and punycode spellings collapse to ONE host; oracle vectors pinned to java.net.IDN") {
    // the single-sourcing guarantee: the literals the DuckDB oracle
    // maps are exactly what the general implementation computes
    for ((u, a) <- Urls.IdnOracleVectors)
      assert(java.net.IDN.toASCII(u)
               .toLowerCase(java.util.Locale.ROOT) === a,
        s"oracle vector drifted from java.net.IDN: $u")
    assert(canon(
      "http://bücher.example/p",
      "http://xn--bcher-kva.example/p",
      "https://WWW.BÜCHER.example:443/p/",   // case+www+port junk too
      "http://münchen.example/x?utm_source=s") === Seq(
      Some("http://xn--bcher-kva.example/p"),
      Some("http://xn--bcher-kva.example/p"),
      Some("https://xn--bcher-kva.example/p"),
      Some("http://xn--mnchen-3ya.example/x")))
    assert(host("http://büro.example/a", "http://xn--bro-hoa.example/b")
      === Seq(Some("xn--bro-hoa.example"), Some("xn--bro-hoa.example")))
    // degradation: a convertible-but-garbage host converts
    // deterministically (no STD3 gate — it was never fetchable
    // anyway), and one IDNA cannot convert (overlong label) keeps
    // its spelling — never a throw, never a silent null
    assert(host("http://bü cher.example/x") ===
      Seq(Some("xn--b cher-3ya.example")))
    val overlong = "ü" + ("a" * 70)
    assert(host(s"http://$overlong.example/x") ===
      Seq(Some(s"$overlong.example")))
  }

  test("isSitemapGz: the gz-sitemap exemption matches the shape and nothing else") {
    import spark.implicits._
    def gz(urls: String*): Seq[Boolean] =
      urls.toDF("url").select(Urls.isSitemapGz(col("url")).as("g"))
        .collect().toIndexedSeq.map(_.getBoolean(0))
    assert(gz(
      "http://h.com/sitemap.xml.gz",          // the canonical form
      "http://h.com/maps/Sitemap-big.XML.GZ", // case-insensitive
      "http://h.com/sitemap.xml.gz?page=2",   // query never hides it
      "http://h.com/sitemap.xml",             // not gz (isAsset no-op)
      "http://h.com/archive.tar.gz",          // a real archive
      "http://h.com/sitemap.gz",              // not the .xml.gz shape
      "http://h.com/dir.sitemap.xml.gz/file"  // not the LAST segment
    ) === Seq(true, true, true, false, false, false, false))
    // the exemption is load-bearing: isAsset alone WOULD drop the form
    assert(Seq("http://h.com/sitemap.xml.gz").toDF("url")
      .select(Urls.isAsset(col("url"))).collect().head.getBoolean(0))
  }
}
