package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r20: [[Urls.canonicalize]] / [[Urls.host]] moved from ~15 chained
  * regex/array expressions per row to one-pass JVM scanners. This spec is
  * the equality proof: the old column trees stay in the object as
  * [[Urls.canonicalizeRef]] / [[Urls.hostRef]], and every row of an
  * adversarial URL corpus (hand-built edge cases + a deterministic fuzz
  * sweep over component combinations) must canonicalize IDENTICALLY
  * under both spellings — including the NULL verdicts.
  */
class UrlsDiffSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val handCases: Seq[String] = Seq(
    "HTTP://WWW.Example.COM:80/a/b//",
    "https://example.com:443/x?b=2&a=1&utm_source=s&fbclid=f#frag",
    "ftp://u:p@Host.net:2121/dir/",
    "x", "", "not a url 5", "http//missing.colon/x",
    "http://:80/path", "http://host:080/", "http://host:8080x/",
    "http://host:8080/", "http://host?x=1", "http://host?",
    "http://host?&", "http://host?a", "http://host?=v",
    "http://host?a=1&&b=2&", "http://a@b@c.com/",
    "http://b\u00fccher.example/x", "http://WWW.B\u00dcCHER.example/x",
    "http://xn--bcher-kva.example/x", "scheme+weird.x-y://host/p",
    "http://#frag", "http:///path", "a://h?x=1&x=1&b",
    "http://h/p?a=1?b=2", "http://h/p#f?x=1", "http://h#f",
    "HTTPS://U:PW@WWW.M\u00dcNCHEN.EXAMPLE:443/Item7/?b=1&ref=z&a=2#s",
    "http://www.www.example.com/x", "1http://host/x",
    "http://host./x", "http://host/x/?", "http://host//",
    "http://host:12a3/x", "http://host:/x", "?just=query",
    "//schemeless/x", "mailto:user@example.com",
    "http://h/p?utm_source=a&utm_medium=b&gclid=c", // all params dropped
    "http://h/p?z=1&y=2&x=3&w=4")

  private def fuzz: Seq[String] = {
    val schemes = Seq("http", "HTTP", "https", "ftp+x.y-z", "9bad", "")
    val users = Seq("", "u:p@", "@", "a@b@")
    val hosts = Seq("Example.COM", "WWW.site.ORG", "b\u00fccher.example",
                    "", "host7", "xn--bro-hoa.example")
    val ports = Seq("", ":80", ":443", ":8080", ":0", ":x9")
    val paths = Seq("", "/", "/a/b", "/a/b///", "/Item3")
    val queries = Seq("", "?", "?b=2&a=1", "?utm_source=s&keep=1",
                      "?ref=x&fbclid=y", "?dup=1&dup=1&")
    val frags = Seq("", "#f", "#a?b=1")
    for {
      s <- schemes; u <- users; h <- hosts; p <- ports
      pa <- paths; q <- queries; f <- frags
      if (s.length + h.length) % 3 != 2 // deterministic thinning (~2/3)
    } yield (if (s.isEmpty) "" else s + "://") + u + h + p + pa + q + f
  }

  test("one-pass canonicalize/host equal the reference column trees") {
    val urls = (handCases ++ fuzz) :+ (null: String)
    val df = urls.toDF("url").select(
      col("url"),
      Urls.canonicalize(col("url")).as("c_new"),
      Urls.canonicalizeRef(col("url")).as("c_ref"),
      Urls.host(col("url")).as("h_new"),
      Urls.hostRef(col("url")).as("h_ref"))
    val bad = df.filter(
      !(col("c_new") <=> col("c_ref")) || !(col("h_new") <=> col("h_ref")))
      .collect()
    assert(bad.isEmpty,
      s"${bad.length} divergent rows, first: ${bad.take(5).mkString("; ")}")
    // sanity: the corpus actually exercises both verdicts
    val n = df.count()
    val nonNull = df.filter(col("c_new").isNotNull).count()
    assert(n > 2000 && nonNull > 500 && nonNull < n,
      s"degenerate corpus: $nonNull/$n parseable")
  }
}
