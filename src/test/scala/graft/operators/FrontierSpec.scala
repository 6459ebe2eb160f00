package graft.operators

import graft.SparkSpec
import graft.sources.Crawl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[WebGraph.frontierFromSets]] / [[Crawl.frontier]] / canonical
  * [[Crawl.latestPerUrl]] — the crawl-loop closure: discovered minus
  * seen on the CANONICAL key, per-host politeness caps, and revisit
  * resolution that collapses canonicalization-junk variants.
  */
class FrontierSpec extends AnyFunSuite with SparkSpec {

  test("frontier: seen links drop on the canonical key, cap bites in byte order") {
    import spark.implicits._
    val seen = Seq("http://a.com/1", "http://a.com/2").toDF("url")
    val cand = Seq(
      "http://a.com/1",  // already seen -> drops
      "http://a.com/3", "http://a.com/4", "http://a.com/5",
      "http://a.com/6",  // 4 fresh on a.com -> cap 3 keeps 3/4/5
      "http://b.org/x",
      "not a parseable url" // no host -> drops
    ).toDF("url")
    val f = WebGraph.frontierFromSets(seen, cand, 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(f === Set(
      ("a.com", "http://a.com/3", 1L), ("a.com", "http://a.com/4", 2L),
      ("a.com", "http://a.com/5", 3L), ("b.org", "http://b.org/x", 1L)))
  }

  test("latestPerUrl(canonical=true) collapses junk variants; unparseable pass through") {
    import spark.implicits._
    val parsed = Seq(
      // same page, three raw spellings; doc_id breaks the ts tie
      (false, "http://A.com/p?utm_source=x", "2026-03-01 00:00:00", 1L, "v1"),
      (false, "http://a.com/p/",             "2026-03-02 00:00:00", 2L, "v2"),
      (false, "HTTP://WWW.a.com/p#f",        "2026-03-02 00:00:00", 3L, "v3"),
      (false, "http://b.org/q",              "2026-03-01 00:00:00", 4L, "w1"),
      (false, "garbage url",                 "2026-03-01 00:00:00", 5L, "g1"),
      (true,  "http://c.net/corrupt",        "2026-03-01 00:00:00", 6L, "c1")
    ).toDF("corrupt", "url", "ts_s", "doc_id", "text")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Crawl.latestPerUrl(parsed, canonical = true)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // page a.com/p: latest ts is shared by docs 2 and 3 -> doc 3 wins;
    // garbage url has no canonical key -> passes through untouched
    assert(out === Set((3L, "v3"), (4L, "w1"), (5L, "g1")))
    // default (raw-key) behavior unchanged: all three spellings survive
    assert(Crawl.latestPerUrl(parsed).count() === 5)
  }

  private def warcRec(uri: String, body: String): Array[Byte] = {
    val block = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    val bb = block.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-03-01T00:00:00Z\r\nContent-Length: ${bb.length}" +
      "\r\n\r\n").getBytes("UTF-8") ++ bb ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val os = new java.util.zip.GZIPOutputStream(bos)
    os.write(b); os.close()
    bos.toByteArray
  }

  test("Crawl.frontier end to end: captured pages drop, discoveries land") {
    val dir = java.nio.file.Files.createTempDirectory("graft-frontier")
    java.nio.file.Files.write(dir.resolve("s.warc.gz"),
      gz(warcRec("http://a.com/1",
        // links: the OTHER captured page (drops), a fresh page on b.org,
        // and a junk-tracking variant of a fresh page (canonicalizes)
        """<a href="http://b.org/2">seen</a>
          |<a href="http://b.org/fresh?utm_source=x">f</a>
          |<a href="http://c.net/new#frag">c</a>""".stripMargin)) ++
      gz(warcRec("http://b.org/2",
        """<a href="http://a.com/1/">back-to-seen-with-slash</a>
          |<a href="http://b.org/fresh">same-after-canon</a>""".stripMargin)))
    val parsed = Crawl.readWarc(spark, dir.toString, extractHtml = false)
    val f = Crawl.frontier(parsed, perHostCap = 8).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(f === Set(("b.org", "http://b.org/fresh"),
                     ("c.net", "http://c.net/new")))
  }

  test("recrawl stats and mirror evidence run off a real WARC frame (the documented glue)") {
    import graft.sources.Urls
    val dir = java.nio.file.Files.createTempDirectory("graft-realframe")
    java.nio.file.Files.write(dir.resolve("s.warc.gz"),
      // a.com/page: three captures (one a tracking-junk variant), two
      // distinct bodies -> 2 versions over 2 revisits
      gz(warcRec("http://a.com/page", "content v1")) ++
      gz(warcRec("http://a.com/page?utm_source=x", "content v2")) ++
      gz(warcRec("http://a.com/page", "content v2")) ++
      // b.org/static: two captures, same body -> cold
      gz(warcRec("http://b.org/static", "never changes")) ++
      gz(warcRec("http://b.org/static", "never changes")) ++
      // m1.com / m2.com: identical bodies on two paths -> mirrors
      gz(warcRec("http://m1.com/x", "mirrored doc one")) ++
      gz(warcRec("http://m2.com/x", "mirrored doc one")) ++
      gz(warcRec("http://m1.com/y", "mirrored doc two")) ++
      gz(warcRec("http://m2.com/y", "mirrored doc two")))
    val parsed = Crawl.readWarc(spark, dir.toString, extractHtml = false)
      .filter(!col("corrupt"))

    val stats = WebGraph.recrawlPriority(
        parsed.select(Urls.canonicalize(col("url")).as("canon_url"),
                      xxhash64(col("text")).as("fp"))
          .filter(col("canon_url").isNotNull))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getString(5)))).toMap
    assert(stats("http://a.com/page") === ((3L, 1L, "hot")),
           "junk variant must collapse onto the page; versions = 2")
    assert(stats("http://b.org/static") === ((2L, 0L, "cold")))

    val mirrors = WebGraph.mirrorHosts(
        parsed.select(Urls.host(col("url")).as("host"),
                      xxhash64(col("text")).as("fp"))
          .filter(col("host").isNotNull),
        maxHostsPerFp = 10, minShared = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
                           r.getDouble(3)))
    assert(mirrors.toSeq === Seq(("m1.com", "m2.com", 2L, 1.0)))
  }
}
