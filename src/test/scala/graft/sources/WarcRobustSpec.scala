package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 WARC front-end hardening: per-member damage RESYNC (one
  * flipped byte must not quarantine the rest of a 1000-member file),
  * CRC-verified members, WARC-Record-ID-backed doc_ids, chunked/
  * charset HTTP bodies through a full record, default HTML-to-text
  * extraction, and language-ID at ingest — including the downstream
  * proof that per-language operators (q62 stratified sampling, q143
  * CCNet buckets) are non-degenerate on a WARC-fed corpus.
  */
class WarcRobustSpec extends AnyFunSuite with SparkSpec {

  // quality-floor-passing body: 64 distinct tokens, 10 stopwords
  private val goodText = ((1 to 54).map(i => f"w$i%03d") ++
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it"))
    .mkString(" ")

  /** One WARC record with custom WARC + HTTP headers and a byte body. */
  private def rec(uri: String, date: String, body: Array[Byte],
                  httpHeaders: Seq[String] = Seq("Content-Type: text/plain"),
                  warcHeaders: Seq[String] = Nil,
                  tpe: String = "response"): Array[Byte] = {
    val block =
      (s"HTTP/1.1 200 OK\r\n" + httpHeaders.map(_ + "\r\n").mkString +
        "\r\n").getBytes("ISO-8859-1") ++ body
    val hdr = new StringBuilder("WARC/1.0\r\n")
    hdr ++= s"WARC-Type: $tpe\r\n"
    if (uri != null) hdr ++= s"WARC-Target-URI: $uri\r\n"
    if (date != null) hdr ++= s"WARC-Date: $date\r\n"
    warcHeaders.foreach(h => hdr ++= s"$h\r\n")
    hdr ++= s"Content-Length: ${block.length}\r\n\r\n"
    hdr.toString.getBytes("ISO-8859-1") ++ block ++
      "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def text(uri: String, date: String, body: String): Array[Byte] =
    rec(uri, date, body.getBytes("UTF-8"))

  private def gzMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val os = new java.util.zip.GZIPOutputStream(bos)
    os.write(b); os.close()
    bos.toByteArray
  }

  private def tmpDir(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(s"graft-warc-$tag")

  private def urls(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.filter(!col("corrupt")).select("url").collect()
      .map(_.getString(0)).toSet

  test("a damaged middle member resyncs: later records land, damage count exact") {
    val m1 = gzMember(text("http://r/1", "2026-03-01T00:00:00Z", goodText))
    val m2 = gzMember(text("http://r/2", "2026-03-01T01:00:00Z",
                           s"$goodText two"))
    val m3 = gzMember(text("http://r/3", "2026-03-01T02:00:00Z",
                           s"$goodText three"))
    // flip one byte in the MIDDLE member's deflate payload
    val bad = m2.clone()
    bad(m2.length / 2) = (bad(m2.length / 2) ^ 0x5a).toByte
    val dir = tmpDir("resync")
    java.nio.file.Files.write(dir.resolve("f.warc.gz"), m1 ++ bad ++ m3)
    val parsed = Crawl.readWarc(spark, dir.toString)
    assert(urls(parsed) === Set("http://r/1", "http://r/3"),
           "records after the damaged member must land")
    assert(Crawl.crawlCorrupt(parsed).count() === 1,
           "one damaged region -> exactly one corrupt row")
    // stream == batch on the same damaged file
    val q = Crawl.readWarcStream(spark, dir.toString)
      .filter(!col("corrupt"))
      .writeStream.format("memory").queryName("warc_resync")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("warc_resync").select("url").collect()
             .map(_.getString(0)).toSet === Set("http://r/1", "http://r/3"))
  }

  test("a damaged FIRST member resyncs too; consecutive damage is one region") {
    val m1 = gzMember(text("http://f/1", "2026-03-01T00:00:00Z", goodText))
    val m2 = gzMember(text("http://f/2", "2026-03-01T01:00:00Z",
                           s"$goodText zwei"))
    val junk = Array.fill[Byte](64)(0x21)
    val dir = tmpDir("first")
    // leading garbage is not even a member header; then a good member,
    // then inter-member junk, then another good member
    java.nio.file.Files.write(dir.resolve("f.warc.gz"),
      Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x7f) ++ junk ++ m1 ++ junk ++ m2)
    val parsed = Crawl.readWarc(spark, dir.toString)
    assert(urls(parsed) === Set("http://f/1", "http://f/2"))
    assert(Crawl.crawlCorrupt(parsed).count() === 2,
           "two damaged regions -> two corrupt rows")
  }

  test("a member whose CRC trailer lies is discarded, not served") {
    val m1 = gzMember(text("http://c/1", "2026-03-01T00:00:00Z", goodText))
    val m2 = gzMember(text("http://c/2", "2026-03-01T01:00:00Z",
                           s"$goodText dois"))
    // corrupt m1's stored CRC (first 4 of the trailing 8 bytes): the
    // deflate stream still inflates, but the member must not serve
    val bad = m1.clone()
    bad(m1.length - 8) = (bad(m1.length - 8) ^ 0xff).toByte
    val dir = tmpDir("crc")
    java.nio.file.Files.write(dir.resolve("f.warc.gz"), bad ++ m2)
    val parsed = Crawl.readWarc(spark, dir.toString)
    assert(urls(parsed) === Set("http://c/2"),
           "a checksum-failing member must not land documents")
    assert(Crawl.crawlCorrupt(parsed).count() === 1)
  }

  test("WARC-Record-ID backs doc_id: identical re-fetches stay distinct, ids re-read-stable") {
    val dir = tmpDir("rid")
    val same = (n: Int) => gzMember(rec(
      "http://dup/x", "2026-03-01T00:00:00Z", goodText.getBytes("UTF-8"),
      warcHeaders = Seq(s"WARC-Record-ID: <urn:uuid:0000-$n>")))
    java.nio.file.Files.write(dir.resolve("f.warc.gz"), same(1) ++ same(2))
    def ids() = Crawl.crawlDocs(Crawl.readWarc(spark, dir.toString))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = ids()
    assert(first.size === 2,
           "byte-identical re-fetches with distinct record ids must get distinct doc_ids")
    assert(ids() === first, "doc_id must be re-read-stable")
  }

  test("chunked + charset through a full record; malformed chunking is record-local") {
    val latinBody = "café du marché".getBytes("ISO-8859-1")
    val chunked = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("5\r\n".getBytes("US-ASCII")); b.write(latinBody, 0, 5)
      b.write(s"\r\n${(latinBody.length - 5).toHexString}\r\n"
        .getBytes("US-ASCII"))
      b.write(latinBody, 5, latinBody.length - 5)
      b.write("\r\n0\r\n\r\n".getBytes("US-ASCII"))
      b.toByteArray
    }
    val dir = tmpDir("chunk")
    // plain .warc: a malformed-chunked record then two good ones — the
    // malformed BODY is record-local damage, the stream keeps parsing
    java.nio.file.Files.write(dir.resolve("f.warc"),
      rec("http://ch/bad", "2026-03-01T00:00:00Z",
          "ZZZ\r\nnope\r\n0\r\n\r\n".getBytes("US-ASCII"),
          httpHeaders = Seq("Transfer-Encoding: chunked",
                            "Content-Type: text/plain")) ++
      rec("http://ch/1", "2026-03-01T01:00:00Z", chunked,
          httpHeaders = Seq("Transfer-Encoding: chunked",
            "Content-Type: text/plain; charset=ISO-8859-1")) ++
      text("http://ch/2", "2026-03-01T02:00:00Z", s"$goodText after"))
    val parsed = Crawl.readWarc(spark, dir.toString)
    val byUrl = parsed.filter(!col("corrupt"))
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byUrl.keySet === Set("http://ch/1", "http://ch/2"),
           "records after a record-local body failure must still land")
    assert(byUrl("http://ch/1") === "café du marché",
           "chunked framing must strip and the declared charset decode")
    val corrupt = Crawl.crawlCorrupt(parsed).collect().map(_.getString(0))
    assert(corrupt.length === 1 && corrupt.head.contains("http://ch/bad"),
           s"malformed chunking must count with its header head: ${corrupt.toSeq}")
  }

  test("HTML bodies extract by default; extractHtml=false keeps raw markup") {
    val html = "<html><head><title>T</title><style>p{}</style></head>" +
      "<body><p>le chat et la souris de un jour</p>" +
      "<script>track()</script></body></html>"
    val dir = tmpDir("html")
    java.nio.file.Files.write(dir.resolve("f.warc.gz"),
      gzMember(rec("http://h/1", "2026-03-01T00:00:00Z",
                   html.getBytes("UTF-8"),
                   httpHeaders = Seq("Content-Type: text/html; charset=utf-8"))))
    val doc = Crawl.crawlDocs(Crawl.readWarc(spark, dir.toString)).head()
    assert(doc.getAs[String]("text") === "T le chat et la souris de un jour",
           "markup must strip (style/script dropped, title text kept)")
    assert(doc.getAs[String]("lang") === "fr",
           "language must be predicted over the EXTRACTED prose")
    val raw = Crawl.crawlDocs(
      Crawl.readWarc(spark, dir.toString, extractHtml = false)).head()
    assert(raw.getAs[String]("text").contains("<body>"),
           "extractHtml=false must keep the raw body")
  }

  test("mainContent mode drops nav/footer boilerplate end-to-end") {
    val html = "<html><body>" +
      "<nav><a href='/'>Home</a> <a href='/a'>About</a> " +
      "<a href='/b'>Products</a> <a href='/c'>Contact us today</a></nav>" +
      "<article><p>le chat et la souris de un jour vont vers la mer " +
      "encore une fois</p></article>" +
      "<footer><a href='/t'>Terms</a> <a href='/p'>Privacy</a></footer>" +
      "</body></html>"
    val dir = tmpDir("main")
    java.nio.file.Files.write(dir.resolve("f.warc.gz"),
      gzMember(rec("http://mc/1", "2026-03-01T00:00:00Z",
                   html.getBytes("UTF-8"),
                   httpHeaders = Seq("Content-Type: text/html"))))
    val doc = Crawl.crawlDocs(
      Crawl.readWarc(spark, dir.toString, mainContent = true)).head()
    assert(doc.getAs[String]("text") ===
      "le chat et la souris de un jour vont vers la mer encore une fois",
      "boilerplate must drop, the article must survive")
    assert(doc.getAs[String]("lang") === "fr",
           "language must be predicted over the MAIN content")
    // default mode keeps everything (no silent content loss)
    val full = Crawl.crawlDocs(Crawl.readWarc(spark, dir.toString)).head()
    assert(full.getAs[String]("text").contains("Home") &&
             full.getAs[String]("text").contains("Terms"),
           "default tag-strip mode must keep all prose")
  }

  /** A 3-language WARC corpus landed as a documents table. */
  private def multilingualCorpus(): String = {
    val en = s"$goodText"
    val fr = "le chat et la souris de un jour vont le matin vers la mer " +
      "et un ami de la ville " + (1 to 40).map(i => f"fw$i%03d").mkString(" ")
    val es = "el perro y la casa de un amigo y el gato van por el camino " +
      (1 to 40).map(i => f"sw$i%03d").mkString(" ")
    val dir = tmpDir("multi")
    java.nio.file.Files.write(dir.resolve("f.warc.gz"),
      gzMember(text("http://m/en", "2026-03-01T00:00:00Z", en)) ++
        gzMember(text("http://m/fr", "2026-03-01T01:00:00Z", fr)) ++
        gzMember(text("http://m/es", "2026-03-01T02:00:00Z", es)))
    val docs = Crawl.crawlDocs(Crawl.readWarc(spark, dir.toString))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
              length(col("text")).cast("long").as("n_chars"))
    val corpus = tmpDir("multi-corpus").toString
    docs.write.parquet(s"$corpus/documents.parquet")
    corpus
  }

  test("per-language operators are non-degenerate on a WARC-fed corpus") {
    val corpus = multilingualCorpus()
    val landed = spark.read.parquet(s"$corpus/documents.parquet")
    assert(landed.select("lang").distinct().collect().map(_.getString(0))
             .toSet === Set("en", "fr", "es"),
           "ingest must land real languages, not one 'und' stratum")
    val strata = graft.SparkEntry.queries("q62_stratified_sample")(
        spark, corpus)
      .select("lang").distinct().count()
    assert(strata === 3, s"q62 found $strata strata on a 3-language corpus")
    val buckets = graft.SparkEntry.queries("q143_ccnet_buckets")(
        spark, corpus)
      .select("lang").distinct().count()
    assert(buckets === 3, s"q143 found $buckets language groups")
  }

  test("q171 closes the loop: extraction drives markup residue to zero, raw mode does not") {
    val html = (i: Int) => "<html><body><nav><a href='/'>Home</a></nav>" +
      s"<p>the articles $i have &amp; carry enough prose to matter " +
      "for the residue audit here</p></body></html>"
    val dir = tmpDir("residue")
    java.nio.file.Files.write(dir.resolve("f.warc.gz"),
      (0 until 4).map(i => gzMember(rec(s"http://res.example/$i",
        "2026-03-01T00:00:00Z", html(i).getBytes("UTF-8"),
        httpHeaders = Seq("Content-Type: text/html")))).reduce(_ ++ _))
    def land(extract: Boolean): String = {
      val docs = Crawl.crawlDocs(
          Crawl.readWarc(spark, dir.toString, extractHtml = extract))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
                length(col("text")).cast("long").as("n_chars"))
      val corpus = tmpDir(s"residue-corpus-$extract").toString
      docs.write.parquet(s"$corpus/documents.parquet")
      corpus
    }
    def markup(corpus: String): Long =
      graft.SparkEntry.queries("q171_markup_residue")(spark, corpus)
        .agg(sum("n_markup")).head().getLong(0)
    assert(markup(land(extract = true)) === 0L,
           "extracted corpus must carry zero markup residue")
    assert(markup(land(extract = false)) === 4L,
           "raw-mode corpus must show the residue the audit exists to catch")
  }

  test("readCrawlStream(extractHtml) streams the typed map: stream == batch") {
    val line = (i: Int) =>
      s"""{"doc_id":$i,"text":"<p>le chat et la souris de un jour numero $i</p>","url":"http://j/$i"}"""
    val dir = tmpDir("jsonl-extract")
    java.nio.file.Files.write(dir.resolve("a.jsonl"),
      ((0 to 2).map(line).mkString("\n") + "\n").getBytes("UTF-8"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text", "lang").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val batch = key(Crawl.crawlDocs(
      Crawl.readCrawl(spark, dir.toString, extractHtml = true)))
    assert(batch(1L) === (("le chat et la souris de un jour numero 1",
                           "fr")),
           s"extraction or langid diverged on the crawl path: $batch")
    val q = Crawl.crawlDocs(
        Crawl.readCrawlStream(spark, dir.toString, extractHtml = true))
      .writeStream.format("memory").queryName("crawl_extract")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(key(spark.table("crawl_extract")) === batch,
           "streamed extraction != batch extraction")
  }

  test("crawl extraction is a codegen'd expression: no typed-map nodes, SQL surface works") {
    val dir = tmpDir("codegen")
    java.nio.file.Files.write(dir.resolve("a.jsonl"),
      s"""{"doc_id":1,"text":"<p>$goodText</p>"}\n""".getBytes("UTF-8"))
    val plan = Crawl.readCrawl(spark, dir.toString, extractHtml = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("MapElements") &&
             !plan.contains("DeserializeToObject"),
           s"extraction fell out of the columnar pipeline:\n$plan")
    graft.functions.Functions.register(spark)
    val out = spark.sql(
      "SELECT extract_html('<p>a &amp; b</p>') AS t, " +
        "extract_main_html('<h2>Menu</h2>" +
        "<p>this block has more than five words total</p>') AS m").head()
    assert(out.getString(0) === "a & b")
    assert(out.getString(1) === "this block has more than five words total")
  }

  test("extraction never throws and never leaves tag residue (deterministic fuzz)") {
    // seeded char-level mutations of a base page — entity-free input,
    // so the q171 tag signature must NEVER survive extraction (bare
    // '<' literals survive only before non-tag characters, which the
    // signature excludes by construction)
    val base = "<html><head><title>T</title><style>p{}</style></head>" +
      "<body><nav><a href='/x'>go</a></nav><p>some words " +
      "<b>bold</b> 1 < 2 and 3 > 2</p><script>f(1)</script></body>"
    val tagRe = "<[a-zA-Z!/][^>]{0,256}>".r
    for (seed <- 0 until 400) {
      val pos = math.abs((seed * 2654435761L).toInt) % base.length
      val mutated = seed % 4 match {
        case 0 => base.substring(0, pos) // truncate
        case 1 => base.updated(pos, '<') // inject opens
        case 2 => base.updated(pos, '>') // inject closes
        case 3 => base.substring(0, pos) + base // duplicate prefix
      }
      val out = Html.extractText(mutated)       // must not throw
      val main = Html.extractMainText(mutated)  // must not throw
      assert(out != null && main != null)
      assert(tagRe.findFirstIn(out).isEmpty,
             s"seed $seed left tag residue in: $out")
    }
  }

  test("byte-flip sweep: the parser is total and members before the damage always land") {
    val m1 = gzMember(text("http://bf/1", "2026-03-01T00:00:00Z", goodText))
    val m2 = gzMember(text("http://bf/2", "2026-03-01T01:00:00Z",
                           s"$goodText deux"))
    val m3 = gzMember(text("http://bf/3", "2026-03-01T02:00:00Z",
                           s"$goodText trois"))
    val whole = m1 ++ m2 ++ m3
    val bounds = Seq(m1.length, m1.length + m2.length)
    val fullUrls = Set("http://bf/1", "http://bf/2", "http://bf/3")
    var offset = 1 // offset 0 would flip the file-level gz magic: a
                   // plain-warc reinterpretation, valid but different
    while (offset < whole.length) {
      val mutated = whole.clone()
      mutated(offset) = (mutated(offset) ^ 0x5a).toByte
      val rows = Crawl.parseWarcMembers(mutated) // must not throw
      val urls = rows.filter(!_._2).map(_._3).toSet
      assert(urls.subsetOf(fullUrls),
             s"flip@$offset fabricated a record: $urls")
      // every member wholly BEFORE the flipped byte parses untouched
      val intactPrefix = bounds.count(_ <= offset)
      val expectedPrefix = (1 to intactPrefix)
        .map(i => s"http://bf/$i").toSet
      assert(expectedPrefix.subsetOf(urls),
             s"flip@$offset lost an untouched earlier member: $urls")
      offset += 7
    }
  }

  test("latestPerUrl keeps each URL's newest capture, url-less rows pass through") {
    val dir = tmpDir("revisit")
    val same = (n: Int, date: String) => gzMember(rec(
      "http://rv/x", date, s"$goodText v$n".getBytes("UTF-8"),
      warcHeaders = Seq(s"WARC-Record-ID: <urn:uuid:rv-$n>")))
    java.nio.file.Files.write(dir.resolve("f.warc.gz"),
      same(1, "2026-03-01T00:00:00Z") ++
        same(2, "2026-03-02T00:00:00Z") ++ // the latest capture
        gzMember(text("http://rv/y", "2026-03-01T05:00:00Z",
                      s"$goodText why")) ++
        gzMember(text(null, "2026-03-01T06:00:00Z",
                      s"$goodText anon")))
    val resolved = Crawl.latestPerUrl(
      Crawl.readWarc(spark, dir.toString)).cache()
    try {
      assert(resolved.count() === 3,
             "one capture per url plus the url-less row")
      val xText = resolved.filter(col("url") === "http://rv/x")
        .select("text").head().getString(0)
      assert(xText.endsWith("v2"), s"latest capture must win: $xText")
      assert(resolved.filter(col("url").isNull).count() === 1,
             "url-less rows must pass through")
      // composes with crawlDocs unchanged
      assert(Crawl.crawlDocs(
          resolved.withColumn("corrupt", lit(false))).count() === 3)
    } finally resolved.unpersist()
  }

  test("binary responses route to warcAssets and decode via the multimodal pipeline") {
    // a real 2x2 PPM image (the multimodal codec decodes it) and an
    // opaque audio payload (stub-decodes deterministically)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0,
                  0, 0, 255.toByte, 128.toByte, 128.toByte, 128.toByte)
    val opaque = Array[Byte](-1, 0, 77, -128, 33, 9, -5, 127)
    val dir = tmpDir("assets")
    java.nio.file.Files.write(dir.resolve("f.warc.gz"),
      gzMember(rec("http://media.example/a.ppm", "2026-03-01T00:00:00Z",
                   ppm, httpHeaders = Seq(
                     "Content-Type: image/x-portable-pixmap"))) ++
        gzMember(rec("http://media.example/b.mp3", "2026-03-01T01:00:00Z",
                     opaque, httpHeaders = Seq("Content-Type: audio/mpeg"))) ++
        gzMember(text("http://media.example/page",
                      "2026-03-01T02:00:00Z", goodText)))
    val parsed = Crawl.readWarc(spark, dir.toString).cache()
    try {
      // the text path sees ONLY the document; no media garbage
      val docs = Crawl.crawlDocs(parsed).collect()
      assert(docs.length === 1 &&
               docs.head.getAs[String]("text") === goodText,
             "binary responses must not reach the text path")
      assert(Crawl.crawlCorrupt(parsed).count() === 0)
      val assets = Crawl.warcAssets(parsed).collect()
        .map(r => r.getAs[String]("kind") ->
          ((r.getAs[Array[Byte]]("content"),
            r.getAs[org.apache.spark.sql.Row]("meta"))))
        .toMap
      assert(assets.keySet === Set("image", "audio"))
      assert(assets("image")._1.sameElements(ppm),
             "asset payload must round-trip byte-for-byte")
      assert(assets("audio")._1.sameElements(opaque))
      assert(assets("image")._2.getAs[Long]("n_bytes") === ppm.length.toLong)
      assert(assets("image")._2.getAs[String]("source") === "media.example")
      // and the multimodal pipeline consumes the routed frame as-is
      val dec = graft.cpms.Multimodal.decode(Crawl.warcAssets(parsed))
        .collect().map(r => r.getAs[String]("kind") -> r).toMap
      assert(dec.keySet === Set("image", "audio"))
      assert(dec("image").getAs[Int]("width") === 2 &&
               dec("image").getAs[Int]("height") === 2,
             "the routed PPM must decode through the real codec")
    } finally parsed.unpersist()
  }

  test("source lands as the URL host — real per-source strata, 'warc' fallback") {
    val dir = tmpDir("host")
    java.nio.file.Files.write(dir.resolve("f.warc.gz"),
      gzMember(text("http://en.news.example/x",
                    "2026-03-01T00:00:00Z", goodText)) ++
        gzMember(text("HTTPS://WWW.Blog.Example/y",
                      "2026-03-01T01:00:00Z", s"$goodText b")) ++
        gzMember(text(null, "2026-03-01T02:00:00Z", s"$goodText c")))
    val srcs = Crawl.crawlDocs(Crawl.readWarc(spark, dir.toString))
      .select("source").collect().map(_.getString(0)).toSet
    assert(srcs === Set("en.news.example", "blog.example", "warc"),
           s"host-derived sources diverged: $srcs")
  }

  test("streamed langid == batch langid on known-language fixtures") {
    val en = s"$goodText stream"
    val fr = "le chat et la souris de un jour encore"
    val dir = tmpDir("langstream")
    java.nio.file.Files.write(dir.resolve("f.warc.gz"),
      gzMember(text("http://s/en", "2026-03-01T00:00:00Z", en)) ++
        gzMember(text("http://s/fr", "2026-03-01T01:00:00Z", fr)))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("url", "lang").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val batch = key(Crawl.readWarc(spark, dir.toString)
      .filter(!col("corrupt")))
    assert(batch === Map("http://s/en" -> "en", "http://s/fr" -> "fr"))
    val q = Crawl.readWarcStream(spark, dir.toString)
      .filter(!col("corrupt"))
      .writeStream.format("memory").queryName("warc_lang")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(key(spark.table("warc_lang")) === batch,
           "streamed lang assignment != batch")
  }
}
