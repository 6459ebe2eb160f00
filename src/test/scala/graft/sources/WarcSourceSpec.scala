package graft.operators // ingestStream access; the source under test is graft.sources.Crawl

import graft.SparkSpec
import graft.sources.Crawl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WARC front-end (Common-Crawl-native: one gzip member per
  * record): response records land as docs on the [[Crawl.parseCrawl]]
  * typed-frame contract, protocol records (warcinfo/request) are
  * skipped by design, and DAMAGE — a truncated gzip member, an
  * overrunning Content-Length — surfaces as counted `corrupt` rows
  * carrying the raw head, never an aborted read. Batch and stream
  * share one parser; the clean feed drives
  * [[Curation.ingestStream]] unchanged.
  */
class WarcSourceSpec extends AnyFunSuite with SparkSpec {

  // quality-floor-passing body (the CrawlSourceSpec recipe): 64
  // distinct tokens, 10 stopwords -> quality ~0.656 >= 0.5
  private val goodText = ((1 to 54).map(i => f"w$i%03d") ++
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it"))
    .mkString(" ")

  private def rec(tpe: String, uri: String, date: String,
                  body: String, declaredLen: Option[Int] = None)
      : Array[Byte] = {
    val block =
      if (tpe == "response")
        s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n$body"
      else body
    val blockBytes = block.getBytes("UTF-8")
    val hdr = new StringBuilder("WARC/1.0\r\n")
    hdr ++= s"WARC-Type: $tpe\r\n"
    if (uri != null) hdr ++= s"WARC-Target-URI: $uri\r\n"
    if (date != null) hdr ++= s"WARC-Date: $date\r\n"
    hdr ++= s"Content-Length: ${declaredLen.getOrElse(blockBytes.length)}\r\n\r\n"
    hdr.toString.getBytes("UTF-8") ++ blockBytes ++
      "\r\n\r\n".getBytes("UTF-8")
  }

  private def gzMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val os = new java.util.zip.GZIPOutputStream(bos)
    os.write(b); os.close()
    bos.toByteArray
  }

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    // shard 0: the Common-Crawl layout — envelope records interleaved
    // with responses, one gzip member each
    java.nio.file.Files.write(dir.resolve("shard-000.warc.gz"),
      gzMember(rec("warcinfo", null, "2026-02-01T00:00:00Z",
                   "software: test\r\n")) ++
      gzMember(rec("response", "http://a/1", "2026-02-01T00:00:00Z",
                   s"$goodText")) ++
      gzMember(rec("request", "http://a/1", "2026-02-01T00:00:00Z",
                   "GET /1 HTTP/1.1\r\n")) ++
      gzMember(rec("response", "http://a/2", "2026-02-01T01:00:00Z",
                   s"$goodText dos")))
    // shard 1: plain .warc, one good response then an OVERRUNNING
    // Content-Length (declares more bytes than the file holds)
    java.nio.file.Files.write(dir.resolve("shard-001.warc"),
      rec("response", "http://b/3", "2026-02-01T02:00:00Z",
          s"$goodText tres") ++
      rec("response", "http://b/4", "2026-02-01T03:00:00Z",
          "short", declaredLen = Some(999999)))
    // shard 2: a good member then a TRUNCATED gzip member
    val whole = gzMember(rec("response", "http://c/5",
                             "2026-02-01T04:00:00Z", s"$goodText quatro"))
    val cut = gzMember(rec("response", "http://c/6",
                           "2026-02-01T05:00:00Z", s"$goodText cinco"))
    java.nio.file.Files.write(dir.resolve("shard-002.warc.gz"),
      whole ++ cut.take(cut.length / 2))
    // shard 3: a good record then a NEGATIVE Content-Length (must be
    // a counted corrupt row, not an index crash)
    java.nio.file.Files.write(dir.resolve("shard-003.warc"),
      rec("response", "http://d/7", "2026-02-01T06:00:00Z",
          s"$goodText seis") ++
      rec("response", "http://d/8", "2026-02-01T07:00:00Z",
          "short", declaredLen = Some(-7)))
    // shard 4: a declared length past Int.MaxValue (must be damage,
    // not an allocation attempt) — written via a raw header because
    // rec's declaredLen is an Int
    java.nio.file.Files.write(dir.resolve("shard-004.warc"),
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
       "WARC-Target-URI: http://e/9\r\n" +
       "Content-Length: 9999999999\r\n\r\nshort").getBytes("UTF-8"))
    dir.toString
  }

  test("batch read: responses land, envelope records skip, damage is counted not fatal") {
    val parsed = Crawl.readWarc(spark, fixture()).cache()
    try {
      val docs = Crawl.crawlDocs(parsed)
      val byUrl = parsed.filter(!col("corrupt"))
        .select(col("url"), col("text"), col("source"), col("lang"),
                col("ts").cast("string").as("ts"), col("doc_id"))
        .collect().map(r => r.getString(0) -> r).toMap
      assert(byUrl.keySet === Set("http://a/1", "http://a/2",
                                  "http://b/3", "http://c/5",
                                  "http://d/7"),
             s"response set diverged: ${byUrl.keySet}")
      assert(byUrl("http://a/1").getAs[String]("text") === goodText,
             "HTTP headers leaked into the body")
      assert(byUrl("http://a/2").getAs[String]("ts") ===
               "2026-02-01 01:00:00", "WARC-Date not parsed")
      // source = the URL host, so per-source operators get real
      // strata on a WARC corpus (constant 'warc' would collapse them)
      assert(byUrl.map { case (u, r) => u -> r.getAs[String]("source") } ===
               Map("http://a/1" -> "a", "http://a/2" -> "a",
                   "http://b/3" -> "b", "http://c/5" -> "c",
                   "http://d/7" -> "d"))
      assert(byUrl.values.map(_.getAs[Long]("doc_id")).toSet.size === 5,
             "derived doc_ids must be distinct")
      assert(docs.count() === 5,
             "crawlDocs contract must carry exactly the clean responses")
      // damage: one overrun (shard 1 tail), one truncated gz member
      // (shard 2 tail), one negative Content-Length (shard 3 tail) —
      // each counted with its header head kept, none fatal
      val corrupt = Crawl.crawlCorrupt(parsed)
        .collect().map(_.getString(0))
      assert(corrupt.length === 4,
             s"expected 4 corrupt regions, got ${corrupt.toSeq}")
      assert(corrupt.exists(_.contains("http://b/4")),
             "overrun record's header head not kept for repair")
      assert(corrupt.exists(_.contains("http://d/8")),
             "negative-length record's header head not kept for repair")
      assert(corrupt.exists(_.contains("http://e/9")),
             "past-Int-range length record's header head not kept")
      // doc_id is re-read-stable (pure content hash)
      val again = Crawl.crawlDocs(Crawl.readWarc(spark, fixture()))
      // NB: fixture() re-creates the same bytes in a new dir
      assert(again.select("doc_id").collect().map(_.getLong(0)).toSet ===
               docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    } finally parsed.unpersist()
  }

  test("streamed read == batch read; the clean feed drives ingestStream unchanged") {
    val dir = fixture()
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "url", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val batch = key(Crawl.readWarc(spark, dir).filter(!col("corrupt")))

    val q = Crawl.readWarcStream(spark, dir, maxFilesPerTrigger = 1)
      .filter(!col("corrupt"))
      .writeStream.format("memory").queryName("warc_docs")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(key(spark.table("warc_docs")) === batch,
           "streamed response set != batch response set")
    assert(q.recentProgress.length >= 3,
           "expected one micro-batch per member file")

    val q2 = Curation.ingestStream(
        Crawl.crawlDocs(Crawl.readWarcStream(spark, dir)))
      .writeStream.format("memory").queryName("warc_ingest")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    // all four bodies pass the quality floor -> all four ingest
    assert(spark.table("warc_ingest").select("doc_id")
             .collect().map(_.getLong(0)).toSet === batch.keySet,
           "ingest keepers diverged from the parsed responses")
  }
}
