package graft.operators // ingestVerdict access; the source under test is graft.sources.Crawl

import graft.SparkSpec
import graft.sources.Crawl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The crawl-native JSONL source: gzip and plain members of one
  * directory parse through a single batch/stream parser with the S2
  * corrupt-line discipline — malformed lines and records missing
  * required fields surface as counted `corrupt` rows (raw line kept
  * for repair), defaults fill optional fields, and the streamed read
  * (file source, forced multi-batch) lands the same doc set as the
  * batch read. The clean feed then runs [[Curation.ingestStream]]
  * UNCHANGED — the contract the source exists to close.
  */
class CrawlSourceSpec extends AnyFunSuite with SparkSpec {

  // 64 distinct 3-char tokens, 10 of them stopwords -> quality
  // = 1.0 * (0.5 + 10/64) ~ 0.656 >= 0.5: passes the ingest floor
  private val goodText = ((1 to 54).map(i => f"w$i%03d") ++
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it"))
    .mkString(" ")

  private def gzWrite(path: java.nio.file.Path, lines: Seq[String]): Unit = {
    val os = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(path))
    try os.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally os.close()
  }

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-crawl")
    gzWrite(dir.resolve("shard-000.jsonl.gz"), Seq(
      s"""{"doc_id":1,"url":"http://a/1","source":"cc","text":"$goodText","lang":"en","ts":"2026-02-01T00:00:00"}""",
      // optional fields absent -> source=crawl, lang=LangId prediction
      // (goodText carries English markers), ts=ingest clock
      // (text distinct from doc 1's, or ingest's content-hash dedup eats it)
      s"""{"doc_id":2,"text":"$goodText dos"}""",
      // epoch-seconds ts form
      s"""{"doc_id":3,"text":"$goodText extra","lang":"en","ts":"1767225600"}"""))
    java.nio.file.Files.write(dir.resolve("shard-001.jsonl"),
      (Seq(
        s"""{"doc_id":4,"text":"$goodText more","lang":"en","ts":"2026-02-01T01:00:00"}""",
        """{"doc_id":5,"text":"tiny low quality","lang":"en"}""",
        "%% not json at all %%",
        """{"doc_id":6,"lang":"en"}""", // required `text` missing -> corrupt
        // no declared lang AND no marker hits -> 'und', never a
        // tie-order guess (fails the quality floor, so ingest
        // keeper sets are unaffected)
        """{"doc_id":7,"text":"tiny lowly qualities"}"""
      ).mkString("\n") + "\n").getBytes("UTF-8"))
    dir.toString
  }

  test("batch read: corrupt lines counted and kept raw, defaults applied, gz + plain members") {
    val parsed = Crawl.readCrawl(spark, fixture()).cache()
    try {
      assert(parsed.count() === 8)
      assert(Crawl.crawlCorrupt(parsed).count() === 2)
      val corrupt = Crawl.crawlCorrupt(parsed)
        .collect().map(_.getString(0)).toSet
      assert(corrupt.exists(_.contains("not json")), "raw line not kept")
      assert(corrupt.exists(_.contains("\"doc_id\":6")),
             "record missing required text must be corrupt")
      val docs = Crawl.crawlDocs(parsed)
      assert(docs.count() === 6)
      val d2 = docs.filter(col("doc_id") === 2).head()
      assert(d2.getAs[String]("source") === "crawl")
      // no declared lang -> the LangId marker-profile prediction (the
      // q33 core) — goodText carries English stopword markers
      assert(d2.getAs[String]("lang") === "en")
      assert(d2.getAs[java.sql.Timestamp]("ts") != null)
      assert(docs.filter(col("doc_id") === 7).head()
               .getAs[String]("lang") === "und",
             "zero marker hits must land 'und', not a tie-order guess")
      assert(docs.filter(col("doc_id") === 5).head()
               .getAs[String]("lang") === "en",
             "a DECLARED lang must win over the prediction")
      val d3 = docs.filter(col("doc_id") === 3)
        .select(col("ts").cast("string")).head().getString(0)
      assert(d3 === "2026-01-01 00:00:00", s"epoch ts parsed as $d3")
    } finally parsed.unpersist()
  }

  test("streamed read == batch read, and the clean feed runs ingestStream unchanged") {
    val dir = fixture()
    val batchDocs = Crawl.crawlDocs(Crawl.readCrawl(spark, dir))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // maxFilesPerTrigger=1 forces one micro-batch per member file
    val parsedStream = Crawl.readCrawlStream(spark, dir, maxFilesPerTrigger = 1)
    val q = Crawl.crawlDocs(parsedStream)
      .writeStream.format("memory").queryName("crawl_docs")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("crawl_docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed === batchDocs, "streamed doc set != batch doc set")
    assert(q.recentProgress.length >= 2,
           "expected one micro-batch per member file")

    // the contract: the parsed feed drives the curation ingest as-is
    val q2 = Curation.ingestStream(
        Crawl.crawlDocs(Crawl.readCrawlStream(spark, dir)))
      .writeStream.format("memory").queryName("crawl_ingest")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val kept = spark.table("crawl_ingest")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 5 ("tiny low quality") fails the quality floor; 1-4 pass
    assert(kept === Set(1L, 2L, 3L, 4L),
           s"ingest keepers diverged: $kept")
  }

  test("writeCrawl round-trips through readCrawl on the contract columns") {
    val dir = fixture()
    // cache: the ingest-clock default (current_timestamp on docs with
    // no ts field) is per-action otherwise, and the export would land
    // a different clock than the comparison read
    val docs = Crawl.crawlDocs(Crawl.readCrawl(spark, dir)).cache()
    docs.count()
    // ts compared at millis (Timestamp.getTime): to_json serializes
    // ISO-8601 with millisecond precision — the documented contract
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "source", "text", "lang", "ts")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
                                  r.getString(3),
                                  r.getTimestamp(4).getTime)))
      .toMap
    val before = key(docs)

    val out = java.nio.file.Files
      .createTempDirectory("graft-crawl-export").toString + "/dump"
    Crawl.writeCrawl(docs, out)
    // the export is itself a valid crawl dir: gzipped members, zero
    // corrupt lines, and the reader recovers every contract column
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".gz")),
           "export members must be gzipped JSONL")
    val back = Crawl.readCrawl(spark, out)
    assert(Crawl.crawlCorrupt(back).count() === 0,
           "round-trip produced corrupt lines")
    assert(key(Crawl.crawlDocs(back)) === before,
           "round-tripped docs diverged from the originals")
  }
}
