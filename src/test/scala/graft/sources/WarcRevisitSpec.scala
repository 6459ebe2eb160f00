package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ISO 28500 `WARC-Type: revisit` records — how a 304-economy crawl
  * RECORDS "this URL was re-fetched and its content is unchanged"
  * (server-not-modified profile: the 304's HTTP headers; identical-
  * payload-digest profile: no HTTP block at all). The parser lifts
  * them as capture rows with null text/payload and a `revisit`
  * marker; the recency/validator/change tiers count the capture,
  * the doc pipeline never sees it.
  */
class WarcRevisitSpec extends AnyFunSuite with SparkSpec {

  private def response(uri: String, body: String, date: String,
                       etag: String): Array[Byte] = {
    val block = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"""ETag: "$etag"\r\n\r\n""" + body)
    val bb = block.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\nContent-Length: ${bb.length}" +
      "\r\n\r\n").getBytes("UTF-8") ++ bb ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** server-not-modified profile: the block is the 304's headers. */
  private def revisit304(uri: String, date: String,
                         etag: String): Array[Byte] = {
    val block = ("HTTP/1.1 304 Not Modified\r\n" +
      s"""ETag: "$etag"\r\n\r\n""")
    val bb = block.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\nWARC-Profile: http://netpreserve.org/warc/" +
      s"1.1/revisit/server-not-modified\r\nContent-Length: ${bb.length}" +
      "\r\n\r\n").getBytes("UTF-8") ++ bb ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** identical-payload-digest profile: no HTTP block at all. */
  private def revisitDigest(uri: String, date: String): Array[Byte] =
    (s"WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\nWARC-Payload-Digest: sha1:DEADBEEF\r\n" +
      "Content-Length: 0\r\n\r\n").getBytes("UTF-8") ++
      "\r\n\r\n".getBytes("UTF-8")

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val os = new java.util.zip.GZIPOutputStream(bos)
    os.write(b); os.close()
    bos.toByteArray
  }

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-revisit")
    java.nio.file.Files.write(d.resolve("r.warc.gz"),
      gz(response("http://a.com/x", "<p>version one</p>",
        "2026-03-01T00:00:00Z", "e1")) ++
      gz(revisit304("http://a.com/x", "2026-03-02T00:00:00Z", "e1r")) ++
      gz(revisitDigest("http://a.com/x", "2026-03-03T00:00:00Z")) ++
      gz(revisitDigest("http://b.org/only-revisits",
        "2026-03-01T00:00:00Z")))
    d.toString
  }

  test("revisit records parse as capture rows: no text, no payload, validators lifted, never corrupt") {
    val parsed = Crawl.readWarc(spark, dir).cache()
    try {
      assert(parsed.filter(col("corrupt")).count() === 0)
      val rev = parsed.filter(col("revisit")).collect()
      assert(rev.length === 3)
      assert(rev.forall(r => r.isNullAt(r.fieldIndex("text")) &&
                             r.isNullAt(r.fieldIndex("payload"))))
      val r304 = rev.filter(r => !r.isNullAt(r.fieldIndex("http_status")))
      assert(r304.length === 1)
      assert(r304.head.getAs[Int]("http_status") === 304)
      assert(r304.head.getAs[String]("etag") === "\"e1r\"")
      // the doc pipeline never sees them; the seen set counts them
      assert(Crawl.crawlDocs(parsed).count() === 1)
      assert(Crawl.seenUrls(parsed).collect().map(_.getString(0)).toSet
        === Set("http://a.com/x", "http://b.org/only-revisits"))
      // the conditional-GET table serves the revisit's fresher ETag
      val v = Crawl.revisitValidators(parsed).collect()
        .map(r => r.getString(0) -> r.getAs[String]("etag")).toMap
      assert(v("http://a.com/x") === "\"e1r\"")
    } finally parsed.unpersist()
  }

  test("refetchStream: revisits count captures, never changes; revisit-first pages take no phantom change") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ranks = Seq(("a.com", 1000000000000L)).toDF("host", "rank_e12")
    val mem = MemoryStream[org.apache.spark.sql.Row](
      org.apache.spark.sql.Encoders.row(
        Crawl.readWarc(spark, dir).schema), spark.sqlContext)
    val rf = Crawl.refetchStream(mem.toDF(), ranks)
    val q = rf.writeStream.format("memory").queryName("revisit_refetch")
      .outputMode("append").start()
    def latest(): Map[String, (Long, Long)] =
      spark.table("revisit_refetch").collect()
        .map(r => (r.getString(0), (r.getLong(2), r.getLong(3))))
        .groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).maxBy(_._1)) }
    try {
      val rows = Crawl.readWarc(spark, dir).collect()
      mem.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      val m = latest()
      // a.com/x: response + 304 revisit + digest revisit = 3 captures,
      // ZERO changes (the revisits assert sameness)
      assert(m("http://a.com/x") === (3L, 0L))
      // b.org: known only through a revisit — 1 capture, 0 changes
      assert(m("http://b.org/only-revisits") === (1L, 0L))
      // the phantom-change guard: the FIRST real body of a page known
      // only through revisits is a capture, NOT a change (nothing to
      // transition from); re-offering a.com's unchanged body likewise
      val d2 = java.nio.file.Files.createTempDirectory("graft-rev2")
      java.nio.file.Files.write(d2.resolve("b.warc.gz"),
        gz(response("http://b.org/only-revisits",
          "<p>first real body</p>", "2026-03-04T00:00:00Z", "eb")))
      mem.addData(
        (Crawl.readWarc(spark, d2.toString).collect().toSeq ++
         rows.filter(r => r.getAs[String]("url") == "http://a.com/x" &&
           !r.getAs[Boolean]("revisit"))).toIndexedSeq)
      q.processAllAvailable()
      assert(latest()("http://b.org/only-revisits") === (2L, 0L))
      assert(latest()("http://a.com/x") === (4L, 0L))
    } finally q.stop()
  }

  test("changeTrackStream: revisit captures keep a page's change share honest") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val schema = Crawl.readWarc(spark, dir).schema
    val mem = MemoryStream[org.apache.spark.sql.Row](
      org.apache.spark.sql.Encoders.row(schema), spark.sqlContext)
    val ct = Crawl.changeTrackStream(mem.toDF())
    val q = ct.writeStream.format("memory").queryName("revisit_ct")
      .outputMode("append").start()
    try {
      mem.addData(Crawl.readWarc(spark, dir).collect().toIndexedSeq)
      q.processAllAvailable()
      val m = spark.table("revisit_ct").collect()
        .map(r => (r.getString(0),
          (r.getLong(1), r.getLong(2), r.getString(4)))).toMap
      // 3 captures, 0 changes -> cold, not "hot from null bodies"
      assert(m("http://a.com/x") === (3L, 0L, "cold"))
      assert(m("http://b.org/only-revisits")._2 === 0L)
    } finally q.stop()
  }

  test("batch queue builders count revisits as captures: last_ts_s reflects revisit recency") {
    // the stream twins above count a.com/x as 3 captures; before the
    // round-20 fix the BATCH queue builders filtered text.isNotNull
    // only, so its two revisits vanished, last_ts_s regressed to the
    // day-1 real body, and the due queue scheduled the revisit-
    // confirmed page two days early
    val q = graft.operators.WebGraph
      .crawlRefetchQueueTable(spark, dir, dueBaseS = 86400L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_captures"), r.getAs[Long]("n_changes"),
          r.getAs[Long]("last_ts_s"))))
      .toMap
    assert(q("http://a.com/x") === ((3L, 0L,
      java.time.Instant.parse("2026-03-03T00:00:00Z").getEpochSecond)))
    // a page known ONLY through revisits now reaches the queue with
    // zero changes (refetchDue's n_changes floor finally has live
    // input) and interval = base
    assert(q("http://b.org/only-revisits") === ((1L, 0L,
      java.time.Instant.parse("2026-03-01T00:00:00Z").getEpochSecond)))
  }
}
