package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** [[Crawl.changeTrackStream]] — the live recrawl prior. The stream
  * counts actual TRANSITIONS in arrival order (the signal the
  * order-blind batch estimator cannot see: A->B->A is two changes
  * here, one there), carries state across micro-batches, orders
  * same-batch captures by (event time, doc_id), and collapses
  * canonicalization-junk URL variants onto one page before tracking.
  */
class ChangeTrackStreamSpec extends AnyFunSuite with SparkSpec {

  private def cap(id: Long, url: String, text: String, ts: String): String =
    s"""{"doc_id":$id,"url":"$url","text":"$text","lang":"en","ts":"$ts"}"""

  private def run(batches: Seq[Seq[String]], name: String)
      : Map[String, Seq[(Long, Long, Double, String)]] = {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Crawl.changeTrackStream(Crawl.parseCrawl(mem.toDF().toDF("value")))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      for (b <- batches) { mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).sortBy(_._1).toSeq }
  }

  test("transitions count in arrival order across batches; state persists; variants collapse") {
    val u = "http://a.com/page"
    val b1 = Seq(
      cap(1, u, "version A", "2026-03-01T00:00:00"),
      // same page under tracking junk — canonicalizes onto u, and its
      // LATER event time makes it the second capture: A -> B = 1 change
      cap(2, u + "?utm_source=x", "version B", "2026-03-01T01:00:00"),
      cap(3, "http://b.org/static", "same forever", "2026-03-01T00:00:00"))
    val b2 = Seq(
      // back to A: the stream counts the transition (batch distinct-1
      // would not) -> 2 changes over 2 revisits = 1.0, hot
      cap(4, u, "version A", "2026-03-02T00:00:00"),
      cap(5, "http://b.org/static", "same forever", "2026-03-02T00:00:00"))
    val out = run(Seq(b1, b2), "chg_basic")
    assert(out(u) === Seq((2L, 1L, 1.0, "hot"), (3L, 2L, 1.0, "hot")))
    assert(out("http://b.org/static") ===
      Seq((1L, 0L, 0.0, "unknown"), (2L, 0L, 0.0, "cold")))
  }

  test("same-batch ordering is event-time then doc_id, not arrival luck") {
    val u = "http://c.net/p"
    // added out of order; event times say A(00) -> B(01) -> A(02):
    // 2 transitions. A doc_id tiebreak would see A,A,B = 1 only if
    // event order were ignored.
    val b = Seq(
      cap(9, u, "B", "2026-03-01T01:00:00"),
      cap(8, u, "A", "2026-03-01T02:00:00"),
      cap(7, u, "A", "2026-03-01T00:00:00"))
    val out = run(Seq(b), "chg_order")
    assert(out(u) === Seq((3L, 2L, 1.0, "hot")))
  }

  test("idleTtlS: a page idle past the TTL evicts on the event clock and re-learns from scratch; active pages keep state") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Crawl.changeTrackStream(
        Crawl.parseCrawl(mem.toDF().toDF("value")), idleTtlS = 3600L)
      .writeStream.format("memory").queryName("chg_ttl")
      .outputMode("append").start()
    def rowsOf(u: String): Seq[(Long, Long)] =
      spark.table("chg_ttl").collect()
        .filter(_.getString(0) == u)
        .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val a = "http://a.com/idle"
    val b = "http://b.org/active"
    try {
      // batch 1: both pages capture at T0
      mem.addData(cap(1, a, "v1", "2026-03-01T00:00:00"),
                  cap(2, b, "w1", "2026-03-01T00:00:00"))
      q.processAllAvailable()
      // batch 2: only b re-captures, 3 h later — the event clock
      // (watermark = max event - TTL) moves past a's TTL horizon
      mem.addData(cap(3, b, "w2", "2026-03-02T03:00:00"))
      q.processAllAvailable()
      // batch 3: push the clock further so a's eviction timer fires
      mem.addData(cap(4, b, "w2", "2026-03-02T06:00:00"))
      q.processAllAvailable()
      // batch 4: a RE-ARRIVES (event time ahead of the watermark) —
      // its evicted history restarts at one capture, zero changes,
      // even though its body CHANGED (v1 -> v2 is invisible now: the
      // documented TTL loss)
      mem.addData(cap(5, a, "v2", "2026-03-02T06:30:00"))
      q.processAllAvailable()
      assert(rowsOf(a) === Seq((1L, 0L), (1L, 0L)),
        s"evicted page must re-learn from scratch: ${rowsOf(a)}")
      // the active page kept its cross-batch state throughout
      assert(rowsOf(b) === Seq((1L, 0L), (2L, 1L), (3L, 1L)))
    } finally q.stop()
  }

  test("idleTtlS: a LATE older duplicate must not pull eviction earlier than TTL-since-newest-capture") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Crawl.changeTrackStream(
        Crawl.parseCrawl(mem.toDF().toDF("value")), idleTtlS = 3600L)
      .writeStream.format("memory").queryName("chg_ttl_late")
      .outputMode("append").start()
    val a = "http://a.com/p"
    def aRows(): Seq[(Long, Long)] =
      spark.table("chg_ttl_late").collect()
        .filter(_.getString(0) == a)
        .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    try {
      // newest capture at T0+2h -> honest eviction instant T0+3h
      mem.addData(cap(1, a, "v1", "2026-03-01T02:00:00"))
      q.processAllAvailable()
      // a LATE older duplicate (T0+1h30m — inside the watermark
      // tolerance): before the r19 review fix the timer was rewritten
      // from this batch-local value to T0+2h30m, evicting the page
      // half an hour before it had been idle a full TTL
      mem.addData(cap(2, a, "v1", "2026-03-01T01:30:00"))
      q.processAllAvailable()
      // clock to T0+3h45m: watermark reaches T0+2h45m — past the
      // buggy instant, short of the honest one. The page must survive.
      mem.addData(cap(3, "http://b.org/x", "w", "2026-03-01T03:45:00"))
      q.processAllAvailable()
      // the page re-arrives: continued history (3 captures), not a
      // from-scratch re-learn
      mem.addData(cap(4, a, "v2", "2026-03-01T03:00:00"))
      q.processAllAvailable()
      assert(aRows().last === ((3L, 1L)),
        s"late duplicate pulled eviction early: ${aRows()}")
    } finally q.stop()
  }

  test("status gate: rotating error bodies are not churn — a dying page prices cold, a flap counts once") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    def scap(id: Long, url: String, text: String, status: Int,
             ts: String): String =
      s"""{"doc_id":$id,"url":"$url","text":"$text","ts":"$ts","http_status":$status}"""
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("http_status",
        org.apache.spark.sql.types.IntegerType)))
    val mem = MemoryStream[String]
    val parsed = mem.toDF().toDF("value")
      .withColumn("e", org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.col("value"), schema))
      .selectExpr("false as corrupt", "e.doc_id as doc_id",
        "e.url as url", "e.text as text", "to_timestamp(e.ts) as ts",
        "e.http_status as http_status")
    val q = Crawl.changeTrackStream(parsed)
      .writeStream.format("memory").queryName("chg_status")
      .outputMode("append").start()
    def latest(u: String): (Long, Long, String) =
      spark.table("chg_status").collect().filter(_.getString(0) == u)
        .map(r => (r.getLong(1), r.getLong(2), r.getString(4)))
        .maxBy(_._1)
    try {
      // dying page: one real body, then three DISTINCT 404 bodies —
      // naive fingerprinting would read 3 changes over 3 revisits
      // (share 1.0, "hot"); the status gate prices the death as ONE
      // change (entering error) and the page cools
      mem.addData(
        scap(1, "http://a.com/dying", "real content", 200,
             "2026-03-01T00:00:00"),
        scap(2, "http://a.com/dying", "404 page v1", 404,
             "2026-03-01T01:00:00"),
        scap(3, "http://a.com/dying", "404 page v2", 404,
             "2026-03-01T02:00:00"),
        scap(4, "http://a.com/dying", "404 page v3", 404,
             "2026-03-01T03:00:00"),
        // flap: 200 A -> 404 -> 200 A = one change total
        scap(5, "http://b.org/flap", "A", 200, "2026-03-01T00:00:00"),
        scap(6, "http://b.org/flap", "oops", 503,
             "2026-03-01T01:00:00"),
        scap(7, "http://b.org/flap", "A", 200, "2026-03-01T02:00:00"))
      q.processAllAvailable()
      val dying = latest("http://a.com/dying")
      assert(dying === ((4L, 1L, "warm")),
        s"error bodies must not register transitions: $dying")
      val flap = latest("http://b.org/flap")
      assert(flap === ((3L, 1L, "hot")), s"a flap counts once: $flap")
    } finally q.stop()
  }
}
