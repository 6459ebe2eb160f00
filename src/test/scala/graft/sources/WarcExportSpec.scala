package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Crawl.writeWarc]] — the WARC export half: conformant one-member-
  * per-record output that [[Crawl.readWarc]] round-trips exactly on
  * (url, ts, text), shards by the caller's partitioning, and stays
  * splittable (damage in one exported member cannot quarantine its
  * neighbors — the property the reader's resync depends on).
  */
class WarcExportSpec extends AnyFunSuite with SparkSpec {

  private def docFrame = {
    import spark.implicits._
    Seq(
      (1L, "http://a.com/one", "2026-03-01 10:00:00", "plain words only"),
      (2L, "http://b.org/two", "2026-03-02 11:30:45",
        "unicode café 中文 survives"),
      (3L, null.asInstanceOf[String], "2026-03-03 00:00:01", "hostless row")
    ).toDF("doc_id", "url", "ts_s", "text")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  test("readWarc(writeWarc(df)) recovers url, ts, and text exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wexp")
      .resolve("out").toString
    Crawl.writeWarc(docFrame.repartition(2), dir)
    val back = Crawl.readWarc(spark, dir)
    assert(back.filter(col("corrupt")).count() === 0)
    val rows = back.select(col("url"), col("text"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("t"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getString(2)))
      .toSet
    assert(rows === Set(
      (Some("http://a.com/one"), "plain words only", "2026-03-01 10:00:00"),
      (Some("http://b.org/two"), "unicode café 中文 survives",
       "2026-03-02 11:30:45"),
      (None, "hostless row", "2026-03-03 00:00:01")))
    // partitioning controls the shard count
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(parts.length === 2, parts.mkString(", "))
  }

  test("WARC-Date stays true UTC under a non-UTC session time zone") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wexp-tz")
      .resolve("out").toString
    // pin the INPUT instants under UTC first (to_timestamp is lazy and
    // session-tz-dependent) so the test isolates writeWarc's rendering
    val frame = docFrame.coalesce(1).cache()
    frame.count()
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      Crawl.writeWarc(frame, dir)
    } finally {
      spark.conf.set("spark.sql.session.timeZone", tzBefore)
      frame.unpersist()
    }
    // read back under the test default (UTC): instants must match the
    // originals exactly — a session-local rendering with a literal 'Z'
    // would come back hours off
    val back = Crawl.readWarc(spark, dir)
      .filter(col("url") === "http://a.com/one")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0)
    assert(back === "2026-03-01 10:00:00")
  }

  test("exported members stay individually splittable: mid-file damage is contained") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wexp2")
      .resolve("out").toString
    Crawl.writeWarc(docFrame.coalesce(1), dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head.toPath
    val bytes = java.nio.file.Files.readAllBytes(f)
    // locate the three member boundaries (gzip magic) and flip a byte
    // in the MIDDLE of the second member — squarely inside compressed
    // data, not a header don't-care field like MTIME/OS
    val magics = bytes.indices.filter(i => i + 2 < bytes.length &&
      bytes(i) == 0x1f.toByte && bytes(i + 1) == 0x8b.toByte &&
      bytes(i + 2) == 0x08.toByte)
    assert(magics.length === 3, s"expected 3 members, got $magics")
    val mid = (magics(1) + magics(2)) / 2
    val damaged = bytes.clone()
    damaged(mid) = (damaged(mid) ^ 0x5a).toByte
    java.nio.file.Files.write(f, damaged)
    // the export wrote through the checksummed local FS; a damaged
    // file arriving from OUTSIDE carries no .crc sidecar — drop it so
    // the reader sees the damage, not a transport-integrity failure
    val crc = f.getParent.resolve("." + f.getFileName + ".crc")
    java.nio.file.Files.deleteIfExists(crc)
    val back = Crawl.readWarc(spark, dir).cache()
    try {
      assert(back.filter(!col("corrupt")).count() >= 1,
             "records outside the damaged member must still land")
      assert(back.filter(col("corrupt")).count() >= 1,
             "the damaged member must be counted, not silently dropped")
    } finally back.unpersist()
  }
}
