package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q167 resample loop CLOSED — report to action: the terminal
  * export ([[Curation.exportResampled]]) lands exactly the q167 doc
  * set as crawl-native JSONL that `readCrawl` round-trips, and the
  * streaming thinner ([[Prep.resampleThinner]]) reproduces q167
  * membership doc-for-doc on a genuine streaming frame with the rates
  * resolved ONCE from the landed artifacts (zero funnel derives
  * in-stream — the funnelScorer convention).
  */
class ResampleSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val batchSample =
    graft.SparkEntry.queries("q167_funnel_resample")(spark, sf).collect()

  test("exportResampled lands exactly the q167 doc set, readCrawl round-trips it") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-resample-export").toString + "/resampled"
    Curation.exportResampled(spark, sf, out)
    val expect = batchSample.map(r =>
      r.getLong(0) -> ((r.getString(1), r.getDouble(3)))).toMap
    assert(expect.nonEmpty, "vacuous: the sf0.001 resample kept nothing")
    val parsed = graft.sources.Crawl.readCrawl(spark, out)
    assert(parsed.filter(col("corrupt")).count() === 0L,
           "export produced lines its own reader rejects")
    val got = parsed
      .select(col("doc_id"), col("source"),
              get_json_object(col("value"), "$.rate").cast("double")
                .as("rate"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(got.keySet === expect.keySet,
           s"exported set diverged from q167: missing=" +
             s"${(expect.keySet -- got.keySet).take(5)} extra=" +
             s"${(got.keySet -- expect.keySet).take(5)}")
    got.foreach { case (id, (src, rate)) =>
      assert((src, rate) === expect(id),
             s"doc $id exported with ($src, $rate) != q167 ${expect(id)}")
    }
    // the exported text is the corpus text, verbatim
    val text = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    parsed.select("doc_id", "text").collect().foreach { r =>
      assert(r.getString(1) === text(r.getLong(0)),
             s"doc ${r.getLong(0)} text did not round-trip")
    }
  }

  test("resampleThinner == q167 membership on a genuine stream, rates resolved once") {
    implicit val sctx = spark.sqlContext
    val expect = batchSample.map(_.getLong(0)).toSet
    // thinner input: ALL funnel survivors (q167's candidate set)
    val survivors = Prep.funnelStack(spark, sf).filter(col("keep"))
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(expect.nonEmpty && expect.size < survivors.size,
           "vacuous: thinning must drop some survivors and keep others")
    val thin = Prep.resampleThinner(spark, sf)
    val derives = Prep.funnelDerives.get()
    val mem = MemoryStream[(Long, String)]
    val (h1, h2) = survivors.splitAt(survivors.size / 2)
    mem.addData(h1: _*)
    mem.addData(h2: _*)
    val q = thin(mem.toDF().toDF("doc_id", "source"))
      .writeStream.format("memory").queryName("thinned")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("thinned").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === expect,
           s"stream membership diverged from q167: missing=" +
             s"${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    assert(Prep.funnelDerives.get() === derives,
           "the thinner re-derived the funnel in-stream")
    // a source the funnel never saw (a brand-new feed on a HEALTHY
    // corpus — the degenerate-corpus case lives in FunnelGateSpec)
    // has no enrichment evidence to thin by: every doc keeps
    val novel = (0L until 8L).map((_, "feed_never_seen"))
      .toDF("doc_id", "source")
    assert(thin(novel).count() === 8L,
           "unknown-source docs must pass the thinner untouched")
  }
}
