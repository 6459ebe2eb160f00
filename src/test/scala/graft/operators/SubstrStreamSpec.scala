package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Substring contamination at ingest (the dedup family's fourth ingest
  * modality): an arrival copying a corpus passage must flag, fresh
  * arrivals must pass under the Bloom FP floor, the stream must equal
  * the batch spelling row-for-row, and the probe plan must stay a pure
  * projection (no aggregate, no exchange) with the sketch built ONCE.
  */
class SubstrStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("copied corpus passage flags in-stream; fresh doc passes; stream == batch") {
    import spark.implicits._
    val bloom = Prep.buildSubstrBloom(spark, sf)

    // arrival 1: 30 consecutive tokens lifted from a corpus doc + fresh
    // filler -> 11 of its 36 grams are verbatim corpus runs (share 0.31)
    val corpusTok = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 30)
      .orderBy("doc_id").select("text").limit(1)
      .collect()(0).getString(0).split(" ")
    val copied = (corpusTok.take(30) ++
      (0 until 25).map(i => s"fresh$i")).mkString(" ")
    // arrival 2: same shape, no corpus text
    val clean = (0 until 55).map(i => s"novel$i").mkString(" ")

    val arrivals = Seq((9001L, copied), (9002L, clean))
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(arrivals: _*)
    val q = Prep.substrContaminationStream(
        mem.toDF().toDF("doc_id", "text"), bloom)
      .writeStream.format("memory").queryName("substr_flags")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("substr_flags").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap

    val (nG1, hits1, share1, flag1) = got(9001L)
    assert(nG1 === 36L)
    assert(hits1 >= 11L, s"the 11 copied-run grams must all hit (got $hits1)")
    assert(flag1, s"copied passage must flag (share $share1)")
    val (_, hits2, share2, flag2) = got(9002L)
    assert(!flag2, s"fresh doc must pass (hits $hits2, share $share2)")

    // stream == batch: the same projection over a batch frame
    val batch = Prep.substrContaminationStream(
        arrivals.toDF("doc_id", "text"), bloom)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(batch === got)
  }

  test("probe plan is a stateless projection; corpus docs all flag against their own corpus") {
    import spark.implicits._
    val bloom = Prep.buildSubstrBloom(spark, sf)
    val probe = Prep.substrContaminationStream(
      Tables.documents(spark, sf).select("doc_id", "text"), bloom)
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe must not shuffle:\n$plan")
    assert(!plan.contains("HashAggregate"), s"probe must not aggregate:\n$plan")
    // self-probe sanity: every corpus doc long enough to carry grams is
    // a verbatim copy of itself -> share 1.0, no false negatives ever
    val rows = probe.filter(col("n_grams") > 0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) === 1.0 && r.getBoolean(4),
             s"doc ${r.getLong(0)}: self-probe must hit every gram")
    }
  }
}
