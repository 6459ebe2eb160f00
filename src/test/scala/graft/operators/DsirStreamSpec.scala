package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Scoring-at-ingest must agree with the batch scorer: a document
  * streamed through dsirScoreStream gets the SAME 4dp log-ratio q117
  * computes for it in batch (the persisted full-B score table equals the
  * in-query observed-bucket table on every bucket a corpus document can
  * hit), and the plan stays stateless — append mode with no watermark is
  * only legal because the scorer is a pure projection.
  */
class DsirStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed ingest scores equal batch q117 scores; geometry is validated") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString + "/dsir_index"
    Prep.buildDsirIndex(spark, sf, dir)
    val scores = Prep.loadDsirIndex(spark, dir)
    assert(scores.length === Prep.DsirB)

    // batch truth: q117's (doc_id, n_grams, logratio) top-50
    val batch = SparkEntry.queries("q117_dsir_select")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val corpus = Tables.documents(spark, sf)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(corpus: _*)
    val q = Prep.dsirScoreStream(mem.toDF().toDF("doc_id", "text"), scores)
      .writeStream.format("memory").queryName("dsir_scores")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dsir_scores")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    assert(got.size === corpus.size, "stream dropped or duplicated documents")
    batch.foreach { case (id, v) =>
      assert(got(id) === v, s"doc $id: stream ${got(id)} != batch $v")
    }

    // a forged geometry sidecar must be rejected, never silently served
    val p = new org.apache.hadoop.fs.Path(dir, "_dsir_geometry")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write("2048 1000000".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalArgumentException] {
      Prep.loadDsirIndex(spark, dir)
    }
    assert(e.getMessage.contains("geometry"))
  }
}
