package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q132 distilled-quality bounds (no SQL oracle exists for LBFGS):
  * held-out accuracy against the teacher labels, refit determinism,
  * separation of the teacher's bands by the student's score, and the
  * serving-plan shape (scoring must stay a pure projection).
  */
class QualityDistillSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def corpus = graft.Tables.documents(spark, sf)

  private def teacherQ = {
    val stopArr = array(TrainingData.enStop.map(lit): _*)
    val tok = split(col("text"), " ")
    least(lit(1.0), size(tok) / lit(64.0)) *
      (lit(0.5) + size(filter(tok, t => array_contains(stopArr, t)))
        .cast("double") / size(tok))
  }

  test("held-out accuracy vs teacher labels is at least 0.75") {
    // doc_id % 5 == 0 held out; the student never sees those rows
    val model = Prep.trainQualityModel(corpus.filter(col("doc_id") % 5 =!= 0))
    val held = corpus.filter(col("doc_id") % 5 === 0)
      .withColumn("q", teacherQ)
      .withColumn("label",
        when(col("q") >= Prep.QcHi, 1.0).when(col("q") <= Prep.QcLo, 0.0))
      .filter(col("label").isNotNull)
    val scored = Prep.scoreQuality(model, held)
      .withColumn("hit",
        when((col("p_hi") >= 0.5) === (col("label") === 1.0), 1.0).otherwise(0.0))
      .agg(avg("hit").as("acc"), count(lit(1)).as("n")).collect()(0)
    assert(scored.getLong(1) > 50, "held-out slice too small to be meaningful")
    assert(scored.getDouble(0) >= 0.75,
           s"held-out accuracy ${scored.getDouble(0)} below bound")
  }

  test("refit on identical input reproduces identical coefficients") {
    def coefs() = Prep.trainQualityModel(corpus)
      .stages.last.asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
      .coefficients.toArray
    val a = coefs()
    val b = coefs()
    assert(a.length === b.length)
    val maxDiff = a.zip(b).map { case (x, y) => math.abs(x - y) }.max
    assert(maxDiff === 0.0, s"refit drifted by $maxDiff")
  }

  test("student separates the teacher's bands on the full corpus") {
    val model = Prep.trainQualityModel(corpus)
    val scored = Prep.scoreQuality(model, corpus).withColumn("q", teacherQ)
    val bands = scored.agg(
      avg(when(col("q") >= Prep.QcHi, col("p_hi"))).as("hi"),
      avg(when(col("q") <= Prep.QcLo, col("p_hi"))).as("lo")).collect()(0)
    assert(bands.getDouble(0) > bands.getDouble(1) + 0.3,
           s"bands not separated: hi=${bands.getDouble(0)} lo=${bands.getDouble(1)}")
  }

  test("scoring plan is a pure projection — no exchange, no aggregate") {
    val model = Prep.trainQualityModel(corpus)
    val plan = Prep.scoreQuality(model, corpus.select("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(!plan.contains("HashAggregate"), s"scoring must not aggregate:\n$plan")
  }

  test("scoring at ingest: streamed p_hi equals batch p_hi for every doc") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val small = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val model = Prep.trainQualityModel(small)
    val batch = Prep.scoreQuality(model, small.select("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("p_hi"))).toMap
    val rows = small.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    // append mode with no watermark is only legal because scoring is a
    // pure projection — the claim q132's docstring makes, proven live
    val q = Prep.scoreQuality(model, mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qc_scores")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("qc_scores")
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("p_hi"))).toMap
    assert(got.size === rows.size, "stream dropped or duplicated documents")
    batch.foreach { case (id, v) =>
      assert(got(id) === v, s"doc $id: stream ${got(id)} != batch $v")
    }
  }
}
