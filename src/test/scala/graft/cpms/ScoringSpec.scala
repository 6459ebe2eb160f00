package graft.cpms

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScoringSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def requests = Seq(
    Schemas.PredictRequest("u1", 7.5, 3, 4.0, "Moderate", 100, 250.0, 80),
    Schemas.PredictRequest("u2", 5.0, 8, 9.5, "None", 200, 400.0, 40)
  ).toDF()

  private def aggs = Seq(
    ("u1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 72, 5000, 1800)
  ).toDF("user_id", "ts", "heart_rate", "steps", "calories")

  test("feature assembly: live features joined, defaults for cold users (J4/P7)") {
    val out = Scoring.assembleFeatures(requests, aggs).collect()
      .map(r => r.getAs[String]("user_id") ->
        (r.getAs[Int]("heart_rate"), r.getAs[Int]("steps"), r.getAs[Int]("calories"))).toMap
    assert(out("u1") === ((72, 5000, 1800)))
    assert(out("u2") === ((0, 0, 0)))      // main.py:65 defaults
  }

  test("legacy defaults flag reproduces heart_rate=70 (inference_backend.py:48)") {
    val out = Scoring.assembleFeatures(requests, aggs.filter(lit(false)), legacyDefaults = true)
      .collect().map(r => r.getAs[Int]("heart_rate"))
    assert(out.forall(_ === 70))
  }

  test("request fields keep precedence over aggregates on collision (J5)") {
    // aggregates carrying a conflicting sleep_duration must not leak through
    val aggsWithSleep = aggs.withColumn("sleep_duration", lit(99.0))
    val out = Scoring.assembleFeatures(requests, aggsWithSleep.select(
      "user_id", "heart_rate", "steps", "calories", "sleep_duration"))
    // assembled frame keeps the request's sleep_duration column values
    val sd = out.filter($"user_id" === "u1").select("sleep_duration").head().getDouble(0)
    assert(sd === 7.5)
  }

  test("demo scorer matches setup_model.py:34 range [40,100] and is seeded") {
    val scored = Scoring.scoreDemo(Scoring.assembleFeatures(requests, aggs))
    val scores = scored.select("cognitive_score").as[Int].collect()
    assert(scores.forall(s => s >= 40 && s <= 100))
    val again = Scoring.scoreDemo(Scoring.assembleFeatures(requests, aggs))
      .select("cognitive_score").as[Int].collect()
    assert(scores.sameElements(again), "seeded scorer must be reproducible")
  }

  test("MLlib pipeline trains, scores in-domain, and classifies (U1/P6)") {
    val train = Scoring.assembleFeatures(requests, aggs)
      .withColumn("label", lit(75.0) - $"stress_level" * 3)
    val model = Scoring.train(train)
    val out = Scoring.score(model, Scoring.assembleFeatures(requests, aggs))
    val rows = out.select("cognitive_score", "status").collect()
    rows.foreach { r =>
      val s = r.getInt(0)
      assert(s >= 0 && s <= 100)
      assert(r.getString(1) === (if (s < 50) "Critical" else "Normal"))
    }
  }

  test("model artifact save/load roundtrip preserves predictions (K6)") {
    val train = Scoring.assembleFeatures(requests, aggs)
      .withColumn("label", lit(80.0) - $"screen_time" * 2)
    val model = Scoring.train(train)
    val dir = java.nio.file.Files.createTempDirectory("graft-k6").toString
    model.write.overwrite().save(dir)
    val reloaded = org.apache.spark.ml.PipelineModel.load(dir)
    val a = Scoring.score(model, Scoring.assembleFeatures(requests, aggs))
      .select("user_id", "cognitive_score").collect().map(_.toString).sorted
    val b = Scoring.score(reloaded, Scoring.assembleFeatures(requests, aggs))
      .select("user_id", "cognitive_score").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("dual append writes both tables with one shared timestamp (K4)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-k4").toString
    val scored = Scoring.scoreDemo(Scoring.assembleFeatures(requests, aggs))
    Scoring.appendResults(scored, s"$dir/tr", s"$dir/cs",
                          idCol = concat(lit("id-"), col("user_id")))
    val tr = spark.read.parquet(s"$dir/tr")
    val cs = spark.read.parquet(s"$dir/cs")
    assert(tr.count() === 2 && cs.count() === 2)
    // per-user: same event_id stem and identical timestamp in both tables
    val joined = tr.select($"user_id", $"timestamp".as("tr_ts"))
      .join(cs.select($"user_id", $"timestamp".as("cs_ts")), "user_id")
    assert(joined.filter($"tr_ts" === $"cs_ts").count() === 2,
           "dashboard's (user_id,timestamp) equality join invariant broken")
    assert(cs.select("cs_id").as[String].collect().forall(_.startsWith("cs-id-")))
  }
}
