package graft.cpms

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predict-readiness scoring (reference src/backend/main.py:84-131 +
  * setup_model.py:22-38), re-expressed as a micro-batch over a requests
  * DataFrame: feature fetch (J4) -> merge with request precedence (J5) ->
  * model -> threshold (P6) -> dual append (K4).
  */
object Scoring {

  /** Numeric feature columns of the merged model input (main.py:92-93:
    * live aggregates overlaid by the request form fields).
    */
  val numericFeatures: Seq[String] = Seq(
    "sleep_duration", "stress_level", "screen_time", "caffeine_intake",
    "reaction_time", "memory_test_score", "heart_rate", "steps", "calories")

  /** J4+J5+P7: left join requests to the latest per-user aggregates and
    * apply defaults. Request fields win on name collision (dict.update
    * semantics, main.py:92-93). `legacyDefaults` reproduces the older
    * Lambda backend's {'heart_rate': 70} when no live features exist
    * (backend_function.zip!inference_backend.py:43-48); the current
    * backend defaults to 0 (main.py:65).
    */
  def assembleFeatures(
      requests: DataFrame,
      latestAggregates: DataFrame,
      legacyDefaults: Boolean = false): DataFrame = {
    val hrDefault = if (legacyDefaults) 70 else 0
    requests
      .join(latestAggregates.select(col("user_id"), col("heart_rate"),
                                    col("steps"), col("calories")),
            Seq("user_id"), "left_outer")
      .withColumn("heart_rate", coalesce(col("heart_rate"), lit(hrDefault)))
      .withColumn("steps", coalesce(col("steps"), lit(0)))
      .withColumn("calories", coalesce(col("calories"), lit(0)))
  }

  /** The demo SageMaker model verbatim: uniform random int in [40, 100]
    * (setup_model.py:31-35) — `randint(40,100)` is inclusive on both ends.
    * Seeded for reproducible tests (SURVEY §7.4.4).
    */
  def demoScore(seed: Long = 42L): Column =
    (floor(rand(seed) * 61) + 40).cast("int")

  /** MLlib scoring pipeline: StringIndexer for the categorical
    * exercise_frequency + VectorAssembler + linear regression
    * (BASELINE.json "MLlib + DataFrame analytics").
    */
  def pipeline(): Pipeline = {
    val idx = new StringIndexer()
      .setInputCol("exercise_frequency").setOutputCol("exercise_idx")
      .setHandleInvalid("keep")
    val vec = new VectorAssembler()
      .setInputCols((numericFeatures :+ "exercise_idx").toArray)
      .setOutputCol("features")
    val lr = new LinearRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setPredictionCol("prediction_raw")
    new Pipeline().setStages(Array(idx, vec, lr))
  }

  def train(labeled: DataFrame): PipelineModel = pipeline().fit(labeled)

  /** Apply a trained model and shape the response: clamp to the score
    * domain [0,100], threshold to status (main.py:104-106).
    */
  def score(model: PipelineModel, assembled: DataFrame): DataFrame =
    model.transform(assembled)
      .withColumn("cognitive_score",
                  least(greatest(round(col("prediction_raw")).cast("int"), lit(0)), lit(100)))
      .withColumn("status", Queries.status(col("cognitive_score")))
      .drop("features", "exercise_idx", "prediction_raw")

  /** Demo-model variant of [[score]] (random scorer, no features read). */
  def scoreDemo(assembled: DataFrame, seed: Long = 42L): DataFrame =
    assembled
      .withColumn("cognitive_score", demoScore(seed))
      .withColumn("status", Queries.status(col("cognitive_score")))

  /** K4: the dual append from /api/predict (main.py:108-124): a
    * tracking_risks snapshot (distance=0; calories from live features) and
    * a cognitive_scores row, both stamped with one processing timestamp so
    * the dashboard's (user_id, timestamp) equality join matches — the
    * invariant SURVEY §7.4.5 documents. Ids come from `idCol` so tests can
    * inject deterministic sequences instead of uuid() (F1).
    */
  def appendResults(
      scored: DataFrame,
      trackingRisksDir: String,
      cognitiveScoresDir: String,
      idCol: Column = expr("uuid()")): Unit = {
    val stamped = scored
      .withColumn("timestamp", current_timestamp())
      .withColumn("rid", idCol)
      .cache()
    stamped.select(
      concat(lit("tr-"), col("rid")).as("tr_id"),
      col("rid").as("event_id"),
      col("timestamp"),
      col("steps"),
      lit(0.0).as("distance"),
      col("heart_rate"),
      col("calories"),
      when(col("status") === "Critical", "High").otherwise("Low").as("risk_metric"),
      col("user_id"))
      .write.mode("append").parquet(trackingRisksDir)
    stamped.select(
      concat(lit("cs-"), col("rid")).as("cs_id"),
      col("rid").as("event_id"),
      col("timestamp"),
      col("cognitive_score"),
      col("user_id"))
      .write.mode("append").parquet(cognitiveScoresDir)
    stamped.unpersist()
  }
}
