package graft.cpms

import org.apache.spark.sql.types._

/** Explicit schemas for the CPMS (Cognitive Performance Monitoring System)
  * entities — never schema inference on the hot path (SURVEY.md §1.2).
  * DDL provenance: reference scripts/db_loader.py:45-77; event shapes:
  * scripts/gen_wearables.py:41-51 and scripts/gen_score_requests.py:35-47;
  * request shape: src/backend/main.py:36-44; aggregates: main.tf:42-52 +
  * src/stream_processor.py:34-40.
  */
object Schemas {

  /** users.csv raw shape (db_loader.py:45-49; arrays parsed downstream). */
  val usersCsv: StructType = StructType(Seq(
    StructField("userId", StringType, nullable = false),
    StructField("date_of_birth", DateType),
    StructField("diet_type", StringType),
    StructField("cognitive_scores", StringType), // Python-literal id array (F8)
    StructField("risk_trackings", StringType)))  // Python-literal id array (F8)

  /** cognitive_scores.csv (db_loader.py:54-61). */
  val cognitiveScoresCsv: StructType = StructType(Seq(
    StructField("cs_id", StringType, nullable = false),
    StructField("event_id", StringType),
    StructField("timestamp", TimestampType),
    StructField("cognitive_score", IntegerType)))

  /** tracking_risks.csv — note source column `hearth_rate`, renamed
    * `heart_rate` during load (db_loader.py:64,152).
    */
  val trackingRisksCsv: StructType = StructType(Seq(
    StructField("tr_id", StringType, nullable = false),
    StructField("event_id", StringType),
    StructField("timestamp", TimestampType),
    StructField("steps", IntegerType),
    StructField("distance", DoubleType),
    StructField("hearth_rate", IntegerType),
    StructField("calories", IntegerType),
    StructField("risk_metric", StringType)))

  /** Wearable stream event `tracking_v1` (gen_wearables.py:41-51) after
    * ingestion enrichment (ingestion.py:26-29). `timestamp` arrives as a
    * stringified epoch-seconds float (F3) and is normalized downstream.
    */
  val trackingV1: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("user_id", StringType),
    StructField("device_id", StringType),
    StructField("schema", StringType), // discriminator: "tracking_v1"
    StructField("cognitive_predict", BooleanType),
    StructField("steps", IntegerType),
    StructField("distance", DoubleType),
    StructField("heart_rate", IntegerType),
    StructField("calories", IntegerType),
    StructField("timestamp", StringType)))

  /** Self-report stream event `manual_entry_v1` (gen_score_requests.py:35-47). */
  val manualEntryV1: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("user_id", StringType),
    StructField("device_id", StringType),
    StructField("schema", StringType), // discriminator: "manual_entry_v1"
    StructField("cognitive_predict", BooleanType),
    StructField("sleep_duration", DoubleType),
    StructField("stress_level", IntegerType),
    StructField("caffeine_intake", IntegerType),
    StructField("screen_time", DoubleType),
    StructField("timestamp", StringType)))

  /** Keyed mutable aggregates state served per worker (main.tf:42-52;
    * numeric fields default 0 on serve, main.py:65).
    */
  val aggregates: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("heart_rate", IntegerType),
    StructField("steps", IntegerType),
    StructField("calories", IntegerType)))

  /** Predict readiness request (main.py:36-44). */
  case class PredictRequest(
      user_id: String,
      sleep_duration: Double,
      stress_level: Int,
      screen_time: Double,
      exercise_frequency: String, // None | Light | Moderate | Heavy
      caffeine_intake: Int,       // mg
      reaction_time: Double,      // ms
      memory_test_score: Int)     // 0-100

  /** Threshold classification (main.py:106): score < 50 => Critical. */
  val CriticalThreshold = 50
}
