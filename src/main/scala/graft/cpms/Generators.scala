package graft.cpms

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic event generators mirroring the reference's load simulators
  * (scripts/gen_wearables.py:41-51, scripts/gen_score_requests.py:35-47),
  * as seeded, partition-parallel DataFrames of wire JSON — the engine's
  * own e2e/stress harness (F10/F12 semantics, deterministic per seed).
  */
object Generators {

  /** `tracking_v1` wearable events: n events round-robined over the given
    * user ids, value ranges per gen_wearables.py:46-50.
    */
  def wearableEvents(spark: SparkSession, userIds: Seq[String], n: Long,
                     seed: Long = 42L): DataFrame = {
    val users = array(userIds.map(lit): _*)
    spark.range(n).select(
      to_json(struct(
        concat(lit("gen-"), col("id")).as("event_id"),
        element_at(users, (col("id") % userIds.size + 1).cast("int")).as("user_id"),
        concat(lit("dev_"),
               substring(element_at(users, (col("id") % userIds.size + 1).cast("int")), 1, 8))
          .as("device_id"),
        lit("tracking_v1").as("schema"),
        lit(false).as("cognitive_predict"),
        floor(rand(seed) * 16).cast("int").as("steps"),
        round(rand(seed + 1) * 0.05, 3).as("distance"),
        (floor(rand(seed + 2) * 66) + 65).cast("int").as("heart_rate"),
        (floor(rand(seed + 3) * 8) + 1).cast("int").as("calories"),
        // monotone epoch-seconds string, 1s apart per event (F3 form)
        (lit(1700000000L) + col("id")).cast("string").as("timestamp")))
        .as("value"))
  }

  /** `manual_entry_v1` self-report events (gen_score_requests.py:35-47). */
  def manualEntries(spark: SparkSession, userIds: Seq[String], n: Long,
                    seed: Long = 42L): DataFrame = {
    val users = array(userIds.map(lit): _*)
    spark.range(n).select(
      to_json(struct(
        concat(lit("man-"), col("id")).as("event_id"),
        element_at(users, (col("id") % userIds.size + 1).cast("int")).as("user_id"),
        concat(lit("phone_"),
               substring(element_at(users, (col("id") % userIds.size + 1).cast("int")), 1, 8))
          .as("device_id"),
        lit("manual_entry_v1").as("schema"),
        lit(true).as("cognitive_predict"),
        round(rand(seed) * 5 + 4, 1).as("sleep_duration"),
        (floor(rand(seed + 1) * 10) + 1).cast("int").as("stress_level"),
        (floor(rand(seed + 2) * 3) * 100).cast("int").as("caffeine_intake"),
        round(rand(seed + 3) * 11 + 1, 1).as("screen_time"),
        (lit(1700000000L) + col("id")).cast("string").as("timestamp")))
        .as("value"))
  }
}
