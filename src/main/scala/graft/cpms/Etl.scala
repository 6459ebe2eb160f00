package graft.cpms

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Batch ETL: CSV star-schema load mirroring the reference's db_loader end
  * to end (scripts/db_loader.py:35-158), as one declarative Spark job:
  *
  *   CSV scans (S1) -> Python-literal array parse (F8) -> explode to
  *   owner maps (U3/J3) -> child enrichment joins -> referential filter
  *   (P5) -> `hearth_rate` rename (F13) -> normalized DataFrames.
  *
  * Scale notes: owner maps derive from the `users` dimension (bounded,
  * broadcast-sized here; at 100 TB the children dominate and the owner map
  * join is a standard broadcast or shuffle-hash join on the child id).
  * FK enforcement (db_loader.py:56,68) becomes an ETL-time orphan count
  * (Spark has no constraints — SURVEY §7.4.2).
  */
object Etl {

  final case class Normalized(
      users: DataFrame,
      cognitiveScores: DataFrame, // + user_id FK column
      trackingRisks: DataFrame,   // + user_id FK, heart_rate renamed
      csOrphans: Long,
      trOrphans: Long)

  /** Parse a Python-literal string array `"['a', 'b']"` into
    * array<string>. Ids are UUIDs (no embedded quotes), so the
    * single->double quote rewrite is lossless (SURVEY F8,
    * db_loader.py:102-106).
    */
  def parsePyArray(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(
      from_json(regexp_replace(c, "'", "\""), ArrayType(StringType)),
      array().cast(ArrayType(StringType)))

  def loadUsersCsv(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("header", "true").schema(Schemas.usersCsv)
      .csv(s"$dir/users.csv")

  def loadCognitiveScoresCsv(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("header", "true").schema(Schemas.cognitiveScoresCsv)
      .csv(s"$dir/cognitive_scores.csv")

  def loadTrackingRisksCsv(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("header", "true").schema(Schemas.trackingRisksCsv)
      .csv(s"$dir/tracking_risks.csv")

  /** Full normalization pipeline over a directory holding the three CSVs. */
  def normalize(spark: SparkSession, dir: String): Normalized = {
    val users = loadUsersCsv(spark, dir)
      .withColumn("cs_ids", parsePyArray(col("cognitive_scores")))
      .withColumn("tr_ids", parsePyArray(col("risk_trackings")))
      .drop("cognitive_scores", "risk_trackings")
      .withColumnRenamed("userId", "user_id")

    // Owner maps: child_id -> user_id (db_loader.py:85-112). users is the
    // bounded dimension; broadcast both probe joins.
    val csOwners = users.select(col("user_id"), explode(col("cs_ids")).as("cs_id"))
    val trOwners = users.select(col("user_id"), explode(col("tr_ids")).as("tr_id"))

    val csRaw = loadCognitiveScoresCsv(spark, dir)
    val trRaw = loadTrackingRisksCsv(spark, dir)

    // Inner join = enrichment + referential filter in one (P5/J3):
    // children without an owning user are dropped, as in
    // db_loader.py:121-129,138-155.
    val cs = csRaw.join(broadcast(csOwners), Seq("cs_id"), "inner")
    val tr = trRaw.join(broadcast(trOwners), Seq("tr_id"), "inner")
      .withColumnRenamed("hearth_rate", "heart_rate")

    val csOrphans = csRaw.join(broadcast(csOwners), Seq("cs_id"), "left_anti").count()
    val trOrphans = trRaw.join(broadcast(trOwners), Seq("tr_id"), "left_anti").count()

    Normalized(users.drop("cs_ids", "tr_ids"), cs, tr, csOrphans, trOrphans)
  }

  /** Persist normalized tables as parquet (the engine's managed star
    * schema). The children are the big fact tables at scale -> written
    * partition-parallel; callers can `.repartition(n, $"user_id")` first
    * when downstream access is keyed.
    */
  def save(n: Normalized, outDir: String): Unit = {
    n.users.write.mode("overwrite").parquet(s"$outDir/users")
    n.cognitiveScores.write.mode("overwrite").parquet(s"$outDir/cognitive_scores")
    n.trackingRisks.write.mode("overwrite").parquet(s"$outDir/tracking_risks")
  }

  /** Persist the normalized star schema as MANAGED catalog tables (K5 DDL),
    * fact tables hash-bucketed + sorted on `user_id` so every downstream
    * keyed join/aggregate against them is co-located — no Exchange on the
    * fact side at any scale (asserted on these production tables in
    * EtlSpec). The dimension stays unbucketed: it broadcasts.
    *
    * `prefix` namespaces the tables (`<prefix>_users`, `<prefix>_scores`,
    * `<prefix>_risks`); nBuckets is the scale knob — pick ~(fact size /
    * target file size) at deploy time.
    */
  def saveAsTables(n: Normalized, prefix: String, nBuckets: Int): Unit = {
    n.users.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${prefix}_users")
    n.cognitiveScores.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "user_id").sortBy("user_id")
      .saveAsTable(s"${prefix}_scores")
    n.trackingRisks.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "user_id").sortBy("user_id")
      .saveAsTable(s"${prefix}_risks")
  }
}
