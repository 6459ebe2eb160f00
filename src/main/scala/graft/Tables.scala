package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * Design notes for scale: every loader returns a plain scan `DataFrame` so
  * Catalyst can push filters/projections into the parquet reader. No caching
  * here — callers decide (only small dims like `region`/`nation`/`customer`
  * are broadcast-worthy).
  */
object Tables {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read the
    * nanos as a raw long (`spark.sql.legacy.parquet.nanosAsLong`) and surface
    * both:
    *   - `ts`    TimestampType, truncated to microseconds (Spark's native
    *             resolution; equals DuckDB's `CAST(ts AS TIMESTAMP)`),
    *   - `ts_ns` LongType, the exact nanosecond epoch for ordering/tie-breaks.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts_ns", col("ts").cast("long"))
      // integer `div`, not `/`: ns epochs (~1.7e18) exceed double's 2^53
      // exact range, so fp division would round the microsecond
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
