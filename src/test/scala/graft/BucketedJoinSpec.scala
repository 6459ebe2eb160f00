package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout claim from SURVEY §4: pre-bucketing both join sides on
  * the key makes the join shuffle-free (co-located buckets). This is the
  * layout the serving/fact tables use at scale.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  test("join of two tables bucketed on the key plans without an Exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, sf).write.format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sf).write.format("parquet")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
             s"probe side shuffled despite bucketing:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
             s"build side shuffled despite bucketing:\n$plan")
      assert(joined.agg(sum("n")).head().getLong(0) === 1500L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
