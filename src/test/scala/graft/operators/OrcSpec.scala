package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Columnar-format breadth (S1/K1 extension): the engine reads and writes
  * ORC with the same pushdown/pruning guarantees as parquet — a lake
  * migrating formats keeps its plans.
  */
class OrcSpec extends AnyFunSuite with SparkSpec {

  test("ORC roundtrip preserves data; filters and projection reach the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
    src.write.mode("overwrite").format("orc")
      .partitionBy("o_orderpriority").save(dir)

    val back = spark.read.format("orc").load(dir)
    assert(back.count() === src.count())

    val q = back.filter(col("o_totalprice") > 100000.0 &&
                        col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice"),
           s"ORC scan lost filter pushdown:\n$plan")
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderpriority"),
           s"ORC partition pruning lost:\n$plan")
    // projection pruning: the scan must not read unneeded columns
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
           s"ORC column pruning lost:\n$plan")

    val expected = src.filter(col("o_totalprice") > 100000.0 &&
                              col("o_orderpriority") === "1-URGENT").count()
    assert(q.count() === expected)
  }
}
