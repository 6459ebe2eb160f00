package graft.functions

import graft.SparkSpec
import graft.functions.TopKBy.top_k_by
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKBySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1L, 10.0), ("a", 5L, 50.0), ("a", 3L, 30.0), ("a", 4L, 40.0),
    ("b", 2L, 20.0),
    ("c", 7L, 70.0), ("c", 7L, 71.0) // tie on ord
  ).toDF("k", "ord", "v")

  private def topk(data: org.apache.spark.sql.DataFrame, k: Int) =
    data.groupBy("k")
      .agg(top_k_by(col("v"), struct(col("ord"), col("v")), k).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap

  test("returns k largest by ord descending; short groups return all") {
    val m = topk(df, 2)
    assert(m("a") === List(50.0, 40.0))
    assert(m("b") === List(20.0))
    assert(m("c") === List(71.0, 70.0)) // tie broken by payload in ord struct
  }

  test("result is partition-invariant (partial merge + serde path)") {
    val many = spark.range(0, 10000).select(
      (col("id") % 7).cast("string").as("k"),
      pmod(hash(col("id")), lit(100000)).cast("long").as("ord"),
      col("id").cast("double").as("v"))
    val a = topk(many.repartition(1), 5)
    val b = topk(many.repartition(13), 5)
    assert(a === b)
  }

  test("null ordering keys are skipped, not crashed on") {
    val withNulls = df.withColumn("ord",
      when(col("v") === 50.0, lit(null).cast("long")).otherwise(col("ord")))
    val m = withNulls.groupBy("k")
      .agg(top_k_by(col("v"), struct(col("ord"), col("v")), 2).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(m("a") === List(40.0, 30.0)) // 50.0 dropped with its null ord
  }

  test("buffer stays bounded: k=3 over a 100k-row group matches sort-take") {
    val big = spark.range(0, 100000).select(
      lit("g").as("k"),
      pmod(hash(col("id")), lit(1000000)).cast("long").as("ord"),
      col("id").cast("double").as("v"))
    val got = topk(big.repartition(16), 3)("g")
    val exp = big.orderBy(col("ord").desc, col("v").desc).limit(3)
      .select("v").as[Double].collect().toList
    assert(got === exp)
  }
}
