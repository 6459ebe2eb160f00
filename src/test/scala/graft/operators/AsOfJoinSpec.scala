package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked edge cases for the composed as-of join (q22): the
  * union+window plan must implement "latest event at-or-before the order
  * time, per key" exactly — inclusive boundary, no-prior-event null,
  * cross-key isolation.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("as-of join edge cases on a handcrafted fixture") {
    // events: (k, t, side=0, seq, value)
    val e = Seq(
      (1L, 100L, 0, 10L, Some(1.0)),
      (1L, 200L, 0, 11L, Some(2.0)),
      (2L, 500L, 0, 20L, Some(9.0))
    ).toDF("k", "t", "side", "seq", "value")
    // orders: key 1 at t=200 (ties event exactly), t=150 (between), t=50
    // (before all); key 2 at t=400 (before its only event); key 3 (no events)
    val o = Seq(
      (1L, 200L, 1, 100L, None: Option[Double]),
      (1L, 150L, 1, 101L, None),
      (1L, 50L, 1, 102L, None),
      (2L, 400L, 1, 200L, None),
      (3L, 999L, 1, 300L, None)
    ).toDF("k", "t", "side", "seq", "value")

    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("k").orderBy(col("t"), col("side"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = e.unionAll(o)
      .withColumn("asof_value", last(col("value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("seq"), col("asof_value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(out(100L) === Some(2.0), "event at exactly the order time must match (<=)")
    assert(out(101L) === Some(1.0), "between events -> earlier one")
    assert(out(102L) === None, "no prior event -> null")
    assert(out(200L) === None, "other key's later event must not leak")
    assert(out(300L) === None, "key with no events at all")
  }

  test("q22 matches a per-row nested-loop reference on real data") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q22_asof_join")(spark, sf)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    // independent reference: correlated max per order, computed naively
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"ts_ns", $"value", $"event_id").collect()
    val byUser = ev.groupBy(_.getLong(0))
    val orders = graft.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_custkey",
                  "unix_micros(cast(o_orderdate as timestamp)) * 1000 as t")
      .collect()
    orders.take(500).foreach { o =>
      val cands = byUser.getOrElse(o.getLong(1), Array.empty)
        .filter(_.getLong(1) <= o.getLong(2))
      val exp =
        if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r.getLong(1), r.getLong(3))).getDouble(2))
      assert(got(o.getLong(0)) === exp, s"order ${o.getLong(0)}")
    }
  }
}
