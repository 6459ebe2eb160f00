package graft.cpms

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class QueriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def aggs = Seq(
    ("u1", ts("2024-01-01 10:00:00"), 70, 100, 500),
    ("u1", ts("2024-01-02 10:00:00"), 80, 200, 600),
    ("u2", ts("2024-01-01 09:00:00"), 90, 300, 700)
  ).toDF("user_id", "ts", "heart_rate", "steps", "calories")

  test("workerStatus serves the newest row for exactly the asked key (S4/A4/O2)") {
    val out = Queries.workerStatus(aggs, "u1").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[java.sql.Timestamp]("ts") === ts("2024-01-02 10:00:00"))
    assert(r.getAs[Int]("heart_rate") === 80)
  }

  test("workerStatus on an unknown key returns no rows (404 path, main.py:76-80)") {
    assert(Queries.workerStatus(aggs, "nope").isEmpty)
  }

  test("latestPerUser is the per-key event-time argmax (T3 batch view)") {
    val m = Queries.latestPerUser(aggs).collect()
      .map(r => r.getAs[String]("user_id") -> r.getAs[Int]("heart_rate")).toMap
    assert(m === Map("u1" -> 80, "u2" -> 90))
  }

  test("dashboardRecent: compound-key left join matches same-timestamp rows only (J2)") {
    val users = Seq("u1", "u2").toDF("user_id")
    val scores = Seq(
      ("c1", "u1", ts("2024-01-01 10:00:00"), 42),
      ("c2", "u2", ts("2024-01-02 10:00:00"), 77)
    ).toDF("cs_id", "user_id", "timestamp", "cognitive_score")
    val risks = Seq(
      // same user+timestamp as c1 -> joins; different timestamp -> must not
      ("t1", "u1", ts("2024-01-01 10:00:00"), 65),
      ("t2", "u2", ts("2024-01-02 11:00:00"), 99)
    ).toDF("tr_id", "user_id", "timestamp", "heart_rate")

    val rows = Queries.dashboardRecent(users, scores, risks).collect()
      .map(r => r.getAs[Int]("score") ->
        (r.getAs[Int]("heart_rate"), r.getAs[String]("status"))).toMap
    assert(rows(42) === ((65, "Critical")))
    assert(rows(77) === ((0, "Normal"))) // unmatched -> heart_rate null -> 0
  }
}
