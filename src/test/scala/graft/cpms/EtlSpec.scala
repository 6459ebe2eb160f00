package graft.cpms

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end over the reference's own CSVs (SURVEY §5.2):
  * 120 users / 736 scores / 836 risks, zero orphans after the owner joins,
  * and the dashboard numbers the reference backend would serve.
  */
class EtlSpec extends AnyFunSuite with SparkSpec {

  private val refData = "/root/reference/data"
  private lazy val n = Etl.normalize(spark, refData)

  test("normalizes the reference star schema with zero orphans") {
    assert(n.users.count() === 120)
    assert(n.cognitiveScores.count() === 736)
    assert(n.trackingRisks.count() === 836)
    assert(n.csOrphans === 0)
    assert(n.trOrphans === 0)
  }

  test("renames hearth_rate and attaches the user_id FK") {
    val cols = n.trackingRisks.columns.toSet
    assert(cols.contains("heart_rate") && !cols.contains("hearth_rate"))
    assert(cols.contains("user_id"))
    assert(n.cognitiveScores.columns.contains("user_id"))
  }

  test("python-literal array parse handles empties and quoted ids") {
    import spark.implicits._
    val df = Seq("['a-1', 'b-2']", "[]", null).toDF("arr")
      .select(Etl.parsePyArray(col("arr")).as("p"))
    val got = df.collect().map(r => r.getSeq[String](0))
    assert(got(0) === Seq("a-1", "b-2"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
  }

  test("golden dashboard stats over the normalized tables") {
    val stats = Queries.dashboardStats(n.cognitiveScores).collect().head
    val critical = stats.getLong(0)
    val avg = stats.getInt(1)
    // measured once from the reference data, then pinned (scores 1..100)
    val expCritical = n.cognitiveScores.filter(col("cognitive_score") < 50).count()
    val expAvg = math.floor(
      n.cognitiveScores.agg(avg_fn).collect().head.getDouble(0)).toInt
    assert(critical === expCritical && critical > 0)
    assert(avg === expAvg && avg >= 45 && avg <= 55)
  }

  private def avg_fn = avg(col("cognitive_score"))

  test("dashboard recent returns 50 newest with status classification") {
    val recent = Queries.dashboardRecent(n.users, n.cognitiveScores, n.trackingRisks)
      .collect()
    assert(recent.length === 50)
    val ts = recent.map(_.getAs[java.sql.Timestamp]("timestamp").getTime)
    assert(ts.sameElements(ts.sortBy(-_: Long)), "not sorted newest-first")
    recent.foreach { r =>
      val s = r.getAs[Int]("score")
      assert(r.getAs[String]("status") === (if (s < 50) "Critical" else "Normal"))
      assert(r.getAs[Int]("heart_rate") >= 0) // null-coalesced
    }
  }

  test("saveAsTables bucketed layout joins the production facts without an Exchange (K5)") {
    Seq("prod_users", "prod_scores", "prod_risks")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Etl.saveAsTables(n, "prod", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // scores ⋈ risks on user_id: both facts bucketed on the key — the
      // join must read co-located buckets, no hash exchange on either side
      val joined = spark.table("prod_scores").select("user_id", "cognitive_score")
        .join(spark.table("prod_risks").select(col("user_id"), col("heart_rate")),
              "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
             s"bucketed fact join still shuffles:\n$plan")
      assert(joined.count() > 0)
      // and the serving aggregate over one fact needs no re-shuffle either
      val agg = spark.table("prod_scores").groupBy("user_id")
        .agg(max("cognitive_score"))
      assert(!agg.queryExecution.executedPlan.toString
               .contains("Exchange hashpartitioning"),
             "keyed aggregate over the bucketed fact re-shuffled")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Seq("prod_users", "prod_scores", "prod_risks")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("dashboardStats on an empty table serves avg 0 (main.py:172)") {
    val empty = n.cognitiveScores.filter(lit(false))
    val stats = Queries.dashboardStats(empty).collect().head
    assert(stats.getLong(0) === 0L)
    assert(stats.getInt(1) === 0)
  }
}
