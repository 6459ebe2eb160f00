package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import HeavyHitters.heavy_hitters

  // Zipf-ish stream: term t_i appears ceil(2000 / i) times, i in 1..50.
  // N ~ 9000, so with k = 16 the guarantee threshold N/k ~ 562 covers
  // the top 3 terms (2000, 1000, 667) with slack.
  private lazy val skewed = {
    val rows = (1 to 50).flatMap(i => Seq.fill(math.ceil(2000.0 / i).toInt)(s"t$i"))
    rows.toDF("term")
  }
  private lazy val exact: Map[String, Long] = skewed.groupBy("term").count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  private lazy val n: Long = exact.values.sum

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Seq[(String, Long, Long)] =
    df.agg(heavy_hitters(col("term"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.term", "e.est", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("lossy regime: overestimate bounds and no false negatives above N/k") {
    val k = 16
    for (parts <- Seq(1, 7, 32)) { // order/partitioning must not break guarantees
      val out = sketch(skewed.repartition(parts), k)
      assert(out.size <= k)
      out.foreach { case (t, est, err) =>
        val truth = exact.getOrElse(t, 0L)
        assert(est >= truth, s"[$parts parts] $t: est $est under true $truth")
        assert(est - err <= truth,
               s"[$parts parts] $t: est-err ${est - err} exceeds true $truth")
        assert(err <= n / k, s"[$parts parts] $t: err $err above N/k ${n / k}")
      }
      // every item with true count > N/k must be present
      exact.filter(_._2 > n / k).keys.foreach { heavy =>
        assert(out.exists(_._1 == heavy),
               s"[$parts parts] heavy item $heavy (${exact(heavy)} > ${n / k}) missing")
      }
    }
  }

  test("exact regime: k above cardinality yields exact counts with zero error") {
    val out = sketch(skewed.repartition(13), 64)
    assert(out.size === exact.size)
    out.foreach { case (t, est, err) =>
      assert(est === exact(t) && err === 0L, s"$t inexact in the no-evict regime")
    }
    // and descending order with deterministic ties
    assert(out.map(_._2) === out.map(_._2).sorted(Ordering[Long].reverse))
  }

  test("sketch accumulates across micro-batches as a streaming complete-mode aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("term")
      .groupBy().agg(heavy_hitters(col("term"), 16).as("hh"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream").start()
    mem.addData(Seq.fill(5)("a") ++ Seq.fill(2)("b"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(3)("a") ++ Seq.fill(4)("c"): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("hh_stream").select(explode(col("hh")).as("e"))
      .select("e.term", "e.est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 8L, "b" -> 2L, "c" -> 4L),
           s"streaming sketch state did not accumulate exactly: $out")
  }

  test("property: guarantees hold for random streams, k, and partitioning") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val gen: Gen[(List[String], Int, Int)] = for {
      nDistinct <- Gen.choose(2, 40)
      n <- Gen.choose(20, 400)
      items <- Gen.listOfN(n, Gen.choose(1, nDistinct).map(i => s"w$i"))
      k <- Gen.choose(2, 24)
      parts <- Gen.choose(1, 9)
    } yield (items, k, parts)
    (1 to 25).foreach { seed =>
      val (items, k, parts) = sample(gen, seed)
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val out = sketch(items.toDF("term").repartition(parts), k)
      assert(out.size <= k, s"seed $seed: size ${out.size} > k $k")
      out.foreach { case (t, est, err) =>
        val tr = truth.getOrElse(t, 0L)
        assert(est >= tr && est - err <= tr && err <= n / k,
               s"seed $seed (k=$k,parts=$parts): $t est=$est err=$err true=$tr N/k=${n / k}")
      }
      truth.filter(_._2 > n / k).keys.foreach { heavy =>
        assert(out.exists(_._1 == heavy),
               s"seed $seed (k=$k,parts=$parts): heavy $heavy (${truth(heavy)}) missing")
      }
    }
  }

  test("sketch is callable from pure SQL and partially aggregates map-side") {
    Functions.register(spark)
    skewed.createOrReplaceTempView("hh_terms")
    val top = spark.sql(
      "SELECT inline(heavy_hitters(term, 8)) FROM hh_terms LIMIT 1").head()
    assert(top.getString(0) === "t1" && top.getLong(1) >= 2000L)
    // partial aggregation: the map-side partial_heavy_hitters sits below
    // the single-partition exchange
    val p = skewed.repartition(8)
      .agg(heavy_hitters(col("term"), 8)).queryExecution.executedPlan.toString
    val partialIdx = p.indexOf("partial_heavy_hitters")
    val exchangeIdx = p.indexOf("Exchange")
    assert(partialIdx >= 0, s"no partial aggregation:\n$p")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
           "partial sketch must combine map-side, before the shuffle")
  }
}
