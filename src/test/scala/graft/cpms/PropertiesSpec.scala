package graft.cpms

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (SURVEY §5.3) driven by seeded ScalaCheck
  * generators (the scalatest<->scalacheck bridge artifact isn't in the
  * offline cache, so cases are sampled explicitly — deterministic seeds,
  * same coverage).
  */
class PropertiesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val eventsGen: Gen[List[(String, Long, Int)]] = for {
    n <- Gen.choose(1, 25)
    evs <- Gen.listOfN(n, for {
      u <- Gen.oneOf("u1", "u2", "u3")
      t <- Gen.choose(1L, 50L)
      v <- Gen.choose(0, 1000)
    } yield (u, t, v))
  } yield evs

  test("property: served state == event with max (ts, arrival) per user, any permutation (T3)") {
    (1 to 30).foreach { seed =>
      val evs = sample(eventsGen, seed)
      val df = evs.zipWithIndex
        .map { case ((u, t, v), i) => (u, t, v, i.toLong) }
        .toDF("user_id", "ts", "value", "arrival")
      val got = df.groupBy("user_id")
        .agg(max_by(col("value"), struct(col("ts"), col("arrival"))).as("v"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val exp = evs.zipWithIndex.groupBy(_._1._1).map { case (u, g) =>
        u -> g.maxBy { case ((_, t, _), i) => (t, i) }._1._3
      }
      assert(got === exp, s"seed=$seed events=$evs")
    }
  }

  test("property: distributed top-k == in-memory sorted take (O1)") {
    val xsGen = Gen.nonEmptyListOf(Gen.choose(-1000, 1000))
    (1 to 30).foreach { seed =>
      val xs = sample(xsGen, 1000L + seed)
      val df = xs.zipWithIndex.toDF("v", "id").repartition(5)
      val got = df.orderBy(col("v").desc, col("id")).limit(5)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toList
      val exp = xs.zipWithIndex.sortBy { case (v, i) => (-v, i) }.take(5)
      assert(got === exp, s"seed=$seed")
    }
  }

  test("property: merge precedence — request value always wins when present (J5)") {
    val caseGen = for {
      req <- Gen.option(Gen.choose(0, 100))
      agg <- Gen.choose(0, 100)
    } yield (req, agg)
    val cases = (1 to 60).map(s => sample(caseGen, 2000L + s))
    val df = cases.zipWithIndex
      .map { case ((req, agg), i) => (i, req, agg) }
      .toDF("i", "req", "agg")
      .select(col("i"), coalesce(col("req"), col("agg")).as("merged"))
    val got = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    cases.zipWithIndex.foreach { case ((req, agg), i) =>
      assert(got(i) === req.getOrElse(agg))
    }
  }
}
