package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cross-query coupling guard: every registry query must produce the same
  * result regardless of WHICH queries ran before it. Several operators
  * share per-(session, corpus) cached artifacts (the verified pair set,
  * corpus stats, IVF/bloom structures) — a bug in any cache's keying or
  * lifecycle would show up as order-dependent results long before it
  * shows up as a wrong answer in a fixed-order run (the driver always
  * executes alphabetically). One smoke pass at sf0.001 in sorted order,
  * one in seeded-shuffled order on a FRESH session (fresh session-keyed
  * caches, so later queries must rebuild state in the new order), then a
  * row-for-row compare.
  */
class OrderIndependenceSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def runAll(s: SparkSession, order: Seq[String]): Map[String, Seq[String]] =
    order.map { name =>
      name -> SparkEntry.queries(name)(s, sf).collect().map(_.toString).sorted.toSeq
    }.toMap

  test("registry results do not depend on execution order") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val sortedRun = runAll(spark, names)
    val shuffledOrder = new scala.util.Random(20260812L).shuffle(names)
    val shuffledRun = runAll(spark.newSession(), shuffledOrder)
    for (n <- names)
      assert(sortedRun(n) === shuffledRun(n),
             s"query $n returns different results depending on execution order")
  }
}
