package graft.functions

import graft.SparkSpec
import graft.functions.VectorMath.{cosine_sim, l2_norm, sq_dist}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd vector expressions must be BIT-IDENTICAL to the
  * higher-order-function spelling they replaced (same sequential fold
  * order) — that equivalence is what keeps the q40 oracle hash-matching
  * DuckDB's `list_dot_product`.
  */
class VectorMathSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def hofCosine = {
    def fold(z: org.apache.spark.sql.Column) =
      aggregate(z, lit(0.0), (acc, x) => acc + x)
    val a = col("a"); val b = col("b")
    fold(zip_with(a, b, (x, y) => x * y)) /
      (sqrt(fold(transform(a, x => x * x))) * sqrt(fold(transform(b, x => x * x))))
  }

  private def vecs(seed: Int, n: Int, dims: Int): Seq[(Array[Double], Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((Array.fill(dims)(rnd.nextGaussian()), Array.fill(dims)(rnd.nextGaussian())))
  }

  test("cosine_sim is bit-identical to the sequential HOF fold (double arrays)") {
    val df = vecs(7, 200, 64).toDF("a", "b")
    val diffs = df.select(cosine_sim(col("a"), col("b")).as("c"), hofCosine.as("h"))
      .filter(col("c") =!= col("h")) // bitwise inequality for doubles
      .count()
    assert(diffs === 0L, "codegen'd cosine diverged from the HOF fold")
  }

  test("float input widens exactly: same result as pre-cast double arrays") {
    val fl = vecs(11, 100, 32).map { case (a, _) =>
      val f = a.map(_.toFloat)
      (f, f.map(_.toDouble)) // identical values, two types
    }.toDF("f", "d")
    val diffs = fl.select(
      cosine_sim(col("f"), col("f")).as("cf"),
      cosine_sim(col("d"), col("d")).as("cd"))
      .filter(col("cf") =!= col("cd")).count()
    assert(diffs === 0L)
  }

  test("sq_dist and l2_norm match their closed forms") {
    val df = vecs(13, 100, 16).toDF("a", "b")
    val rows = df.select(
      sq_dist(col("a"), col("b")).as("sd"),
      l2_norm(col("a")).as("n"),
      col("a"), col("b")).collect()
    rows.foreach { r =>
      val a = r.getSeq[Double](2).toArray
      val b = r.getSeq[Double](3).toArray
      val sd = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
      val n = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
      assert(r.getDouble(0) === sd)
      assert(r.getDouble(1) === n)
    }
  }
}
