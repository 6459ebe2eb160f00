package graft.functions

import graft.SparkSpec
import graft.functions.Pq.{pq_adc, pq_dist_table, pq_encode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level properties of the PQ expressions, independent of KMeans:
  * encode must pick the nearest per-subspace centroid (ties to the lowest
  * code), ADC must equal the explicit table sum, a vector's ADC distance
  * to its OWN quantization's query table must be the true quantization
  * residual, and the interpreted (nullSafeEval) and codegen paths must be
  * bit-identical.
  */
class PqSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val M = 4; private val K = 3; private val Sub = 2
  private val cb: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(M)(Array.fill(K * Sub)(rnd.nextGaussian()))
  }
  private def randVecs(seed: Int, n: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array.fill(M * Sub)(rnd.nextGaussian()))
  }

  // plain-Scala references, written independently of the kernel loops
  private def refEncode(v: Array[Double]): Seq[Int] =
    (0 until M).map { j =>
      val ds = (0 until K).map { c =>
        (0 until Sub).map { t =>
          val d = v(j * Sub + t) - cb(j)(c * Sub + t); d * d
        }.sum
      }
      ds.indexOf(ds.min) // indexOf takes the FIRST min = lowest code
    }
  private def refTable(q: Array[Double]): Seq[Double] =
    for (j <- 0 until M; c <- 0 until K) yield
      (0 until Sub).map { t =>
        val d = q(j * Sub + t) - cb(j)(c * Sub + t); d * d
      }.sum

  test("encode picks the nearest per-subspace centroid; adc equals the table sum") {
    val vs = randVecs(7, 100)
    val rows = vs.map(v => Tuple1(v)).toDF("v")
      .select(col("v"), pq_encode(col("v"), cb, M, K).as("codes"),
              pq_dist_table(col("v"), cb, M, K).as("dtab"))
      .withColumn("adc", pq_adc(col("codes"), col("dtab"), K))
      .collect()
    rows.zip(vs).foreach { case (r, v) =>
      val codes = r.getSeq[Int](1)
      val dtab = r.getSeq[Double](2)
      val adc = r.getDouble(3)
      assert(codes === refEncode(v), "encode diverged from reference argmin")
      assert(dtab === refTable(v), "distance table diverged from reference")
      // the vector's ADC distance under its own query table IS the total
      // quantization residual: sum over subspaces of the min cell distance
      val residual = (0 until M).map(j => dtab(j * K + codes(j))).sum
      assert(adc === residual, "adc diverged from the explicit table sum")
    }
  }

  test("exact centroid concatenations encode to those centroids with zero residual") {
    // vector j-th slice = centroid (j % K) of subspace j → codes known,
    // dist table at the chosen cell = 0, so ADC = 0 exactly
    val v = (0 until M).flatMap { j =>
      val c = j % K
      (0 until Sub).map(t => cb(j)(c * Sub + t))
    }.toArray
    val r = Seq(Tuple1(v)).toDF("v")
      .select(pq_encode(col("v"), cb, M, K).as("codes"),
              pq_adc(pq_encode(col("v"), cb, M, K),
                     pq_dist_table(col("v"), cb, M, K), K).as("adc"))
      .head()
    assert(r.getSeq[Int](0) === (0 until M).map(_ % K))
    assert(r.getDouble(1) === 0.0)
  }

  test("equal-valued codebooks canonicalize equal — CSE can merge repeated kernels") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // a deep copy: same values, different array identity. With bare
    // Array fields these would compare by reference and never merge.
    val cbCopy = cb.map(_.clone())
    val child = Literal.create(Array.fill(M * Sub)(0.5), ArrayType(DoubleType))
    val a = PqEncode(child, new Codebook(cb), M, K)
    val b = PqEncode(child, new Codebook(cbCopy), M, K)
    assert(a.semanticEquals(b),
           "value-equal codebooks must make semantically equal expressions")
    // and a different codebook must NOT collapse into the same kernel
    val cbDiff = cb.map(_.clone()); cbDiff(0)(0) += 1.0
    val c = PqEncode(child, new Codebook(cbDiff), M, K)
    assert(!a.semanticEquals(c), "different codebooks must stay distinct")
  }

  test("interpreted and codegen paths are bit-identical (double and float)") {
    val vs = randVecs(11, 200)
    def run(): Seq[(Seq[Int], Seq[Double], Double, Seq[Int])] =
      vs.map(v => (v, v.map(_.toFloat))).toDF("v", "vf")
        .select(pq_encode(col("v"), cb, M, K).as("c"),
                pq_dist_table(col("v"), cb, M, K).as("t"),
                pq_adc(pq_encode(col("v"), cb, M, K),
                       pq_dist_table(col("v"), cb, M, K), K).as("a"),
                pq_encode(col("vf"), cb, M, K).as("cf"))
        .collect().toSeq
        .map(r => (r.getSeq[Int](0), r.getSeq[Double](1), r.getDouble(2),
                   r.getSeq[Int](3)))
    val gen = run()
    val factoryBefore = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = run()
      assert(gen === interp, "codegen and interpreted PQ kernels diverge")
    } finally factoryBefore match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
