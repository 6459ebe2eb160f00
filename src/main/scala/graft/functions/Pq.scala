package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — the standard billion-vector
  * compression): a vector is split into `m` subspaces, each quantized to
  * its nearest per-subspace centroid, so the corpus stores m small codes
  * per vector instead of the float payload. Queries score candidates with
  * an ASYMMETRIC distance: a per-query table of query-slice-to-centroid
  * distances is computed once (m*k work), after which every candidate
  * costs just m table lookups — the property that makes exhaustive
  * scoring of billions of compressed vectors feasible.
  *
  * All three kernels are codegen'd expressions; the codebook rides into
  * generated code via `ctx.addReferenceObj` (a driver-built m x k x
  * subDim constant, like the IVF centroids). Flattened-double layouts
  * keep the hot loops allocation-free.
  */
object Pq {

  /** codes[j] = argmin_c ||v[j*sub .. ) - codebook[j][c]||², ties to the
    * lowest c. `v` is the raw float/double array; codebook flattened as
    * [j][c*sub + t].
    */
  def encode(v: ArrayData, cb: Array[Array[Double]], m: Int, k: Int,
             floats: Boolean): ArrayData = {
    val dims = v.numElements()
    val sub = dims / m
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d2 = 0.0
        var t = 0
        while (t < sub) {
          val x = if (floats) v.getFloat(j * sub + t).toDouble
                  else v.getDouble(j * sub + t)
          val diff = x - cbj(c * sub + t)
          d2 += diff * diff
          t += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query ADC table, flattened [j*k + c] = ||q_slice_j -
    * codebook[j][c]||² — computed ONCE per query row (m*k*sub work);
    * candidates then cost m lookups each.
    */
  def distTable(v: ArrayData, cb: Array[Array[Double]], m: Int, k: Int,
                floats: Boolean): ArrayData = {
    val dims = v.numElements()
    val sub = dims / m
    val out = new Array[Any](m * k)
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      var c = 0
      while (c < k) {
        var d2 = 0.0
        var t = 0
        while (t < sub) {
          val x = if (floats) v.getFloat(j * sub + t).toDouble
                  else v.getDouble(j * sub + t)
          val diff = x - cbj(c * sub + t)
          d2 += diff * diff
          t += 1
        }
        out(j * k + c) = d2
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate squared distance: Σ_j dtab[j*k + codes[j]] — the m-lookup
    * candidate kernel.
    */
  def adcSum(codes: ArrayData, dtab: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      s += dtab.getDouble(j * k + codes.getInt(j))
      j += 1
    }
    s
  }

  // ---- Column API ----------------------------------------------------

  private def e(c: Column): Expression = Bridge.expression(c)

  def pq_encode(vec: Column, cb: Array[Array[Double]], m: Int, k: Int): Column =
    Bridge.column(PqEncode(e(vec), new Codebook(cb), m, k))

  def pq_dist_table(vec: Column, cb: Array[Array[Double]], m: Int, k: Int): Column =
    Bridge.column(PqDistTable(e(vec), new Codebook(cb), m, k))

  def pq_adc(codes: Column, dtab: Column, k: Int): Column =
    Bridge.column(PqAdc(e(codes), e(dtab), k))
}

/** Codebook holder with VALUE equality/hashing. A bare
  * Array[Array[Double]] case-class field compares by reference, so two
  * semantically identical PqEncode expressions never canonicalize equal
  * and Catalyst's common-subexpression elimination misses them (a
  * projection repeating pq_encode would encode twice). The kernels still
  * read the raw `rows` array — equality is the only thing this wrapper
  * changes.
  */
final class Codebook(val rows: Array[Array[Double]]) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case c: Codebook =>
      rows.length == c.rows.length &&
        rows.indices.forall(i => java.util.Arrays.equals(rows(i), c.rows(i)))
    case _ => false
  }
  override val hashCode: Int =
    rows.foldLeft(17)((h, r) => 31 * h + java.util.Arrays.hashCode(r))
}

/** PQ code assignment (array<int>, length m) of an array<float|double>
  * vector against a driver-built codebook.
  */
case class PqEncode(child: Expression, cb: Codebook, m: Int, k: Int)
    extends UnaryExpression with VecArg {
  require(m > 0 && k > 0, s"bad PQ geometry: m=$m k=$k")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private lazy val cF = isFloatArray(child.dataType)
  override def nullSafeEval(input: Any): Any =
    Pq.encode(input.asInstanceOf[ArrayData], cb.rows, m, k, cF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cb.rows, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Pq.encode($c, $ref, $m, $k, $cF)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** Per-query ADC distance table (array<double>, length m*k). */
case class PqDistTable(child: Expression, cb: Codebook, m: Int, k: Int)
    extends UnaryExpression with VecArg {
  require(m > 0 && k > 0, s"bad PQ geometry: m=$m k=$k")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private lazy val cF = isFloatArray(child.dataType)
  override def nullSafeEval(input: Any): Any =
    Pq.distTable(input.asInstanceOf[ArrayData], cb.rows, m, k, cF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cb.rows, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Pq.distTable($c, $ref, $m, $k, $cF)")
  }
  override protected def withNewChildInternal(c: Expression): PqDistTable = copy(child = c)
  override def prettyName: String = "pq_dist_table"
}

/** m-lookup asymmetric distance of (codes, distance table). */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codes: Any, dtab: Any): Any =
    Pq.adcSum(codes.asInstanceOf[ArrayData], dtab.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Pq.adcSum($a, $b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}
