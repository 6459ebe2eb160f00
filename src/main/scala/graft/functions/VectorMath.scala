package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Dense-vector math over `array<float>` / `array<double>` columns as
  * codegen'd Catalyst expressions.
  *
  * Why not the higher-order-function spelling
  * (`aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x)`):
  * HOFs are `CodegenFallback`, so any Project/Filter evaluating them falls
  * out of whole-stage codegen — exactly in the ANN/dedup scan stages that
  * touch the full corpus. These expressions accumulate sequentially in
  * double precision in the same left-to-right order as the HOF fold, so
  * results are bit-identical to the previous spelling (and to DuckDB's
  * `list_dot_product`-based oracles), while reading `array<float>` input
  * directly (a float widened to double is exact) instead of forcing a
  * `transform(_.cast("double"))` allocation per row.
  */
object VectorMath {

  @inline private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** Sequential dot product over the zipped prefix (HOF zip_with semantics:
    * shorter length wins; null elements contribute 0 — inputs have none).
    */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += elem(a, i, aF) * elem(b, i, bF)
      i += 1
    }
    acc
  }

  /** Sequential sum of squares (the L2 norm squared). */
  def normSq(a: ArrayData, aF: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { val x = elem(a, i, aF); acc += x * x }
      i += 1
    }
    acc
  }

  /** Cosine similarity: dot / (sqrt(|a|^2) * sqrt(|b|^2)), all sequential
    * double folds — the exact evaluation order of the previous HOF
    * spelling and of DuckDB `list_dot_product(a, b) /
    * (sqrt(list_dot_product(a, a)) * sqrt(list_dot_product(b, b)))`.
    */
  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double =
    dot(a, b, aF, bF) / (math.sqrt(normSq(a, aF)) * math.sqrt(normSq(b, bF)))

  /** Sequential squared euclidean distance over the zipped prefix. */
  def sqDist(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = elem(a, i, aF) - elem(b, i, bF)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  // ---- Column API ----------------------------------------------------

  private def e(c: Column): Expression = Bridge.expression(c)

  def cosine_sim(a: Column, b: Column): Column = Bridge.column(CosineSim(e(a), e(b)))

  /** Bare dot product — the pair-loop kernel of [[cosine_sim]] exposed so
    * brute-force/audit scans can PRECOMPUTE the two norms once per row
    * (a cross join recomputes them once per PAIR otherwise):
    * `dot_product(a, b) / (l2_norm(a) * l2_norm(b))` performs the exact
    * double operations of `cosine_sim(a, b)` in the exact order —
    * dot fold, normSq folds, sqrt each, multiply, divide — so results
    * are bit-identical while the per-pair work drops to the dot fold.
    */
  def dot_product(a: Column, b: Column): Column = Bridge.column(DotProduct(e(a), e(b)))

  def sq_dist(a: Column, b: Column): Column = Bridge.column(SqDist(e(a), e(b)))

  def l2_norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(Bridge.column(NormSq(e(a))))
  }
}

/** Shared element-type dispatch: works for array<float> and array<double>
  * children without an implicit cast (resolved lazily — dataType is only
  * consulted at eval/codegen time, after analysis).
  */
private[functions] trait VecArg {
  protected def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Cosine similarity of two numeric arrays (double result). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with VecArg {
  override def dataType: DataType = DoubleType
  private lazy val lF = isFloatArray(left.dataType)
  private lazy val rF = isFloatArray(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lF, rF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.cosine($a, $b, $lF, $rF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Dot product of two numeric arrays (double result) — [[VectorMath.dot]],
  * the same sequential fold [[CosineSim]] runs, as a standalone expression.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VecArg {
  override def dataType: DataType = DoubleType
  private lazy val lF = isFloatArray(left.dataType)
  private lazy val rF = isFloatArray(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lF, rF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.dot($a, $b, $lF, $rF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Squared euclidean distance of two numeric arrays (double result). */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression with VecArg {
  override def dataType: DataType = DoubleType
  private lazy val lF = isFloatArray(left.dataType)
  private lazy val rF = isFloatArray(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lF, rF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.sqDist($a, $b, $lF, $rF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "sq_dist"
}

/** L2 norm squared of a numeric array (double result). */
case class NormSq(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with VecArg {
  override def dataType: DataType = DoubleType
  private lazy val cF = isFloatArray(child.dataType)
  override def nullSafeEval(a: Any): Any =
    VectorMath.normSq(a.asInstanceOf[ArrayData], cF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorMath.normSq($a, $cF)")
  override protected def withNewChildInternal(c: Expression): NormSq = copy(child = c)
  override def prettyName: String = "norm_sq"
}
