package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Exact top-k-per-group aggregate with bounded state.
  *
  * Why a custom aggregate: the built-in spelling — a ranking window
  * (`row_number over (partition by key order by ord desc)` + filter) —
  * must shuffle and SORT every row of every group. This aggregate keeps at
  * most 2k rows per group in the buffer, combines map-side before the
  * shuffle (partial aggregation), and only ever sorts buffers of size
  * <= 2k. At 100 TB the difference is a full sort of the fact table vs a
  * streaming bounded-memory pass.
  *
  * `top_k_by(payload, ord, k)` returns `array<payload>` holding the k
  * rows with the largest `ord`, descending (ties broken by `ord`'s own
  * ordering, so pass a struct with a unique last field for determinism).
  */
object TopKBy {
  def top_k_by(payload: Column, ord: Column, k: Int): Column =
    Bridge.column(
      TopKByAgg(Bridge.expression(payload), Bridge.expression(ord), k)
        .toAggregateExpression())
}

case class TopKByAgg(
    payload: Expression,
    ordExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Any, Any)]]
  with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"top_k_by k out of range: $k")

  override def left: Expression = payload
  override def right: Expression = ordExpr

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(ordExpr.dataType)
  private def pairOrd: Ordering[(Any, Any)] =
    Ordering.by[(Any, Any), Any](_._1)(ordering.asInstanceOf[Ordering[Any]])

  override def createAggregationBuffer(): ArrayBuffer[(Any, Any)] = ArrayBuffer.empty

  /** Keep the buffer bounded: when it exceeds 2k, cut back to the k
    * largest. Amortized O(log k)-ish per row without a heap dependency.
    */
  private def trim(buf: ArrayBuffer[(Any, Any)]): ArrayBuffer[(Any, Any)] =
    if (buf.length > 2 * k) {
      val kept = buf.sorted(pairOrd.reverse).take(k)
      buf.clear(); buf ++= kept
    } else buf

  override def update(buf: ArrayBuffer[(Any, Any)], input: InternalRow): ArrayBuffer[(Any, Any)] = {
    val o = ordExpr.eval(input)
    if (o != null) {
      val p = payload.eval(input)
      buf += ((InternalRow.copyValue(o), InternalRow.copyValue(p)))
      trim(buf)
    } else buf
  }

  override def merge(buf: ArrayBuffer[(Any, Any)], other: ArrayBuffer[(Any, Any)]): ArrayBuffer[(Any, Any)] = {
    buf ++= other
    trim(buf)
  }

  override def eval(buf: ArrayBuffer[(Any, Any)]): Any =
    new GenericArrayData(buf.sorted(pairOrd.reverse).take(k).map(_._2).toArray)

  // buffer wire format: rows of struct(ord, payload) through an
  // UnsafeProjection, length-prefixed
  @transient private lazy val pairSchema =
    StructType(Seq(StructField("o", ordExpr.dataType), StructField("p", payload.dataType)))
  @transient private lazy val proj = UnsafeProjection.create(pairSchema)

  override def serialize(buf: ArrayBuffer[(Any, Any)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (o, p) =>
      val row = proj.apply(InternalRow(o, p))
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Any, Any)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Any, Any)](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      buf += ((InternalRow.copyValue(row.get(0, ordExpr.dataType)),
               InternalRow.copyValue(row.get(1, payload.dataType))))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByAgg =
    copy(payload = l, ordExpr = r)
  override def prettyName: String = "top_k_by"
}
