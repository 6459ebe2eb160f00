package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Space-Saving heavy-hitters sketch (Metwally et al.,
  * "Efficient computation of frequent and top-k elements", ICDT'05;
  * merge rule per Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * Why a custom aggregate: exact term frequencies over 100 TB need a
  * full shuffle on the term key; the sketch finds every item with true
  * frequency > N/k in ONE pass with k counters per partial buffer,
  * combining map-side before the shuffle like any algebraic aggregate.
  *
  * `heavy_hitters(item, k)` returns `array<struct<term, est, err>>`
  * sorted by est desc (ties by term). Guarantees, preserved under merge:
  *   - no false negatives: any item with true count > N/k is present;
  *   - est is an overestimate: est - err <= true <= est, with err <= N/k.
  * When k >= the true item cardinality nothing is ever evicted and the
  * sketch is EXACT (est == true, err == 0) — the regime the DuckDB
  * oracle checks; RecallSpec covers the lossy regime on skewed data.
  */
object HeavyHitters {
  def heavy_hitters(item: Column, k: Int): Column =
    Bridge.column(
      HeavyHittersAgg(Bridge.expression(item), k).toAggregateExpression())
}

case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 16), s"heavy_hitters k out of range: $k")

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  // the floor a full summary puts under any evicted item's count
  private def minCount(buf: mutable.HashMap[String, (Long, Long)]): Long =
    if (buf.size >= k) buf.valuesIterator.map(_._1).min else 0L

  override def update(buf: mutable.HashMap[String, (Long, Long)],
                      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.toString
    buf.get(s) match {
      case Some((c, e)) => buf(s) = (c + 1, e)
      case None if buf.size < k => buf(s) = (1L, 0L)
      case None =>
        // evict the min-count item (ties by key for determinism within a
        // buffer); the newcomer inherits its count as the overestimate
        val (mKey, (mC, _)) = buf.minBy { case (key, (c, _)) => (c, key) }
        buf -= mKey
        buf(s) = (mC + 1, mC)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, (Long, Long)],
                     other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    // Agarwal et al.: an item absent from a FULL summary may have been
    // evicted with count <= that summary's min counter, so its
    // contribution (and error) from that side is the min counter
    val m1 = minCount(buf)
    val m2 = minCount(other)
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (buf.keysIterator ++ other.keysIterator).foreach { key =>
      if (!merged.contains(key)) {
        val (c1, e1) = buf.getOrElse(key, (m1, m1))
        val (c2, e2) = other.getOrElse(key, (m2, m2))
        merged(key) = (c1 + c2, e1 + e2)
      }
    }
    buf.clear()
    if (merged.size <= k) buf ++= merged
    else buf ++= merged.toSeq
      .sortBy { case (key, (c, _)) => (-c, key) }.take(k)
    buf
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any =
    new GenericArrayData(
      buf.toSeq.sortBy { case (key, (c, _)) => (-c, key) }
        .map { case (key, (c, e)) =>
          InternalRow(UTF8String.fromString(key), c, e) }.toArray[Any])

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, (c, e)) =>
      val kb = key.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf(new String(kb, "UTF-8")) = (in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HeavyHittersAgg =
    copy(child = c)
  override def prettyName: String = "heavy_hitters"
}
