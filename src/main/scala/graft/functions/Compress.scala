package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressibility quality signal: compressed-size / raw-size of a
  * document's UTF-8 bytes (zlib deflate, fixed level). Heavily templated or
  * repetitive text compresses far below natural prose, so a LOW ratio is a
  * strong machine-generated/boilerplate flag — the standard corpus-quality
  * heuristic used alongside length/stopword/repetition filters in published
  * web-corpus pipelines (Gopher/MassiveText-family quality rules).
  *
  * Determinism: java.util.zip.Deflater with a fixed level, default strategy
  * and no preset dictionary produces identical bytes for identical input on
  * a given JVM — and only the LENGTH is consumed, which is stable across
  * zlib builds in practice; the spec additionally pins exact values for
  * fixture strings. Cost: one pass over the UTF-8 bytes per row into a
  * thread-local Deflater (no per-row allocation of the 64 KiB state), so the
  * expression stays safe inside a 100 TB scan stage.
  */
object Compress {

  // Lifetime note: these Deflaters are never end()ed — each pins ~64 KiB
  // of native zlib state per executor THREAD for the JVM's life. Bounded
  // by the task-thread pool (a few MiB total on a 32-core executor) and
  // reused across all tasks, which is the point; an executor with heavy
  // thread churn would want a Cleaner-registered holder instead.
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /** Deflated byte count of the UTF-8 encoding of `s` (raw deflate, level
    * 6, no zlib header so tiny inputs aren't dominated by framing).
    */
  def deflatedLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** compressed/raw ratio; empty input → 1.0 (nothing to judge). */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.numBytes()
    if (raw == 0) 1.0
    else deflatedLen(s).toDouble / raw.toDouble
  }

  def deflate_ratio(c: Column): Column =
    Bridge.column(DeflateRatio(Bridge.expression(c)))
}

/** deflate(text).length / utf8(text).length as a codegen'd scalar — a
  * direct static call so the quality-scan stage stays inside whole-stage
  * codegen.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    Compress.deflateRatio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Compress.deflateRatio($c)")
  override protected def withNewChildInternal(c: Expression): DeflateRatio =
    copy(child = c)
  override def prettyName: String = "deflate_ratio"
}
