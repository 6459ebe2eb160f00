package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** [[Html.extractText]] / [[Html.extractMainText]] as native Catalyst
  * expressions — the repo's preference ladder for extending Spark
  * (native `Expression` with codegen > typed map > UDF): the crawl
  * JSONL path's opt-in extraction runs as ONE codegen'd projection
  * over the scan instead of a Row-serialization round trip through a
  * typed map, and the extractors become available to pure-SQL users
  * (`extract_html(text)` via [[graft.functions.Functions.register]]).
  * Both generate a direct static call, so the expression stays inside
  * whole-stage codegen (a CodegenFallback would split the stage).
  */
object HtmlExpr {

  /** Column form of the tag-strip extractor. */
  def extract_html(text: Column): Column =
    Bridge.column(HtmlExtract(Bridge.expression(text)))

  /** Column form of the C4/jusText main-content extractor. */
  def extract_main_html(text: Column): Column =
    Bridge.column(HtmlMainExtract(Bridge.expression(text)))

  /** UTF8String shims the generated code calls directly (the scanner
    * itself works on java.lang.String — extraction cost dwarfs the
    * one copy).
    */
  def extractU8(s: UTF8String): UTF8String =
    UTF8String.fromString(Html.extractText(s.toString))

  def extractMainU8(s: UTF8String): UTF8String =
    UTF8String.fromString(Html.extractMainText(s.toString))

  /** Column form of the outlink extractor (array of absolute URLs).
    * A null base coalesces to "" — absolute hrefs still extract
    * (extractLinks treats an unparseable base as "relatives drop"),
    * rather than nulling the whole result; a null TEXT yields null.
    */
  def extract_links(text: Column, baseUrl: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    Bridge.column(HtmlLinks(Bridge.expression(text),
                            Bridge.expression(coalesce(baseUrl, lit("")))))
  }

  def linksU8(s: UTF8String, base: UTF8String): ArrayData =
    new GenericArrayData(
      Html.extractLinks(s.toString, base.toString)
        .map(UTF8String.fromString(_).asInstanceOf[Any]))

  /** Column form of the anchor extractor:
    * array<struct<url, anchor>>, one element per link OCCURRENCE.
    * Same null policy as [[extract_links]].
    */
  def extract_anchors(text: Column, baseUrl: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    Bridge.column(HtmlAnchors(Bridge.expression(text),
                              Bridge.expression(coalesce(baseUrl, lit("")))))
  }

  def anchorsU8(s: UTF8String, base: UTF8String): ArrayData = {
    val pairs = Html.extractAnchors(s.toString, base.toString)
    new GenericArrayData(pairs.map { case (u, a) =>
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(u), UTF8String.fromString(a))
        .asInstanceOf[Any]
    })
  }

  /** Column form of the `<link rel=canonical>` extractor: the
    * document's declared canonical URL, absolute, or null when none
    * parses. Same null policy as [[extract_links]] on the base.
    */
  def extract_canonical(text: Column, baseUrl: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    Bridge.column(HtmlCanonical(Bridge.expression(text),
                                Bridge.expression(coalesce(baseUrl,
                                                           lit("")))))
  }

  def canonicalU8(s: UTF8String, base: UTF8String): UTF8String = {
    val r = Html.extractCanonical(s.toString, base.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}

/** `extract_html(text)` — deterministic HTML tag-strip extraction. */
case class HtmlExtract(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HtmlExpr.extractU8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sources.HtmlExpr.extractU8($c)")
  override protected def withNewChildInternal(c: Expression): HtmlExtract =
    copy(child = c)
  override def prettyName: String = "extract_html"
}

/** `extract_links(text, base_url)` — absolute outlinks of an HTML
  * body (`<a>`/`<area>` hrefs resolved against `base_url`, honoring
  * `<base>`, fragments stripped, non-navigational schemes dropped).
  * Null-PROPAGATING on both children (any null child -> null result;
  * the [[HtmlExpr.extract_links]] wrapper coalesces a null base to ""
  * so only a null text nulls the output). Returns array<string> in
  * first-seen order, distinct.
  */
case class HtmlLinks(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any, b: Any): Any =
    HtmlExpr.linksU8(t.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, b) => s"graft.sources.HtmlExpr.linksU8($t, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HtmlLinks =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "extract_links"
}

/** `extract_anchors(text, base_url)` — link occurrences WITH their
  * anchor text, as array<struct<url:string, anchor:string>> in
  * document order (not deduplicated — anchor frequency is the
  * signal). Same resolution/degradation rules as [[HtmlLinks]].
  */
case class HtmlAnchors(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("url", StringType, nullable = false),
                   StructField("anchor", StringType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(t: Any, b: Any): Any =
    HtmlExpr.anchorsU8(t.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, b) => s"graft.sources.HtmlExpr.anchorsU8($t, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HtmlAnchors =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "extract_anchors"
}

/** `extract_canonical(text, base_url)` — the document's declared
  * canonical URL ([[Html.extractCanonical]]: first usable
  * `<link rel=canonical>`, entity-decoded, base-aware, resolved
  * absolute), or NULL when none parses. The result is genuinely
  * nullable on non-null inputs, so codegen updates isNull from the
  * returned value (defineCodeGen would hand downstream a null value
  * flagged non-null).
  */
case class HtmlCanonical(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(t: Any, b: Any): Any =
    HtmlExpr.canonicalU8(t.asInstanceOf[UTF8String],
                         b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, b) => s"""
      ${ev.value} = graft.sources.HtmlExpr.canonicalU8($t, $b);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HtmlCanonical =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "extract_canonical"
}

/** `extract_main_html(text)` — boilerplate-filtered main content. */
case class HtmlMainExtract(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HtmlExpr.extractMainU8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sources.HtmlExpr.extractMainU8($c)")
  override protected def withNewChildInternal(c: Expression): HtmlMainExtract =
    copy(child = c)
  override def prettyName: String = "extract_main_html"
}
