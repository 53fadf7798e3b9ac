package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions exposing the extraction kernel to SQL —
  * the optional SQL-surface parity layer from SURVEY.md §4.2 ("Expression
  * pdf_extract(html) returning the struct, for SQL"). Codegen'd via a
  * static-call defineCodeGen, so they stay inside whole-stage codegen
  * rather than falling back to interpreted eval (and they are NOT UDFs:
  * null handling, eval and codegen follow Expression semantics).
  *
  *   pdf_text(binary)            -> binary   extracted text (byte-identical gate)
  *   html_text(binary)           -> binary   boilerplate-stripped main content
  *   graft_text(url, binary)     -> binary   payload-routed (the pipeline rule)
  */
object ExtractKernel {
  def pdfText(payload: Array[Byte]): Array[Byte] =
    if (payload == null) null else graft.pdf.PdfExtract.parse(payload).contents

  def htmlText(payload: Array[Byte]): Array[Byte] =
    if (payload == null) null else graft.html.HtmlExtract.extractBytes(payload)

  def graftText(url: UTF8String, payload: Array[Byte]): Array[Byte] =
    if (payload == null) null
    else if (graft.operators.ExtractPipeline.isPdf(if (url == null) "" else url.toString, payload))
      pdfText(payload)
    else htmlText(payload)
}

case class PdfText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pdf_text requires binary input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    ExtractKernel.pdfText(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractKernel.pdfText($c)")
  override protected def withNewChildInternal(newChild: Expression): PdfText = copy(child = newChild)
  override def prettyName: String = "pdf_text"
}

case class HtmlText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"html_text requires binary input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    ExtractKernel.htmlText(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractKernel.htmlText($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlText = copy(child = newChild)
  override def prettyName: String = "html_text"
}

case class GraftText(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_text requires (string url, binary payload), got (${left.dataType.sql}, ${right.dataType.sql})")
  override protected def nullSafeEval(url: Any, payload: Any): Any =
    ExtractKernel.graftText(url.asInstanceOf[UTF8String], payload.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (u, p) => s"graft.functions.ExtractKernel.graftText($u, $p)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GraftText =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_text"
}

/** Registration: either as session extensions
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) or imperatively
  * on an existing session via `GraftFunctions.register(spark)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("pdf_text"),
      new ExpressionInfo(classOf[PdfText].getName, "pdf_text"),
      (args: Seq[Expression]) => PdfText(args.head)))
    ext.injectFunction((FunctionIdentifier("html_text"),
      new ExpressionInfo(classOf[HtmlText].getName, "html_text"),
      (args: Seq[Expression]) => HtmlText(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_text"),
      new ExpressionInfo(classOf[GraftText].getName, "graft_text"),
      (args: Seq[Expression]) => GraftText(args(0), args(1))))
  }
}

object GraftFunctions {
  private def arity(name: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    require(args.length == n,
      s"$name expects $n argument(s) (${if (n == 1) "binary payload" else "string url, binary payload"}), got ${args.length}")
    args
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("pdf_text",
      args => PdfText(arity("pdf_text", 1)(args).head), "built-in")
    reg.createOrReplaceTempFunction("html_text",
      args => HtmlText(arity("html_text", 1)(args).head), "built-in")
    reg.createOrReplaceTempFunction("graft_text",
      args => { val a = arity("graft_text", 2)(args); GraftText(a(0), a(1)) }, "built-in")
  }
}
