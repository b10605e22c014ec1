package graft.spark

import graft.model.ScriptLine
import graft.pdfxml.PdfXml
import graft.shakespeare.Shakespeare

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-turn extraction result, as plain Scala (for Dataset users). */
final case class ExtractedLine(
    kind: String, `type`: String, text: String, pageNum: Int,
    givenPageNum: String, fontSize: Int, alignment: String, column: Int,
    numLines: Int, hasDual: Boolean, isDual: Boolean,
    attrs: Seq[(String, Int, Int)], revs: Seq[(Int, Int, Int)])

final case class ExtractedTurn(
    format: String,
    lines: Seq[ExtractedLine],
    pageSize: String,
    numPages: Int,
    sceneContinuedTop: Boolean,
    sceneContinuedBottom: Boolean,
    sceneContinuedNumber: Boolean,
    revisions: Seq[(String, String)],
    bytes: Int)

/** `extract_turn(text)` — the whole per-turn extraction pipeline
  * (tokenize -> layout -> classify -> aggregate; SURVEY.md §2.12) as one
  * custom Catalyst Expression.
  *
  * A native Expression (not a Scala UDF) so the planner sees a null-safe,
  * non-deterministic-free scalar: it composes with column pruning and
  * predicate pushdown, and evaluates inside whole-stage-codegen'd plans via
  * CodegenFallback (the per-turn work is a large opaque kernel; codegen of
  * the call site, not the kernel, is what matters at 100 TB — the
  * surrounding project/filter stages stay fused).
  */
object ExtractTurn {

  val lineSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("type", StringType, nullable = false), // JSON-facing rename
    StructField("text", StringType, nullable = false),
    StructField("page_num", IntegerType, nullable = false),
    StructField("given_page_num", StringType, nullable = false),
    StructField("font_size", IntegerType, nullable = false),
    StructField("alignment", StringType, nullable = false),
    StructField("column", IntegerType, nullable = false),
    StructField("num_lines", IntegerType, nullable = false),
    StructField("has_dual", BooleanType, nullable = false),
    StructField("is_dual", BooleanType, nullable = false),
    StructField("attrs", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("start", IntegerType, nullable = false),
      StructField("end", IntegerType, nullable = false))), containsNull = false), nullable = false),
    StructField("revs", ArrayType(StructType(Seq(
      StructField("weight", IntegerType, nullable = false),
      StructField("start", IntegerType, nullable = false),
      StructField("end", IntegerType, nullable = false))), containsNull = false), nullable = false)
  ))

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("lines", ArrayType(lineSchema, containsNull = false), nullable = false),
    StructField("page_size", StringType, nullable = false),
    StructField("num_pages", IntegerType, nullable = false),
    StructField("scene_continued_top", BooleanType, nullable = false),
    StructField("scene_continued_bottom", BooleanType, nullable = false),
    StructField("scene_continued_number", BooleanType, nullable = false),
    StructField("revisions", ArrayType(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("color", StringType, nullable = false))), containsNull = false), nullable = false),
    StructField("bytes", IntegerType, nullable = false)
  ))

  /** payload sniffing: the transcript `text` column carries either
    * pdftohtml-style XML or Shakespeare-style HTML (BASELINE.json
    * input_hint); dispatch mirrors the reference's extension dispatch
    * (Parser.php:66-88) without needing a side channel.
    */
  def sniffFormat(text: String): String = {
    val head = text.substring(0, math.min(text.length, 4096))
    if (head.contains("<pdf2xml")) "pdfxml"
    else {
      val lower = head.toLowerCase
      if (lower.contains("<html") || lower.contains("<!doctype html") ||
          lower.contains("name=speech")) "shakespeare"
      else if (head.contains("<page")) "pdfxml"
      else "unknown"
    }
  }

  /** Oversized-payload guard: the reference rejects uploads over 20 MB
    * (convert_script.controller.ts:96-98); at 10^12-turn scale a rogue
    * multi-hundred-MB payload must not stall an executor task. Such turns
    * extract to format "oversized" with no lines (counted, not crashed).
    */
  val MaxPayloadBytes: Int = 20 * 1024 * 1024

  /** plain-Scala extraction (used by the Expression and by tests).
    * Total over arbitrary input: a payload that still manages to break the
    * kernel (e.g. a deeply nested tag bomb overflowing the stack) yields a
    * format="error" turn instead of failing the task — at 10^12 turns one
    * rogue payload must be counted, not crash the job.
    */
  def extract(text: String): ExtractedTurn =
    try extractUnsafe(text)
    catch {
      case _: StackOverflowError | scala.util.control.NonFatal(_) =>
        ExtractedTurn("error", Seq.empty, "Letter", 0,
          sceneContinuedTop = false, sceneContinuedBottom = false,
          sceneContinuedNumber = false, Seq.empty, text.length)
    }

  private def extractUnsafe(text: String): ExtractedTurn = {
    if (text.length > MaxPayloadBytes)
      return ExtractedTurn("oversized", Seq.empty, "Letter", 0,
        sceneContinuedTop = false, sceneContinuedBottom = false,
        sceneContinuedNumber = false, Seq.empty, text.length)
    val format = sniffFormat(text)
    format match {
      case "shakespeare" =>
        val lines = Shakespeare.parse(text)
        ExtractedTurn(format, lines.map(toLine(_, 0)), "Letter",
          lines.lastOption.map(_.pageNum).getOrElse(0),
          sceneContinuedTop = false, sceneContinuedBottom = false,
          sceneContinuedNumber = false, Seq.empty, text.length)
      case "pdfxml" =>
        val r = PdfXml.parse(text)
        // dual-dialog column tracking (WriteOutput.php:282-302)
        var currentColumn = 0
        val lines = r.objects.map { o =>
          o.kind match {
            case "Dialog" | "Paren" => ()
            case "Character" =>
              currentColumn = 0
              if (o.hasDualLine) currentColumn = 1
              if (o.isDualLine) currentColumn = 2
            case _ => currentColumn = 0
          }
          toLine(o, currentColumn)
        }
        ExtractedTurn(format, lines, r.pageSize, r.numPages,
          r.sceneContinuedTop, r.sceneContinuedBottom, r.sceneContinuedNumber,
          r.revisions.map(rev => (rev.name, rev.color)), text.length)
      case _ =>
        ExtractedTurn(format, Seq.empty, "Letter", 0,
          sceneContinuedTop = false, sceneContinuedBottom = false,
          sceneContinuedNumber = false, Seq.empty, text.length)
    }
  }

  private def toLine(o: ScriptLine, column: Int): ExtractedLine = {
    val attrs =
      if (o.textAttributes.isEmpty) Nil
      else o.textAttributes.toSeq.sortBy(_._1).flatMap { case (k, spans) =>
        spans.map(sp => (k, sp.start, sp.end))
      }
    val revs =
      if (o.revisions.isEmpty) Nil
      else o.revisions.toSeq.sortBy(_._1).flatMap { case (w, spans) =>
        spans.map(sp => (w, sp.start, sp.end))
      }
    ExtractedLine(o.kind, o.typeJson, o.text, o.pageNum, o.givenPageNum,
      o.fontSize, o.alignment, column, o.numLines, o.hasDualLine, o.isDualLine,
      attrs, revs)
  }

  // interned UTF8String constants: kind/type/alignment/format/page-size
  // values come from small closed sets, so the row conversion shares one
  // immutable instance instead of re-encoding per line (~5 allocations +
  // byte copies saved per line, ~350 per typical turn)
  private val utf8Cache: java.util.concurrent.ConcurrentHashMap[String, UTF8String] = {
    val m = new java.util.concurrent.ConcurrentHashMap[String, UTF8String]()
    (ScriptLine.ValidTypes.toSeq ++ ScriptLine.ValidTypes.toSeq.map(ScriptLine.typeJson) ++
      Seq("", "left", "center", "right", "pdfxml", "shakespeare", "unknown",
        "oversized", "error", "Letter", "A4", "b", "i")).foreach { s =>
      m.put(s, UTF8String.fromString(s))
    }
    m
  }
  @inline private def utf8Const(s: String): UTF8String = {
    val c = utf8Cache.get(s)
    if (c != null) c else UTF8String.fromString(s)
  }
  private val emptyArray = new GenericArrayData(new Array[Any](0))

  private[spark] def toInternal(t: ExtractedTurn): InternalRow = {
    val lineRows = t.lines.map { l =>
      InternalRow(
        utf8Const(l.kind), utf8Const(l.`type`),
        UTF8String.fromString(l.text), l.pageNum,
        UTF8String.fromString(l.givenPageNum), l.fontSize,
        utf8Const(l.alignment), l.column, l.numLines,
        l.hasDual, l.isDual,
        if (l.attrs.isEmpty) emptyArray
        else new GenericArrayData(l.attrs.map { case (k, s, e) =>
          InternalRow(utf8Const(k), s, e) }.toArray[Any]),
        if (l.revs.isEmpty) emptyArray
        else new GenericArrayData(l.revs.map { case (w, s, e) =>
          InternalRow(w, s, e) }.toArray[Any]))
    }
    InternalRow(
      utf8Const(t.format),
      new GenericArrayData(lineRows.toArray[Any]),
      utf8Const(t.pageSize),
      t.numPages,
      t.sceneContinuedTop, t.sceneContinuedBottom, t.sceneContinuedNumber,
      if (t.revisions.isEmpty) emptyArray
      else new GenericArrayData(t.revisions.map { case (n, c) =>
        InternalRow(UTF8String.fromString(n), UTF8String.fromString(c)) }.toArray[Any]),
      t.bytes)
  }

  /** Column-API entry: `extract_turn($"text")` */
  def apply(c: Column): Column =
    Bridge.column(ExtractTurnExpr(Bridge.expression(c)))

  /** SQL registration: `SELECT extract_turn(text) FROM ...` */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_turn", exprs => ExtractTurnExpr(exprs.head), "scala_udf")
}

case class ExtractTurnExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ExtractTurn.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "extract_turn"

  override protected def nullSafeEval(input: Any): Any =
    ExtractTurn.toInternal(ExtractTurn.extract(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): ExtractTurnExpr =
    copy(child = newChild)
}
