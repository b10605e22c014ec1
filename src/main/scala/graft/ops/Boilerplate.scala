package graft.ops

import graft.tokenize.Html

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Generic-HTML main-content extraction by text-density / link-density
  * scoring — the boilerplate-strip operator the engine's north star names
  * for non-screenplay HTML payloads (the screenplay paths have their own
  * structural boilerplate filters; this one handles arbitrary pages: nav
  * bars, sidebars, footers vs article text).
  *
  * Method (public): Kohlschütter, Fankhauser, Nejdl — "Boilerplate
  * Detection using Shallow Text Features", WSDM 2010. The DOM is
  * flattened into text BLOCKS at block-level tag boundaries; each block
  * carries `numWords` (whitespace tokens) and `linkDensity` (words inside
  * `<a>` / words). Classification is the published NumWordsRulesClassifier
  * decision tree over (prev, curr, next) blocks:
  *
  *   curr.linkDensity > 1/3                            -> boilerplate
  *   else if prev.linkDensity <= 0.555556:
  *     curr.numWords > 16                              -> content
  *     else next.numWords > 15                         -> content
  *     else prev.numWords > 4                          -> content
  *     else                                            -> boilerplate
  *   else (link-dense previous block):
  *     curr.numWords > 40                              -> content
  *     else next.numWords > 17                         -> content
  *     else                                            -> boilerplate
  *
  * The DOM walk reuses the engine's hand-built HTML tokenizer
  * ([[graft.tokenize.Html]]) — no external parser.
  */
object Boilerplate {

  final case class Block(text: String, numWords: Int, linkedWords: Int) {
    def linkDensity: Double =
      if (numWords == 0) 0.0 else linkedWords.toDouble / numWords
  }

  /** tags that END the current text block (start a new one) */
  private val BlockTags: Set[String] = Set(
    "p", "div", "td", "th", "li", "dd", "dt", "h1", "h2", "h3", "h4", "h5",
    "h6", "blockquote", "pre", "table", "tr", "thead", "tbody", "ul", "ol",
    "dl", "article", "section", "header", "footer", "nav", "aside", "main",
    "figure", "figcaption", "form", "fieldset", "address", "center", "body",
    "html", "br", "hr", "title")

  /** subtrees that contribute no text at all */
  private val SkipTags: Set[String] = Set(
    "script", "style", "head", "noscript", "option", "select", "object",
    "embed", "applet", "iframe", "svg", "template")

  /** flatten the DOM into text blocks with word / linked-word counts */
  def blocks(html: String): Vector[Block] = {
    val root = Html.parse(html)
    val out = Vector.newBuilder[Block]
    val words = ArrayBuffer.empty[String]
    var linked = 0

    def flush(): Unit = {
      if (words.nonEmpty) {
        out += Block(words.mkString(" "), words.length, linked)
        words.clear()
        linked = 0
      }
    }
    def addText(s: String, inAnchor: Boolean): Unit = {
      var i = 0
      val n = s.length
      while (i < n) {
        while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
        val start = i
        while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        if (i > start) {
          words += s.substring(start, i)
          if (inAnchor) linked += 1
        }
      }
    }
    def rec(e: Html.Elem, inAnchor: Boolean): Unit = {
      e.children.foreach {
        case t: Html.Text => addText(t.data, inAnchor) // data is entity-decoded by the tokenizer
        case c: Html.Elem =>
          val name = c.name
          if (!SkipTags.contains(name)) {
            if (BlockTags.contains(name)) {
              flush()
              rec(c, inAnchor)
              flush()
            } else rec(c, inAnchor || name == "a")
          }
        case _ => ()
      }
    }
    rec(root, inAnchor = false)
    flush()
    out.result()
  }

  private val Empty = Block("", 0, 0)

  /** the published decision tree over (prev, curr, next) */
  def isContent(prev: Block, curr: Block, next: Block): Boolean =
    if (curr.linkDensity > 0.333333) false
    else if (prev.linkDensity <= 0.555556) {
      if (curr.numWords > 16) true
      else if (next.numWords > 15) true
      else prev.numWords > 4
    } else {
      if (curr.numWords > 40) true
      else next.numWords > 17
    }

  /** content blocks of the page, in order */
  def mainContent(html: String): Vector[String] = {
    val bs = blocks(html)
    val n = bs.length
    val keep = Vector.newBuilder[String]
    var i = 0
    while (i < n) {
      val prev = if (i > 0) bs(i - 1) else Empty
      val next = if (i + 1 < n) bs(i + 1) else Empty
      if (isContent(prev, bs(i), next)) keep += bs(i).text
      i += 1
    }
    keep.result()
  }

  /** Column entry: `html_main_content($"text")` -> array<string>. Total
    * over rogue input (tokenizer is error-tolerant; a pathological payload
    * yields an empty array, never a task failure).
    */
  def htmlMainContent(c: Column): Column =
    Bridge.column(HtmlMainContentExpr(Bridge.expression(c)))
}

case class HtmlMainContentExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "html_main_content"
  override protected def nullSafeEval(input: Any): Any = {
    val content =
      try Boilerplate.mainContent(input.asInstanceOf[UTF8String].toString)
      catch {
        case _: StackOverflowError | scala.util.control.NonFatal(_) =>
          Vector.empty[String]
      }
    new GenericArrayData(content.map(UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): HtmlMainContentExpr =
    copy(child = c)
}
