package graft.shakespeare

import graft.model.{Php, ScriptLine}
import graft.tokenize.Html

import scala.collection.mutable.ArrayBuffer

/** The Shakespeare-HTML extraction path.
  *
  * Semantics ported from reference src/parser/analyzer/ParseShakespeare.php:
  * 8-122 (see SURVEY.md §2.1 S3 / §3.3): a DOM walk over body children
  * mapping <a name=speechN> -> Character (consecutive speakers merged with
  * " & "), <blockquote><a> -> Dialog (leading "[...]" split into Paren,
  * "EPILOGUE" -> Slugline), <blockquote><p> -> Action (or Paren for
  * "To ..."/"Aside"), <h3> -> Act ("ACT..." prefix) else Slugline, plus a
  * synthetic title page (17 blanks, Title, 3 blanks, centered "By",
  * 2 blanks, Author, 24 blanks — ParseShakespeare.php:40-48).
  */
object Shakespeare {

  /** ParseShakespeare.php:114-122 — title page lines get page 1, body page 2.
    * ScriptObject construction applies strip_color_formatting; the
    * compress_spaces step is a no-op outside PDF mode (Objects.php:3-10).
    */
  private def mk(kind: String, content: String, titlePage: Boolean = false): ScriptLine = {
    val page = if (titlePage) 1 else 2
    ScriptLine(
      kind = if (ScriptLine.ValidTypes(kind)) kind else "Text",
      text = Php.stripColorFormatting(content),
      pageNum = page,
      givenPageNum = page.toString,
      fontSize = 16)
  }

  private def norm(nodeValue: String): String =
    Php.collapseBlankCrLf(Php.trim(nodeValue))

  def parse(html: String): Vector[ScriptLine] = {
    val doc = Html.parse(html)
    // 512: big enough that real plays double only a few times, small
    // enough that short synthetic docs don't pay a 4096-slot array each
    // (the old pre-size was ~30% of this parse's allocation, round-5 JFR)
    val out = new ArrayBuffer[ScriptLine](512)

    def addBlanks(n: Int): Unit =
      for (_ <- 0 until n) out += mk("Text", "", titlePage = true)

    // Title from <head><title>, dropping the trailing ": Entire Play"
    // (byte substr at ParseShakespeare.php:36 — drops the last 13 chars
    // unconditionally).
    var title = ""
    doc.findFirst("head").foreach { head =>
      head.elementChildren.foreach { child =>
        if (child.name == "title") {
          val content = norm(child.nodeValue)
          title = content.substring(0, math.max(0, content.length - ": Entire Play".length))
        }
      }
    }
    val author = "William Shakespeare"
    addBlanks(17)
    out += mk("Title", title, titlePage = true)
    addBlanks(3)
    out += mk("Text", "By", titlePage = true).copy(alignment = "center")
    addBlanks(2)
    out += mk("Author", author, titlePage = true)
    addBlanks(24)

    doc.findFirst("body").foreach { body =>
      body.elementChildren.foreach { child =>
        child.name match {
          case "a" =>
            val name = child.attr("name").getOrElse("")
            val content = norm(child.nodeValue)
            if (name.startsWith("speech")) {
              // Consecutive Character objects merge into "A & B"
              // (ParseShakespeare.php:59-64).
              if (out.nonEmpty && out.last.kind == "Character") {
                val last = out.last
                out(out.length - 1) = last.copy(text = last.text + " & " + content)
              } else out += mk("Character", content)
            }
          case "blockquote" =>
            child.elementChildren.foreach { c2 =>
              c2.name match {
                case "a" =>
                  var content = norm(c2.nodeValue)
                  if (content == "EPILOGUE") {
                    // formatting-bug hack (ParseShakespeare.php:75-77)
                    out += mk("Slugline", content)
                  } else {
                    if (content.startsWith("[")) {
                      val endParen = content.indexOf("]")
                      if (endParen >= 0) {
                        val parenContent = "(" + content.substring(1, endParen) + ")"
                        content = content.substring(endParen + 1)
                        out += mk("Paren", parenContent)
                      }
                    }
                    if (content != "") out += mk("Dialog", content)
                  }
                case "p" =>
                  val content = norm(c2.nodeValue)
                  if (content.startsWith("To ") || content == "Aside")
                    out += mk("Paren", "(" + content + ")")
                  else
                    out += mk("Action", content)
                case _ =>
              }
            }
          case "h3" =>
            val content = norm(child.nodeValue)
            if (content.startsWith("ACT")) out += mk("Act", content)
            else out += mk("Slugline", content)
          case _ =>
        }
      }
    }

    // Parser.php:92-107 — title/author fixups: strip chr(1..8) style
    // markers; blank the Final Draft placeholder title/author.
    out.zipWithIndex.foreach { case (o, idx) =>
      if (o.kind == "Title" || o.kind == "Author") {
        var content = o.text.filter(c => c < 1 || c > 8)
        if (o.kind == "Title" && content.equalsIgnoreCase("Script Title")) content = ""
        if (o.kind == "Author" && content.equalsIgnoreCase("Name of First Writer")) content = ""
        out(idx) = o.copy(text = content)
      }
    }

    out.toVector
  }
}
