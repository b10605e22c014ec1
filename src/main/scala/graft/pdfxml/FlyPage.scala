package graft.pdfxml

import graft.model.{Php, ScriptLine, SpanAlgebra}

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** classify_fly_page_objects (reference ParseText.php:1796-1870):
  * first non-blank piece -> Title; a standalone "by"/"...by" line marks the
  * next piece as Author; an inline "by NAME" splits the piece in two with
  * span-splitting; otherwise the second non-blank line becomes the Author.
  */
object FlyPage {
  private val byEnd = Pattern.compile("(^| )[Bb][Yy]$")
  private val byMid = Pattern.compile("(^| )[Bb][Yy] ")

  def classify(objects0: ArrayBuffer[ScriptLine]): ArrayBuffer[ScriptLine] = {
    val objects = objects0
    var foundTitle = false
    var foundAuthor = false
    var nextIsAuthor = false
    var possibleAuthorIndex = -1
    var i = 0
    while (i < objects.length) {
      val text = objects(i).text
      if (text != "") {
        if (nextIsAuthor) {
          objects(i) = objects(i).copy(kind = "Author")
          foundAuthor = true
          nextIsAuthor = false
        }
        if (!foundTitle) {
          objects(i) = objects(i).copy(kind = "Title")
          foundTitle = true
        } else {
          if (possibleAuthorIndex == -1) possibleAuthorIndex = i
          if (!foundAuthor) {
            if (byEnd.matcher(text).find()) {
              nextIsAuthor = true
            } else if (byMid.matcher(objects(i).text).find()) {
              // split the "... by NAME" line in two (:1844-1862); offsets are
              // byte-based in the reference (strlen/stripos) == code units
              // here for the ASCII payloads this path sees
              val content = objects(i).text
              val byPos = content.toLowerCase.indexOf("by ")
              if (byPos >= 0) {
                val originalLength = content.length
                val authorName = content.substring(byPos + 3)
                val colors = objects(i).colors
                val ta = objects(i).textAttributes
                // both halves are fresh ScriptObjects in the reference, so
                // the alignment attribute is dropped and content re-cleaned
                val o = objects(i)
                objects(i) = o.copy(
                  text = Php.compressSpaces(Php.stripColorFormatting(content.substring(0, byPos + 2))),
                  colors = SpanAlgebra.split(colors, 0, byPos + 2),
                  textAttributes = SpanAlgebra.split(ta, 0, byPos + 2),
                  alignment = "")
                objects.insert(i + 1, o.copy(
                  kind = "Author",
                  text = Php.compressSpaces(Php.stripColorFormatting(authorName)),
                  colors = SpanAlgebra.split(colors, byPos + 3, originalLength),
                  textAttributes = SpanAlgebra.split(ta, byPos + 3, originalLength),
                  numberObject = graft.model.NumberObj(),
                  alignment = ""))
                foundAuthor = true
              }
            }
          }
        }
      }
      i += 1
    }
    if (!foundAuthor && possibleAuthorIndex != -1)
      objects(possibleAuthorIndex) = objects(possibleAuthorIndex).copy(kind = "Author")
    objects
  }
}
