package graft.pdfxml

import graft.model.{ScriptLine, Span}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Document-level aggregations run before the JSON sink:
  * revision inference (reference Parser.php:239-486) and line-number side
  * voting (Parser.php:193-237).
  */
object Revisions {

  final case class Revision(name: String, color: String)

  private final case class Rev(
      var name: String, var color: String, var colorsListId: Int, revId: Int) {
    var weight: Int = -1
  }
  private final case class WEntry(revision: Int, isKey: Int, pageFoundOn: Int)

  /** parse_revisions: two-pass weighted revision inference. Key pages
    * (fewer than 3 colors) bind (header name, color) pairs; remaining colors
    * create UNKNOWN revisions; per-object color spans are rewritten into
    * revision-weight spans.
    */
  def parseRevisions(objects: Vector[ScriptLine], colors: ColorsList): (Vector[ScriptLine], Vector[Revision]) = {
    if (objects.isEmpty) return (objects, Vector.empty)

    // page segmentation by page_num transitions (Parser.php:250-275)
    val pageOfObj = new Array[Int](objects.length)
    val colorsOnPage = ArrayBuffer(mutable.LinkedHashMap.empty[Int, Int])
    var pageNum = 0
    var lastPageNum = objects.head.pageNum
    objects.zipWithIndex.foreach { case (o, k) =>
      if (k > 0 && o.pageNum != lastPageNum) {
        pageNum += 1
        lastPageNum = o.pageNum
        colorsOnPage += mutable.LinkedHashMap.empty[Int, Int]
      }
      pageOfObj(k) = pageNum
      o.colors.keys.foreach { id =>
        colorsOnPage(pageNum)(id) = colorsOnPage(pageNum).getOrElse(id, 0) + 1
      }
    }

    val revisions = ArrayBuffer.empty[Rev]
    val weights = ArrayBuffer.empty[WEntry] // SplDoublyLinkedList by index
    val revisionsOnPage = mutable.LinkedHashMap.empty[Int, ArrayBuffer[Int]] // page -> REV_IDs

    // first pass: key pages (Parser.php:286-306)
    colors.keyPairs.foreach { case (pNum, (name, colorHex, colorId)) =>
      val found = revisions.exists(r => r.color == colorHex && r.name == name)
      if (!found) {
        val rev = Rev(name, colorHex, colorId, revisions.length)
        revisions += rev
        weights += WEntry(rev.revId, 1, pNum)
        revisionsOnPage.getOrElseUpdate(pNum, ArrayBuffer.empty) += rev.revId
      }
    }

    // second pass over every page (Parser.php:311-405)
    colorsOnPage.zipWithIndex.foreach { case (pageColors, pNum) =>
      var highest: Option[Int] = None
      var second: Option[Int] = None
      var foundExistingRev = false
      val handled = mutable.HashMap.empty[Int, Int]
      def colorFound(id: Int): Boolean = {
        if (handled.contains(id)) { handled(id) += 1; true }
        else { handled(id) = 1; false }
      }
      val headerName = colors.headerName(pNum)
      var mysteryKey: Option[Int] = None

      // match the header color (break 2 on first hit)
      var broke = false
      val colorIds = pageColors.keys.toVector
      var ci = 0
      while (ci < colorIds.length && !broke) {
        val colorId = colorIds(ci)
        var wi = 0
        while (wi < weights.length && !broke) {
          val cur = revisions(weights(wi).revision)
          if (cur.name == headerName && cur.colorsListId == colorId) {
            highest = Some(wi)
            if (weights(wi).pageFoundOn != pNum)
              revisionsOnPage.getOrElseUpdate(pNum, ArrayBuffer.empty) += cur.revId
            foundExistingRev = true
            colorFound(cur.colorsListId)
            broke = true
          }
          wi += 1
        }
        ci += 1
      }
      if (!foundExistingRev && pageColors.nonEmpty) {
        val rev = Rev(headerName, "UNKNOWN", -1, revisions.length)
        revisions += rev
        weights += WEntry(rev.revId, 0, pNum)
        revisionsOnPage.getOrElseUpdate(pNum, ArrayBuffer.empty) += rev.revId
        highest = Some(weights.length - 1)
        mysteryKey = Some(rev.revId)
      }
      // other colors with known revisions, in weight order (:353-375)
      colorIds.foreach { colorId =>
        var wi = 0
        while (wi < weights.length) {
          val cur = revisions(weights(wi).revision)
          if (cur.colorsListId == colorId) {
            if (!colorFound(colorId)) {
              revisionsOnPage.getOrElseUpdate(pNum, ArrayBuffer.empty) += cur.revId
              second match {
                case None                 => second = Some(wi)
                case Some(s) if wi < s    => second = Some(wi)
                case _                    =>
              }
            }
          }
          wi += 1
        }
      }
      // bump the header revision's weight (:377-382)
      (highest, second) match {
        case (Some(h), Some(s)) =>
          val hold = weights(h)
          weights.remove(h)
          weights.insert(s, hold)
        case _ =>
      }
      // unknown colors (:385-404)
      colorIds.foreach { colorId =>
        if (!colorFound(colorId)) {
          val colorHex = colors.getColorHex(colorId)
          mysteryKey match {
            case Some(mk) =>
              revisions(mk).color = colorHex
              revisions(mk).colorsListId = colorId
              mysteryKey = None
            case None =>
              val rev = Rev("UNKNOWN", colorHex, colorId, revisions.length)
              revisions += rev
              weights += WEntry(rev.revId, 0, pNum)
              revisionsOnPage.getOrElseUpdate(pNum, ArrayBuffer.empty) += rev.revId
          }
        }
      }
    }

    // weights -> reversed weight numbers (:409-417)
    val byWeight = mutable.TreeMap.empty[Int, Rev]
    weights.zipWithIndex.foreach { case (w, key) =>
      val reversed = revisions.length - key - 1
      revisions(w.revision).weight = reversed
      byWeight(reversed) = revisions(w.revision)
    }

    // page+color -> revision weight (:436-446)
    val pageColorToWeight = mutable.HashMap.empty[(Int, Int), Int]
    revisionsOnPage.foreach { case (pNum, revIds) =>
      revIds.foreach { revId =>
        val updatedColorsListId = revisions(revId).colorsListId
        pageColorToWeight((pNum, updatedColorsListId)) = revisions(revId).weight
      }
    }

    // rewrite per-object color spans into revision spans (:451-465)
    val rewritten = objects.zipWithIndex.map { case (o, k) =>
      if (o.colors.isEmpty) o
      else {
        var revs = o.revisions
        o.colors.foreach { case (colorId, spans) =>
          spans.foreach { sp =>
            if (sp.start != sp.end) {
              pageColorToWeight.get((pageOfObj(k), colorId)).foreach { w =>
                revs = revs.updated(w, revs.getOrElse(w, Vector.empty) :+ Span(sp.start, sp.end))
              }
            }
          }
        }
        if (revs eq o.revisions) o else o.copy(revisions = revs)
      }
    }

    val out = byWeight.values.map { r =>
      Revision(if (r.name == "") "UNKNOWN" else r.name, r.color)
    }.toVector
    (rewritten, out)
  }

  /** parse_lineNumbers (Parser.php:193-237): per JSON type, count objects
    * and left/right number captures; a side present on more than half the
    * lines of a type wins. Clears the consumed left/right flags.
    */
  def parseLineNumbers(objects: Vector[ScriptLine]): (Vector[ScriptLine], Map[String, (Boolean, Boolean)]) = {
    val counts = mutable.LinkedHashMap.empty[String, (Int, Int, Int)] // count, left, right
    val cleared = objects.map { o =>
      val t = o.typeJson
      var (c, l, r) = counts.getOrElse(t, (0, 0, 0))
      c += 1
      var num = o.numberObject
      if (num.left) { l += 1; num = num.copy(left = false) }
      if (num.right) { r += 1; num = num.copy(right = false) }
      counts(t) = (c, l, r)
      if (num eq o.numberObject) o else o.copy(numberObject = num)
    }
    val table = counts.iterator.flatMap { case (t, (c, l, r)) =>
      val half = c / 2
      val leftWin = half < l
      val rightWin = half < r
      if (leftWin || rightWin) Some(t -> (leftWin, rightWin)) else None
    }.toMap
    (cleared, table)
  }
}
