package graft.pdfxml

import graft.model.{NumberObj, Php, Span}
import graft.pdfxml.XmlTok.XNode

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Layout constants (ParseText.php:3-6). */
object Consts {
  val Inch = 72
  val MaxOffsetSameLine = 4
  /** Upper bound for the BitSet fast-path in the y-snap: a TOP beyond this
    * (no real pdftohtml page is 64k px tall) routes to the O(1)-memory map
    * lookup instead of growing the BitSet to O(top) words. */
  val MaxSaneTop = 1 << 16
  val FontConversionRate: Double = 4.0 / 3.0
  val DefaultCharWidth = 7
  /** watermark strings dropped from headers/footers (ParseText.php:8-10) */
  val AutoHeaderFooterText: Set[String] = Set(
    "Created using Celtx",
    "Written with Arc Studio: www.arcstudiopro.com",
    "(Printed with the demonstration version of Fade In)")
}

/** A reassembled reading-order line (reference LineObject,
  * ParseText.php:1922-1936).
  */
final class LineObj(
    var text: String,
    val x: Int,
    val width: Int,
    val givenPageNum: String,
    val colors: Map[Int, Vector[Span]],
    val fontSize: Int,
    val textAttributes: Map[String, Vector[Span]],
    val numberObject: NumberObj)

/** Per-document font-color registry (reference Colors_List,
  * ParseText.php:691-989): font ids sharing a hex color collapse to one
  * color id; color #000000 is the "Normal Text" special case; per-page
  * header names accumulate as possible/key revision names.
  */
final class ColorsList {
  final class ColorEntry(var color: String) {
    var name: String = ""
    var specialName: Option[String] = None
    val possibleNames: mutable.LinkedHashMap[String, Int] = mutable.LinkedHashMap.empty
    /** page -> name (handle_key_name, ParseText.php:831-845) */
    val keyNames: mutable.LinkedHashMap[Int, String] = mutable.LinkedHashMap.empty
  }
  private val translation = mutable.HashMap.empty[String, Int]
  val entries: ArrayBuffer[ColorEntry] = ArrayBuffer.empty
  private val headerNameByPage = mutable.HashMap.empty[Int, String]

  /** __construct/add_colors (ParseText.php:698-771) */
  def addColors(fontObjects: Seq[XNode]): Unit = {
    fontObjects.foreach { fo =>
      val color = fo.attrOrElse("COLOR", "")
      val fontId = fo.attrOrElse("ID", "")
      val existing = entries.indexWhere(_.color == color)
      if (existing >= 0) translation(fontId) = existing
      else {
        val e = new ColorEntry(color)
        if (color == "#000000") e.specialName = Some("Normal Text")
        entries += e
        translation(fontId) = entries.length - 1
      }
    }
  }

  def getColorId(fontId: String): Int = translation.getOrElse(fontId, 0)
  def specialCase(id: Int): Boolean =
    id >= 0 && id < entries.length && entries(id).specialName.isDefined
  def getColorHex(id: Int): String =
    if (id >= 0 && id < entries.length) entries(id).color else "Hex Code"

  /** update_IDs_with_name (ParseText.php:923-968): pages with fewer than 3
    * distinct colors bind (page -> header name) as key names on each
    * non-special color; every page adds the name as a possible name.
    */
  def updateIdsWithName(ids: Seq[Int], possibleName: String, pageNum: Int): Unit = {
    // ids referencing no registered color are ignored, like the
    // reference's "ID not available" print-and-continue branches
    // (ParseText.php:827-829, 842-844)
    def known(id: Int): Boolean = id >= 0 && id < entries.length
    if (ids.length < 3) {
      ids.foreach { id =>
        if (known(id) && !specialCase(id)) {
          // handle_key_name: first write per page wins for that color
          val e = entries(id)
          if (!e.keyNames.contains(pageNum)) e.keyNames(pageNum) = possibleName
        }
      }
    }
    ids.foreach { id =>
      if (known(id) && !specialCase(id)) {
        val e = entries(id)
        e.possibleNames(possibleName) = e.possibleNames.getOrElse(possibleName, 0) + 1
      }
    }
  }

  def setHeaderName(pageNum: Int, name: String): Unit = headerNameByPage(pageNum) = name
  def headerName(pageNum: Int): String = headerNameByPage.getOrElse(pageNum, "")

  /** get_key_pairs (ParseText.php:846-861): page -> (NAME, COLOR, id);
    * later color ids overwrite earlier ones for the same page.
    */
  def keyPairs: mutable.LinkedHashMap[Int, (String, String, Int)] = {
    val out = mutable.LinkedHashMap.empty[Int, (String, String, Int)]
    entries.zipWithIndex.foreach { case (e, id) =>
      e.keyNames.foreach { case (page, name) =>
        out(page) = (name, e.color, id)
      }
    }
    out
  }
}

/** Document-global flags mutated during layout (ParseText.php:11-13). */
final class DocFlags {
  var sceneContinuedNumber = false
  var sceneContinuedTop = false
  var sceneContinuedBottom = false
  /** SERIES_TIMER global (ParseText.php:1899) */
  var seriesTimer = 0
}

/** One header/footer fragment retained for the JSON sink
  * (WriteOutput.php:202-239 consumes value/LEFT/WIDTH).
  */
final case class HfFrag(value: String, left: Int, width: Int)

/** Page-level XML -> LineObj conversion: the y-cluster (G1), x-sort +
  * gap-merge (G2), blank-line synthesis (G3), CONTINUED / header / footer
  * banding (F2-F4) and line-number capture (F5) from
  * ParseText.php:266-591 (processPageXmlObject).
  */
object Layout {

  private val reContinuedExact = java.util.regex.Pattern.compile("^CONTINUED:$")
  private val reContinuedNum = java.util.regex.Pattern.compile("^CONTINUED: ?(?:\\([\\d]+[)])?$")
  private val reContinuedBottom = java.util.regex.Pattern.compile("^\\(CONTINUED\\)$")
  private val rePageNum = java.util.regex.Pattern.compile("^\\d+[a-zA-Z\\. ]?[a-zA-Z\\. ]?[a-zA-Z\\. ]?[a-zA-Z\\. ]?$")

  final class PageResult {
    val lineObjects = new ArrayBuffer[LineObj]
    var headerFrags: Vector[HfFrag] = Vector.empty
    var footerFrags: Vector[HfFrag] = Vector.empty
    var pageSize: String = "Letter"
  }

  private def parseAttrInt(n: XNode, key: String): Int = {
    val v = n.attrOrElse(key, "0").trim
    try v.toInt catch {
      case _: NumberFormatException =>
        try v.toDouble.toInt catch { case _: NumberFormatException => 0 }
    }
  }

  private[pdfxml] def attrInt(n: XNode, key: String): Int = key match {
    case "TOP" =>
      if (n.topI == Int.MinValue) n.topI = parseAttrInt(n, key)
      n.topI
    case "LEFT" =>
      if (n.leftI == Int.MinValue) n.leftI = parseAttrInt(n, key)
      n.leftI
    case "WIDTH" =>
      if (n.widthI == Int.MinValue) n.widthI = parseAttrInt(n, key)
      n.widthI
    case "HEIGHT" =>
      if (n.heightI == Int.MinValue) n.heightI = parseAttrInt(n, key)
      n.heightI
    case _ => parseAttrInt(n, key)
  }

  /** A fragment in flight through the banding passes: `key` is the probed
    * unique left key (ordering), `value` the possibly rewritten text; the
    * LEFT/WIDTH attributes stay those of the XML node.
    */
  private final case class F(key: Int, node: XNode, value: String)

  /** one y-clustered line's fragments as parallel arrays (see the
    * linesInPage comment in processPage)
    */
  private final class FragLine {
    var keys = new Array[Int](4)
    var nodes = new Array[XNode](4)
    var len = 0
    def contains(k: Int): Boolean = {
      var i = 0
      while (i < len) { if (keys(i) == k) return true; i += 1 }
      false
    }
    def add(k: Int, n: XNode): Unit = {
      if (len == keys.length) {
        keys = java.util.Arrays.copyOf(keys, len * 2)
        nodes = java.util.Arrays.copyOf(nodes, len * 2)
      }
      keys(len) = k; nodes(len) = n; len += 1
    }
  }

  /** processPageXmlObject (ParseText.php:266-591). Appends this page's
    * lines to `out.lineObjects` and fills the page's header/footer frags.
    */
  def processPage(
      page: XNode,
      out: PageResult,
      colors: ColorsList,
      fonts: mutable.HashMap[String, Int], // font id -> px size (doc-shared)
      dirtyPageNum: Int,
      flags: DocFlags): Unit = {

    // y-cluster: top -> (left-key -> frag), both insertion-ordered. The
    // inner per-line structure is a compact parallel-array list (typical
    // lines hold 1-2 fragments; one LinkedHashMap + its entry table per
    // line was a top residual allocation source in the round-4 JFR
    // profile). Linear contains() preserves the collision-probe
    // semantics; insertion order is positional.
    val linesInPage = mutable.LinkedHashMap.empty[Int, FragLine]
    // unboxed membership mirror of linesInPage.keySet: the ±4 snap probes
    // 9 candidate tops per fragment, and LinkedHashMap.contains(Int) boxes
    // an Integer per probe (~5% of per-doc allocation, round-4 JFR)
    val topSeen = new java.util.BitSet(1400)
    val fontObjects = new ArrayBuffer[XNode]

    val pageHeight = attrInt(page, "HEIGHT")
    out.pageSize = if (pageHeight > 800) "A4" else "Letter"

    page.children.foreach { child =>
      child.tag match {
        case "TEXT" =>
          // changebar-asterisk filter (ParseText.php:280-284)
          if (!(attrInt(child, "LEFT") > 500 && Php.trim(child.value) == "*")) {
            var top = attrInt(child, "TOP")
            var leftKey = attrInt(child, "LEFT")
            // snap to an existing line bucket within ±4 px, probing from -4
            // upward (ParseText.php:291-300)
            var off = -Consts.MaxOffsetSameLine
            var snapped = false
            while (!snapped && off <= Consts.MaxOffsetSameLine) {
              val cand = top + off
              // out-of-range tops (pathological input: negative, or absurdly
              // large from a malformed TOP attr — BitSet.set would allocate
              // O(top) words) fall back to the boxed lookup so snap
              // semantics stay exactly faithful at O(1) memory
              val hit =
                if (cand >= 0 && cand < Consts.MaxSaneTop) topSeen.get(cand)
                else linesInPage.contains(cand)
              if (hit) { top = cand; snapped = true }
              off += 1
            }
            if (top >= 0 && top < Consts.MaxSaneTop) topSeen.set(top)
            val line = linesInPage.getOrElseUpdate(top, new FragLine)
            while (line.contains(leftKey)) leftKey += 1 // collision probe (:306-310)
            line.add(leftKey, child)
          }
        case "FONTSPEC" =>
          fontObjects += child
          val points = attrInt(child, "SIZE")
          var px = math.floor(points * Consts.FontConversionRate).toInt
          // pdftohtml 11pt-vs-12pt bug compensation (ParseText.php:320-325)
          if (px >= 13 && px < 16) px = 16
          fonts(child.attrOrElse("ID", "")) = px
        case _ =>
      }
    }
    colors.addColors(fontObjects.toSeq)

    var lastTopOffset = 72 // default top padding (ParseText.php:347)
    val basicLineHeight = 12
    var givenPageNum = ""
    val headerObjects = new ArrayBuffer[F]
    val footerObjects = new ArrayBuffer[F]
    val fontsInPage = mutable.LinkedHashMap.empty[Int, Int]

    // iterate tops ascending (ksort, ParseText.php:350); inner maps stay
    // in insertion order for the banding passes
    // toArray + in-place sort: .toSeq materialized a List of the whole
    // map per page and sortBy copied it again (round-5 JFR)
    val sortedLines = linesInPage.toArray
    scala.util.Sorting.stableSort(sortedLines, (a: (Int, FragLine), b: (Int, FragLine)) => a._1 < b._1)
    sortedLines.foreach { case (top, lineFrags) =>
      var frags: ArrayBuffer[F] = {
        val b = new ArrayBuffer[F](lineFrags.len)
        var fi = 0
        while (fi < lineFrags.len) {
          val nd = lineFrags.nodes(fi)
          b += F(lineFrags.keys(fi), nd, nd.value)
          fi += 1
        }
        b
      }

      // CONTINUED header strip (ParseText.php:369-386)
      if (top <= Consts.Inch / 2 + 14) {
        frags = frags.filter { f =>
          val t = Php.trim(f.value)
          if (reContinuedExact.matcher(t).find()) { flags.sceneContinuedTop = true; false }
          else if (reContinuedNum.matcher(t).find()) {
            flags.sceneContinuedTop = true; flags.sceneContinuedNumber = true; false
          } else true
        }
      }
      // (CONTINUED) footer strip (ParseText.php:388-398)
      if (top > pageHeight - Consts.Inch / 2 - 29) {
        frags = frags.filter { f =>
          if (reContinuedBottom.matcher(Php.trim(f.value)).find()) {
            flags.sceneContinuedBottom = true; false
          } else true
        }
      }

      if (top <= Consts.Inch / 2 + 6) {
        // header band (ParseText.php:400-437): dedup consecutive identical
        // fragments, split docx page-number glue on 10-space runs, capture
        // the page-number token, drop watermarks. Iteration continues over
        // items appended mid-loop, like PHP's current()/next().
        var prev: Option[F] = None
        var idx = 0
        while (idx < frags.length) {
          val f = frags(idx)
          val nonDuplicate = prev match {
            case Some(p) =>
              !(p.node.tag == f.node.tag && p.value == f.value &&
                p.node.attr("TOP") == f.node.attr("TOP") &&
                p.node.attr("LEFT") == f.node.attr("LEFT") &&
                p.node.attr("WIDTH") == f.node.attr("WIDTH") &&
                p.node.attr("HEIGHT") == f.node.attr("HEIGHT") &&
                p.node.attr("FONT") == f.node.attr("FONT"))
            case None => true
          }
          prev = Some(f)
          if (nonDuplicate) {
            var v = Php.trim(f.value)
            val glue = Php.mbStrpos(v, "          ") // 10 spaces (:415-422)
            if (glue >= 0) {
              val tail = Php.trim(Php.mbSubstr(v, glue + 10))
              v = Php.trim(Php.mbSubstr(v, 0, glue))
              frags += F(f.key, f.node, tail)
            }
            if (!Consts.AutoHeaderFooterText.contains(v)) {
              if (rePageNum.matcher(v).find()) {
                givenPageNum = Php.rtrim(v, Set('.', ' '))
              } else {
                headerObjects += F(f.key, f.node, v)
              }
            }
          }
          idx += 1
        }
      } else if (top > pageHeight - Consts.Inch / 2 - 14) {
        // footer band (ParseText.php:441-449)
        frags.foreach { f =>
          if (!Consts.AutoHeaderFooterText.contains(Php.trim(f.value)))
            footerObjects += f
        }
      } else {
        // body: synthesize blank lines for the vertical gap
        // (ParseText.php:469-475)
        var t = lastTopOffset
        while (t <= top - basicLineHeight + Consts.MaxOffsetSameLine) {
          out.lineObjects += new LineObj("", 0, 0, givenPageNum, Map.empty, 16, Map.empty, NumberObj())
          t += basicLineHeight
        }

        var left = 1000000
        var right = 0
        var lineFontSize = 0
        var numberObject = NumberObj()
        // line content accumulates in a builder with its mb-length tracked
        // incrementally: the string-concat form re-allocated the whole
        // line per fragment and re-counted code points per query (~15% of
        // per-doc allocation in the round-4 JFR profile)
        val lineSb = new java.lang.StringBuilder
        var lineLen = 0 // Php.mbLen of lineSb, maintained incrementally
        var lineColors = Map.empty[Int, Vector[Span]]
        var lineTextAttributes = Map.empty[String, Vector[Span]]

        val sorted = frags.sortBy(_.key) // ksort (ParseText.php:482)
        // calculateWhichKeysToTrim (ParseText.php:231-264): left-trim up to
        // and including the first fragment with content; right-trim from the
        // last fragment with content
        var trimLeftIdx = sorted.length - 1
        var k0 = 0
        var found = false
        while (k0 < sorted.length && !found) {
          if (Php.customLtrim(sorted(k0).value) != "") { trimLeftIdx = k0; found = true }
          k0 += 1
        }
        var trimRightIdx = 0
        var k1 = sorted.length - 1
        found = false
        while (k1 >= 0 && !found) {
          if (Php.customRtrim(sorted(k1).value) != "") { trimRightIdx = k1; found = true }
          k1 -= 1
        }

        var lastObjRight = 0
        var k = 0
        while (k < sorted.length) {
          val f = sorted(k)
          val text = Php.rtrimNbsp(f.value)
          var objLeft = attrInt(f.node, "LEFT")
          var objRight = objLeft + attrInt(f.node, "WIDTH")
          if (text != "" && objLeft < 65 && Php.mbLen(text) < 7) {
            // left line-number margin capture (ParseText.php:492-497)
            numberObject = NumberObj(Some(text), left = true, right = numberObject.right)
          } else if (text != "" && objLeft > 520 && Php.mbLen(text) < 7) {
            numberObject = NumberObj(Some(text), left = numberObject.left, right = true)
          } else {
            val objFontId = f.node.attrOrElse("FONT", "")
            val objColorId = colors.getColorId(objFontId)
            val fontPx = fonts.getOrElse(objFontId, 16)

            val textLengthBefore = lineLen
            // line font size accumulation (ParseText.php:511-512)
            if (text != "" || lineFontSize == 0) {
              val a = if (lineLen != 0) lineFontSize else 0
              val b =
                if (text != "") fontPx
                else math.min(math.floor(basicLineHeight * Consts.FontConversionRate).toInt, fontPx)
              lineFontSize = math.max(a, b)
            }
            // inter-fragment gap -> spaces (ParseText.php:515-524)
            if (text != "" && lineLen != 0 && lastObjRight != 0) {
              val numSpaces = math.floor((objLeft - lastObjRight).toDouble / Consts.DefaultCharWidth).toInt
              var sp0 = 0
              while (sp0 < numSpaces) { lineSb.append(' '); sp0 += 1 }
              if (numSpaces > 0) lineLen += numSpaces
            }

            val priorNonEmpty = lineLen != 0
            // addValueToLineContent (ParseText.php:157-204) with edge trims
            var v = f.value
            var leftTrimmed = 0
            var rightTrimmed = 0
            if (k <= trimLeftIdx) {
              val before = Php.mbLen(v); v = Php.customLtrim(v); leftTrimmed = before - Php.mbLen(v)
            }
            if (k >= trimRightIdx) {
              val before = Php.mbLen(v); v = Php.customRtrim(v); rightTrimmed = before - Php.mbLen(v)
            }
            val newNonEmpty = v != ""
            if (newNonEmpty) {
              val vLen = Php.mbLen(v)
              if (f.node.textAttributes.nonEmpty) // guard: no lambda on the common empty case
                f.node.textAttributes.foreach { case (attr, spans) =>
                  spans.foreach { sp =>
                    if (sp.end < leftTrimmed) () // fully left-trimmed away
                    else if (sp.start >= vLen + leftTrimmed) () // fully right-trimmed
                    else {
                      val s = math.max(sp.start - leftTrimmed, 0) + textLengthBefore
                      val e = math.min(sp.end - leftTrimmed, vLen - 1) + textLengthBefore
                      lineTextAttributes = lineTextAttributes.updated(attr,
                        lineTextAttributes.getOrElse(attr, Vector.empty) :+ Span(s, e))
                    }
                  }
                }
              lineSb.append(v)
              lineLen += vLen
            }
            objLeft += leftTrimmed * Consts.DefaultCharWidth
            objRight -= rightTrimmed * Consts.DefaultCharWidth

            if (!colors.specialCase(objColorId)) {
              val textLengthAfter = lineLen
              lineColors = lineColors.updated(objColorId,
                lineColors.getOrElse(objColorId, Vector.empty) :+ Span(textLengthBefore, textLengthAfter))
            }

            val h = attrInt(f.node, "HEIGHT")
            lastTopOffset = math.max(lastTopOffset,
              top + (if (text != "") h else math.min(basicLineHeight, h)))

            left =
              if (priorNonEmpty) { if (newNonEmpty) math.min(left, objLeft) else left }
              else objLeft
            right =
              if (priorNonEmpty) { if (newNonEmpty) math.max(right, objRight) else right }
              else objRight

            fontsInPage(objColorId) = fontsInPage.getOrElse(objColorId, 0) + 1
            lastObjRight = objRight
          }
          k += 1
        }
        out.lineObjects += new LineObj(lineSb.toString, left, right - left, givenPageNum,
          lineColors, lineFontSize, lineTextAttributes, numberObject)
      }
    }

    // header name -> color revision bookkeeping (ParseText.php:577-584)
    val hdrSorted = headerObjects.sortBy(f => attrInt(f.node, "LEFT"))
    if (hdrSorted.nonEmpty) {
      val possibleName = hdrSorted.head.value
      colors.updateIdsWithName(fontsInPage.keys.toSeq, possibleName, dirtyPageNum)
      colors.setHeaderName(dirtyPageNum, possibleName)
    }

    out.lineObjects += new LineObj("\f", 0, 0, givenPageNum, Map.empty, 16, Map.empty, NumberObj())
    out.headerFrags = hdrSorted.map(f => HfFrag(f.value, attrInt(f.node, "LEFT"), attrInt(f.node, "WIDTH"))).toVector
    out.footerFrags = footerObjects.map(f => HfFrag(f.value, attrInt(f.node, "LEFT"), attrInt(f.node, "WIDTH"))).toVector
  }
}
