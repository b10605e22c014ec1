package graft.pdfxml

import graft.model.{NumberObj, Php, ScriptLine, Span, SpanAlgebra}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** getAlignment (ParseText.php:664-681). */
object Alignment {
  def apply(x: Int, width: Int, defaultLeftMargin: Double, pageWidth: Double): String = {
    val inch = Consts.Inch
    val lineEnd = x + width
    val lineDistanceFromRight = (pageWidth - inch) - lineEnd
    val lineMidpoint = x + width / 2.0
    val pageMidpoint = (pageWidth - defaultLeftMargin - inch) / 2 + defaultLeftMargin
    if (x > defaultLeftMargin + inch / 2 && math.abs(lineMidpoint - pageMidpoint) < inch / 2)
      "center"
    else if (x > defaultLeftMargin + math.max(lineDistanceFromRight, inch.toDouble) &&
             lineDistanceFromRight < inch * 2)
      "right"
    else "left"
  }
}

/** The multi-pass per-page classifier pipeline (reference Text_Parser,
  * ParseText.php:991-1793). One instance per document; `parsePage` is
  * called once per formfeed-delimited page in order.
  */
object TextParser {
  /** The reference's `-X1707` DUMP_BLOCKS stage labels, in pipeline order
    * (ParseText.php:1178,1208,1252,1280,1408,1566,1597,1618,1678,1723).
    * A [[TextParser]] built with a `stageSink` receives a snapshot of the
    * block list at each of these points, letting fixtures pin every pass
    * independently instead of only end-to-end.
    */
  val StageLabels: Vector[String] = Vector(
    "Before classifying based on content",
    "After classifying based on content",
    "After reclassifying based on indent",
    "After reclassifying Unknown as Action/Slugline",
    "Before reclassifying dual dialogue",
    "After reclassifying dual dialogue",
    "After converting Unknown",
    "After changing Action to Text or Shot based on vertical spacing",
    "After removing unnecessary blank lines",
    "Before turning blocks into objects")

  /** immutable snapshot of one block at a stage boundary */
  final case class StageBlock(kind: String, unsure: Boolean, x: Int, lines: Vector[String])

  /** one pass: any case-insensitive "CONT" or "MORE" substring? */
  private[pdfxml] def hasContOrMore(s: String): Boolean = {
    var i = 0
    val n = s.length - 3
    while (i < n) {
      val c = s.charAt(i)
      if ((c == 'C' || c == 'c') && s.regionMatches(true, i + 1, "ONT", 0, 3)) return true
      if ((c == 'M' || c == 'm') && s.regionMatches(true, i + 1, "ORE", 0, 3)) return true
      i += 1
    }
    false
  }
}

final class TextParser(val colors: ColorsList, flags: DocFlags,
    stageSink: (Int, String, Seq[TextParser.StageBlock]) => Unit = null) {
  val objects: ArrayBuffer[ScriptLine] = ArrayBuffer.empty
  var numPages: Int = 0
  var givenPageNum: String = ""

  /** emit a DUMP_BLOCKS-style stage snapshot (no-op unless a sink is set) */
  private def dump(stage: Int, blocks: scala.collection.Seq[Block]): Unit =
    if (stageSink != null)
      stageSink(numPages, TextParser.StageLabels(stage),
        blocks.map(b => TextParser.StageBlock(b.kind, b.unsure, b.x, b.lines.toVector)).toSeq)

  private val whiteOutMarkers = Vector(
    "CONTINUED:", "(CONTINUED)", "(CONT)", "(CONT.)", "(CONTD)", "(CONT'D)",
    "(CONT’D)", "(MORE)", "[CONTINUED]", "[CONT]", "[CONT.]", "[CONTD]",
    "[CONT'D]", "[CONT’D]", "[MORE]")

  /** PDF-mode ScriptObject construction (Objects.php:38-79): invalid kinds
    * fall back to Text; content gets strip_color_formatting +
    * compress_spaces.
    */
  private def mkObj(kind: String, content: String, colorsArg: Map[Int, Vector[Span]],
      fontSize: Int, ta: Map[String, Vector[Span]], num: NumberObj): ScriptLine = {
    val k = if (ScriptLine.ValidTypes(kind)) kind else "Text"
    ScriptLine(k, Php.compressSpaces(Php.stripColorFormatting(content)),
      numPages, givenPageNum, colorsArg, fontSize, ta, num)
  }

  def parsePage(lineObjects: collection.Seq[LineObj], lookForFlyPage: Boolean, givenPageNum0: String): Unit = {
    numPages += 1
    givenPageNum = givenPageNum0

    // ---- strip tabs / CONT'D markers, trim (ParseText.php:1014-1053)
    lineObjects.foreach { lo =>
      var text = Php.rtrimNbsp(lo.text)
      var tabAt = Php.mbStrpos(text, "\t")
      while (tabAt >= 0) {
        val prefix = Php.mbSubstr(text, 0, tabAt)
        val tabstop = Php.mbSubstr("        ", Php.mbLen(prefix) % 8, 10)
        text = prefix + tabstop + Php.mbSubstr(text, tabAt + 1)
        tabAt = Php.mbStrpos(text, "\t")
      }
      // every marker contains CONT or MORE — one single-pass scan gates
      // the 15x3 whiteout replaces (hot path)
      if (TextParser.hasContOrMore(text))
        whiteOutMarkers.foreach { m => text = Php.whiteOut(text, m) }
      lo.text = Php.customTrim(text)
    }

    // ---- split into block pieces on runs of >= 12 spaces (:1056-1110)
    val blockPieces = new ArrayBuffer[BlockPiece]
    val pageText = new java.lang.StringBuilder
    var numLinesWithText = 0
    val spaces12 = "            " // 12 spaces

    lineObjects.zipWithIndex.foreach { case (lo, lx) =>
      val text = lo.text
      val tLen = Php.mbLen(text)
      // code-point charAt without the per-char mbSubstr String (the
      // space-skip scans below run once per character of every line);
      // tLen == text.length iff the string is surrogate-free
      val bmp = tLen == text.length
      @inline def cpChar(idx: Int): Char =
        if (bmp) text.charAt(idx) else text.charAt(text.offsetByCodePoints(0, idx))
      var i = 0
      var addedBlock = false
      while (i != tLen && cpChar(i) == ' ') i += 1
      while (i != tLen) {
        var end = Php.mbStrpos(text, spaces12, i)
        if (end < 0) end = tLen
        val preceding = Php.mbSubstr(text, 0, i)
        val str = Php.mbSubstr(text, i, end - i)
        pageText.append(str).append('\n')
        val trimX = Php.mbLen(preceding) * Consts.DefaultCharWidth
        blockPieces += new BlockPiece(str, lo.x + trimX, lx, lo.width - trimX,
          lo.colors, lo.fontSize, lo.textAttributes, lo.numberObject)
        numLinesWithText += 1
        addedBlock = true
        i = end
        if (i < tLen) {
          i += 12
          if (i > tLen) i = tLen
        }
        while (i != tLen && cpChar(i) == ' ') i += 1
      }
      if (!addedBlock)
        blockPieces += new BlockPiece("", lo.x + i * 11, lx, 0,
          lo.colors, lo.fontSize, lo.textAttributes, lo.numberObject)
    }

    // ---- fly/title page (:1112-1142)
    if (lookForFlyPage && objects.isEmpty && numLinesWithText < 30 &&
        pageText.length < 300) {
      val titleObjs = new ArrayBuffer[ScriptLine]
      blockPieces.foreach { piece =>
        if (piece.fontSize != 0) {
          val text = Php.trim(piece.text)
          var o = mkObj("Text", text, piece.colors, piece.fontSize,
            piece.textAttributes, piece.numberObject)
          val al = Alignment(piece.x, piece.width, 1.0 * Consts.Inch, 8.5 * Consts.Inch)
          if (al != "left") o = o.copy(alignment = al)
          titleObjs += o
        }
      }
      objects ++= FlyPage.classify(titleObjs)
      return
    } else if (objects.isEmpty) {
      numPages += 1 // fake page in place of the missing title page (:1141)
    }

    // ---- combine vertically-adjacent pieces into blocks (:1149-1172),
    // bounded to the 20 most recent blocks
    var blocks = new ArrayBuffer[Block]
    blockPieces.foreach { piece =>
      if (LooksLike.slugline(piece.text)) {
        flags.seriesTimer = 0
        if (LooksLike.seriesOrMontageSlugline(piece.text)) flags.seriesTimer = 20
      }
      var done = false
      var ax = math.max(0, blocks.length - 20)
      while (!done && ax != blocks.length) {
        if (blocks(ax).shouldCombine(piece, flags)) {
          blocks(ax).combine(piece)
          done = true
        }
        ax += 1
      }
      if (!done) blocks += new Block(piece)
    }

    mergeAcrossIntersentenceSpaces(blocks)
    dump(0, blocks)

    // ---- classification cascade (:1184-1189); the static
    // last_page_block_kind is never reassigned in the reference, so the
    // first block of every page sees prev_kind "Blank"
    var bx = 0
    while (bx < blocks.length) {
      var prevKind = if (bx > 0) blocks(bx - 1).kind else "Blank"
      if (prevKind == "Page Number")
        prevKind = if (bx > 1) blocks(bx - 2).kind else "Blank"
      blocks(bx).classifyBasedOnContent(prevKind, bx)
      bx += 1
    }
    dump(1, blocks)

    // ---- indent inference (:1192-1205)
    var likelyIndent: mutable.LinkedHashMap[String, Int] =
      Indents.nextgen(blocks).getOrElse(Indents.prevgen(blocks))
    if (likelyIndent.contains("Character") && likelyIndent.get("Dialog").contains(0)) {
      if (likelyIndent.get("Action").contains(0)) likelyIndent.remove("Action")
      if (likelyIndent.get("Slugline").contains(0)) likelyIndent.remove("Slugline")
    }

    // ---- reclassify by indent (:1216-1249)
    val commonKinds = Vector("Character", "Dialog", "Slugline", "Action", "Transition")
    var ax = 0
    while (ax < blocks.length) {
      val block = blocks(ax)
      val maybes = commonKinds.filter { v =>
        likelyIndent.get(v).exists(ind => math.abs(block.x - ind) <= 3)
      }
      block.maybes = maybes
      if (block.unsure) block.reclassifyUsingIndent(maybes)
      if (block.unsure && block.isUppercaseSingleLine) {
        if (block.x > 600 || (block.x > 400 && block.x + block.width > 700)) {
          block.kind = "Transition"
          block.unsure = true
        }
      }
      if (block.isTransitionFollower && ax > 20 && blocks(ax - 1).unsure &&
          blocks(ax - 1).isUppercaseSingleLine) {
        blocks(ax - 1).kind = "Transition"
      }
      ax += 1
    }
    dump(2, blocks)

    // ---- refresh likely indents from the final kinds (:1260-1264)
    val indent2: Map[String, Option[Int]] =
      Vector("Character", "Dialog", "Slugline", "Action", "Unknown")
        .map(v => v -> Indents.likelyIndentFor(blocks, v)).toMap

    // Unknown at the modal Unknown indent -> Slugline/Action (:1265-1277)
    if (indent2("Action").isEmpty && indent2("Slugline").isEmpty &&
        indent2("Character").isDefined && indent2("Dialog").isDefined &&
        indent2("Unknown").isDefined) {
      blocks.foreach { block =>
        if (block.unsure && indent2("Unknown").contains(block.x)) {
          block.kind = if (Php.isUppercase(block.lines(0))) "Slugline" else "Action"
          block.unsure = true
        }
      }
    }
    dump(3, blocks)

    // ---- dialog sanity scan-back (:1291-1314)
    ax = 0
    while (ax < blocks.length) {
      val block = blocks(ax)
      if (block.kind == "Dialog") {
        var px = ax - 1
        var broke = false
        while (px >= 0 && !broke) {
          val prevKind = blocks(px).kind
          if (prevKind == "Character" || prevKind == "Paren") broke = true
          else {
            if (prevKind == "Action" && px - 1 >= 0 &&
                Set("Character", "Dialog", "Paren")(blocks(px - 1).kind) &&
                ax + 1 < blocks.length && blocks(ax + 1).kind == "Character") {
              // embedded-action-inside-dialog exception (:1300-1307)
              block.unsure = false
              broke = true
            } else if (prevKind == "Slugline" || prevKind == "Transition" || prevKind == "Action") {
              // PHP `x == FALSE` when no Action indent exists is x == 0
              val matchesAction = indent2("Action") match {
                case Some(v) => block.x == v
                case None    => block.x == 0
              }
              block.kind = if (matchesAction) "Action" else "Unknown"
              broke = true
            }
          }
          px -= 1
        }
      }
      ax += 1
    }

    // ---- scene-number blocks adjacent to sluglines (:1317-1326)
    ax = 0
    while (ax < blocks.length) {
      val block = blocks(ax)
      val prevOk = ax - 1 >= 0 && blocks(ax - 1).y == block.y && blocks(ax - 1).kind == "Slugline"
      val nextOk = ax + 1 < blocks.length && blocks(ax + 1).y == block.y && blocks(ax + 1).kind == "Slugline"
      if (block.height == 1 && LooksLike.sceneNumber(block.lines(0)) && (prevOk || nextOk)) {
        block.kind = "Scene Number"
        block.unsure = false
      }
      ax += 1
    }

    // ---- remove Scene Number / Page Number / Changebar blocks (:1332-1355)
    {
      val removed = Array.fill(blocks.length)(false)
      var i = 0
      while (i < blocks.length) {
        if (!removed(i)) {
          blocks(i).kind match {
            case "Scene Number" => removed(i) = true
            case "Page Number" =>
              removed(i) = true
              if (i - 1 >= 0 && !removed(i - 1) && blocks(i - 1).kind == "Horizontal Rule") removed(i - 1) = true
              if (i + 1 < blocks.length && !removed(i + 1) && blocks(i + 1).kind == "Horizontal Rule") removed(i + 1) = true
            case "Changebar" => removed(i) = true
            case _ =>
          }
        }
        i += 1
      }
      val kept = new ArrayBuffer[Block](blocks.length)
      var j = 0
      while (j < blocks.length) { if (!removed(j)) kept += blocks(j); j += 1 }
      blocks = kept
    }

    // ---- lone leading Dialog on a page without other dialog (:1360-1379)
    var firstDialogMisclassified = false
    var scanDone = false
    var num = 0
    while (num < blocks.length && !scanDone) {
      val block = blocks(num)
      if (num == 0) {
        if (block.kind == "Dialog") firstDialogMisclassified = true
        else { firstDialogMisclassified = false; scanDone = true }
      } else if (block.kind == "Dialog" || block.kind == "Action" || block.kind == "Slugline") {
        firstDialogMisclassified = false; scanDone = true
      }
      num += 1
    }
    if (firstDialogMisclassified && blocks.nonEmpty) {
      val block = blocks(0)
      val isSlug = block.height == 1 && LooksLike.slugline(block.lines(0))
      block.kind = if (isSlug) "Slugline" else "Action"
    }

    // ---- orphan Character without following Dialog/Paren (:1384-1405)
    var previousCharacter: Block = null
    blocks.foreach { block =>
      if (block.kind == "Character") {
        if (previousCharacter != null) {
          val isSlug = previousCharacter.height == 1 && LooksLike.slugline(previousCharacter.lines(0))
          previousCharacter.kind = if (isSlug) "Slugline" else "Action"
        }
        previousCharacter = block
      } else if (block.kind == "Dialog" || block.kind == "Paren") {
        previousCharacter = null
      }
    }
    if (previousCharacter != null) {
      val isSlug = previousCharacter.height == 1 && LooksLike.slugline(previousCharacter.lines(0))
      previousCharacter.kind = if (isSlug) "Slugline" else "Action"
    }

    dump(4, blocks)
    DualDialog.recover(blocks)
    dump(5, blocks)

    // ---- Unknown -> Dialog/Text/Action (:1570-1594)
    var bi = 0
    while (bi < blocks.length) {
      val block = blocks(bi)
      if (block.kind == "Unknown") {
        var kind = "Action"
        if (bi > 0) {
          val prevBlock = blocks(bi - 1)
          if (!prevBlock.isBlank) {
            kind = prevBlock.kind match {
              case "Character" | "Dialog" | "Paren" => "Dialog"
              case _                                => "Text"
            }
          }
        }
        block.kind = kind
      }
      bi += 1
    }
    dump(6, blocks)

    // ---- Action -> Text/Shot by vertical spacing (:1601-1615)
    bi = 0
    while (bi < blocks.length) {
      val block = blocks(bi)
      if (block.kind == "Action" && bi > 0) {
        if (!blocks(bi - 1).isBlank) block.kind = "Text"
        else if (bi >= 2 && blocks(bi - 2).isBlank && block.isUppercaseSingleLine)
          block.kind = "Shot"
      }
      bi += 1
    }
    dump(7, blocks)

    // ---- drop margin-implied blank lines (:1623-1674)
    {
      val linesBeforeType = Map("Action" -> 1, "Character" -> 1, "Transition" -> 1,
        "Slugline" -> 2, "Shot" -> 2)
      val removed = Array.fill(blocks.length)(false)
      var seenReal = false
      var i = 0
      val nBlocks = blocks.length
      while (i < nBlocks) {
        val block = blocks(i)
        if (block.isBlank) {
          var j = i + 1
          var nextKind = ""
          var found = false
          while (j < nBlocks && !found) {
            if (!blocks(j).isBlank) { nextKind = blocks(j).kind; found = true }
            else j += 1
          }
          if (!found) j = nBlocks
          val numBlanks = j - i
          val marginNumBlanks =
            if (nextKind == "") numBlanks else linesBeforeType.getOrElse(nextKind, 0)
          var numBlanksToRemove = math.min(numBlanks, marginNumBlanks)
          if (!seenReal && marginNumBlanks > 0 && numBlanksToRemove == numBlanks)
            numBlanksToRemove -= 1
          var k = i
          while (k < i + numBlanksToRemove) { removed(k) = true; k += 1 }
          i = j - 1
        } else seenReal = true
        i += 1
      }
      val kept = new ArrayBuffer[Block](blocks.length)
      var j2 = 0
      while (j2 < blocks.length) { if (!removed(j2)) kept += blocks(j2); j2 += 1 }
      blocks = kept
    }
    dump(8, blocks)
    dump(9, blocks) // the reference dumps both :1678 and :1723 (no pass between)

    // ---- blocks -> ScriptLines (:1728-1781)
    val fullWidthTypes = Set("Action", "Slugline", "Text", "Shot")
    val pageObjects = new ArrayBuffer[ScriptLine]
    blocks.foreach { block =>
      var kind = block.kind
      if (kind == "Horizontal Rule") kind = "Text"
      if (kind == "Contact Info") {
        block.lines.indices.foreach { x =>
          pageObjects += mkObj("Text", Php.reduceSpaces(block.lines(x)),
            block.colors(x), block.fontSize, block.textAttributes(x), block.numberObject)
        }
      } else {
        val (text, cols, ta) = block.textAndSpans
        var o = mkObj(kind, Php.reduceSpaces(text), cols, block.fontSize, ta, block.numberObject)
        o = o.copy(numLines = block.height, isDualLine = block.isDualLine,
          hasDualLine = block.hasDualLine)
        if (fullWidthTypes(kind)) {
          val al = Alignment(block.x, block.width, 1.5 * Consts.Inch, 8.5 * Consts.Inch)
          if (al != "left") o = o.copy(alignment = al)
        } else if (kind == "Transition") {
          val al = Alignment(block.x, block.width, 1.5 * Consts.Inch, 8.5 * Consts.Inch)
          if (al != "right") o = o.copy(alignment = al)
        }
        pageObjects += o
        maybeBreakUpLastDialog(pageObjects)
      }
    }

    // ---- cross-page Dialog merge (:1785-1790)
    val n0 = objects.length
    if (n0 > 0 && pageObjects.nonEmpty && objects(n0 - 1).kind == "Dialog" &&
        pageObjects(0).kind == "Dialog") {
      val a = objects(n0 - 1)
      val b = pageObjects(0)
      val newFontSize = math.max(a.fontSize, b.fontSize)
      // get_merged_colors / get_merged_textAttributes use byte offsets
      // (Objects.php:226-239 strlen) — identical to code points for ASCII
      val offset = a.text.length + 1
      objects(n0 - 1) = mkObj("Dialog", a.text + " " + b.text,
        SpanAlgebra.merge(a.colors, b.colors, offset), newFontSize,
        SpanAlgebra.merge(a.textAttributes, b.textAttributes, offset), a.numberObject)
      pageObjects.remove(0)
    }
    objects ++= pageObjects
  }

  /** maybe_merge_across_intersentence_spaces (ParseText.php:2481-2509). */
  private def mergeAcrossIntersentenceSpaces(blocks: ArrayBuffer[Block]): Unit = {
    val punct = java.util.regex.Pattern.compile("[.:?!]$")
    val upper = java.util.regex.Pattern.compile("^[A-Z]")
    val removed = mutable.BitSet.empty
    var ax = 0
    val n = blocks.length
    while (ax < n) {
      if (!removed(ax) && ax + 1 < n && !removed(ax + 1)) {
        val block = blocks(ax)
        val nextBlock = blocks(ax + 1)
        val yOffset = nextBlock.y - block.y
        if (nextBlock.height == 1 && nextBlock.x > block.x && yOffset >= 0 &&
            yOffset < block.height) {
          val offendingLine = block.lines(yOffset)
          val rightEdge = block.x + Php.mbLen(offendingLine) * Consts.DefaultCharWidth
          if (nextBlock.x <= rightEdge + 5 && punct.matcher(offendingLine).find() &&
              upper.matcher(nextBlock.lines(0)).find()) {
            block.setLine(yOffset, offendingLine + "  " + nextBlock.lines(0))
            val newWidth = (nextBlock.x + nextBlock.width) - block.x
            block.width = math.max(block.width, newWidth)
            removed += (ax + 1)
          }
        }
      }
      ax += 1
    }
    if (removed.nonEmpty) {
      val kept = blocks.zipWithIndex.collect { case (b, i) if !removed(i) => b }
      blocks.clear()
      blocks ++= kept
    }
  }

  /** maybe_break_up_last_dialog (ParseText.php:2610-2696) — only the active
    * path: the bracket-matching splitter is behind `if (FALSE)`. The last
    * Dialog object is popped and re-pushed with spans clamped to
    * [0, len(text)); num_lines and dual flags reset (constructor defaults).
    * An empty-content Dialog disappears entirely.
    */
  private def maybeBreakUpLastDialog(objs: ArrayBuffer[ScriptLine]): Unit = {
    if (objs.isEmpty) return
    if (objs.last.kind != "Dialog") return
    val last = objs.remove(objs.length - 1)
    val text = last.text
    if (text != "") {
      val len = Php.mbLen(text)
      objs += mkObj("Dialog", text,
        SpanAlgebra.split(last.colors, 0, len), last.fontSize,
        SpanAlgebra.split(last.textAttributes, 0, len), last.numberObject)
        .copy(pageNum = last.pageNum, givenPageNum = last.givenPageNum)
    }
  }
}

/** nextgen/prevgen indent inference + modal indent per kind
  * (ParseText.php:1872-1897, 2700-2837).
  */
object Indents {

  /** get_likely_indent_for: modal x for a kind; ties resolved to the
    * last-first-seen x for Character/Dialog, first-seen otherwise.
    */
  def likelyIndentFor(blocks: collection.Seq[Block], kind: String): Option[Int] = {
    val counts = mutable.LinkedHashMap.empty[Int, Int]
    blocks.foreach { b =>
      if (b.kind == kind) counts(b.x) = counts.getOrElse(b.x, 0) + 1
    }
    if (counts.isEmpty) None
    else {
      val mx = counts.values.max
      val maxKeys = counts.iterator.collect { case (k, c) if c == mx => k }.toVector
      if (kind == "Character" || kind == "Dialog") Some(maxKeys.last)
      else Some(maxKeys.head)
    }
  }

  def prevgen(blocks: collection.Seq[Block]): mutable.LinkedHashMap[String, Int] = {
    val out = mutable.LinkedHashMap.empty[String, Int]
    Vector("Character", "Dialog", "Slugline", "Action").foreach { v =>
      likelyIndentFor(blocks, v).foreach(out(v) = _)
    }
    if (!out.contains("Action") && !out.contains("Slugline") &&
        out.get("Dialog").exists(_ > 0))
      out("Action") = 0
    if (!out.contains("Action") && out.contains("Slugline")) out("Action") = out("Slugline")
    if (!out.contains("Slugline") && out.contains("Action")) out("Slugline") = out("Action")
    out
  }

  /** nextgen_compute_indents (ParseText.php:2726-2837). The two-level case
    * counts Transition/Character/Paren on level 0 — the reference indexes
    * `$lkeys[0]` for all six sums — replicated as-is.
    */
  def nextgen(blocks: collection.Seq[Block]): Option[mutable.LinkedHashMap[String, Int]] = {
    val interesting = Set("Character", "Paren", "Dialog", "Action", "Slugline",
      "Transition", "Text", "Unknown")
    val byIndent = mutable.LinkedHashMap.empty[Int, ArrayBuffer[Block]]
    blocks.foreach { b =>
      if (interesting(b.kind) && !LooksLike.sceneNumber(b.text))
        byIndent.getOrElseUpdate(b.x, ArrayBuffer.empty) += b
    }
    val lkeys = byIndent.keys.toVector.sorted
    def cnt(level: Int, kind: String): Int = byIndent(lkeys(level)).count(_.kind == kind)
    def size(level: Int): Int = byIndent(lkeys(level)).length
    val out = mutable.LinkedHashMap.empty[String, Int]
    lkeys.length match {
      case 2 =>
        val s0 = cnt(0, "Slugline"); val a0 = cnt(0, "Action")
        val t1 = cnt(0, "Transition"); val c1 = cnt(0, "Character"); val p1 = cnt(0, "Paren")
        if (c1 + p1 == size(1)) {
          out("Dialog") = lkeys(0); out("Character") = lkeys(1); out("Paren") = lkeys(1)
        } else if (s0 > 0 || a0 > 0 || t1 > 0) {
          out("Slugline") = lkeys(0); out("Action") = lkeys(0); out("Transition") = lkeys(1)
        } else return None
        Some(out)
      case 3 =>
        val c1 = cnt(1, "Character"); val c2 = cnt(2, "Character")
        val p1 = cnt(1, "Paren"); val p2 = cnt(2, "Paren")
        if (c2 == 0 || c1 > c2) return None
        if (p1 == size(1)) {
          out("Dialog") = lkeys(0); out("Paren") = lkeys(1); out("Character") = lkeys(2)
        } else {
          out("Slugline") = lkeys(0); out("Action") = lkeys(0)
          out("Dialog") = lkeys(1); out("Character") = lkeys(2)
          out("Paren") = if (p1 >= p2) lkeys(1) else lkeys(2)
        }
        Some(out)
      case 4 =>
        val p1 = cnt(1, "Paren"); val p2 = cnt(2, "Paren")
        val c2 = cnt(2, "Character"); val c3 = cnt(3, "Character")
        val t3 = cnt(3, "Transition")
        if (c3 != 0 && p2 == size(2)) {
          if (p1 == size(1)) {
            out("Dialog") = lkeys(0)
            out("Paren") = if (p1 >= p2) lkeys(1) else lkeys(2)
            out("Character") = lkeys(3)
          } else {
            out("Slugline") = lkeys(0); out("Action") = lkeys(0)
            out("Dialog") = lkeys(1); out("Paren") = lkeys(2); out("Character") = lkeys(3)
          }
        } else if (c2 > 0 && t3 > 0) {
          out("Slugline") = lkeys(0); out("Action") = lkeys(0)
          out("Dialog") = lkeys(1)
          out("Paren") = if (p1 >= p2) lkeys(1) else lkeys(2)
          out("Character") = lkeys(2); out("Transition") = lkeys(3)
        } else return None
        Some(out)
      case _ => None
    }
  }
}
