package graft.synth

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic screenplay documents in pdftohtml-XML shape
  * (see FIXTURES.md §2a), together with the extraction output the engine is
  * expected to produce for them. The expectation builder is an independent
  * derivation from the layout grammar (standard indents + margin rules),
  * NOT a second run of the extractor — so generator + extractor check each
  * other end-to-end.
  *
  * Geometry (all px at 72 dpi, zoom 1, page 918x1188 -> "A4" by the
  * reference's >800 rule, ParseText.php:275):
  *   slugline/action x=108, dialog x=252, paren x=324, character x=396,
  *   transition right-aligned x=650; line height attr 17; same-block step
  *   24px (no synthesized blank), block gap 36px (one blank, consumed by
  *   the follower's margin), slugline/shot gap 48px (two blanks).
  */
object ScreenplayGen {

  sealed trait Elem
  final case class Slug(text: String) extends Elem
  final case class Act(text: String) extends Elem // Action; may wrap lines
  final case class Chr(name: String) extends Elem
  final case class Dia(lines: Vector[String]) extends Elem
  final case class Par(text: String) extends Elem
  final case class Trans(text: String) extends Elem
  /** side-by-side dual dialog (C10): left/right Character rows share a
    * top, dialog columns at the canonical dual offsets. `tight` = left
    * lines long enough (27-35 chars) that the inter-column gap falls
    * under 12 spaces, so each row assembles into ONE block piece and the
    * recovery must take its gap-SPLIT path (ParseText.php:1455-1496) —
    * which, per the reference, rebuilds the right column with EMPTY
    * colors/attrs maps (the right dual object loses its revision spans).
    * Tight duals always have equal row counts.
    */
  final case class Dual(nameL: String, linesL: Vector[String],
      nameR: String, linesR: Vector[String], tight: Boolean = false) extends Elem

  final case class Doc(xml: String, expected: Vector[(String, String, Int, String)],
      dualMeta: Vector[(Int, Boolean, Boolean)] = Vector.empty,
      revExpected: Vector[(Long, String, String, Long)] = Vector.empty,
      /** A5 expectation (marginLineNumbers mode): the line-number side
        * vote table the engine must produce — (json type, left, right)
        * for each type where a side wins, sorted by type */
      voteExpected: Vector[(String, Boolean, Boolean)] = Vector.empty,
      /** revision-mode per-line expectation, aligned 1:1 with expected:
        * the canonical rendering of each line's revision spans —
        * "w:s-e" tokens sorted LEXICOGRAPHICALLY and joined with "|"
        * (matches a Spark-side sort_array), "" when the line has none.
        * w is the revision's weight (= index into the final revisions
        * list), s/e the span's code-point [start, end) in the object
        * text. */
      lineRevsExpected: Vector[String] = Vector.empty,
      /** continuedBands-mode expectation: the turn-level
        * (scene_continued_top, scene_continued_bottom,
        * scene_continued_number) flag triple. */
      contExpected: (Boolean, Boolean, Boolean) = (false, false, false),
      /** inlineStyles-mode expectation, aligned 1:1 with expected: the
        * canonical rendering of each line's b/i spans — "tag:s-e" tokens
        * (INCLUSIVE code-point ends, the reference's convention) sorted
        * lexicographically, joined with "|"; "" when none. */
      lineAttrsExpected: Vector[String] = Vector.empty)
  // expected tuples: (kind, text, pageNum, givenPageNum)
  // dualMeta (aligned 1:1 with expected when non-empty): the
  // (column, has_dual, is_dual) the engine's WriteOutput-style column
  // tracking assigns each line — (1,true,false) left Character,
  // (1,false,false) left Dialog, (2,false,true) right Character,
  // (2,false,false) right Dialog, (0,false,false) everything else

  private val words = Vector("the", "quick", "brown", "fox", "jumps", "over",
    "a", "lazy", "dog", "near", "old", "barn", "while", "rain", "falls",
    "softly", "on", "tin", "roof", "and", "wind", "moves", "through", "tall",
    "grass", "outside", "town")
  private val places = Vector("HOUSE", "OFFICE", "CAR", "STREET", "BARN",
    "KITCHEN", "ROOFTOP", "ALLEY", "DINER", "PARK")
  private val times = Vector("DAY", "NIGHT", "MORNING", "SUNSET", "LATER")
  private val names = Vector("ALICE", "BOB", "CAROL", "DAVE", "ERIN",
    "FRANK", "GRACE", "HELEN")
  private val transitions = Vector("CUT TO:", "FADE OUT", "DISSOLVE TO:",
    "SMASH CUT TO:")

  private def sentence(r: java.util.SplittableRandom, n: Int): String = {
    val ws = (0 until n).map(_ => words(r.nextInt(words.length)))
    ws.head.capitalize + ws.tail.map(" " + _).mkString + "."
  }

  /** [[elements]] plus occasional dual-dialog exchanges — kept out of the
    * default stream so existing seed-derived corpora/goldens/snapshots
    * stay byte-identical.
    */
  def elementsWithDual(seed: Long, nScenes: Int): Vector[Elem] = {
    val r = new java.util.SplittableRandom(seed ^ 0xD0A1L)
    val base = elements(seed, nScenes)
    val out = ArrayBuffer.empty[Elem]
    base.foreach { e =>
      out += e
      if (e.isInstanceOf[Dia] && r.nextInt(3) == 0) {
        val nL = names(r.nextInt(names.length))
        var nR = names(r.nextInt(names.length))
        if (nR == nL) nR = names((names.indexOf(nL) + 1) % names.length)
        // LEFT lines stay two words: a left line reaching within 12
        // spaces (84px) of the right column at 450 would merge into one
        // block piece and go through the recovery's SPLIT path, whose
        // output splice the hand fixtures pin — this family exercises the
        // clean-column combine path across seeds
        def speechL(): Vector[String] =
          (0 until 1 + r.nextInt(3)).map(_ => sentence(r, 2)).toVector
        def speechR(): Vector[String] =
          (0 until 1 + r.nextInt(3)).map(_ => sentence(r, 2 + r.nextInt(3))).toVector
        out += Dual(nL, speechL(), nR, speechR())
      }
    }
    out.toVector
  }

  /** [[elementsWithDual]] plus TIGHT duals (every third dual): the
    * gap-split recovery path family. A separate stream so the q32 dual
    * corpus and its goldens stay byte-identical.
    */
  def elementsWithDualTight(seed: Long, nScenes: Int): Vector[Elem] = {
    val r = new java.util.SplittableRandom(seed ^ 0x719A7L)
    var dualIdx = 0
    elementsWithDual(seed, nScenes).map {
      case d: Dual =>
        dualIdx += 1
        if (dualIdx % 3 == 0) {
          // left lines sized 27-35 chars: the assembled row's column gap
          // is then 3-11 spaces (< 12, one piece; >= 3, a splittable run)
          def tightLine(): String = {
            var s = sentence(r, 5)
            var tries = 0
            while ((s.length < 27 || s.length > 35) && tries < 30) {
              s = sentence(r, 4 + r.nextInt(3)); tries += 1
            }
            while (s.length < 27) s = s.dropRight(1) + " just about now."
            if (s.length > 35) s = s.substring(0, 34).trim + "."
            s
          }
          val n = 1 + r.nextInt(3)
          Dual(d.nameL, Vector.fill(n)(tightLine()),
            d.nameR, Vector.fill(n)(sentence(r, 2 + r.nextInt(2))), tight = true)
        } else d
      case e => e
    }
  }

  /** A seeded screenplay element stream. */
  def elements(seed: Long, nScenes: Int): Vector[Elem] = {
    val r = new java.util.SplittableRandom(seed)
    val out = ArrayBuffer.empty[Elem]
    for (_ <- 0 until nScenes) {
      out += Slug(s"INT. ${places(r.nextInt(places.length))} - ${times(r.nextInt(times.length))}")
      // Action referencing a character so the verb regex fires
      out += Act(s"${names(r.nextInt(names.length)).toLowerCase.capitalize} walks in. " + sentence(r, 4 + r.nextInt(5)))
      val nSpeeches = 1 + r.nextInt(3)
      for (_ <- 0 until nSpeeches) {
        out += Chr(names(r.nextInt(names.length)))
        if (r.nextInt(3) == 0) out += Par("(" + words(r.nextInt(words.length)) + ")")
        val nLines = 1 + r.nextInt(3)
        out += Dia((0 until nLines).map(_ => sentence(r, 3 + r.nextInt(4))).toVector)
      }
      if (r.nextInt(3) == 0) out += Trans(transitions(r.nextInt(transitions.length)))
    }
    out.toVector
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  final case class Options(
      titlePage: Boolean = true,
      headerText: String = "",   // e.g. "MY SCRIPT - draft"
      pageNumbers: Boolean = true,
      title: String = "A Synthetic Script",
      author: String = "Gen Erator",
      /** split body lines into two fragments with an exact pixel gap and
        * jitter the second fragment's top by ±2 px — the extractor's
        * y-cluster + gap-merge must reassemble them, leaving the expected
        * output unchanged (G1/G2 invariance)
        */
      fragmentJitter: Boolean = false,
      /** A4/A5 corpus mode: colored draft revisions as (header name, hex).
        * When non-empty, each body page's header carries one revision's
        * name and that page's Dialog lines render in revision colors —
        * single-color "key pages" bind (name, color) pairs exactly as the
        * reference's handle_key_name rule expects (ParseText.php:831-845),
        * and designated mixed pages carry a second, already-bound color to
        * exercise the weight-list bump (Parser.php:377-382). The expected
        * final (rank, name, color, span count) list is derived by
        * [[Doc.revExpected]] from the render-time page log via an
        * independent simulation of Parser.php:239-486's weight dynamics.
        */
      revisions: Vector[(String, String)] = Vector.empty,
      /** A5 corpus mode: emit a margin line-number token (left=36,
        * < 7 chars) beside every body line — the reference's left
        * line-number capture (ParseText.php:492-497) strips it into the
        * number object and the per-type side vote (Parser.php:193-237)
        * must then elect "left" for every type whose objects are mostly
        * non-blank. [[Doc.voteExpected]] carries the expected table.
        */
      marginLineNumbers: Boolean = false,
      /** C7 corpus mode: a scene-number token ("N", left=70) beside every
        * body slugline. x=70 escapes the left margin capture (< 65,
        * ParseText.php:492-497) and the small gap to the slug at x=108
        * (< 12 spaces) merges it INTO the slugline piece, where the
        * leading-token strip must remove it (ParseText.php:1317-1326 +
        * slug classification) — expected slug text is unchanged.
        */
      sceneNumbers: Boolean = false,
      /** F6 corpus mode: every third Character heading is drawn with a
        * " (CONT'D)" suffix; the whiteout (ParseText.php:1014-1053) must
        * erase it so the expected Character text is the bare name.
        */
      contdMarkers: Boolean = false,
      /** F2 corpus mode: body pages carry a "CONTINUED:" token in the
        * header band (top=36 <= inch/2+14) — numbered "CONTINUED: (p)"
        * on even body pages — and a "(CONTINUED)" token in the footer
        * band (top=1150 > pageH-inch/2-29). Both must be stripped with
        * the scene_continued flags set (ParseText.php:369-398);
        * [[Doc.contExpected]] carries the expected (top, bottom, number)
        * flag triple.
        */
      continuedBands: Boolean = false,
      /** S2/X16 corpus mode: every third Dialog line wraps one word in a
        * <b>/<i> child (alternating); the tokenizer must record the span
        * as an inclusive code-point range (sxiToArray,
        * ParseText.php:76-94) that survives line assembly, the block
        * split and the object merge — [[Doc.lineAttrsExpected]] carries
        * the canonical expected string per line.
        */
      inlineStyles: Boolean = false)

  /** Render elements to pdftohtml-style XML and derive the expected
    * extraction output.
    */
  def render(elems: Vector[Elem], opts: Options = Options()): Doc = {
    val pageW = 918
    val pageH = 1188
    val lineH = 17
    val xSlug = 108; val xDia = 252; val xPar = 324; val xChr = 396; val xTrans = 650
    val maxTop = pageH - 100 // stay clear of the footer/CONTINUED bands
    val charW = 7

    val xml = new StringBuilder
    xml.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<pdf2xml producer=\"synthetic\" version=\"1\">\n")
    val expected = ArrayBuffer.empty[(String, String, Int, String)]
    // expected-index -> (column, has_dual, is_dual) for dual splice rows;
    // every unlisted index is (0, false, false)
    val dualAt = scala.collection.mutable.Map.empty[Int, (Int, Boolean, Boolean)]
    // expected-index -> colored spans (palette revId, start, endExcl) in
    // the object's joined text; resolved to weights once the final
    // revision list is known
    val lineRevs = scala.collection.mutable.Map.empty[Int, Vector[(Int, Int, Int)]]
    // expected-index -> (tag, start, endIncl) b/i spans at object offsets
    val lineAttrs = scala.collection.mutable.Map.empty[Int, Vector[(String, Int, Int)]]
    var sceneCounter = 0
    var chrCounter = 0
    var styleCounter = 0

    var pageNo = 0 // printed page number
    var bodyPageCount = 0

    // ---- revision-corpus state (opts.revisions nonEmpty) -----------------
    val revPalette = opts.revisions
    // revisions that got a single-color page with at least one colored
    // line — eligible to appear on mixed pages (guarantees no UNKNOWNs)
    val keyBound = mutable.LinkedHashSet.empty[Int]
    var nextSingle = 0
    var curPrimary = -1
    var curSecondary = -1 // -1: single-color page plan
    var diaOnPage = 0
    // per body page: (header name, DRAWN colored rev ids in first-use
    // order, OBJECT-LEVEL colored rev ids). The two differ exactly when a
    // tight dual's right column loses its color through the recovery's
    // gap-split path (empty colors maps, ParseText.php:1455-1496): key
    // pages derive from fontspec/frag colors (drawn), but the engine's
    // revision second pass walks OBJECT colors (Parser.php:311-405), so
    // the bump must be simulated over what the objects actually carry.
    val revPageLog = ArrayBuffer.empty[(String, ArrayBuffer[Int], ArrayBuffer[Int])]
    val revSpans = mutable.Map.empty[Int, Long]

    var lastMarginTop = -1 // one margin token per rendered row (dual rows draw twice)
    var contTop = false; var contBottom = false; var contNum = false

    def openPage(hdrText: String = opts.headerText): Unit = {
      pageNo += 1
      lastMarginTop = -1
      xml.append(s"""<page number="$pageNo" position="absolute" top="0" left="0" height="$pageH" width="$pageW">\n""")
      xml.append(s"""\t<fontspec id="0" size="12" family="Courier" color="#000000"/>\n""")
      revPalette.zipWithIndex.foreach { case ((_, hex), i) =>
        xml.append(s"""\t<fontspec id="${i + 1}" size="12" family="Courier" color="$hex"/>\n""")
      }
      if (hdrText.nonEmpty && pageNo > 1)
        xml.append(s"""\t<text top="36" left="$xSlug" width="${hdrText.length * charW}" height="$lineH" font="0">${esc(hdrText)}</text>\n""")
      if (opts.continuedBands && pageNo > 1) {
        // header-band CONTINUED token (strip band: top <= inch/2 + 14,
        // ParseText.php:369-386); even pages use the numbered form so the
        // scene_continued_number flag path is exercised
        val t = if (pageNo % 2 == 0) s"CONTINUED: ($pageNo)" else "CONTINUED:"
        xml.append(s"""\t<text top="36" left="500" width="${t.length * charW}" height="$lineH" font="0">${esc(t)}</text>\n""")
        contTop = true
        if (pageNo % 2 == 0) contNum = true
      }
      if (opts.pageNumbers && pageNo > 1)
        xml.append(s"""\t<text top="36" left="810" width="${(pageNo.toString + ".").length * charW}" height="$lineH" font="0">$pageNo.</text>\n""")
    }
    def closePage(): Unit = {
      if (opts.continuedBands && pageNo > 1) {
        // footer-band (CONTINUED) token (strip band: top > pageH - inch/2
        // - 29, ParseText.php:388-398)
        xml.append(s"""\t<text top="1150" left="400" width="${11 * charW}" height="$lineH" font="0">(CONTINUED)</text>\n""")
        contBottom = true
      }
      xml.append("</page>\n")
    }

    val jitterRnd = new java.util.SplittableRandom(0x5eed)
    var marginNumCounter = 0
    /** fragment char ranges (in line-local offsets) emitted by the LAST
      * textLine call — [(0, len)] unsplit, [(0, mid+1), (mid+1, len)]
      * under fragmentJitter. Span expectations read this instead of
      * re-deriving the split, so generator and expectation can never
      * disagree on where a jittered line broke.
      */
    var lastFragSpans: Vector[(Int, Int)] = Vector.empty


    /** textLine variant with one styled child: the line's [s0, e1)
      * char range renders inside a <tag> element (tag = "b"/"i").
      */
    def styledTextLine(top: Int, left: Int, s: String, font: Int,
        s0: Int, e1: Int, tag: String): Unit = {
      if (opts.marginLineNumbers && pageNo > 1 && top != lastMarginTop) {
        marginNumCounter += 1
        lastMarginTop = top
        xml.append(s"""\t<text top="$top" left="36" width="${marginNumCounter.toString.length * charW}" height="$lineH" font="0">$marginNumCounter</text>\n""")
      }
      xml.append(s"""\t<text top="$top" left="$left" width="${s.length * charW}" height="$lineH" font="$font">""")
      xml.append(esc(s.substring(0, s0)))
      xml.append(s"<$tag>").append(esc(s.substring(s0, e1))).append(s"</$tag>")
      xml.append(esc(s.substring(e1)))
      xml.append("</text>\n")
      lastFragSpans = Vector((0, s.length))
    }

    def textLine(top: Int, left: Int, s: String, font: Int = 0): Unit = {
      if (opts.marginLineNumbers && pageNo > 1 && top != lastMarginTop) {
        marginNumCounter += 1
        lastMarginTop = top
        xml.append(s"""\t<text top="$top" left="36" width="${marginNumCounter.toString.length * charW}" height="$lineH" font="0">$marginNumCounter</text>\n""")
      }
      // split at a single-space word boundary roughly mid-line; the two
      // fragments abut exactly (gap < 7px adds 0 spaces; the space char
      // stays at the end of the first fragment so content is identical)
      val mid = s.indexOf(' ', s.length / 2)
      // don't split right-aligned/short lines: a fragment under 7 chars
      // past x=520 is a margin line number by the reference's rules
      // (ParseText.php:498-502) and would legitimately be captured
      if (opts.fragmentJitter && mid > 0 && mid < s.length - 1 &&
          left < 480 && s.length - mid >= 8) {
        val a = s.substring(0, mid + 1) // keep the space
        val b = s.substring(mid + 1)
        val leftB = left + a.length * charW
        val jitter = jitterRnd.nextInt(5) - 2 // -2..2
        xml.append(s"""\t<text top="$top" left="$left" width="${a.length * charW}" height="$lineH" font="$font">${esc(a)}</text>\n""")
        xml.append(s"""\t<text top="${top + jitter}" left="$leftB" width="${b.length * charW}" height="$lineH" font="$font">${esc(b)}</text>\n""")
        lastFragSpans = Vector((0, mid + 1), (mid + 1, s.length))
      } else {
        xml.append(s"""\t<text top="$top" left="$left" width="${s.length * charW}" height="$lineH" font="$font">${esc(s)}</text>\n""")
        lastFragSpans = Vector((0, s.length))
      }
    }

    // title page (fly page): a handful of centered lines
    if (opts.titlePage) {
      openPage()
      textLine(300, (pageW - opts.title.length * charW) / 2, opts.title)
      textLine(360, (pageW - 10 * charW) / 2, "written by")
      textLine(420, (pageW - opts.author.length * charW) / 2, opts.author)
      closePage()
      // expected: blanks synthesized from top padding 72 up to each line,
      // then Title / Text / Author; fly-page margins are NOT blank-trimmed
      val blanks1 = countBlanks(72, 300)
      val blanks2 = countBlanks(300 + lineH, 360)
      val blanks3 = countBlanks(360 + lineH, 420)
      for (_ <- 0 until blanks1) expected += (("Text", "", 1, ""))
      expected += (("Title", opts.title, 1, ""))
      for (_ <- 0 until blanks2) expected += (("Text", "", 1, ""))
      expected += (("Text", "written by", 1, ""))
      for (_ <- 0 until blanks3) expected += (("Text", "", 1, ""))
      expected += (("Author", opts.author, 1, ""))
    }

    // body pages
    var top = 0
    var curPageNum = 0 // engine page numbering: fly page = 1, body starts at 2
    def givenOf(p: Int): String = if (opts.pageNumbers && p >= 2) p.toString else ""

    // one renderable piece: (kind, lines, x, gap-from-previous-line)
    def piece(e: Elem): (String, Vector[String], Int, Int) = e match {
      case Slug(t)  => ("Slugline", Vector(t), xSlug, 48)
      case Act(t)   => ("Action", wrap(t, 55), xSlug, 36)
      case Chr(n)   => ("Character", Vector(n), xChr, 36)
      case Par(t)   => ("Paren", Vector(t), xPar, 24)
      case Dia(ls)  => ("Dialog", ls, xDia, 24)
      case Trans(t) => ("Transition", Vector(t), xTrans, 36)
      case _: Dual  => throw new IllegalStateException("Dual renders via emitDual")
    }

    var fresh = false // a page is open with no body line yet
    def newPage(): Unit = {
      if (!fresh && bodyPageCount > 0) closePage()
      if (revPalette.nonEmpty) {
        // revision plan for the NEW body page: every third page (once two
        // revisions are key-bound) is a mixed page reusing already-bound
        // revisions; every other page introduces/cycles a single revision
        // and is a key page by construction
        val bi = bodyPageCount + 1
        if (bi % 3 == 0 && keyBound.size >= 2) {
          val bound = keyBound.toVector
          curPrimary = bound((bi / 3) % bound.size)
          curSecondary = bound((bi / 3 + 1) % bound.size)
        } else {
          curPrimary = nextSingle % revPalette.length
          nextSingle += 1
          curSecondary = -1
        }
        diaOnPage = 0
        revPageLog += ((revPalette(curPrimary)._1, ArrayBuffer.empty[Int],
          ArrayBuffer.empty[Int]))
        openPage(revPalette(curPrimary)._1)
      } else openPage()
      bodyPageCount += 1
      curPageNum = bodyPageCount + 1 // engine: body always starts at page 2
      top = 0
      fresh = true
    }

    /** font id for the lines of one piece: Dialog lines in revision mode
      * render in the page's revision colors (first Dialog of a mixed page
      * takes the primary, the second the secondary, the rest the primary
      * again); everything else stays black so every page keeps a black
      * font id and mixed pages never key-bind (3 ids >= the reference's
      * limit, ParseText.php:923-968).
      */
    def fontFor(kind: String, nLines: Int, objectLevel: Boolean = true): Int =
      if (revPalette.isEmpty || kind != "Dialog" || curPrimary < 0) 0
      else {
        diaOnPage += 1
        val rv = if (diaOnPage == 2 && curSecondary >= 0) curSecondary else curPrimary
        if (curSecondary < 0 && !keyBound.contains(curPrimary)) keyBound += curPrimary
        revPageLog.last._2 += rv
        if (objectLevel) revPageLog.last._3 += rv
        revSpans(rv) = revSpans.getOrElse(rv, 0L) + nLines
        1 + rv
      }

    /** Emit a dual-dialog exchange (C10 canonical layout, mirroring the
      * geometry the reference's recovery pass expects: character row at
      * 252/480, dialog columns at 180/450). Expected output is the
      * recovery's splice order: left Character (hasDualLine) + merged left
      * Dialog, then right Character (isDualLine) + merged right Dialog.
      */
    def emitDual(d: Dual): Unit = {
      val rows = 1 + math.max(d.linesL.length, d.linesR.length)
      val needed = (if (fresh) 79 else top + 36) + (rows - 1) * 24
      if (bodyPageCount == 0 || (!fresh && needed > maxTop)) newPage()
      top = if (fresh) 79 else top + 36
      fresh = false
      // revision mode: both dual dialog columns are colored (two Dialog
      // pieces as far as the page's revision plan is concerned) — the
      // splice must carry the color spans through to the merged objects
      val fontL = fontFor("Dialog", d.linesL.length)
      // Does the RIGHT column's color survive anywhere at OBJECT level?
      // Every span of it can clamp degenerate (maybe_break_up_last_dialog
      // clamps Dialog spans to [0, len)): in the LEFT object the phantom
      // span (pre_i + lenL_i, ...) survives iff some row precedes the
      // last left row (nL >= 2); in the RIGHT object (clean path only —
      // the tight/gap-split path rebuilds the right column with empty
      // color maps) a span survives iff a right-only row exists
      // (nR > nL) or some row's pre_R(i) + lenL_i < totalR. The engine's
      // revision second pass walks object colors (Parser.php:311-405),
      // so a color that survives nowhere must stay out of the simulated
      // page set — seed-65 regression: a 1x1 dual carrying the page's
      // only secondary-color line dropped it entirely.
      val objectLevelR: Boolean = {
        val nL = d.linesL.length; val nR = d.linesR.length
        if (d.tight) nR >= 2
        else {
          val viaLeft = nL >= 2
          val totalR = d.linesR.map(_.length).sum + (nR - 1)
          val preR = d.linesR.indices.map(i => d.linesR.take(i).map(_.length + 1).sum)
          val viaRight = nR > nL ||
            (0 until math.min(nL, nR)).exists(i => preR(i) + d.linesL(i).length < totalR)
          viaLeft || viaRight
        }
      }
      val fontR = fontFor("Dialog", d.linesR.length, objectLevel = objectLevelR)
      textLine(top, xDia, d.nameL)
      textLine(top, 480, d.nameR)
      var i = 0
      val nRows = math.max(d.linesL.length, d.linesR.length)
      val leftFrags = new Array[Vector[(Int, Int)]](d.linesL.length)
      val rightFrags = new Array[Vector[(Int, Int)]](d.linesR.length)
      while (i < nRows) {
        top += 24
        if (i < d.linesL.length) {
          textLine(top, 180, d.linesL(i), fontL)
          leftFrags(i) = lastFragSpans
        }
        if (i < d.linesR.length) {
          textLine(top, 450, d.linesR(i), fontR)
          rightFrags(i) = lastFragSpans
        }
        i += 1
      }
      // Engine-faithful span derivation through the dual splice: the
      // block-piece split hands each piece its FULL line's color spans
      // un-rebased (ParseText.php:1056-1110), a fragment's span starts
      // BEFORE its inter-fragment gap spaces (ParseText.php:515-524), the
      // vertically-merged column objects shift each row's line spans by
      // the joined-text prefix (ParseText.php's implode semantics), and
      // every Dialog object clamps spans to [0, len(text)) via
      // maybe_break_up_last_dialog (ParseText.php:2610-2696) with
      // degenerate spans dropped by the revision rewrite
      // (Parser.php:451-465). So a dual row "Town rain." | "Outside on
      // quick." leaves the LEFT object span (0,10) (its phantom right
      // span clamps to degenerate) and the RIGHT object the quirky
      // triple (0,10),(10,38),(18,38).
      // line-level spans per dual row, each under ITS fragment's color,
      // one span PER EMITTED FRAGMENT (jitter can split the right column
      // into two abutting fragments): (revId, start, endExcl) in the
      // row's assembled-line offsets. The FIRST right fragment's span
      // starts BEFORE its inter-column gap spaces (:515-524); subsequent
      // right fragments abut (zero gap).
      def lineSpans(i: Int): Vector[(Int, Int, Int)] = {
        val hasL = i < d.linesL.length
        val lenL = if (hasL) d.linesL(i).length else 0
        val out = Vector.newBuilder[(Int, Int, Int)]
        if (hasL && fontL > 0)
          leftFrags(i).foreach { case (fs, fe) => out += ((fontL - 1, fs, fe)) }
        if (i < d.linesR.length && fontR > 0) {
          if (hasL) {
            val gap = (450 - (180 + charW * lenL)) / charW
            rightFrags(i).zipWithIndex.foreach { case ((fs, fe), k) =>
              val s0 = if (k == 0) lenL else lenL + gap + fs
              out += ((fontR - 1, s0, lenL + gap + fe))
            }
          } else {
            rightFrags(i).foreach { case (fs, fe) => out += ((fontR - 1, fs, fe)) }
          }
        }
        out.result()
      }
      def colSpans(col: Vector[String]): Vector[(Int, Int, Int)] = {
        val total = col.map(_.length).sum + (col.length - 1)
        val prefixes = col.indices.map(i => col.take(i).map(_.length + 1).sum)
        col.indices.flatMap { i =>
          lineSpans(i).map { case (rv, s, e) =>
            (rv, math.min(s + prefixes(i), total), math.min(e + prefixes(i), total))
          }
        }.filter(t => t._2 != t._3).toVector
      }
      dualAt(expected.length) = (1, true, false)
      expected += (("Character", d.nameL, curPageNum, givenOf(pageNo)))
      dualAt(expected.length) = (1, false, false)
      locally {
        val sp = colSpans(d.linesL)
        if (sp.nonEmpty) lineRevs(expected.length) = sp
      }
      expected += (("Dialog", d.linesL.mkString(" "), curPageNum, givenOf(pageNo)))
      dualAt(expected.length) = (2, false, true)
      expected += (("Character", d.nameR, curPageNum, givenOf(pageNo)))
      dualAt(expected.length) = (2, false, false)
      locally {
        // tight duals go through the recovery's gap-SPLIT path, which
        // rebuilds the right column with EMPTY colors/attrs maps
        // (ParseText.php:1455-1496 passes none into the new pieces) —
        // the right object therefore carries NO revision spans
        val sp = if (d.tight) Vector.empty else colSpans(d.linesR)
        if (sp.nonEmpty) lineRevs(expected.length) = sp
      }
      expected += (("Dialog", d.linesR.mkString(" "), curPageNum, givenOf(pageNo)))
    }

    /** Emit a group atomically on one page. A Character split from its
      * Dialog across a page break would trigger the engine's orphan-
      * character rule (ParseText.php:1384-1405) — groups avoid that.
      */
    def emitGroup(group: Vector[Elem]): Unit = {
      val ps = group.map(piece)
      // simulate to check fit on the current page
      var t = top
      var f = fresh
      ps.foreach { case (_, lines, _, gap) =>
        t = if (f) 79 else t + gap // 79: no synthesized blank (79-8 < 72)
        f = false
        t += (lines.length - 1) * 24
      }
      if (bodyPageCount == 0 || (!fresh && t > maxTop)) newPage()
      ps.foreach { case (kind, lines, x, gap) =>
        top = if (fresh) 79 else top + gap
        fresh = false
        val font = fontFor(kind, lines.length)
        // C7: scene-number token beside the slugline; merges into the slug
        // piece (gap < 12 spaces) where the leading-token strip removes it
        if (kind == "Slugline" && opts.sceneNumbers) {
          sceneCounter += 1
          val sn = sceneCounter.toString
          xml.append(s"""\t<text top="$top" left="70" width="${sn.length * charW}" height="$lineH" font="0">$sn</text>\n""")
        }
        // F6: every third Character heading drawn with a CONT'D marker the
        // whiteout must erase (expected text stays the bare name)
        val drawLines =
          if (kind == "Character" && opts.contdMarkers) {
            chrCounter += 1
            if (chrCounter % 3 == 1) lines.map(_ + " (CONT'D)") else lines
          } else lines
        val fragsPerLine = new Array[Vector[(Int, Int)]](drawLines.length)
        if (kind == "Dialog" && opts.inlineStyles) {
          // every third Dialog line styles its second word (alternating
          // b/i); expected spans use INCLUSIVE code-point ends at the
          // merged object's offsets (each line shifts by the joined
          // prefix, exactly the engine's textAndSpans arithmetic)
          val attrsB = Vector.newBuilder[(String, Int, Int)]
          var pre = 0
          lines.zipWithIndex.foreach { case (s, i) =>
            styleCounter += 1
            var styled = false
            if (styleCounter % 3 == 0) {
              val tag = if ((styleCounter / 3) % 2 == 0) "b" else "i"
              val sp1 = s.indexOf(' ')
              val s0 = if (sp1 < 0) 0 else sp1 + 1
              val spN = s.indexOf(' ', s0)
              val e1 = if (spN < 0) s.length else spN
              if (e1 > s0) {
                styledTextLine(top + i * 24, x, s, font, s0, e1, tag)
                attrsB += ((tag, pre + s0, pre + e1 - 1))
                styled = true
              }
            }
            if (!styled) textLine(top + i * 24, x, s, font)
            fragsPerLine(i) = lastFragSpans
            pre += s.length + 1
          }
          val a = attrsB.result()
          if (a.nonEmpty) lineAttrs(expected.length) = a
        } else {
          drawLines.zipWithIndex.foreach { case (s, i) =>
            textLine(top + i * 24, x, s, font)
            fragsPerLine(i) = lastFragSpans
          }
        }
        top += (lines.length - 1) * 24
        if (font > 0) {
          // one color span PER EMITTED FRAGMENT: a jitter-split line
          // contributes two abutting spans (the gap between abutting
          // fragments is zero, so line-level offsets equal local ones)
          var pre = 0
          val rb = Vector.newBuilder[(Int, Int, Int)]
          lines.zipWithIndex.foreach { case (s, i) =>
            fragsPerLine(i).foreach { case (fs, fe) => rb += ((font - 1, pre + fs, pre + fe)) }
            pre += s.length + 1
          }
          lineRevs(expected.length) = rb.result()
        }
        expected += ((kind, lines.mkString(" "), curPageNum, givenOf(pageNo)))
      }
    }

    // group Chr (+Par) +Dia into speeches; everything else stands alone
    val groups = ArrayBuffer.empty[Vector[Elem]]
    var gi = 0
    while (gi < elems.length) {
      elems(gi) match {
        case _: Chr =>
          val g = ArrayBuffer[Elem](elems(gi))
          var j = gi + 1
          var stop = false
          while (j < elems.length && !stop) {
            elems(j) match {
              case _: Par | _: Dia => g += elems(j); j += 1
              case _               => stop = true
            }
          }
          groups += g.toVector
          gi = j
        case e => groups += Vector(e); gi += 1
      }
    }
    groups.foreach {
      case Vector(d: Dual) => emitDual(d)
      case g               => emitGroup(g)
    }
    if (top != 0) closePage()
    xml.append("</pdf2xml>\n")

    // Independent simulation of the reference's weight-list dynamics
    // (Parser.php:239-486) over the RECORDED page log, restricted to the
    // shapes this generator emits (every color key-bound before mixed
    // use, <=2 colors per page, header always the primary's name — so no
    // UNKNOWN revisions can arise):
    //  * first pass: one revision per color that has a key page (a page
    //    whose only non-black color is it), created in color-registration
    //    (= fontspec) order;
    //  * second pass per page: the header-matching revision is pulled out
    //    and re-inserted at the lowest weights-index among the page's
    //    other known colors (the bump, Parser.php:377-382);
    //  * final rank r in the engine's output = reversed weights position.
    val (revExpected: Vector[(Long, String, String, Long)], revRank: Map[Int, Int]) =
      if (revPalette.isEmpty) (Vector.empty, Map.empty[Int, Int])
      else {
        val weights = ArrayBuffer.empty[Int]
        for (c <- revPalette.indices)
          if (revPageLog.exists { case (_, cols, _) => cols.nonEmpty && cols.distinct == Seq(c) })
            weights += c
        for ((hdr, _, objColsBuf) <- revPageLog; if objColsBuf.nonEmpty) {
          val cols = objColsBuf.toVector.distinct
          val headerIdx = cols.find(ci => weights.contains(ci) && revPalette(ci)._1 == hdr)
          val h = headerIdx.map(weights.indexOf)
          val others = cols.filter(ci => !headerIdx.contains(ci) && weights.contains(ci))
          val s = if (others.isEmpty) None else Some(others.map(weights.indexOf).min)
          (h, s) match {
            case (Some(hi), Some(si)) =>
              val hold = weights.remove(hi)
              weights.insert(si, hold)
            case _ => ()
          }
        }
        val ordered = weights.reverse
        (ordered.zipWithIndex.map { case (c, rank) =>
          (rank.toLong, revPalette(c)._1, revPalette(c)._2, revSpans.getOrElse(c, 0L))
        }.toVector,
          ordered.zipWithIndex.map { case (c, rank) => c -> rank }.toMap)
      }

    // resolve recorded per-line spans to weights (= index in the final
    // revision list) and render canonically: "w:s-e" tokens sorted
    // LEXICOGRAPHICALLY (so a Spark-side sort_array produces the same
    // string without a numeric-sort UDF), joined with "|"
    val lineRevsExpected: Vector[String] =
      if (revPalette.isEmpty) Vector.empty
      else Vector.tabulate(expected.length) { i =>
        lineRevs.getOrElse(i, Vector.empty)
          .map { case (c, s, e) => s"${revRank.getOrElse(c, -1)}:$s-$e" }
          .sorted.mkString("|")
      }

    // A5 expectation: replicate the per-type side vote over the expected
    // object stream — an object is left-numbered iff it is a non-blank
    // body-page object (every drawn body line carries a margin token);
    // a side wins a type iff count/2 < sideCount (Parser.php:219-231)
    val voteExpected: Vector[(String, Boolean, Boolean)] =
      if (!opts.marginLineNumbers) Vector.empty
      else {
        val counts = mutable.LinkedHashMap.empty[String, (Int, Int)]
        expected.foreach { case (kind, text, page, _) =>
          val tp = graft.model.ScriptLine.typeJson(kind)
          val (c, l) = counts.getOrElse(tp, (0, 0))
          counts(tp) = (c + 1, l + (if (text.nonEmpty && page >= 2) 1 else 0))
        }
        counts.iterator.collect {
          case (tp, (c, l)) if c / 2 < l => (tp, true, false)
        }.toVector.sortBy(_._1)
      }

    val lineAttrsExpected: Vector[String] =
      if (!opts.inlineStyles) Vector.empty
      else Vector.tabulate(expected.length) { i =>
        lineAttrs.getOrElse(i, Vector.empty)
          .map { case (t, s0, e0) => s"$t:$s0-$e0" }.sorted.mkString("|")
      }

    Doc(xml.toString, expected.toVector,
      Vector.tabulate(expected.length)(i => dualAt.getOrElse(i, (0, false, false))),
      revExpected, voteExpected, lineRevsExpected,
      (contTop, contBottom, contNum), lineAttrsExpected)
  }

  /** blank lines the engine synthesizes between lastTopOffset and top
    * (ParseText.php:469-475)
    */
  private def countBlanks(lastTopOffset: Int, top: Int): Int = {
    var t = lastTopOffset
    var n = 0
    while (t <= top - 12 + 4) { n += 1; t += 12 }
    n
  }

  /** naive word wrap used only to build multi-line action blocks */
  private def wrap(s: String, width: Int): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    var cur = new StringBuilder
    s.split(" ").foreach { w =>
      if (cur.nonEmpty && cur.length + 1 + w.length > width) {
        out += cur.toString; cur = new StringBuilder
      }
      if (cur.nonEmpty) cur.append(' ')
      cur.append(w)
    }
    if (cur.nonEmpty) out += cur.toString
    out.toVector
  }
}
