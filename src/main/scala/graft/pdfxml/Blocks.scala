package graft.pdfxml

import graft.model.{NumberObj, Php, Span}

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Content-shape predicates (reference LooksLike.php:1-188). All regexes
  * precompiled; `find()` = PHP preg_match (unanchored).
  */
/** Precompiled pattern + thread-local REUSED Matcher. The predicates
  * below run several times per block per classification pass; a fresh
  * Matcher per call (the object + its three int[] work arrays) was ~17%
  * of the engine's per-doc allocation in the round-4 JFR profile.
  * reset(s) reuses the match-state arrays; semantics are identical.
  */
private[pdfxml] final class Re(val pattern: Pattern) {
  private val tl = new ThreadLocal[java.util.regex.Matcher] {
    override def initialValue(): java.util.regex.Matcher = pattern.matcher("")
  }
  @inline def find(s: CharSequence): Boolean = tl.get().reset(s).find()
}

object LooksLike {
  private def p(re: String) = new Re(Pattern.compile(re))
  private def pi(re: String) = new Re(Pattern.compile(re, Pattern.CASE_INSENSITIVE))

  private val trans1 = p("^FADE (IN|OUT|TO)")
  private val trans2 = p("^(JUMP |SLOW |WHIP )?(CUT|DISSOLVE|WIPE|PAN|PULL BACK) TO")
  private val trans3 = p("^(SMASH|SLAM) TO")
  private val trans4 = p("^(SMASH|SLAM) CUT")
  private val trans5 = p("^MUSIC BEGINS[:]?$")
  private val trans6 = p("^TRANSITION[.]?$")

  def transition(s: String): Boolean =
    Php.isUppercase(s) && (trans1.find(s) || trans2.find(s) ||
      trans3.find(s) || trans4.find(s) ||
      trans5.find(s) || trans6.find(s))

  // the regex forms of these are trivial anchored literals; string ops
  // avoid the per-call Matcher allocation on this very hot path
  private val timesOfDay = Array("DAY", "EVENING", "LATER", "MOMENTS LATER",
    "MORNING", "NIGHT", "SUNSET", "DAWN")
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  /** "[^A-Za-z]LIT$" as a string test */
  @inline private def endsWithNonAlphaThen(s: String, lit: String): Boolean =
    s.length > lit.length && s.endsWith(lit) && !isAlpha(s.charAt(s.length - lit.length - 1))

  def sceneheading(s: String): Boolean = {
    if (s.startsWith("INTERIOR") || s.startsWith("EXTERIOR")) return true
    // ^(INT|EXT|I/E)[ ./]
    if (s.length >= 4) {
      val c3 = s.charAt(3)
      if ((c3 == ' ' || c3 == '.' || c3 == '/') &&
          (s.startsWith("INT") || s.startsWith("EXT") || s.startsWith("I/E"))) return true
    }
    if (endsWithNonAlphaThen(s, "CONTINUOUS")) return true
    var i = 0
    while (i < timesOfDay.length) {
      if (endsWithNonAlphaThen(s, timesOfDay(i))) return true
      i += 1
    }
    false
  }

  private val slug1 = p("^TITLE CARD")
  private val slug2 = p("^SERIES OF SHOTS")
  private val slug3 = p("^MONTAGE")
  private val slug4 = p("^SUPER:")

  def slugline(s: String): Boolean =
    Php.isUppercase(s) && (sceneheading(s) || slug1.find(s) ||
      slug2.find(s) || slug3.find(s) || slug4.find(s))

  def seriesOrMontageSlugline(s: String): Boolean =
    slug2.find(s) || slug3.find(s)

  def sluglineOrTransition(s: String): Boolean = slugline(s) || transition(s)

  private val voOs = Vector("^m\\. ?o\\. ?s\\.?$", "^mos$", "^vo$", "^v\\. ?o\\.?$",
    "^os$", "^o\\. ?s\\.?$", "^off[- ]?screen$").map(pi)
  def voOrOs(s: String): Boolean = voOs.exists(_.find(s))

  private val voOsNotation = Vector("\\(vo\\)", "\\(os\\)", "\\(oc\\)",
    "\\(v\\. ?o.*\\)", "\\(o\\. ?s.*\\)", "\\(o\\. ?c.*\\)",
    "\\(off[- ]?screen.*\\)").map(pi)
  def containsVoOsNotation(s: String): Boolean =
    s.indexOf('(') >= 0 && voOsNotation.exists(_.find(s))

  private val voOsSuffix = Vector(" vo$", " os$", " oc$", " v\\. ?o.$",
    " o\\. ?s.$", " o\\. ?c.$").map(pi)
  def containsVoOs(s: String): Boolean = {
    // every pattern needs a space then v/o (any case) near the end
    val n = s.length
    if (n < 3) return false
    val tail = s.substring(math.max(0, n - 6))
    if (Php.indexOfIgnoreCase(tail, " v", 0) < 0 && Php.indexOfIgnoreCase(tail, " o", 0) < 0)
      return false
    voOsSuffix.exists(_.find(s))
  }

  def parenthetical(s: String): Boolean =
    s.nonEmpty && s.charAt(0) == '(' && s.charAt(s.length - 1) == ')' && !voOrOs(s)

  private val charEndPunct = p("[-!?.;…]$")
  /** LooksLike.php:104-133 */
  def character(s: String): Boolean = {
    if (Php.mbSubstr(s, 0, 1) == "(") return false
    if (containsVoOsNotation(s)) return true
    if (charEndPunct.find(s) && !containsVoOs(s)) return false
    val lim = if (Php.isUppercase(s)) 6 else 3
    if (Php.countOccurrences(s, " ") >= lim) return false
    true
  }

  private val theEnd1 = p("^T(HE|he) E(ND|nd)[.!?]?")
  private val theEnd2 = p("^END( AND CREDITS)?[.]?$")
  def theEnd(s: String): Boolean =
    theEnd1.find(s) || theEnd2.find(s) || s == "(END)"

  private val pageNum1 = p("^[0-9]+[A-Z]?\\.?$")
  private val pageNum2 = p("^\\([0-9]+[A-Z]?\\.?\\)$")
  def pageNumber(s: String): Boolean =
    s.nonEmpty && (pageNum1.find(s) || pageNum2.find(s))

  def sceneNumber(s: String): Boolean = {
    // ^[0-9]+[A-Z]?\.?$ — gate on a leading digit before the regex
    s.nonEmpty && s.charAt(0) >= '0' && s.charAt(0) <= '9' &&
      pageNum1.find(s)
  }

  private val hruleRe = p("^[-]*$")
  def hrule(s: String): Boolean = s.length > 10 && hruleRe.find(s)

  def changebar(lines: collection.Seq[String]): Boolean =
    lines.nonEmpty && lines.head == "*" && lines.forall(_ == "*")

  private val zipRe = p("[A-Z][A-Z],? [0-9]{5}(, USA)?$")
  private val phoneRe = p("[^0-9][0-9]{3}[-.][0-9]{3}[-.][0-9]{4}[^0-9]")
  def contactInfo(lines: collection.Seq[String]): Boolean =
    lines.exists(l => zipRe.find(l)) || lines.exists(l => phoneRe.find(l))

  private val date1 = p("^(.*[^0-9])?[0-9]?[0-9][-./][0-9]?[0-9][-./][0-9][0-9]([^0-9].*)?$")
  private val date2 = p("^(.*[^0-9])?[0-9]?[0-9][-./][0-9]?[0-9][-./](19|20)[0-9][0-9]([^0-9].*)?$")
  private val date3 = p("^(.*[^0-9])?(19|20)[0-9][0-9][-./][0-9]?[0-9][-./][0-9]?[0-9]([^0-9].*)?$")
  def containsDate(s: String): Boolean = {
    // all three patterns need a digit and a -./ separator — cheap gate
    var hasDigit = false
    var hasSep = false
    var i = 0
    while (i < s.length && !(hasDigit && hasSep)) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') hasDigit = true
      else if (c == '-' || c == '.' || c == '/') hasSep = true
      i += 1
    }
    hasDigit && hasSep &&
      (date1.find(s) || date2.find(s) || date3.find(s))
  }
}

/** get_series_indent (ParseText.php:1900-1920) — stateful via
  * DocFlags.seriesTimer; call order matters for parity.
  */
object SeriesIndent {
  private val re1 = Pattern.compile("^(\\(?[A-Z][.)]\\)?[ ]+)")
  private val re2 = Pattern.compile("^(\\(?[A-Z][.)]\\)?)$")
  def apply(text: String, flags: DocFlags): Int = {
    if (flags.seriesTimer == 0) return 0
    val m1 = re1.matcher(text)
    if (m1.find()) { flags.seriesTimer = 10; Php.mbLen(m1.group(1)) }
    else if (re2.matcher(text).find()) { flags.seriesTimer = 10; 999 }
    else { flags.seriesTimer -= 1; 0 }
  }
}

/** A block piece: one horizontal run of a line (reference NGText_BlockPiece,
  * ParseText.php:1939-1953). y is the line index within the page.
  */
final class BlockPiece(
    str: String,
    val x: Int,
    val y: Int,
    val width: Int,
    val colors: Map[Int, Vector[Span]],
    val fontSize: Int,
    val textAttributes: Map[String, Vector[Span]],
    val numberObject: NumberObj) {
  val text: String = Php.trim(str)
}

/** A 2-D text block (reference NGText_Block, ParseText.php:1955-2388). */
final class Block(piece: BlockPiece) {
  var x: Int = piece.x
  val y: Int = piece.y
  // capacity 1, not ArrayBuffer's default 16: most blocks stay
  // single-line, and the three 16-slot backing arrays per block were a
  // top per-doc allocation source (round-4 JFR)
  val lines: ArrayBuffer[String] = new ArrayBuffer(1)
  lines += piece.text
  var width: Int = piece.width
  var height: Int = 1
  var kind: String = ""
  var unsure: Boolean = false
  var hangingPunctuation: Boolean = false
  var maybes: Vector[String] = Vector.empty
  var hasDualLine: Boolean = false
  var isDualLine: Boolean = false
  val colors: ArrayBuffer[Map[Int, Vector[Span]]] = new ArrayBuffer(1)
  colors += piece.colors
  var fontSize: Int = piece.fontSize
  val textAttributes: ArrayBuffer[Map[String, Vector[Span]]] = new ArrayBuffer(1)
  textAttributes += piece.textAttributes
  var numberObject: NumberObj = piece.numberObject

  // joined-text cache: textAndSpans is consulted by several classifier
  // passes per block; invalidated on every lines mutation
  private var textCache: String = null
  def setLine(i: Int, s: String): Unit = { lines(i) = s; textCache = null }

  def isBlank: Boolean = height == 1 && lines(0) == ""
  def firstChar: String = Php.mbSubstr(lines(0), 0, 1)
  def lastChar: String = Php.mbSubstr(lines(lines.length - 1), -1)
  def isEntirelyParens: Boolean =
    (firstChar == "(" || firstChar == "[") && (lastChar == ")" || lastChar == "]")
  def isUppercaseSingleLine: Boolean = height == 1 && Php.isUppercase(lines(0))

  /** combine (ParseText.php:2008-2052) — vertical append only; a piece not
    * directly below the block is silently ignored (the reference's other
    * arms are disabled asserts).
    */
  def combine(piece: BlockPiece): Unit = {
    if (piece.y != this.y + this.height) return
    // (series_indent is never initialized in the reference, so the
    // "okay" arm never fires — x adjustments always apply)
    if (piece.x < this.x) {
      this.width += (this.x - piece.x)
      this.hangingPunctuation = true
    } else if (piece.x > this.x) {
      this.hangingPunctuation = true
    }
    lines += piece.text
    textCache = null
    colors += piece.colors
    val rightEdge = piece.x + piece.width
    width = math.max(width, rightEdge - x)
    height += 1
    fontSize = math.max(fontSize, piece.fontSize)
    textAttributes += piece.textAttributes
    numberObject = numberObject.mergedWith(piece.numberObject)
  }

  /** should_combine (ParseText.php:2053-2168). The reference's
    * `$intervening_blockpiece` is referenced but never bound (the
    * function takes one parameter), so that guard never fires.
    */
  def shouldCombine(piece: BlockPiece, flags: DocFlags): Boolean = {
    if (piece.fontSize != this.fontSize) return false
    if (piece.y == this.y + this.height && piece.text != "" && !isBlank) {
      // series-indent guards: the get_series_indent call sequence mutates
      // SERIES_TIMER, so the PHP evaluation order (short-circuit re-calls
      // at ParseText.php:2070-2082) is replicated exactly
      val a = SeriesIndent(lines(0), flags)
      var cond1 = false
      if (a > 0 && piece.x == this.x) cond1 = SeriesIndent(piece.text, flags) > 0
      if (cond1) {
        // A)  Some action. / B)  Some more action. -> separate blocks
        return false
      } else {
        val c = SeriesIndent(lines(0), flags)
        var cond2 = false
        if (c > 0) cond2 = piece.x == this.x + SeriesIndent(lines(0), flags)
        if (cond2) {
          // series continuation: allowed (the reference's undefined
          // $intervening_blockpiece guard is a no-op)
        } else {
          // allow 2 chars either direction (ParseText.php:2086-2093)
          val chars2 = 2 * Consts.DefaultCharWidth
          if (!(piece.x >= this.x - chars2 && piece.x <= this.x + chars2)) return false
        }
      }
      if (piece.text.charAt(0) == '(' || piece.text.charAt(0) == '[') {
        // don't merge parens into characters (ParseText.php:2095-2112)
        if (isUppercaseSingleLine) return false
        val p1 = Php.mbStrpos(piece.text, ")")
        val p2 = Php.mbStrpos(piece.text, "]")
        val len = Php.mbLen(piece.text)
        if ((p1 < 0 || p1 == len - 1) && (p2 < 0 || p2 == len - 1)) return false
      }
      if (isEntirelyParens) return false
      // consecutive wide all-caps lines combine unless next is a slugline
      if (piece.x == this.x && isUppercaseSingleLine && width > 50 &&
          Php.isUppercase(piece.text) && !LooksLike.slugline(piece.text))
        return true
    } else {
      return false
    }
    if (LooksLike.sluglineOrTransition(lines(0))) return false
    if (LooksLike.sluglineOrTransition(piece.text)) return false
    if (isUppercaseSingleLine && Block.upperThenLower.find(piece.text)) return false
    if (height == 1 && LooksLike.character(lines(0)) && LooksLike.parenthetical(piece.text)) return false
    true
  }

  /** get_text_and_colors (ParseText.php:2170-2211): join lines with a
    * single space (skipped after a trailing hyphen), shifting spans.
    */
  def textAndSpans: (String, Map[Int, Vector[Span]], Map[String, Vector[Span]]) = {
    var result = lines(0)
    var resultColors = colors(0)
    var resultTa = textAttributes(0)
    var lx = 1
    while (lx < lines.length) {
      if (!Block.hyphenEnd.find(result)) result += " "
      val prevLen = Php.mbLen(result)
      colors(lx).foreach { case (k, spans) =>
        val shifted = spans.map(sp => Span(sp.start + prevLen, sp.end + prevLen))
        resultColors = resultColors.updated(k, resultColors.getOrElse(k, Vector.empty) ++ shifted)
      }
      textAttributes(lx).foreach { case (k, spans) =>
        val shifted = spans.map(sp => Span(sp.start + prevLen, sp.end + prevLen))
        resultTa = resultTa.updated(k, resultTa.getOrElse(k, Vector.empty) ++ shifted)
      }
      result += lines(lx)
      lx += 1
    }
    (result, resultColors, resultTa)
  }
  /** joined text only (no span merge) — cached; the hot classifier path */
  def text: String = {
    if (textCache == null) {
      if (lines.length == 1) textCache = lines(0)
      else {
        val sb = new java.lang.StringBuilder
        sb.append(lines(0))
        var lx = 1
        while (lx < lines.length) {
          if (!Block.hyphenEnd.find(sb)) sb.append(' ')
          sb.append(lines(lx))
          lx += 1
        }
        textCache = sb.toString
      }
    }
    textCache
  }

  /** definitely_not_character (ParseText.php:2219-2223) */
  def definitelyNotCharacter: Boolean = {
    if (height != 1 && !text.contains('(') && !text.contains('[')) return true
    val c0 = if (lines(0).nonEmpty) lines(0).charAt(0) else ' '
    c0 == '-' || c0 == '.'
  }
  def definitelyNotTransition: Boolean = !isUppercaseSingleLine

  /** is_transition_follower (ParseText.php:2228-2236) */
  def isTransitionFollower: Boolean = {
    if (kind == "Slugline") return true
    if (kind != "Action") return false
    // strstr(text, ' ', before_needle=true) -> false (-> "") when no space,
    // and is_uppercase("") is true in PHP
    val t = text
    val sp = t.indexOf(' ')
    val head = if (sp < 0) "" else t.substring(0, sp)
    Php.isUppercase(head)
  }

  /** classify_based_on_content (ParseText.php:2237-2316).
    *
    * NOTE the reference checks `$bx == 0 || $prev_kind == "Text"` where
    * `$bx` is undefined inside the method (the parameter is `$block_num`);
    * `null == 0` is true in PHP, so the gate is ALWAYS open — replicated.
    */
  def classifyBasedOnContent(prevKind: String, blockNum: Int): Unit = {
    if (isBlank) { kind = "Text"; return }
    val probablyDialog = prevKind == "Character" || prevKind == "Paren"
    unsure = false
    if (blockNum < 3 && lines.length == 1 && LooksLike.containsDate(lines(0)) &&
        Php.mbLen(lines(0)) < 28) {
      kind = "Page Header"
    } else if (LooksLike.changebar(lines)) {
      kind = "Changebar"
    } else if (height == 1 && LooksLike.slugline(lines(0))) {
      kind = "Slugline"
      // strip a leading scene-number token (ParseText.php:2263-2272)
      val oldLine = lines(0)
      val parts = oldLine.split(" ", -1)
      if (parts.nonEmpty && LooksLike.sceneNumber(parts(0))) {
        setLine(0, Php.trim(parts.drop(1).mkString(" ")))
        x += (Php.mbLen(oldLine) - Php.mbLen(lines(0))) * Consts.DefaultCharWidth
      }
    } else if (height == 1 && LooksLike.transition(lines(0))) {
      kind = "Transition"
    } else if (height == 1 && LooksLike.theEnd(lines(0))) {
      kind = "Action" // The End treated as a simple action
    } else if (height == 1 && LooksLike.hrule(lines(0))) {
      kind = "Horizontal Rule"
    } else if (height > 1 && LooksLike.contactInfo(lines)) {
      kind = "Contact Info"
    } else if (height == 1 && LooksLike.character(lines(0))) {
      // gate `$bx == 0 || prev_kind == "Text"` is always true (see scaladoc)
      if (LooksLike.containsVoOsNotation(lines(0))) {
        kind = "Character"
      } else {
        kind = if (x < 8 && Php.isUppercase(lines(0))) "Slugline" else "Character"
        unsure = true
      }
    } else if (LooksLike.parenthetical(text)) {
      kind = "Paren"
    } else if (probablyDialog) {
      kind = "Dialog"; unsure = true
    } else if (Block.pronouns.find(text)) {
      kind = "Dialog"; unsure = true
    } else if (Block.actionVerbs.find(text)) {
      kind = "Action"; unsure = true
    } else {
      kind = "Unknown"; unsure = true
    }
  }

  /** reclassify_using_indent (ParseText.php:2317-2386).
    *
    * NOTE the reference's Action/Text refinement reads `$blockIndex` /
    * `$blocks`, both undefined in the method, so `null > 0` is false and
    * the result is always "Action" — replicated.
    */
  def reclassifyUsingIndent(maybeKinds0: Vector[String]): Unit = {
    var maybeKinds = maybeKinds0
    if (definitelyNotCharacter) maybeKinds = maybeKinds.filterNot(_ == "Character")
    if (definitelyNotTransition) maybeKinds = maybeKinds.filterNot(_ == "Transition")
    if (maybeKinds.contains(kind)) { unsure = false; return }
    if (maybeKinds.length == 1 && kind == "Unknown") { kind = maybeKinds.head; return }
    if (maybeKinds.contains("Dialog")) {
      if (maybeKinds.length == 1) { kind = "Dialog"; return }
      maybeKinds = maybeKinds.filterNot(_ == "Dialog")
    }
    if (maybeKinds.contains("Action") || maybeKinds.contains("Slugline")) {
      kind = "Action"
      unsure = false
      return
    }
    if (maybeKinds.length == 1 && (kind == "Unknown" || unsure)) {
      kind = maybeKinds.head
      return
    }
  }
}

object Block {
  private[pdfxml] val hyphenEnd = new Re(Pattern.compile("[A-Za-z0-9]-$"))
  private[pdfxml] val upperThenLower = new Re(Pattern.compile("^[A-Z].*[a-z]"))
  private[pdfxml] val pronouns = new Re(
    Pattern.compile("[^A-Za-z](I|me|my|you|your|yours)[^A-Za-z]", Pattern.CASE_INSENSITIVE))
  private[pdfxml] val actionVerbs = new Re(
    Pattern.compile("([Ww]e see|enters|faces|looks|smiles|stares|walks|As (she|he|they))"))
}
