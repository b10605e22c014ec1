package graft.analyze

import graft.model.{Php, ScriptLine}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Document-local structural analysis (reference Analyzer.php:348-565):
  * fold the typed line stream into Scenes / Dialogs / Characters with
  * scene segmentation, character-name normalization and splitting, and
  * dialogue attribution. The Spark-level analogues are in
  * graft.spark.Pipeline (real windows/aggregations); this port also
  * carries the name-normalization operators (X13/X14) the reference
  * applies per speech.
  */
object DocAnalyzer {

  final case class Dialog(character: String, modifier: String,
      original: String, pageNum: Int, hasDual: Boolean, isDual: Boolean,
      texts: Vector[String]) {
    def dialogString: String = texts.mkString(" ")
  }
  final case class Scene(idx: Int, sluglines: Vector[String],
      nLines: Int, dialogs: Vector[Dialog])
  final case class CharacterStats(name: String, nDialogs: Int)
  final case class Analysis(title: String, author: String,
      scenes: Vector[Scene], characters: Vector[CharacterStats])

  /** split_character_modifier (Analyzer.php:302-319): peel trailing
    * (...) / [...] groups into the modifier.
    */
  def splitCharacterModifier(name0: String): (String, String) = {
    var name = name0
    var modifier = ""
    var go = true
    while (go && name.nonEmpty &&
        (name.endsWith(")") || name.endsWith("]"))) {
      var parenBegins = name.lastIndexOf('(')
      if (parenBegins < 0) parenBegins = name.lastIndexOf('[')
      if (parenBegins >= 0) {
        val trimmed = Php.trim(name.substring(0, parenBegins))
        if (trimmed != "") {
          modifier = Php.trim(name.substring(parenBegins + 1, name.length - 1))
          name = trimmed
        } else go = false
      } else go = false
    }
    (name, modifier)
  }

  def stripParens(s: String): String = splitCharacterModifier(s)._1

  /** get_character normalization (Analyzer.php:389-397): uppercase, trim,
    * strip leading/trailing NBSP.
    */
  def normalizeName(s: String): String = {
    val upper = Php.trim(s.toUpperCase(java.util.Locale.ROOT))
    Php.trim(upper, Set(' '))
  }

  /** character-name splitting on &, " AND " (case-insensitive) and commas,
    * protecting parenthesized groups (Analyzer.php:399-442). Returns the
    * final per-speaker pieces (before modifier split).
    */
  def splitCharacterNames(characterName: String): Vector[String] = {
    // preg_split('/(&| AND )/iu', ..., PREG_SPLIT_DELIM_CAPTURE): pieces at
    // even indices, delimiters at odd
    val re = java.util.regex.Pattern.compile("(&| AND )",
      java.util.regex.Pattern.CASE_INSENSITIVE)
    val parts = ArrayBuffer.empty[String]
    val m = re.matcher(characterName)
    var last = 0
    while (m.find()) {
      parts += characterName.substring(last, m.start())
      parts += m.group()
      last = m.end()
    }
    parts += characterName.substring(last)

    // merge chunks whose parenthetical spans a delimiter (:409-429)
    val pieces = ArrayBuffer.empty[String]
    var num = 0
    while (num < parts.length) {
      var piece = parts(num)
      var parenBegins = piece.lastIndexOf('(')
      var close = ")"
      if (parenBegins < 0) { parenBegins = piece.lastIndexOf('['); close = "]" }
      if (parenBegins >= 0 && piece.indexOf(close, parenBegins) < 0 &&
          num + 2 < parts.length) {
        parts(num) = piece + parts(num + 1) + parts(num + 2)
        parts.remove(num + 1, 2)
      } else {
        pieces += piece
        num += 2
      }
    }

    val dual = pieces.length > 1
    val expanded =
      if (dual) pieces.flatMap(_.split(",", -1)) else pieces
    expanded.map(Php.trim(_)).filter(_ != "").toVector
  }

  /** Analyzer::analyze (Analyzer.php:465-565). */
  def analyze(objects: Seq[ScriptLine]): Analysis = {
    var title = ""
    var author = ""
    val scenes = ArrayBuffer.empty[(Vector[String], ArrayBuffer[Dialog], Int)]
    var currentSluglines = Vector.empty[String]
    var currentDialogs = ArrayBuffer.empty[Dialog]
    var currentLines = 0
    var inTitleScene = true

    val dialogCounts = mutable.LinkedHashMap.empty[String, Int]
    var currentDialog: ArrayBuffer[Dialog] = null
    var lastCharacterName = "*UNNAMED*"
    var lastCharacters: String = ""

    def flushScene(): Unit = {
      if (!inTitleScene) scenes += ((currentSluglines, currentDialogs, currentLines))
      currentSluglines = Vector.empty
      currentDialogs = ArrayBuffer.empty
      currentLines = 0
    }

    def createCharacterDialog(name: String, pageNum: Int,
        hasDual: Boolean, isDual: Boolean): ArrayBuffer[Dialog] = {
      val out = ArrayBuffer.empty[Dialog]
      val piecesAll = splitCharacterNames(name)
      val dual = piecesAll.length > 1
      piecesAll.zipWithIndex.foreach { case (piece, num) =>
        val (nm0, modifier0) = splitCharacterModifier(piece)
        if (nm0 != "") {
          // Final Draft CONT'D modifier dropped (Analyzer.php:154-156)
          val modifier =
            if (modifier0 == "CONT'D" || modifier0 == "CONT’D") "" else modifier0
          val norm = normalizeName(nm0)
          dialogCounts(norm) = dialogCounts.getOrElse(norm, 0) + 1
          out += Dialog(norm, modifier, name, pageNum,
            hasDual || (num == 0 && dual), isDual || num > 0, Vector.empty)
        }
      }
      out
    }

    objects.foreach { o =>
      var terminatesDialog = true
      o.kind match {
        case "Character" =>
          terminatesDialog = false
          val stripped = stripParens(o.text)
          val dualPart = o.hasDualLine || o.isDualLine
          if (stripped != "" && (currentDialog == null || lastCharacters != stripped || dualPart)) {
            lastCharacters = if (!dualPart) stripped else null
            lastCharacterName = o.text
            currentDialog = createCharacterDialog(lastCharacterName, o.pageNum,
              o.hasDualLine, o.isDualLine)
            currentDialog.indices.foreach { i =>
              currentDialogs += currentDialog(i)
            }
          }
        case "Paren" | "Dialog" =>
          terminatesDialog = false
          if (currentDialog == null) {
            currentDialog = createCharacterDialog(lastCharacterName, o.pageNum, hasDual = false, isDual = false)
            currentDialog.indices.foreach(i => currentDialogs += currentDialog(i))
          }
          if (o.kind == "Dialog") {
            currentDialog.indices.foreach { i =>
              val d = currentDialog(i)
              currentDialog(i) = d.copy(texts = d.texts :+ o.text)
              val idx = currentDialogs.lastIndexWhere(_ eq d)
              if (idx >= 0) currentDialogs(idx) = currentDialog(i)
            }
          }
          currentLines += o.numLines
        case "Title" =>
          if (title == "") title = o.text
        case "Author" =>
          if (author == "") author = o.text
        case "Slugline" =>
          flushScene()
          inTitleScene = false
          // int./ext. prefix space insertion (Analyzer.php:533-541)
          var content = o.text
          Seq("int./ext.", "int.", "ext.").find(p => Php.isPrefix(content, p, caseSensitive = false)).foreach { p =>
            if (content.length > p.length && Php.ctypeAlnum(content.charAt(p.length)))
              content = content.substring(0, p.length) + " " + content.substring(p.length)
          }
          currentSluglines = currentSluglines :+ content
          currentLines += 1
        case "Action" | "Transition" =>
          currentLines += o.numLines
        case "Text" | "Shot" | "Act" =>
          currentLines += 1
        case _ => ()
      }
      if (terminatesDialog) currentDialog = null
    }
    flushScene()

    val sceneVec = scenes.zipWithIndex.map { case ((slugs, dialogs, n), i) =>
      Scene(i, slugs, n, dialogs.toVector)
    }.toVector
    val chars = dialogCounts.toVector
      .map { case (n, c) => CharacterStats(n, c) }
      .sortBy(-_.nDialogs) // character_sort (Analyzer.php:283-291)
    Analysis(title, author, sceneVec, chars)
  }
}
