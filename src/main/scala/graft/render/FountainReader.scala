package graft.render

/** Minimal Fountain reader for the subset the [[Render.fountain]] sink
  * emits (reference WriteOutput.php:17-148): title-page keys, blank-line-
  * delimited blocks, forced headings (leading `.`), forced transitions
  * (leading `>`), slug-prefix headings (INT/EXT/EST/I.E.), ` TO:`
  * transitions, all-caps lines opening a dialogue block as Character,
  * dual-dialogue `^`, and backslash escapes for `* _ \`.
  *
  * This exists to close the render→re-parse round-trip property
  * (FountainRoundTripSpec): the reference repo ships no `.fountain`
  * goldens and no PHP runtime exists in this sandbox, so syntactic
  * invertibility over the 37 golden-verified play line streams is the
  * strongest available check for the Fountain sink — it proves every
  * emitted element is unambiguous under standard Fountain block rules
  * (an all-caps action line, say, would mis-read as a Character cue and
  * fail the property).
  */
object FountainReader {

  /** a parsed element. `kind` is the Fountain-level element type —
    * coarser than the engine's line kinds because the sink itself merges
    * Shot/Act/Slugline into headings and Dialog/Paren into dialogue.
    */
  final case class FElem(kind: String, text: String, dual: Boolean = false)

  final case class FDoc(title: Option[String], author: Option[String],
      elems: Vector[FElem])

  private def unescape(s: String): String =
    if (!s.contains('\\')) s
    else {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) { sb += s.charAt(i + 1); i += 2 }
        else { sb += s.charAt(i); i += 1 }
      }
      sb.toString
    }

  private def isAllCaps(s: String): Boolean =
    s.nonEmpty && s == s.toUpperCase(java.util.Locale.ROOT) && s.exists(_.isLetter)

  def parse(text: String): FDoc = {
    val lines = text.split("\n", -1).toVector
    var i = 0
    var title: Option[String] = None
    var author: Option[String] = None
    var inKeys = true
    while (i < lines.length && inKeys) {
      val l = lines(i)
      if (l.startsWith("Title: ")) { title = Some(l.substring(7)); i += 1 }
      else if (l.startsWith("Credit:")) i += 1
      else if (l.startsWith("Author: ")) { author = Some(l.substring(8)); i += 1 }
      else inKeys = false
    }
    val out = Vector.newBuilder[FElem]
    val n = lines.length
    while (i < n) {
      if (lines(i).isEmpty) i += 1
      else {
        var j = i
        while (j < n && lines(j).nonEmpty) j += 1
        emit(lines.slice(i, j), out)
        i = j
      }
    }
    FDoc(title, author, out.result())
  }

  /** classify one blank-line-delimited block. Precedence mirrors the
    * sink's disambiguation: forced marks first, then slug prefixes, then
    * lone ` TO:` transitions, then all-caps dialogue blocks; everything
    * else is action. Lines trailing a non-dialogue head only occur for
    * dialogue attached without a cue — surfaced as dialogue so the
    * round-trip spec flags the ambiguity rather than hiding it.
    */
  private def emit(block: Vector[String], out: scala.collection.mutable.Builder[FElem, Vector[FElem]]): Unit = {
    val head = block.head
    val dual = head.endsWith("^")
    val headNoDual = if (dual) head.dropRight(1) else head
    def rest(kind: String): Unit =
      block.tail.foreach(l => out += FElem(kind, unescape(l)))
    if (head.startsWith(">")) {
      out += FElem("transition", unescape(head.substring(1)))
      rest("dialogue")
    } else if (head.startsWith(".")) {
      out += FElem("heading", unescape(head.substring(1)))
      rest("dialogue")
    } else if (Render.matchedAsSlug(head)) {
      out += FElem("heading", unescape(head))
      rest("dialogue")
    } else if (block.size == 1 && isAllCaps(head) && Render.matchedAsTransition(head)) {
      out += FElem("transition", unescape(head))
    } else if (block.size >= 2 && isAllCaps(headNoDual)) {
      out += FElem("character", unescape(headNoDual), dual = dual)
      rest("dialogue")
    } else {
      block.foreach(l => out += FElem("action", unescape(l)))
    }
  }
}
