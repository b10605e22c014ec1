package graft.model

/** Core data model for the extraction engine.
  *
  * The reference engine (gotoenchanter725/PDF-parser-TS) represents its output
  * as a flat ordered list of typed "script objects" (reference:
  * src/parser/analyzer/Objects.php:27-79). We model the same shape as an
  * immutable-ish Scala case-class graph; the per-turn extractor emits a
  * Vector[ScriptLine] which maps 1:1 onto the reference's ScriptObject[].
  *
  * All span offsets are **code-point** offsets (the reference uses PHP
  * mb_* functions throughout), see graft.model.Php.
  */
final case class Span(start: Int, end: Int)

/** reference: line-number margin capture, ParseText.php:492-502. */
final case class NumberObj(
    number: Option[String] = None,
    left: Boolean = false,
    right: Boolean = false
) {
  def isEmpty: Boolean = number.isEmpty && !left && !right
  def mergedWith(o: NumberObj): NumberObj = NumberObj(
    number = if (number.isDefined) number else o.number,
    left = left || o.left,
    right = right || o.right
  )
}

object ScriptLine {
  /** reference: Objects.php:40-43 ($valid_types). */
  val ValidTypes: Set[String] = Set(
    "Text", "Slugline", "Act", "Action", "Character", "Dialog", "Paren",
    "Transition", "Shot", "The End", "Page Header", "Title", "Author",
    "Fly Page Text")

  /** reference: Objects.php:81-100 (get_type_json). */
  def typeJson(t: String): String = t match {
    case "Dialog"   => "Dialogue"
    case "Slugline" => "Scene"
    case "Paren"    => "Parens"
    case "Act"      => "New Act"
    case other      => other
  }
}

/** One typed output line (reference ScriptObject, Objects.php:27-79).
  *
  * `kind` is the reference-internal type name (Dialog, Slugline, ...); the
  * JSON-facing rename (Dialogue, Scene, ...) is [[ScriptLine.typeJson]].
  * `givenPageNum` is a string because the PDF path captures it from header
  * text (ParseText.php:425-427) while the HTML path stores the int page.
  */
final case class ScriptLine(
    kind: String,
    text: String,
    pageNum: Int,
    givenPageNum: String,
    colors: Map[Int, Vector[Span]] = Map.empty,
    fontSize: Int = 16,
    textAttributes: Map[String, Vector[Span]] = Map.empty,
    numberObject: NumberObj = NumberObj(),
    alignment: String = "",
    hasDualLine: Boolean = false,
    isDualLine: Boolean = false,
    numLines: Int = 1,
    revisions: Map[Int, Vector[Span]] = Map.empty
) {
  def typeJson: String = ScriptLine.typeJson(kind)
}

object SpanAlgebra {
  /** Slice spans to a window and rebase to 0 (reference: split_attribute,
    * ParseText.php:2584-2600). Bounds: keep entries with
    * end >= leftInclusive && start < rightExclusive; clamp; shift left.
    */
  def split[K](attrs: Map[K, Vector[Span]], leftIncl: Int, rightExcl: Int): Map[K, Vector[Span]] = {
    val out = attrs.iterator.map { case (k, spans) =>
      k -> spans.collect {
        case Span(s, e) if e >= leftIncl && s < rightExcl =>
          Span(math.max(s, leftIncl) - leftIncl, math.min(e, rightExcl) - leftIncl)
      }
    }.filter(_._2.nonEmpty).toMap
    out
  }

  /** Append `other`'s spans shifted by `offset` (reference:
    * Objects.php:211-224, get_merged_attribute).
    */
  def merge[K](base: Map[K, Vector[Span]], other: Map[K, Vector[Span]], offset: Int): Map[K, Vector[Span]] = {
    other.foldLeft(base) { case (acc, (k, spans)) =>
      val shifted = spans.map(sp => Span(sp.start + offset, sp.end + offset))
      acc.updated(k, acc.getOrElse(k, Vector.empty) ++ shifted)
    }
  }
}
