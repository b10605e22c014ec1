package graft

import graft.model.ScriptLine
import graft.render.{FountainReader, Render}
import graft.render.FountainReader.FElem
import graft.shakespeare.Shakespeare

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Render→re-parse round-trip for the Fountain sink over all 37
  * golden-verified play line streams (the only sink with no
  * reference-anchored check — the reference ships no .fountain outputs
  * and no PHP runtime exists in this sandbox).
  *
  * Two layers:
  *
  * 1. STRUCTURE: `Render.fountain`'s output, re-parsed with
  *    [[FountainReader]], must equal the parse of an independently
  *    predicted body built from the sink's documented per-kind contract
  *    (upper-cased cues/headings, `.`/`>` forcing, slug/TO: protection
  *    spaces, blank dialog → two spaces, Dialog/Paren attach to the
  *    open block, everything else opens a block). This exercises the
  *    real escaping, style-marker and newline emission against a
  *    simpler second implementation of the contract.
  *
  * 2. FIDELITY: element-wise against the IDEAL projection (each line
  *    keeps its own kind), the only permitted divergence is the pinned
  *    lossiness class inherent to the reference's format: dialogue that
  *    resumes after an embedded action has no cue in Fountain, so it
  *    reads back as action (or as dialogue under a misread caps head).
  *    Text must be preserved byte-for-byte at every element regardless.
  *
  * INHERENCE (verified against the reference writer, round 4): the
  * reference emits the identical ambiguous shape. In WriteOutput.php an
  * Action object writes "\n$content" (:93-99) with the shared trailing
  * "\n" (:140), while Dialog/Paren append $content DIRECTLY — no leading
  * newline, no cue, no blank separator (:105-109). A dialogue resuming
  * after an embedded action therefore lands as "ACTION\nDIALOG\n":
  * adjacent lines of one paragraph with no Character cue, which every
  * Fountain parser (including the reference's own ecosystem) must read
  * back as action. A disambiguating blank line is NOT legal output the
  * reference could have emitted — it would detach the dialog into a
  * standalone (still cue-less) paragraph, not preserve it; Fountain has
  * no construct for cue-less dialogue. The 5,437/145,532 class below is
  * the format's floor, not the renderer's.
  */
class FountainRoundTripSpec extends AnyFunSuite {

  private val corpusDir = Paths.get("/root/reference/shakespeare")

  private def plays: Seq[Path] = {
    if (!Files.isDirectory(corpusDir)) return Seq.empty
    Files.list(corpusDir).iterator.asScala.filter(Files.isDirectory(_)).flatMap { cat =>
      Files.list(cat).iterator.asScala.filter(_.toString.endsWith(".shakespeare"))
    }.toSeq.sortBy(_.toString)
  }

  private val up = (s: String) => s.toUpperCase(java.util.Locale.ROOT)

  /** per-line (projectedRenderedText, opensBlock, idealKind); None text =
    * the element renders empty and acts as a block boundary
    */
  private def project(o: ScriptLine): (Option[String], Boolean, String) = {
    assert(!o.text.exists(c => c >= 1 && c <= 8),
      s"unexpected style-marker control char in ${o.kind}: ${o.text}")
    o.kind match {
      case "Text" | "Action" =>
        var c = o.text
        if (Render.matchedAsTransition(c)) c += " "
        if (Render.matchedAsSlug(c)) c = " " + c
        (if (c.isEmpty) None else Some(c), true, "action")
      case "Character" =>
        val t = up(o.text) + (if (o.isDualLine) "^" else "")
        (if (t.isEmpty) None else Some(t), true, "character")
      case "Dialog" | "Paren" =>
        (Some(if (o.text.trim == "") "  " else o.text), false, "dialogue")
      case "Shot" | "Act" | "Slugline" =>
        val u = up(o.text)
        val t = if ((Render.matchedAsTransition(u) || !Render.matchedAsSlug(u)) && u.trim != "") "." + u else u
        (if (t.isEmpty) None else Some(t), true, "heading")
      case "Transition" =>
        val u = up(o.text)
        val t = if (Render.matchedAsSlug(u) || !Render.matchedAsTransition(u)) ">" + u else u
        (if (t.isEmpty) None else Some(t), true, "transition")
      case other =>
        fail(s"unexpected kind past page 1: $other (${o.text})")
    }
  }

  test("fountain render -> re-parse over all 37 plays: structure exact, lossiness pinned") {
    // cancel (not fail) where the reference corpus checkout is absent —
    // the suite must stay runnable in environments without /root/reference
    assume(Files.isDirectory(corpusDir), s"reference corpus not present at $corpusDir")
    val ps = plays
    assert(ps.size == 37, s"expected 37 plays, found ${ps.size}")
    var total = 0L
    var lossy = 0L
    ps.foreach { p =>
      val html = new String(Files.readAllBytes(p), "ISO-8859-1")
      val lines = Shakespeare.parse(html)
      val body = lines.filter(o => o.pageNum != 1 && o.kind != "Page Header")
      val projected = body.map(project)

      // layer 1: real render vs independently predicted body
      val blocks = Vector.newBuilder[Vector[String]]
      var cur = Vector.empty[String]
      projected.foreach { case (txt, opens, _) =>
        if (opens || txt.isEmpty) { if (cur.nonEmpty) blocks += cur; cur = Vector.empty }
        txt.foreach(t => cur = cur :+ t)
      }
      if (cur.nonEmpty) blocks += cur
      val predictedBody = blocks.result().map(_.mkString("\n")).mkString("\n\n")
      val got = FountainReader.parse(Render.fountain(lines)).elems
      val want = FountainReader.parse(predictedBody).elems
      if (got != want) {
        val n = math.min(got.size, want.size)
        val d = (0 until n).find(i => got(i) != want(i)).getOrElse(n)
        val ctx = (math.max(0, d - 2) until math.min(math.max(got.size, want.size), d + 3))
          .map(i => s"  [$i] got=${got.lift(i)} want=${want.lift(i)}").mkString("\n")
        fail(s"${p.getFileName}: ${got.size} vs ${want.size} elems, first diff at $d:\n$ctx")
      }

      // layer 2: vs the ideal per-line kinds — text byte-exact everywhere,
      // kind divergence only in the pinned embedded-action lossiness class
      val ideal = projected.collect { case (Some(t), _, k) =>
        val txt = k match {
          case "character" if t.endsWith("^") => t.dropRight(1)
          case "heading" if t.startsWith(".") => t.substring(1) // reader strips the forcing mark
          case "transition" if t.startsWith(">") => t.substring(1)
          case _ => t
        }
        FElem(k, txt, dual = k == "character" && t.endsWith("^"))
      }
      assert(got.size == ideal.size,
        s"${p.getFileName}: element count ${got.size} != ideal ${ideal.size}")
      got.zip(ideal).zipWithIndex.foreach { case ((g, i), idx) =>
        assert(g.text == i.text && g.dual == i.dual,
          s"${p.getFileName}[$idx]: text/dual not preserved: got=$g ideal=$i")
        if (g.kind != i.kind) {
          lossy += 1
          assert(Set(i.kind, g.kind) == Set("dialogue", "action") ||
            (i.kind == "action" && g.kind == "character") ||
            (i.kind == "action" && g.kind == "dialogue"),
            s"${p.getFileName}[$idx]: unexpected kind divergence: got=$g ideal=$i")
        }
      }
      total += got.size
    }
    info(s"round-tripped $total fountain elements across 37 plays ($lossy in the pinned lossiness class)")
    assert(total > 50000, s"suspiciously few elements: $total")

    // title-page keys round-trip (spot-check on the first play)
    val lines0 = Shakespeare.parse(new String(Files.readAllBytes(ps.head), "ISO-8859-1"))
    val doc0 = FountainReader.parse(Render.fountain(lines0))
    def firstKey(kind: String): Option[String] = lines0.iterator
      .takeWhile(_.pageNum <= 1).map(o => (o.kind, o.text))
      .collectFirst { case (`kind`, t) if t != "" => t }.filter(_.trim != "")
    assert(doc0.title == firstKey("Title"))
    assert(doc0.author == firstKey("Author"))
  }
}
