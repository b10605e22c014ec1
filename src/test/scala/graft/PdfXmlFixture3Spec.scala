package graft

import graft.pdfxml.PdfXml
import org.scalatest.funsuite.AnyFunSuite

/** Third fixture batch: series-indent blocks, multi-color revisions,
  * docx header glue, band-edge CONTINUED behavior.
  */
class PdfXmlFixture3Spec extends AnyFunSuite {

  private def pg(body: Seq[String], extraFonts: Seq[String] = Nil): String =
    s"""<page number="1" height="1188" width="918">
       |<fontspec id="0" size="12" family="Courier" color="#000000"/>
       |${extraFonts.mkString("\n")}
       |${body.mkString("\n")}
       |</page>""".stripMargin
  private def t(top: Int, left: Int, s: String, font: Int = 0): String =
    s"""<text top="$top" left="$left" width="${s.length * 7}" height="17" font="$font">$s</text>"""
  private val filler: String =
    pg(t(79, 108, "INT. BARN - DAY") +: (0 until 11).map(i =>
      t(115 + 36 * i, 108, s"Frank walks in and stares hard at the barn door frame $i.")))

  private def parse(pages: String*) =
    PdfXml.parse("<pdf2xml>\n" + (filler +: pages).mkString("\n") + "\n</pdf2xml>")

  test("G6 series indent: same-x A)/B) blocks stay separate; char-vs-pixel continuation rule is reference-faithfully dead") {
    // Reference quirk: get_series_indent returns a CHARACTER count but
    // should_combine compares it against PIXEL x (ParseText.php:2075), so
    // the "series continuation merges" arm never fires in XML mode — the
    // continuation becomes its own tight block (-> Text). The live effect
    // of the series logic is cond1: two same-x "A)  .." / "B)  .." lines
    // do NOT merge even though the ±2-char window would allow it.
    val r = parse(pg(Seq(
      t(79, 108, "SERIES OF SHOTS"),
      t(115, 108, "A)  First shot here."),
      t(139, 136, "of the wide field."), // x = 108 + 4*7: still no merge
      t(175, 108, "B)  Second shot."),
      t(199, 108, "C)  Third shot.") // same x, adjacent row: cond1 keeps apart
    )))
    val got = r.objects.drop(12).map(l => (l.kind, l.text))
    assert(got == Vector(
      ("Slugline", "SERIES OF SHOTS"),
      ("Action", "A) First shot here."),
      ("Text", "of the wide field."),
      ("Action", "B) Second shot."),
      ("Text", "C) Third shot.")))
  }

  test("A4 multi-color: each key page binds its header name to its color") {
    val p2 = pg(Seq(
      t(36, 108, "Blue Revision"),
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares.", font = 8)
    ), Seq("""<fontspec id="8" size="12" family="Courier" color="#0000ff"/>"""))
    val p3 = pg(Seq(
      t(36, 108, "Pink Revision"),
      t(79, 108, "INT. YARD - DAY"),
      t(115, 108, "Grace walks out. She stares.", font = 9)
    ), Seq("""<fontspec id="9" size="12" family="Courier" color="#ff00ff"/>"""))
    val r = parse(p2, p3)
    val revs = r.revisions.map(x => (x.name, x.color)).toSet
    assert(revs.contains(("Blue Revision", "#0000ff")), revs)
    assert(revs.contains(("Pink Revision", "#ff00ff")), revs)
    // the colored objects carry revision spans
    val colored = r.objects.filter(_.revisions.nonEmpty)
    assert(colored.map(_.text).toSet ==
      Set("Frank walks in. He stares.", "Grace walks out. She stares."))
    // distinct revision weights for the two colors
    assert(colored.flatMap(_.revisions.keys).distinct.size == 2)
  }

  test("F3 docx glue: 10-space run splits header text from page number") {
    val p = pg(Seq(
      t(36, 108, "MY GLUED HEADER          7."),
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares.")))
    val r = parse(p)
    assert(r.objects.drop(12).forall(_.givenPageNum == "7"))
    assert(r.headerFrags(1).map(_.value) == Vector("MY GLUED HEADER"))
  }

  test("F2 band edge: CONTINUED in the 42-50px band strips but leaves the line in the body") {
    val p = pg(Seq(
      t(45, 108, "CONTINUED:"),
      t(45, 400, "stray words"),
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares.")))
    val r = parse(p)
    assert(r.sceneContinuedTop)
    val texts = r.objects.drop(12).map(_.text)
    assert(texts.contains("stray words"))
    assert(!texts.exists(_.contains("CONTINUED")))
  }
}
