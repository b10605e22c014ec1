package graft

import graft.model.Span
import graft.pdfxml.PdfXml
import org.scalatest.funsuite.AnyFunSuite

/** Surgical fixtures for individual operators of the PDF-XML path
  * (SURVEY.md §2.2-2.4 families). Page 1 is a filler scene large enough to
  * defeat fly-page detection (ParseText.php:1115-1116 triggers on <30
  * pieces and <300 chars); the operator under test sits on page 2+.
  */
class PdfXmlFixtureSpec extends AnyFunSuite {

  private def pg(body: Seq[String], h: Int = 1188, w: Int = 918): String =
    s"""<page number="1" height="$h" width="$w">
       |<fontspec id="0" size="12" family="Courier" color="#000000"/>
       |${body.mkString("\n")}
       |</page>""".stripMargin

  private def doc(pages: String*): String =
    "<pdf2xml>\n" + pages.mkString("\n") + "\n</pdf2xml>"

  private def t(top: Int, left: Int, s: String, font: Int = 0): String =
    s"""<text top="$top" left="$left" width="${s.replaceAll("<[^>]*>", "").length * 7}" height="17" font="$font">$s</text>"""

  private val fillerLines: Vector[String] = Vector(
    "Frank walks in and stares hard at the barn door frame.",
    "Grace walks out and looks over the wide yellow field.",
    "Dave enters and smiles at the broken harvest machine.",
    "Helen walks around and stares at the cracked windows.",
    "Bob walks closer and looks into the deep dark cellar.",
    "Carol enters slowly and smiles at the dusty old piano.",
    "Erin walks away and stares over the long gravel drive.",
    "Alice walks up and looks at the rusty weather vane now.",
    "Frank stares again and walks toward the open hay loft.",
    "Grace smiles once and walks past the stacked seed bags.",
    "Dave looks down and walks along the creaking floor beam.")

  private val fillerPage: String =
    pg(t(79, 108, "INT. BARN - DAY") +: fillerLines.zipWithIndex.map {
      case (s, i) => t(115 + 36 * i, 108, s)
    })

  private val fillerExpected: Vector[(String, String)] =
    ("Slugline", "INT. BARN - DAY") +: fillerLines.map(("Action", _))

  private val scenePage: String = pg(Seq(
    t(79, 108, "INT. LOFT - NIGHT"),
    t(115, 108, "Frank walks in. He stares."),
    t(151, 396, "FRANK"),
    t(175, 252, "Hello there.")))

  private val sceneExpected = Vector(
    ("Slugline", "INT. LOFT - NIGHT"),
    ("Action", "Frank walks in. He stares."),
    ("Character", "FRANK"),
    ("Dialog", "Hello there."))

  /** parse and return (kind, text) pairs after the filler page */
  private def kindsAfterFiller(pages: String*): Vector[(String, String)] = {
    val all = PdfXml.parse(doc((fillerPage +: pages): _*)).objects.map(l => (l.kind, l.text))
    assert(all.take(12) == fillerExpected, s"filler page mis-parsed: ${all.take(12)}")
    all.drop(12)
  }

  test("baseline scene page") {
    assert(kindsAfterFiller(scenePage) == sceneExpected)
  }

  test("G1: y-jitter fragments cluster into one line") {
    val p = pg(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks"),
      t(117, 192, "in fast."),
      t(151, 396, "FRANK"),
      t(175, 252, "Hello there.")))
    // gap: (192 - (108 + 11*7)) / 7 = floor(7/7) = 1 space
    assert(kindsAfterFiller(p).take(2) == Vector(
      ("Slugline", "INT. LOFT - NIGHT"),
      ("Action", "Frank walks in fast.")))
  }

  test("G2: horizontal gap becomes proportional spaces, reduce_spaces collapses") {
    val p = pg(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks"), // width 77 -> right edge 185
      t(115, 213, "in slowly."),  // gap 28px -> 4 spaces -> collapses to one
      t(151, 396, "FRANK"),
      t(175, 252, "Hi.")))
    assert(kindsAfterFiller(p)(1) == ("Action", "Frank walks in slowly."))
  }

  test("F1: right-margin changebar asterisks dropped at scan") {
    val p = pg(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(79, 850, "*"),
      t(115, 108, "Frank walks in. He stares."),
      t(115, 850, "*"),
      t(151, 396, "FRANK"),
      t(175, 252, "Hello there.")))
    assert(kindsAfterFiller(p) == sceneExpected)
  }

  test("F2: CONTINUED header/footer strips set sceneContinued flags") {
    val p = pg(Seq(
      t(40, 400, "CONTINUED: (2)"),
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 396, "FRANK"),
      t(175, 252, "Hello there."),
      t(1150, 400, "(CONTINUED)")))
    val r = PdfXml.parse(doc(fillerPage, p))
    assert(r.sceneContinuedTop && r.sceneContinuedNumber && r.sceneContinuedBottom)
    assert(r.objects.drop(12).map(o => (o.kind, o.text)) == sceneExpected)
  }

  test("F3/F4: header band text and page number; watermark dropped from footer") {
    val p = pg(Seq(
      t(36, 108, "MY SCRIPT - Blue Draft"),
      t(36, 810, "7."),
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 396, "FRANK"),
      t(175, 252, "Hello there."),
      t(1160, 300, "Created using Celtx")))
    val r = PdfXml.parse(doc(fillerPage, p))
    assert(r.objects.drop(12).forall(_.givenPageNum == "7"))
    assert(r.headerFrags(1).map(_.value) == Vector("MY SCRIPT - Blue Draft"))
    assert(r.footerFrags(1).isEmpty)
  }

  test("F5: margin line numbers captured into numberObject") {
    val p = pg(Seq(
      t(79, 30, "1"), t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 30, "2"), t(115, 108, "Frank walks in. He stares."),
      t(151, 30, "3"), t(151, 396, "FRANK"),
      t(175, 30, "4"), t(175, 252, "Hello there.")))
    val r = PdfXml.parse(doc(fillerPage, p))
    assert(r.objects.drop(12).map(_.numberObject.number) ==
      Vector(Some("1"), Some("2"), Some("3"), Some("4")))
  }

  test("F6: CONT'D marker whited out of character line") {
    val p = pg(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 396, "FRANK (CONT'D)"),
      t(175, 252, "Hello there.")))
    assert(kindsAfterFiller(p)(2) == ("Character", "FRANK"))
  }

  test("C7: scene number block adjacent to slugline removed; leading token stripped") {
    val p = pg(Seq(
      t(79, 70, "12"), // separate piece (gap to slugline > 12 spaces)
      t(79, 400, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 396, "FRANK"),
      t(175, 252, "Hello there.")))
    assert(kindsAfterFiller(p).head == ("Slugline", "INT. LOFT - NIGHT"))
    val p2 = pg(Seq(
      t(79, 80, "12"), // merges into the slugline piece -> token strip
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 396, "FRANK"),
      t(175, 252, "Hello there.")))
    assert(kindsAfterFiller(p2).head == ("Slugline", "INT. LOFT - NIGHT"))
  }

  test("S2: bold/italic child spans captured as code-point ranges") {
    val p = pg(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Some <b>bold</b> and <i>sly</i> text here."),
      t(151, 396, "FRANK"),
      t(175, 252, "Hello there.")))
    val r = PdfXml.parse(doc(fillerPage, p))
    val action = r.objects(13)
    assert(action.text == "Some bold and sly text here.")
    assert(action.textAttributes("b") == Vector(Span(5, 8)))
    assert(action.textAttributes("i") == Vector(Span(14, 16)))
  }

  test("A4: colored font becomes a revision with header-name binding") {
    val p = s"""<page number="2" height="1188" width="918">
      |<fontspec id="9" size="12" family="Courier" color="#ff0000"/>
      |${t(36, 108, "Blue Revision Draft")}
      |${t(79, 108, "INT. LOFT - NIGHT")}
      |${t(115, 108, "Frank walks in. He stares.", font = 9)}
      |${t(151, 396, "FRANK")}
      |${t(175, 252, "Hello there.")}
      |</page>""".stripMargin
    val r = PdfXml.parse(doc(fillerPage, p))
    assert(r.revisions.exists(rev => rev.name == "Blue Revision Draft" && rev.color == "#ff0000"))
    val action = r.objects(13)
    assert(action.text == "Frank walks in. He stares.")
    assert(action.revisions.nonEmpty)
    assert(action.colors.nonEmpty)
  }

  test("C17: dialog merges across the page break") {
    val p1 = pg(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 396, "FRANK"),
      t(175, 252, "I was going to tell you")))
    val p2 = pg(Seq(
      t(79, 252, "about you and the barn."),
      t(115, 108, "Frank walks out. He stares.")))
    assert(kindsAfterFiller(p1, p2) == Vector(
      ("Slugline", "INT. LOFT - NIGHT"),
      ("Action", "Frank walks in. He stares."),
      ("Character", "FRANK"),
      ("Dialog", "I was going to tell you about you and the barn."),
      ("Action", "Frank walks out. He stares.")))
  }

  test("C10: dual dialog columns recovered and spliced") {
    val p = pg(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 252, "ALICE"), t(151, 480, "BOB"),
      t(175, 180, "We should go."), t(175, 450, "We should stay."),
      t(199, 180, "Now, even."), t(199, 450, "Forever, even.")))
    val r = PdfXml.parse(doc(fillerPage, p))
    val got = r.objects.drop(12).map(l => (l.kind, l.text, l.hasDualLine, l.isDualLine))
    assert(got(2) == ("Character", "ALICE", true, false))
    assert(got(3)._1 == "Dialog")
    assert(got(3)._2 == "We should go. Now, even.")
    assert(got(4) == ("Character", "BOB", false, true))
    assert(got(5)._1 == "Dialog")
    assert(got(5)._2 == "We should stay. Forever, even.")
  }

  test("X16: tabs expand to 8-column stops") {
    val p = pg(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank\twalks in. He stares."),
      t(151, 396, "FRANK"),
      t(175, 252, "Hello there.")))
    assert(kindsAfterFiller(p)(1) == ("Action", "Frank walks in. He stares."))
  }

  test("empty and garbage XML do not crash") {
    assert(PdfXml.parse("").objects.isEmpty)
    assert(PdfXml.parse("<pdf2xml><page></page></pdf2xml>").objects.isEmpty)
    assert(PdfXml.parse("not xml at all & <<>").objects.isEmpty)
  }
}
