package graft

import graft.pdfxml.PdfXml
import org.scalatest.funsuite.AnyFunSuite

/** Fifth fixture batch: reference quirks not yet pinned individually —
  * the last-Dialog numLines/dual reset, the Transition geometry coercion
  * (both arms of `x > 600 || (x > 400 && x+width > 700)`), the
  * transition-follower promotion's `ax > 20` depth gate, and the
  * fly-page 30-line threshold boundary.
  */
class PdfXmlFixture5Spec extends AnyFunSuite {

  private def pg(body: Seq[String]): String =
    s"""<page number="1" height="1188" width="918">
       |<fontspec id="0" size="12" family="Courier" color="#000000"/>
       |${body.mkString("\n")}
       |</page>""".stripMargin
  private def t(top: Int, left: Int, s: String): String =
    s"""<text top="$top" left="$left" width="${s.length * 7}" height="17" font="0">$s</text>"""
  private val filler: String =
    pg(t(79, 108, "INT. BARN - DAY") +: (0 until 11).map(i =>
      t(115 + 36 * i, 108, s"Frank walks in and stares hard at the barn door frame $i.")))

  private def parse(pages: String*) =
    PdfXml.parse("<pdf2xml>\n" + (filler +: pages).mkString("\n") + "\n</pdf2xml>")

  test("maybe_break_up_last_dialog quirk: every Dialog's numLines resets to 1; Action keeps its height") {
    // two-line Dialog block (adjacent rows, same x) vs two-line Action:
    // the reference pops and re-pushes the last Dialog through the
    // ScriptObject constructor (ParseText.php:2610-2696), losing num_lines
    // and the dual flags; Action blocks are not re-pushed
    val r = parse(pg(Seq(
      t(79, 400, "FRANK"),
      t(103, 250, "I will tell you the whole story now"),
      t(127, 250, "and nothing will stop me today."),
      t(175, 108, "Frank settles into the old chair and"),
      t(199, 108, "lights the last match from the box."))))
    val dialog = r.objects.filter(_.kind == "Dialog")
    assert(dialog.nonEmpty)
    assert(dialog.forall(_.numLines == 1),
      s"Dialog numLines should reset to 1, got ${dialog.map(_.numLines)}")
    assert(dialog.exists(_.text.contains("whole story now and nothing")),
      "the two dialog rows must still have merged into one object")
    val action = r.objects.filter(o => o.kind == "Action" && o.text.contains("settles"))
    assert(action.nonEmpty && action.forall(_.numLines == 2),
      s"Action keeps its real height, got ${action.map(_.numLines)}")
  }

  test("Transition geometry coercion: x > 600 arm and x > 400 && x+width > 700 arm") {
    // far-right uppercase one-liners whose CONTENT gives no clue (the
    // trailing period defeats looks_like_character, and no transition
    // whitelist word appears) stay unsure through the indent pass and are
    // coerced to Transition purely by geometry (ParseText.php:1230-1241)
    val r = parse(pg(Seq(
      t(79, 108, "Frank walks away from the barn slowly."),
      t(115, 620, "RIVER ROAD 99."), // x > 600
      t(151, 108, "He keeps walking and never once looks back."),
      t(187, 450, "RIVER ROAD OVER THE DARK HORIZON 99."), // 450+259 > 700
      t(223, 108, "The road bends north toward the river."))))
    val kinds = r.objects.map(o => (o.kind, o.text)).filter(_._2.startsWith("RIVER"))
    assert(kinds == Vector(
      ("Transition", "RIVER ROAD 99."),
      ("Transition", "RIVER ROAD OVER THE DARK HORIZON 99.")), kinds.toString)
  }

  test("transition-follower promotion only fires deeper than 20 blocks into the page") {
    // identical (unsure-uppercase line, then slugline) pattern placed
    // shallow and deep: the reference's `$ax > 20` gate
    // (ParseText.php:1242-1248) promotes only the deep one. The probe
    // line sits at an off-indent x with no content clue so it stays
    // unsure through the indent pass.
    def page(deep: Boolean): String = {
      val n = if (deep) 6 else 1
      val prefix = (0 until n).map(i =>
        t(79 + 72 * i, 108, s"Frank paces the floorboards again $i."))
      val base = 79 + 72 * n
      pg(prefix ++ Seq(
        t(base, 300, "RIVER BEND ROAD 99."), // unsure uppercase single line
        t(base + 24, 108, "INT. HOUSE - DAY"))) // follower, adjacent row
    }
    val deepKind = parse(page(deep = true)).objects
      .find(_.text == "RIVER BEND ROAD 99.").map(_.kind)
    val shallowKind = parse(page(deep = false)).objects
      .find(_.text == "RIVER BEND ROAD 99.").map(_.kind)
    assert(deepKind.contains("Transition"), s"deep: $deepKind")
    assert(!shallowKind.contains("Transition"), s"shallow: $shallowKind")
  }

  test("fly-page threshold: 29 short text lines classify as fly page, 30 do not") {
    def first(n: Int): String =
      pg((0 until n).map(i => t(79 + 24 * i, 300, f"ln$i%03d")))
    def kindsOf(n: Int) =
      PdfXml.parse("<pdf2xml>\n" + first(n) + "\n" + filler + "\n</pdf2xml>")
        .objects.filter(_.pageNum == 1).map(_.kind).toSet
    val under = kindsOf(29)
    assert(under.contains("Title") || under.contains("Fly Page Text"), under.toString)
    val over = kindsOf(30)
    assert(!over.contains("Title") && !over.contains("Fly Page Text"), over.toString)
  }
}
