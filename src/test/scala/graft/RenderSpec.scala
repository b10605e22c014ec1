package graft

import graft.pdfxml.PdfXml
import graft.render.Render
import graft.synth.ScreenplayGen
import graft.util.Json
import org.scalatest.funsuite.AnyFunSuite

class RenderSpec extends AnyFunSuite {

  private lazy val parsed = {
    val doc = ScreenplayGen.render(ScreenplayGen.elements(5L, 6),
      ScreenplayGen.Options(headerText = "MY HEADER"))
    PdfXml.parse(doc.xml)
  }

  test("S6: JSON sink shape (lines/titlePage/pageSettings/revisions/lineNumbers)") {
    val j = Json.parse(Render.json(parsed))
    val o = j.asObject
    assert(o.keys.toVector == Vector("lines", "titlePage", "pageSettings", "revisions", "lineNumbers"))
    val lines = j("lines").asArray
    assert(lines.nonEmpty)
    // first line of a page carries givenPageNum; later lines on the page don't
    assert(lines.head.get("givenPageNum").isDefined)
    val kinds = lines.map(_.apply("type").asString).toSet
    assert(Set("Scene", "Action", "Character", "Dialogue").subsetOf(kinds))
    assert(j("titlePage")("lines").asArray.exists(l => l("type").asString == "Title"))
    assert(j("pageSettings")("pageSize").asString == "A4")
    // header text reconstructed
    val hf = j("pageSettings").get("headersAndFooters")
    assert(hf.exists(_.get("page1_header").exists(_.apply("text").asString == "MY HEADER")))
  }

  test("S5: Fountain sink (title page keys, slug/transition prefixes, dual ^)") {
    val f = Render.fountain(parsed.objects)
    assert(f.startsWith("Title: A Synthetic Script\n"))
    assert(f.contains("Author: Gen Erator"))
    assert(f.contains("\nINT. ")) // slugline stays bare (matched_as_slug)
    // transitions like "CUT TO:" keep their form (matched_as_transition)
    val transLines = f.linesIterator.filter(_.endsWith(" TO:")).toVector
    assert(parsed.objects.exists(_.kind == "Transition") == transLines.nonEmpty)
    // forced-slug prefix never applied to real INT. lines
    assert(!f.contains("\n.INT. "))
  }

  test("fountain escapes markdown-ish characters") {
    val o = graft.model.ScriptLine("Action", "star *bold* under_score", 2, "2")
    val f = Render.fountain(Seq(o))
    assert(f.contains("star \\*bold\\* under\\_score"))
  }
}
