package graft

import graft.pdfxml.PdfXml
import graft.render.Render
import graft.shakespeare.Shakespeare
import graft.synth.ScreenplayGen
import graft.util.Json
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Second fixture batch: jitter invariance, Shot/The End/hrule/contact
  * classification, dual-dialog combine path, and the JSON sink tied to the
  * reference golden corpus.
  */
class PdfXmlFixture2Spec extends AnyFunSuite {

  test("G1/G2 invariance: fragment-split + y-jitter leaves extraction unchanged") {
    for (seed <- 30L to 36L) {
      val elems = ScreenplayGen.elements(seed, 6)
      val clean = ScreenplayGen.render(elems, ScreenplayGen.Options(headerText = "HDR"))
      val jittered = ScreenplayGen.render(elems,
        ScreenplayGen.Options(headerText = "HDR", fragmentJitter = true))
      assert(clean.xml != jittered.xml)
      val a = PdfXml.parse(clean.xml).objects.map(l => (l.kind, l.text, l.pageNum))
      val b = PdfXml.parse(jittered.xml).objects.map(l => (l.kind, l.text, l.pageNum))
      assert(a == b, s"seed=$seed jittered extraction diverged")
      assert(b == clean.expected.map(e => (e._1, e._2, e._3)))
    }
  }

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

  private def parse2(body: Seq[String]) =
    PdfXml.parse("<pdf2xml>\n" + filler + "\n" + pg(body) + "\n</pdf2xml>")
      .objects.drop(12).map(l => (l.kind, l.text))

  test("C12: caps one-liner after two blanks becomes a Shot") {
    // gap 48 -> 2 blanks; margin for Shot is 2 so both removed afterwards
    val got = parse2(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(163, 108, "ANGLE ON THE DOOR"),
      t(199, 108, "Grace walks out. She smiles.")))
    assert(got == Vector(
      ("Slugline", "INT. LOFT - NIGHT"),
      ("Action", "Frank walks in. He stares."),
      ("Shot", "ANGLE ON THE DOOR"),
      ("Action", "Grace walks out. She smiles.")))
  }

  test("The End classifies as Action; hrule becomes Text") {
    val got = parse2(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 108, "--------------"),
      t(187, 108, "THE END")))
    assert(got.map(_._1) == Vector("Slugline", "Action", "Text", "Text", "Action"))
    assert(got.last == ("Action", "THE END"))
  }

  test("contact info explodes per line as Text") {
    val got = parse2(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 108, "Jane Writer"),
      t(175, 108, "Springfield, IL 62704"),
      t(199, 108, "Phone: 555-123-4567.")))
    // three tight lines merge into one block; zipcode makes it Contact Info
    assert(got.count(_._1 == "Text") >= 3)
    assert(got.exists(_._2 == "Springfield, IL 62704"))
  }

  test("C10 combine path: near-aligned right column merges into one block") {
    // second row right fragment within 2 chars of prev2.x -> combine
    val r = PdfXml.parse("<pdf2xml>\n" + filler + "\n" + pg(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 252, "ALICE"), t(151, 480, "BOB"),
      t(175, 180, "We should go."), t(175, 450, "We should stay."),
      t(199, 180, "Now, even."), t(199, 456, "Forever, even.")
    )) + "\n</pdf2xml>").objects.drop(12)
    val kinds = r.map(l => (l.kind, l.text))
    assert(kinds(2) == ("Character", "ALICE"))
    assert(kinds(4) == ("Character", "BOB"))
    // right column: one Dialog block containing both right-side lines
    assert(kinds(5)._1 == "Dialog")
    assert(kinds(5)._2.contains("We should stay."))
  }

  test("C10 split path: merged dual-dialog lines split on the widest gap") {
    // columns inside ONE piece (7-space gap < the 12-space piece splitter):
    // the dual pass must split each line left of character2.x
    val r = PdfXml.parse("<pdf2xml>\n" + filler + "\n" + pg(Seq(
      t(79, 108, "INT. LOFT - NIGHT"),
      t(115, 108, "Frank walks in. He stares."),
      t(151, 252, "ALICE"), t(151, 500, "BOB"),
      t(175, 180, "We should go.       We should stay."),
      t(199, 180, "Now, even.       Forever, even.")
    )) + "\n</pdf2xml>").objects.drop(12)
    val got = r.map(l => (l.kind, l.text, l.hasDualLine, l.isDualLine))
    assert(got(2) == ("Character", "ALICE", true, false))
    assert(got(3) == ("Dialog", "We should go. Now, even.", false, false))
    assert(got(4) == ("Character", "BOB", false, true))
    assert(got(5)._2 == "We should stay.")
    assert(got(6)._2 == "Forever, even.")
  }

  test("S6 sink lines match the reference golden corpus for every play") {
    val corpus = Paths.get("/root/reference/shakespeare")
    val pairs = Files.list(corpus).iterator.asScala.filter(Files.isDirectory(_)).flatMap { cat =>
      Files.list(cat).iterator.asScala.filter(_.toString.endsWith(".shakespeare"))
    }.toVector.sortBy(_.toString)
    assert(pairs.size == 37)
    pairs.foreach { in =>
      val html = new String(Files.readAllBytes(in), "ISO-8859-1")
      val lines = Shakespeare.parse(html)
      // render through the Fountain sink and spot-check shape
      val fountain = Render.fountain(lines)
      assert(fountain.startsWith("Title: "))
      // golden lines[] types/texts must match what the JSON sink would emit
      val goldenPath = Paths.get(in.toString.stripSuffix(".shakespeare") + ".json")
      val golden = Json.parse(Files.readString(goldenPath))
      val goldBody = golden("lines").asArray.map(l => (l("type").asString, l("text").asString))
      val ourBody = lines.filter(_.pageNum > 1).map(l => (l.typeJson, l.text))
      assert(ourBody == goldBody, in.getFileName.toString)
    }
  }
}
