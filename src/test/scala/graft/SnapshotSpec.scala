package graft

import graft.pdfxml.PdfXml
import graft.render.Render
import graft.shakespeare.Shakespeare
import graft.synth.{ScreenplayGen, ShakespeareGen}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Snapshot regression lock for the sink renderers: checked-in outputs of
  * fixed-seed documents. If a change is INTENTIONAL, regenerate with the
  * snippet in the scaladoc of each golden file's generator (see git log
  * for the original Dbg recipe) — otherwise a diff here means the sink or
  * the extraction semantics drifted.
  */
class SnapshotSpec extends AnyFunSuite {

  private def res(name: String): String =
    Files.readString(Paths.get(s"src/test/resources/golden/$name"))

  test("JSON sink snapshot (seed 2024)") {
    val doc = ScreenplayGen.render(ScreenplayGen.elements(2024L, 5),
      ScreenplayGen.Options(headerText = "SNAPSHOT DRAFT"))
    assert(Render.json(PdfXml.parse(doc.xml)) == res("snapshot_seed2024.json"))
  }

  test("Fountain sink snapshot (seed 2024)") {
    val doc = ScreenplayGen.render(ScreenplayGen.elements(2024L, 5),
      ScreenplayGen.Options(headerText = "SNAPSHOT DRAFT"))
    assert(Render.fountain(PdfXml.parse(doc.xml).objects) == res("snapshot_seed2024.fountain"))
  }

  test("Fountain sink snapshot (shakespeare)") {
    val sh = ShakespeareGen.generate(2024L, 2, "Snapshot Play")
    assert(Render.fountain(Shakespeare.parse(sh.html)) == res("snapshot_shakespeare.fountain"))
  }
}
