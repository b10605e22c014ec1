package graft

import graft.pdfxml.PdfXml
import graft.synth.ScreenplayGen
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end XML-path checks: the synthetic generator derives the expected
  * (kind, text, pageNum, givenPageNum) stream independently from the layout
  * grammar (FIXTURES.md §2a); the extractor must reproduce it exactly.
  */
class PdfXmlSpec extends AnyFunSuite {

  private def check(seed: Long, scenes: Int, opts: ScreenplayGen.Options): Unit = {
    val doc = ScreenplayGen.render(ScreenplayGen.elements(seed, scenes), opts)
    val got = PdfXml.parse(doc.xml).objects
      .map(l => (l.kind, l.text, l.pageNum, l.givenPageNum))
    val want = doc.expected
    if (got != want) {
      val n = math.min(got.size, want.size)
      var bad = -1
      var i = 0
      while (i < n && bad < 0) { if (got(i) != want(i)) bad = i; i += 1 }
      if (bad < 0) bad = n
      val ctx = (math.max(0, bad - 3) to math.min(math.max(got.size, want.size) - 1, bad + 3))
        .map(j => s"  [$j] got=${got.lift(j)}\n       want=${want.lift(j)}").mkString("\n")
      fail(s"seed=$seed mismatch at $bad (got ${got.size} want ${want.size}):\n$ctx")
    }
  }

  test("synthetic screenplays round-trip (title page + headers + page numbers)") {
    for (seed <- 1L to 10L)
      check(seed, scenes = 8, ScreenplayGen.Options(headerText = "MY SCRIPT - Draft"))
  }

  test("synthetic screenplays round-trip (no title page, no headers)") {
    for (seed <- 11L to 15L)
      check(seed, scenes = 10, ScreenplayGen.Options(titlePage = false, headerText = "", pageNumbers = false))
  }

  test("deterministic across runs") {
    val a = ScreenplayGen.render(ScreenplayGen.elements(42L, 5))
    val b = ScreenplayGen.render(ScreenplayGen.elements(42L, 5))
    assert(a.xml == b.xml)
    val p1 = PdfXml.parse(a.xml).objects
    val p2 = PdfXml.parse(b.xml).objects
    assert(p1 == p2)
  }
}
