package graft

import graft.pdfxml.PdfXml
import graft.synth.ScreenplayGen
import org.scalatest.funsuite.AnyFunSuite

/** Randomized round-trip for dual dialog (C10): the generator emits the
  * canonical side-by-side layout across many seeds (variable speech
  * lengths, unequal column heights, page-break placement) and the
  * extractor must produce the recovery splice — left Character +
  * merged left Dialog, right Character + merged right Dialog — with the
  * dual flags set. Widens C10 coverage from two hand fixtures to a
  * seeded family.
  */
class DualRoundTripSpec extends AnyFunSuite {

  test("dual-dialog documents round-trip across seeds") {
    // default 25 seeds; GRAFT_DUAL_SEEDS widens the family for soak runs
    val nSeeds = sys.env.getOrElse("GRAFT_DUAL_SEEDS", "25").toInt
    var totalDuals = 0
    (0 until nSeeds).foreach { seed =>
      val elems = ScreenplayGen.elementsWithDual(seed.toLong, 4)
      val nDuals = elems.count(_.isInstanceOf[ScreenplayGen.Dual])
      totalDuals += nDuals
      val doc = ScreenplayGen.render(elems,
        ScreenplayGen.Options(headerText = s"DUAL DRAFT $seed"))
      val r = PdfXml.parse(doc.xml)
      val got = r.objects.map(l => (l.kind, l.text, l.pageNum, l.givenPageNum))
      val want = doc.expected.map { case (k, t, p, g) => (k, t, p, g) }
      val n = math.min(got.size, want.size)
      var firstBad = -1
      var i = 0
      while (i < n && firstBad < 0) { if (got(i) != want(i)) firstBad = i; i += 1 }
      if (firstBad < 0 && got.size != want.size) firstBad = n
      assert(firstBad < 0,
        s"seed $seed mismatch at $firstBad: got=${got.lift(firstBad)} want=${want.lift(firstBad)}")

      // dual flags: every generated exchange must surface as a
      // hasDualLine Character followed (after its Dialog) by an
      // isDualLine Character
      val flagged = r.objects.filter(o => o.kind == "Character" &&
        (o.hasDualLine || o.isDualLine))
      assert(flagged.count(_.hasDualLine) == nDuals, s"seed $seed: left flags")
      assert(flagged.count(_.isDualLine) == nDuals, s"seed $seed: right flags")
    }
    assert(totalDuals >= 20, s"fixture family too small: $totalDuals duals")
    info(s"round-tripped $totalDuals dual exchanges across $nSeeds seeds")
  }
}
