package graft

import graft.pdfxml.PdfXml
import graft.synth.ScreenplayGen
import org.scalatest.funsuite.AnyFunSuite

/** A5 round-trip: the generator emits a margin line-number token beside
  * every body line; the engine's left-capture (F5) must strip them
  * without disturbing the extracted content, and the per-type side vote
  * (Parser.php:193-237) must match the generator's independently
  * computed expectation.
  */
class LineNumberVoteSpec extends AnyFunSuite {

  test("margin line numbers: content unchanged, vote table matches across seeds") {
    val nSeeds = sys.env.getOrElse("GRAFT_VOTE_SEEDS", "40").toInt
    var totalTypes = 0
    (0 until nSeeds).foreach { seed =>
      val elems = ScreenplayGen.elements(seed.toLong, 3 + seed % 4)
      val plain = ScreenplayGen.render(elems)
      val numbered = ScreenplayGen.render(elems,
        ScreenplayGen.Options(marginLineNumbers = true))
      // the number tokens must be invisible in the extracted content
      assert(numbered.expected == plain.expected)
      val r = PdfXml.parse(numbered.xml)
      val got = r.objects.map(l => (l.kind, l.text, l.pageNum, l.givenPageNum))
      assert(got == numbered.expected.map(e => (e._1, e._2, e._3, e._4)),
        s"seed $seed: content changed under margin numbers")
      val gotVote = r.lineNumbers.toSeq.sortBy(_._1)
        .map { case (t, (l, rr)) => (t, l, rr) }.toVector
      assert(gotVote == numbered.voteExpected,
        s"seed $seed: vote mismatch got=$gotVote want=${numbered.voteExpected}")
      assert(gotVote.nonEmpty, s"seed $seed: empty vote table")
      // the consumed flags must be cleared on the objects
      assert(r.objects.forall(o => !o.numberObject.left && !o.numberObject.right))
      totalTypes += gotVote.size
    }
    info(s"vote tables matched across $nSeeds docs ($totalTypes winning type rows)")
  }
}
