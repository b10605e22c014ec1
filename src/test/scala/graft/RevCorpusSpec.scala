package graft

import graft.pdfxml.PdfXml
import graft.synth.ScreenplayGen
import org.scalatest.funsuite.AnyFunSuite

/** Randomized round-trip for revision inference (A4): the generator
  * renders colored drafts (key pages binding header names to colors,
  * mixed pages exercising the weight-list bump) and independently
  * simulates the reference's weight dynamics (Parser.php:239-486); the
  * engine's final revision list — order, names, colors — and its
  * per-revision span attribution must match the simulation exactly.
  */
class RevCorpusSpec extends AnyFunSuite {

  test("colored-revision documents round-trip across seeds: list order + span attribution") {
    val nSeeds = sys.env.getOrElse("GRAFT_REV_SEEDS", "40").toInt
    var totalRevs = 0
    var totalMixedDocs = 0
    var totalBumped = 0
    (0 until nSeeds).foreach { seed =>
      val doc = ScreenplayGen.render(
        ScreenplayGen.elements(seed.toLong, 7 + seed % 5),
        ScreenplayGen.Options(revisions = graft.spark.Transcripts.revPalette))
      val r = PdfXml.parse(doc.xml)

      // final list: (rank, name, color) in the engine's weight order
      val got = r.revisions.zipWithIndex.map { case (rev, i) => (i.toLong, rev.name, rev.color) }
      val want = doc.revExpected.map { case (rank, name, color, _) => (rank, name, color) }
      assert(got == want, s"seed $seed: revision list mismatch: got=$got want=$want")

      // span attribution: weight w indexes the rank-w revision
      val spansByWeight = r.objects.flatMap(_.revisions.toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2.size).sum.toLong).toMap
      doc.revExpected.foreach { case (rank, name, _, nSpans) =>
        assert(spansByWeight.getOrElse(rank.toInt, 0L) == nSpans,
          s"seed $seed: span count for rank $rank ($name): " +
            s"got=${spansByWeight.getOrElse(rank.toInt, 0L)} want=$nSpans")
      }
      // nothing attributed outside the expected ranks
      assert(spansByWeight.keySet.forall(w => want.exists(_._1 == w.toLong)),
        s"seed $seed: spans on unexpected weights: ${spansByWeight.keySet}")

      totalRevs += want.size
      if (want.size >= 2) totalMixedDocs += 1
      // the bump (Parser.php:377-382) visibly reordered iff the final
      // order differs from reversed creation (= palette) order
      val creationRev = graft.spark.Transcripts.revPalette.map(_._1)
        .filter(n => want.exists(_._2 == n)).reverse
      if (want.size >= 2 && want.map(_._2) != creationRev) totalBumped += 1
    }
    assert(totalRevs >= nSeeds, s"family too small: $totalRevs revisions")
    assert(totalMixedDocs >= nSeeds / 2, s"too few multi-revision docs: $totalMixedDocs")
    assert(totalBumped >= nSeeds / 5,
      s"weight-bump reorder unexercised: only $totalBumped docs reordered")
    info(s"round-tripped $totalRevs revisions across $nSeeds colored docs " +
      s"($totalMixedDocs multi-rev, $totalBumped bump-reordered)")
  }
}
