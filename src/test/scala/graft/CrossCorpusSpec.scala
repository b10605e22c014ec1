package graft

import graft.spark.{ExtractTurn, Transcripts}
import graft.synth.ScreenplayGen
import org.scalatest.funsuite.AnyFunSuite

/** Cross-feature round-trip: ONE document family carrying dual-dialog
  * exchanges, colored draft revisions (with key and mixed pages), margin
  * line numbers, scene-number tokens, CONT'D markers and CONTINUED
  * header/footer bands at the same time. The reference's passes interact
  * (DualDialog splices blocks that Revisions later walks,
  * ParseText.php:1412-1563 + Parser.php:239-486; numberObject merging,
  * ParseText.php:2148-2160) — per-feature corpora (q32/q33/q34) cannot
  * see a regression confined to the product space, this family does.
  * Every expectation is generator-derived, never extractor output.
  */
class CrossCorpusSpec extends AnyFunSuite {

  test("cross-feature documents round-trip across seeds: content, duals, revisions, votes, flags") {
    val nSeeds = sys.env.getOrElse("GRAFT_CROSS_SEEDS", "30").toInt
    var totalDuals = 0
    var totalRevLines = 0
    var totalContPages = 0
    var totalStyled = 0
    var totalTight = 0
    (0 until nSeeds).foreach { seed =>
      val elems = ScreenplayGen.elementsWithDualTight(seed.toLong, 7 + seed % 5)
      val nDuals = elems.count(_.isInstanceOf[ScreenplayGen.Dual])
      val nTight = elems.count { case d: ScreenplayGen.Dual => d.tight; case _ => false }
      val doc = ScreenplayGen.render(elems, ScreenplayGen.Options(
        revisions = Transcripts.revPalette,
        marginLineNumbers = true,
        sceneNumbers = true,
        contdMarkers = true,
        continuedBands = true,
        inlineStyles = true,
        fragmentJitter = true))
      val t = ExtractTurn.extract(doc.xml)
      assert(t.format == "pdfxml", s"seed $seed: format ${t.format}")

      // 1. content stream
      val got = t.lines.map(l => (l.kind, l.text, l.pageNum, l.givenPageNum)).toVector
      val want = doc.expected
      locally {
        val n = math.min(got.size, want.size)
        var bad = -1; var i = 0
        while (i < n && bad < 0) { if (got(i) != want(i)) bad = i; i += 1 }
        if (bad < 0 && got.size != want.size) bad = n
        assert(bad < 0, s"seed $seed content mismatch at $bad: " +
          s"got=${got.lift(bad)} want=${want.lift(bad)} " +
          s"(sizes ${got.size}/${want.size})")
      }

      // 2. dual column/flag tracking
      val gotDual = t.lines.map(l => (l.column, l.hasDual, l.isDual)).toVector
      locally {
        var bad = -1; var i = 0
        while (i < gotDual.size && bad < 0) { if (gotDual(i) != doc.dualMeta(i)) bad = i; i += 1 }
        assert(bad < 0, s"seed $seed dual meta mismatch at $bad " +
          s"(${want.lift(bad)}): got=${gotDual.lift(bad)} want=${doc.dualMeta.lift(bad)}")
      }

      // 3. final revision list (rank order, names, colors)
      val gotRevs = t.revisions.zipWithIndex.map { case ((n, c), i) => (i.toLong, n, c) }.toVector
      assert(gotRevs == doc.revExpected.map { case (r, n, c, _) => (r, n, c) },
        s"seed $seed revision list: got=$gotRevs want=${doc.revExpected}")

      // 4. per-line revision spans (weight:start-end, canonical)
      val gotLineRevs = t.lines.map(_.revs
        .map { case (w, s, e) => s"$w:$s-$e" }.sorted.mkString("|")).toVector
      locally {
        var bad = -1; var i = 0
        while (i < gotLineRevs.size && bad < 0) {
          if (gotLineRevs(i) != doc.lineRevsExpected(i)) bad = i; i += 1
        }
        assert(bad < 0, s"seed $seed line revs mismatch at $bad " +
          s"(${want.lift(bad)}): got=${gotLineRevs.lift(bad)} " +
          s"want=${doc.lineRevsExpected.lift(bad)}")
      }

      // 4b. per-line b/i attr spans (inclusive ends, canonical)
      val gotAttrs = t.lines.map(_.attrs
        .map { case (k, s0, e0) => s"$k:$s0-$e0" }.sorted.mkString("|")).toVector
      locally {
        var bad = -1; var i = 0
        while (i < gotAttrs.size && bad < 0) {
          if (gotAttrs(i) != doc.lineAttrsExpected(i)) bad = i; i += 1
        }
        assert(bad < 0, s"seed $seed line attrs mismatch at $bad " +
          s"(${want.lift(bad)}): got=${gotAttrs.lift(bad)} " +
          s"want=${doc.lineAttrsExpected.lift(bad)}")
      }

      // 5. line-number side vote
      val gotVote = t.lineNumberSides.toVector
      assert(gotVote == doc.voteExpected,
        s"seed $seed vote mismatch: got=$gotVote want=${doc.voteExpected}")
      assert(gotVote.nonEmpty, s"seed $seed: empty vote table")

      // 6. CONTINUED band flags
      val gotCont = (t.sceneContinuedTop, t.sceneContinuedBottom, t.sceneContinuedNumber)
      assert(gotCont == doc.contExpected,
        s"seed $seed cont flags: got=$gotCont want=${doc.contExpected}")

      totalDuals += nDuals
      totalTight += nTight
      totalRevLines += doc.lineRevsExpected.count(_.nonEmpty)
      totalStyled += doc.lineAttrsExpected.count(_.nonEmpty)
      if (doc.contExpected._1) totalContPages += 1
    }
    assert(totalDuals >= nSeeds, s"dual family too small: $totalDuals")
    assert(totalTight >= nSeeds / 4, s"tight-dual (gap-split path) family too small: $totalTight")
    assert(totalRevLines >= 3 * nSeeds, s"colored-line family too small: $totalRevLines")
    assert(totalStyled >= nSeeds, s"styled-line family too small: $totalStyled")
    info(s"round-tripped $nSeeds cross-feature docs: $totalDuals duals, " +
      s"($totalTight tight/gap-split), " +
      s"$totalRevLines colored lines, $totalStyled styled objects, " +
      s"$totalContPages docs with CONTINUED bands")
  }
}
