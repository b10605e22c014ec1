package graft

import graft.pdfxml.{PdfXml, TextParser}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Fixture batch 4: per-PASS pinning via the DUMP_BLOCKS-style stage sink
  * (TextParser.StageLabels, mirroring ParseText.php's `-X1707` dumps at
  * :1178-1723). Instead of asserting only the end-to-end object stream,
  * each test asserts WHICH pass performed a given reclassification — the
  * block's kind immediately before and after the stage the reference
  * attributes the rule to.
  */
class StageDumpSpec extends AnyFunSuite {

  private def pg(body: Seq[String]): String =
    s"""<page number="1" height="1188" width="918">
       |<fontspec id="0" size="12" family="Courier" color="#000000"/>
       |${body.mkString("\n")}
       |</page>""".stripMargin
  private def t(top: Int, left: Int, s: String): String =
    s"""<text top="$top" left="$left" width="${s.length * 7}" height="17" font="0">$s</text>"""

  /** screenplay-shaped filler page establishing Character/Dialog indents */
  private val filler: String =
    pg(t(79, 108, "INT. BARN - DAY") +:
      (0 until 5).flatMap(i => Seq(
        t(151 + 108 * i, 400, "FRANK"),
        t(175 + 108 * i, 250, "I have something to say about it."),
        t(223 + 108 * i, 108, "He kicks the door frame once more."))))

  /** parse and collect (pageIdx, stageIdx) -> blocks; the fixture page is
    * the last page (filler precedes it)
    */
  private def stages(page: String): Int => Seq[TextParser.StageBlock] = {
    val out = mutable.LinkedHashMap.empty[(Int, Int), Seq[TextParser.StageBlock]]
    PdfXml.parse("<pdf2xml>\n" + filler + "\n" + page + "\n</pdf2xml>",
      (p, label, blocks) => out((p, TextParser.StageLabels.indexOf(label))) = blocks)
    val lastPage = out.keys.map(_._1).max
    // every page must have fired all ten stages, in order
    out.keys.map(_._1).toSet.foreach { (p: Int) =>
      assert(out.keys.filter(_._1 == p).map(_._2).toSeq == (0 until 10),
        s"page $p stages out of order")
    }
    // stages 8 and 9 bracket a reference-dead pass: identical snapshots
    assert(out((lastPage, 8)) == out((lastPage, 9)))
    stage => out((lastPage, stage))
  }

  private def kindOf(blocks: Seq[TextParser.StageBlock], needle: String): String =
    blocks.find(_.lines.exists(_.contains(needle)))
      .getOrElse(fail(s"no block containing '$needle'")).kind

  test("C4 then C6 then C11: indent promotes, scan-back demotes, finalize converts — each at its own stage") {
    val st = stages(pg(Seq(
      t(79, 400, "FRANK"),
      t(103, 250, "I will go now."),
      t(151, 108, "The barn door creaks open slowly."),
      t(175, 250, "strange words at dialog depth"))))
    val probe = "strange words"
    // content cascade can't type it (lowercase, mid-left)
    assert(kindOf(st(1), probe) == "Unknown")
    // C4: the INDENT pass promotes it to Dialog (x=250 = Dialog indent)
    assert(kindOf(st(2), probe) == "Dialog")
    assert(kindOf(st(3), probe) == "Dialog")
    // C6: dialog scan-back (ParseText.php:1291-1314) finds Action above
    // with no Character -> demotes to Unknown, before the dual pass
    assert(kindOf(st(4), probe) == "Unknown")
    assert(kindOf(st(5), probe) == "Unknown")
    // C11: Unknown finalization (:1570-1594): previous non-blank block is
    // Action -> Text, exactly at stage 6
    assert(kindOf(st(6), probe) == "Text")
  }

  test("C9 then C12: orphan Characters demote between stages 3 and 4; Shot emerges at stage 7") {
    val st = stages(pg(Seq(
      t(79, 108, "Frank waits by the door."),
      t(151, 108, "ANGLE ON THE DOOR")))) // 2 blank rows above
    // content cascade: uppercase single line -> Character (unsure);
    // indent pass promotes the lowercase one to Character too (shared x)
    assert(kindOf(st(1), "ANGLE") == "Character")
    assert(kindOf(st(1), "Frank waits") == "Unknown")
    assert(kindOf(st(2), "Frank waits") == "Character")
    assert(kindOf(st(3), "ANGLE") == "Character")
    // C9: orphan-character fix (:1384-1405) — no Dialog/Paren follows
    // either Character -> both demote to Action before the dual stage
    assert(kindOf(st(4), "ANGLE") == "Action")
    assert(kindOf(st(4), "Frank waits") == "Action")
    assert(kindOf(st(6), "ANGLE") == "Action")
    // C12 Shot arm (:1601-1615): Action + two blanks above + uppercase
    // single line -> Shot, exactly at stage 7
    assert(kindOf(st(7), "ANGLE") == "Shot")
    assert(kindOf(st(7), "Frank waits") == "Action")
  }

  test("C13: margin blank removal eats exactly linesBefore(type) blanks at stage 8") {
    val st = stages(pg(Seq(
      t(79, 108, "Frank closes the gate behind him now."),
      t(187, 108, "INT. HOUSE - NIGHT"),
      t(223, 108, "He enters and sits down by the fire."))))
    def blanksBefore(blocks: Seq[TextParser.StageBlock], needle: String): Int = {
      val ix = blocks.indexWhere(_.lines.exists(_.contains(needle)))
      assert(ix >= 0)
      (ix - 1 to 0 by -1).takeWhile(i => blocks(i).lines.forall(_.trim.isEmpty)).size
    }
    // Slugline consumes 2 margin blanks (:1623-1674 table), Action 1
    assert(blanksBefore(st(7), "INT. HOUSE") - blanksBefore(st(8), "INT. HOUSE") == 2)
    assert(blanksBefore(st(7), "He enters") == 1)
    assert(blanksBefore(st(8), "He enters") == 0)
  }
}
