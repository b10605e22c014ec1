package graft.tools

import graft.pdfxml.{PdfXml, TextParser}

/** Dev aid: print DUMP_BLOCKS-style stage snapshots for a small inline
  * fixture (mirrors the reference's -X1707 debugging flow).
  * Usage: runMain graft.tools.StageDebug <n> — picks fixture variant n.
  */
object StageDebug {
  private def pg(body: Seq[String]): String =
    s"""<page number="1" height="1188" width="918">
       |<fontspec id="0" size="12" family="Courier" color="#000000"/>
       |${body.mkString("\n")}
       |</page>""".stripMargin
  private def t(top: Int, left: Int, s: String): String =
    s"""<text top="$top" left="$left" width="${s.length * 7}" height="17" font="0">$s</text>"""

  private val filler: String =
    pg(t(79, 108, "INT. BARN - DAY") +:
      (0 until 5).flatMap(i => Seq(
        t(151 + 108 * i, 400, "FRANK"),
        t(175 + 108 * i, 250, "I have something to say about it."),
        t(223 + 108 * i, 108, "He kicks the door frame once more."))))

  def main(args: Array[String]): Unit = {
    val variant = args.headOption.flatMap(_.toIntOption).getOrElse(0)
    if (variant < 0 || variant > 3) {
      System.err.println("usage: StageDebug [0..3] (fixture variant)")
      sys.exit(2)
    }
    val page = variant match {
      case 0 => pg(Seq(
        t(79, 400, "FRANK"),
        t(103, 250, "I will go now."),
        t(151, 108, "The barn door creaks open slowly."),
        t(175, 250, "strange words at dialog depth")))
      case 1 => pg(Seq(
        t(79, 108, "Frank stares at the broken fence post."),
        t(103, 136, "Then he turns away without a word.")))
      case 2 => pg(Seq(
        t(79, 108, "Frank closes the gate behind him now."),
        t(187, 108, "INT. HOUSE - NIGHT"),
        t(223, 108, "He enters and sits down by the fire.")))
      case 3 => pg(Seq(
        t(79, 108, "Frank waits by the door."),
        t(151, 108, "ANGLE ON THE DOOR")))
    }
    PdfXml.parse("<pdf2xml>\n" + filler + "\n" + page + "\n</pdf2xml>",
      (p, label, blocks) => {
        println(s"== page $p stage: $label")
        blocks.zipWithIndex.foreach { case (b, i) =>
          println(f"  [$i%2d] ${b.kind}%-12s unsure=${b.unsure} x=${b.x} ${b.lines.map(l => "'" + l + "'").mkString(",")}")
        }
      })
  }
}
