package graft.tools

import graft.synth.ScreenplayGen

import java.nio.file.{Files, Paths}

/** CLI: write a deterministic synthetic pdftohtml-XML screenplay document.
  *
  * Usage: runMain graft.tools.GenDoc <out.xml> [seed] [scenes]
  */
object GenDoc {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: GenDoc <out.xml> [seed] [scenes]"); sys.exit(2) }
    val seed = if (args.length > 1) args(1).toLong else 42L
    val scenes = if (args.length > 2) args(2).toInt else 8
    val doc = ScreenplayGen.render(ScreenplayGen.elements(seed, scenes),
      ScreenplayGen.Options(headerText = "SYNTHETIC SCRIPT"))
    Files.write(Paths.get(args(0)), doc.xml.getBytes("UTF-8"))
    System.err.println(s"${doc.xml.length} bytes, ${doc.expected.size} expected lines")
  }
}
