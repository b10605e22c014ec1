package graft.tools

import graft.pdfxml.PdfXml
import graft.synth.{PdfGen, ScreenplayGen}

/** Single-thread kernel cost of the raw-PDF path vs the XML path over the
  * same cross-feature documents (payload sizes differ — PDFs carry xref +
  * font objects + content-stream syntax).
  */
object PdfLexProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200
    val docs = (1 to n).map { seed =>
      val d = ScreenplayGen.render(
        ScreenplayGen.elementsWithDualTight(seed, 8),
        ScreenplayGen.Options(
          revisions = Vector(("Blue Rev.", "#0000ff"), ("Pink Rev.", "#ff69b4")),
          marginLineNumbers = true, sceneNumbers = true, contdMarkers = true,
          continuedBands = true, inlineStyles = true, fragmentJitter = true))
      (d.xml, PdfGen.fromXml(d.xml))
    }
    val xmlBytes = docs.map(_._1.length.toLong).sum
    val pdfBytes = docs.map(_._2.length.toLong).sum
    def time(label: String, f: () => Unit): Double = {
      f(); f() // warm
      val t0 = System.nanoTime()
      f()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$label%-10s ${ms / n}%.3f ms/doc")
      ms
    }
    println(f"docs=$n xml=${xmlBytes / n}%d B/doc pdf=${pdfBytes / n}%d B/doc")
    val a = time("xml", () => docs.foreach(d => PdfXml.parse(d._1)))
    val b = time("pdf", () => docs.foreach(d => PdfXml.parsePdf(d._2)))
    println(f"pdf/xml ratio = ${b / a}%.2f")
  }
}
