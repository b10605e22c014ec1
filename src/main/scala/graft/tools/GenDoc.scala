package graft.tools

import graft.synth.{PdfGen, ScreenplayGen}

import java.nio.file.{Files, Paths}

/** CLI: write a deterministic synthetic screenplay document. An `.xml`
  * path gets the pdftohtml-XML form; a `.pdf` path gets the SAME document
  * rendered as a real PDF ([[PdfGen]]) — classic xref by default, the
  * PDF 1.5 ObjStm + xref-stream serialization with `modern`, or the
  * classic form with filtered content streams (pages alternate
  * A85+LZW / AHx+RunLength) with `filtered`.
  *
  * Usage: runMain graft.tools.GenDoc <out.xml|out.pdf> [seed] [scenes] [modern|filtered]
  */
object GenDoc {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: GenDoc <out.xml|out.pdf> [seed] [scenes] [modern]")
      sys.exit(2)
    }
    val seed = if (args.length > 1) args(1).toLong else 42L
    val scenes = if (args.length > 2) args(2).toInt else 8
    val modern = args.length > 3 && args(3) == "modern"
    val doc = ScreenplayGen.render(ScreenplayGen.elements(seed, scenes),
      ScreenplayGen.Options(headerText = "SYNTHETIC SCRIPT"))
    // XML stays UTF-8 (its declaration says so); PDFs map chars to bytes
    // 1:1 via latin-1, matching PdfLex's byte model
    val (out, cs) =
      if (!args(0).endsWith(".pdf")) (doc.xml, "UTF-8")
      else if (modern) (PdfGen.fromXmlModern(doc.xml), "ISO-8859-1")
      else if (args.length > 3 && args(3) == "filtered")
        (PdfGen.fromXmlFiltered(doc.xml), "ISO-8859-1")
      else (PdfGen.fromXml(doc.xml), "ISO-8859-1")
    Files.write(Paths.get(args(0)), out.getBytes(cs))
    System.err.println(s"${out.length} bytes, ${doc.expected.size} expected lines")
  }
}
