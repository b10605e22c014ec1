package graft.tools

import graft.shakespeare.Shakespeare

import java.nio.file.{Files, Paths}

/** CLI: extract a single document and print its typed line stream.
  *
  * The single-document analogue of the reference CLI
  * (src/parser/analyzer/TestParser.php:53-61) — useful for eyeballing
  * extraction output and for driving the library end-to-end without Spark.
  *
  * Usage: runMain graft.tools.ExtractFile <file> [--limit N] [--fountain|--json]
  * Dispatch on extension like reference Parser.php:66-88
  * (.shakespeare -> HTML path; .xml -> pdftohtml-XML path); --fountain and
  * --json render through the reference's sinks (WriteOutput.php).
  */
object ExtractFile {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: ExtractFile <file.shakespeare|file.xml|file.pdf> [--limit N] [--fountain|--json]")
      sys.exit(2)
    }
    val path = args(0)
    val limit = args.sliding(2).collectFirst { case Array("--limit", n) => n.toInt }.getOrElse(Int.MaxValue)
    val bytes = try Files.readAllBytes(Paths.get(path)) catch {
      case e: java.io.IOException =>
        System.err.println(s"error: cannot read $path: ${e.getMessage}")
        sys.exit(2); return
    }
    val text = new String(bytes, if (path.endsWith(".shakespeare")) "ISO-8859-1" else "UTF-8")
    val isXml = path.endsWith(".xml")
    val isPdf = path.endsWith(".pdf")
    if (!isXml && !isPdf && !path.endsWith(".shakespeare")) {
      System.err.println(s"error: unsupported extension for $path (expected .shakespeare, .xml or .pdf)")
      sys.exit(2); return
    }
    // raw PDFs go through the byte-stream lexer into the same pipeline
    lazy val parsedXml =
      if (isPdf) graft.pdfxml.PdfXml.parseNodes(graft.pdfxml.PdfLex.toNodes(bytes), null)
      else graft.pdfxml.PdfXml.parse(text)
    val lines = if (isXml || isPdf) parsedXml.objects else Shakespeare.parse(text)

    if (args.contains("--fountain")) {
      print(graft.render.Render.fountain(lines))
    } else if (args.contains("--json")) {
      if (isXml || isPdf) println(graft.render.Render.json(parsedXml))
      else {
        // HTML path: wrap the line stream in an empty-page-settings result
        val r = graft.pdfxml.ParseResult(lines, Vector(Vector.empty), Vector(Vector.empty),
          new graft.pdfxml.ColorsList, 2, "Letter", false, false, false, Vector.empty, Map.empty)
        println(graft.render.Render.json(r))
      }
    } else {
      lines.take(limit).foreach { l =>
        val gp = if (l.givenPageNum.nonEmpty) l.givenPageNum else "-"
        println(s"p${l.pageNum}/$gp\t${l.typeJson}\t${l.text}")
      }
    }
    System.err.println(s"${lines.size} lines")
  }
}
