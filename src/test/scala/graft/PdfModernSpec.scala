package graft

import graft.pdfxml.{PdfLex, PdfXml}
import graft.spark.ExtractTurn
import graft.synth.{PdfGen, ScreenplayGen}

import org.scalatest.funsuite.AnyFunSuite

/** PDF 1.5 structures (ISO 32000-1): cross-reference streams (§7.5.8),
  * object streams (§7.5.7), hybrid-reference files (§7.5.8.4), PNG/TIFF
  * predictors (§7.4.4.4) and the ASCIIHex/ASCII85 filters (§7.4.2–3).
  * PdfGen serializes the SAME document both ways — classic xref table vs
  * ObjStm + predictor-encoded xref stream — so every corpus family is
  * differentially attested through the modern reader path too.
  */
class PdfModernSpec extends AnyFunSuite {

  private val revPalette = Vector(
    ("Blue Rev.", "#0000ff"), ("Pink Rev.", "#ff69b4"), ("Yellow Rev.", "#d4d442"))

  private def sig(r: graft.pdfxml.ParseResult): String =
    r.objects.map(o =>
      s"${o.kind}|${o.typeJson}|${o.text}|${o.pageNum}|${o.givenPageNum}|" +
      s"${o.fontSize}|${o.alignment}|${o.numLines}|${o.hasDualLine}|${o.isDualLine}|" +
      s"${o.textAttributes.toSeq.sortBy(_._1)}|${o.revisions.toSeq.sortBy(_._1)}")
      .mkString("\n") +
    s"\n${r.numPages}|${r.pageSize}|${r.sceneContinuedTop}|${r.sceneContinuedBottom}|" +
    s"${r.sceneContinuedNumber}|${r.revisions.map(v => s"${v.name}:${v.color}")}|" +
    s"${r.lineNumbers.toSeq.sorted}"

  private def check(xml: String, clue: String): Unit = {
    val viaXml = PdfXml.parse(xml)
    val modern = PdfGen.fromXmlModern(xml)
    assert(modern.startsWith("%PDF-1.5"), clue)
    assert(modern.forall(_ < 128), s"$clue: modern PDF must be pure ASCII")
    // the modern body must actually be modern: no classic table, and the
    // non-stream objects must NOT appear as top-level headers
    assert(!modern.contains("\ntrailer\n"), s"$clue: classic trailer leaked")
    assert(!modern.contains("\nxref\n"), s"$clue: classic xref table leaked")
    assert(!modern.contains("\n1 0 obj\n"), s"$clue: catalog escaped the ObjStm")
    val viaModern = PdfXml.parsePdf(modern)
    assert(sig(viaXml) == sig(viaModern), s"$clue: modern PDF path diverged")
  }

  test("differential: plain corpus family (ObjStm + xref stream)") {
    for (seed <- 1 to 12)
      check(ScreenplayGen.render(ScreenplayGen.elements(seed, 6)).xml, s"plain seed $seed")
  }

  test("differential: dual-dialog corpus family") {
    for (seed <- 1 to 12)
      check(ScreenplayGen.render(ScreenplayGen.elementsWithDual(seed, 6)).xml,
        s"dual seed $seed")
  }

  test("differential: revision corpus family") {
    for (seed <- 1 to 12)
      check(ScreenplayGen.render(ScreenplayGen.elements(seed, 9),
        ScreenplayGen.Options(revisions = revPalette)).xml, s"rev seed $seed")
  }

  test("differential: cross-feature corpus family") {
    for (seed <- 1 to 20)
      check(ScreenplayGen.render(ScreenplayGen.elementsWithDualTight(seed, 8),
        ScreenplayGen.Options(revisions = revPalette, marginLineNumbers = true,
          sceneNumbers = true, contdMarkers = true, continuedBands = true,
          inlineStyles = true, fragmentJitter = true)).xml, s"cross seed $seed")
  }

  test("extract_turn dispatches modern PDFs and matches the XML path") {
    val doc = ScreenplayGen.render(ScreenplayGen.elementsWithDual(5, 6))
    val a = ExtractTurn.extract(doc.xml)
    val b = ExtractTurn.extract(PdfGen.fromXmlModern(doc.xml))
    assert(a.format == "pdfxml" && b.format == "pdf")
    assert(a.lines == b.lines)
    assert(a.numPages == b.numPages && a.pageSize == b.pageSize)
    assert(a.revisions == b.revisions && a.lineNumberSides == b.lineNumberSides)
  }

  test("damaged startxref on a modern PDF: scan recovers ObjStm members") {
    val xml = ScreenplayGen.render(ScreenplayGen.elements(7, 4)).xml
    val pdf = PdfGen.fromXmlModern(xml)
    // the catalog/pages/fonts/page dicts live ONLY inside the ObjStm, so
    // the fallback must look inside recovered object streams
    val broken = pdf.replaceAll("startxref\\n\\d+", "startxref\n999999999")
    assert(sig(PdfXml.parsePdf(broken)) == sig(PdfXml.parse(xml)),
      "scan reconstruction failed to recover ObjStm members")
    val stripped = pdf.substring(0, pdf.indexOf("startxref"))
    assert(sig(PdfXml.parsePdf(stripped)) == sig(PdfXml.parse(xml)),
      "no-startxref reconstruction (catalog inside ObjStm) diverged")
  }

  test("incremental update: xref stream /Prev into a classic chain") {
    // start from a CLASSIC file, append an updated content stream plus an
    // xref STREAM whose /Prev points at the classic table — mixed-form
    // chains are legal and common (a 1.5 writer updating a 1.4 file)
    val base = miniPdfString(
      "17 TL /F0 12 Tf 0 0 0 rg BT 1 0 0 1 108 1140 Tm (ORIGINAL TEXT) Tj ET",
      918, 1188)
    val newContent =
      "17 TL /F0 12 Tf 0 0 0 rg BT 1 0 0 1 108 1140 Tm (UPDATED TEXT) Tj ET"
    // anchor the classic TABLE itself — lastIndexOf("xref") would match
    // inside "startxref" and the chain test would silently pass through
    // the full-scan fallback instead of the /Prev path
    val origXref = base.indexOf("xref\n0 ")
    assert(origXref > 0, "classic table anchor not found")
    val sb = new StringBuilder(base)
    val newObjOff = sb.length
    sb.append("5 0 obj\n<< /Length ").append(newContent.length)
      .append(" >>\nstream\n").append(newContent).append("\nendstream\nendobj\n")
    val xrefStmOff = sb.length
    // W [1 3 2] rows for objects 5 (updated) and 6 (the xref stream itself)
    def row(t: Int, f2: Int, f3: Int): String =
      f"$t%02x$f2%06x$f3%04x"
    val rowsHex = row(1, newObjOff, 0) + row(1, xrefStmOff, 0) + ">"
    sb.append("6 0 obj\n<< /Type /XRef /Size 7 /Root 1 0 R /W [ 1 3 2 ] ")
      .append("/Index [ 5 2 ] /Filter /ASCIIHexDecode /Prev ").append(origXref)
      .append(s" /Length ${rowsHex.length} >>\nstream\n").append(rowsHex)
      .append("\nendstream\nendobj\n")
    sb.append("startxref\n").append(xrefStmOff).append("\n%%EOF\n")
    val pages = PdfLex.toNodes(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(pages.length == 1)
    assert(pages.head.children.filter(_.tag == "TEXT").map(_.value) ==
      Seq("UPDATED TEXT"), "xref-stream update must shadow the classic entry")
  }

  test("hybrid-reference file: /XRefStm entries beat the same revision's frees") {
    // classic table marks object 5 (the content stream) FREE — a pre-1.5
    // reader would not see it — while the trailer's /XRefStm points at an
    // xref stream giving its real offset (§7.5.8.4)
    val content =
      "17 TL /F0 12 Tf 0 0 0 rg BT 1 0 0 1 108 1140 Tm (HYBRID WINS) Tj ET"
    val widths = Seq.fill(95)("583.333333").mkString("[ ", " ", " ]")
    val objs = Vector(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 918 1188 ] " +
        "/Resources << /Font << /F0 4 0 R >> >> /Contents 5 0 R >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Courier /FirstChar 32 " +
        s"/LastChar 126 /Widths $widths >>",
      s"<< /Length ${content.length} >>\nstream\n" + content + "\nendstream")
    val sb = new StringBuilder("%PDF-1.5\n")
    val offs = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (body, i) =>
      offs(i + 1) = sb.length
      sb.append(i + 1).append(" 0 obj\n").append(body).append("\nendobj\n")
    }
    val xrefStmOff = sb.length
    def row(t: Int, f2: Int, f3: Int): String = f"$t%02x$f2%06x$f3%04x"
    val rowsHex = row(1, offs(5), 0) + row(1, xrefStmOff, 0) + ">"
    sb.append("6 0 obj\n<< /Type /XRef /Size 7 /Root 1 0 R /W [ 1 3 2 ] ")
      .append("/Index [ 5 2 ] /Filter /ASCIIHexDecode ")
      .append(s"/Length ${rowsHex.length} >>\nstream\n").append(rowsHex)
      .append("\nendstream\nendobj\n")
    val xrefOff = sb.length
    sb.append("xref\n0 6\n0000000000 65535 f \n")
    (1 to 4).foreach(n => sb.append(f"${offs(n)}%010d 00000 n \n"))
    sb.append("0000000000 00001 f \n") // object 5 hidden from old readers
    sb.append("trailer\n<< /Size 7 /Root 1 0 R /XRefStm ").append(xrefStmOff)
      .append(" >>\nstartxref\n").append(xrefOff).append("\n%%EOF\n")
    val pages = PdfLex.toNodes(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(pages.length == 1)
    assert(pages.head.children.filter(_.tag == "TEXT").map(_.value) ==
      Seq("HYBRID WINS"), "/XRefStm entry must override the classic free mark")
  }

  test("TIFF predictor 2 and per-filter /DecodeParms alignment") {
    val content =
      "17 TL /F0 12 Tf 0 0 0 rg BT 1 0 0 1 108 1140 Tm (TIFF PRED) Tj ET"
    val raw = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    // TIFF predictor 2 stores horizontal deltas; encode, deflate, hex --
    // decode order is therefore AHx, then Flate with predictor parms
    val cols = 16
    val enc = raw.clone()
    var r = 0
    while (r + cols <= enc.length) {
      var i = r + cols - 1
      while (i > r) { enc(i) = (enc(i) - enc(i - 1)).toByte; i -= 1 }
      r += cols
    }
    val d = new java.util.zip.Deflater()
    d.setInput(enc); d.finish()
    val buf = new Array[Byte](enc.length * 2 + 64)
    val n = d.deflate(buf); d.end()
    val hexFl = java.util.Arrays.copyOf(buf, n).map(b => f"${b & 0xff}%02x").mkString + ">"
    val body = s"<< /Length ${hexFl.length} " +
      "/Filter [ /ASCIIHexDecode /FlateDecode ] " +
      s"/DecodeParms [ null << /Predictor 2 /Columns $cols >> ] >>"
    val pdf = miniPdfWithContentObject(body + "\nstream\n" + hexFl + "\nendstream")
    val pages = PdfLex.toNodes(pdf)
    assert(pages.head.children.filter(_.tag == "TEXT").map(_.value) ==
      Seq("TIFF PRED"), "TIFF predictor reconstruction failed")
  }

  test("ASCII85 content stream incl. z-groups and partial final group") {
    val base =
      "17 TL /F0 12 Tf 0 0 0 rg BT 1 0 0 1 108 1140 Tm (A85 OK) Tj ET"
    // pad to a 4-byte boundary, then append 8 NUL bytes: they encode as
    // two 'z' groups, and in the DECODED stream a NUL is whitespace
    // between operators (ignored by the interpreter); a trailing "\nET"
    // leaves a partial group to exercise the u-padded tail
    val padded = base + " " * ((4 - base.length % 4) % 4) + "\u0000" * 8 + "\nET"
    val raw = padded.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val enc = a85(raw)
    assert(enc.contains("z"), "test vector must exercise the z shortcut")
    val pdf = miniPdfWithContentObject(
      s"<< /Length ${enc.length} /Filter /ASCII85Decode >>\nstream\n" + enc + "\nendstream")
    val pages = PdfLex.toNodes(pdf)
    assert(pages.head.children.filter(_.tag == "TEXT").map(_.value) ==
      Seq("A85 OK"))
  }

  test("mutation fuzz: extract_turn is total over modern PDFs") {
    val pdf = PdfGen.fromXmlModern(
      ScreenplayGen.render(ScreenplayGen.elementsWithDual(11, 5)).xml)
    val r = new java.util.SplittableRandom(0x5eed5eedL)
    var errors = 0
    for (_ <- 1 to 200) {
      val b = pdf.toCharArray
      val nMut = 1 + r.nextInt(3)
      for (_ <- 0 until nMut) {
        val i = r.nextInt(b.length)
        b(i) = (r.nextInt(127 - 9) + 9).toChar
      }
      val t = ExtractTurn.extract(new String(b))
      if (t.format == "error") errors += 1
      assert(Set("pdf", "error", "unknown").contains(t.format), t.format)
    }
    assert(errors > 0, "no mutation ever broke the parse — fuzz too weak")
  }

  // ---- helpers ------------------------------------------------------------

  private def a85(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= data.length) {
      var v = 0L
      (0 until 4).foreach(k => v = (v << 8) | (data(i + k) & 0xff))
      if (v == 0L) sb.append('z')
      else {
        val g = new Array[Char](5)
        var j = 4
        while (j >= 0) { g(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
        sb.appendAll(g)
      }
      i += 4
    }
    val left = data.length - i
    if (left > 0) {
      var v = 0L
      (0 until 4).foreach(k => v = (v << 8) | (if (k < left) data(i + k) & 0xff else 0))
      val g = new Array[Char](5)
      var j = 4
      while (j >= 0) { g(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
      sb.appendAll(g.take(left + 1))
    }
    sb.append("~>")
    sb.toString
  }

  /** single-page PDF whose content-stream OBJECT body is supplied verbatim
    * (dict + stream), for filter/predictor tests
    */
  private def miniPdfWithContentObject(contentObj: String): Array[Byte] = {
    val widths = Seq.fill(95)("583.333333").mkString("[ ", " ", " ]")
    val objs = Vector(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 918 1188 ] " +
        "/Resources << /Font << /F0 4 0 R >> >> /Contents 5 0 R >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Courier /FirstChar 32 " +
        s"/LastChar 126 /Widths $widths >>",
      contentObj)
    val sb = new StringBuilder("%PDF-1.5\n")
    val offs = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (body, i) =>
      offs(i + 1) = sb.length
      sb.append(i + 1).append(" 0 obj\n").append(body).append("\nendobj\n")
    }
    val xref = sb.length
    sb.append("xref\n0 ").append(objs.length + 1).append("\n0000000000 65535 f \n")
    (1 to objs.length).foreach(n => sb.append(f"${offs(n)}%010d 00000 n \n"))
    sb.append("trailer\n<< /Size ").append(objs.length + 1)
      .append(" /Root 1 0 R >>\nstartxref\n").append(xref).append("\n%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def miniPdfString(content: String, w: Int, h: Int): String = {
    val widths = Seq.fill(95)("583.333333").mkString("[ ", " ", " ]")
    val objs = Vector(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
      s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 $w $h ] " +
        "/Resources << /Font << /F0 4 0 R >> >> /Contents 5 0 R >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Courier /FirstChar 32 " +
        s"/LastChar 126 /Widths $widths >>",
      s"<< /Length ${content.length} >>\nstream\n" + content + "\nendstream")
    val sb = new StringBuilder("%PDF-1.4\n")
    val offs = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (body, i) =>
      offs(i + 1) = sb.length
      sb.append(i + 1).append(" 0 obj\n").append(body).append("\nendobj\n")
    }
    val xref = sb.length
    sb.append("xref\n0 ").append(objs.length + 1).append("\n0000000000 65535 f \n")
    (1 to objs.length).foreach(n => sb.append(f"${offs(n)}%010d 00000 n \n"))
    sb.append("trailer\n<< /Size ").append(objs.length + 1)
      .append(" /Root 1 0 R >>\nstartxref\n").append(xref).append("\n%%EOF\n")
    sb.toString
  }
}
