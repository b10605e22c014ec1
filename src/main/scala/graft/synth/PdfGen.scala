package graft.synth

import graft.pdfxml.XmlTok

import scala.collection.mutable.ArrayBuffer

/** Renders a synthetic pdftohtml-XML document (the [[ScreenplayGen]]
  * corpus) into a REAL single-file PDF — classic xref table, page tree,
  * Type1 Courier fonts with explicit `/Widths`, and one content stream
  * per page drawing every fragment at its position — so the raw-PDF lexer
  * ([[graft.pdfxml.PdfLex]]) can be driven over the exact same fragment
  * geometry the XML path sees and the two extraction paths can be
  * compared fragment-for-fragment.
  *
  * Geometry conventions (the inverse of PdfLex's):
  *   - MediaBox = [0 0 pageW pageH] from the page node's WIDTH/HEIGHT;
  *   - a fragment at (top, left) draws at `x = left`,
  *     `y = pageH - top - size` (baseline), via `Tm`;
  *   - text leading `TL` carries the fragment HEIGHT (pdftohtml's line
  *     box), set per text object;
  *   - glyph widths: every ASCII glyph 583.333333/1000 em, so at size 12
  *     the advance is 6.999999996 px/char — rounding recovers the XML
  *     corpus's exact `7 * length` WIDTH attribute from honest /Widths
  *     metrics (not from any side channel);
  *   - the page's declared fontspec palette becomes a zero-glyph
  *     "preamble" (`() Tj` per fontspec, in declaration order) so the
  *     lexer's first-use fontspec numbering reproduces the XML ids;
  *   - b/i spans render as font switches (Courier-Bold / Courier-Oblique)
  *     between `Tj` runs inside one text object.
  *
  * Output is pure ASCII, so the PDF survives a parquet `string` column
  * byte-for-byte (PdfLex maps chars back to bytes via latin-1).
  */
object PdfGen {

  private val GlyphWidth = "583.333333"
  private val FirstChar = 32
  private val LastChar = 126

  def fromXml(xml: String): String = fromNodes(XmlTok.parse(xml))

  def fromNodes(tops: Vector[XmlTok.XNode]): String = {
    val pages: Vector[XmlTok.XNode] = tops.flatMap { top =>
      if (top.tag == "PDF2XML") top.children.toVector.filter(_.tag == "PAGE")
      else if (top.tag == "PAGE") Vector(top)
      else Vector.empty
    }

    // ---- objects ----------------------------------------------------------
    // 1 catalog, 2 pages, 3-5 fonts (F0/FB/FI), 6 widths,
    // then per page i: 7+2i page dict, 8+2i content stream
    val nPages = pages.length
    val objs = ArrayBuffer.empty[(Int, String)] // (num, body without header)

    val kids = (0 until nPages).map(i => s"${7 + 2 * i} 0 R").mkString(" ")
    objs += 1 -> "<< /Type /Catalog /Pages 2 0 R >>"
    objs += 2 -> s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>"
    def fontObj(base: String): String =
      s"<< /Type /Font /Subtype /Type1 /BaseFont /$base /FirstChar $FirstChar " +
        s"/LastChar $LastChar /Widths 6 0 R /Encoding /WinAnsiEncoding >>"
    objs += 3 -> fontObj("Courier")
    objs += 4 -> fontObj("Courier-Bold")
    objs += 5 -> fontObj("Courier-Oblique")
    objs += 6 -> Seq.fill(LastChar - FirstChar + 1)(GlyphWidth)
      .mkString("[ ", " ", " ]")

    pages.zipWithIndex.foreach { case (page, i) =>
      val pw = page.attrOrElse("WIDTH", "612")
      val ph = page.attrOrElse("HEIGHT", "792")
      val content = pageContent(page, ph.toDouble)
      objs += (7 + 2 * i) ->
        (s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 $pw $ph ] " +
          "/Resources << /Font << /F0 3 0 R /FB 4 0 R /FI 5 0 R >> >> " +
          s"/Contents ${8 + 2 * i} 0 R >>")
      objs += (8 + 2 * i) ->
        (s"<< /Length ${content.length} >>\nstream\n" + content + "\nendstream")
    }

    // ---- serialize with a classic xref table ------------------------------
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    objs.foreach { case (num, body) =>
      offsets(num) = sb.length
      sb.append(num).append(" 0 obj\n").append(body).append("\nendobj\n")
    }
    val xrefOff = sb.length
    sb.append("xref\n0 ").append(objs.length + 1).append('\n')
    sb.append("0000000000 65535 f \n")
    (1 to objs.length).foreach { n =>
      sb.append(f"${offsets(n)}%010d 00000 n \n")
    }
    sb.append("trailer\n<< /Size ").append(objs.length + 1)
      .append(" /Root 1 0 R >>\nstartxref\n").append(xrefOff).append("\n%%EOF\n")
    sb.toString
  }

  private def pageContent(page: XmlTok.XNode, pageH: Double): String = {
    val sb = new StringBuilder
    val fontspecs = page.children.filter(_.tag == "FONTSPEC")
    val colorOf = fontspecs.map(f =>
      f.attrOrElse("ID", "") -> f.attrOrElse("COLOR", "#000000")).toMap
    val sizeOf = fontspecs.map(f =>
      f.attrOrElse("ID", "") -> f.attrOrElse("SIZE", "12")).toMap

    // palette preamble: zero-glyph shows pin fontspec first-use order
    fontspecs.foreach { f =>
      sb.append("BT /F0 ").append(f.attrOrElse("SIZE", "12")).append(" Tf ")
        .append(rgb(f.attrOrElse("COLOR", "#000000"))).append(" rg () Tj ET\n")
    }

    page.children.filter(_.tag == "TEXT").foreach { t =>
      val fontId = t.attrOrElse("FONT", "0")
      val size = sizeOf.getOrElse(fontId, "12")
      val top = t.attrOrElse("TOP", "0").toDouble
      val left = t.attrOrElse("LEFT", "0")
      val h = t.attrOrElse("HEIGHT", "17")
      val y = num(pageH - top - size.toDouble)
      sb.append("BT ").append(h).append(" TL ")
        .append(rgb(colorOf.getOrElse(fontId, "#000000"))).append(" rg ")
        .append("1 0 0 1 ").append(left).append(' ').append(y).append(" Tm\n")
      runsOf(t).foreach { case (style, text) =>
        val res = style match { case "b" => "/FB"; case "i" => "/FI"; case _ => "/F0" }
        sb.append(res).append(' ').append(size).append(" Tf (")
          .append(escape(text)).append(") Tj ")
      }
      sb.append("ET\n")
    }
    sb.toString
  }

  /** split a TEXT node's value into (style, run) pieces at its b/i span
    * boundaries (inclusive code-point ranges, non-overlapping by corpus
    * construction)
    */
  private def runsOf(t: XmlTok.XNode): Vector[(String, String)] = {
    val value = t.value
    if (t.textAttributes.isEmpty) return Vector(("", value))
    val cps = value.codePoints().toArray
    val styleAt = Array.fill(cps.length)("")
    t.textAttributes.foreach { case (tag, spans) =>
      spans.foreach { sp =>
        var i = math.max(0, sp.start)
        while (i <= math.min(cps.length - 1, sp.end)) { styleAt(i) = tag; i += 1 }
      }
    }
    val out = Vector.newBuilder[(String, String)]
    var i = 0
    while (i < cps.length) {
      val st = styleAt(i)
      var j = i
      while (j < cps.length && styleAt(j) == st) j += 1
      out += ((st, new String(cps, i, j - i)))
      i = j
    }
    out.result()
  }

  private def rgb(hex: String): String = {
    val h = if (hex.startsWith("#") && hex.length == 7) hex else "#000000"
    def c(s: String): String = num(Integer.parseInt(s, 16) / 255.0)
    s"${c(h.substring(1, 3))} ${c(h.substring(3, 5))} ${c(h.substring(5, 7))}"
  }

  /** shortest exact-enough decimal (6 places, trailing zeros trimmed) */
  private def num(d: Double): String = {
    if (d == math.rint(d)) d.toLong.toString
    else {
      var s = f"$d%.6f"
      while (s.endsWith("0")) s = s.substring(0, s.length - 1)
      if (s.endsWith(".")) s = s.substring(0, s.length - 1)
      s
    }
  }

  /** PDF literal-string escaping; non-ASCII (latin-1) chars go octal so
    * the whole file stays ASCII-safe in a parquet string column
    */
  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      ch match {
        case '(' => sb.append("\\(")
        case ')' => sb.append("\\)")
        case '\\' => sb.append("\\\\")
        case c if c >= 32 && c < 127 => sb.append(c)
        case c if c < 256 => sb.append(f"\\${c.toInt}%03o")
        case c =>
          // outside latin-1: unencodable in a byte string — the corpus is
          // ASCII; fail loudly rather than silently corrupt
          throw new IllegalArgumentException(
            f"PdfGen: non-latin-1 char U+${c.toInt}%04X in fragment text")
      }
      i += 1
    }
    sb.toString
  }
}
