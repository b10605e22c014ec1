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

  /** same document, serialized the way a modern (PDF 1.5+) writer would:
    * every non-stream object packed into one object stream (`/Type
    * /ObjStm`, Flate + ASCII85 so the file stays pure ASCII), and the
    * cross-reference emitted as an xref STREAM (`/Type /XRef`, `W [1 3
    * 2]`) whose rows are PNG-predictor-encoded (the per-row filter type
    * cycles None/Sub/Up/Average/Paeth so a reader must implement all
    * five) under Flate + ASCIIHex. Differential tests run the classic and
    * modern serializations of the same corpus through [[graft.pdfxml.PdfLex]]
    * and require identical extraction.
    */
  def fromXmlModern(xml: String): String = fromNodesModern(XmlTok.parse(xml))

  def fromNodesModern(tops: Vector[XmlTok.XNode]): String =
    serializeModern(buildObjects(tops))

  def fromNodes(tops: Vector[XmlTok.XNode]): String =
    serializeClassic(buildObjects(tops))

  /** same document, classic serialization, but every content stream
    * filtered: pages alternate `[ /ASCII85Decode /LZWDecode ]` and
    * `[ /ASCIIHexDecode /RunLengthDecode ]` (the ASCII layer keeps the
    * file string-column-safe; the inner filter is what real pre-Flate
    * writers emitted). Differential tests require extraction identical
    * to the unfiltered classic form.
    */
  def fromXmlFiltered(xml: String): String =
    serializeClassic(buildObjects(XmlTok.parse(xml), contentFilters = true))

  /** (objects as (num, body), numbers of the stream objects) */
  private def buildObjects(
      tops: Vector[XmlTok.XNode],
      contentFilters: Boolean = false): (Vector[(Int, String)], Set[Int]) = {
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
      objs += (8 + 2 * i) -> {
        if (!contentFilters)
          s"<< /Length ${content.length} >>\nstream\n" + content + "\nendstream"
        else if (i % 2 == 0) {
          val enc = a85Encode(lzwEncode(content.getBytes(Latin1)))
          s"<< /Length ${enc.length} /Filter [ /ASCII85Decode /LZWDecode ] >>" +
            "\nstream\n" + enc + "\nendstream"
        } else {
          val enc = ahxEncode(rlEncode(content.getBytes(Latin1)))
          s"<< /Length ${enc.length} /Filter [ /ASCIIHexDecode /RunLengthDecode ] >>" +
            "\nstream\n" + enc + "\nendstream"
        }
      }
    }
    (objs.toVector, (0 until nPages).map(i => 8 + 2 * i).toSet)
  }

  // ---- classic serialization (PDF 1.4: xref table + trailer) --------------

  private def serializeClassic(built: (Vector[(Int, String)], Set[Int])): String = {
    val (objs, _) = built
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

  // ---- modern serialization (PDF 1.5: ObjStm + xref stream) ---------------

  private def serializeModern(built: (Vector[(Int, String)], Set[Int])): String = {
    val (objs, streamNums) = built
    val maxN = objs.map(_._1).max
    val objStmNum = maxN + 1
    val xrefNum = maxN + 2
    val size = xrefNum + 1

    // object stream: every non-stream object, in numeric order, behind
    // /ASCII85Decode + /FlateDecode (ASCII-safe on disk, binary inside)
    val members = objs.filter(o => !streamNums(o._1)).sortBy(_._1)
    val bodies = members.map(_._2)
    val rel = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = members.map(_._1).zip(rel)
      .map { case (n, r) => s"$n $r" }.mkString("", " ", "\n")
    val payload = header + bodies.mkString("\n")
    val objStmEnc = a85Encode(deflate(payload.getBytes(Latin1)))
    val objStmBody =
      s"<< /Type /ObjStm /N ${members.length} /First ${header.length} " +
        s"/Length ${objStmEnc.length} /Filter [ /ASCII85Decode /FlateDecode ] >>" +
        "\nstream\n" + objStmEnc + "\nendstream"

    val sb = new StringBuilder
    sb.append("%PDF-1.5\n")
    val offsets = scala.collection.mutable.HashMap.empty[Int, Int]
    (objs.filter(o => streamNums(o._1)) :+ (objStmNum -> objStmBody)).foreach {
      case (num, body) =>
        offsets(num) = sb.length
        sb.append(num).append(" 0 obj\n").append(body).append("\nendobj\n")
    }

    // xref stream: W [1 4 2] rows (4-byte offsets — a 3-byte field caps
    // the file at 16 MiB and would WRAP silently past it); type 2
    // entries point into the ObjStm
    val xrefOff = sb.length
    offsets(xrefNum) = xrefOff
    val memberIdx = members.map(_._1).zipWithIndex.toMap
    require(members.length <= 0xffff,
      s"ObjStm member index field is 2 bytes; ${members.length} members overflow it")
    val rows: Array[Array[Int]] = (0 until size).map { n =>
      if (n == 0) Array(0, 0, 65535)
      else if (memberIdx.contains(n)) Array(2, objStmNum, memberIdx(n))
      else Array(1, offsets(n), 0)
    }.toArray
    val xrefEnc = ahxEncode(deflate(pngPredictEncode(rows)))
    val xrefDict =
      s"<< /Type /XRef /Size $size /Root 1 0 R /W [ 1 4 2 ] /Index [ 0 $size ] " +
        "/Filter [ /ASCIIHexDecode /FlateDecode ] " +
        "/DecodeParms [ null << /Predictor 12 /Columns 7 >> ] " +
        s"/Length ${xrefEnc.length} >>"
    sb.append(xrefNum).append(" 0 obj\n").append(xrefDict)
      .append("\nstream\n").append(xrefEnc).append("\nendstream\nendobj\n")
    sb.append("startxref\n").append(xrefOff).append("\n%%EOF\n")
    sb.toString
  }

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** serialize W [1 3 2] rows and PNG-predictor-encode them, cycling the
    * row filter type None/Sub/Up/Average/Paeth so a conforming reader
    * must reconstruct all five (the decoder computes predictions from
    * RECONSTRUCTED bytes, which equal the raw row bytes)
    */
  private def pngPredictEncode(rows: Array[Array[Int]]): Array[Byte] = {
    val rowLen = 7 // 1 (type) + 4 (field 2) + 2 (field 3) — W [1 4 2]
    val raw = Array.ofDim[Int](rows.length, rowLen)
    rows.indices.foreach { r =>
      val Array(t, f2, f3) = rows(r)
      raw(r) = Array(t & 0xff, (f2 >>> 24) & 0xff, (f2 >> 16) & 0xff,
        (f2 >> 8) & 0xff, f2 & 0xff, (f3 >> 8) & 0xff, f3 & 0xff)
    }
    val out = new Array[Byte](rows.length * (rowLen + 1))
    rows.indices.foreach { r =>
      val ft = r % 5
      out(r * (rowLen + 1)) = ft.toByte
      var i = 0
      while (i < rowLen) {
        val x = raw(r)(i)
        val a = if (i >= 1) raw(r)(i - 1) else 0 // bpp = 1
        val b = if (r > 0) raw(r - 1)(i) else 0
        val c = if (r > 0 && i >= 1) raw(r - 1)(i - 1) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        out(r * (rowLen + 1) + 1 + i) = ((x - pred) & 0xff).toByte
        i += 1
      }
    }
    out
  }

  /** TIFF-variant LZW encoder (§7.4.4, EarlyChange = 1): clear code up
    * front, EOD at the end, 9→12-bit codes. The width schedule mirrors
    * the decoder exactly — the decoder adds its table entry one code
    * BEHIND the encoder, so the encoder bumps the width when its own
    * table reaches 2^w (one code "early"), and applies one extra
    * virtual check before EOD (no entry is added for the final flush,
    * but the decoder still runs its post-code check).
    */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8; bitBuf &= (1L << bitCnt) - 1
      }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var dictSize = 258
    put(256) // clear
    if (data.nonEmpty) {
      var prefix = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val b = data(i) & 0xff
        val key = Integer.valueOf((prefix << 8) | b)
        val ext = dict.get(key)
        if (ext != null) prefix = ext.intValue
        else {
          put(prefix)
          if (dictSize < 4096) { dict.put(key, Integer.valueOf(dictSize)); dictSize += 1 }
          if (width < 12 && dictSize >= (1 << width)) width += 1
          prefix = b
        }
        i += 1
      }
      put(prefix)
      // decoder adds an entry for this final code too, then checks
      if (width < 12 && dictSize + 1 >= (1 << width)) width += 1
    }
    put(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** /RunLengthDecode's inverse (§7.4.5): runs of ≥3 identical bytes as
    * repeat records (len 129–255), everything else as ≤128-byte literal
    * records, EOD byte 128 at the end.
    */
  private def rlEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + data.length / 128 + 2)
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) && run < 128) run += 1
      if (run >= 3) {
        out.write(257 - run); out.write(data(i).toInt)
        i += run
      } else {
        var lit = i + run
        var tailRun = 1
        while (lit < data.length && lit - i < 128 && tailRun < 3) {
          if (lit > i && data(lit) == data(lit - 1)) tailRun += 1 else tailRun = 1
          lit += 1
        }
        if (tailRun == 3) lit -= 3 // leave the run for a repeat record
        out.write(lit - i - 1)
        out.write(data, i, lit - i)
        i = lit
      }
    }
    out.write(128)
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private def ahxEncode(data: Array[Byte]): String = {
    val sb = new StringBuilder(data.length * 2 + 1)
    data.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.append('>')
    sb.toString
  }

  private def a85Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder(data.length * 5 / 4 + 8)
    var i = 0
    while (i + 4 <= data.length) {
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (data(i + k) & 0xff); k += 1 }
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
    if (left > 0) { // partial group: pad with zero bytes, emit left+1 chars
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (if (k < left) data(i + k) & 0xff else 0); k += 1 }
      val g = new Array[Char](5)
      var j = 4
      while (j >= 0) { g(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
      sb.appendAll(g.take(left + 1))
    }
    sb.append("~>")
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
