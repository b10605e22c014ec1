package graft.pdfxml

import graft.model.{Php, Span}

import scala.collection.mutable.ArrayBuffer

/** Hand-built tokenizer for pdftohtml's `-xml` output grammar.
  *
  * Mirrors the reference's SimpleXmlIterator walk (`sxiToArray`,
  * ParseText.php:50-119): tags and attribute keys are upper-cased, a TEXT
  * node's value is its full descendant text content, and element children
  * of TEXT nodes (`<b>`, `<i>`) are recorded as inclusive code-point span
  * ranges keyed by the (lower-case) child tag name.
  *
  * The grammar is tiny (pdf2xml / page / fontspec / text / b / i / a), so a
  * bespoke char-stream state machine beats a general XML library: zero
  * dependencies and no DOM allocation beyond what the layout pass needs.
  * Hot-path notes: text is scanned in bulk via indexOf('<'), and attributes
  * live in two small parallel arrays (a 5-entry linear scan beats a Map for
  * both build and lookup, and allocates nothing per probe).
  */
object XmlTok {

  /** One XML element as the reference's assoc-array sees it. */
  final class XNode(val tag: String) {
    private[XmlTok] var attrKeys: Array[String] = XNode.emptyArr
    private[XmlTok] var attrVals: Array[String] = XNode.emptyArr
    /** full text content (descendants concatenated), entity-decoded */
    var value: String = ""
    /** b/i child spans, inclusive code-point ranges (sxiToArray:76-94) */
    var textAttributes: Map[String, Vector[Span]] = Map.empty
    val children: ArrayBuffer[XNode] = new ArrayBuffer[XNode](2)

    def attr(key: String): String = {
      var i = 0
      while (i < attrKeys.length) {
        if (attrKeys(i) == key) return attrVals(i)
        i += 1
      }
      null
    }
    def attrOrElse(key: String, dflt: String): String = {
      val v = attr(key); if (v == null) dflt else v
    }
    /** Map view (compat/tests) */
    def attrs: Map[String, String] =
      attrKeys.iterator.zip(attrVals.iterator).toMap
  }
  private object XNode { val emptyArr = new Array[String](0) }

  def parse(xml: String): Vector[XNode] = {
    val root = new XNode("#ROOT")
    var stack: List[XNode] = root :: Nil
    // per-open-element: pending (childTagLowerOrEmpty, text) pieces
    var pieces: List[ArrayBuffer[(String, String)]] = new ArrayBuffer[(String, String)] :: Nil

    val n = xml.length
    var i = 0

    def closeTop(): Unit = {
      val node = stack.head
      val ps = pieces.head
      stack = stack.tail
      pieces = pieces.tail
      // assemble value + child spans (code-point offsets; inclusive end)
      if (ps.length == 1 && ps(0)._1.isEmpty) {
        node.value = ps(0)._2
      } else {
        val sb = new java.lang.StringBuilder
        var handled = 0
        var ta = node.textAttributes
        ps.foreach { case (childName, t) =>
          if (childName.isEmpty) { sb.append(t); handled += Php.mbLen(t) }
          else {
            val len = Php.mbLen(t)
            sb.append(t)
            // the reference records a span even for a degenerate empty child
            // (end = start - 1); keep identical arithmetic
            val span = Span(handled, handled + len - 1)
            ta = ta.updated(childName, ta.getOrElse(childName, Vector.empty) :+ span)
            handled += len
          }
        }
        node.value = sb.toString
        node.textAttributes = ta
      }
      // surface this element's text into the parent's piece list under the
      // lower-case tag so <text>a<b>x</b>b</text> sees child "b"
      pieces.head += ((lowerTag(node.tag), node.value))
      stack.head.children += node
    }

    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) {
        if (i < n) pieces.head += (("", decode(xml.substring(i, n))))
        i = n
      } else {
        if (lt > i) pieces.head += (("", decode(xml.substring(i, lt))))
        i = lt
        if (xml.startsWith("<!--", i)) {
          val e = xml.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (xml.charAt(i + 1) == '?' || xml.charAt(i + 1) == '!')) {
          val e = xml.indexOf('>', i); i = if (e < 0) n else e + 1
        } else if (i + 1 < n && xml.charAt(i + 1) == '/') {
          val e = xml.indexOf('>', i)
          i = if (e < 0) n else e + 1
          if (stack.size > 1) closeTop()
        } else if (i + 1 < n) {
          var j = i + 1
          val ns = j
          while (j < n && !isWs(xml.charAt(j)) && xml.charAt(j) != '>' && xml.charAt(j) != '/') j += 1
          val name = internTag(xml, ns, j)
          var keys: ArrayBuffer[String] = null
          var vals: ArrayBuffer[String] = null
          var selfClose = false
          var done = false
          while (!done && j < n) {
            while (j < n && isWs(xml.charAt(j))) j += 1
            if (j >= n) done = true
            else xml.charAt(j) match {
              case '>' => j += 1; done = true
              case '/' =>
                if (j + 1 < n && xml.charAt(j + 1) == '>') { selfClose = true; j += 2; done = true }
                else j += 1
              case _ =>
                val as = j
                while (j < n && !isWs(xml.charAt(j)) && xml.charAt(j) != '=' && xml.charAt(j) != '>' && xml.charAt(j) != '/') j += 1
                val aname = internAttr(xml, as, j)
                var avalue = ""
                while (j < n && isWs(xml.charAt(j))) j += 1
                if (j < n && xml.charAt(j) == '=') {
                  j += 1
                  while (j < n && isWs(xml.charAt(j))) j += 1
                  if (j < n && (xml.charAt(j) == '"' || xml.charAt(j) == '\'')) {
                    val q = xml.charAt(j); j += 1
                    val vs = j
                    while (j < n && xml.charAt(j) != q) j += 1
                    avalue = xml.substring(vs, j)
                    if (j < n) j += 1
                  } else {
                    val vs = j
                    while (j < n && !isWs(xml.charAt(j)) && xml.charAt(j) != '>') j += 1
                    avalue = xml.substring(vs, j)
                  }
                }
                if (aname.nonEmpty) {
                  if (keys == null) { keys = new ArrayBuffer[String](6); vals = new ArrayBuffer[String](6) }
                  keys += aname
                  vals += decode(avalue)
                }
            }
          }
          i = j
          val node = new XNode(name)
          if (keys != null) { node.attrKeys = keys.toArray; node.attrVals = vals.toArray }
          if (selfClose) {
            pieces.head += ((lowerTag(name), ""))
            stack.head.children += node
          } else {
            stack = node :: stack
            pieces = new ArrayBuffer[(String, String)] :: pieces
          }
        } else {
          i = n
        }
      }
    }
    while (stack.size > 1) closeTop()
    root.children.toVector
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** upper-cased tag name, interned for the fixed pdf2xml grammar so the
    * common tags allocate nothing per element
    */
  private def internTag(xml: String, from: Int, to: Int): String = {
    val len = to - from
    @inline def is(lit: String): Boolean =
      len == lit.length && xml.regionMatches(true, from, lit, 0, len)
    if (is("text")) "TEXT"
    else if (is("b")) "B"
    else if (is("i")) "I"
    else if (is("a")) "A"
    else if (is("fontspec")) "FONTSPEC"
    else if (is("page")) "PAGE"
    else if (is("pdf2xml")) "PDF2XML"
    else xml.substring(from, to).toUpperCase
  }

  private def lowerTag(tag: String): String = tag match {
    case "TEXT" => "text"
    case "B" => "b"
    case "I" => "i"
    case "A" => "a"
    case "FONTSPEC" => "fontspec"
    case "PAGE" => "page"
    case "PDF2XML" => "pdf2xml"
    case t => t.toLowerCase
  }

  private def internAttr(xml: String, from: Int, to: Int): String = {
    val len = to - from
    @inline def is(lit: String): Boolean =
      len == lit.length && xml.regionMatches(true, from, lit, 0, len)
    if (is("top")) "TOP"
    else if (is("left")) "LEFT"
    else if (is("width")) "WIDTH"
    else if (is("height")) "HEIGHT"
    else if (is("font")) "FONT"
    else if (is("id")) "ID"
    else if (is("size")) "SIZE"
    else if (is("color")) "COLOR"
    else if (is("number")) "NUMBER"
    else if (is("family")) "FAMILY"
    else xml.substring(from, to).toUpperCase
  }

  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    graft.tokenize.Html.decodeEntities(s)
  }
}
