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
  */
object XmlTok {

  /** One XML element as the reference's assoc-array sees it. */
  final class XNode(val tag: String) {
    var attrs: Map[String, String] = Map.empty
    /** full text content (descendants concatenated), entity-decoded */
    var value: String = ""
    /** b/i child spans, inclusive code-point ranges (sxiToArray:76-94) */
    var textAttributes: Map[String, Vector[Span]] = Map.empty
    val children: ArrayBuffer[XNode] = new ArrayBuffer[XNode](2)
  }

  def parse(xml: String): Vector[XNode] = {
    val root = new XNode("#ROOT")
    var stack: List[XNode] = root :: Nil
    // per-open-element: pending text pieces as (isElementChild, text) to
    // compute TEXT-node child spans after close
    var pieces: List[ArrayBuffer[(String, String)]] = ArrayBuffer.empty[(String, String)] :: Nil

    val n = xml.length
    var i = 0
    val text = new java.lang.StringBuilder

    def flushText(): Unit = {
      if (text.length > 0) {
        pieces.head += (("", decode(text.toString)))
        text.setLength(0)
      }
    }

    def closeTop(): Unit = {
      val node = stack.head
      val ps = pieces.head
      stack = stack.tail
      pieces = pieces.tail
      // assemble value + child spans (code-point offsets; inclusive end)
      val sb = new java.lang.StringBuilder
      var handled = 0
      var ta = node.textAttributes
      ps.foreach { case (childName, t) =>
        if (childName.isEmpty) { sb.append(t); handled += Php.mbLen(t) }
        else {
          val len = Php.mbLen(t)
          sb.append(t)
          // reference records a span even for the degenerate empty child
          // (end = start - 1); keep identical arithmetic
          val span = Span(handled, handled + len - 1)
          ta = ta.updated(childName, ta.getOrElse(childName, Vector.empty) :+ span)
          handled += len
        }
      }
      node.value = sb.toString
      node.textAttributes = ta
      // propagate this element's text into the parent's piece list with our
      // (lower-case) tag name so <text>a<b>x</b>b</text> sees child "b"
      pieces.head += ((node.tag.toLowerCase, node.value))
      stack.head.children += node
    }

    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<') {
        if (xml.startsWith("<!--", i)) {
          flushText()
          val e = xml.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
        } else if (xml.startsWith("<?", i) || xml.startsWith("<!", i)) {
          flushText()
          val e = xml.indexOf('>', i); i = if (e < 0) n else e + 1
        } else if (i + 1 < n && xml.charAt(i + 1) == '/') {
          flushText()
          val e = xml.indexOf('>', i)
          i = if (e < 0) n else e + 1
          if (stack.size > 1) closeTop()
        } else {
          flushText()
          var j = i + 1
          val ns = j
          while (j < n && !isWs(xml.charAt(j)) && xml.charAt(j) != '>' && xml.charAt(j) != '/') j += 1
          val name = xml.substring(ns, j).toUpperCase
          var attrs = Map.empty[String, String]
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
                val aname = xml.substring(as, j).toUpperCase
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
                if (aname.nonEmpty) attrs = attrs.updated(aname, decode(avalue))
            }
          }
          i = j
          val node = new XNode(name)
          node.attrs = attrs
          if (selfClose) {
            pieces.head += ((name.toLowerCase, ""))
            stack.head.children += node
          } else {
            stack = node :: stack
            pieces = new ArrayBuffer[(String, String)] :: pieces
          }
        }
      } else {
        text.append(c); i += 1
      }
    }
    flushText()
    while (stack.size > 1) closeTop()
    root.children.toVector
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    graft.tokenize.Html.decodeEntities(s)
  }
}
