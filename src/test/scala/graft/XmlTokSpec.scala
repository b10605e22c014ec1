package graft

import graft.model.Span
import graft.pdfxml.XmlTok

import org.scalatest.funsuite.AnyFunSuite

/** Direct tokenizer tests targeting the pooled/growing buffer paths
  * (piece buffers are pooled across elements, the attribute scratch pad
  * and piece arrays double on demand, children allocate lazily) plus the
  * entity and astral-plane span arithmetic.
  */
class XmlTokSpec extends AnyFunSuite {

  test("piece buffer growth: an element with more than 8 interleaved pieces") {
    val inner = (1 to 7).map(k => s"t$k<b>b$k</b>").mkString // 14 pieces
    val r = XmlTok.parse(s"<pdf2xml><page><text>$inner</text></page></pdf2xml>")
    val text = r.head.children.head.children.head
    assert(text.value == (1 to 7).map(k => s"t${k}b$k").mkString)
    assert(text.textAttributes("b").length == 7)
    // span of the k-th <b>: after k "tK" prefixes and k-1 "bK" bodies
    assert(text.textAttributes("b").head == Span(2, 3))
  }

  test("attribute pad growth: more than 8 attributes survive exactly") {
    val attrs = (1 to 12).map(k => s"""a$k="v$k"""").mkString(" ")
    val r = XmlTok.parse(s"<pdf2xml><page><text $attrs>x</text></page></pdf2xml>")
    val text = r.head.children.head.children.head
    (1 to 12).foreach(k => assert(text.attr(s"A$k") == s"v$k"))
    assert(text.attr("A13") == null)
  }

  test("pool reuse across siblings: no aliasing between recycled buffers") {
    val xml = "<pdf2xml><page>" +
      "<text>one <b>bold</b> tail</text>" +
      "<text>two <i>ital</i> tail2</text>" +
      "<text>plain</text>" +
      "</page></pdf2xml>"
    val page = XmlTok.parse(xml).head.children.head
    val Seq(t1, t2, t3) = page.children.toSeq
    assert(t1.value == "one bold tail" && t1.textAttributes("b") == Vector(Span(4, 7)))
    assert(t2.value == "two ital tail2" && t2.textAttributes("i") == Vector(Span(4, 7)))
    assert(t3.value == "plain" && t3.textAttributes.isEmpty)
  }

  test("entities decode in text pieces and attribute values") {
    val r = XmlTok.parse(
      """<pdf2xml><page><text font="&amp;9">A &amp; B &lt;c&gt;</text></page></pdf2xml>""")
    val text = r.head.children.head.children.head
    assert(text.value == "A & B <c>")
    assert(text.attr("FONT") == "&9")
  }

  test("astral-plane chars: spans are code-point offsets, not UTF-16") {
    // emoji is 2 UTF-16 chars but 1 code point; the span after it must
    // count it as one (sxiToArray records code-point offsets)
    val r = XmlTok.parse(s"<pdf2xml><page><text>😀x<b>B</b></text></page></pdf2xml>")
    val text = r.head.children.head.children.head
    assert(text.value == "😀xB")
    assert(text.textAttributes("b") == Vector(Span(2, 2)))
  }

  test("leaf children are empty; unclosed elements close at EOF") {
    val r = XmlTok.parse("<pdf2xml><page><text>abc")
    val page = r.head.children.head
    assert(page.children.head.value == "abc")
    assert(page.children.head.children.isEmpty)
  }
}
