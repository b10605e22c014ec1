package graft

import graft.model.{Php, Span, SpanAlgebra}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the primitives everything downstream leans on
  * (SURVEY.md §5 test plan item c). Uses scalacheck generators with a
  * seeded manual sampler (the scalatest-scalacheck bridge artifact is not
  * in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(12345L)
    var s = seed
    var i = 0
    while (i < n) {
      g.apply(org.scalacheck.Gen.Parameters.default, s).foreach(f)
      s = s.next
      i += 1
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(ga.flatMap(a => gb.map(b => (a, b))))(t => f(t._1, t._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(ga.flatMap(a => gb.flatMap(b => gc.map(c => (a, b, c)))))(t => f(t._1, t._2, t._3))

  private val spanGen: Gen[Span] = for {
    s <- Gen.chooseNum(0, 80)
    len <- Gen.chooseNum(0, 30)
  } yield Span(s, s + len)

  private val attrsGen: Gen[Map[String, Vector[Span]]] = for {
    keys <- Gen.someOf(Seq("b", "i", "u"))
    m <- Gen.sequence[Vector[(String, Vector[Span])], (String, Vector[Span])](
      keys.map(k => Gen.nonEmptyListOf(spanGen).map(v => k -> v.toVector)))
  } yield m.toMap

  test("span split keeps offsets in-window and rebases to zero") {
    forAll(attrsGen, Gen.chooseNum(0, 60), Gen.chooseNum(1, 60)) { (attrs, left, width) =>
      val out = SpanAlgebra.split(attrs, left, left + width)
      out.values.flatten.foreach { sp =>
        assert(sp.start >= 0)
        assert(sp.start <= sp.end + 1) // degenerate clamps allowed
        assert(sp.end <= width)
      }
    }
  }

  test("span merge shifts by exactly the offset and preserves counts") {
    forAll(attrsGen, attrsGen, Gen.chooseNum(0, 100)) { (a, b, off) =>
      val merged = SpanAlgebra.merge(a, b, off)
      val total = merged.values.map(_.size).sum
      assert(total == a.values.map(_.size).sum + b.values.map(_.size).sum)
      b.foreach { case (k, spans) =>
        val tail = merged(k).takeRight(spans.size)
        assert(tail == spans.map(sp => Span(sp.start + off, sp.end + off)))
      }
    }
  }

  private val markerGen = Gen.oneOf("(CONT'D)", "(MORE)", "CONTINUED:", "[CONT]")
  test("whiteout preserves code-point length") {
    forAll(Gen.asciiPrintableStr, markerGen, Gen.asciiPrintableStr) { (pre, m, post) =>
      val s = pre + m + post
      assert(Php.mbLen(Php.whiteOut(s, m)) == Php.mbLen(s))
    }
  }

  test("whiteout is case-insensitive and replaces with spaces") {
    val s = "ALICE (cont'd) speaks"
    assert(Php.whiteOut(s, "(CONT'D)") == "ALICE          speaks")
  }

  test("mb helpers agree with java on ASCII") {
    forAll(Gen.asciiPrintableStr, Gen.chooseNum(0, 20), Gen.chooseNum(0, 20)) { (s, a, b) =>
      assert(Php.mbLen(s) == s.length)
      assert(Php.mbSubstr(s, a, b) == s.drop(a).take(b))
      assert(Php.mbStrpos(s, "x") == s.indexOf("x"))
    }
  }

  test("mb helpers are code-point based beyond the BMP") {
    val s = "a😀b" // a, emoji (surrogate pair), b
    assert(Php.mbLen(s) == 3)
    assert(Php.mbSubstr(s, 1, 1) == "😀")
    assert(Php.mbSubstr(s, 2, 1) == "b")
    assert(Php.mbStrpos(s, "b") == 2)
  }

  test("reduce/compress spaces semantics") {
    assert(Php.reduceSpaces("a  \t b") == "a b")
    assert(Php.reduceSpaces("a\nb") == "a\nb") // [:blank:] only
    assert(Php.compressSpaces("a \n b") == "a b") // \s incl newline
  }

  test("extraction is deterministic across repeated runs") {
    val doc = graft.synth.ScreenplayGen.render(
      graft.synth.ScreenplayGen.elements(99L, 5))
    val a = graft.pdfxml.PdfXml.parse(doc.xml)
    val b = graft.pdfxml.PdfXml.parse(doc.xml)
    assert(a.objects == b.objects)
    assert(a.revisions == b.revisions)
  }
}
