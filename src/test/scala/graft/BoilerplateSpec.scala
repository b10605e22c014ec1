package graft

import graft.ops.Boilerplate
import graft.synth.NoisyHtmlGen

import org.scalatest.funsuite.AnyFunSuite

/** Text-density / link-density boilerplate classifier: block segmentation,
  * the published rule tree, and the construction-derived corpus.
  */
class BoilerplateSpec extends AnyFunSuite {

  test("block segmentation: block tags split, inline tags accumulate, skip tags vanish") {
    val html = "<html><head><title>chrome</title><script>x=1</script></head>" +
      "<body><p>one <b>two</b> three</p><div>four <span>five</span></div>" +
      "<ul><li><a href='/'>home link</a></li><li>plain</li></ul></body></html>"
    val bs = Boilerplate.blocks(html)
    assert(bs.map(_.text) == Vector("one two three", "four five", "home link", "plain"))
    assert(bs.map(_.numWords) == Vector(3, 2, 2, 1))
    assert(bs.map(_.linkedWords) == Vector(0, 0, 2, 0))
  }

  test("rule tree: published thresholds") {
    def b(words: Int, linked: Int = 0) =
      Boilerplate.Block(Seq.fill(words)("w").mkString(" "), words, linked)
    val empty = b(0)
    // link-dense current block is always boilerplate
    assert(!Boilerplate.isContent(b(30), b(6, 3), b(30)))
    // long plain block after plain prev: content
    assert(Boilerplate.isContent(empty, b(17), empty))
    assert(!Boilerplate.isContent(empty, b(16), empty))
    // short block rescued by a long next block
    assert(Boilerplate.isContent(empty, b(5), b(16)))
    assert(!Boilerplate.isContent(empty, b(5), b(15)))
    // short block rescued by a prev with > 4 words
    assert(Boilerplate.isContent(b(5), b(5), empty))
    assert(!Boilerplate.isContent(b(4), b(5), empty))
    // after a link-dense prev the word bar rises to 40 / next to 17
    val linky = b(10, 9)
    assert(Boilerplate.isContent(linky, b(41), empty))
    assert(!Boilerplate.isContent(linky, b(40), empty))
    assert(Boilerplate.isContent(linky, b(40), b(18)))
    assert(!Boilerplate.isContent(linky, b(40), b(17)))
  }

  test("noisy-page corpus: extracted main content equals the construction, 60 seeds") {
    for (seed <- 1 to 60) {
      val (html, expected) = NoisyHtmlGen.page(seed * 7919L)
      val got = Boilerplate.mainContent(html)
      assert(got == expected, s"seed $seed: got ${got.take(3)}... expected ${expected.take(3)}...")
    }
  }

  test("totality: rogue html yields empty-or-some blocks, never throws") {
    Seq("", "<", "<<<>>>", "<p", "plain text only", "<a href='x'>" * 1000)
      .foreach { h =>
        val r = Boilerplate.mainContent(h)
        assert(r != null)
      }
  }
}
