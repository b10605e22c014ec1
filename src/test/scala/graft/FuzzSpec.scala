package graft

import graft.spark.ExtractTurn
import org.scalatest.funsuite.AnyFunSuite

/** Crash-robustness: at 10^12 turns a single throwing payload kills a
  * stage, so extract() must be total over arbitrary input. Seeded fuzz
  * over random text, mangled XML/HTML, truncations and splices.
  */
class FuzzSpec extends AnyFunSuite {

  private val seedDocs: Vector[String] = Vector(
    graft.synth.ScreenplayGen.render(graft.synth.ScreenplayGen.elements(1L, 3)).xml,
    graft.synth.ShakespeareGen.generate(2L, 2, "Fuzz Play").html,
    // round-4 corpora: mangled variants must also drive the dual-dialog
    // recovery and the colored-revision weight machinery
    graft.synth.ScreenplayGen.render(
      graft.synth.ScreenplayGen.elementsWithDual(3L, 4)).xml,
    graft.synth.ScreenplayGen.render(
      graft.synth.ScreenplayGen.elements(4L, 8),
      graft.synth.ScreenplayGen.Options(
        revisions = graft.spark.Transcripts.revPalette)).xml)

  test("extract never throws on mangled inputs") {
    // default 3000 cases; GRAFT_FUZZ_N widens for soak runs
    val fuzzN = sys.env.getOrElse("GRAFT_FUZZ_N", "3000").toInt
    val r = new java.util.SplittableRandom(0xF0220L)
    val alphabet = "<>/=\"' abAB19\t\n&;#[]().*-é中😀"
    var i = 0
    while (i < fuzzN) {
      val mode = r.nextInt(6)
      val s: String = mode match {
        case 0 => // random soup
          val n = r.nextInt(400)
          val sb = new StringBuilder
          for (_ <- 0 until n) sb += alphabet.charAt(r.nextInt(alphabet.length))
          sb.toString
        case 1 => // truncated real doc
          val d = seedDocs(r.nextInt(seedDocs.length))
          d.substring(0, r.nextInt(d.length))
        case 2 => // spliced docs
          val a = seedDocs(r.nextInt(seedDocs.length))
          val b = seedDocs(r.nextInt(seedDocs.length))
          a.substring(r.nextInt(a.length)) + b.substring(0, r.nextInt(b.length))
        case 3 => // real doc with random deletions
          val d = seedDocs(r.nextInt(seedDocs.length)).toCharArray
          val sb = new StringBuilder
          d.foreach { c => if (r.nextInt(10) != 0) sb += c }
          sb.toString
        case 4 => // deep nesting / attribute bombs
          val tag = if (r.nextBoolean()) "<page height=\"1188\" width=\"918\">" else "<b>"
          "<pdf2xml>" + tag * r.nextInt(200) + "text" + "</b>" * r.nextInt(100)
        case _ => // pathological text nodes
          val payload = Vector("\f", "\t\t\t", "*", "CONTINUED:", " " * 50,
            "12.", "(", "[", "\u0000\u0001", "-" * 30)(r.nextInt(10))
          s"""<pdf2xml><page number="1" height="1188" width="918">
             |<text top="${r.nextInt(1400) - 100}" left="${r.nextInt(1200) - 100}" width="${r.nextInt(500)}" height="17" font="${r.nextInt(3)}">$payload</text>
             |</page></pdf2xml>""".stripMargin
      }
      val out = ExtractTurn.extract(s) // must not throw
      assert(out.bytes == s.length)
      i += 1
    }
  }

  test("oversized payloads short-circuit") {
    val big = "x" * (ExtractTurn.MaxPayloadBytes + 1)
    val out = ExtractTurn.extract(big)
    assert(out.format == "oversized" && out.lines.isEmpty)
  }

  test("multimodal decode never throws or hangs on mangled containers") {
    import graft.ops.Multimodal
    val real: Vector[Array[Byte]] = Vector(
      Multimodal.pngBytes(64, 48, Array.fill[Byte](128)(3)),
      Multimodal.wavBytes(2000, i => (i % 251).toByte),
      Multimodal.gifBytes(32, 32, 5, i => (i % 7).toByte))
    val r = new java.util.SplittableRandom(0xDEC0DEL)
    var i = 0
    while (i < 4000) {
      val payload: Array[Byte] = r.nextInt(4) match {
        case 0 => // random bytes
          val b = new Array[Byte](r.nextInt(256)); var j = 0
          while (j < b.length) { b(j) = r.nextInt(256).toByte; j += 1 }
          b
        case 1 => // truncated real container
          val d = real(r.nextInt(real.length))
          java.util.Arrays.copyOf(d, r.nextInt(d.length + 1))
        case 2 => // bit-flipped real container (hits length fields too)
          val d = real(r.nextInt(real.length)).clone()
          var flips = 1 + r.nextInt(8)
          while (flips > 0 && d.nonEmpty) {
            val p = r.nextInt(d.length)
            d(p) = (d(p) ^ (1 << r.nextInt(8))).toByte
            flips -= 1
          }
          d
        case _ => // valid magic + garbage body
          val magics = Vector(
            Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
            "RIFF0000WAVE".getBytes("ISO-8859-1"),
            "GIF89a".getBytes("ISO-8859-1"))
          val magic = magics(r.nextInt(3))
          val tail = new Array[Byte](r.nextInt(128)); var j = 0
          while (j < tail.length) { tail(j) = r.nextInt(256).toByte; j += 1 }
          magic ++ tail
      }
      val t0 = System.nanoTime()
      val d = Multimodal.decode(payload) // must not throw
      assert(d != null)
      // and must terminate promptly — a wedged chunk walk shows up here
      assert((System.nanoTime() - t0) < 1e9, s"decode took >1s at i=$i")
      i += 1
    }
  }
}
