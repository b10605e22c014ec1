package graft.tools

import graft.spark.{ExtractTurn, Transcripts}

/** Per-stage kernel profile: isolates the tokenizers from the full parse
  * so optimization effort lands where time is spent (jstack attach hangs
  * in this sandbox, so this is the profiling story). Median of N passes.
  * Usage: runMain graft.tools.KernelProfile [nConvs] [passes]
  */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(300)
    val passes = if (args.length > 1) args(1).toInt else 7
    val docs = (0L until nConvs.toLong).flatMap(k =>
      Transcripts.turnsFor(42L, k, 8, 1000, 20).map(_._1))
      .filter(t => t.tool == "pdftohtml" || t.tool == "shakespeare")
      .map(t => (t.tool, t.text))
    val pdf = docs.collect { case ("pdftohtml", x) => x }
    val sh = docs.collect { case ("shakespeare", x) => x }
    System.err.println(s"${pdf.size} pdfxml docs, ${sh.size} shakespeare docs")

    var sink = 0L
    def bench(name: String, n: Int)(f: => Long): Double = {
      f; f // warm
      val times = (0 until passes).map { _ =>
        val t0 = System.nanoTime()
        sink += f
        (System.nanoTime() - t0) / 1e6
      }.sorted
      val med = times(times.length / 2)
      println(f"$name%-28s median ${med}%7.1f ms  ${med / n}%.4f ms/doc")
      med
    }

    val tokP = bench("pdfxml: XmlTok.parse", pdf.size) {
      var s = 0L; pdf.foreach(x => s += graft.pdfxml.XmlTok.parse(x).length); s
    }
    val fullP = bench("pdfxml: full parse", pdf.size) {
      var s = 0L; pdf.foreach(x => s += graft.pdfxml.PdfXml.parse(x).objects.length); s
    }
    val tokS = bench("shakespeare: Html.parse", sh.size) {
      var s = 0L; sh.foreach(x => s += graft.tokenize.Html.parse(x).children.length); s
    }
    val fullS = bench("shakespeare: full parse", sh.size) {
      var s = 0L; sh.foreach(x => s += graft.shakespeare.Shakespeare.parse(x).length); s
    }
    val fullE = bench("mixed: ExtractTurn.extract", docs.size) {
      var s = 0L; docs.foreach { case (_, x) => s += ExtractTurn.extract(x).lines.size }; s
    }
    println(f"pdfxml tokenizer share: ${100 * tokP / fullP}%.0f%%  " +
      f"shakespeare tokenizer share: ${100 * tokS / fullS}%.0f%%  (sink=$sink)")
    val _ = fullE
  }
}
