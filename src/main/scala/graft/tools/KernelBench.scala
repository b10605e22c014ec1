package graft.tools

import graft.spark.{ExtractTurn, Transcripts}

/** Single-JVM kernel microbenchmark: ms/doc for ExtractTurn.extract over a
  * deterministic transcript corpus (both formats), median of N passes.
  * No Spark — isolates the parse kernel from scan/explode machinery.
  * Usage: runMain graft.tools.KernelBench [nConvs] [passes]
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(300)
    val passes = if (args.length > 1) args(1).toInt else 5
    val docs = (0L until nConvs.toLong).flatMap(k =>
      Transcripts.turnsFor(42L, k, 8, 1000, 20).map(_._1))
      .filter(t => t.tool == "pdftohtml" || t.tool == "shakespeare")
      .map(t => (t.tool, t.text))
    val bytes = docs.map(_._2.length.toLong).sum
    System.err.println(s"${docs.size} docs, $bytes bytes")
    // warm-up
    var sink = 0L
    docs.foreach { case (_, x) => sink += ExtractTurn.extract(x).lines.size }
    val times = (0 until passes).map { _ =>
      val t0 = System.nanoTime()
      docs.foreach { case (_, x) => sink += ExtractTurn.extract(x).lines.size }
      (System.nanoTime() - t0) / 1e6
    }.sorted
    val med = times(times.length / 2)
    println(f"median ${med}%.0f ms for ${docs.size} docs = ${med / docs.size}%.3f ms/doc " +
      f"(min ${times.head}%.0f max ${times.last}%.0f, sink=$sink)")
  }
}
