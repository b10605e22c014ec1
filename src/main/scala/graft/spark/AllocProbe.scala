package graft.spark

import graft.spark.{ExtractTurn, Transcripts}
object AllocProbe {
  def main(a: Array[String]): Unit = {
    val docs = (0L until 400L).flatMap(k => Transcripts.turnsFor(42L, k, 8, 1000, 20).map(_._1))
      .filter(t => t.tool == "pdftohtml" || t.tool == "shakespeare").map(_.text) ++
      // corpora exercising the optional struct fields in the equivalence
      // check: dual flags, revision tables, line-number vote rows
      (0L until 10L).flatMap(k => Transcripts.dualTurnsFor(4242L, k, 4).map(_._1.text)) ++
      (0L until 10L).flatMap(k => Transcripts.revTurnsFor(777L, k, 4).map(_._1.text)) ++
      (0L until 10L).flatMap(k => Transcripts.numberedTurnsFor(555L, k, 4).map(_._1.text)) ++
      (0L until 10L).flatMap(k => Transcripts.crossTurnsFor(3131L, k, 4).map(_._1.text))
    System.err.println(s"${docs.size} docs")
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread.getId
    var sink = 0L
    def bench(name: String)(f: => Long): Unit = {
      f; f
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val times = (0 until 7).map { _ =>
        val t0 = System.nanoTime(); sink += f; (System.nanoTime()-t0)/1e6
      }.sorted
      val allocPerTurn = (tmx.getThreadAllocatedBytes(tid) - a0) / 7.0 / docs.size
      println(f"$name%-30s median ${times(3)}%7.1f ms  ${times(3)/docs.size}%.4f ms/doc  alloc ${allocPerTurn/1024}%.1f KiB/doc")
    }
    val pdf = (0L until 400L).flatMap(k => Transcripts.turnsFor(42L, k, 8, 1000, 20).map(_._1))
      .filter(_.tool == "pdftohtml").map(_.text)
    val sh = (0L until 400L).flatMap(k => Transcripts.turnsFor(42L, k, 8, 1000, 20).map(_._1))
      .filter(_.tool == "shakespeare").map(_.text)
    def benchN(name: String, n: Int)(f: => Long): Unit = {
      f; f
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val times = (0 until 7).map { _ =>
        val t0 = System.nanoTime(); sink += f; (System.nanoTime()-t0)/1e6
      }.sorted
      val allocPerTurn = (tmx.getThreadAllocatedBytes(tid) - a0) / 7.0 / n
      println(f"$name%-30s median ${times(3)}%7.1f ms  ${times(3)/n}%.4f ms/doc  alloc ${allocPerTurn/1024}%.1f KiB/doc")
    }
    benchN("pdfxml: XmlTok.parse", pdf.size) { var s=0L; pdf.foreach(x => s += graft.pdfxml.XmlTok.parse(x).length); s }
    benchN("pdfxml: full parse", pdf.size) { var s=0L; pdf.foreach(x => s += graft.pdfxml.PdfXml.parse(x).objects.length); s }
    benchN("shakespeare: Html.parse", sh.size) { var s=0L; sh.foreach(x => s += graft.tokenize.Html.parse(x).children.length); s }
    benchN("shakespeare: full parse", sh.size) { var s=0L; sh.foreach(x => s += graft.shakespeare.Shakespeare.parse(x).length); s }
    println(f"avg doc bytes: pdf ${pdf.map(_.length).sum / pdf.size}, sh ${sh.map(_.length).sum / sh.size}")
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    val proj = UnsafeProjection.create(Seq(BoundReference(0, ExtractTurn.schema, true)
      : org.apache.spark.sql.catalyst.expressions.Expression))
    val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    bench("extract only") { var s=0L; docs.foreach(x => s += ExtractTurn.extract(x).lines.size); s }
    bench("extract+toInternal") { var s=0L; docs.foreach{x => s += ExtractTurn.toInternal(ExtractTurn.extract(x)).numFields}; s }
    bench("extract+toInternal+unsafe") { var s=0L; docs.foreach{x =>
      holder.update(0, ExtractTurn.toInternal(ExtractTurn.extract(x)))
      s += proj.apply(holder).getSizeInBytes}; s }
    bench("extract+toInternalUnsafe") { var s=0L; docs.foreach{x =>
      s += ExtractTurn.toInternalUnsafe(ExtractTurn.extract(x))
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeRow].getSizeInBytes}; s }
    bench("extract+direct+outer memcpy") { var s=0L; docs.foreach{x =>
      holder.update(0, ExtractTurn.toInternalUnsafe(ExtractTurn.extract(x)))
      s += proj.apply(holder).getSizeInBytes}; s }
    // byte-for-byte equivalence: direct writer vs projection of generic tree
    var checked = 0
    docs.foreach { x =>
      val t = ExtractTurn.extract(x)
      holder.update(0, ExtractTurn.toInternal(t))
      val viaProj = proj.apply(holder).copy()
      val direct = ExtractTurn.toInternalUnsafe(t)
      holder.update(0, direct)
      val directNorm = proj.apply(holder).copy()
      require(viaProj == directNorm, s"row mismatch for doc of ${x.length} bytes")
      checked += 1
    }
    System.err.println(s"equivalence checked on $checked docs; sink=$sink")
  }
}
