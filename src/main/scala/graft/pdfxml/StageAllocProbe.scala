package graft.pdfxml

import graft.spark.Transcripts
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

object StageAllocProbe {
  def main(a: Array[String]): Unit = {
    val pdf = (0L until 400L).flatMap(k => Transcripts.turnsFor(42L, k, 8, 1000, 20).map(_._1))
      .filter(_.tool == "pdftohtml").map(_.text)
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread.getId
    var sink = 0L
    def bench(name: String)(f: => Long): Unit = {
      f; f
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val times = (0 until 7).map { _ => val t0 = System.nanoTime(); sink += f; (System.nanoTime()-t0)/1e6 }.sorted
      val ab = (tmx.getThreadAllocatedBytes(tid) - a0) / 7.0 / pdf.size
      println(f"$name%-28s median ${times(3)}%7.1f ms  ${times(3)/pdf.size}%.4f ms/doc  alloc ${ab/1024}%.1f KiB/doc")
    }
    def toLayout(x: String): (ArrayBuffer[LineObj], ColorsList, DocFlags) = {
      val flags = new DocFlags
      val colors = new ColorsList
      val fonts = mutable.HashMap.empty[String, Int]
      val pageResult = new Layout.PageResult
      var dirty = 0
      XmlTok.parse(x).foreach { top =>
        if (top.tag == "PDF2XML") top.children.foreach { page =>
          if (page.tag == "PAGE") { Layout.processPage(page, pageResult, colors, fonts, dirty, flags); dirty += 1 }
        }
      }
      (pageResult.lineObjects, colors, flags)
    }
    def toParser(x: String): Int = {
      val (lineObjects, colors, flags) = toLayout(x)
      val parser = new TextParser(colors, flags, null)
      var linesThisPage = new ArrayBuffer[LineObj]
      var firstTime = true
      var lastGiven = ""
      lineObjects.foreach { lo =>
        lastGiven = lo.givenPageNum
        if (lo.text == "\f") { parser.parsePage(linesThisPage.toSeq, firstTime, lo.givenPageNum); firstTime = false; linesThisPage = new ArrayBuffer[LineObj] }
        else linesThisPage += lo
      }
      if (linesThisPage.nonEmpty) parser.parsePage(linesThisPage.toSeq, lookForFlyPage = false, lastGiven)
      parser.objects.length
    }
    bench("XmlTok.parse") { var s=0L; pdf.foreach(x => s += XmlTok.parse(x).length); s }
    bench("+Layout.processPage") { var s=0L; pdf.foreach(x => s += toLayout(x)._1.length); s }
    bench("+TextParser") { var s=0L; pdf.foreach(x => s += toParser(x).toLong); s }
    bench("full PdfXml.parse") { var s=0L; pdf.foreach(x => s += PdfXml.parse(x).objects.length); s }
    System.err.println(sink)
  }
}
