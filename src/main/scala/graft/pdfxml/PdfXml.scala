package graft.pdfxml

import graft.model.{Php, ScriptLine}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Full parse result for one pdftohtml-XML document. */
final case class ParseResult(
    objects: Vector[ScriptLine],
    headerFrags: Vector[Vector[HfFrag]], // one per page
    footerFrags: Vector[Vector[HfFrag]],
    colors: ColorsList,
    numPages: Int,
    pageSize: String,
    sceneContinuedNumber: Boolean,
    sceneContinuedTop: Boolean,
    sceneContinuedBottom: Boolean,
    /** lineNumbers table (Parser.php:193-237), computed lazily by Revisions */
    revisions: Vector[Revisions.Revision],
    lineNumbers: Map[String, (Boolean, Boolean)])

/** The PDF-XML extraction path end-to-end (reference parse_xml_file,
  * ParseText.php:28-654 + Parser.php:92-119): tokenize the pdftohtml XML,
  * y-cluster and reassemble lines per page, split into formfeed-delimited
  * pages, run the multi-pass block classifier per page, then the
  * document-level revision/line-number aggregations.
  */
object PdfXml {

  def parse(xml: String): ParseResult = parse(xml, null)

  /** parse with a DUMP_BLOCKS-style stage sink (see TextParser.StageLabels)
    * so tests can pin each classifier pass independently.
    */
  def parse(xml: String,
      stageSink: (Int, String, Seq[TextParser.StageBlock]) => Unit): ParseResult =
    parseNodes(XmlTok.parse(xml), stageSink)

  /** raw-PDF entry: the [[PdfLex]] bridge produces the same PAGE node
    * trees the XML tokenizer does, so both formats share this pipeline
    */
  def parsePdf(payload: String): ParseResult = parseNodes(PdfLex.toNodes(payload), null)

  def parseNodes(tops: Vector[XmlTok.XNode],
      stageSink: (Int, String, Seq[TextParser.StageBlock]) => Unit): ParseResult = {
    val flags = new DocFlags
    val colors = new ColorsList
    val fonts = mutable.HashMap.empty[String, Int]
    val pageResult = new Layout.PageResult
    val headerFrags = new ArrayBuffer[Vector[HfFrag]]
    val footerFrags = new ArrayBuffer[Vector[HfFrag]]

    var dirtyPageNum = 0
    tops.foreach { top =>
      if (top.tag == "PDF2XML") {
        top.children.foreach { page =>
          if (page.tag == "PAGE") {
            Layout.processPage(page, pageResult, colors, fonts, dirtyPageNum, flags)
            dirtyPageNum += 1
            headerFrags += pageResult.headerFrags
            footerFrags += pageResult.footerFrags
          }
        }
      } else if (top.tag == "PAGE") {
        // tolerate page elements at top level too
        Layout.processPage(top, pageResult, colors, fonts, dirtyPageNum, flags)
        dirtyPageNum += 1
        headerFrags += pageResult.headerFrags
        footerFrags += pageResult.footerFrags
      }
    }
    val lineObjects = pageResult.lineObjects

    // formfeed detection (ParseText.php:610-620): the trailing per-page \f
    // at end-of-document alone does not count
    var containsFormfeeds = false
    var idx = 0
    var checked = false
    while (idx < lineObjects.length && !checked) {
      val pos = Php.mbStrpos(lineObjects(idx).text, "\f")
      if (pos >= 0) {
        if (idx != lineObjects.length - 1 ||
            Php.trim(Php.mbSubstr(lineObjects(idx).text, pos + 1)) != "")
          containsFormfeeds = true
        checked = true
      }
      idx += 1
    }

    val parser = new TextParser(colors, flags, stageSink)
    if (containsFormfeeds) {
      var linesThisPage = new ArrayBuffer[LineObj]
      var firstTime = true
      var lastGiven = ""
      lineObjects.foreach { lo =>
        lastGiven = lo.givenPageNum
        if (lo.text == "\f") {
          parser.parsePage(linesThisPage, firstTime, lo.givenPageNum)
          firstTime = false
          linesThisPage = new ArrayBuffer[LineObj]
        } else linesThisPage += lo
      }
      if (linesThisPage.nonEmpty)
        parser.parsePage(linesThisPage, lookForFlyPage = false, lastGiven)
    } else {
      // reference bug (ParseText.php:645): the non-formfeed branch passes an
      // undefined variable, i.e. an empty page — replicated
      val lastGiven = if (lineObjects.nonEmpty) lineObjects.last.givenPageNum else ""
      parser.parsePage(Seq.empty, lookForFlyPage = false, lastGiven)
    }

    // title/author fixup (Parser.php:92-107)
    val fixed = parser.objects.map { o =>
      if (o.kind == "Title" || o.kind == "Author") {
        var content = o.text.filter(c => c < 1 || c > 8)
        if (o.kind == "Title" && content.equalsIgnoreCase("Script Title")) content = ""
        if (o.kind == "Author" && content.equalsIgnoreCase("Name of First Writer")) content = ""
        o.copy(text = content)
      } else o
    }

    val (withRevisions, revs) = Revisions.parseRevisions(fixed.toVector, colors)
    val (withLineNums, lineNums) = Revisions.parseLineNumbers(withRevisions)

    ParseResult(withLineNums, headerFrags.toVector, footerFrags.toVector, colors,
      parser.numPages, pageResult.pageSize,
      flags.sceneContinuedNumber, flags.sceneContinuedTop, flags.sceneContinuedBottom,
      revs, lineNums)
  }
}
