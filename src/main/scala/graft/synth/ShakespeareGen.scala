package graft.synth

import scala.collection.mutable.ArrayBuffer

/** Deterministic Shakespeare-style HTML payloads (the shape of
  * shakespeare.mit.edu full-play pages, FIXTURES.md §2b) with their
  * expected extraction, derived independently from the reference walk
  * semantics (ParseShakespeare.php:8-112).
  */
object ShakespeareGen {

  final case class Doc(html: String, expected: Vector[(String, String, Int, String)])

  private val lineWords = Vector("thou", "art", "more", "lovely", "and",
    "temperate", "rough", "winds", "do", "shake", "the", "darling", "buds",
    "of", "may", "summer", "lease", "hath", "all", "too", "short", "a",
    "date", "sometime", "hot", "eye", "heaven", "shines")
  private val speakers = Vector("ROSALIND", "ORLANDO", "CELIA", "TOUCHSTONE",
    "DUKE", "JAQUES", "PHEBE", "SILVIUS")
  private val placesV = Vector("A forest.", "The palace.", "A room in the castle.",
    "Elsinore. A platform.", "The orchard.")

  private def verse(r: java.util.SplittableRandom, n: Int): String = {
    val ws = (0 until n).map(_ => lineWords(r.nextInt(lineWords.length)))
    ws.head.capitalize + ws.tail.map(" " + _).mkString + (if (r.nextInt(4) == 0) "!" else ",")
  }

  def generate(seed: Long, nActs: Int, title: String): Doc = {
    val r = new java.util.SplittableRandom(seed)
    val body = new StringBuilder
    val expected = ArrayBuffer.empty[(String, String, Int, String)]
    def exp(kind: String, text: String): Unit = expected += ((kind, text, 2, "2"))

    // synthetic title page (ParseShakespeare.php:40-48)
    val titleExpected = ArrayBuffer.empty[(String, String, Int, String)]
    for (_ <- 0 until 17) titleExpected += (("Text", "", 1, "1"))
    titleExpected += (("Title", title, 1, "1"))
    for (_ <- 0 until 3) titleExpected += (("Text", "", 1, "1"))
    titleExpected += (("Text", "By", 1, "1"))
    for (_ <- 0 until 2) titleExpected += (("Text", "", 1, "1"))
    titleExpected += (("Author", "William Shakespeare", 1, "1"))
    for (_ <- 0 until 24) titleExpected += (("Text", "", 1, "1"))

    var speechNo = 0
    var lineNo = 0
    var lastWasCharacter = false
    for (act <- 1 to nActs) {
      body.append(s"<H3>ACT ${"I" * act}</h3>\n\n")
      exp("Act", s"ACT ${"I" * act}")
      lastWasCharacter = false
      val nScenes = 1 + r.nextInt(2)
      for (scene <- 1 to nScenes) {
        val place = placesV(r.nextInt(placesV.length))
        body.append(s"<h3>SCENE $scene. $place</h3>\n")
        exp("Slugline", s"SCENE $scene. $place")
        lastWasCharacter = false
        // top-level stage direction: dropped by the reference walk
        // (<p><blockquote><i>...</i></blockquote> -> blockquote of body
        // whose children are neither <a> nor <p>)
        body.append(s"<p><blockquote>\n<i>Enter ${speakers(r.nextInt(speakers.length))}</i>\n</blockquote>\n\n")
        val nSpeeches = 2 + r.nextInt(4)
        for (_ <- 0 until nSpeeches) {
          speechNo += 1
          val speaker = speakers(r.nextInt(speakers.length))
          body.append(s"<A NAME=speech$speechNo><b>$speaker</b></a>\n<blockquote>\n")
          if (lastWasCharacter) {
            // consecutive Characters merge with " & "
            val (k, t, p, g) = expected.last
            expected(expected.length - 1) = (k, t + " & " + speaker, p, g)
          } else exp("Character", speaker)
          lastWasCharacter = true
          val emptySpeech = r.nextInt(12) == 0
          if (!emptySpeech) {
            val nLines = 1 + r.nextInt(4)
            for (li <- 0 until nLines) {
              lineNo += 1
              var line = verse(r, 4 + r.nextInt(4))
              if (li == 0 && r.nextInt(4) == 0) {
                val aside = if (r.nextInt(2) == 0) "Aside" else "To " + speakers(r.nextInt(speakers.length))
                body.append(s"<A NAME=$act.$scene.$lineNo>[$aside] $line</A><br>\n")
                exp("Paren", s"($aside)")
                exp("Dialog", s" $line") // remainder keeps its leading space
              } else {
                body.append(s"<A NAME=$act.$scene.$lineNo>$line</A><br>\n")
                exp("Dialog", line)
              }
              lastWasCharacter = false
            }
            if (r.nextInt(5) == 0) {
              val dir = s"Enter ${speakers(r.nextInt(speakers.length))}"
              body.append(s"<p><i>$dir</i></p>\n")
              exp("Action", dir)
              lastWasCharacter = false
            }
          }
          body.append("</blockquote>\n\n")
        }
      }
    }

    val html =
      s"""<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.0 Transitional//EN">
         | <html>
         | <head>
         | <title>$title: Entire Play
         | </title>
         |</HEAD>
         |<body bgcolor="#ffffff" text="#000000">
         |
         |<table width="100%" bgcolor="#CCF6F6">
         |<tr><td class="play" align="center">$title
         |</table>
         |
         |${body.toString}
         |</body>
         |</html>
         |""".stripMargin
    Doc(html, titleExpected.toVector ++ expected.toVector)
  }
}
