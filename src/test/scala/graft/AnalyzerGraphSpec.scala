package graft

import graft.analyze.DocAnalyzer
import graft.shakespeare.Shakespeare
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Full Analyzer-graph lock (TestParser.php:64-79 debug surface): the
  * complete Scene -> Dialog -> speaker graph of Hamlet, computed over the
  * golden-verified line stream (ShakespeareGoldenSpec proves the lines
  * match the reference byte-for-byte, so the graph is anchored to
  * reference-exact input). The snapshot (src/test/resources/golden/
  * hamlet_graph.txt, regenerate via graft.tools.GraphDump) locks every
  * scene boundary, dialog attribution, modifier, and the character
  * ranking; the semantic asserts pin externally-known facts about the
  * play so the snapshot itself stays honest.
  */
class AnalyzerGraphSpec extends AnyFunSuite {

  private val play = Paths.get(
    "/root/reference/shakespeare/tragedies/Hamlet_ Entire Play.shakespeare")

  test("Hamlet: full scene/dialog/character graph matches the locked snapshot") {
    assume(Files.isReadable(play))
    val html = new String(Files.readAllBytes(play), "ISO-8859-1")
    val a = DocAnalyzer.analyze(Shakespeare.parse(html))

    // externally-known facts, independent of our own code's history
    assert(a.title == "Hamlet")
    assert(a.author == "William Shakespeare")
    assert(a.scenes.length == 20) // 5 acts, 20 scenes
    assert(a.characters.head.name == "HAMLET")
    assert(a.characters.head.nDialogs > 300)
    val names = a.characters.map(_.name)
    Seq("HORATIO", "KING CLAUDIUS", "OPHELIA", "LAERTES").foreach { n =>
      assert(names.contains(n), s"missing $n")
    }
    // first line of the play, attributed to the right speaker
    val d0 = a.scenes.head.dialogs.head
    assert(d0.character == "BERNARDO" && d0.dialogString == "Who's there?")

    val got = graft.tools.GraphDump.render(a)
    val want = Files.readString(Paths.get("src/test/resources/golden/hamlet_graph.txt"))
    assert(got == want, "analyzer graph drifted from the locked snapshot")
  }
}
