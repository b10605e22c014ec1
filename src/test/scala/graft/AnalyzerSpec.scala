package graft

import graft.analyze.DocAnalyzer
import graft.shakespeare.Shakespeare
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class AnalyzerSpec extends AnyFunSuite {

  test("X13: split_character_modifier peels trailing parens/brackets") {
    assert(DocAnalyzer.splitCharacterModifier("DANIEL (O.S.)") == ("DANIEL", "O.S."))
    assert(DocAnalyzer.splitCharacterModifier("DANIEL [V.O.] (CONT'D)") == ("DANIEL", "V.O."))
    assert(DocAnalyzer.splitCharacterModifier("(O.S.)") == ("(O.S.)", ""))
    assert(DocAnalyzer.splitCharacterModifier("PLAIN") == ("PLAIN", ""))
  }

  test("X14: character-name splitting with paren protection") {
    assert(DocAnalyzer.splitCharacterNames("ALICE & BOB") == Vector("ALICE", "BOB"))
    assert(DocAnalyzer.splitCharacterNames("ALICE AND BOB") == Vector("ALICE", "BOB"))
    assert(DocAnalyzer.splitCharacterNames("X, Y and Z") == Vector("X", "Y", "Z"))
    // paren containing a delimiter must not split
    assert(DocAnalyzer.splitCharacterNames("NICK (front & center)") ==
      Vector("NICK (front & center)"))
    assert(DocAnalyzer.splitCharacterNames("SOLO") == Vector("SOLO"))
  }

  test("A6/A7: analysis of a golden play ranks speakers and segments scenes") {
    val html = new String(Files.readAllBytes(
      Paths.get("/root/reference/shakespeare/tragedies/Hamlet_ Entire Play.json")
        .resolveSibling("Hamlet_ Entire Play.shakespeare")), "ISO-8859-1")
    val lines = Shakespeare.parse(html)
    val a = DocAnalyzer.analyze(lines)
    assert(a.title == "Hamlet")
    assert(a.author == "William Shakespeare")
    assert(a.scenes.size == 20) // Hamlet golden has 20 Scene lines
    assert(a.characters.nonEmpty)
    assert(a.characters.head.name == "HAMLET") // most dialogue
    // ranking is non-increasing
    assert(a.characters.sliding(2).forall(p => p.length < 2 || p(0).nDialogs >= p(1).nDialogs))
    // dual-speaker headings split into individual characters
    assert(a.characters.exists(_.name == "ROSENCRANTZ"))
  }
}
