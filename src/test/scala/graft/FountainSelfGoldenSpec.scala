package graft

import graft.render.Render
import graft.shakespeare.Shakespeare
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Self-goldens for the Fountain sink: one pinned xxhash64 (seed 42, the
  * Spark default) of the rendered Fountain text per play. The round-trip
  * spec proves the CLASS of output is right (structure + pinned
  * lossiness); these hashes pin the exact BYTES, so any renderer drift —
  * even one that silently shrinks or grows the lossiness class while
  * keeping the round-trip green — fails loudly and forces a deliberate
  * re-pin. Regenerate by hashing Render.fountain(Shakespeare.parse(play))
  * with XXH64 over UTF-8 bytes.
  */
class FountainSelfGoldenSpec extends AnyFunSuite {

  private val pinned: Map[String, Long] = Map(
    "comedies/All's Well That Ends Well_ Entire Play.shakespeare" -> 5458973776015325341L,
    "comedies/As You Like It_ Entire Play.shakespeare" -> 7590960604884877296L,
    "comedies/Comedy of Errors_ Entire Play.shakespeare" -> -7096394175253189855L,
    "comedies/Cymbeline_ Entire Play.shakespeare" -> 854731359107067550L,
    "comedies/Love's Labour's Lost_ Entire Play.shakespeare" -> -7738018671260492834L,
    "comedies/Measure for Measure_ Entire Play.shakespeare" -> -4194550538944373720L,
    "comedies/Merchant of Venice_ Entire Play.shakespeare" -> 1701311545690139578L,
    "comedies/Merry Wives of Windsor_ Entire Play.shakespeare" -> -3944735760886683292L,
    "comedies/Midsummer Night's Dream_ Entire Play.shakespeare" -> 2536870824042617639L,
    "comedies/Much Ado About Nothing_ Entire Play.shakespeare" -> 7671708257880641344L,
    "comedies/Pericles_ Entire Play.shakespeare" -> -8455225752454223178L,
    "comedies/Taming of the Shrew_ Entire Play.shakespeare" -> -8793830093262580649L,
    "comedies/The Tempest_ Entire Play.shakespeare" -> -233565012613502548L,
    "comedies/Troiles and Cressida_ Entire Play.shakespeare" -> 8946308646442824427L,
    "comedies/Twelfth Night_ Entire Play.shakespeare" -> -4657442685115701587L,
    "comedies/Two Gentlemen of Verona_ Entire Play.shakespeare" -> 1398835386502329431L,
    "comedies/Winter's Tale_ Entire Play.shakespeare" -> 8407250761408868147L,
    "histories/Henry IV, part 1_ Entire Play.shakespeare" -> 6091929488949303617L,
    "histories/Henry IV, part 2_ Entire Play.shakespeare" -> -8974746875218707030L,
    "histories/Henry VI, part 1_ Entire Play.shakespeare" -> -1956335717248447990L,
    "histories/Henry VI, part 2_ Entire Play.shakespeare" -> 5741116872168445700L,
    "histories/Henry VI, part 3_ Entire Play.shakespeare" -> 7750161259586588915L,
    "histories/Henry VIII_ Entire Play.shakespeare" -> 4356736135427416567L,
    "histories/Henry V_ Entire Play.shakespeare" -> 102886299743984775L,
    "histories/King John_ Entire Play.shakespeare" -> -937994742127942130L,
    "histories/Richard III_ Entire Play.shakespeare" -> -8278298852535839669L,
    "histories/Richard II_ Entire Play.shakespeare" -> -6591748608276070276L,
    "tragedies/Antony and Cleopatra_ Entire Play.shakespeare" -> 6715763806224021929L,
    "tragedies/Coriolanus_ Entire Play.shakespeare" -> 777041977796649891L,
    "tragedies/Hamlet_ Entire Play.shakespeare" -> 5871155743928417814L,
    "tragedies/Julius Caesar_ Entire Play.shakespeare" -> 4594515618690016763L,
    "tragedies/King Lear_ Entire Play.shakespeare" -> -5586393178176275933L,
    "tragedies/Macbeth_ Entire Play.shakespeare" -> -980679852541047882L,
    "tragedies/Othello_ Entire Play.shakespeare" -> -906369304981370017L,
    "tragedies/Romeo and Juliet_ Entire Play.shakespeare" -> -9032994410377128385L,
    "tragedies/Timon of Athens_ Entire Play.shakespeare" -> 8564188675087942982L,
    "tragedies/Titus Andronicus_ Entire Play.shakespeare" -> -1606681166918028977L)

  test("fountain output bytes: 37 pinned play hashes") {
    val corpusDir = Paths.get("/root/reference/shakespeare")
    assume(Files.isDirectory(corpusDir), s"reference corpus not present at $corpusDir")
    val plays = Files.list(corpusDir).iterator.asScala.filter(Files.isDirectory(_)).flatMap { cat =>
      Files.list(cat).iterator.asScala.filter(_.toString.endsWith(".shakespeare"))
    }.toSeq.sortBy(_.toString)
    assert(plays.size == 37, s"expected 37 plays, found ${plays.size}")
    val bad = plays.flatMap { p =>
      val rel = corpusDir.relativize(p).toString
      val html = new String(Files.readAllBytes(p), "ISO-8859-1")
      val f = Render.fountain(Shakespeare.parse(html))
      val bytes = f.getBytes("UTF-8")
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      pinned.get(rel) match {
        case Some(want) if want == h => None
        case Some(want) => Some(s"$rel: got $h want $want")
        case None => Some(s"$rel: not pinned")
      }
    }
    assert(bad.isEmpty, s"fountain renderer drift:\n${bad.mkString("\n")}")
  }
}
