package graft

import graft.shakespeare.Shakespeare
import graft.util.Json
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Per-turn equality against the reference's own golden corpus: the 37
  * paired `<Play>_ Entire Play.shakespeare` / `.json` files under
  * /root/reference/shakespeare/{comedies,histories,tragedies}. These goldens
  * were produced by the reference engine itself, so matching them line for
  * line IS the BASELINE.json "per-turn text equality" invariant for the
  * HTML path.
  *
  * Comparison surface (see FIXTURES.md §3): the ordered `lines[]` and
  * `titlePage.lines[]` with {type, text, pageNum, givenPageNum}.
  */
class ShakespeareGoldenSpec extends AnyFunSuite {

  private val corpusDir = Paths.get("/root/reference/shakespeare")

  private def pairs: Seq[(Path, Path)] = {
    if (!Files.isDirectory(corpusDir)) return Seq.empty
    Files.list(corpusDir).iterator.asScala.filter(Files.isDirectory(_)).flatMap { cat =>
      Files.list(cat).iterator.asScala.filter(_.toString.endsWith(".shakespeare")).map { in =>
        val golden = Paths.get(in.toString.stripSuffix(".shakespeare") + ".json")
        (in, golden)
      }
    }.toSeq.sortBy(_._1.toString)
  }

  private def lineTuple(v: Json.Value): (String, String, Int, Int) = {
    val o = v.asObject
    (o("type").asString, o("text").asString,
      o.get("pageNum").map(_.asInt).getOrElse(-1),
      o.get("givenPageNum").map(_.asInt).getOrElse(-1))
  }

  test("all 37 reference golden plays match line-for-line") {
    val ps = pairs
    assert(ps.size == 37, s"expected 37 golden pairs, found ${ps.size}")
    var totalLines = 0
    ps.foreach { case (in, goldenPath) =>
      val html = new String(Files.readAllBytes(in), "ISO-8859-1")
      val golden = Json.parse(new String(Files.readAllBytes(goldenPath), "UTF-8"))
      val ours = Shakespeare.parse(html)

      val ourBody = ours.filter(_.pageNum > 1)
        .map(l => (l.typeJson, l.text, l.pageNum, l.givenPageNum.toInt))
      val ourTitle = ours.filter(_.pageNum == 1)
        .map(l => (l.typeJson, l.text, l.pageNum, l.givenPageNum.toInt))

      val goldBody = golden("lines").asArray.map(lineTuple)
      val goldTitle = golden("titlePage")("lines").asArray.map(lineTuple)

      def diff(name: String, got: Seq[(String, String, Int, Int)], want: Seq[(String, String, Int, Int)]): Unit = {
        if (got != want) {
          val n = math.min(got.size, want.size)
          var firstBad = -1
          var k = 0
          while (k < n && firstBad < 0) { if (got(k) != want(k)) firstBad = k; k += 1 }
          if (firstBad < 0) firstBad = n
          val ctx = (math.max(0, firstBad - 2) to math.min(math.max(got.size, want.size) - 1, firstBad + 2)).map { idx =>
            s"  [$idx] got=${got.lift(idx)} want=${want.lift(idx)}"
          }.mkString("\n")
          fail(s"${in.getFileName} $name mismatch at index $firstBad (got ${got.size} want ${want.size}):\n$ctx")
        }
      }
      diff("lines", ourBody, goldBody)
      diff("titlePage", ourTitle, goldTitle)

      // the "By" line alignment attribute (ParseShakespeare.php:44)
      val byIdx = ourTitle.indexWhere(_._2 == "By")
      assert(byIdx >= 0 && ours.filter(_.pageNum == 1)(byIdx).alignment == "center")
      totalLines += goldBody.size + goldTitle.size
    }
    info(s"matched $totalLines golden lines across ${ps.size} plays")
    assert(totalLines > 140000)
  }
}
