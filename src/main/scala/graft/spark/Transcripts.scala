package graft.spark

import graft.synth.{ScreenplayGen, ShakespeareGen}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** One transcript turn (BASELINE.json input_hint schema). */
final case class Turn(
    conv_id: String, turn_idx: Int, role: String, text: String,
    tool: String, ts: Timestamp)

/** One expected extraction line for the verification join (J4). */
final case class GoldenLine(
    conv_id: String, turn_idx: Int, line_idx: Int,
    kind: String, text: String, page_num: Int, given_page_num: String)

/** Golden line for the dual-dialog corpus (C10 attestation): the J4
  * fields plus the engine's dual column tracking — `column` 1/2 for the
  * left/right splice rows, `has_dual`/`is_dual` on the paired Character
  * rows (ParseText.php:1412-1563 recovery, WriteOutput.php:282-302
  * column assignment).
  */
final case class DualGoldenLine(
    conv_id: String, turn_idx: Int, line_idx: Int,
    kind: String, text: String, page_num: Int, given_page_num: String,
    column: Int, has_dual: Boolean, is_dual: Boolean)

/** One expected final revision per turn of the colored-revision corpus
  * (A4 attestation): `rank` is the revision's position in the engine's
  * weight-ordered output list (Parser.php:409-417), `n_spans` the total
  * revision spans attributed to it across the turn's lines.
  */
final case class RevGoldenLine(
    conv_id: String, turn_idx: Int, rank: Long,
    name: String, color: String, n_spans: Long)

/** One expected line-number side-vote row per turn of the margin-numbered
  * corpus (A5 attestation): the JSON types that won a side and which.
  */
final case class VoteGoldenLine(
    conv_id: String, turn_idx: Int, `type`: String,
    side_left: Boolean, side_right: Boolean)

/** Golden line for the cross-feature corpus (q35): the dual-corpus fields
  * plus the line's canonical revision-span string and the turn-level
  * expectations — final revision table, side-vote table and CONTINUED
  * flags — repeated on every row of the turn (constant within a turn, so
  * the per-turn aggregation reads them with max()).
  */
final case class CrossGoldenLine(
    conv_id: String, turn_idx: Int, line_idx: Int,
    kind: String, text: String, page_num: Int, given_page_num: String,
    column: Int, has_dual: Boolean, is_dual: Boolean,
    revs: String, attrs: String,
    rev_table: String, votes: String,
    cont_top: Boolean, cont_bottom: Boolean, cont_number: Boolean)

/** one noisy web page for the boilerplate-density corpus (q39) */
final case class HtmlDoc(doc_id: Long, html: String)
/** one expected main-content block of a noisy page */
final case class HtmlGoldenBlock(doc_id: Long, block_idx: Int, text: String)

/** Deterministic synthetic multi-turn transcript corpus: each assistant
  * turn's payload is a document (pdftohtml-style XML or Shakespeare-style
  * HTML, ~50/50), other turns carry small plain-text payloads. Generation
  * is distributed (seeded per conversation, no driver-side data) and
  * emits a parallel goldens table derived independently from the layout
  * grammar — the per-turn equality oracle.
  *
  * Skew: conversation k has turn count multiplied for k % skewEvery == 0,
  * modeling the long-conversation skew the north rule calls out.
  */
object Transcripts {

  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tool", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  private val epochMs = 1735689600000L // 2025-01-01T00:00:00Z, fixed

  def convId(seed: Long, k: Long): String = f"conv-$seed%x-$k%08d"

  /** Deterministic turns for one conversation. */
  /** Spark-compatible conv_id bucket: pmod(xxhash64(conv_id), nBuckets)
    * with Spark's default seed 42 — lets a generator TARGET a bucket.
    */
  def bucketOf(convIdStr: String, nBuckets: Int): Int = {
    val b = convIdStr.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    val m = h % nBuckets
    (if (m < 0) m + nBuckets else m).toInt
  }

  /** [[turnsFor]] with the long-conversation skew PLANTED in one bucket:
    * every conversation hashing into bucket 0 of `nBuckets` gets
    * `skewFactor`x the turns. Conversations outside bucket 0 are
    * byte-identical to the unskewed stream (same seed, same draws), so a
    * skew-stress run isolates exactly the layout variable.
    */
  def skewedTurnsFor(seed: Long, k: Long, avgTurns: Int, nBuckets: Int,
      skewFactor: Int): Seq[(Turn, Seq[GoldenLine])] = {
    val r = new java.util.SplittableRandom(seed * 1000003L + k)
    val id = convId(seed, k)
    val base = 1 + r.nextInt(math.max(1, avgTurns * 2 - 1))
    val nTurns = if (bucketOf(id, nBuckets) == 0) base * skewFactor else base
    turnsBody(r, seed, k, id, nTurns)
  }

  def turnsFor(seed: Long, k: Long, avgTurns: Int, skewEvery: Int, skewFactor: Int): Seq[(Turn, Seq[GoldenLine])] = {
    val r = new java.util.SplittableRandom(seed * 1000003L + k)
    val id = convId(seed, k)
    val base = 1 + r.nextInt(math.max(1, avgTurns * 2 - 1))
    val nTurns = if (skewEvery > 0 && k % skewEvery == 0) base * skewFactor else base
    turnsBody(r, seed, k, id, nTurns)
  }

  private def turnsBody(r: java.util.SplittableRandom, seed: Long, k: Long,
      id: String, nTurns: Int): Seq[(Turn, Seq[GoldenLine])] = {
    (0 until nTurns).map { ti =>
      val role = ti % 3 match { case 0 => "user"; case 1 => "assistant"; case 2 => "tool" }
      val ts = new Timestamp(epochMs + k * 3600000L + ti * 60000L)
      if (role == "assistant") {
        val docSeed = seed ^ (k * 7919L + ti)
        if (r.nextBoolean()) {
          // NOTE: deliberately the dual-free element stream. An experiment
          // that put elementsWithDual here (+45% lines/turn) drove the
          // 1x2 -> 4x2 scaling efficiency from 0.87 to a consistent
          // ~0.63-0.65 on this box — the heavier per-turn line output hits
          // the shared memory-bandwidth wall at 8 cores (BENCH/BASELINE.md
          // "corpus weight" note). Dual-dialog coverage lives in
          // DualRoundTripSpec's 25-seed family and the C10 fixtures.
          val doc = ScreenplayGen.render(
            ScreenplayGen.elements(docSeed, 2 + r.nextInt(4)),
            ScreenplayGen.Options(headerText = s"TRANSCRIPT $id"))
          val goldens = doc.expected.zipWithIndex.map { case ((kind, text, page, given), li) =>
            GoldenLine(id, ti, li, kind, text, page, given)
          }
          (Turn(id, ti, role, doc.xml, "pdftohtml", ts), goldens)
        } else {
          val doc = ShakespeareGen.generate(docSeed, 1 + r.nextInt(3), s"Play $id $ti")
          val goldens = doc.expected.zipWithIndex.map { case ((kind, text, page, given), li) =>
            GoldenLine(id, ti, li, kind, text, page, given)
          }
          (Turn(id, ti, role, doc.html, "shakespeare", ts), goldens)
        }
      } else {
        val text = s"plain turn $ti of $id: " + ("lorem " * (1 + r.nextInt(8))).trim
        (Turn(id, ti, role, text, "", ts), Seq.empty[GoldenLine])
      }
    }
  }

  /** Distributed synthesis: one task per slice of conversations. */
  def synthesize(spark: SparkSession, nConvs: Long, seed: Long = 42L,
      avgTurns: Int = 8, skewEvery: Int = 1000, skewFactor: Int = 20,
      parallelism: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => turnsFor(seed, k, avgTurns, skewEvery, skewFactor).map(_._1))
  }

  /** The goldens side of the same corpus (same seed => exact pairing). */
  def goldens(spark: SparkSession, nConvs: Long, seed: Long = 42L,
      avgTurns: Int = 8, skewEvery: Int = 1000, skewFactor: Int = 20,
      parallelism: Int = 0): Dataset[GoldenLine] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => turnsFor(seed, k, avgTurns, skewEvery, skewFactor).flatMap(_._2))
  }

  def df(spark: SparkSession, nConvs: Long, seed: Long = 42L): DataFrame =
    synthesize(spark, nConvs, seed).toDF()

  // ---- dual-dialog corpus (C10 driver attestation) -----------------------
  // A SEPARATE, small corpus whose every assistant turn is a pdfxml
  // document with dual-dialog exchanges (ScreenplayGen.elementsWithDual).
  // Kept out of the headline/scaling corpus on purpose: dual exchanges
  // add ~45% extracted lines per turn and measurably dent the N->4N
  // scaling figure on this box (BENCH/BASELINE.md "corpus weight" note).

  /** Deterministic turns for one dual-heavy conversation, with goldens
    * carrying the expected column / dual flags per line.
    */
  def dualTurnsFor(seed: Long, k: Long, avgTurns: Int): Seq[(Turn, Seq[DualGoldenLine])] = {
    val r = new java.util.SplittableRandom(seed * 2000003L + k)
    val id = f"dual-$seed%x-$k%08d"
    val nTurns = 1 + r.nextInt(math.max(1, avgTurns * 2 - 1))
    (0 until nTurns).map { ti =>
      val role = if (ti % 2 == 0) "user" else "assistant"
      val ts = new Timestamp(epochMs + k * 3600000L + ti * 60000L)
      if (role == "assistant") {
        val docSeed = seed ^ (k * 7919L + ti)
        val doc = ScreenplayGen.render(
          ScreenplayGen.elementsWithDual(docSeed, 2 + r.nextInt(3)),
          ScreenplayGen.Options(headerText = s"DUAL DRAFT $id"))
        val goldens = doc.expected.zip(doc.dualMeta).zipWithIndex.map {
          case (((kind, text, page, given), (column, hasDual, isDual)), li) =>
            DualGoldenLine(id, ti, li, kind, text, page, given, column, hasDual, isDual)
        }
        (Turn(id, ti, role, doc.xml, "pdftohtml", ts), goldens)
      } else {
        val text = s"dual-corpus turn $ti of $id: " + ("ipsum " * (1 + r.nextInt(6))).trim
        (Turn(id, ti, role, text, "", ts), Seq.empty[DualGoldenLine])
      }
    }
  }

  /** Distributed synthesis of the dual-heavy corpus. */
  def synthesizeDual(spark: SparkSession, nConvs: Long, seed: Long = 4242L,
      avgTurns: Int = 4, parallelism: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => dualTurnsFor(seed, k, avgTurns).map(_._1))
  }

  /** Goldens side of the dual corpus (same seed => exact pairing). */
  def dualGoldens(spark: SparkSession, nConvs: Long, seed: Long = 4242L,
      avgTurns: Int = 4, parallelism: Int = 0): Dataset[DualGoldenLine] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => dualTurnsFor(seed, k, avgTurns).flatMap(_._2))
  }

  // ---- colored-revision corpus (A4/A5 driver attestation) ----------------

  /** The fixed draft-revision palette: header names + hex colors. */
  val revPalette: Vector[(String, String)] = Vector(
    ("Blue Draft", "#0000ff"),
    ("Pink Draft", "#ff00ff"),
    ("Goldenrod Draft", "#daa520"))

  /** Deterministic turns for one colored-revision conversation. Goldens
    * carry the expected FINAL revision list per turn — rank (weight
    * order), bound name, color, attributed span count — derived by the
    * generator's independent simulation of Parser.php:239-486.
    */
  def revTurnsFor(seed: Long, k: Long, avgTurns: Int): Seq[(Turn, Seq[RevGoldenLine])] = {
    val r = new java.util.SplittableRandom(seed * 3000017L + k)
    val id = f"rev-$seed%x-$k%08d"
    val nTurns = 1 + r.nextInt(math.max(1, avgTurns * 2 - 1))
    (0 until nTurns).map { ti =>
      val role = if (ti % 2 == 0) "user" else "assistant"
      val ts = new Timestamp(epochMs + k * 3600000L + ti * 60000L)
      if (role == "assistant") {
        val docSeed = seed ^ (k * 104729L + ti)
        // 7-11 scenes: enough body pages that mixed pages occur and the
        // weight-list bump actually reorders (at 3-5 scenes most docs stay
        // under 3 body pages and the reorder path would go unexercised)
        val doc = ScreenplayGen.render(
          ScreenplayGen.elements(docSeed, 7 + r.nextInt(5)),
          ScreenplayGen.Options(revisions = revPalette))
        val goldens = doc.revExpected.map { case (rank, name, color, nSpans) =>
          RevGoldenLine(id, ti, rank, name, color, nSpans)
        }
        (Turn(id, ti, role, doc.xml, "pdftohtml", ts), goldens)
      } else {
        val text = s"rev-corpus turn $ti of $id: " + ("dolor " * (1 + r.nextInt(6))).trim
        (Turn(id, ti, role, text, "", ts), Seq.empty[RevGoldenLine])
      }
    }
  }

  /** Distributed synthesis of the colored-revision corpus. */
  def synthesizeRev(spark: SparkSession, nConvs: Long, seed: Long = 777L,
      avgTurns: Int = 4, parallelism: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => revTurnsFor(seed, k, avgTurns).map(_._1))
  }

  /** Goldens side of the colored-revision corpus. */
  def revGoldens(spark: SparkSession, nConvs: Long, seed: Long = 777L,
      avgTurns: Int = 4, parallelism: Int = 0): Dataset[RevGoldenLine] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => revTurnsFor(seed, k, avgTurns).flatMap(_._2))
  }

  // ---- margin-numbered corpus (A5 driver attestation) --------------------

  /** Deterministic turns for one margin-numbered conversation: every
    * assistant doc carries a line-number token beside each body line and
    * the goldens carry the expected per-type side-vote table.
    */
  def numberedTurnsFor(seed: Long, k: Long, avgTurns: Int): Seq[(Turn, Seq[VoteGoldenLine])] = {
    val r = new java.util.SplittableRandom(seed * 5000011L + k)
    val id = f"num-$seed%x-$k%08d"
    val nTurns = 1 + r.nextInt(math.max(1, avgTurns * 2 - 1))
    (0 until nTurns).map { ti =>
      val role = if (ti % 2 == 0) "user" else "assistant"
      val ts = new Timestamp(epochMs + k * 3600000L + ti * 60000L)
      if (role == "assistant") {
        val docSeed = seed ^ (k * 904997L + ti)
        val doc = ScreenplayGen.render(
          ScreenplayGen.elements(docSeed, 2 + r.nextInt(4)),
          ScreenplayGen.Options(marginLineNumbers = true))
        val goldens = doc.voteExpected.map { case (tp, l, rr) =>
          VoteGoldenLine(id, ti, tp, l, rr)
        }
        (Turn(id, ti, role, doc.xml, "pdftohtml", ts), goldens)
      } else {
        val text = s"numbered turn $ti of $id: " + ("amet " * (1 + r.nextInt(6))).trim
        (Turn(id, ti, role, text, "", ts), Seq.empty[VoteGoldenLine])
      }
    }
  }

  /** Distributed synthesis of the margin-numbered corpus. */
  def synthesizeNumbered(spark: SparkSession, nConvs: Long, seed: Long = 555L,
      avgTurns: Int = 4, parallelism: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => numberedTurnsFor(seed, k, avgTurns).map(_._1))
  }

  /** Goldens side of the margin-numbered corpus. */
  def numberedGoldens(spark: SparkSession, nConvs: Long, seed: Long = 555L,
      avgTurns: Int = 4, parallelism: Int = 0): Dataset[VoteGoldenLine] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => numberedTurnsFor(seed, k, avgTurns).flatMap(_._2))
  }

  /** Distributed synthesis of the skew-stress corpus (see skewedTurnsFor). */
  def synthesizeSkewed(spark: SparkSession, nConvs: Long, seed: Long = 42L,
      avgTurns: Int = 8, nBuckets: Int = 8, skewFactor: Int = 50,
      parallelism: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => skewedTurnsFor(seed, k, avgTurns, nBuckets, skewFactor).map(_._1))
  }

  /** Goldens side of the skew-stress corpus. */
  def skewedGoldens(spark: SparkSession, nConvs: Long, seed: Long = 42L,
      avgTurns: Int = 8, nBuckets: Int = 8, skewFactor: Int = 50,
      parallelism: Int = 0): Dataset[GoldenLine] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => skewedTurnsFor(seed, k, avgTurns, nBuckets, skewFactor).flatMap(_._2))
  }

  // ---- cross-feature corpus (q35 driver attestation) ---------------------
  // Every assistant doc carries dual-dialog exchanges, colored revisions
  // (key + mixed pages), margin line numbers, scene-number tokens, CONT'D
  // markers and CONTINUED bands AT ONCE — the interaction product space
  // (splice x revision walk x number capture) that the per-feature corpora
  // q32/q33/q34 cannot see. 7-11 scenes so mixed pages occur.

  /** Deterministic turns for one cross-feature conversation. */
  def crossTurnsFor(seed: Long, k: Long, avgTurns: Int): Seq[(Turn, Seq[CrossGoldenLine])] = {
    val r = new java.util.SplittableRandom(seed * 7000003L + k)
    val id = f"cross-$seed%x-$k%08d"
    val nTurns = 1 + r.nextInt(math.max(1, avgTurns * 2 - 1))
    (0 until nTurns).map { ti =>
      val role = if (ti % 2 == 0) "user" else "assistant"
      val ts = new Timestamp(epochMs + k * 3600000L + ti * 60000L)
      if (role == "assistant") {
        val docSeed = seed ^ (k * 611953L + ti)
        val doc = ScreenplayGen.render(
          ScreenplayGen.elementsWithDualTight(docSeed, 7 + r.nextInt(5)),
          ScreenplayGen.Options(
            revisions = revPalette,
            marginLineNumbers = true,
            sceneNumbers = true,
            contdMarkers = true,
            continuedBands = true,
            inlineStyles = true,
            fragmentJitter = true))
        val revTable = doc.revExpected
          .map { case (rank, name, color, _) => s"$rank:$name:$color" }.mkString(";")
        val votes = doc.voteExpected
          .map { case (t, l, rr) => s"$t:$l:$rr" }.mkString(";")
        val (cTop, cBottom, cNum) = doc.contExpected
        val goldens = doc.expected.zip(doc.dualMeta).zipWithIndex.map {
          case (((kind, text, page, given), (column, hasDual, isDual)), li) =>
            CrossGoldenLine(id, ti, li, kind, text, page, given,
              column, hasDual, isDual,
              doc.lineRevsExpected(li), doc.lineAttrsExpected(li),
              revTable, votes, cTop, cBottom, cNum)
        }
        (Turn(id, ti, role, doc.xml, "pdftohtml", ts), goldens)
      } else {
        val text = s"cross-corpus turn $ti of $id: " + ("sit " * (1 + r.nextInt(6))).trim
        (Turn(id, ti, role, text, "", ts), Seq.empty[CrossGoldenLine])
      }
    }
  }

  /** Distributed synthesis of the cross-feature corpus. */
  def synthesizeCross(spark: SparkSession, nConvs: Long, seed: Long = 3131L,
      avgTurns: Int = 4, parallelism: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => crossTurnsFor(seed, k, avgTurns).map(_._1))
  }

  /** Goldens side of the cross-feature corpus. */
  def crossGoldens(spark: SparkSession, nConvs: Long, seed: Long = 3131L,
      avgTurns: Int = 4, parallelism: Int = 0): Dataset[CrossGoldenLine] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => crossTurnsFor(seed, k, avgTurns).flatMap(_._2))
  }

  /** Raw-PDF corpus: the SAME cross-feature document family, rendered as
    * real PDF bytes ([[graft.synth.PdfGen]]) instead of pdftohtml XML —
    * identical fragment geometry, so the generator-derived goldens are the
    * same [[CrossGoldenLine]] expectations, now attested through the
    * hand-built PDF object/xref/content-stream lexer
    * ([[graft.pdfxml.PdfLex]]).
    */
  def pdfTurnsFor(seed: Long, k: Long, avgTurns: Int,
      modern: Boolean = false): Seq[(Turn, Seq[CrossGoldenLine])] =
    pdfTurnsBody(seed, k, avgTurns, modern, renderPdf = true)

  /** Shared body of [[pdfTurnsFor]] and the goldens-only path: with
    * `renderPdf = false` the (expensive) PDF serialization is skipped and
    * the turn carries empty text — the goldens are derived from the SAME
    * document/RNG stream either way, so [[pdfGoldens]] no longer renders
    * PDF bytes it immediately discards (guide §1.2: don't compute things
    * you throw away).
    */
  private def pdfTurnsBody(seed: Long, k: Long, avgTurns: Int,
      modern: Boolean, renderPdf: Boolean): Seq[(Turn, Seq[CrossGoldenLine])] = {
    val r = new java.util.SplittableRandom(seed * 9100019L + k)
    val id = f"pdf-$seed%x-$k%08d"
    val nTurns = 1 + r.nextInt(math.max(1, avgTurns * 2 - 1))
    (0 until nTurns).map { ti =>
      val role = if (ti % 2 == 0) "user" else "assistant"
      val ts = new Timestamp(epochMs + k * 3600000L + ti * 60000L)
      if (role == "assistant") {
        val docSeed = seed ^ (k * 424243L + ti)
        val doc = ScreenplayGen.render(
          ScreenplayGen.elementsWithDualTight(docSeed, 7 + r.nextInt(5)),
          ScreenplayGen.Options(
            revisions = revPalette,
            marginLineNumbers = true,
            sceneNumbers = true,
            contdMarkers = true,
            continuedBands = true,
            inlineStyles = true,
            fragmentJitter = true))
        val revTable = doc.revExpected
          .map { case (rank, name, color, _) => s"$rank:$name:$color" }.mkString(";")
        val votes = doc.voteExpected
          .map { case (t, l, rr) => s"$t:$l:$rr" }.mkString(";")
        val (cTop, cBottom, cNum) = doc.contExpected
        val goldens = doc.expected.zip(doc.dualMeta).zipWithIndex.map {
          case (((kind, text, page, given), (column, hasDual, isDual)), li) =>
            CrossGoldenLine(id, ti, li, kind, text, page, given,
              column, hasDual, isDual,
              doc.lineRevsExpected(li), doc.lineAttrsExpected(li),
              revTable, votes, cTop, cBottom, cNum)
        }
        val pdf =
          if (!renderPdf) ""
          else if (modern) graft.synth.PdfGen.fromXmlModern(doc.xml)
          else graft.synth.PdfGen.fromXml(doc.xml)
        (Turn(id, ti, role, pdf, "pdf", ts), goldens)
      } else {
        val text = s"pdf-corpus turn $ti of $id: " + ("lex " * (1 + r.nextInt(6))).trim
        (Turn(id, ti, role, text, "", ts), Seq.empty[CrossGoldenLine])
      }
    }
  }

  /** Noisy-HTML corpus for the text-density / link-density boilerplate
    * classifier (q39): pages built so every block's label is invariant to
    * its neighbors under the published thresholds — the goldens are the
    * construction, not a classifier run.
    */
  def synthesizeNoisyHtml(spark: SparkSession, nDocs: Long,
      seed: Long = 2718L, parallelism: Int = 0): Dataset[HtmlDoc] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nDocs, 1, par)
      .map(k => HtmlDoc(k, graft.synth.NoisyHtmlGen.page(seed * 524287L + k)._1))
  }

  def noisyHtmlGoldens(spark: SparkSession, nDocs: Long,
      seed: Long = 2718L, parallelism: Int = 0): Dataset[HtmlGoldenBlock] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nDocs, 1, par).flatMap { k =>
      graft.synth.NoisyHtmlGen.page(seed * 524287L + k)._2.zipWithIndex.map {
        case (text, bi) => HtmlGoldenBlock(k, bi, text)
      }
    }
  }

  /** Distributed synthesis of the raw-PDF corpus. */
  def synthesizePdf(spark: SparkSession, nConvs: Long, seed: Long = 9393L,
      avgTurns: Int = 4, parallelism: Int = 0,
      modern: Boolean = false): Dataset[Turn] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => pdfTurnsFor(seed, k, avgTurns, modern).map(_._1))
  }

  /** Goldens side of the raw-PDF corpus. Skips the PDF byte serialization
    * (see [[pdfTurnsBody]]) — the goldens derive from the document model,
    * not from the bytes, and are identical for both serializations.
    */
  def pdfGoldens(spark: SparkSession, nConvs: Long, seed: Long = 9393L,
      avgTurns: Int = 4, parallelism: Int = 0): Dataset[CrossGoldenLine] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par)
      .flatMap(k => pdfTurnsBody(seed, k, avgTurns, modern = false,
        renderPdf = false).flatMap(_._2))
  }
}
