package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, SimHash, MinHash signatures — each a native Catalyst
  * Expression (null-safe scalar kernels; the surrounding plan stays in
  * whole-stage codegen, these evaluate via CodegenFallback).
  *
  * All hashing is a fixed 64-bit FNV-1a variant — deterministic across
  * JVMs and runs, which the dedup/similarity joins rely on.
  */
object Hash64 {
  final val Prime = 0x100000001b3L
  final val Offset = 0xcbf29ce484222325L
  def bytes(b: Array[Byte], seed: Long): Long = {
    var h = Offset ^ seed
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= Prime; i += 1 }
    h
  }
  def string(s: String, seed: Long = 0L): Long = bytes(s.getBytes("UTF-8"), seed)
  /** cheap per-seed remix so one base hash serves n minhash functions */
  def remix(h: Long, seed: Int): Long = {
    var x = h ^ (seed * 0x9E3779B97F4A7C15L)
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL
    x ^= (x >>> 33); x *= 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }
}

object Tokenize {
  /** whitespace tokenization matching `split(trim(s), "\\s+")` */
  def whitespace(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }
  /** BPE-ish subword-ish regex tokens: words, numbers, single punct */
  private val tokRe = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
  def regexTokens(s: String): Vector[String] = {
    val m = tokRe.matcher(s)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }
}

/** lang_id(text): tiny n-gram/stopword heuristic over the five corpus
  * languages; deterministic argmax with fixed tie-break order.
  */
object LangId {
  val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "was", "he", "she", "you", "with"),
    "de" -> Set("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "nicht", "ich", "sie", "auf"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "de", "du", "pas", "je", "vous", "avec"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "un", "una", "de", "del", "no", "que", "con"),
    "zh" -> Set.empty)

  private val order = Vector("en", "de", "fr", "es")

  def detect(text: String): String = {
    // CJK codepoints dominate -> zh
    var cjk = 0; var total = 0
    var i = 0
    while (i < text.length && i < 2000) {
      val c = text.charAt(i)
      if (!c.isWhitespace) {
        total += 1
        if (c >= 0x4E00 && c <= 0x9FFF) cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk * 5 >= total) return "zh"
    val toks = Tokenize.whitespace(text.substring(0, math.min(text.length, 2000)).toLowerCase)
    var best = "en"; var bestScore = -1
    order.foreach { lang =>
      val sw = stopwords(lang)
      var score = 0
      toks.foreach(t => if (sw.contains(t)) score += 1)
      if (score > bestScore) { best = lang; bestScore = score }
    }
    if (bestScore <= 0) "und" else best
  }
}

case class LangIdExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(LangId.detect(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): LangIdExpr = copy(child = c)
}

/** simhash64(text): 64-bit SimHash over regex tokens. */
object SimHash {
  def of(text: String): Long = {
    val v = new Array[Int](64)
    Tokenize.regexTokens(text.toLowerCase).foreach { t =>
      val h = Hash64.string(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) v(b) += 1 else v(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (v(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

case class SimHashExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    SimHash.of(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
}

/** minhash(text, k, n): n-function MinHash signature over k-token
  * shingles (word shingles, lowercase).
  */
object MinHash {
  def signature(text: String, k: Int, n: Int): Array[Long] = {
    val toks = Tokenize.whitespace(text.toLowerCase)
    val sig = Array.fill(n)(Long.MaxValue)
    if (toks.length >= k) {
      var i = 0
      while (i + k <= toks.length) {
        val shingle = toks.slice(i, i + k).mkString(" ")
        val base = Hash64.string(shingle)
        var j = 0
        while (j < n) {
          val h = Hash64.remix(base, j)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
        i += 1
      }
    } else if (toks.nonEmpty) {
      val base = Hash64.string(toks.mkString(" "))
      var j = 0
      while (j < n) { sig(j) = Hash64.remix(base, j); j += 1 }
    }
    sig
  }

  /** banded LSH keys from a signature: n/r bands hashed to one long each */
  def bands(sig: Array[Long], rowsPerBand: Int): Array[Long] = {
    val nBands = sig.length / rowsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = Hash64.Offset ^ b
      var r = 0
      while (r < rowsPerBand) {
        h ^= sig(b * rowsPerBand + r); h *= Hash64.Prime
        r += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** exact n-gram (word k-shingle) Jaccard */
  def exactJaccard(t1: String, t2: String, k: Int): Double = {
    def shingles(s: String): Set[String] = {
      val toks = Tokenize.whitespace(s.toLowerCase)
      if (toks.length < k) Set(toks.mkString(" "))
      else (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" ")).toSet
    }
    val a = shingles(t1); val b = shingles(t2)
    if (a.isEmpty && b.isEmpty) 1.0
    else (a & b).size.toDouble / (a | b).size
  }
}

case class MinHashExpr(child: Expression, k: Int, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHash.signature(input.asInstanceOf[UTF8String].toString, k, n))
  override protected def withNewChildInternal(c: Expression): MinHashExpr = copy(child = c)
}

object TextOps {
  def langId(c: Column): Column = Bridge.column(LangIdExpr(Bridge.expression(c)))
  def simhash64(c: Column): Column = Bridge.column(SimHashExpr(Bridge.expression(c)))
  def minhash(c: Column, k: Int = 3, n: Int = 64): Column =
    Bridge.column(MinHashExpr(Bridge.expression(c), k, n))

  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("lang_id", e => LangIdExpr(e.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", e => SimHashExpr(e.head), "scala_udf")
    // minhash(text [, k, n]) — k/n are plan-time constants
    reg.createOrReplaceTempFunction("minhash", {
      case Seq(t) => MinHashExpr(t, 3, 64)
      case Seq(t, k, n) => MinHashExpr(t, litInt(k, "minhash k"), litInt(n, "minhash n"))
      case other => throw new IllegalArgumentException(
        s"minhash takes (text) or (text, k, n), got ${other.length} args")
    }, "scala_udf")
  }
}
