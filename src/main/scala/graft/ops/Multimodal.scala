package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, decoded by native Catalyst
  * expressions (decode_media / byte_mean scalar kernels — no per-row UDF
  * dispatch, no object boxing, and unused feature columns prune away;
  * see [[Multimodal.features]]).
  *
  * The decode step parses REAL container formats — PNG (signature + IHDR
  * dimensions, CRC-correct chunks), WAV (RIFF chunk walk: fmt byte-rate,
  * data size -> duration), GIF89a (logical screen descriptor + block walk
  * counting image descriptors = frame count) — all pure-JVM byte parsing,
  * no media libraries. Pixel/sample DECOMPRESSION is out of scope in this
  * container (no codecs), so payload bodies carry deterministic filler;
  * every derived feature (kind, width, height, duration, frame count)
  * comes from genuinely parsing the container structure.
  */
object Multimodal {

  /** kind/width/height/dur_ms/n_frames are synthesis-time metadata; the
    * decode path must re-derive all of them from `payload` alone.
    */
  final case class MediaRow(media_id: Long, kind: String, width: Int,
      height: Int, dur_ms: Int, n_frames: Int, payload: Array[Byte])

  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Int, width: Int, height: Int, dur_ms: Int,
      byte_mean: Double, thumb_w: Int, thumb_h: Int, n_frames_sampled: Int)

  // ---- encoders (synthesis side) ------------------------------------------

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def pngChunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32
    val tagB = tag.getBytes("US-ASCII")
    crc.update(tagB); crc.update(body)
    be32(body.length) ++ tagB ++ body ++ be32(crc.getValue.toInt)
  }

  /** minimal structurally-valid PNG: signature, IHDR(w,h,8-bit RGB),
    * one IDAT of deterministic filler, IEND. CRCs are real.
    */
  def pngBytes(w: Int, h: Int, filler: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", filler) ++
      pngChunk("IEND", Array.empty)
  }

  /** 8-bit mono PCM WAV at 8 kHz: byteRate=8000, so durMs = dataLen/8
    * exactly. RIFF/fmt/data chunk structure is real.
    */
  def wavBytes(durMs: Int, filler: Int => Byte): Array[Byte] = {
    val rate = 8000
    val dataLen = durMs * rate / 1000 // bytes (1 ch x 8 bit)
    val fmt = le16(1) ++ le16(1) ++ le32(rate) ++ le32(rate) ++ le16(1) ++ le16(8)
    val data = Array.tabulate[Byte](dataLen)(filler)
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataLen) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(dataLen) ++ data
  }

  /** GIF89a with `nFrames` image descriptors (the "video": frame count is
    * container structure). No color tables; tiny LZW stub per frame.
    */
  def gifBytes(w: Int, h: Int, nFrames: Int, filler: Int => Byte): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte](64 + nFrames * 24)
    out ++= "GIF89a".getBytes("US-ASCII")
    out ++= le16(w); out ++= le16(h)
    out += 0x00.toByte; out += 0.toByte; out += 0.toByte // no GCT, bg, aspect
    var f = 0
    while (f < nFrames) {
      out += 0x2c.toByte // image descriptor
      out ++= le16(0); out ++= le16(0); out ++= le16(w); out ++= le16(h)
      out += 0x00.toByte // no local color table
      out += 0x08.toByte // LZW min code size
      val sub = Array.tabulate[Byte](8)(i => filler(f * 8 + i))
      out += sub.length.toByte; out ++= sub
      out += 0x00.toByte // sub-block terminator
      f += 1
    }
    out += 0x3b.toByte // trailer
    out.toArray
  }

  /** deterministic media corpus with REAL container payloads */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { id =>
      val r = new java.util.SplittableRandom(seed ^ id)
      val fill = (i: Int) => ((r.nextInt(256) - 128) ^ (i & 0x7f)).toByte
      (id % 3) match {
        case 0 =>
          val w = 64 + r.nextInt(512); val h = 64 + r.nextInt(512)
          val body = Array.tabulate[Byte](64 + r.nextInt(512))(fill)
          MediaRow(id, "image", w, h, 0, 1, pngBytes(w, h, body))
        case 1 =>
          val durMs = 1000 + r.nextInt(60000)
          MediaRow(id, "audio", 0, 0, durMs, 0, wavBytes(durMs, fill))
        case _ =>
          val w = 64 + r.nextInt(512); val h = 64 + r.nextInt(512)
          val frames = 1 + r.nextInt(24)
          MediaRow(id, "video", w, h, 0, frames, gifBytes(w, h, frames, fill))
      }
    }
  }

  /** Media corpus memoized to parquet, keyed on (n, seed): synthesis emits
    * hundreds of MB of container bytes, so it runs ONCE per JVM and lands
    * in files; every subsequent reader scans parquet. This keeps timed
    * decode benchmarks measuring read->decode->stats, not generator CPU
    * (round-2 q22 spent 30s of its 30.4s wall synthesizing WAV payloads
    * inside the timed query).
    */
  private val corpusCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def corpus(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    val path = corpusCache.computeIfAbsent(s"$n:$seed", _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_media").toString + "/corpus"
      // media payloads are high-entropy container bytes: snappy can't
      // shrink them and costs decompress CPU on every read — store
      // uncompressed, the same call a real media-blob table makes
      synthesize(spark, n, seed).write.mode("overwrite")
        .option("compression", "uncompressed").parquet(dir)
      dir
    })
    spark.read.parquet(path).as[MediaRow]
  }

  // ---- decoder (the real thing: container-structure parsing) --------------

  final case class Decoded(kind: String, width: Int, height: Int,
      durMs: Int, frames: Int)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def i32be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** magic-number sniff + per-format structural parse. Unknown/corrupt
    * payloads decode to kind="unknown" rather than throwing — at corpus
    * scale a bad blob must be counted, not crash the task.
    */
  def decode(b: Array[Byte]): Decoded = try {
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      // PNG: IHDR is always the first chunk: length at 8, tag at 12, w/h at 16/20
      Decoded("image", i32be(b, 16), i32be(b, 20), 0, 1)
    } else if (b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // WAV: walk RIFF chunks for fmt (byteRate) and data (size). Chunk
      // lengths are attacker-controlled: clamp and force forward progress
      // so a corrupt length can never wedge the task in a loop (the
      // never-crash contract includes never-hang).
      var o = 12; var byteRate = 0; var dataLen = -1L
      while (o + 8 <= b.length && (byteRate == 0 || dataLen < 0)) {
        val tag = new String(b, o, 4, "US-ASCII")
        val len = i32le(b, o + 4).toLong & 0xffffffffL
        // byteRate sits at body offset 8 (o+16), a 4-byte read -> needs
        // o+20 in bounds; a payload truncated INSIDE the fmt chunk must
        // take this structured fallback, not the NonFatal catch-all
        if (tag == "fmt " && o + 20 <= b.length) byteRate = i32le(b, o + 16)
        if (tag == "data") dataLen = len
        val step = 8L + len + (len & 1) // chunks are word-aligned
        o = if (o + step > b.length) b.length else (o + step).toInt
      }
      if (byteRate <= 0 || dataLen < 0) Decoded("unknown", 0, 0, 0, 0)
      else Decoded("audio", 0, 0, (dataLen * 1000L / byteRate).toInt, 0)
    } else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      // GIF: logical screen descriptor, then block walk counting frames
      val w = u16le(b, 6); val h = u16le(b, 8)
      val gctSize = if ((b(10) & 0x80) != 0) 3 * (1 << ((b(10) & 7) + 1)) else 0
      var o = 13 + gctSize
      var frames = 0
      def skipSubBlocks(): Unit = {
        while (o < b.length && b(o) != 0) o += 1 + (b(o) & 0xff)
        o += 1 // terminator
      }
      var done = false
      while (!done && o < b.length) {
        (b(o) & 0xff) match {
          case 0x2c => // image descriptor
            frames += 1
            val lctSize = if (o + 9 < b.length && (b(o + 9) & 0x80) != 0)
              3 * (1 << ((b(o + 9) & 7) + 1)) else 0
            o += 10 + lctSize + 1 // descriptor + LCT + LZW min code size
            skipSubBlocks()
          case 0x21 => o += 2; skipSubBlocks() // extension: introducer+label
          case 0x3b => done = true
          case _ => done = true // corrupt: stop, keep what we parsed
        }
      }
      Decoded("video", w, h, 0, frames)
    } else Decoded("unknown", 0, 0, 0, 0)
  } catch { case scala.util.control.NonFatal(_) => Decoded("unknown", 0, 0, 0, 0) }

  /** feature-extraction pass as NATIVE expressions (decode_media +
    * byte_mean scalar kernels composed with built-ins). Every output
    * column derives from the payload — the synthesis-time metadata
    * columns are deliberately not read.
    *
    * This was a typed mapPartitions (the Pandas-UDF batch shape) through
    * round 6; guide §4's caveat applied in full: the opaque closure
    * deserialized every MediaRow to a Scala object, computed ALL ten
    * features eagerly, and defeated column pruning — a consumer reading
    * only (kind, n_bytes, n_frames_sampled) still paid the byte-mean
    * pass over the whole payload corpus and the object boxing both ways.
    * As expressions, unused feature columns are pruned by the optimizer
    * (q22's aggregate drops byte_mean: the 400 MB/sf0.1 mean pass
    * disappears from the plan) and the surrounding project stays
    * whole-stage-codegen'd. The decode struct is projected ONCE and
    * consumed via field accessors in a separate projection — the alias
    * is referenced multiple times, which blocks CollapseProject from
    * inlining (re-evaluating) the kernel per field.
    */
  def features(media: Dataset[MediaRow], thumbMax: Int = 128, frameEveryMs: Int = 5000): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val withD = media.toDF().select(col("media_id"), col("payload"),
      Bridge.column(MediaDecodeExpr(Bridge.expression(col("payload")))).as("d"))
    val maxDim = greatest(col("d.width"), col("d.height"), lit(1)).cast("double")
    val scale = least(lit(1.0), lit(thumbMax.toDouble) / maxDim)
    withD.select(
      col("media_id"),
      col("d.kind").as("kind"),
      length(col("payload")).cast("int").as("n_bytes"),
      col("d.width").as("width"),
      col("d.height").as("height"),
      col("d.dur_ms").as("dur_ms"),
      Bridge.column(ByteMeanExpr(Bridge.expression(col("payload")))).as("byte_mean"),
      greatest(lit(1), round(col("d.width") * scale).cast("int")).as("thumb_w"),
      greatest(lit(1), round(col("d.height") * scale).cast("int")).as("thumb_h"),
      when(col("d.kind") === "image", lit(1))
        // integer division: dur_ms >= 0, so the double-divide + int cast
        // truncation equals Java int division
        .when(col("d.kind") === "audio",
          lit(1) + (col("d.dur_ms") / lit(frameEveryMs)).cast("int"))
        .otherwise(col("d.frames")) // video: container frames; unknown: 0
        .as("n_frames_sampled"))
      .as[MediaFeatures]
  }

  /** corpus-level stats over the extracted features (one shuffle) */
  def stats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("byte_mean")).as("avg_byte_mean"),
        sum(col("n_frames_sampled")).as("total_frames"))
      .orderBy(col("kind"))
}

/** `decode_media(payload)` — the container-structure parse
  * ([[Multimodal.decode]]) as a native Catalyst Expression returning
  * struct(kind, width, height, dur_ms, frames). Null-safe, total (decode
  * never throws); evaluates via CodegenFallback while the surrounding
  * projections stay whole-stage-codegen'd.
  */
case class MediaDecodeExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = MediaDecodeExpr.schema
  override def prettyName: String = "decode_media"
  override protected def nullSafeEval(input: Any): Any = {
    val d = Multimodal.decode(input.asInstanceOf[Array[Byte]])
    org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(d.kind),
      d.width, d.height, d.durMs, d.frames)
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): MediaDecodeExpr =
    copy(child = c)
}

object MediaDecodeExpr {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("dur_ms", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false)))
}

/** `byte_mean(payload)` — mean of the unsigned byte values (0.0 for an
  * empty payload), as a native Expression so consumers that don't read it
  * never pay the full-payload pass (column pruning removes the column).
  */
case class ByteMeanExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "byte_mean"
  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length == 0) 0.0
    else {
      var sum = 0L
      var i = 0
      while (i < b.length) { sum += b(i) & 0xff; i += 1 }
      sum.toDouble / b.length
    }
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): ByteMeanExpr =
    copy(child = c)
}
