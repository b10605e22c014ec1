package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` payloads with typed metadata, processed batch-wise per
  * partition (the Scala analogue of mapInPandas: one iterator pass per
  * partition, no per-row UDF dispatch).
  *
  * The actual codecs (image/audio decode) are STUBBED with a deterministic
  * fake — this container ships no media libraries — but the Spark-side
  * contract is real and tested: schemas, batch iteration shape,
  * partitioning, and the derived-feature columns. Swapping the stub for a
  * real decoder changes only the marked functions.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, width: Int,
      height: Int, dur_ms: Int, payload: Array[Byte])

  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Int, byte_mean: Double, byte_entropy_q: Int,
      thumb_w: Int, thumb_h: Int, n_frames_sampled: Int)

  /** deterministic fake corpus: payload bytes derived from media_id */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { id =>
      val r = new java.util.SplittableRandom(seed ^ id)
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val len = 256 + r.nextInt(1024)
      val payload = new Array[Byte](len)
      var i = 0
      while (i < len) { payload(i) = (r.nextInt(256) - 128).toByte; i += 1 }
      MediaRow(id, kind, 64 + r.nextInt(512), 64 + r.nextInt(512),
        if (kind == "image") 0 else 1000 + r.nextInt(60000), payload)
    }
  }

  /** STUB decode: a real implementation would parse the container format;
    * the fake derives stable pseudo-features from the bytes so the
    * pipeline stays deterministic and testable end-to-end.
    */
  private def decodeStub(payload: Array[Byte]): (Double, Int) = {
    var sum = 0L
    val hist = new Array[Int](16)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      hist(b >> 4) += 1
      i += 1
    }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    // quantized entropy proxy: number of non-empty 16-bucket histogram cells
    val ent = hist.count(_ > 0)
    (mean, ent)
  }

  /** feature-extraction pass: one partition = one batch (mapPartitions),
    * mirroring the batch shape a Pandas-UDF/Arrow pipeline would use.
    */
  def features(media: Dataset[MediaRow], thumbMax: Int = 128, frameEveryMs: Int = 5000): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (mean, ent) = decodeStub(m.payload) // <-- swap for a real decoder
        val scale = math.min(1.0, thumbMax.toDouble / math.max(m.width, m.height))
        val tw = math.max(1, math.round(m.width * scale).toInt)
        val th = math.max(1, math.round(m.height * scale).toInt)
        val frames = if (m.kind == "image") 1 else 1 + m.dur_ms / frameEveryMs
        MediaFeatures(m.media_id, m.kind, m.payload.length, mean, ent, tw, th, frames)
      }
    }
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
