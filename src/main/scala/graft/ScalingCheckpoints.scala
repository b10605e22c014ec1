package graft

import graft.spark.{Pipeline, TranscriptTable, Transcripts}

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Checkpoint-path overhead at a REAL partition count (VERDICT r2 #7):
  * run extractWithCheckpoints over a 128-bucket x 4-files-per-bucket
  * table and compare against the identical extraction+write done as ONE
  * Spark job, so the per-bucket driver-loop overhead (job scheduling,
  * manifest commit, observe collection) is measured rather than assumed.
  * Also times the resume no-op (all manifests committed).
  *
  * Usage: runMain graft.ScalingCheckpoints [nConvs] [nBuckets]
  * Prints one JSON line.
  */
object ScalingCheckpoints {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 20000L
    val nBuckets = if (args.length > 1) args(1).toInt else 128
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ckpt-scaling")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft_ckpt_scale").toString
    TranscriptTable.write(
      Transcripts.synthesize(spark, nConvs, seed = 42L, parallelism = cpus.toInt * 4).toDF(),
      s"$root/table", nBuckets, snapshotId = 1L)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // single-job comparator: same read, same extraction, same derived
    // columns, same bucket=<b> output layout — but one Spark job
    val (_, singleSecs) = timed {
      val in = TranscriptTable.read(spark, s"$root/table")
        .filter(col("tool").isin("pdftohtml", "shakespeare"))
      in.select(col("conv_id"), col("turn_idx"), col("bucket"),
          graft.spark.ExtractTurn(col("text")).as("ex"))
        .withColumn("n_lines", size(col("ex.lines")))
        .withColumn("bytes", col("ex.bytes"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("bucket")
        .parquet(s"$root/single/data")
    }

    val (c1, ckptSecs) = timed(
      TranscriptTable.extractWithCheckpoints(spark, s"$root/table", s"$root/ckpt", nBuckets))
    val (c2, resumeSecs) = timed(
      TranscriptTable.extractWithCheckpoints(spark, s"$root/table", s"$root/ckpt", nBuckets))
    require(c1 == c2, s"resume must be a no-op: $c1 vs $c2")

    // concurrent bucket jobs: same manifests, overlapped job overhead
    val (c3, ckpt8Secs) = timed(
      TranscriptTable.extractWithCheckpoints(spark, s"$root/table", s"$root/ckpt8",
        nBuckets, maxConcurrent = 8))
    require(c3 == c1, s"concurrent run must match serial counters: $c3 vs $c1")

    val perBucket = (ckptSecs - singleSecs) / nBuckets
    println(
      f"""{"n_convs":$nConvs,"n_buckets":$nBuckets,"turns":${c1.turns},""" +
        f""""single_job_secs":$singleSecs%.2f,"checkpointed_secs":$ckptSecs%.2f,""" +
        f""""checkpointed_concurrent8_secs":$ckpt8Secs%.2f,""" +
        f""""overhead_per_bucket_secs":$perBucket%.3f,"resume_noop_secs":$resumeSecs%.3f}""")
    spark.stop()
  }
}
