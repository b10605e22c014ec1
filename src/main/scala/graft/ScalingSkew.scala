package graft

import graft.spark.{Pipeline, TranscriptTable, Transcripts}

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-stress wall-time evidence (BENCH/BASELINE.md): the SAME rows —
  * a corpus whose bucket-0 conversations carry 50x the turns
  * (Transcripts.skewedTurnsFor) — extracted from three layouts:
  *
  *   skewed_salted:   conv_id-bucketed table, 4 salted files per bucket
  *                    (the production layout; bucket 0 holds most bytes)
  *   skewed_unsalted: conv_id-bucketed, ONE file per bucket (the naive
  *                    layout the salting defends against)
  *   uniform:         evenly repartitioned plain parquet (no bucket skew
  *                    at all — the flat-wall reference point)
  *
  * Equal total turns by construction (identical rows), so the wall-time
  * ratio isolates exactly the layout variable. The design claim being
  * evidenced: CPU-sized splits (maxPartitionBytes=4m) + per-turn
  * parallelism + salted bucket files make the skewed layout extract at
  * the uniform layout's wall, i.e. no straggler task pins the job to one
  * bucket's length.
  */
object ScalingSkew {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toLong else 2000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val nBuckets = 8

    val calibBefore = Bench.calibBurn(cpus.toInt)

    // materialize the skewed corpus once; all three layouts share rows
    val df = Transcripts.synthesizeSkewed(spark, nConvs, seed = 42L,
      nBuckets = nBuckets, parallelism = cpus.toInt * 4).toDF()
    TranscriptTable.write(df, s"$root/salted", nBuckets, snapshotId = 1L,
      filesPerBucket = 4)
    TranscriptTable.write(df, s"$root/unsalted", nBuckets, snapshotId = 1L,
      filesPerBucket = 1)
    df.repartition(cpus.toInt * 4).write.mode(SaveMode.Overwrite)
      .parquet(s"$root/uniform")

    def extractAll(read: => org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val row = Pipeline.extracted(read)
        .agg(count(lit(1)).as("turns"),
          coalesce(sum(size(col("ex.lines"))), lit(0L)).as("lines")).head()
      (row.getLong(0), row.getLong(1), (System.nanoTime() - t0) / 1e9)
    }
    def measure(label: String, read: => org.apache.spark.sql.DataFrame): (String, Long, Double, Seq[Double]) = {
      // warm until stable (two consecutive runs within 20%, bounded at
      // 6) — the fixed-two-warm-up protocol let late JIT land in timed
      // runs (the BENCH_r04 lesson); the warm trajectory is emitted so
      // the artifact self-diagnoses an unsettled window
      val warm = scala.collection.mutable.ArrayBuffer.empty[Double]
      var stable = false
      while (!stable && warm.length < 6) {
        warm += extractAll(read)._3
        stable = warm.length >= 2 &&
          math.abs(warm(warm.length - 2) - warm.last) /
            math.min(warm(warm.length - 2), warm.last) <= 0.20
      }
      val runs = (0 until 3).map(_ => extractAll(read))
      require(runs.map(_._1).distinct.size == 1, s"$label: inconsistent counts")
      val best = runs.map(_._3).min
      (label, runs.head._1, best, warm.toSeq)
    }

    val salted = measure("skewed_salted", TranscriptTable.read(spark, s"$root/salted"))
    val unsalted = measure("skewed_unsalted", TranscriptTable.read(spark, s"$root/unsalted"))
    val uniform = measure("uniform", spark.read.parquet(s"$root/uniform"))
    val calibAfter = Bench.calibBurn(cpus.toInt)

    // skew proof: bucket 0 must dominate the bucketed layouts
    val perBucket = TranscriptTable.read(spark, s"$root/salted")
      .groupBy("bucket").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b0Share = perBucket.getOrElse(0, 0L).toDouble / perBucket.values.sum

    val j = new StringBuilder
    j ++= "{\"n_convs\":" ++= nConvs.toString
    j ++= ",\"turns\":" ++= salted._2.toString
    j ++= ",\"bucket0_row_share\":" ++= f"$b0Share%.3f"
    Seq(salted, unsalted, uniform).foreach { case (label, turns, secs, warm) =>
      j ++= s""","$label":{"seconds":""" ++= f"$secs%.3f"
      j ++= ",\"turns_per_sec\":" ++= f"${turns / secs}%.1f"
      j ++= ",\"warm_secs\":" ++= warm.map(w => f"$w%.3f").mkString("[", ",", "]") ++= "}"
    }
    j ++= ",\"salted_vs_uniform\":" ++= f"${salted._3 / uniform._3}%.3f"
    j ++= ",\"unsalted_vs_uniform\":" ++= f"${unsalted._3 / uniform._3}%.3f"
    j ++= ",\"calib_before_miters_s\":" ++= f"$calibBefore%.1f"
    j ++= ",\"calib_after_miters_s\":" ++= f"$calibAfter%.1f"
    j ++= ",\"cpus\":" ++= cpus ++= "}"
    println(j.toString)
    spark.stop()
  }
}
