package graft

import graft.spark.{Pipeline, TranscriptTable, Transcripts}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry points for the N-vs-4N scaling evidence
  * (BENCH/run_scaling.sh drives these through real spark-submit with
  * local-cluster masters, i.e. separate executor JVMs).
  *
  *   ScalingPrep <tableRoot> <nConvs>   — materialize the bucketed table
  *   ScalingRun  <tableRoot> <label>    — warm + best-of-2 measured runs,
  *                                        prints one JSON line
  */
object ScalingPrep {
  def main(args: Array[String]): Unit = {
    val Array(tableRoot, nConvs) = args.take(2)
    val spark = SparkSession.builder().appName("graft-scaling-prep").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism * 4
    TranscriptTable.write(
      Transcripts.synthesize(spark, nConvs.toLong, seed = 42L, parallelism = par).toDF(),
      tableRoot, nBuckets = 128, snapshotId = 1L)
    println(s"""{"prep":"done","n_convs":$nConvs}""")
    spark.stop()
  }
}

object ScalingRun {
  def main(args: Array[String]): Unit = {
    val tableRoot = args(0)
    val label = if (args.length > 1) args(1) else "run"
    val spark = SparkSession.builder().appName(s"graft-scaling-$label").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val in = TranscriptTable.read(spark, tableRoot)
      val row = Pipeline.extracted(in)
        .agg(count(lit(1)).as("turns"),
          coalesce(sum(size(col("ex.lines"))), lit(0L)).as("lines")).head()
      ((row.getLong(0), row.getLong(1), (System.nanoTime() - t0) / 1e9))
    }
    // two warm-ups: fresh executor JVMs need 2 passes of kernel JIT; then
    // best-of-2 timed. Cross-invocation host wander is handled one level
    // up (run_scaling.sh alternates N/4N pairs and takes medians).
    val warm = run()
    val warm2 = run()
    val a = run()
    val b = run()
    val best = Seq(a, b).minBy(_._3)
    require(warm._1 == best._1 && warm2._1 == best._1 && a._1 == b._1,
      "inconsistent row counts")
    val thr = best._1 / best._3
    val all = Seq(warm, warm2, a, b).map(r => f"${r._3}%.2f").mkString("[", ",", "]")
    println(f"""{"label":"$label","turns":${best._1},"lines":${best._2},"seconds":${best._3}%.3f,"turns_per_sec":$thr%.1f,"all_run_secs":$all}""")
    spark.stop()
  }
}
