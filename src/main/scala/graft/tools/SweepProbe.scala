package graft.tools

import graft.SparkEntry

/** scratch: time a subset of sweep queries in a fresh JVM (window
  * adjudication — are slow late-sweep times the window or the code?)
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prewarm(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q23b_stream_watermark", "q29_bucketed_checkpoints",
        "q30_stream_dedup", "q31_stream_sessions", "q37_skew_stress")
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"$n%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
