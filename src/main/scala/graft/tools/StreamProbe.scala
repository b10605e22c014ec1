package graft.tools

import graft.spark.Transcripts

import org.apache.spark.sql.functions._

/** scratch: isolate the stateful-streaming fixed costs — state-store
  * partition count (spark.sql.shuffle.partitions at first checkpoint) and
  * input file count — on the q30/q31/q23b shapes. Guide §2: partitioning
  * must be scale-adaptive, and AQE cannot coalesce stateful streaming
  * shuffles, so the knob has to be explicit.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[stream] $name%-52s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val transcripts = Transcripts.synthesize(s, 100, seed = 42L).toDF()
    val base = java.nio.file.Files.createTempDirectory("probe_stream").toString
    transcripts.write.mode("overwrite").parquet(s"$base/in32")
    transcripts.coalesce(4).write.mode("overwrite").parquet(s"$base/in4")

    def runSession(name: String, in: String, parts: String, stateful: Boolean): Unit = {
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val tag = s"$name-p$parts"
        val src = graft.streaming.StreamingExtract.readTranscripts(s, in)
        val df =
          if (stateful)
            graft.streaming.StreamingExtract.sessionizedStream(
              graft.streaming.StreamingExtract.extractedStream(src)).toDF()
          else graft.streaming.StreamingExtract.extractedStream(src)
        timed(tag) {
          val q = graft.streaming.StreamingExtract.startParquet(
            df, s"$base/out-$tag", s"$base/ck-$tag")
          q.awaitTermination(120000L)
        }
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }

    // warm both code paths once so the comparison is JIT-fair
    runSession("warm-stateless", s"$base/in32", "32", stateful = false)
    runSession("warm-stateful", s"$base/in32", "32", stateful = true)

    runSession("stateful-in32", s"$base/in32", "32", stateful = true)
    runSession("stateful-in32", s"$base/in32", "8", stateful = true)
    runSession("stateful-in32", s"$base/in32", "4", stateful = true)
    runSession("stateful-in4", s"$base/in4", "4", stateful = true)
    runSession("stateless-in32", s"$base/in32", "32", stateful = false)
    runSession("stateless-in4", s"$base/in4", "32", stateful = false)

    // dedup shape (q30)
    def runDedup(parts: String): Unit = {
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", parts)
      try timed(s"dedup-p$parts") {
        val q = graft.streaming.StreamingExtract.startParquet(
          graft.streaming.StreamingExtract.dedupedStream(
            graft.streaming.StreamingExtract.readTranscripts(s, s"$base/in32")),
          s"$base/out-dd$parts", s"$base/ck-dd$parts")
        q.awaitTermination(120000L)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }
    runDedup("32"); runDedup("32"); runDedup("8"); runDedup("4")

    // windowed agg shape (q23b)
    def runWin(parts: String): Unit = {
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", parts)
      try timed(s"window-p$parts") {
        val q = graft.streaming.StreamingExtract.startParquet(
          graft.streaming.StreamingExtract.windowedCounts(
            graft.streaming.StreamingExtract.extractedStream(
              graft.streaming.StreamingExtract.readTranscripts(s, s"$base/in32"))),
          s"$base/out-w$parts", s"$base/ck-w$parts")
        q.awaitTermination(120000L)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }
    runWin("32"); runWin("32"); runWin("8"); runWin("4")

    spark.stop()
  }
}
