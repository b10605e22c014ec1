package graft.tools

import graft.spark.Transcripts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write `.explain("formatted")` captures for the round-7-touched queries
  * to plans/r07/<query>_<suffix>.txt. For imperative queries (table /
  * streaming lifecycles, whose returned DataFrame is a trivial local
  * relation) the files additionally carry labeled sections for the
  * INTERNAL plans the optimization claims are about (pruned victim
  * lookups, delta scans, state-store partitioning), reproduced through
  * the same public operator APIs on a scratch table.
  *
  * Usage: runMain graft.tools.PlanCapture <outDir> <suffix>
  */
object PlanCapture {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

    def adaptiveSummary(df: DataFrame): String = {
      df.collect()
      val fin = df.queryExecution.executedPlan.toString
      val ex = "(?m)Exchange ".r.findAllIn(fin).length
      val reused = "ReusedExchange|ReusedQueryStage".r.findAllIn(fin).length
      s"[executed adaptive plan: $ex Exchange node occurrences (incl. the " +
        s"embedded initial plan AQE prints), $reused reused exchange/stage]\n"
    }

    def write(name: String, sections: Seq[(String, String)]): Unit = {
      val body = sections.map { case (label, text) =>
        s"==================== $label ====================\n$text"
      }.mkString("\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), body)
      println(s"[plans] wrote ${name}_$suffix.txt")
    }

    // ---- declarative queries: the query's own DataFrame -----------------
    for (name <- Seq("q04_join_4way", "q13_minhash_pairs")) {
      val df = graft.SparkEntry.queries(name)(s, sfDir)
      write(name, Seq(
        s"$name .explain(formatted)" -> fmt(df),
        "post-execution adaptive summary" -> adaptiveSummary(df)))
    }

    // ---- table lifecycle internals --------------------------------------
    {
      val tt = graft.spark.TranscriptTable
      val root = java.nio.file.Files.createTempDirectory("plans_tbl").toString
      val b1 = Transcripts.synthesize(s, 120, seed = 42L).toDF()
      val b2 = Transcripts.synthesize(s, 60, seed = 4501L).toDF()
      tt.write(b1, root, 8, 1L, filesPerBucket = 2, layout = "range")
      appendCompat(tt, b2, root, 2L)
      val victims = tt.read(s, root).select("conv_id").distinct()
        .orderBy("conv_id").limit(3).collect().map(_.getString(0)).toSeq
      val (cands, total) = tt.selectFilesForIds(root, 2L, victims)
      val sections = Seq(
        "q45 victim pick + before-counts source" ->
          fmt(victimsSource(tt, s, root)),
        s"q45 victim time-travel check (manifest pruning: ${cands.size} of " +
          s"$total files are candidates for ${victims.size} victims)" ->
          fmt(victimCheckAt(tt, s, root, 2L, victims)),
        "q45 returned-shape note" ->
          ("the query's returned DataFrame is a 3-row local relation of " +
            "collected counts; the work above is where the time goes\n"))
      write("q45_cow_delete", sections)

      // q43: the delta-window scan — FileScan lists ONLY the delta files
      val rootInc = java.nio.file.Files.createTempDirectory("plans_inc").toString
      tt.write(b1, rootInc, 8, 1L)
      appendCompat(tt, b2, rootInc, 2L)
      write("q43_incremental", Seq(
        "q43 incremental window (1 -> 2) scan" ->
          fmt(tt.incrementalRead(s, rootInc, 1L, 2L)),
        "q43 full read at current snapshot" -> fmt(tt.read(s, rootInc))))

      // q44: the files<->snapshots cross-check aggregation
      write("q44_metadata_tables", Seq(
        "q44 files-table cross-check aggregation (all snapshots, one job)" ->
          fmt(Seq(1L, 2L).map(id => tt.filesTable(s, rootInc, Some(id)))
            .reduce(_.unionByName(_))
            .groupBy(col("snapshot_id"))
            .agg(coalesce(sum(col("row_count")), lit(0L)).as("rows"),
              count(lit(1)).as("files")))))

      // q36: the snapshot stats + drift check inputs
      write("q36_time_travel", Seq(
        "q36 snapshot-1 stats read" ->
          fmt(tt.readAt(s, rootInc, 1L).agg(count(lit(1)),
            sum(when(col("bucket") === 0, 1L).otherwise(0L)))),
        "q36 cross-snapshot drift check (exceptAll)" ->
          fmt(tt.readAt(s, rootInc, 1L).filter(col("bucket") =!= 0)
            .select("conv_id", "turn_idx", "role", "text", "tool")
            .exceptAll(tt.read(s, rootInc).filter(col("bucket") =!= 0)
              .select("conv_id", "turn_idx", "role", "text", "tool")))))
    }

    // ---- streaming: the executed micro-batch plan shows the stateful
    // shuffle's partition count --------------------------------------------
    {
      val tmp = java.nio.file.Files.createTempDirectory("plans_stream").toString
      Transcripts.synthesize(s, 100, seed = 42L).toDF()
        .write.mode("overwrite").parquet(s"$tmp/in")
      def runAndExplain(name: String, mk: DataFrame => DataFrame): Unit = {
        val se = graft.streaming.StreamingExtract
        val q = startCompat(s, tmp, name, mk)
        q.awaitTermination(120000L)
        val buf = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(buf)) { q.explain(extended = false) }
        write(name, Seq(
          s"$name last micro-batch executed plan (state partitioning visible " +
            "in Exchange/StateStore operators)" -> buf.toString))
      }
      runAndExplain("q31_stream_sessions", df =>
        graft.streaming.StreamingExtract.sessionizedStream(
          graft.streaming.StreamingExtract.extractedStream(df)).toDF())
      runAndExplain("q30_stream_dedup", df =>
        graft.streaming.StreamingExtract.dedupedStream(df))
      runAndExplain("q23b_stream_watermark", df =>
        graft.streaming.StreamingExtract.windowedCounts(
          graft.streaming.StreamingExtract.extractedStream(df)))
    }

    // ---- q38/q40: generator-side change only; returned plan for the record
    for (name <- Seq("q38_pdf_lexer", "q29_bucketed_checkpoints")) {
      val df = graft.SparkEntry.queries(name)(s, sfDir)
      write(name, Seq(s"$name returned DataFrame .explain(formatted) " +
        "(imperative query: the change is in untimed-shape/concurrency, " +
        "not this plan)" -> fmt(df)))
    }

    spark.stop()
  }

  // ---- version-compat seams (the before-worktree copy overrides these) --
  private def appendCompat(tt: graft.spark.TranscriptTable.type,
      df: DataFrame, root: String, id: Long): Unit =
    tt.append(df, root, id, filesPerBucket = 1)

  private def victimsSource(tt: graft.spark.TranscriptTable.type,
      s: SparkSession, root: String): DataFrame =
    tt.read(s, root).groupBy(col("conv_id")).agg(count(lit(1)).as("c"))

  private def victimCheckAt(tt: graft.spark.TranscriptTable.type,
      s: SparkSession, root: String, snap: Long, ids: Seq[String]): DataFrame =
    tt.readConvIdsAt(s, root, snap, ids)

  private def startCompat(s: SparkSession, tmp: String, name: String,
      mk: DataFrame => DataFrame): org.apache.spark.sql.streaming.StreamingQuery = {
    val se = graft.streaming.StreamingExtract
    se.withStatePartitions(s, se.statePartitionsFor(s, s"$tmp/in")) {
      se.startParquet(mk(se.readTranscripts(s, s"$tmp/in")),
        s"$tmp/out-$name", s"$tmp/ck-$name")
    }
  }
}
