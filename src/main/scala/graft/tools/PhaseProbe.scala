package graft.tools

import graft.spark.Transcripts

import org.apache.spark.sql.functions._

/** scratch: decompose the slow sweep queries into their sub-phases
  * (generator, table writes, metadata ops, streaming machinery) and time
  * each with the exact Bench session — guide §1 "measure first". Output
  * feeds OPTIMIZATION_r07.md; numbers here are diagnostic only (the
  * authoritative per-query seconds stay in graft.Bench).
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[phase] $name%-46s $secs%7.3f s  ($r)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = df.count()

    // ---- generator costs (these run INSIDE the timed queries) ----------
    timed("synthesize(1000).count  [q17/q18 family]") {
      noop(Transcripts.synthesize(s, 1000, seed = 42L).toDF()) }
    timed("synthesize(1000).count  again (warm)") {
      noop(Transcripts.synthesize(s, 1000, seed = 42L).toDF()) }
    timed("goldens(1000).count") {
      noop(Transcripts.goldens(s, 1000, seed = 42L).toDF()) }
    timed("synthesize(150).count   [q43 b1]") {
      noop(Transcripts.synthesize(s, 150, seed = 42L).toDF()) }
    timed("synthesize(120).count   [q44/q45 b1]") {
      noop(Transcripts.synthesize(s, 120, seed = 42L).toDF()) }
    timed("synthesizePdf(150) classic .count [q38]") {
      noop(Transcripts.synthesizePdf(s, 150, modern = false).toDF()) }
    timed("pdfGoldens(150).count   [q38+q40 each]") {
      noop(Transcripts.pdfGoldens(s, 150).toDF()) }
    timed("synthesizeCross(200).count [q35]") {
      noop(Transcripts.synthesizeCross(s, 200).toDF()) }
    timed("crossGoldens(200).count [q35]") {
      noop(Transcripts.crossGoldens(s, 200).toDF()) }

    // ---- q45 decomposition ---------------------------------------------
    {
      val tt = graft.spark.TranscriptTable
      val root = java.nio.file.Files.createTempDirectory("probe_q45").toString
      var b1: org.apache.spark.sql.DataFrame = null
      var b2: org.apache.spark.sql.DataFrame = null
      timed("q45: plan b1/b2 (lazy)") {
        b1 = Transcripts.synthesize(s, 120, seed = 42L).toDF()
        b2 = Transcripts.synthesize(s, 60, seed = 4501L).toDF()
      }
      timed("q45: tt.write(b1, fpb=2, range)") {
        tt.write(b1, root, 8, snapshotId = 1L, filesPerBucket = 2, layout = "range") }
      timed("q45: tt.append(b2)") { tt.append(b2, root, newSnapshotId = 2L) }
      var victims: Seq[String] = null
      timed("q45: victims distinct+limit3 collect") {
        victims = tt.read(s, root).select("conv_id").distinct()
          .orderBy("conv_id").limit(3).collect().map(_.getString(0)).toSeq
      }
      timed("q45: before cnt (count+countDistinct)") {
        tt.read(s, root).agg(count(lit(1)), countDistinct(col("conv_id"))).head() }
      timed("q45: deleteConvIds") { tt.deleteConvIds(s, root, victims, newSnapshotId = 3L) }
      timed("q45: after cnt") {
        tt.read(s, root).agg(count(lit(1)), countDistinct(col("conv_id"))).head() }
      timed("q45: readAt(2) victims count") {
        tt.readAt(s, root, 2L).filter(col("conv_id").isin(victims: _*)).count() }
      timed("q45: read victims count==0") {
        tt.read(s, root).filter(col("conv_id").isin(victims: _*)).count() }
      timed("q45: incrementalRead refuse (Try)") {
        scala.util.Try(tt.incrementalRead(s, root, 2L, 3L)).isFailure }
      timed("q45: no-match delete refuse (Try)") {
        scala.util.Try(tt.deleteConvIds(s, root, Seq("no-such-conv"), 4L)).isFailure }
    }

    // ---- q44 decomposition ---------------------------------------------
    {
      val tt = graft.spark.TranscriptTable
      val root = java.nio.file.Files.createTempDirectory("probe_q44").toString
      val b1 = Transcripts.synthesize(s, 120, seed = 42L).toDF()
      val b2 = Transcripts.synthesize(s, 60, seed = 4401L).toDF()
      val b3 = Transcripts.synthesize(s, 30, seed = 4402L).toDF()
      timed("q44: write(b1, fpb=2)") { tt.write(b1, root, 8, 1L, filesPerBucket = 2) }
      timed("q44: append(b2)") { tt.append(b2, root, 2L) }
      timed("q44: append(b3)") { tt.append(b3, root, 3L) }
      timed("q44: compact(fpb=1)") { tt.compact(s, root, 4L, filesPerBucket = 1) }
      timed("q44: snapshotsTable collect") { tt.snapshotsTable(s, root).collect().length }
      timed("q44: 4x filesTable agg") {
        (1L to 4L).map(id => tt.filesTable(s, root, Some(id))
          .agg(coalesce(sum(col("row_count")), lit(0L)), count(lit(1))).head()).size }
      timed("q44: historyTable collect") { tt.historyTable(s, root).collect().length }
      timed("q44: expire + residual checks") {
        tt.expireSnapshots(root, keep = Set(3L, 4L))
        tt.snapshotIds(root).size + tt.historyTable(s, root).count() +
          tt.snapshotsTable(s, root).count()
      }
    }

    // ---- q36 decomposition ---------------------------------------------
    {
      val tt = graft.spark.TranscriptTable
      val root = java.nio.file.Files.createTempDirectory("probe_q36").toString
      val transcripts = Transcripts.synthesize(s, 200, seed = 42L).toDF()
      timed("q36: write(200 convs)") { tt.write(transcripts, root, 8, 1L) }
      val b0 = transcripts.withColumn("b", tt.bucketCol(8)).filter(col("b") === 0).drop("b")
      timed("q36: overwriteBucket(b0 x2)") {
        tt.overwriteBucket(b0.unionByName(b0), root, bucket = 0, newSnapshotId = 2L) }
      def stats(df: org.apache.spark.sql.DataFrame) = df
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("bucket") === 0, 1L).otherwise(0L)).as("n_bucket0")).head()
      timed("q36: stats(readAt 1)") { stats(tt.readAt(s, root, 1L)) }
      timed("q36: stats(read)") { stats(tt.read(s, root)) }
      val cols = Seq("conv_id", "turn_idx", "role", "text", "tool")
      timed("q36: exceptAll othersDiff count") {
        tt.readAt(s, root, 1L).filter(col("bucket") =!= 0).select(cols.map(col): _*)
          .exceptAll(tt.read(s, root).filter(col("bucket") =!= 0).select(cols.map(col): _*))
          .count()
      }
      timed("q36: compact") { tt.compact(s, root, 3L, filesPerBucket = 1) }
      timed("q36: stats(read) post-compact") { stats(tt.read(s, root)) }
      timed("q36: expire + post checks") {
        tt.expireSnapshots(root, keep = Set(3L))
        stats(tt.read(s, root))
        scala.util.Try(tt.readAt(s, root, 1L)).isFailure &&
          scala.util.Try(tt.readAt(s, root, 2L)).isFailure
      }
    }

    // ---- q29 decomposition ---------------------------------------------
    {
      val tt = graft.spark.TranscriptTable
      val tmp = java.nio.file.Files.createTempDirectory("probe_q29").toString
      val transcripts = Transcripts.synthesize(s, 1000, seed = 42L).toDF()
      timed("q29: write(1000 convs, 16 buckets)") {
        tt.write(transcripts, s"$tmp/table", 16, snapshotId = 1L) }
      timed("q29: extractWithCheckpoints run 1") {
        tt.extractWithCheckpoints(s, s"$tmp/table", s"$tmp/out", 16, maxConcurrent = 4) }
      timed("q29: extractWithCheckpoints run 2 (no-op)") {
        tt.extractWithCheckpoints(s, s"$tmp/table", s"$tmp/out", 16, maxConcurrent = 4) }
      timed("q29: final groupBy read") {
        s.read.parquet(s"$tmp/out/data").groupBy(col("bucket")).count().collect().length }
    }

    // ---- q23 streaming decomposition ------------------------------------
    {
      val tmp = java.nio.file.Files.createTempDirectory("probe_q23").toString
      val transcripts = Transcripts.synthesize(s, 100, seed = 42L).toDF()
      timed("q23: input write parquet") {
        transcripts.write.mode("overwrite").parquet(s"$tmp/in") }
      timed("q23: stream extract run (AvailableNow)") {
        val q = graft.streaming.StreamingExtract.startParquet(
          graft.streaming.StreamingExtract.extractedStream(
            graft.streaming.StreamingExtract.readTranscripts(s, s"$tmp/in")),
          s"$tmp/out", s"$tmp/ck")
        q.awaitTermination(120000L)
      }
      timed("q23: read-back agg") {
        s.read.parquet(s"$tmp/out").groupBy(col("format")).count().collect().length }
    }

    // ---- q31 stateful streaming ------------------------------------------
    {
      val tmp = java.nio.file.Files.createTempDirectory("probe_q31").toString
      val transcripts = Transcripts.synthesize(s, 100, seed = 42L).toDF()
      transcripts.write.mode("overwrite").parquet(s"$tmp/in")
      timed("q31: sessionized stream run") {
        val q = graft.streaming.StreamingExtract.startParquet(
          graft.streaming.StreamingExtract.sessionizedStream(
            graft.streaming.StreamingExtract.extractedStream(
              graft.streaming.StreamingExtract.readTranscripts(s, s"$tmp/in"))).toDF(),
          s"$tmp/out", s"$tmp/ck")
        q.awaitTermination(120000L)
      }
    }

    // ---- q13 decomposition ----------------------------------------------
    {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" tail marker")).as("text"))
      val all = docs.union(perturbed)
      timed("q13: minhash signatures only (noop)") {
        all.select(graft.ops.TextOps.minhash(col("text"), 3, 64).as("sig"))
          .write.format("noop").mode("overwrite").save()
      }
      timed("q13: full minhashLsh pipeline") {
        graft.ops.Dedup.minhashLsh(all, rowsPerBand = 2, threshold = 0.7).count() }
      timed("q13: full minhashLsh again (warm)") {
        graft.ops.Dedup.minhashLsh(all, rowsPerBand = 2, threshold = 0.7).count() }
      timed("q14: simhashPairs") {
        graft.ops.Dedup.simhashPairs(all, maxHamming = 3).count() }
    }

    spark.stop()
  }
}
