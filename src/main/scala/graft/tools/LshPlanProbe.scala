package graft.tools

import org.apache.spark.sql.functions._

/** scratch: audit the q13/q14/q16/q26 plan shapes — does the expensive
  * signature Expression stay evaluated once per row (or get collapsed
  * into the per-band lambda), and how many live Exchanges does the final
  * adaptive plan have?
  */
object LshPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" tail marker")).as("text"))
    val all = docs.union(perturbed)

    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n======== $name ========")
      val pre = df.queryExecution.executedPlan.toString
      println(s"[pre-exec] minhash occurrences: ${"minhash".r.findAllIn(pre).length}, " +
        s"simhash: ${"simhash64".r.findAllIn(pre).length}, " +
        s"hyperplane: ${"hyperplane_bucket".r.findAllIn(pre).length}")
      val t0 = System.nanoTime()
      df.collect()
      println(f"[exec] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val fin = df.queryExecution.executedPlan.toString
      val ex = "(?m)Exchange ".r.findAllIn(fin).length
      val reused = "ReusedExchange|ReusedQueryStage".r.findAllIn(fin).length
      println(s"[final] exchanges=$ex reused=$reused " +
        s"minhash=${"minhash".r.findAllIn(fin).length} " +
        s"wscg=${"WholeStageCodegen".r.findAllIn(fin).length}")
      // where does minhash appear? print those lines
      fin.linesIterator.filter(l => l.contains("minhash") || l.contains("Exchange") ||
        l.contains("Window")).take(24).foreach(l => println("  " + l.take(200)))
    }

    audit("q13 minhashLsh",
      graft.ops.Dedup.minhashLsh(all, rowsPerBand = 2, threshold = 0.7)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard") * 100).cast("bigint").as("jaccard_pct"))
        .orderBy(col("id_a"), col("id_b")))
    audit("q13 again (warm)",
      graft.ops.Dedup.minhashLsh(all, rowsPerBand = 2, threshold = 0.7)
        .select(col("id_a"), col("id_b")))
    audit("q14 simhashPairs",
      graft.ops.Dedup.simhashPairs(all, maxHamming = 3)
        .select(col("id_a"), col("id_b")))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"embeddings rows: ${emb.count()}, dims: ${emb.selectExpr("size(embedding)").head()}")
    audit("q16 lshTopK",
      graft.ops.Ann.lshTopK(emb, emb.filter(col("vec_id") < 8), k = 5,
        nPlanes = 8, nTables = 6).select(col("query_id"), col("rank"), col("corpus_id")))
    audit("q26 ivfTopK",
      graft.ops.Ann.ivfTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
        .select(col("query_id"), col("rank"), col("corpus_id")))
    spark.stop()
  }
}
