package graft

import graft.ops.{Ann, Dedup, TextOps}
import graft.spark.{Pipeline, Transcripts}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one query per implemented operator family
  * (SURVEY.md §2), each with an equivalent DuckDB oracle where the
  * semantics are ANSI-SQL-expressible. Column names and row ordering are
  * aligned exactly between the Spark plan and the oracle SQL.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** transcripts scale keyed off the sf directory (deterministic, no I/O) */
  private def nConvsFor(dir: String): Long =
    if (dir.contains("0.1")) 1000L else if (dir.contains("0.01")) 200L else 40L

  /** Flagship query on sf=0.001: full extraction of a synthetic transcript
    * corpus to typed lines. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val transcripts = Transcripts.synthesize(spark, 20, seed = 42L).toDF()
    Pipeline.lines(Pipeline.extracted(transcripts))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational operator families over the sf tables -----------------
    "q01_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q02_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
          col("l_discount") > 0.05)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).cast("bigint").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),
    "q03_join_broadcast" -> ((s, dir) => {
      t(s, dir, "orders").join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), min(col("o_orderkey")).as("min_ok"))
        .orderBy(col("c_mktsegment"))
    }),
    "q04_join_4way" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("bigint").as("sum_qty"))
        .orderBy(col("r_name"), col("n_name"))
    }),
    "q05_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .withColumn("running_n", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("rn"), col("running_n"))
        .orderBy(col("event_id"))
    }),
    "q06_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new", when(
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 3600, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg((sum(col("is_new")) + 1).cast("bigint").as("n_sessions"))
        .orderBy(col("user_id"))
    }),
    "q07_topk_parts" -> ((s, dir) => {
      t(s, dir, "part")
        .orderBy(desc("p_retailprice"), asc("p_partkey"))
        .limit(10)
        .select(col("p_partkey"), col("p_name"))
    }),
    "q08_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy(col("l_returnflag"))
    }),
    "q21_json_props" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sum_k"))
        .orderBy(col("event_type"))
    }),

    // ---- training-data pipeline ops over documents/embeddings ------------
    "q09_dedup_exact" -> ((s, dir) => Dedup.exact(t(s, dir, "documents"))),
    "q10_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("bigint").as("n_chars2"),
          size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),
    "q11_quality" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("bigint").as("n_chars2"),
          size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tokens"),
          (length(col("text")) - length(regexp_replace(col("text"), " the ", ""))).cast("bigint").as("stop_len"),
          length(regexp_replace(col("text"), "[^aeiou]", "")).cast("bigint").as("n_vowels"))
        .orderBy(col("doc_id"))
    }),
    "q20_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
        .orderBy(col("doc_id"))
    }),
    "q12_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"),
          col("lang").as("lang_label"))
        .orderBy(col("doc_id"))
    }),
    "q13_minhash_pairs" -> ((s, dir) => {
      // corpus + perturbed copies => guaranteed near-dup pairs to find
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" tail marker")).as("text"))
      Dedup.minhashLsh(docs.union(perturbed), threshold = 0.7)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard") * 100).cast("bigint").as("jaccard_pct"))
    }),
    "q14_simhash_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" x")).as("text"))
      Dedup.simhashPairs(docs.union(perturbed), maxHamming = 3)
    }),
    "q15_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Ann.bruteTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
        .select(col("query_id"), col("rank"), col("corpus_id"))
    }),
    "q16_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Ann.lshTopK(emb, emb.filter(col("vec_id") < 8), k = 5,
        nPlanes = 8, nTables = 6)
        .select(col("query_id"), col("rank"), col("corpus_id"))
    }),
    "q26_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Ann.ivfTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
        .select(col("query_id"), col("rank"), col("corpus_id"))
    }),
    "q25_regex_tokens" -> ((s, dir) => {
      // BPE-ish subword tokenization: words / numbers / single punct
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("bigint").as("n_regex_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ---- the extraction engine itself (no SQL oracle: the oracle is the
    // goldens join executed inside the query; result must be all-ok) ------
    "q17_extract_lines" -> ((s, dir) => {
      val transcripts = Transcripts.synthesize(s, nConvsFor(dir), seed = 42L).toDF()
      Pipeline.lines(Pipeline.extracted(transcripts))
        .groupBy(col("type"))
        .agg(count(lit(1)).as("n_lines"))
        .orderBy(col("type"))
    }),
    "q18_extract_verify" -> ((s, dir) => {
      val n = nConvsFor(dir)
      val transcripts = Transcripts.synthesize(s, n, seed = 42L).toDF()
      val goldens = Transcripts.goldens(s, n, seed = 42L).toDF()
      val verified = Pipeline.verify(
        Pipeline.lines(Pipeline.extracted(transcripts)), goldens)
      Pipeline.turnVerdicts(verified)
        .agg(count(lit(1)).as("n_turns"),
          sum(col("turn_ok")).cast("bigint").as("n_turns_ok"))
    }),
    "q19_char_rank" -> ((s, dir) => {
      val transcripts = Transcripts.synthesize(s, nConvsFor(dir), seed = 42L).toDF()
      val lines = Pipeline.lines(Pipeline.extracted(transcripts))
      Pipeline.characterCounts(Pipeline.dialog(lines)).limit(20)
    }),
    "q22_multimodal_stats" -> ((s, dir) => {
      val n = nConvsFor(dir) * 5
      graft.ops.Multimodal.stats(
        graft.ops.Multimodal.features(graft.ops.Multimodal.synthesize(s, n)))
        .select(col("kind"), col("n"), col("total_bytes"), col("total_frames"))
    }),
    "q24_speakers_split" -> ((s, dir) => {
      // A6 with reference-faithful multi-speaker heading splitting
      val transcripts = Transcripts.synthesize(s, nConvsFor(dir), seed = 42L).toDF()
      Pipeline.speakerCounts(Pipeline.lines(Pipeline.extracted(transcripts))).limit(20)
    }),
    "q23_stream_windows" -> ((s, dir) => {
      // incremental extraction over a file stream, AvailableNow-triggered
      val tmp = java.nio.file.Files.createTempDirectory("graft_q23").toString
      Transcripts.synthesize(s, math.min(nConvsFor(dir), 100L), seed = 42L).toDF()
        .write.mode("overwrite").parquet(tmp)
      val q = graft.streaming.StreamingExtract.startMemory(
        graft.streaming.StreamingExtract.extractedStream(
          graft.streaming.StreamingExtract.readTranscripts(s, tmp)),
        "q23_out")
      q.awaitTermination(120000)
      s.sql("SELECT format, COUNT(*) AS n_turns, SUM(n_lines) AS n_lines FROM q23_out GROUP BY format ORDER BY format")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        | COUNT(*) AS n_rows, MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok
        | FROM lineitem GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", ""),
    "q02_filter_pushdown" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        | FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05
        | GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", ""),
    "q03_join_broadcast" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders, MIN(o_orderkey) AS min_ok
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin.replace("\n", ""),
    "q04_join_4way" ->
      """SELECT r_name, n_name, COUNT(*) AS n_items, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin.replace("\n", ""),
    "q05_window_running" ->
      """SELECT event_id, user_id,
        | ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        | COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
        | FROM events ORDER BY event_id""".stripMargin.replace("\n", ""),
    "q06_sessionize" ->
      """WITH g AS (SELECT user_id, ts, event_id,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events)
        | SELECT user_id, CAST(1 + SUM(CASE WHEN date_diff('second', prev_ts, ts) > 3600
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        | FROM g GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", ""),
    "q07_topk_parts" ->
      "SELECT p_partkey, p_name FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10",
    "q08_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        | COUNT(DISTINCT l_partkey) AS n_part
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", ""),
    "q21_json_props" ->
      """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", ""),
    "q09_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        | FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin.replace("\n", ""),
    "q10_tokens" ->
      """SELECT doc_id, length(text) AS n_chars2,
        | len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", ""),
    "q11_quality" ->
      """SELECT doc_id, length(text) AS n_chars2,
        | len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        | length(text) - length(replace(text, ' the ', '')) AS stop_len,
        | length(regexp_replace(text, '[^aeiou]', '', 'g')) AS n_vowels
        | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", ""),
    "q20_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", ""),
    "q25_regex_tokens" ->
      """SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        | AS n_regex_tokens FROM documents ORDER BY doc_id""".stripMargin.replace("\n", "")
  )
}
