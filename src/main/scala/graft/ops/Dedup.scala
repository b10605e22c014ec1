package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus curation at scale. Each returns a
  * DataFrame; shuffle behavior noted per op (the thing that matters at
  * 100 TB).
  */
object Dedup {

  /** Hot-bucket guard for banded LSH self-joins. Real corpora are
    * duplicate-heavy: every copy of a common document shares every band,
    * so one bucket key can hold 10^6 ids and the self-join would emit
    * ~10^12 pairs from that bucket alone. Buckets over `cap` are dropped
    * before the join (exact dedup, which runs first in any sane pipeline,
    * owns identical content; LSH owns the near-dup tail). The dropped
    * keys are returned so callers can count/log them — a silent cap would
    * read as full coverage; the public ops below accept a `hotBucketSink`
    * to surface it.
    *
    * Sizing note: the number of distinct buckets bounds coverage — e.g.
    * hyperplane LSH with nPlanes=P has only 2^P buckets per table, so cap
    * x 2^P must exceed the corpus size or EVERY bucket is hot and the op
    * degenerates to empty output. Scale nPlanes/band count with the
    * corpus (buckets >= corpus/cap), and watch the sink.
    *
    * Cost: ONE shuffle of the banded frame on the bucket key, full stop.
    * The per-key count is a window aggregate over that shuffle (count
    * over the whole partition frame — no separate count aggregation, no
    * anti-join), and `kept` is a filter on the counted frame, so the
    * caller's downstream self-join legs are two instances of the SAME
    * subplan over the same exchange: AQE/ReuseExchange evaluates the
    * expensive upstream (signature computation) exactly once (verified
    * in BENCH/PLANS.md). Earlier shapes (count-agg + anti-join) looked
    * equivalent but the optimizer rewrote the two consumers differently,
    * defeating exchange reuse and recomputing signatures 2-4x. Hot
    * groups buffer in the window operator's spillable sorter — bounded
    * by the skew already present in the data, never an OOM.
    *
    * Dropping is never silent: an observe() metric
    * (`graft_hot_buckets_*`) rides the caller's action — zero extra
    * jobs — and a session-level listener WARN-logs any non-zero drop.
    * Callers wanting the dropped keys programmatically pass a
    * `hotBucketSink` (that read is a separate action and re-executes the
    * upstream — opt-in by design).
    */
  def capHotBuckets(bucketed: DataFrame, keyCols: Seq[String], cap: Int,
      opTag: String = "lsh"): (DataFrame, DataFrame) = {
    ensureHotListener(bucketed.sparkSession)
    val w = Window.partitionBy(keyCols.map(col): _*)
    val name = s"graft_hot_buckets_${opTag}_${hotOpCounter.incrementAndGet()}"
    val counted = bucketed
      .withColumn("bucket_n", count(lit(1)).over(w))
      .observe(name,
        sum(when(col("bucket_n") > cap, 1L).otherwise(0L)).as("dropped_rows"),
        max(col("bucket_n")).as("max_bucket_n"))
    val kept = counted.filter(col("bucket_n") <= cap).drop("bucket_n")
    val hot = counted.filter(col("bucket_n") > cap)
      .select(keyCols.map(col) :+ col("bucket_n"): _*)
      .dropDuplicates(keyCols)
    (kept, hot)
  }

  /** attach the never-silent drop metric to a hot-bucket frame and make
    * sure the WARN-logging listener is registered on its session
    */
  private[ops] def observeHot(hot: DataFrame, opTag: String): DataFrame = {
    ensureHotListener(hot.sparkSession)
    // the counter keeps names unique across ops within one query; the
    // SAME observed subtree may legally appear twice (self-join legs)
    val name = s"graft_hot_buckets_${opTag}_${hotOpCounter.incrementAndGet()}"
    hot.observe(name,
      count(lit(1)).as("hot_buckets"),
      sum(col("bucket_n")).as("dropped_rows"),
      max(col("bucket_n")).as("max_bucket_n"))
  }

  private val hotOpCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  // weakly keyed: the registered listener is owned by the session's own
  // listenerManager, so once a (stopped) session becomes unreachable both
  // it and the listener can be collected — this set must not pin them in
  // a long-lived JVM that creates/stops many sessions (tests do).
  private val hotListenerSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]()))

  private def ensureHotListener(sp: org.apache.spark.sql.SparkSession): Unit =
    if (hotListenerSessions.add(sp)) {
      sp.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_hot_buckets_") && !row.isNullAt(0) && row.getLong(0) > 0) {
              val fields = Option(row.schema) match {
                case Some(sc) => sc.fieldNames.zipWithIndex
                  .map { case (f, i) => s"$f=${if (row.isNullAt(i)) "null" else row.get(i)}" }
                  .mkString(", ")
                case None => row.toString
              }
              org.slf4j.LoggerFactory.getLogger("graft.ops.Dedup").warn(
                s"$name: hot-bucket cap dropped data ($fields); near-dup coverage " +
                  "is partial — raise bands/planes or the cap, or attach hotBucketSink")
            }
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, error: Exception): Unit = ()
      })
    }

  /** Exact dedup by content hash: ONE shuffle on the 128-bit md5 of the
    * text. Returns one row per distinct content with the canonical
    * (minimum) id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Near-dup candidate pairs via MinHash + banded LSH:
    * shingle -> signature (map-only Expression) -> explode bands ->
    * self-join on (band_idx, band_hash) -> verify with exact k-shingle
    * Jaccard. Shuffles: one on the band key (narrow rows), none on raw
    * text until the (small) candidate set is verified.
    */
  def minhashLsh(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, nHashes: Int = 64, rowsPerBand: Int = 4,
      threshold: Double = 0.8, maxBucket: Int = 1000,
      hotBucketSink: DataFrame => Unit = null): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._

    val texts = df.select(col(idCol).as("id"), col(textCol).as("text"))
    // banding as pure built-ins: band b's bucket key is
    // xxhash64(b, slice(sig, b*r+1, r)) — fully codegen'd, no
    // per-corpus-row udf/Seq boxing (this runs once per corpus row, the
    // hottest spot of the LSH path after the signature itself, which is
    // already a native Expression). Identical band tuples hash equal by
    // construction, so banding recall is untouched; the hash only
    // chooses bucket keys (an FNV-style aggregate() fold is NOT usable
    // here: its multiply overflows by design and ANSI mode, Spark 4's
    // default, turns that into a runtime error).
    val nBands = nHashes / rowsPerBand
    val bandsCol = expr(
      s"transform(sequence(0, ${nBands - 1}), " +
        s"b -> xxhash64(b, slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))")
    // only (id, band) rows shuffle through the self-join; raw text joins
    // back on the (small) candidate pair set for exact verification
    val banded = texts
      .select($"id", TextOps.minhash($"text", k, nHashes).as("sig"))
      .select($"id", posexplode(bandsCol).as(Seq("band_idx", "band_hash")))
    val (kept, hot) = capHotBuckets(banded, Seq("band_idx", "band_hash"), maxBucket, "minhash")
    if (hotBucketSink != null) hotBucketSink(hot)

    val a = kept.select($"band_idx", $"band_hash", $"id".as("id_a"))
    val b = kept.select($"band_idx", $"band_hash", $"id".as("id_b"))
    val candidates = a.join(b, Seq("band_idx", "band_hash"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b")
      .dropDuplicates("id_a", "id_b")

    // candidate-driven text lookback, candidates consumed ONCE: an earlier
    // shape pre-reduced the b-side texts with a semi-join on
    // candidates.id_b, which made the (expensive) candidate pipeline a
    // TWO-consumer subtree — AQE exchange reuse covered only part of it
    // and the window + self-join recomputed per consumer (round-7 plan
    // audit: 33 live Exchanges, signature subtree planned 23x). The semi
    // also bought nothing at scale: it shuffles the full text table by id
    // exactly like the pair join itself does. Joining the pair set
    // through texts twice (id_a, then id_b) keeps one candidate instance
    // and two cheap column-pruned text scans. No forced broadcast — the
    // candidate set is usually small but is NOT bounded (duplicate-heavy
    // corpora can emit billions of sub-cap pairs), so strategy is left to
    // the planner/AQE, which broadcasts small sides at runtime and falls
    // back to shuffle joins when they aren't.
    val jac = udf { (t1: String, t2: String) => MinHash.exactJaccard(t1, t2, k) }
    candidates
      .join(texts.select($"id".as("id_a"), $"text".as("text_a")), Seq("id_a"))
      .join(texts.select($"id".as("id_b"), $"text".as("text_b")), Seq("id_b"))
      .withColumn("jaccard", jac($"text_a", $"text_b"))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, banded into 4x16-bit
    * chunks (hamming distance <= 3 guarantees one identical chunk);
    * verify by full hamming distance. One shuffle on the chunk key.
    */
  def simhashPairs(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3, maxBucket: Int = 1000,
      hotBucketSink: DataFrame => Unit = null): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val fps = df.select(col(idCol).as("id"), TextOps.simhash64(col(textCol)).as("fp"))
    val chunked0 = fps.select($"id", $"fp",
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk_idx"),
          shiftrightunsigned($"fp", i * 16).bitwiseAND(lit(0xffffL)).as("chunk"))): _*)).as("c"))
      .select($"id", $"fp", $"c.chunk_idx", $"c.chunk")
    val (chunked, hot) = capHotBuckets(chunked0, Seq("chunk_idx", "chunk"), maxBucket, "simhash")
    if (hotBucketSink != null) hotBucketSink(hot)
    val a = chunked.select($"chunk_idx", $"chunk", $"id".as("id_a"), $"fp".as("fp_a"))
    val b = chunked.select($"chunk_idx", $"chunk", $"id".as("id_b"), $"fp".as("fp_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter($"id_a" < $"id_b")
      .dropDuplicates("id_a", "id_b")
      // hamming distance as built-ins (codegen'd), same as SimHash.hamming
      .withColumn("hamming", bit_count($"fp_a".bitwiseXOR($"fp_b")))
      .filter($"hamming" <= maxHamming)
      .select($"id_a", $"id_b", $"hamming")
  }

  /** Exact dedup keeping first-by-id row per content (window variant,
    * useful when the full row must survive).
    */
  def keepCanonical(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Embedding-cosine near-dup pairs: hyperplane-LSH buckets (see
    * graft.ops.Ann) prune the candidate space, then exact cosine filters
    * at `threshold`. Shuffles once on the bucket key; never crosses the
    * full n^2 pair space.
    */
  def embeddingCosinePairs(df: DataFrame, threshold: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nPlanes: Int = 8, nTables: Int = 6, seed: Long = 42L): DataFrame = {
    val pairs = Ann.candidatePairs(df, nPlanes, nTables, seed, idCol, vecCol)
    pairs.filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
