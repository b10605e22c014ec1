package graft

import graft.spark.TranscriptTable
import graft.spark.TranscriptTable.DataFile

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** File skipping over the bucketed table: the manifest carries per-file
  * conv_id min/max + row count read from the parquet footers at write
  * time, and the pruned read paths must (a) open strictly fewer files
  * than a full scan, (b) return EXACTLY what a full scan + filter
  * returns, (c) prune by bucket for point lookups, and (d) degrade to
  * no-pruning (never wrong answers) for manifests without stats.
  */
class DataSkippingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpRoot(tag: String): String =
    Files.createTempDirectory(s"graft_skip_$tag").toString

  /** conv ids with a lexicographically meaningful spread: c000..c199 */
  private def corpus(sp: SparkSession, n: Int) = {
    import sp.implicits._
    (0 until n).flatMap { k =>
      val id = f"c$k%03d"
      (0 until 3).map(t => (id, t, s"text $id/$t"))
    }.toDF("conv_id", "turn_idx", "text")
  }

  test("manifest entries carry footer-derived stats; rows sum to the table") {
    val sp = spark
    val root = tmpRoot("stats")
    TranscriptTable.write(corpus(sp, 120), root, nBuckets = 8, snapshotId = 1L)
    val files = TranscriptTable.readManifest(root, 1L)
    assert(files.nonEmpty)
    assert(files.forall(f => f.minConvId.isDefined && f.maxConvId.isDefined),
      s"stat-less entries: ${files.filterNot(_.minConvId.isDefined)}")
    assert(files.forall(f => f.minConvId.get <= f.maxConvId.get))
    assert(files.map(_.rows).sum == 120L * 3, files.map(_.rows).sum)
    // stats must actually bound the file contents
    files.take(3).foreach { f =>
      val actual = sp.read.parquet(s"$root/${f.path}")
        .agg(min("conv_id"), max("conv_id")).collect()(0)
      assert(f.minConvId.get == actual.getString(0) &&
        f.maxConvId.get == actual.getString(1), f)
    }
  }

  test("range read: prunes files and matches full-scan + filter exactly") {
    val sp = spark
    val root = tmpRoot("range")
    TranscriptTable.write(corpus(sp, 200), root, nBuckets = 8, snapshotId = 1L)
    val (sel, total) = TranscriptTable.selectFilesForRange(root, 1L, "c010", "c019")
    assert(sel.length < total,
      s"range [c010,c019] selected $sel of $total files — no pruning happened")
    val pruned = TranscriptTable.readConvIdRange(sp, root, "c010", "c019")
      .select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    val full = TranscriptTable.read(sp, root)
      .filter(col("conv_id").between("c010", "c019"))
      .select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    assert(pruned.length == 10 * 3)
    assert(pruned.toSeq == full.toSeq)
  }

  test("point lookup: bucket pruning composes with stats, result exact") {
    val sp = spark
    val root = tmpRoot("ids")
    TranscriptTable.write(corpus(sp, 200), root, nBuckets = 16, snapshotId = 1L)
    val ids = Seq("c003", "c077", "c145")
    val wantedBuckets = ids.map(TranscriptTable.bucketOf(_, 16)).toSet
    // driver-side bucketOf must agree with the layout's bucket column
    val layoutBuckets = TranscriptTable.read(sp, root)
      .filter(col("conv_id").isin(ids: _*))
      .select("conv_id", "bucket").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    ids.foreach(id =>
      assert(TranscriptTable.bucketOf(id, 16) == layoutBuckets(id),
        s"driver-side bucket disagrees with layout for $id"))
    val (sel, total) = TranscriptTable.selectFilesForIds(root, 1L, ids)
    assert(sel.nonEmpty && sel.length < total, s"selected ${sel.length} of $total")
    assert(sel.forall(f => wantedBuckets.contains(f.bucket)),
      "a selected file is outside the wanted buckets")
    val got = TranscriptTable.readConvIds(sp, root, ids)
      .select("conv_id", "turn_idx").orderBy("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == ids.sorted.flatMap(id => (0 until 3).map(id -> _)))
  }

  test("fully-pruned read returns an empty frame with the table schema") {
    val sp = spark
    val root = tmpRoot("empty")
    TranscriptTable.write(corpus(sp, 40), root, nBuckets = 4, snapshotId = 1L)
    val df = TranscriptTable.readConvIdRange(sp, root, "zzz0", "zzz9")
    assert(df.count() == 0)
    assert(df.columns.toSet == Set("conv_id", "turn_idx", "text", "bucket"))
  }

  test("stat-less manifest entries are never pruned (backward compat)") {
    val sp = spark
    val root = tmpRoot("compat")
    TranscriptTable.write(corpus(sp, 60), root, nBuckets = 4, snapshotId = 1L)
    // strip the stats from the manifest, as a pre-stats writer would have
    // left it
    val metaPath = Paths.get(root, "metadata", "snapshot-1.json")
    val stripped = Files.readString(metaPath)
      .replaceAll(""","min_conv_id":"[^"]*","max_conv_id":"[^"]*"""", "")
      .replaceAll(""","rows":[0-9.]+""", "")
    Files.writeString(metaPath, stripped)
    val files = TranscriptTable.readManifest(root, 1L)
    assert(files.forall(f => f.minConvId.isEmpty && f.rows == -1L),
      "stats survived the strip — the test regex no longer matches the manifest")
    val (sel, total) = TranscriptTable.selectFilesForRange(root, 1L, "c000", "c001")
    assert(sel.length == total, "a stat-less entry was pruned")
    val rows = TranscriptTable.readConvIdRange(sp, root, "c000", "c001").count()
    assert(rows == 2 * 3)
  }

  test("range layout: per-bucket file ranges are disjoint and skip hard") {
    val sp = spark
    val root = tmpRoot("rangelayout")
    TranscriptTable.write(corpus(sp, 240), root, nBuckets = 4, snapshotId = 1L,
      filesPerBucket = 4, layout = "range")
    val files = TranscriptTable.readManifest(root, 1L)
    assert(files.forall(_.minConvId.isDefined))
    // within a bucket, files must cover non-overlapping conv_id ranges
    files.groupBy(_.bucket).foreach { case (b, fs) =>
      val sorted = fs.sortBy(_.minConvId.get)
      sorted.sliding(2).foreach {
        case Vector(a2, b2) =>
          assert(a2.maxConvId.get < b2.minConvId.get,
            s"bucket $b files overlap: $a2 vs $b2")
        case _ => ()
      }
    }
    // a narrow range should now skip MOST files, not just some: at most
    // ~2 surviving files per bucket (boundary overlap) out of 4
    val (sel, total) = TranscriptTable.selectFilesForRange(root, 1L, "c010", "c014")
    assert(sel.length <= total / 2,
      s"range layout selected ${sel.length} of $total — stats not tight")
    val pruned = TranscriptTable.readConvIdRange(sp, root, "c010", "c014").count()
    assert(pruned == 5 * 3)
  }

  test("compaction: fewer files, identical contents, old snapshot intact") {
    val sp = spark
    val root = tmpRoot("compact")
    // a fragmented table: 8 files per bucket
    TranscriptTable.write(corpus(sp, 120), root, nBuckets = 4, snapshotId = 1L,
      filesPerBucket = 8)
    val before = TranscriptTable.readManifest(root, 1L)
    TranscriptTable.compact(sp, root, newSnapshotId = 2L, filesPerBucket = 1)
    val after = TranscriptTable.readManifest(root, 2L)
    assert(after.length < before.length / 2,
      s"compaction did not reduce files: ${before.length} -> ${after.length}")
    assert(after.forall(_.minConvId.isDefined), "compacted files lost stats")
    assert(after.map(_.rows).sum == before.map(_.rows).sum)
    // contents identical across snapshots (modulo file layout)
    val cols = Seq("conv_id", "turn_idx", "text")
    val diff = TranscriptTable.readAt(sp, root, 1L).select(cols.map(col): _*)
      .exceptAll(TranscriptTable.readAt(sp, root, 2L).select(cols.map(col): _*))
      .count()
    assert(diff == 0, s"compaction changed contents: $diff rows")
    // old snapshot still time-travels until expired; then its files go
    assert(TranscriptTable.readAt(sp, root, 1L).count() == 120 * 3)
    TranscriptTable.expireSnapshots(root, keep = Set(2L))
    assert(scala.util.Try(TranscriptTable.readAt(sp, root, 1L)).isFailure)
    assert(TranscriptTable.read(sp, root).count() == 120 * 3)
  }

  test("overwritten bucket's new files carry stats in the new manifest") {
    val sp = spark
    import sp.implicits._
    val root = tmpRoot("ow")
    TranscriptTable.write(corpus(sp, 60), root, nBuckets = 4, snapshotId = 1L)
    // pick a real conv id and overwrite its bucket with doubled turns
    val someId = "c007"
    val b = TranscriptTable.bucketOf(someId, 4)
    val replacement = (0 until 6).map(t => (someId, t, s"new $t"))
      .toDF("conv_id", "turn_idx", "text")
    TranscriptTable.overwriteBucket(replacement, root, b, newSnapshotId = 2L)
    val newFiles = TranscriptTable.readManifest(root, 2L)
      .filter(_.path.startsWith("data/snap-2/"))
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(_.minConvId.contains(someId)), newFiles)
    assert(newFiles.map(_.rows).sum == 6L)
    // pruned point lookup through the NEW snapshot sees the new rows
    val got = TranscriptTable.readConvIds(sp, root, Seq(someId)).count()
    assert(got == 6L)
  }

  test("readConvIdsAt: pruned time-travel lookup equals the full readAt filter") {
    val sp = spark
    import sp.implicits._
    val root = tmpRoot("at")
    TranscriptTable.write(corpus(sp, 60), root, nBuckets = 4, snapshotId = 1L,
      filesPerBucket = 2, layout = "range")
    // advance the table so snapshot 1 is no longer current
    val extra = Seq(("zz-new", 0, "appended")).toDF("conv_id", "turn_idx", "text")
    TranscriptTable.append(extra, root, newSnapshotId = 2L, filesPerBucket = 1)
    val ids = Seq("c003", "c042", "c199")
    val pruned = TranscriptTable.readConvIdsAt(sp, root, 1L, ids)
      .select("conv_id", "turn_idx").collect().map(r => (r.getString(0), r.getInt(1))).sorted
    val full = TranscriptTable.readAt(sp, root, 1L)
      .filter(col("conv_id").isin(ids: _*))
      .select("conv_id", "turn_idx").collect().map(r => (r.getString(0), r.getInt(1))).sorted
    assert(pruned.nonEmpty && (pruned.toSeq == full.toSeq))
    // and it actually pruned: candidate files are a strict subset
    val (cands, total) = TranscriptTable.selectFilesForIds(root, 1L, ids)
    assert(cands.size < total, s"$cands of $total")
    // at the CURRENT snapshot the appended conv resolves too
    assert(TranscriptTable.readConvIds(sp, root, Seq("zz-new")).count() == 1L)
  }

  test("deleteConvIds counts ride the rewrite: one read of candidates, exact count") {
    val sp = spark
    val root = tmpRoot("delobs")
    TranscriptTable.write(corpus(sp, 40), root, nBuckets = 4, snapshotId = 1L,
      filesPerBucket = 2, layout = "range")
    val victims = Seq("c000", "c017")
    val expected = TranscriptTable.read(sp, root)
      .filter(col("conv_id").isin(victims: _*)).count()
    val deleted = TranscriptTable.deleteConvIds(sp, root, victims, newSnapshotId = 2L)
    assert(deleted == expected, s"observe-folded count $deleted != $expected")
    assert(TranscriptTable.read(sp, root).count() == 40L * 3 - expected)
    // all-victims-in-candidates: the rewrite lands no files (every row
    // filtered out), AQE prunes the CollectMetrics node, and the count
    // falls back to the manifest's footer stats (exact, never guessed)
    val remaining = TranscriptTable.read(sp, root).count()
    val allIds = TranscriptTable.read(sp, root).select("conv_id").distinct()
      .collect().map(_.getString(0)).toSeq
    val d2 = TranscriptTable.deleteConvIds(sp, root, allIds, newSnapshotId = 3L)
    assert(d2 == remaining, s"all-victim fallback count $d2 != $remaining")
    assert(TranscriptTable.readManifest(root, 3L).isEmpty,
      "deleting every row must commit an empty manifest")
  }
}
