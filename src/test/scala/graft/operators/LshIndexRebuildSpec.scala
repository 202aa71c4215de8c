package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The LSH index growth-migration story (Dedup.rebuildLshIndex) and
  * the stats table's commit gate: re-bucketing is pure layout (probe
  * verdicts pinned bit-identical), re-banding equals a fresh save at
  * the new parameters, crashes heal by re-run through the shared
  * token-committed snapshot protocol, and a torn stats overwrite can
  * never silently drop buckets from a capped probe.
  */
class LshIndexRebuildSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def fsOf(path: String) = org.apache.hadoop.fs.FileSystem.get(
    new org.apache.hadoop.fs.Path(path).toUri,
    spark.sessionState.newHadoopConf())

  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  private def probeRows(batch: org.apache.spark.sql.DataFrame, path: String)
      : Seq[Seq[Any]] =
    Dedup.dedupAgainstLshIndex(batch, path, threshold = 0.05,
      maxBucket = Some(3)).collect().map(_.toSeq).toSeq

  private def partDirs(path: String): Int =
    fsOf(path).listStatus(hp(s"$path/bands"))
      .count(s => s.isDirectory && s.getPath.getName.startsWith("part="))

  test("rebuild under 4x more bucket parts: probe verdicts bit-identical, layout actually migrated") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(pmod(col("doc_id"), lit(11)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(11)) === 0)
    val path = java.nio.file.Files.createTempDirectory("lsh_rebucket").toString
    Dedup.saveLshIndex(corpus, k = 3, bands = 8, rowsPerBand = 4, path,
      nBucketParts = 4)
    val before = probeRows(batch, path)
    assert(before.nonEmpty)
    assert(partDirs(path) <= 4)
    def docsFiles() = fsOf(path).listStatus(hp(s"$path/docs"))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq
    val docsBefore = docsFiles()
    Dedup.rebuildLshIndex(spark, path, nBucketParts = Some(16))
    // meta carries the new partitioning; the probe derives `part` from
    // it, so verdicts must not move — re-bucketing is layout only
    val meta = spark.read.parquet(s"$path/meta").head()
    assert(meta.getInt(3) === 16)
    assert(partDirs(path) > 4, "band rows must spread over the new parts")
    assert(probeRows(batch, path) === before)
    // the fast path's whole point: a pure re-bucket rewrites ONLY the
    // band/stats layout — the doc store's files are byte-untouched
    // (no re-sign, no shingle-set IO)
    assert(docsFiles() === docsBefore,
      "pure re-bucket must not rewrite the doc store")
    // the snapshot protocol cleaned up after itself
    assert(!fsOf(path).exists(hp(s"$path/rebuild_src")))
    // stats survived as a committed table: capped probes stay on the
    // one-band-scan fast path after the rebuild
    assert(fsOf(path).exists(hp(s"$path/stats/_SUCCESS")))
  }

  test("rebuild preserves appended docs and re-banding equals a fresh save at the new parameters") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(pmod(col("doc_id"), lit(12)) === 0)
    val extra = docs.where(pmod(col("doc_id"), lit(12)) === 1)
    val batch = docs.where(pmod(col("doc_id"), lit(12)) === 2)
    val path = java.nio.file.Files.createTempDirectory("lsh_reband").toString
    Dedup.saveLshIndex(corpus, k = 3, bands = 8, rowsPerBand = 4, path,
      nBucketParts = 4)
    Dedup.appendToLshIndex(extra, path)
    // re-band from the stored shingle sets: 4 bands of 8 rows
    Dedup.rebuildLshIndex(spark, path, nBucketParts = Some(8),
      bands = Some(4), rowsPerBand = Some(8))
    val meta = spark.read.parquet(s"$path/meta").head()
    assert((meta.getInt(1), meta.getInt(2), meta.getInt(3)) === ((4, 8, 8)))
    // ... must equal a FRESH saveLshIndex of corpus+extra at those
    // parameters, bit for bit on probe verdicts
    val fresh = java.nio.file.Files.createTempDirectory("lsh_fresh").toString
    Dedup.saveLshIndex(corpus.unionByName(extra), k = 3, bands = 4,
      rowsPerBand = 8, fresh, nBucketParts = 8)
    assert(probeRows(batch, path) === probeRows(batch, fresh))
    // and the appended docs are still in the index (not rolled back)
    val nDocs = spark.read.parquet(s"$path/docs").count()
    assert(nDocs === spark.read.parquet(s"$fresh/docs").count())
  }

  test("mid-rebuild crash heals by re-run; a completed rebuild's leftover snapshot never rolls back appends") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(pmod(col("doc_id"), lit(11)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(11)) === 0)
    val path = java.nio.file.Files.createTempDirectory("lsh_heal").toString
    Dedup.saveLshIndex(corpus, k = 3, bands = 8, rowsPerBand = 4, path,
      nBucketParts = 4)
    val before = probeRows(batch, path)
    val fs = fsOf(path)
    def writeTok(p: String, tok: String): Unit = {
      val out = fs.create(hp(p), true)
      try out.write(tok.getBytes("UTF-8")) finally out.close()
    }
    // --- crashed IN-FLIGHT rebuild, worst case: snapshot committed
    // (params + token landed, done token absent), the in-flight marker
    // up, bands half-rewritten (a partition dropped) AND meta itself
    // torn away by the crash
    spark.read.parquet(s"$path/docs")
      .write.mode("overwrite").parquet(s"$path/rebuild_src")
    writeTok(s"$path/rebuild_src/_params",
      "k=3\nbands=8\nrows_per_band=4\nn_bucket_parts=16")
    writeTok(s"$path/rebuild_src/_token", "tok-inflight")
    writeTok(s"$path/rebuild_inflight", "tok-inflight")
    val somePart = fs.listStatus(hp(s"$path/bands"))
      .filter(_.isDirectory).map(_.getPath)
      .find(_.getName.startsWith("part=")).get
    fs.delete(somePart, true)
    fs.delete(hp(s"$path/meta"), true)
    // probes fail LOUDLY mid-rebuild — half-rewritten bands against a
    // possibly-mismatched meta must never silently miss duplicates
    val ex = intercept[IllegalStateException] {
      Dedup.dedupAgainstLshIndex(batch, path, threshold = 0.05)
    }
    assert(ex.getMessage.contains("in-flight"))
    // healing re-run: parameters come from the snapshot (meta is gone)
    Dedup.rebuildLshIndex(spark, path)
    assert(!fs.exists(hp(s"$path/rebuild_src")))
    assert(!fs.exists(hp(s"$path/rebuild_inflight")))
    assert(spark.read.parquet(s"$path/meta").head().getInt(3) === 16,
      "heal must complete the ORIGINAL rebuild's parameters")
    assert(probeRows(batch, path) === before,
      "healed rebuild must restore the full population from the snapshot")
    // --- completed rebuild's leftover: snapshot token == done token.
    // An append lands after the completed rebuild; the next rebuild
    // must discard the stale snapshot or the append is rolled back.
    spark.read.parquet(s"$path/docs")
      .write.mode("overwrite").parquet(s"$path/rebuild_src")
    writeTok(s"$path/rebuild_src/_token", "tok-done")
    writeTok(s"$path/rebuild_done_token", "tok-done")
    val extra = docs.where(pmod(col("doc_id"), lit(11)) === 5)
      .select((col("doc_id") + lit(7000000L)).as("doc_id"), col("text"))
    Dedup.appendToLshIndex(extra, path)
    val withExtra = spark.read.parquet(s"$path/docs").count()
    val afterAppend = probeRows(batch, path)
    Dedup.rebuildLshIndex(spark, path, nBucketParts = Some(32))
    assert(spark.read.parquet(s"$path/docs").count() === withExtra,
      "stale snapshot must be discarded, not rebuilt from")
    // re-bucketing is layout only: verdicts equal the post-append
    // probe — NOT the pre-append `before` (which a stale-snapshot
    // rollback would have reverted to)
    assert(probeRows(batch, path) === afterAppend)
  }

  test("marker-ordering crash states: pre-snapshot crash heals; done-token-before-marker-clear blocks resume rollback; paramless legacy snapshot fails with a named remedy") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(pmod(col("doc_id"), lit(11)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(11)) === 0)
    def mk(tag: String): (String, org.apache.hadoop.fs.FileSystem) = {
      val p = java.nio.file.Files.createTempDirectory(tag).toString
      Dedup.saveLshIndex(corpus, k = 3, bands = 8, rowsPerBand = 4, p,
        nBucketParts = 4)
      (p, fsOf(p))
    }
    def writeTok(fs: org.apache.hadoop.fs.FileSystem, p: String,
                 tok: String): Unit = {
      val out = fs.create(hp(p), true)
      try out.write(tok.getBytes("UTF-8")) finally out.close()
    }
    // --- crash BETWEEN the marker going up and the snapshot token
    // landing: live tables untouched, but probes must already be
    // blocked (this window is why appends here cannot be rolled back),
    // and a re-run heals by taking a FRESH snapshot
    val (p1, fs1) = mk("lsh_premark")
    val before1 = probeRows(batch, p1)
    writeTok(fs1, s"$p1/rebuild_inflight", "up")
    intercept[IllegalStateException] {
      Dedup.dedupAgainstLshIndex(batch, p1, threshold = 0.05)
    }
    intercept[IllegalStateException] {
      Dedup.appendToLshIndex(batch, p1)
    }
    Dedup.rebuildLshIndex(spark, p1, nBucketParts = Some(8))
    assert(!fs1.exists(hp(s"$p1/rebuild_inflight")))
    assert(probeRows(batch, p1) === before1)
    // --- crash AFTER the done token but BEFORE the marker cleared:
    // probes blocked (loud), and the next rebuild discards the now
    // stale snapshot instead of resuming it — so appends that could
    // never have landed (probes were blocked) stay impossible to lose
    val (p2, fs2) = mk("lsh_postdone")
    val before2 = probeRows(batch, p2)
    spark.read.parquet(s"$p2/docs")
      .write.mode("overwrite").parquet(s"$p2/rebuild_src")
    writeTok(fs2, s"$p2/rebuild_src/_params",
      "k=3\nbands=8\nrows_per_band=4\nn_bucket_parts=4")
    writeTok(fs2, s"$p2/rebuild_src/_token", "tok-done")
    writeTok(fs2, s"$p2/rebuild_done_token", "tok-done")
    writeTok(fs2, s"$p2/rebuild_inflight", "up")
    intercept[IllegalStateException] {
      Dedup.dedupAgainstLshIndex(batch, p2, threshold = 0.05)
    }
    Dedup.rebuildLshIndex(spark, p2)
    assert(!fs2.exists(hp(s"$p2/rebuild_inflight")))
    assert(!fs2.exists(hp(s"$p2/rebuild_src")))
    assert(probeRows(batch, p2) === before2)
    // --- a committed snapshot WITHOUT _params (pre-params layout):
    // the resume must fail with a message naming the file and remedy,
    // never an opaque key lookup
    val (p3, fs3) = mk("lsh_legacy_snap")
    spark.read.parquet(s"$p3/docs")
      .write.mode("overwrite").parquet(s"$p3/rebuild_src")
    writeTok(fs3, s"$p3/rebuild_src/_token", "tok-old-layout")
    val ex = intercept[IllegalStateException] {
      Dedup.rebuildLshIndex(spark, p3)
    }
    assert(ex.getMessage.contains("_params"), ex.getMessage)
  }

  test("torn stats overwrite: capped probe falls back to counting (no dropped buckets); staged backfill heals") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(pmod(col("doc_id"), lit(11)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(11)) === 0)
    val path = java.nio.file.Files.createTempDirectory("lsh_torn").toString
    Dedup.saveLshIndex(corpus, k = 3, bands = 8, rowsPerBand = 4, path,
      nBucketParts = 4)
    val healthy = probeRows(batch, path)
    val fs = fsOf(path)
    // simulate a crashed in-place stats overwrite: _SUCCESS gone and a
    // partition's counts missing — the old dir-existence gate would
    // join against these partial sizes and silently DROP the missing
    // partition's buckets (missed duplicates)
    fs.delete(hp(s"$path/stats/_SUCCESS"), false)
    val somePart = fs.listStatus(hp(s"$path/stats"))
      .filter(_.isDirectory).map(_.getPath)
      .find(_.getName.startsWith("part=")).get
    fs.delete(somePart, true)
    spark.catalog.refreshByPath(s"$path/stats")
    assert(probeRows(batch, path) === healthy,
      "uncommitted stats must be ignored, not trusted")
    // backfill heals through the stage-aside swap; committed again
    Dedup.backfillLshStats(spark, path)
    assert(fs.exists(hp(s"$path/stats/_SUCCESS")))
    assert(probeRows(batch, path) === healthy)
    // crash-window recovery: stats staged aside, live twin missing —
    // the next backfill restores before rewriting
    assert(fs.rename(hp(s"$path/stats"), hp(s"$path/_repair_old_stats")))
    Dedup.backfillLshStats(spark, path)
    assert(fs.exists(hp(s"$path/stats/_SUCCESS")))
    assert(!fs.exists(hp(s"$path/_repair_old_stats")))
    assert(probeRows(batch, path) === healthy)
  }
}
