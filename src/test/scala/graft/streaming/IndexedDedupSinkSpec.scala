package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Dedup

/** The continuous-curation sink (probe persisted index → exactly-once
  * verdicts → append survivors → periodic compaction) vs the batch c6
  * lifecycle it streams: per-batch verdicts and the resulting index
  * must match the manual loop exactly; replays must be no-ops; and
  * the documented at-least-once append crash window must move no
  * verdicts, with repair restoring row-level hygiene.
  */
class IndexedDedupSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsAll = graft.sources.Tables
    .documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))

  private def role(b: Int) = docsAll.where(pmod(col("doc_id"), lit(12)) === b)

  test("streamed lifecycle equals the manual batch loop: per-batch verdicts and final index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val streamIdx = java.nio.file.Files.createTempDirectory("sink_idx").toString
    val twinIdx = java.nio.file.Files.createTempDirectory("twin_idx").toString
    val verdicts = java.nio.file.Files.createTempDirectory("sink_verd").toString
    Dedup.saveLshIndex(role(0), k = 3, bands = 8, rowsPerBand = 4, streamIdx,
      nBucketParts = 8)
    Dedup.saveLshIndex(role(0), k = 3, bands = 8, rowsPerBand = 4, twinIdx,
      nBucketParts = 8)
    val input = MemoryStream[StreamDoc]
    val q = DocStreams.indexedDedupSink(input.toDF(), streamIdx, verdicts,
        threshold = 0.05, maxBucket = Some(3), compactEvery = 2)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sink_ckpt").toString)
      .start()
    try {
      (1 to 3).foreach { b =>
        input.addData(role(b).as[(Long, String)].collect()
          .map(t => StreamDoc(t._1, t._2)): _*)
        q.processAllAvailable()
        // manual twin of the same batch
        val probed = Dedup.dedupAgainstLshIndex(role(b), twinIdx,
          threshold = 0.05, maxBucket = Some(3))
        val expected = probed.collect().map(_.toSeq).toSeq
        Dedup.appendToLshIndex(
          role(b).join(probed.where(!col("is_dup")).select(col("doc_id")),
            "doc_id"), twinIdx)
        val got = spark.read.parquet(verdicts)
          .where(col("batch_id") === (b - 1)) // MemoryStream batch ids are 0-based
          .select(col("doc_id"), col("n_matches"), col("match_id"),
            col("is_dup"))
          .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
        assert(got === expected, s"batch $b verdicts diverge")
        assert(expected.nonEmpty)
      }
    } finally q.stop()
    // the two indexes must now serve identical answers to a LATER batch
    val later = role(5)
    val a = Dedup.dedupAgainstLshIndex(later, streamIdx, threshold = 0.05,
      maxBucket = Some(3)).collect().map(_.toSeq).toSeq
    val b = Dedup.dedupAgainstLshIndex(later, twinIdx, threshold = 0.05,
      maxBucket = Some(3)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("a fully-committed batch replayed is a no-op (verdicts and index untouched)") {
    val idx = java.nio.file.Files.createTempDirectory("replay_idx").toString
    val verdicts = java.nio.file.Files.createTempDirectory("replay_verd").toString
    Dedup.saveLshIndex(role(0), k = 3, bands = 8, rowsPerBand = 4, idx,
      nBucketParts = 8)
    DocStreams.processIndexedBatch(role(1), 0L, idx, verdicts,
      threshold = 0.05, maxBucket = Some(3), compactEvery = 0,
      maxFilesPerPart = 8)
    def state() = (
      spark.read.parquet(verdicts).orderBy(col("doc_id"))
        .collect().map(_.toSeq).toSeq,
      spark.read.parquet(s"$idx/bands").count(),
      spark.read.parquet(s"$idx/docs").count())
    val before = state()
    DocStreams.processIndexedBatch(role(1), 0L, idx, verdicts,
      threshold = 0.05, maxBucket = Some(3), compactEvery = 0,
      maxFilesPerPart = 8)
    assert(state() === before, "replay of a committed batch must change nothing")
  }

  test("crash window: replay after the append reuses the SEALED verdicts — intra-batch near-dups cannot flip") {
    val idx = java.nio.file.Files.createTempDirectory("seal_idx").toString
    val verdicts = java.nio.file.Files.createTempDirectory("seal_verd").toString
    Dedup.saveLshIndex(
      Seq((1L, "completely unrelated resident corpus document text"))
        .toDF("doc_id", "text"),
      k = 2, bands = 4, rowsPerBand = 2, idx, nBucketParts = 4)
    // a batch whose two docs are near-dups of EACH OTHER, matching
    // nothing in the corpus: the probe (batch-vs-corpus) marks both
    // is_dup=false and both get appended
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    DocStreams.processIndexedBatch(batch, 0L, idx, verdicts,
      threshold = 0.3, maxBucket = None, compactEvery = 0,
      maxFilesPerPart = 8)
    def read() = spark.read.parquet(verdicts).orderBy(col("doc_id"))
      .select(col("doc_id"), col("is_dup")).collect().map(_.toSeq).toSeq
    val committed = read()
    assert(committed === Seq(Seq(10L, false), Seq(11L, false)))
    // simulate a crash AFTER the append but BEFORE the final marker:
    // the verdicts seal survived, the commit marker did not
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(verdicts).toUri,
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$verdicts/_committed/batch_0"),
      true)
    DocStreams.processIndexedBatch(batch, 0L, idx, verdicts,
      threshold = 0.3, maxBucket = None, compactEvery = 0,
      maxFilesPerPart = 8)
    // without the seal the replay would RE-PROBE against an index that
    // now contains 10 and 11 and flip both to is_dup=true — sealed
    // verdicts must be reused verbatim
    assert(read() === committed,
      "replay recomputed verdicts against the batch's own appended rows")
    // the double append is the documented at-least-once residue;
    // repair restores row-level hygiene
    Dedup.repairLshIndex(spark, idx)
    val later = Seq((20L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val hit = Dedup.dedupAgainstLshIndex(later, idx, threshold = 0.3)
      .collect().head
    assert(hit.getAs[Boolean]("is_dup") && hit.getLong(1) === 2L,
      s"repaired index must hold exactly one copy of each survivor: $hit")
  }

  test("a batch of empty-shingle docs commits cleanly and replays as a no-op (no wedge behind the seal)") {
    val idx = java.nio.file.Files.createTempDirectory("zero_idx").toString
    val verdicts = java.nio.file.Files.createTempDirectory("zero_verd").toString
    Dedup.saveLshIndex(role(0), k = 3, bands = 8, rowsPerBand = 4, idx,
      nBucketParts = 8)
    // non-empty batch, but every doc is too short for a 3-shingle:
    // the probe emits zero rows and the batch_id partition dir is
    // never created — the sink must seal and move on, not throw on a
    // read of the missing dir behind the already-written verdict seal
    val blank = Seq((900L, ""), (901L, "two words")).toDF("doc_id", "text")
    def state() = (
      spark.read.parquet(s"$idx/bands").count(),
      spark.read.parquet(s"$idx/docs").count())
    val before = state()
    DocStreams.processIndexedBatch(blank, 0L, idx, verdicts,
      threshold = 0.05, maxBucket = Some(3), compactEvery = 0,
      maxFilesPerPart = 8)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(verdicts).toUri,
      spark.sessionState.newHadoopConf())
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$verdicts/_committed/batch_0")))
    assert(state() === before, "unsignable docs must not reach the index")
    DocStreams.processIndexedBatch(blank, 0L, idx, verdicts,
      threshold = 0.05, maxBucket = Some(3), compactEvery = 0,
      maxFilesPerPart = 8)
    assert(state() === before)
  }

  test("marker GC: pruned batch ids stay no-ops on replay; uncommitted ids are never covered") {
    val idx = java.nio.file.Files.createTempDirectory("gc_idx").toString
    val verdicts = java.nio.file.Files.createTempDirectory("gc_verd").toString
    Dedup.saveLshIndex(role(0), k = 3, bands = 8, rowsPerBand = 4, idx,
      nBucketParts = 8)
    def drive(b: Int, id: Long) = DocStreams.processIndexedBatch(role(b),
      id, idx, verdicts, threshold = 0.05, maxBucket = Some(3),
      compactEvery = 0, maxFilesPerPart = 8)
    (1 to 3).foreach(b => drive(b, b - 1L)) // batches 0, 1, 2 committed
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(verdicts).toUri,
      spark.sessionState.newHadoopConf())
    def markers(d: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$verdicts/$d"))
        .map(_.getPath.getName).filter(_.startsWith("batch_")).sorted.toSeq
    assert(markers("_committed") === Seq("batch_0", "batch_1", "batch_2"))
    assert(markers("_verdicts") === Seq("batch_0", "batch_1", "batch_2"))
    // GC past the committed frontier: the floor stops at the highest
    // PRESENT marker (2), never covering future ids
    assert(DocStreams.gcSinkMarkers(spark, verdicts, upTo = 10L) === 2L)
    assert(markers("_committed").isEmpty)
    assert(markers("_verdicts").isEmpty)
    def state() = (
      spark.read.parquet(verdicts).orderBy(col("batch_id"), col("doc_id"))
        .collect().map(_.toSeq).toSeq,
      spark.read.parquet(s"$idx/bands").count(),
      spark.read.parquet(s"$idx/docs").count())
    val before = state()
    assert(before._1.nonEmpty, "verdict data must survive marker GC")
    // the exactly-once contract survives GC: replaying every pruned id
    // changes nothing — the floor stands in for the deleted markers
    (1 to 3).foreach(b => drive(b, b - 1L))
    assert(state() === before, "replay of a GC'd committed batch must no-op")
    // a NEW batch id above the floor still processes normally
    drive(5, 3L)
    assert(state() !== before)
    assert(markers("_committed") === Seq("batch_3"))
    // GC is idempotent and monotone: re-running at a lower upTo keeps
    // the higher floor
    assert(DocStreams.gcSinkMarkers(spark, verdicts, upTo = 1L) === 2L)
    assert(markers("_committed") === Seq("batch_3"))
  }

  test("crash window: a duplicated append moves no verdicts; repairLshIndex restores hygiene") {
    val dup = java.nio.file.Files.createTempDirectory("crash_idx").toString
    val clean = java.nio.file.Files.createTempDirectory("clean_idx").toString
    Dedup.saveLshIndex(role(0), k = 3, bands = 8, rowsPerBand = 4, dup,
      nBucketParts = 8)
    Dedup.saveLshIndex(role(0), k = 3, bands = 8, rowsPerBand = 4, clean,
      nBucketParts = 8)
    // the documented at-least-once window: the append ran, the marker
    // did not commit, the batch replays and appends AGAIN
    Dedup.appendToLshIndex(role(1), dup)
    Dedup.appendToLshIndex(role(1), dup)
    Dedup.appendToLshIndex(role(1), clean)
    assert(spark.read.parquet(s"$dup/bands").count() >
      spark.read.parquet(s"$clean/bands").count(),
      "fixture must actually duplicate band rows")
    // verdict stability: an uncapped probe of a later batch is
    // IDENTICAL despite the duplicate rows (verified-pair dedup)
    val later = role(2)
    def probe(p: String, cap: Option[Int]) =
      Dedup.dedupAgainstLshIndex(later, p, threshold = 0.05, maxBucket = cap)
        .collect().map(_.toSeq).toSeq
    assert(probe(dup, None) === probe(clean, None))
    // repair: exact row-level dedup + stats rebuild — the damaged
    // index becomes indistinguishable from the clean twin, capped
    // probes included (inflated stats were the one observable wound)
    Dedup.repairLshIndex(spark, dup)
    assert(spark.read.parquet(s"$dup/bands").count() ===
      spark.read.parquet(s"$clean/bands").count())
    assert(spark.read.parquet(s"$dup/docs").count() ===
      spark.read.parquet(s"$clean/docs").count())
    assert(probe(dup, Some(3)) === probe(clean, Some(3)))
    // idempotent on a healthy index
    Dedup.repairLshIndex(spark, clean)
    assert(probe(dup, Some(3)) === probe(clean, Some(3)))
  }

  test("registry mode: verdicts bit-identical to pairless mode; registry = one-shot components; replays and GC exactly-once") {
    import graft.operators.Clusters
    val idxA = java.nio.file.Files.createTempDirectory("reg_idxA").toString
    val idxB = java.nio.file.Files.createTempDirectory("reg_idxB").toString
    val verdA = java.nio.file.Files.createTempDirectory("reg_verdA").toString
    val verdB = java.nio.file.Files.createTempDirectory("reg_verdB").toString
    val reg = java.nio.file.Files.createTempDirectory("reg_reg").toString + "/reg"
    Dedup.saveLshIndex(role(0), k = 3, bands = 8, rowsPerBand = 4, idxA,
      nBucketParts = 8)
    Dedup.saveLshIndex(role(0), k = 3, bands = 8, rowsPerBand = 4, idxB,
      nBucketParts = 8)
    // the index's save-time corpus must be registered before the
    // stream's first batch (reserved id below the stream's own)
    Clusters.updateRegistry(spark, reg, -1L, role(0).select(col("doc_id")),
      Seq.empty[(Long, Long)].toDF("bid", "cid"), nDocParts = 8)
    (1 to 3).foreach { b =>
      DocStreams.processIndexedBatch(role(b), (b - 1).toLong, idxA, verdA,
        threshold = 0.05, maxBucket = Some(3), compactEvery = 2,
        maxFilesPerPart = 8, registryPath = Some(reg))
      DocStreams.processIndexedBatch(role(b), (b - 1).toLong, idxB, verdB,
        threshold = 0.05, maxBucket = Some(3), compactEvery = 2,
        maxFilesPerPart = 8)
    }
    // 1) the derived-from-pairs verdicts are bit-identical to the
    //    pairless mode's, batch by batch
    def verdicts(p: String) = spark.read.parquet(p)
      .select(col("batch_id"), col("doc_id"), col("n_matches"),
        col("match_id"), col("is_dup"))
      .orderBy(col("batch_id"), col("doc_id")).collect().map(_.toSeq).toSeq
    assert(verdicts(verdA) === verdicts(verdB))
    assert(verdicts(verdA).nonEmpty)
    // 2) registry = one-shot components over every persisted pair,
    //    singletons included
    val pairs = spark.read.parquet(s"$verdA/_pairs")
      .select(col("bid"), col("cid")).localCheckpoint()
    assert(!pairs.isEmpty, "fixture must produce cross-batch matches")
    val comps = Dedup.connectedComponents(
        pairs.select(col("bid").as("id1"), col("cid").as("id2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allDocs = (0 to 3).map(role(_)).reduce(_ unionByName _)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val want = allDocs.map(id => id -> comps.getOrElse(id, id)).toMap
    def got() = Clusters.resolvedClusters(spark, reg).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got() === want)
    // 3) a fully-committed batch replays as a registry no-op, and a
    //    mid-crash replay (final marker lost) re-lands identical rows
    DocStreams.processIndexedBatch(role(3), 2L, idxA, verdA,
      threshold = 0.05, maxBucket = Some(3), compactEvery = 2,
      maxFilesPerPart = 8, registryPath = Some(reg))
    assert(got() === want, "committed replay must not move the registry")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(verdA).toUri,
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$verdA/_committed/batch_2"),
      false)
    DocStreams.processIndexedBatch(role(3), 2L, idxA, verdA,
      threshold = 0.05, maxBucket = Some(3), compactEvery = 2,
      maxFilesPerPart = 8, registryPath = Some(reg))
    assert(got() === want, "crash replay must re-land identical rows")
    assert(verdicts(verdA) === verdicts(verdB))
    // 4) marker GC prunes the pair slices at or below the floor, and a
    //    pruned batch still replays as a no-op
    assert(DocStreams.gcSinkMarkers(spark, verdA, upTo = 1L) === 1L)
    def pairDirs() = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$verdA/_pairs"))
      .map(_.getPath.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(pairDirs() === Seq("batch_id=2"),
      "pair slices at or below the floor must be pruned")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$verdA/_pairs_sealed"))
        .map(_.getPath.getName).filter(_.startsWith("batch_")).sorted.toSeq
        === Seq("batch_2"),
      "pairs seals at or below the floor must be pruned with their slices")
    DocStreams.processIndexedBatch(role(1), 0L, idxA, verdA,
      threshold = 0.05, maxBucket = Some(3), compactEvery = 2,
      maxFilesPerPart = 8, registryPath = Some(reg))
    assert(got() === want, "a GC'd committed batch must replay as a no-op")
    Seq(idxA, idxB, verdA, verdB, reg).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }

  test("registry mode: the pairs artifact is unambiguous — sealed verdicts without a pairs seal refuse; a sealed zero-pair batch replays clean") {
    import graft.operators.Clusters
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("regamb_idx").toString
    val verd = java.nio.file.Files.createTempDirectory("regamb_verd").toString
    val reg = java.nio.file.Files.createTempDirectory("regamb_reg")
      .toString + "/reg"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(verd).toUri,
      spark.sessionState.newHadoopConf())
    Dedup.saveLshIndex(role(0), k = 3, bands = 8, rowsPerBand = 4, idx,
      nBucketParts = 8)
    Clusters.updateRegistry(spark, reg, -1L, role(0).select(col("doc_id")),
      Seq.empty[(Long, Long)].toDF("bid", "cid"), nDocParts = 8)
    // batch 0 ran BEFORE registry mode was enabled (pairless), died
    // after sealing verdicts but before the final marker; the restart
    // comes up with registryPath set. Its match pairs are unknowable —
    // registering the whole batch as singletons behind sealed match
    // verdicts is the silent corruption the tripwire exists to stop
    DocStreams.processIndexedBatch(role(1), 0L, idx, verd,
      threshold = 0.05, maxBucket = Some(3), compactEvery = 0,
      maxFilesPerPart = 8)
    fs.delete(new org.apache.hadoop.fs.Path(s"$verd/_committed/batch_0"),
      false)
    val e = intercept[IllegalStateException] {
      DocStreams.processIndexedBatch(role(1), 0L, idx, verd,
        threshold = 0.05, maxBucket = Some(3), compactEvery = 0,
        maxFilesPerPart = 8, registryPath = Some(reg))
    }
    assert(e.getMessage.contains("no pairs artifact"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$verd/_committed/batch_0")),
      "the refused batch must stay uncommitted")
    // a registry-mode batch whose probe legitimately finds ZERO pairs
    // writes no _pairs dir (dynamic overwrite of an empty frame), but
    // the pairs seal records the fact — a crash-window replay commits
    // instead of tripping the ambiguity check
    val verd2 = java.nio.file.Files.createTempDirectory("regamb_v2").toString
    DocStreams.processIndexedBatch(role(2), 0L, idx, verd2,
      threshold = 0.99, maxBucket = Some(3), compactEvery = 0,
      maxFilesPerPart = 8, registryPath = Some(reg))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$verd2/_pairs_sealed/batch_0")),
      "a zero-pair registry batch must still seal its pairs artifact")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$verd2/_pairs/batch_id=0")),
      "fixture must exercise the zero-pair (no dir) shape")
    def regged() = Clusters.resolvedClusters(spark, reg).count()
    val n = regged()
    fs.delete(new org.apache.hadoop.fs.Path(s"$verd2/_committed/batch_0"),
      false)
    DocStreams.processIndexedBatch(role(2), 0L, idx, verd2,
      threshold = 0.99, maxBucket = Some(3), compactEvery = 0,
      maxFilesPerPart = 8, registryPath = Some(reg))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$verd2/_committed/batch_0")), "the zero-pair replay must commit")
    assert(regged() === n, "the replay must re-land identical registry rows")
    Seq(idx, verd, verd2, reg).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }
}
