package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Dedup

case class StreamFp(media_id: Long, dhash: Long)

/** The continuous image near-dup sink (probe persisted Hamming index →
  * exactly-once verdicts → append survivors → periodic compaction) vs
  * the m7 batch lifecycle it streams: per-batch verdicts and the
  * resulting index must match the manual loop exactly; replays must
  * reuse sealed verdicts; the at-least-once append window must move no
  * sealed verdicts, with repairHammingIndex restoring row hygiene; and
  * registry mode must accrete the same clusters as a one-shot
  * components pass over the persisted pairs.
  */
class ImageDedupSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M56 = (1L << 56) - 1

  /** Deterministic 56-bit fingerprints, role b = ids ≡ b (mod 8). */
  private def fps(b: Int) = spark.range(400)
    .where(pmod(col("id"), lit(8)) === b)
    .select(col("id").as("media_id"),
      xxhash64(col("id")).bitwiseAND(lit(M56)).as("dhash"))

  /** Probe batch for role b with planted near-dups: rows where
    * id ≡ b (mod 16) carry the role-0 resident (id − b)'s fingerprint
    * with two bits flipped (Hamming distance 2 ≤ maxDist 3, found with
    * certainty under 4-band blocking); the rest keep their own hash. */
  private def withDups(b: Int) = spark.range(400)
    .where(pmod(col("id"), lit(8)) === b)
    .select((col("id") + 100000L).as("media_id"),
      when(pmod(col("id"), lit(16)) === b,
        xxhash64(col("id") - b).bitwiseAND(lit(M56)).bitwiseXOR(lit(5L)))
        .otherwise(xxhash64(col("id")).bitwiseAND(lit(M56))).as("dhash"))

  private def save(path: String): Unit =
    Dedup.saveHammingIndex(fps(0), "media_id", "dhash", bits = 56,
      bands = 4, path, nBucketParts = 8)

  test("streamed lifecycle equals the manual m7 loop: per-batch verdicts and final index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val streamIdx = java.nio.file.Files.createTempDirectory("isink_idx").toString
    val twinIdx = java.nio.file.Files.createTempDirectory("isink_twin").toString
    val verdicts = java.nio.file.Files.createTempDirectory("isink_verd").toString
    save(streamIdx); save(twinIdx)
    val input = MemoryStream[StreamFp]
    val q = DocStreams.imageDedupSink(input.toDF(), streamIdx, verdicts,
        maxDist = 3, compactEvery = 2)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("isink_ckpt").toString)
      .start()
    try {
      (1 to 3).foreach { b =>
        input.addData(withDups(b).as[(Long, Long)].collect()
          .map(t => StreamFp(t._1, t._2)): _*)
        q.processAllAvailable()
        val probed = Dedup.dedupAgainstHammingIndex(withDups(b), "media_id",
          "dhash", twinIdx, maxDist = 3)
        val expected = probed.collect().map(_.toSeq).toSeq
        Dedup.appendToHammingIndex(
          withDups(b).join(
            probed.where(!col("is_dup")).select(col("media_id")), "media_id"),
          "media_id", "dhash", twinIdx)
        val got = spark.read.parquet(verdicts)
          .where(col("batch_id") === (b - 1)) // MemoryStream ids are 0-based
          .select(col("media_id"), col("n_matches"), col("match_id"),
            col("is_dup"))
          .orderBy(col("media_id")).collect().map(_.toSeq).toSeq
        assert(got === expected, s"batch $b verdicts diverge")
        assert(expected.exists(_(3) == true), s"batch $b: planted dups found")
        assert(expected.exists(_(3) == false), s"batch $b: survivors exist")
      }
    } finally q.stop()
    // the two indexes must now serve identical answers to a LATER batch
    val a = Dedup.dedupAgainstHammingIndex(withDups(5), "media_id", "dhash",
      streamIdx, maxDist = 3).collect().map(_.toSeq).toSeq
    val b = Dedup.dedupAgainstHammingIndex(withDups(5), "media_id", "dhash",
      twinIdx, maxDist = 3).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("a fully-committed batch replayed is a no-op; a lost final marker replays off the SEALED verdicts and repair contains the double append") {
    val idx = java.nio.file.Files.createTempDirectory("iseal_idx").toString
    val clean = java.nio.file.Files.createTempDirectory("iseal_clean").toString
    val verdicts = java.nio.file.Files.createTempDirectory("iseal_verd").toString
    save(idx); save(clean)
    def drive(): Unit = DocStreams.processImageBatch(withDups(1), 0L, idx,
      verdicts, maxDist = 3, idCol = "media_id", hashCol = "dhash",
      compactEvery = 0, maxFilesPerPart = 8)
    drive()
    DocStreams.processImageBatch(withDups(1), 0L, clean, verdicts + "_c",
      maxDist = 3, idCol = "media_id", hashCol = "dhash",
      compactEvery = 0, maxFilesPerPart = 8)
    def read() = spark.read.parquet(verdicts)
      .select(col("media_id"), col("n_matches"), col("match_id"),
        col("is_dup"))
      .orderBy(col("media_id")).collect().map(_.toSeq).toSeq
    def bandRows() = spark.read.parquet(s"$idx/bands").count()
    val committed = read()
    val committedRows = bandRows()
    // committed replay: marker present — nothing moves
    drive()
    assert(read() === committed)
    assert(bandRows() === committedRows)
    // crash AFTER the append, BEFORE the final marker: the verdict
    // seal survived; the replay must reuse it verbatim (a re-probe
    // would see the batch's own appended rows and flip survivors to
    // dups), and the double append is the documented at-least-once
    // residue that repair contains
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(verdicts).toUri,
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$verdicts/_committed/batch_0"),
      true)
    drive()
    assert(read() === committed,
      "replay recomputed verdicts against the batch's own appended rows")
    assert(bandRows() > committedRows, "fixture must actually double-append")
    Dedup.repairHammingIndex(spark, idx)
    assert(bandRows() === spark.read.parquet(s"$clean/bands").count())
    // the repaired index serves exactly: a later probe's counts are
    // bit-identical to the never-crashed twin's (duplicated band rows
    // would have double-counted n_matches)
    def probe(p: String) = Dedup.dedupAgainstHammingIndex(withDups(2),
        "media_id", "dhash", p, maxDist = 3)
      .collect().map(_.toSeq).toSeq
    assert(probe(idx) === probe(clean))
    // idempotent on a healthy index
    Dedup.repairHammingIndex(spark, idx)
    assert(probe(idx) === probe(clean))
  }

  test("registry mode: verdicts bit-identical to pairless mode; registry = one-shot components over the persisted pairs; crash replay exactly-once") {
    import graft.operators.Clusters
    val idxA = java.nio.file.Files.createTempDirectory("ireg_idxA").toString
    val idxB = java.nio.file.Files.createTempDirectory("ireg_idxB").toString
    val verdA = java.nio.file.Files.createTempDirectory("ireg_verdA").toString
    val verdB = java.nio.file.Files.createTempDirectory("ireg_verdB").toString
    val reg = java.nio.file.Files.createTempDirectory("ireg_reg").toString + "/reg"
    save(idxA); save(idxB)
    // the index's save-time corpus registers first (reserved id)
    Clusters.updateRegistry(spark, reg, -1L, fps(0).select(
        col("media_id").as("doc_id")),
      Seq.empty[(Long, Long)].toDF("bid", "cid"), nDocParts = 8)
    (1 to 3).foreach { b =>
      DocStreams.processImageBatch(withDups(b), (b - 1).toLong, idxA, verdA,
        maxDist = 3, idCol = "media_id", hashCol = "dhash", compactEvery = 2,
        maxFilesPerPart = 8, registryPath = Some(reg))
      DocStreams.processImageBatch(withDups(b), (b - 1).toLong, idxB, verdB,
        maxDist = 3, idCol = "media_id", hashCol = "dhash", compactEvery = 2,
        maxFilesPerPart = 8)
    }
    def verdicts(p: String) = spark.read.parquet(p)
      .select(col("batch_id"), col("media_id"), col("n_matches"),
        col("match_id"), col("is_dup"))
      .orderBy(col("batch_id"), col("media_id")).collect().map(_.toSeq).toSeq
    assert(verdicts(verdA) === verdicts(verdB))
    assert(verdicts(verdA).nonEmpty)
    // registry = one-shot components over every persisted pair
    val pairs = spark.read.parquet(s"$verdA/_pairs")
      .select(col("bid"), col("cid")).localCheckpoint()
    assert(!pairs.isEmpty, "fixture must produce matches")
    val comps = Dedup.connectedComponents(
        pairs.select(col("bid").as("id1"), col("cid").as("id2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allIds = (fps(0).select(col("media_id")) +: (1 to 3).map(
        withDups(_).select(col("media_id"))))
      .reduce(_ unionByName _).collect().map(_.getLong(0))
    val want = allIds.map(id => id -> comps.getOrElse(id, id)).toMap
    def got() = Clusters.resolvedClusters(spark, reg).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got() === want)
    // committed replay: registry untouched; crash replay (final marker
    // lost) re-lands identical rows off the sealed pairs
    DocStreams.processImageBatch(withDups(3), 2L, idxA, verdA,
      maxDist = 3, idCol = "media_id", hashCol = "dhash", compactEvery = 2,
      maxFilesPerPart = 8, registryPath = Some(reg))
    assert(got() === want, "committed replay must not move the registry")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(verdA).toUri,
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$verdA/_committed/batch_2"),
      false)
    DocStreams.processImageBatch(withDups(3), 2L, idxA, verdA,
      maxDist = 3, idCol = "media_id", hashCol = "dhash", compactEvery = 2,
      maxFilesPerPart = 8, registryPath = Some(reg))
    assert(got() === want, "crash replay must re-land identical rows")
    assert(verdicts(verdA) === verdicts(verdB))
    Seq(idxA, idxB, verdA, verdB, reg).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }

  test("registry mode refuses sealed verdicts with no pairs artifact") {
    import graft.operators.Clusters
    val idx = java.nio.file.Files.createTempDirectory("iregamb_idx").toString
    val verd = java.nio.file.Files.createTempDirectory("iregamb_verd").toString
    val reg = java.nio.file.Files.createTempDirectory("iregamb_reg")
      .toString + "/reg"
    save(idx)
    Clusters.updateRegistry(spark, reg, -1L,
      fps(0).select(col("media_id").as("doc_id")),
      Seq.empty[(Long, Long)].toDF("bid", "cid"), nDocParts = 8)
    // batch 0 ran pairless, died after sealing verdicts but before the
    // final marker; the restart comes up with registryPath set
    DocStreams.processImageBatch(withDups(1), 0L, idx, verd,
      maxDist = 3, idCol = "media_id", hashCol = "dhash", compactEvery = 0,
      maxFilesPerPart = 8)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(verd).toUri,
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$verd/_committed/batch_0"),
      false)
    val e = intercept[IllegalStateException] {
      DocStreams.processImageBatch(withDups(1), 0L, idx, verd,
        maxDist = 3, idCol = "media_id", hashCol = "dhash", compactEvery = 0,
        maxFilesPerPart = 8, registryPath = Some(reg))
    }
    assert(e.getMessage.contains("no pairs artifact"))
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$verd/_committed/batch_0")),
      "the refused batch must stay uncommitted")
  }
}
