package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The persisted decontamination index (Dedup.saveDeconIndex /
  * decontaminateAgainstDeconIndex): probing the on-disk artifact must
  * equal the in-memory exact containment bit for bit at any bloom fpp
  * (the confirm join owns correctness), the confirm scan must be
  * DPP-pruned to the batch's hash partitions, and the batch-filter
  * composition must keep contaminated docs out of downstream curation.
  */
class DeconIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = graft.sources.Tables
    .documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))

  private def bench = docs.where(pmod(col("doc_id"), lit(11)) === 0)
  private def batch = docs.where(pmod(col("doc_id"), lit(11)) =!= 0 &&
    pmod(col("doc_id"), lit(3)) === 0)

  /** In-memory exact twin: containment of `batch` docs against the
    * benchmark's distinct shingle-hash set, same shape as the probe. */
  private def exact(k: Int): Seq[Seq[Any]] = {
    def sh(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      explode(graft.functions.Registry.shingleHashes(
        graft.functions.TextFunctions.wsTokens(lower(col("text"))),
        k)).as("h")).dropDuplicates("doc_id", "h")
    val b = sh(bench).select(col("h")).distinct()
      .withColumn("_hit", lit(true))
    sh(batch).join(b, Seq("h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("_hit")).as("n_hit"))
      .withColumn("containment",
        col("n_hit").cast("double") / col("n_shingles"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
  }

  test("persisted probe equals in-memory exact containment; confirm scan is partition-pruned") {
    val path = java.nio.file.Files.createTempDirectory("decon_idx").toString
    Dedup.saveDeconIndex(bench, k = 4, path, nHashParts = 8)
    val probed = Dedup.decontaminateAgainstDeconIndex(batch, path)
    assert(probed.collect().map(_.toSeq).toSeq === exact(4))
    // some doc must actually be contaminated for the fixture to mean
    // anything (near-dup corpus: shared shingles exist)
    assert(probed.where(col("n_hit") > 0).count() > 0)
    // the confirm scan is statically pruned to the partitions the
    // batch's own (bloom-surviving) hashes land in — an explicit
    // in-list on the store's partition column reaches the scan's
    // PartitionFilters (the probe pins its shingled batch, which hides
    // the batch's source predicates from the DPP rule; the in-list is
    // the same pruning made deterministic)
    val plan = probed.queryExecution.executedPlan.toString.toLowerCase
    assert("partitionfilters: \\[[^\\]]*part[^\\]]* in \\(".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("bracketed probe equals the lazy form; the compaction marker refuses it at entry") {
    val path = java.nio.file.Files.createTempDirectory("decon_brk").toString
    Dedup.saveDeconIndex(bench, k = 4, path, nHashParts = 8)
    val lazyRows = Dedup.decontaminateAgainstDeconIndex(batch, path)
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    val bracketed = Dedup.decontaminateAgainstDeconIndexBracketed(batch, path)
    assert(bracketed.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      === lazyRows)
    // under a live compaction the bracketed form refuses up front (the
    // closing token compare covers the mid-flight shapes — the sink's
    // spec'd bracket, packaged)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(s"$path/_compacting")
    fs.create(marker, true).close()
    intercept[IllegalStateException] {
      Dedup.decontaminateAgainstDeconIndexBracketed(batch, path)
    }
    fs.delete(marker, false)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("exactness never depends on the bloom: fpp = 0.5 probes bit-identically") {
    val path = java.nio.file.Files.createTempDirectory("decon_fpp").toString
    Dedup.saveDeconIndex(bench, k = 4, path, fpp = 0.5, nHashParts = 8)
    assert(Dedup.decontaminateAgainstDeconIndex(batch, path)
      .collect().map(_.toSeq).toSeq === exact(4))
  }

  test("re-save over a live index commits atomically; crash states heal by re-run") {
    val dir = java.nio.file.Files.createTempDirectory("decon_resave")
    val path = s"$dir/idx"
    // day 1: benchmark cohort A
    Dedup.saveDeconIndex(bench, k = 4, path, nHashParts = 8)
    // the suite is updated: cohort B (disjoint mod class) replaces A —
    // the re-save must fully supersede, not merge with, the old artifact
    val benchB = docs.where(pmod(col("doc_id"), lit(11)) === 1)
    val batchB = docs.where(pmod(col("doc_id"), lit(11)) =!= 1 &&
      pmod(col("doc_id"), lit(3)) === 0)
    Dedup.saveDeconIndex(benchB, k = 4, path, nHashParts = 8)
    def exactB: Seq[Seq[Any]] = {
      def sh(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
        explode(graft.functions.Registry.shingleHashes(
          graft.functions.TextFunctions.wsTokens(lower(col("text"))),
          4)).as("h")).dropDuplicates("doc_id", "h")
      val b = sh(benchB).select(col("h")).distinct()
        .withColumn("_hit", lit(true))
      sh(batchB).join(b, Seq("h"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"), count(col("_hit")).as("n_hit"))
        .withColumn("containment",
          col("n_hit").cast("double") / col("n_shingles"))
        .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    }
    val afterResave = Dedup.decontaminateAgainstDeconIndex(batchB, path)
      .collect().map(_.toSeq).toSeq
    assert(afterResave === exactB, "probe reflects ONLY the new benchmark")

    // crash state 1: a save died while writing its staging dir — the
    // live index is untouched; the next save sweeps the leftover
    val tmpDir = new java.io.File(s"$dir/_repair_tmp_idx")
    assert(tmpDir.mkdirs())
    java.nio.file.Files.write(tmpDir.toPath.resolve("junk"),
      "partial".getBytes)
    Dedup.saveDeconIndex(benchB, k = 4, path, nHashParts = 8)
    assert(!tmpDir.exists(), "orphaned staging swept")
    assert(Dedup.decontaminateAgainstDeconIndex(batchB, path)
      .collect().map(_.toSeq).toSeq === exactB)

    // crash state 2: a re-save died BETWEEN the swap's renames — live
    // was staged aside, the replacement never installed. A probe fails
    // loudly (no meta), and the next save first restores the staged
    // original, then installs fresh: no torn state is ever readable
    assert(new java.io.File(path).renameTo(
      new java.io.File(s"$dir/_repair_old_idx")))
    assert(tmpDir.mkdirs())
    intercept[Exception] {
      Dedup.decontaminateAgainstDeconIndex(batchB, path).collect()
    }
    Dedup.saveDeconIndex(benchB, k = 4, path, nHashParts = 8)
    assert(!new java.io.File(s"$dir/_repair_old_idx").exists())
    assert(Dedup.decontaminateAgainstDeconIndex(batchB, path)
      .collect().map(_.toSeq).toSeq === exactB)
  }

  test("unshingleable benchmark commits an empty index that probes clean, not a crash") {
    val path = java.nio.file.Files.createTempDirectory("decon_empty")
      .toString + "/idx"
    // every benchmark doc is shorter than k tokens: zero shingle hashes
    Dedup.saveDeconIndex(
      Seq((1L, "too short"), (2L, "also tiny")).toDF("doc_id", "text"),
      k = 4, path)
    val meta = spark.read.parquet(s"$path/meta").head()
    assert(meta.getLong(2) === 0L, "n_hashes records the truth, not the bloom clamp")
    val arriving = Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val scored = Dedup.decontaminateAgainstDeconIndex(arriving, path).collect()
    assert(scored.length === 1 && scored(0).getLong(2) === 0L,
      "probe runs and scores clean against an empty hash store")
    assert(Dedup.decontaminateBatch(arriving, path, maxContainment = 0.5)
      .count() === 1L, "nothing is dropped by an empty benchmark")
  }

  test("decontaminateBatch keeps contaminated docs out of the curation loop; shingle-less docs pass") {
    val path = java.nio.file.Files.createTempDirectory("decon_gate").toString
    // benchmark = one known document; the arriving batch carries a
    // verbatim leak of it, a clean doc, and a doc too short to shingle
    val leak = "the quick brown fox jumps over the lazy dog every day"
    Dedup.saveDeconIndex(Seq((1L, leak)).toDF("doc_id", "text"), k = 4, path)
    val arriving = Seq(
      (10L, leak), // full containment
      (11L, "completely unrelated text about columnar storage layouts ok"),
      (12L, "too short")) // zero 4-shingles
      .toDF("doc_id", "text")
    val kept = Dedup.decontaminateBatch(arriving, path,
      maxContainment = 0.8).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 12L),
      "the leak is dropped; clean and unshingleable docs pass")
    // composition with the dedup index: the contaminated doc never
    // reaches the LSH index's append path
    val lsh = java.nio.file.Files.createTempDirectory("decon_lsh").toString
    Dedup.saveLshIndex(Seq((1L, "resident corpus document text entirely"))
      .toDF("doc_id", "text"), k = 2, bands = 4, rowsPerBand = 2, lsh,
      nBucketParts = 4)
    val clean = Dedup.decontaminateBatch(arriving, path, maxContainment = 0.8)
    Dedup.appendToLshIndex(clean, lsh)
    val resident = spark.read.parquet(s"$lsh/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!resident.contains(10L), "contaminated doc must not enter the index")
    assert(resident.contains(11L))
  }

  test("decontaminateFrames equals the persisted decontaminateBatch verdicts; shingle-less docs pass") {
    val path = java.nio.file.Files.createTempDirectory("decon_fr").toString
    Dedup.saveDeconIndex(bench, k = 4, path, nHashParts = 8)
    val viaIndex = Dedup.decontaminateBatch(batch, path,
      maxContainment = 0.5).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val viaFrames = Dedup.decontaminateFrames(batch, bench, k = 4,
      maxContainment = 0.5).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(viaFrames === viaIndex,
      "frame-to-frame decon must match the persisted-index verdicts")
    // the threshold must actually drop something for the comparison
    // to mean anything (near-dup corpus: cross-slice dups exist)
    assert(viaFrames.size < batch.count(),
      "fixture must contain at least one contaminated doc")
    // a doc too short to shingle passes through, same as the probe
    val tiny = Seq((900L, "one two")).toDF("doc_id", "text")
    assert(Dedup.decontaminateFrames(tiny, bench, k = 4, maxContainment = 0.0)
      .count() === 1L, "unshingleable docs cannot be contaminated")
  }

  test("a bloom sidecar that does not match meta refuses the probe; a heal restores service") {
    // a wrong bloom has false negatives, which silently DROP true
    // contamination hits at the prefilter (the confirm join only vetoes
    // false positives) — serving through one is the worst decon failure
    // mode, so the probe verifies the sidecar against meta's recorded
    // digest before anything runs
    val path = java.nio.file.Files.createTempDirectory("decon_badbloom")
      .toString + "/idx"
    Dedup.saveDeconIndex(bench, k = 4, path, nHashParts = 8)
    val before = Dedup.decontaminateAgainstDeconIndex(batch, path)
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(before.nonEmpty)
    val bad = org.apache.spark.util.sketch.BloomFilter.create(1, 0.01)
    bad.putLong(Long.MinValue)
    val bo = new java.io.ByteArrayOutputStream(); bad.writeTo(bo)
    Seq(Tuple1(bo.toByteArray)).toDF("bloom").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/bloom")
    val ex = intercept[IllegalStateException] {
      Dedup.decontaminateAgainstDeconIndex(batch, path).count()
    }
    assert(ex.getMessage.contains("bloom sidecar"))
    Dedup.rebuildDeconBloom(spark, path)
    assert(Dedup.decontaminateAgainstDeconIndex(batch, path)
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq === before,
      "healed index must serve the pre-damage verdicts")
  }

  test("meta token changes on EVERY meta rewrite — field-identical re-saves and heals included — while the fingerprint holds") {
    // the curation sink's torn-probe bracket depends on this exact
    // asymmetry: fp-stable rewrites must still flip the token (the
    // token carries the meta part-file names, fresh UUIDs per write),
    // or an ABA double re-save / mid-probe heal would pass the bracket
    val path = java.nio.file.Files.createTempDirectory("decon_tok")
      .toString + "/idx"
    Dedup.saveDeconIndex(bench, k = 4, path, nHashParts = 8)
    val fp = Dedup.deconIndexFingerprint(spark, path)
    val tok0 = Dedup.deconMetaToken(spark, path)
    assert(Dedup.deconIndexStamp(spark, path) === (fp, tok0),
      "stamp must agree with the standalone reads")
    // byte/field-identical re-save: fingerprint holds, token flips
    Dedup.saveDeconIndex(bench, k = 4, path, nHashParts = 8)
    val tok1 = Dedup.deconMetaToken(spark, path)
    assert(tok1 !== tok0, "field-identical re-save must change the token")
    assert(Dedup.deconIndexFingerprint(spark, path) === fp)
    // bloom heal: fingerprint holds, token flips again
    Dedup.rebuildDeconBloom(spark, path)
    val tok2 = Dedup.deconMetaToken(spark, path)
    assert(tok2 !== tok1, "a bloom heal's meta rewrite must change the token")
    assert(Dedup.deconIndexFingerprint(spark, path) === fp)
  }

  test("fingerprint is content: stable across re-save and bloom heal, changed by a different benchmark") {
    val path = java.nio.file.Files.createTempDirectory("decon_fp")
      .toString + "/idx"
    Dedup.saveDeconIndex(bench, k = 4, path, nHashParts = 8)
    val fp = Dedup.deconIndexFingerprint(spark, path)
    // a bloom heal from the index's own hash store changes nothing
    Dedup.rebuildDeconBloom(spark, path)
    assert(Dedup.deconIndexFingerprint(spark, path) === fp,
      "bloom rebuild from the same store must not change the fingerprint")
    // a byte-identical re-save (same benchmark, same params) is the
    // same content — the curation sink must not trip on it
    Dedup.saveDeconIndex(bench, k = 4, path, nHashParts = 8)
    assert(Dedup.deconIndexFingerprint(spark, path) === fp,
      "same-content re-save must keep the fingerprint")
    // tuning-only re-saves (fpp, nHashParts) cannot change verdicts
    // (exactness never depends on the bloom; parts are layout), so the
    // fingerprint must not trip a live stream on them either
    Dedup.saveDeconIndex(bench, k = 4, path, fpp = 0.5, nHashParts = 4)
    assert(Dedup.deconIndexFingerprint(spark, path) === fp,
      "same-benchmark re-save at different tuning must keep the fingerprint")
    // a legacy index saved before the content_digest meta column reads
    // the same fingerprint via the hash-store fallback
    val metaRows = spark.read.parquet(s"$path/meta")
      .select(col("k"), col("fpp"), col("n_hashes"), col("n_hash_parts"))
      .collect().toSeq
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/meta"), true)
    spark.createDataFrame(
        spark.sparkContext.parallelize(metaRows, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("fpp",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("n_hashes",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_hash_parts",
            org.apache.spark.sql.types.IntegerType))))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    assert(Dedup.deconIndexFingerprint(spark, path) === fp,
      "legacy 4-column meta must fingerprint identically via the store scan")
    // legacy meta has no bloom_digest — probes must still serve
    // (verification is digest-gated), not throw
    assert(Dedup.decontaminateAgainstDeconIndex(batch, path).count() > 0)
    // and a bloom heal migrates the legacy meta to the digest layout
    // without changing the fingerprint
    Dedup.rebuildDeconBloom(spark, path)
    val healed = spark.read.parquet(s"$path/meta").schema.fieldNames
    assert(healed.contains("content_digest") && healed.contains("bloom_digest"),
      "heal must persist both digest columns")
    assert(Dedup.deconIndexFingerprint(spark, path) === fp)
    // a different benchmark is different content
    Dedup.saveDeconIndex(docs.where(pmod(col("doc_id"), lit(11)) === 1),
      k = 4, path, nHashParts = 8)
    assert(Dedup.deconIndexFingerprint(spark, path) !== fp,
      "changed benchmark must change the fingerprint")
  }
}
