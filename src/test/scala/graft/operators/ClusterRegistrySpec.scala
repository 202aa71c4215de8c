package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The persisted incremental cluster registry ([[Clusters]]) vs the
  * one-shot components ground truth: cross-batch merges, multi-
  * generation remap chains, replay idempotence under the documented
  * crash windows, and log compaction invariance.
  */
class ClusterRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/reg"

  private def fsOf(path: String) = org.apache.hadoop.fs.FileSystem.get(
    new org.apache.hadoop.fs.Path(path).toUri,
    spark.sessionState.newHadoopConf())

  private def docsDf(ids: Long*) = ids.toDF("doc_id")
  private def pairsDf(ps: (Long, Long)*) = ps.toDF("bid", "cid")
  private val noPairs = Seq.empty[(Long, Long)].toDF("bid", "cid")

  private def resolved(path: String): Map[Long, Long] =
    Clusters.resolvedClusters(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bridging doc merges two clusters; multi-generation chains resolve; compaction is invariant") {
    val path = tmp("reg1")
    Clusters.updateRegistry(spark, path, 0L, docsDf(10, 20, 30), noPairs,
      nDocParts = 4)
    assert(resolved(path) === Map(10L -> 10L, 20L -> 20L, 30L -> 30L))
    // two independent merges, each minting a remap generation
    Clusters.updateRegistry(spark, path, 1L, docsDf(8), pairsDf(8L -> 10L))
    Clusters.updateRegistry(spark, path, 2L, docsDf(6), pairsDf(6L -> 20L))
    assert(resolved(path) ===
      Map(10L -> 8L, 8L -> 8L, 20L -> 6L, 6L -> 6L, 30L -> 30L))
    // the hard case: doc 5 matches docs 10 AND 20 — whose member roots
    // (10, 20) are already one remap generation stale — so clusters
    // {8,10} and {6,20} must merge under 5, chaining 10→8→5 and 20→6→5
    Clusters.updateRegistry(spark, path, 3L, docsDf(5),
      pairsDf(5L -> 10L, 5L -> 20L))
    val after = resolved(path)
    assert(after === Map(5L -> 5L, 6L -> 5L, 8L -> 5L, 10L -> 5L,
      20L -> 5L, 30L -> 30L))
    // one-shot ground truth over the union of every pair ever fed
    val oneShot = Dedup.connectedComponents(
      pairsDf(8L -> 10L, 6L -> 20L, 5L -> 10L, 5L -> 20L)
        .select(col("bid").as("id1"), col("cid").as("id2")),
      assumeDistinctPairs = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.filterNot { case (id, c) => id == c && !oneShot.contains(id) }
      === oneShot)
    // compaction folds the log without changing a single answer, and a
    // resurrected stale log re-applies as a no-op (the crash-ordering
    // guarantee: folded members carry no old roots)
    val staleLog = spark.read.parquet(s"$path/remaps")
      .select(col("old_root"), col("new_root"),
        col("batch_id").cast("long").as("batch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    Clusters.compactRegistry(spark, path)
    assert(resolved(path) === after)
    val fs = fsOf(path)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/remaps"))
      .exists(_.getPath.getName.startsWith("batch_id=")),
      "compaction must truncate the merge log")
    staleLog.toDF("old_root", "new_root", "batch_id")
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$path/remaps")
    assert(resolved(path) === after,
      "re-applying a folded log must be a no-op")
    Clusters.compactRegistry(spark, path)
    assert(resolved(path) === after)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("same-batch docs matching one cluster, and a new-min bid, label correctly") {
    val path = tmp("reg2")
    Clusters.updateRegistry(spark, path, 0L, docsDf(50, 60), noPairs,
      nDocParts = 4)
    // docs 40 and 45 both match 50 in ONE batch; 40 < 50 so the merged
    // cluster's canonical id is the NEW doc — 50 gets a remap to 40
    Clusters.updateRegistry(spark, path, 1L, docsDf(40, 45),
      pairsDf(40L -> 50L, 45L -> 50L))
    assert(resolved(path) ===
      Map(40L -> 40L, 45L -> 40L, 50L -> 40L, 60L -> 60L))
  }

  test("replay overwrites its own partitions; a torn update (members landed, remaps lost) heals on replay") {
    val path = tmp("reg3")
    Clusters.updateRegistry(spark, path, 0L, docsDf(10, 20), noPairs,
      nDocParts = 4)
    Clusters.updateRegistry(spark, path, 1L, docsDf(5),
      pairsDf(5L -> 10L, 5L -> 20L))
    val want = resolved(path)
    assert(want === Map(5L -> 5L, 10L -> 5L, 20L -> 5L))
    // straight replay: byte-identical dynamic overwrite
    Clusters.updateRegistry(spark, path, 1L, docsDf(5),
      pairsDf(5L -> 10L, 5L -> 20L))
    assert(resolved(path) === want)
    // torn crash window: batch 1's remap slice lost after its members
    // landed — readers see stale-but-consistent pre-merge clusters,
    // never a mix
    val fs = fsOf(path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/remaps/batch_id=1"), true)
    spark.catalog.refreshByPath(s"$path/remaps")
    assert(resolved(path) === Map(5L -> 5L, 10L -> 10L, 20L -> 20L))
    // the at-least-once replay recomputes the batch from the registry
    // EXCLUDING its own partitions, so it heals exactly
    Clusters.updateRegistry(spark, path, 1L, docsDf(5),
      pairsDf(5L -> 10L, 5L -> 20L))
    assert(resolved(path) === want)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("an unregistered pair cid refuses loudly") {
    val path = tmp("reg4")
    Clusters.updateRegistry(spark, path, 0L, docsDf(10), noPairs,
      nDocParts = 4)
    val ex = intercept[IllegalArgumentException] {
      Clusters.updateRegistry(spark, path, 1L, docsDf(5),
        pairsDf(5L -> 99L))
    }
    assert(ex.getMessage.contains("not registered"), ex.getMessage)
  }

  test("a pair bid outside the batch's newDocs refuses loudly (no memberless cluster roots)") {
    val path = tmp("reg6")
    Clusters.updateRegistry(spark, path, 0L, docsDf(10), noPairs,
      nDocParts = 4)
    // bid 5 is not in newDocs ([7]) — accepting it would mint a
    // component label (5) with no member row, a canonical id that
    // resolvedClusters never returns
    val ex = intercept[IllegalArgumentException] {
      Clusters.updateRegistry(spark, path, 1L, docsDf(7),
        pairsDf(5L -> 10L))
    }
    assert(ex.getMessage.contains("not in this batch"), ex.getMessage)
  }

  test("re-registering a doc under a NEW batch id refuses loudly (one row per doc); same-id replay stays legal") {
    val path = tmp("reg7")
    Clusters.updateRegistry(spark, path, 0L, docsDf(10, 20), noPairs,
      nDocParts = 4)
    val ex = intercept[IllegalArgumentException] {
      Clusters.updateRegistry(spark, path, 1L, docsDf(20, 30), noPairs)
    }
    assert(ex.getMessage.contains("already registered"), ex.getMessage)
    // the refused batch wrote nothing
    assert(resolved(path) === Map(10L -> 10L, 20L -> 20L))
    // a genuine replay (same batch id) is still the documented no-op
    Clusters.updateRegistry(spark, path, 0L, docsDf(10, 20), noPairs)
    assert(resolved(path) === Map(10L -> 10L, 20L -> 20L))
  }

  test("a rejected FIRST update pins nothing: the retry's nDocParts wins") {
    val path = tmp("reg8")
    // first-ever call carries pairs against an empty registry — it
    // must throw BEFORE meta is created, or the failed call's
    // partition arithmetic would silently outlive it
    intercept[IllegalArgumentException] {
      Clusters.updateRegistry(spark, path, 0L, docsDf(5),
        pairsDf(5L -> 10L), nDocParts = 16)
    }
    Clusters.updateRegistry(spark, path, 0L, docsDf(10), noPairs,
      nDocParts = 4)
    assert(spark.read.parquet(s"$path/meta").head().getInt(0) === 4,
      "the successful creation call's layout must be the pinned one")
    assert(resolved(path) === Map(10L -> 10L))
  }

  test("consolidation folds GC'd batch partitions into one archive dir; resolution and live batches unaffected") {
    val path = tmp("reg9")
    Clusters.updateRegistry(spark, path, 0L, docsDf(10, 20, 30), noPairs,
      nDocParts = 4)
    Clusters.updateRegistry(spark, path, 1L, docsDf(8), pairsDf(8L -> 10L))
    Clusters.updateRegistry(spark, path, 2L, docsDf(6), pairsDf(6L -> 20L))
    Clusters.updateRegistry(spark, path, 3L, docsDf(40), pairsDf(40L -> 30L))
    val want = resolved(path)
    assert(want === Map(8L -> 8L, 10L -> 8L, 6L -> 6L, 20L -> 6L,
      30L -> 30L, 40L -> 30L))
    // batches 0..2 are at or below the (simulated) marker floor — fold
    // their member partitions into the RESERVED archive partition and
    // the log into members
    Clusters.compactRegistry(spark, path, consolidateUpTo = Some(2L))
    val fs = fsOf(path)
    val archiveDir = s"batch_id=${Clusters.ArchiveBatchId}"
    def batchDirs() = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$path/members"))
      .map(_.getPath.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(batchDirs() === Seq(archiveDir, "batch_id=3"), batchDirs())
    assert(resolved(path) === want, "consolidation must not move answers")
    // the LIVE batch above the floor still replays in place...
    Clusters.updateRegistry(spark, path, 3L, docsDf(40), pairsDf(40L -> 30L))
    assert(resolved(path) === want)
    // ...and new batches merge against consolidated rows as before
    Clusters.updateRegistry(spark, path, 4L, docsDf(5),
      pairsDf(5L -> 10L, 5L -> 20L))
    assert(resolved(path) === Map(5L -> 5L, 6L -> 5L, 8L -> 5L, 10L -> 5L,
      20L -> 5L, 30L -> 30L, 40L -> 30L))
    // idempotent: re-consolidating at the same floor is a no-op
    Clusters.compactRegistry(spark, path, consolidateUpTo = Some(2L))
    assert(batchDirs().size === 3) // archive, 3, 4
    // an ILLEGAL replay of a consolidated id (a caller passing an upTo
    // above a still-replayable batch, or manual driving) must throw on
    // the re-registration guard — never silently dynamic-overwrite the
    // archive (the reserved id is what keeps the archive out of the
    // replay's self-exclusion)
    intercept[IllegalArgumentException] {
      Clusters.updateRegistry(spark, path, 1L, docsDf(8), pairsDf(8L -> 10L))
    }
    assert(resolved(path).size === 7, "the refused replay wrote nothing")
    // the reserved id itself is not a legal batch id
    intercept[IllegalArgumentException] {
      Clusters.updateRegistry(spark, path, Clusters.ArchiveBatchId,
        docsDf(99), noPairs)
    }
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("Skip drops redelivered docs and their pairs first-writer-wins; Trust skips the membership scan") {
    val path = tmp("reg10")
    Clusters.updateRegistry(spark, path, 0L, docsDf(10, 20), noPairs,
      nDocParts = 4)
    // doc 10 redelivered in batch 1 alongside genuinely new docs: Skip
    // keeps its ORIGINAL registration (and drops its pairs with it) —
    // doc 7's pair still lands
    Clusters.updateRegistry(spark, path, 1L, docsDf(10, 7),
      pairsDf(10L -> 20L, 7L -> 20L), onRegistered = Clusters.Skip)
    assert(resolved(path) === Map(10L -> 10L, 20L -> 7L, 7L -> 7L),
      "the redelivered doc's pair must not have merged 10 and 20")
    // an all-redelivered batch under Skip is a clean no-op
    Clusters.updateRegistry(spark, path, 2L, docsDf(10, 20), noPairs,
      onRegistered = Clusters.Skip)
    assert(resolved(path) === Map(10L -> 10L, 20L -> 7L, 7L -> 7L))
    // Trust writes without scanning — correct when ids really are new
    Clusters.updateRegistry(spark, path, 3L, docsDf(30), noPairs,
      onRegistered = Clusters.Trust)
    assert(resolved(path) === Map(10L -> 10L, 20L -> 7L, 7L -> 7L,
      30L -> 30L))
  }

  test("lookupClusters: point lookups equal the full resolution, off a part-pruned members scan") {
    val path = tmp("reg_lookup")
    Clusters.updateRegistry(spark, path, 0L, docsDf(10, 20, 30, 41), noPairs,
      nDocParts = 4)
    Clusters.updateRegistry(spark, path, 1L, docsDf(5),
      pairsDf(5L -> 10L, 5L -> 20L))
    val want = resolved(path)
    val ids = Seq(10L, 41L, 999L) // two registered (one remapped), one not
    val got = Clusters.lookupClusters(spark, path, ids)
    assert(got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === want.filter(kv => ids.contains(kv._1)),
      "lookups must equal resolvedClusters filtered to the ids " +
        "(unregistered ids absent)")
    // the whole point of the API: the members read is pruned to the
    // ids' own `part` partitions — never a full members scan
    val scans = got.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString
            .contains("members")) => s
    }
    assert(scans.nonEmpty)
    // ids 10, 41, 999 hit parts {2, 1, 3} of 4 — partition filters
    // must be present and prune part 0 out of the scan
    assert(scans.forall(_.partitionFilters.nonEmpty),
      scans.map(_.toString).mkString("\n"))
    val scannedFiles = scans.flatMap(s =>
      s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
        .flatMap(_.files.map(_.getPath.toString)))
    assert(scannedFiles.nonEmpty && scannedFiles.forall(!_.contains("part=0")),
      s"part 0 must be pruned out, scanned: $scannedFiles")
  }

  test("fixture slices: incremental registry ≡ one-shot components over the union of cross-batch pairs") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val cohort = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    def slice(b: Int) = cohort.where(pmod(col("doc_id"), lit(6)) === b * 2)
    def earlier(b: Int) = cohort.where(pmod(col("doc_id"), lit(6)) < b * 2)
    val path = tmp("reg5")
    Clusters.updateRegistry(spark, path, 0L,
      slice(0).select(col("doc_id")), noPairs, nDocParts = 8)
    val allPairs = (1 to 2).map { b =>
      val p = Dedup.crossJaccardPairs(slice(b), earlier(b), k = 3,
          threshold = 0.05)
        .select(col("bid"), col("cid")).localCheckpoint()
      Clusters.updateRegistry(spark, path, b.toLong,
        slice(b).select(col("doc_id")), p)
      p
    }.reduce(_ unionByName _)
    val got = resolved(path)
    val comps = Dedup.connectedComponents(
        allPairs.select(col("bid").as("id1"), col("cid").as("id2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = cohort.select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => id -> comps.getOrElse(id, id)).toMap
    assert(got.size === want.size)
    assert(got === want)
    assert(comps.nonEmpty, "fixture must actually produce near-dup pairs")
    fsOf(path).delete(new org.apache.hadoop.fs.Path(path), true)
  }
}
