package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Clusters, Dedup}

/** Deduplication extension queries over `documents`. The exact-Jaccard
  * query is the oracle-checked ground truth; MinHash-LSH and SimHash are
  * the scale-path approximations — also oracle-checked, via DuckDB SQL
  * twins of the FNV-1a/MinHash/SimHash arithmetic (HUGEINT mod-2^64
  * wrapping; see Dedup.minhashLshSql / simhashPairsSql), on top of the
  * ScalaTest recall assertions against the exact pairs.
  */
object DedupQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "d1_exact_dedup_summary" -> ((s, dir) =>
      Dedup.exactSummary(Tables.documents(s, dir))),

    "d2_ngram_jaccard_top20" -> ((s, dir) =>
      Dedup.ngramJaccardTopN(Tables.documents(s, dir), k = 3, topN = 20,
        sampleMod = Some(3))),

    "d3_minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir),
        k = 3, bands = 8, rowsPerBand = 4, threshold = 0.05)),

    "d4_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), maxDist = 3)),

    // SemDeDup-style: IVF-cell clustering, then cosine pairs within a
    // cell only — embedding dedup that never materializes the cross
    // product (cell-boundary misses are the documented trade).
    "d6_semantic_neardup_pairs" -> ((s, dir) =>
      Dedup.semanticNearDupPairs(Tables.embeddings(s, dir),
        nCentroids = 16, minCos = 0.3)),

    // D16: the SemDeDup SELECTION step d6 stops short of — per-vector
    // keep-first verdicts (dropped iff a smaller-id in-cell neighbor
    // within the bound exists; NOT a components closure — 1~3, 2~3
    // without 1~2 keeps both 1 and 2), rolled up per cell so the
    // result stays k rows at any corpus size. Uses d6's nCentroids at
    // a lower cosine bound so the prune provably binds on the fixture
    // embeddings.
    "d16_semdedup_prune" -> ((s, dir) =>
      Dedup.semDedupPrune(Tables.embeddings(s, dir),
          nCentroids = 16, minCos = 0.2)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("dropped"), 1L).otherwise(0L)).cast("long")
            .as("n_dropped"),
          sum(when(!col("dropped"), col("vec_id")).otherwise(0L)).cast("long")
            .as("survivor_checksum"),
          // second moment: equal-count verdict SWAPS that preserve the
          // id sum (keep {1,4} vs {2,3}) cannot also preserve the
          // sum of squares — the pair would otherwise hash-match with
          // different per-vector verdicts
          sum(when(!col("dropped"), col("vec_id") * col("vec_id"))
            .otherwise(0L)).cast("long").as("survivor_checksum2"))
        .orderBy(col("cell"))),

    // Decontamination: shingle containment of the benchmark cohort
    // (doc_id % 97 = 0 as the stand-in benchmark) against the rest
    "d8_contamination" -> ((s, dir) =>
      Dedup.contamination(Tables.documents(s, dir),
        benchPred = pmod(col("doc_id"), lit(97)) === 0, k = 3)),

    // d8's broadcast-Bloom plan twin: bench-shingle bloom probed inside
    // the corpus scan (native codegen expr), exact-confirm semi-join on
    // the survivors — same exact containment output, corpus-side
    // shuffle shrunk from |corpus shingles| to ~|bench shingles|.
    // Different cohort/shingle length than d8 so the two queries don't
    // share a cached subtree by accident.
    "d12_bloom_contamination" -> ((s, dir) =>
      Dedup.bloomContamination(Tables.documents(s, dir),
        benchPred = pmod(col("doc_id"), lit(89)) === 0, k = 5)),

    // Semantic decontamination: d8's embedding-space sibling — flag
    // corpus vectors in a benchmark vector's cosine neighborhood,
    // compared only inside a shared IVF cell (benchmark broadcast)
    "d10_semantic_contamination" -> ((s, dir) =>
      Dedup.semanticContamination(Tables.embeddings(s, dir),
        benchPred = pmod(col("vec_id"), lit(97)) === 0,
        nCentroids = 16, minCos = 0.25)),

    // Edit-distance near-dup on short strings (part names): the
    // fuzzy-matching member of the dedup family. Sampled — O(n·m) per
    // pair is for short keys, not documents.
    "d5_levenshtein_pairs" -> ((s, dir) =>
      levenshteinPairs(s, dir).orderBy(col("id1"), col("id2"))),

    // Pairs → clusters: connected components over the d5 near-dup
    // graph (HashMin label propagation) — the survivor-selection step
    // of the dedup pipeline.
    "d7_neardup_components" -> ((s, dir) =>
      Dedup.connectedComponents(levenshteinPairs(s, dir),
          assumeDistinctPairs = true) // strict id1<id2 join → unique pairs
        .orderBy(col("id"))),

    // Clusters → survivors: keep the best member per near-dup cluster
    // (highest retail price as the quality proxy, ties to lowest id) —
    // the final step of the dedup pipeline: pairs → components → one
    // canonical row each.
    "d9_neardup_survivors" -> ((s, dir) =>
      Dedup.survivors(
        Dedup.connectedComponents(levenshteinPairs(s, dir),
          assumeDistinctPairs = true),
        Tables.part(s, dir).select(col("p_partkey").as("id"),
          col("p_retailprice").as("quality")))),

    // Leakage-safe split assignment: near-dup components (the d7
    // graph) each land whole in one hash-assigned train/val/test
    // split — the operator that PRODUCES splits passing the s14
    // leakage audit. leaked_pairs (pairs straddling splits) is in the
    // oracle-checked output and must be 0 by construction.
    "s21_component_split" -> ((s, dir) => {
      import graft.operators.Sampling
      // item universe is a superset of the paired (%50) nodes so the
      // output exercises singleton components and all three splits
      val items = Tables.part(s, dir)
        .where(pmod(col("p_partkey"), lit(10)) === 0)
        .select(col("p_partkey").as("id"))
      // the O(cohort^2) levenshtein join feeds BOTH the component
      // labels and the leaked-pairs audit below — materialize it once
      // (without this, the audit's lineage re-runs the cross join
      // after componentSplits' internal cache is unpersisted)
      val pairs = levenshteinPairs(s, dir).select(col("id1"), col("id2"))
        .localCheckpoint(true)
      val labeled = Sampling.componentSplits(items, pairs,
        assumeDistinctPairs = true) // strict id1<id2 join -> unique pairs
      val leaked = pairs
        .join(labeled.select(col("id").as("id1"), col("split").as("s1")), "id1")
        .join(labeled.select(col("id").as("id2"), col("split").as("s2")), "id2")
        .where(col("s1") =!= col("s2"))
        .agg(count(lit(1)).as("leaked_pairs"))
      labeled.groupBy(col("split"))
        .agg(count(lit(1)).as("n_items"),
          countDistinct(col("comp")).as("n_comps"),
          sum(col("id")).cast("long").as("id_checksum"))
        .crossJoin(broadcast(leaked))
        .orderBy(col("split"))
    }),

    // Exact duplicated-span removal (RefinedWeb-style): excise every
    // 13-token span occurring >= 2x anywhere in the corpus — span-level
    // surgery on kept documents, vs d1/d3's whole-doc dedup. The
    // drop-now-empty-docs step is the standard pipeline tail, and it
    // also makes the query benchmarkable: under Bench's count()
    // consumption, the bare per-doc frame's outer join (unique-keyed
    // right side) is legally ELIMINATED by Catalyst — the filter on
    // clean_text forces the surgery to actually run.
    "d11_duplicated_span_removal" -> ((s, dir) =>
      Dedup.duplicatedSpanRemoval(Tables.documents(s, dir), k = 13)
        .where(col("clean_text") =!= "")),

    // CCNet-style line-level dedup: drop fixed-width word segments
    // whose document frequency exceeds 1 (cross-doc boilerplate),
    // rebuild affected docs. One 8-byte-hash shuffle + broadcast-back.
    "d13_line_dedup" -> ((s, dir) =>
      Dedup.lineDedup(Tables.documents(s, dir), segWords = 8, maxDf = 1)
        .orderBy(col("doc_id"))),

    // The whole dedup pipeline end to end over documents: LSH
    // candidates → components → survivors → survivor-only rollup.
    "c2_dedup_pipeline" -> ((s, dir) =>
      Dedup.dedupPipelineSummary(Tables.documents(s, dir),
        k = 3, bands = 8, rowsPerBand = 4, threshold = 0.05)),

    // Incremental batch-vs-corpus dedup — the daily-increment shape:
    // every 11th doc arrives as the new batch, the rest is the resident
    // corpus. LSH probe against the corpus' band buckets (persisted
    // form in DedupSimilaritySpec probes the bucket-partitioned index
    // with DPP) + exact-Jaccard verify; corpus buckets larger than 3
    // members are dropped (the degenerate-bucket guard — oracle replays
    // the cap).
    "d14_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.incrementalLshDedup(
        docs.where(pmod(col("doc_id"), lit(11)) =!= 0),
        docs.where(pmod(col("doc_id"), lit(11)) === 0),
        k = 3, bands = 8, rowsPerBand = 4, threshold = 0.05,
        maxBucket = Some(3))
    }),

    // Persisted incremental CLUSTER REGISTRY — the operational tail of
    // the dedup lifecycle: three growing batches register against an
    // on-disk registry (exact cross-batch jaccard pairs as the match
    // source, so the oracle replays the pair rule verbatim), merges
    // land as remap-log edges rather than member rewrites, the log is
    // folded mid-sequence (compaction must be invisible), and the
    // declared result is the resolved (doc, cluster) table. The oracle
    // recomputes the same pairs in SQL and closes them with a
    // recursive CTE — the incremental protocol must equal the one-shot
    // reachability fixpoint. Cohort = every even doc, slices by
    // doc_id % 6, so the union of batch-vs-earlier pairs is exactly
    // "bid % 6 > cid % 6" — one inequality the SQL twin states
    // directly.
    "d17_cluster_registry" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val cohort = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      def slice(b: Int) = cohort.where(pmod(col("doc_id"), lit(6)) === b * 2)
      def earlier(b: Int) = cohort.where(pmod(col("doc_id"), lit(6)) < b * 2)
      withIndexScratch(s, "d17_registry") { reg =>
        Clusters.updateRegistry(s, reg, 0L, slice(0).select(col("doc_id")),
          s.range(0).select(col("id").as("bid"), col("id").as("cid")),
          nDocParts = 16)
        (1 to 2).foreach { b =>
          Clusters.updateRegistry(s, reg, b.toLong,
            slice(b).select(col("doc_id")),
            Dedup.crossJaccardPairs(slice(b), earlier(b), k = 3,
              threshold = 0.05).select(col("bid"), col("cid")))
          // fold the merge log mid-sequence: resolution must be
          // invariant and the next update must run against the folded
          // form (both directions of the compaction contract)
          if (b == 1) Clusters.compactRegistry(s, reg)
        }
        Clusters.resolvedClusters(s, reg).orderBy(col("doc_id"))
      }
    }),

    // d18 — URL-canonical exact dedup (the RefinedWeb/CCNet stage-1
    // rule: normalize URL, first-seen wins). The corpus carries no URL
    // column, so one is synthesized deterministically (the oracle
    // mirrors the construction 1:1) with every normalization rule
    // exercised: scheme/case/www variance by doc_id%4, a trailing
    // slash every 5th doc, tracking params vs pre-sorted params vs a
    // fragment by doc_id%3.
    "d18_url_dedup" -> ((s, dir) => {
      val d = col("doc_id")
      val scheme = when(pmod(d, lit(4)) === 0, lit("http://"))
        .when(pmod(d, lit(4)) === 1, lit("https://www."))
        .when(pmod(d, lit(4)) === 2, lit("HTTPS://"))
        .otherwise(lit("https://WWW."))
      val url = concat(scheme, lit("ex"), pmod(d, lit(2)).cast("string"),
        lit(".COM/p/"), pmod(d, lit(10)).cast("string"),
        when(pmod(d, lit(5)) === 0, lit("/")).otherwise(lit("")),
        when(pmod(d, lit(3)) === 0, lit("?utm_source=x&b=2&a=1"))
          .when(pmod(d, lit(3)) === 1, lit("?b=2&a=1"))
          .otherwise(lit("#frag")))
      Dedup.urlDedup(
          Tables.documents(s, dir).select(col("doc_id"), url.as("url")))
        .orderBy(col("canon_url"))
    }),

    // The composed daily-increment LIFECYCLE the d14 pieces exist for,
    // run end-to-end ON DISK: save the slice-0 corpus index, then for
    // three successive batches probe (save-time bucket stats, DPP),
    // append the survivors, and compact — the sequence a nightly
    // operator runs. Each probe materializes to parquet before its
    // append (the real barrier: a lazy probe evaluated after the
    // append would see its own batch). The oracle replays the whole
    // chain as unrolled CTEs against a growing corpus set. Roles come
    // from doc_id % 12 with roles 4..11 unused: the lifecycle runs 4
    // index writes + 3 compactions per execution, so it demonstrates
    // the SEQUENCE on a deterministic third of the corpus rather than
    // paying full-corpus index-build cost 3× per bench sample — the
    // oracle replays the identical role rule, so the sample is
    // hash-checked, not approximated.
    "c6_incremental_lifecycle" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      withIndexScratch(s, "c6_lsh") { idx =>
        Dedup.saveLshIndex(docs.where(pmod(col("doc_id"), lit(12)) === 0),
          k = 3, bands = 8, rowsPerBand = 4, idx, nBucketParts = 16)
        val probes = (1 to 3).map { b =>
          // scope-bounded cache: the probe references the batch subtree
          // several times (buckets, candidates, verification, output
          // base — the documented dedupAgainstBands recompute) and the
          // survivor append reads it once more
          val batch = docs.where(pmod(col("doc_id"), lit(12)) === b).cache()
          try {
            Dedup.dedupAgainstLshIndex(batch, idx, threshold = 0.05,
                maxBucket = Some(3))
              .write.mode("overwrite").parquet(s"$idx/probe_$b")
            val probed = s.read.parquet(s"$idx/probe_$b")
            Dedup.appendToLshIndex(
              batch.join(probed.where(!col("is_dup")).select(col("doc_id")),
                "doc_id"), idx)
            Dedup.compactLshBands(s, idx, maxFilesPerPart = 1)
            probed.withColumn("batch", lit(b))
          } finally batch.unpersist(blocking = false)
        }
        probes.reduce(_ unionByName _)
          .select(col("batch"), col("doc_id"), col("n_matches"),
            col("match_id"), col("is_dup"))
          .orderBy(col("batch"), col("doc_id"))
      }
    }),

    // Persisted decontamination index — the d14 "build once, probe
    // daily" shape applied to decontamination: the benchmark cohort
    // (doc_id % 97 = 0) is shingled ONCE into an on-disk bloom + hash
    // store, and the arriving batch (doc_id % 7 = 0, benchmark rows
    // excluded) probes it for containment. The bloom and the persisted
    // layout are invisible to the result (exact confirm join, as in
    // d12) — the oracle replays plain exact containment.
    "d15_decon_index" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      withIndexScratch(s, "d15_decon") { idx =>
        Dedup.saveDeconIndex(docs.where(pmod(col("doc_id"), lit(97)) === 0),
          k = 4, idx, nHashParts = 16)
        Dedup.decontaminateAgainstDeconIndex(
          docs.where(pmod(col("doc_id"), lit(7)) === 0 &&
            pmod(col("doc_id"), lit(97)) =!= 0), idx)
      }
    })
  )

  /** Scratch space for queries that build on-disk index artifacts:
    * conf-provided root (set `graft.scratch.dir` to a cluster-visible
    * path in production — the artifacts belong on the same filesystem
    * as the data), defaulting to the driver's tmp locally. The subdir
    * is keyed by the Spark APPLICATION id: within one app executions
    * are serialized (delete-before/-after reuses one dir, so repeated
    * Verify/Bench runs never accrete), while concurrent processes get
    * disjoint dirs — a fixed shared name would let one process's
    * cleanup race the other's probe. Stale siblings from KILLED apps
    * (their finally never ran) are swept by age, judged by the newest
    * mtime down to depth 3 — a dir root's mtime only moves on
    * direct-child changes, so one long write stage (IO landing under
    * `bands/_temporary/...`) would leave the root looking idle while
    * the committer's task dirs churn a grandchild. The body's frame is
    * localCheckpoint'd (materialized off the scratch files) before the
    * cleanup, so the delete cannot race the lazy read. */
  private[queries] def withIndexScratch(s: SparkSession, name: String)(
      body: String => DataFrame): DataFrame = {
    val scratchRoot = s.conf.get("graft.scratch.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft_scratch")
    val idx = s"$scratchRoot/${name}_${s.sparkContext.applicationId}"
    val fs = graft.sources.Hdfs.forPath(s, idx)
    val idxPath = new org.apache.hadoop.fs.Path(idx)
    val rootPath = new org.apache.hadoop.fs.Path(scratchRoot)
    if (fs.exists(rootPath)) {
      val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
      def newestMtime(p: org.apache.hadoop.fs.Path, depth: Int): Long = {
        val st = fs.getFileStatus(p)
        if (depth == 0 || !st.isDirectory) st.getModificationTime
        else (st.getModificationTime +: fs.listStatus(p).toSeq
          .map(c => newestMtime(c.getPath, depth - 1))).max
      }
      fs.listStatus(rootPath)
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(s"${name}_") &&
          st.getPath.getName != idxPath.getName)
        .filter(st => newestMtime(st.getPath, 3) < cutoff)
        .foreach(st => fs.delete(st.getPath, true))
    }
    fs.delete(idxPath, true)
    try body(idx).localCheckpoint(true)
    finally fs.delete(idxPath, true)
  }

  private def levenshteinPairs(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .where(pmod(col("p_partkey"), lit(50)) === 0)
      .select(col("p_partkey"), col("p_name"))
    p.as("a").join(p.as("b"), col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("id1"), col("b.p_partkey").as("id2"),
        levenshtein(col("a.p_name"), col("b.p_name")).as("dist"))
      .where(col("dist") <= 10)
  }

  def oracles: Map[String, String] = Map(
    "d1_exact_dedup_summary" ->
      """SELECT COUNT(*) AS n_docs,
        |       COUNT(DISTINCT md5(text)) AS n_distinct,
        |       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
        |FROM documents""".stripMargin,

    "d2_ngram_jaccard_top20" -> Dedup.ngramJaccardSql(k = 3, topN = 20, sampleMod = Some(3)),

    "d3_minhash_lsh_pairs" ->
      Dedup.minhashLshSql(k = 3, bands = 8, rowsPerBand = 4, threshold = 0.05),

    "d14_incremental_dedup" ->
      Dedup.incrementalLshSql(k = 3, bands = 8, rowsPerBand = 4,
        threshold = 0.05, batchMod = 11, maxBucket = Some(3)),

    "c6_incremental_lifecycle" ->
      Dedup.incrementalLifecycleSql(k = 3, bands = 8, rowsPerBand = 4,
        threshold = 0.05, mod = 12, nBatches = 3, maxBucket = 3),

    // identical synthesized URL, identical normalization rules
    // (Dedup.normalizeUrlSql), first-seen = MIN(doc_id)
    "d18_url_dedup" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    (CASE CAST(doc_id % 4 AS INT)
         |      WHEN 0 THEN 'http://' WHEN 1 THEN 'https://www.'
         |      WHEN 2 THEN 'HTTPS://' ELSE 'https://WWW.' END)
         |    || 'ex' || CAST(doc_id % 2 AS VARCHAR)
         |    || '.COM/p/' || CAST(doc_id % 10 AS VARCHAR)
         |    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
         |    || (CASE CAST(doc_id % 3 AS INT)
         |         WHEN 0 THEN '?utm_source=x&b=2&a=1'
         |         WHEN 1 THEN '?b=2&a=1' ELSE '#frag' END) AS url
         |  FROM documents)
         |SELECT ${Dedup.normalizeUrlSql("url")} AS canon_url,
         |       MIN(doc_id) AS keeper,
         |       CAST(COUNT(*) AS BIGINT) AS n_dups
         |FROM u GROUP BY 1 ORDER BY canon_url""".stripMargin,

    // incremental registry ≡ one-shot reachability: the same exact
    // jaccard pair rule (cross-batch only — bid % 6 > cid % 6), closed
    // by the d7-style recursive CTE, min id per component, singletons
    // as their own cluster
    "d17_cluster_registry" ->
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, ${graft.functions.TextFunctions
               .wsTokensSql("lower(text)")} AS t
         |  FROM documents WHERE doc_id % 2 = 0),
         |p AS (
         |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
         |  FROM toks),
         |sh AS (
         |  SELECT DISTINCT t0.doc_id, t0.tok || ' ' || t1.tok || ' ' || t2.tok AS s
         |  FROM p t0
         |  JOIN p t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
         |  JOIN p t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS bid, b.doc_id AS cid, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND (a.doc_id % 6) > (b.doc_id % 6)
         |  GROUP BY 1, 2),
         |pr AS (
         |  SELECT bid, cid FROM inter
         |  JOIN sz s1 ON s1.doc_id = bid
         |  JOIN sz s2 ON s2.doc_id = cid
         |  WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.05),
         |edges AS (SELECT bid AS src, cid AS dst FROM pr
         |          UNION SELECT cid, bid FROM pr),
         |walk(id, comp) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, w.comp FROM edges e JOIN walk w ON w.id = e.dst),
         |comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
         |SELECT d.doc_id, CAST(COALESCE(c.comp, d.doc_id) AS BIGINT) AS cluster_id
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) d
         |LEFT JOIN comps c ON c.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // the bloom + persisted layout are invisible: exact containment of
    // the arriving batch against the benchmark cohort
    "d15_decon_index" ->
      Dedup.deconIndexSql(k = 4, benchMod = 97, batchMod = 7),

    "d4_simhash_pairs" -> Dedup.simhashPairsSql(maxDist = 3),

    "d6_semantic_neardup_pairs" ->
      Dedup.semanticNearDupSql(dim = 64, nCentroids = 16, minCos = 0.3),

    "d16_semdedup_prune" ->
      Dedup.semDedupPruneSql(dim = 64, nCentroids = 16, minCos = 0.2),

    "d8_contamination" -> Dedup.contaminationSql(k = 3, benchMod = 97),

    // the bloom prefilter is invisible to the result: the oracle is the
    // SAME exact-containment SQL as d8's, at d12's cohort and k
    "d12_bloom_contamination" -> Dedup.contaminationSql(k = 5, benchMod = 89),

    "d10_semantic_contamination" -> Dedup.semanticContaminationSql(
      dim = 64, nCentroids = 16, minCos = 0.25, benchMod = 97),

    "d13_line_dedup" -> Dedup.lineDedupSql(segWords = 8, maxDf = 1),

    "d5_levenshtein_pairs" ->
      """SELECT a.p_partkey AS id1, b.p_partkey AS id2,
        |       levenshtein(a.p_name, b.p_name) AS dist
        |FROM (SELECT p_partkey, p_name FROM part WHERE p_partkey % 50 = 0) a
        |JOIN (SELECT p_partkey, p_name FROM part WHERE p_partkey % 50 = 0) b
        |  ON a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 10
        |ORDER BY id1, id2""".stripMargin,

    // Recursive-CTE reachability: comp = min id reachable from each
    // node in the undirected pair graph — the same fixpoint HashMin
    // label propagation converges to.
    "d7_neardup_components" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.p_partkey AS id1, b.p_partkey AS id2
        |  FROM (SELECT p_partkey, p_name FROM part WHERE p_partkey % 50 = 0) a
        |  JOIN (SELECT p_partkey, p_name FROM part WHERE p_partkey % 50 = 0) b
        |    ON a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 10),
        |edges AS (SELECT id1 AS src, id2 AS dst FROM p
        |          UNION SELECT id2, id1 FROM p),
        |walk(id, comp) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.comp FROM edges e JOIN walk w ON w.id = e.dst)
        |SELECT id, MIN(comp) AS comp FROM walk GROUP BY id ORDER BY id""".stripMargin,

    // Same reachability fixpoint, then best-member pick per component.
    "d9_neardup_survivors" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.p_partkey AS id1, b.p_partkey AS id2
        |  FROM (SELECT p_partkey, p_name FROM part WHERE p_partkey % 50 = 0) a
        |  JOIN (SELECT p_partkey, p_name FROM part WHERE p_partkey % 50 = 0) b
        |    ON a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 10),
        |edges AS (SELECT id1 AS src, id2 AS dst FROM p
        |          UNION SELECT id2, id1 FROM p),
        |walk(id, comp) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.comp FROM edges e JOIN walk w ON w.id = e.dst),
        |comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
        |r AS (
        |  SELECT c.comp, c.id,
        |         ROW_NUMBER() OVER (PARTITION BY c.comp
        |                            ORDER BY pt.p_retailprice DESC, c.id) AS rn
        |  FROM comps c JOIN part pt ON pt.p_partkey = c.id)
        |SELECT comp, COUNT(*) AS n_members,
        |       CAST(MAX(CASE WHEN rn = 1 THEN id END) AS BIGINT) AS survivor
        |FROM r GROUP BY comp ORDER BY comp""".stripMargin,

    // Same reachability fixpoint, then whole-component hash splits;
    // the scalar leaked-pairs subquery proves zero cross-split dups.
    "s21_component_split" -> {
      val splitSql = graft.operators.Sampling.componentSplitSql(
        "COALESCE(c.comp, i.id)")
      s"""WITH RECURSIVE p AS (
         |  SELECT a.p_partkey AS id1, b.p_partkey AS id2
         |  FROM (SELECT p_partkey, p_name FROM part WHERE p_partkey % 50 = 0) a
         |  JOIN (SELECT p_partkey, p_name FROM part WHERE p_partkey % 50 = 0) b
         |    ON a.p_partkey < b.p_partkey
         |  WHERE levenshtein(a.p_name, b.p_name) <= 10),
         |edges AS (SELECT id1 AS src, id2 AS dst FROM p
         |          UNION SELECT id2, id1 FROM p),
         |walk(id, comp) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, w.comp FROM edges e JOIN walk w ON w.id = e.dst),
         |comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
         |items AS (SELECT p_partkey AS id FROM part WHERE p_partkey % 10 = 0),
         |lab AS (
         |  SELECT i.id, COALESCE(c.comp, i.id) AS comp, $splitSql AS split
         |  FROM items i LEFT JOIN comps c ON c.id = i.id)
         |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_items,
         |       CAST(COUNT(DISTINCT comp) AS BIGINT) AS n_comps,
         |       CAST(SUM(id) AS BIGINT) AS id_checksum,
         |       CAST((SELECT COUNT(*) FROM p
         |             JOIN lab a ON a.id = p.id1
         |             JOIN lab b ON b.id = p.id2
         |             WHERE a.split <> b.split) AS BIGINT) AS leaked_pairs
         |FROM lab GROUP BY split ORDER BY split""".stripMargin
    },

    "d11_duplicated_span_removal" ->
      s"""SELECT * FROM (
         |${Dedup.duplicatedSpanRemovalSql(k = 13)}
         |) WHERE clean_text <> ''""".stripMargin,

    "c2_dedup_pipeline" ->
      Dedup.dedupPipelineSql(k = 3, bands = 8, rowsPerBand = 4, threshold = 0.05)
  )
}
