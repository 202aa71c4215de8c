package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Approximate operators vs their exact ground truth: MinHash-LSH and
  * SimHash candidate quality, LSH-cosine vs brute force (the
  * "rows-only" queries get their real correctness check here).
  */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("minhash-LSH pairs report exact jaccard and respect the threshold") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val pairs = Dedup.minhashLshPairs(docs, k = 3, bands = 8, rowsPerBand = 4,
      threshold = 0.05).collect()
    // verification step computes EXACT jaccard → no false positives
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.05))
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.forall { case (a, b) => a < b })
    assert(ids.distinct.length === ids.length)
  }

  test("minhash-LSH recalls the strongest exact near-dup pairs") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val exactTop = Dedup.ngramJaccardTopN(docs, k = 3, topN = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
    val lsh = Dedup.minhashLshPairs(docs, k = 3, bands = 8, rowsPerBand = 4,
      threshold = 0.0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every exact pair with jaccard ≥ .10 should be found by 8×4 LSH
    val strong = exactTop.filter(_._3 >= 0.10).map(t => (t._1, t._2))
    val recalled = strong.count(lsh.contains)
    assert(strong.isEmpty || recalled.toDouble / strong.length >= 0.8,
      s"LSH recalled $recalled of ${strong.length} strong pairs")
  }

  test("bloom contamination: bit-identical to the plain exact plan") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val pred = pmod(col("doc_id"), lit(97)) === 0
    val plain = Dedup.contamination(docs, pred, k = 3).collect().toSeq
    val bloomed = Dedup.bloomContamination(docs, pred, k = 3).collect().toSeq
    assert(bloomed === plain)
  }

  test("bloom contamination: exact even at a 50% false-positive rate — the confirm join owns correctness") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val pred = pmod(col("doc_id"), lit(97)) === 0
    val plain = Dedup.contamination(docs, pred, k = 3).collect().toSeq
    // fpp=0.5 floods the prefilter with false positives; the output must
    // not move — pruning quality is a performance knob, never a
    // correctness one
    val sloppy = Dedup.bloomContamination(docs, pred, k = 3, fpp = 0.5)
      .collect().toSeq
    assert(sloppy === plain)
  }

  test("bloom probe expression: members always hit, non-members mostly pruned, null in → null out") {
    val members = spark.range(0, 1000).select(col("id"))
    val bloom = members.stat.bloomFilter("id", 1000, 0.01)
    val bytes = { val bo = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bo); bo.toByteArray }
    def probe(df: org.apache.spark.sql.DataFrame) = df.select(
      graft.functions.BloomExprs.mightContainLong(col("id"), bytes).as("hit"))
    // no false negatives — the property the prefilter's exactness
    // argument rests on
    assert(probe(members).where(!col("hit")).count() === 0)
    // distant non-members: pruned at ~the configured fpp (generous 10x
    // slack — this asserts the filter PRUNES, not its exact rate)
    val out = spark.range(1000000, 1010000).select(col("id"))
    val fps = probe(out).where(col("hit")).count()
    assert(fps < 1000, s"$fps false positives in 10000 probes at fpp=0.01")
    val nullRow = spark.sql("SELECT CAST(NULL AS BIGINT) AS id")
    assert(probe(nullRow).collect()(0).isNullAt(0))
  }

  test("simhash: near-identical docs collide, fingerprint is stable") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about spark query engines")
    ).toDF("doc_id", "text")
    val fps = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
    val pairs = Dedup.simhashPairs(docs, maxDist = 3).collect()
    assert(pairs.exists(r => r.getLong(0) === 1L && r.getLong(1) === 2L))
  }

  test("LSH cosine pairs match brute-force cosine for recalled pairs") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val lsh = Similarity.lshCosinePairs(emb, dim = 64, nBits = 8, minCos = 0.5)
    val got = lsh.collect()
    got.foreach { r =>
      assert(r.getAs[Double]("cos") >= 0.5 && r.getAs[Double]("cos") <= 1.0 + 1e-9)
    }
  }

  test("gram_hashes: position order, duplicates kept, FNV-1a of the joined gram") {
    import graft.functions.{Registry, ShingleHashes}
    // reference: FNV-1a over the UTF-8 bytes of the space-joined gram —
    // the exact arithmetic the oracle's gram-string grouping stands in for
    def fnv(s: String): Long =
      s.getBytes("UTF-8").foldLeft(ShingleHashes.FnvOffset) { (h, b) =>
        (h ^ (b & 0xffL)) * ShingleHashes.FnvPrime
      }
    val df = Seq((1L, "m n o m n o"), (2L, "a b")).toDF("doc_id", "text")
      .select(col("doc_id"),
        Registry.gramHashes(split(col("text"), " "), 3).as("gh"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val t = "m n o m n o".split(" ")
    val want = (0 to 3).map(i => fnv(t.slice(i, i + 3).mkString(" ")))
    assert(got(1L) === want)              // all 4 positions, in order
    assert(got(1L)(0) === got(1L)(3))     // duplicate gram hashes KEPT
    assert(got(2L) === Seq.empty)         // n < k -> empty
  }

  test("duplicated-span removal: cross-doc and within-doc spans excised, short docs untouched") {
    val docs = Seq(
      (1L, "a b c d e f"),   // shares "a b c" with doc 2
      (2L, "x y a b c z"),
      (3L, "p q r"),         // unique 3-gram — untouched
      (4L, "s t"),           // n < k — no grams, untouched
      (5L, "m n o m n o")    // within-doc repeat: every token covered
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanRemoval(docs, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((6L, 3L, "d e f")))
    assert(got(2L) === ((6L, 3L, "x y z")))
    assert(got(3L) === ((3L, 0L, "p q r")))
    assert(got(4L) === ((2L, 0L, "s t")))
    // "m n o" occurs at starts 1 and 4: both occurrences removed (the
    // symmetric all-occurrences rule), leaving an empty document
    assert(got(5L) === ((6L, 6L, "")))
  }

  test("duplicated-span removal: randomized corpora match an independent in-memory reference") {
    // brute-force reference: gram STRINGS counted globally, token kept
    // iff no duplicated gram covers its position — the same independent
    // formulation as the DuckDB oracle, here over random corpora and
    // several k (the fixed fixture can't explore overlap interactions)
    def reference(docs: Seq[(Long, String)], k: Int): Map[Long, String] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val grams = toks.toSeq.flatMap { case (id, ts) =>
        (0 to ts.length - k).map(i => (id, i, ts.slice(i, i + k).mkString(" ")))
      }
      val dup = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
      toks.map { case (id, ts) =>
        val starts = grams.collect { case (`id`, i, g) if dup(g) => i }.toSet
        id -> ts.zipWithIndex.collect {
          case (t, i) if !(math.max(0, i - k + 1) to i).exists(starts) => t
        }.mkString(" ")
      }
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3; k <- Seq(2, 3, 5)) {
      val vocab = Vector("a", "b", "c", "d") // tiny vocab forces dups
      val docs = (1L to 40L).map { id =>
        val n = 1 + rnd.nextInt(12)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = Dedup.duplicatedSpanRemoval(docs.toDF("doc_id", "text"), k)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(got === reference(docs, k), s"trial=$trial k=$k")
    }
  }

  test("line dedup: cross-doc segments die, within-doc repeats survive, rebuild is ordered") {
    import org.apache.spark.sql.functions.md5
    // segWords=2 segments: doc1 = ["a b","c d","e f"], doc2 = ["c d","x y"],
    // doc3 = ["p q","p q"] (within-doc repeat only), doc4 = ["c d"]
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "c d x y"),
      (3L, "p q p q"),
      (4L, "c d")
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, segWords = 2, maxDf = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def h(s: String) = spark.range(1).select(md5(lit(s))).head.getString(0)
    // "c d" sits in docs 1, 2, 4 (df=3 > 1) → removed everywhere;
    // doc 3's repeated "p q" has df=1 → untouched, so doc 3 is absent
    assert(got.keySet === Set(1L, 2L, 4L))
    assert(got(1L) === ((3L, 1L, h("a b e f"))))
    assert(got(2L) === ((2L, 1L, h("x y"))))
    assert(got(4L) === ((1L, 1L, h("")))) // fully-boilerplate doc
  }

  test("line dedup: broadcast and sort-merge frequent-set joins agree; broadcast is in the plan") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val bc = Dedup.lineDedup(docs, segWords = 8, maxDf = 1, broadcastFrequent = true)
    val smj = Dedup.lineDedup(docs, segWords = 8, maxDf = 1, broadcastFrequent = false)
    assert(bc.orderBy("doc_id").collect().toSeq ===
      smj.orderBy("doc_id").collect().toSeq)
    val plan = bc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast frequent-set join in:\n$plan")
  }

  test("connected components: chains, cliques, singleton pairs, multi-round convergence") {
    // component {1,2,3,4} is a 4-chain (needs >1 HashMin round),
    // {10,11,12} a triangle, {20,21} a lone pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id1", "id2")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: throws instead of silently stopping short of the fixpoint") {
    // a 7-chain needs ~3 HashMin rounds; maxIter=1 must fail loudly, not
    // return labels that diverge from the d7 recursive-CTE oracle
    val chain = (1L until 7L).map(i => (i, i + 1)).toDF("id1", "id2")
    intercept[IllegalStateException](
      Dedup.connectedComponents(chain, maxIter = 1).collect())
    // and with headroom the same graph converges to one component
    val ok = Dedup.connectedComponents(chain, maxIter = 10).collect()
      .map(r => r.getLong(1)).toSet
    assert(ok === Set(1L))
  }

  test("connected components: hash-scale node ids don't overflow the convergence potential") {
    // ids near Long.MaxValue (the xxhash64 fingerprint regime): the
    // potential Σcomp must accumulate in decimal, not long — a long sum
    // of two such ids overflows (ANSI throw / silent wrap)
    val m = Long.MaxValue
    val pairs = Seq((m - 5, m - 1), (m - 9, m - 5), (m - 20, m - 18))
      .toDF("id1", "id2")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(
      (m - 1) -> (m - 9), (m - 5) -> (m - 9), (m - 9) -> (m - 9),
      (m - 18) -> (m - 20), (m - 20) -> (m - 20)))
  }

  test("connected components: deep chains converge via the adaptive pointer-jumping switch") {
    // a 64-node path has diameter 63: pure HashMin cannot finish inside
    // 12 rounds; the adaptive switch engages path doubling after
    // max(4, maxIter/3) unconverged rounds and the rest finish in
    // O(log d) (sf1 sweep regression: chained near-dups build registry
    // batch graphs hundreds deep, which used to trip maxIter=20)
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("id1", "id2")
    val comps = Dedup.connectedComponents(chain, maxIter = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.values.toSet === Set(1L))
    assert(comps.keySet === (1L to 64L).toSet)
    // forced-from-round-0 jumping still works and agrees
    val forced = Dedup.connectedComponents(chain, maxIter = 12,
        pointerJumping = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(forced === comps)
    // a budget too small for even the jump rounds still fails loudly:
    // maxIter=3 < jumpAfter means pure HashMin only, 3 < diameter
    intercept[IllegalStateException](
      Dedup.connectedComponents(chain, maxIter = 3).collect())
  }

  test("IVF: full probe equals brute force exactly; partial probe recalls (recall@k)") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, sampleMod = 10, k = 5))
    // probing every cell degenerates to exhaustive search — results must
    // match brute force bit-for-bit (same candidates, same tie order)
    val full = pairs(Similarity.ivfSearch(emb, k = 5, nCentroids = 8,
      nProbe = 8, sampleMod = 10))
    assert(full === exact)
    // the accuracy/throughput dial: half the cells still recalls most
    // true neighbors on the testdata
    val partial = pairs(Similarity.ivfSearch(emb, k = 5, nCentroids = 8,
      nProbe = 4, sampleMod = 10))
    val recall = exact.count(partial.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
  }

  test("persisted IVF index: reload probes identically; scan prunes to probed cells") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val (index, assigned) = Similarity.buildIvf(emb, k = 8)
    val queries = emb.where(col("vec_id") % 10 === 0)
    val fresh = Similarity.ivfTopK(index, assigned, queries, k = 5, nProbe = 3)
      .collect().map(_.toSeq).toSeq

    val path = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.saveIvf(index, assigned, path)
    val (loaded, cells) = Similarity.loadIvf(spark, path)
    assert(loaded.centroids.map(_._1).toSeq === index.centroids.map(_._1).toSeq)
    val reloaded = Similarity.ivfTopK(loaded, cells, queries, k = 5, nProbe = 3)
    assert(reloaded.collect().map(_.toSeq).toSeq === fresh)
    // the probe joins on the PARTITION column: dynamic partition
    // pruning restricts the cells scan to the probed partitions
    val plan = reloaded.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
  }

  test("incremental IVF append: new vectors land in their nearest cells; exhaustive probe equals brute force over the union") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val old = emb.where(col("vec_id") % 2 === 0)
    val fresh = emb.where(col("vec_id") % 2 =!= 0)
    val (index, assigned) = Similarity.buildIvf(old, k = 8)
    val path = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    Similarity.saveIvf(index, assigned, path)
    Similarity.appendToIvf(index, fresh, path)
    val (loaded, cells) = Similarity.loadIvf(spark, path)
    // nothing lost, nothing rebuilt: counts add up and the resident
    // half's assignment is byte-identical to the original save
    assert(cells.count() === emb.count())
    val residentCells = cells.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assigned.select("vec_id", "cell").collect()
      .foreach { r => assert(residentCells(r.getLong(0)) === r.getInt(1)) }
    // probing every cell degenerates to exhaustive search over old+new
    val queries = emb.where(col("vec_id") % 10 === 0)
    val got = Similarity.ivfTopK(loaded, cells, queries, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(emb, sampleMod = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got === exact)
  }

  test("int8-quantized top-k: high recall vs brute force; rescore scores are exact") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, sampleMod = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getAs[Double]("cos")).toMap
    val quant = Similarity.quantizedTopK(emb, sampleMod = 10, k = 5, rescoreK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getAs[Double]("cos")).toMap
    val recall = exact.keySet.count(quant.keySet.contains).toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall@5 = $recall")
    // every surviving neighbor's score comes from the EXACT rescore —
    // identical to brute force where the pair overlaps
    quant.keySet.intersect(exact.keySet).foreach { k =>
      assert(quant(k) === exact(k))
    }
  }

  test("nearDupPairs refuses a silent full-corpus cross join") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val e = intercept[IllegalArgumentException] {
      Similarity.nearDupPairs(emb, minCos = 0.9)
    }
    assert(e.getMessage.contains("lshCosinePairs"))
    // explicit opt-in still works (small cohort)
    val pairs = Similarity.nearDupPairs(emb.limit(20), minCos = -1.0,
      allowFullCorpus = true)
    assert(pairs.count() === 20L * 19 / 2)
  }

  test("exact dedup keeps the lowest doc_id per text") {
    val docs = Seq((5L, "same"), (2L, "same"), (9L, "other")).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 9L))
  }

  test("semantic dedup through trained centroids: dup-heavy corpus keeps cells (and pair work) bounded; exact dups never missed") {
    // 8 exact copies of every embedding, ids shifted per copy — the
    // corpus where the seed IVF collapses (TrainedIvfSpec pins the
    // assignment side). For DEDUP the collapse is quadratic, not just
    // slow: the in-cell pair join does sum(C(cell,2)) comparisons, so
    // one hot cell holding most of the corpus is ~(n/2)^2 pair work.
    val base = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val nBase = base.count()
    val emb = (0 until 8).map(c =>
        base.select((col("vec_id") + lit(c * 10000L)).as("vec_id"), col("embedding")))
      .reduce(_.unionByName(_)).cache()
    try {
      def pairWork(assigned: org.apache.spark.sql.DataFrame): Long =
        assigned.groupBy("cell").count()
          .collect().map(r => { val n = r.getLong(1); n * (n - 1) / 2 }).sum
      val (_, seedCells) = Similarity.buildIvf(emb, k = 16)
      val (_, trainedCells) = Similarity.buildIvfTrained(emb, k = 16)
      val (seedWork, trainedWork) = (pairWork(seedCells), pairWork(trainedCells))
      // trained cells bound every pair block; collapsed seed cells pay
      // multiples of that (>= 3x on this fixture; measured ~8x)
      assert(trainedWork * 3 <= seedWork,
        s"seed pair work $seedWork vs trained $trainedWork")
      // correctness of the trained variant: every one of the 8-copy
      // groups' C(8,2) identical pairs is found — identical vectors
      // share a nearest centroid by construction, so exact-dup recall
      // is 1.0 regardless of where k-means put the centroids
      val pairs = Dedup.semanticNearDupPairsTrained(emb, nCentroids = 16,
        minCos = 0.999999)
      val exactDupPairs = pairs
        .where(pmod(col("id1"), lit(10000L)) === pmod(col("id2"), lit(10000L)))
        .count()
      assert(exactDupPairs >= nBase * 28,
        s"expected >= ${nBase * 28} exact-dup pairs (8 copies = C(8,2)=28 per " +
          s"base vector), got $exactDupPairs")
    } finally emb.unpersist()
  }

  // ------------------------- incremental dedup vs a persisted LSH index

  test("incremental dedup: persisted-index probe equals the in-memory form; band scan is DPP-pruned") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.where(pmod(col("doc_id"), lit(11)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(11)) === 0)
    val inMem = Dedup.incrementalLshDedup(corpus, batch, k = 3, bands = 8,
        rowsPerBand = 4, threshold = 0.05, maxBucket = Some(3))
      .collect().map(_.toSeq).toSeq
    assert(inMem.nonEmpty)
    val path = java.nio.file.Files.createTempDirectory("lsh_idx").toString
    Dedup.saveLshIndex(corpus, k = 3, bands = 8, rowsPerBand = 4, path)
    val probed = Dedup.dedupAgainstLshIndex(batch, path,
      threshold = 0.05, maxBucket = Some(3))
    assert(probed.collect().map(_.toSeq).toSeq === inMem)
    // the probe joins on the PARTITION column (part = bucket % n):
    // dynamic partition pruning restricts the band scan to the
    // partitions the batch's own buckets hash into
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
  }

  test("incremental dedup: capped probe reads save-time stats (ONE band-data scan), appends keep sizes fresh") {
    // pre-AQE physical plan: AdaptiveSparkPlanExec is a leaf wrapper,
    // so collecting on executedPlan would see no scans at all
    def scansOf(df: org.apache.spark.sql.DataFrame, sub: String): Int =
      df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(sub)) => s
      }.size
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.where(pmod(col("doc_id"), lit(11)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(11)) === 0)
    val path = java.nio.file.Files.createTempDirectory("lsh_stats").toString
    Dedup.saveLshIndex(corpus, k = 3, bands = 8, rowsPerBand = 4, path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/stats")))
    val probed = Dedup.dedupAgainstLshIndex(batch, path,
      threshold = 0.05, maxBucket = Some(3))
    // the capped probe's whole point: bucket sizes come from the tiny
    // stats table, so the band DATA is scanned exactly once (the old
    // probe-time counting path scanned it twice)
    assert(scansOf(probed, "/bands") === 1,
      probed.queryExecution.executedPlan.toString)
    assert(scansOf(probed, "/stats") === 1,
      probed.queryExecution.executedPlan.toString)
    val viaStats = probed.collect().map(_.toSeq).toSeq
    // freshness across appends: the template family is under cap=7 in
    // the saved slice but over it once the append's copies join the
    // bucket — the probe must see summed (save + append) sizes
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val p2 = java.nio.file.Files.createTempDirectory("lsh_stats2").toString
    Dedup.saveLshIndex(
      ((1L to 5L).map(i => (i, template)) :+
        (6L, "unrelated resident text about columnar storage layouts"))
        .toDF("doc_id", "text"),
      k = 2, bands = 4, rowsPerBand = 2, p2)
    Dedup.appendToLshIndex(
      (101L to 104L).map(i => (i, template)).toDF("doc_id", "text"), p2)
    val tb = Seq((500L, template)).toDF("doc_id", "text")
    val capped = Dedup.dedupAgainstLshIndex(tb, p2, threshold = 0.5,
      maxBucket = Some(7)).collect().head
    assert(capped.getAs[Boolean]("is_dup") === false,
      s"9-member post-append bucket must trip cap=7 via summed stats: $capped")
    val uncapped = Dedup.dedupAgainstLshIndex(tb, p2, threshold = 0.5)
      .collect().head
    assert(uncapped.getLong(1) === 9L, s"$uncapped")
    // legacy index without stats/: same results via the counting fallback
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats"), true)
    val fallback = Dedup.dedupAgainstLshIndex(batch, path,
      threshold = 0.05, maxBucket = Some(3))
    assert(fallback.collect().map(_.toSeq).toSeq === viaStats)
    // and the migration path: backfill recreates exact counts from the
    // band data, putting the legacy index back on the one-scan plan
    Dedup.backfillLshStats(spark, path)
    val migrated = Dedup.dedupAgainstLshIndex(batch, path,
      threshold = 0.05, maxBucket = Some(3))
    assert(scansOf(migrated, "/bands") === 1)
    assert(migrated.collect().map(_.toSeq).toSeq === viaStats)
  }

  test("pairs probe: verdictsFromPairs over dedupPairsAgainstLshIndex reproduces the verdict probe bit for bit") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(pmod(col("doc_id"), lit(11)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(11)) === 0)
    val path = java.nio.file.Files.createTempDirectory("lsh_pairs").toString
    Dedup.saveLshIndex(corpus, k = 3, bands = 8, rowsPerBand = 4, path)
    Seq(None, Some(3): Option[Int]).foreach { cap =>
      val verdicts = Dedup.dedupAgainstLshIndex(batch, path,
        threshold = 0.05, maxBucket = cap).collect().map(_.toSeq).toSeq
      val pairs = Dedup.dedupPairsAgainstLshIndex(batch, path,
        threshold = 0.05, maxBucket = cap).localCheckpoint()
      val derived = Dedup.verdictsFromPairs(
          Dedup.shingledDocIds(batch, k = 3),
          pairs.select(col("bid"), col("cid")))
        .collect().map(_.toSeq).toSeq
      assert(derived === verdicts, s"cap=$cap")
      // the pairs really are the verdicts' evidence: per-doc count and
      // min match id agree row for row
      val byBid = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1)
      verdicts.foreach { v =>
        val (id, n, m) = (v(0).asInstanceOf[Long], v(1).asInstanceOf[Long],
          Option(v(2)).map(_.asInstanceOf[Long]))
        assert(byBid.get(id).map(_.length.toLong).getOrElse(0L) === n)
        assert(byBid.get(id).map(_.map(_._2).min) === m)
      }
      assert(verdicts.exists(_(3) === true), "fixture must contain dups")
    }
    org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("incremental dedup: a torn append (bands written, stats slice lost) keeps the new buckets probeable under a cap") {
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val path = java.nio.file.Files.createTempDirectory("lsh_torn").toString
    Dedup.saveLshIndex(
      Seq((1L, "resident corpus text about columnar storage layouts"))
        .toDF("doc_id", "text"),
      k = 2, bands = 4, rowsPerBand = 2, path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sessionState.newHadoopConf())
    val statsPath = new org.apache.hadoop.fs.Path(s"$path/stats")
    def statsFiles(): Set[String] = {
      val it = fs.listFiles(statsPath, true)
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next().getPath.toString
      b.result()
    }
    val before = statsFiles()
    Dedup.appendToLshIndex(
      Seq((100L, template)).toDF("doc_id", "text"), path)
    // simulate the crash window between the bands append and the stats
    // slice: the appended doc's band rows exist, its stats rows do not
    val torn = statsFiles() -- before
    assert(torn.nonEmpty, "append should have written a stats slice")
    torn.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
    assert(Dedup.lshStatsCommitted(spark, path),
      "the stats table must still LOOK committed — that is the trap")
    val probe = Dedup.dedupAgainstLshIndex(
      Seq((500L, template)).toDF("doc_id", "text"), path,
      threshold = 0.5, maxBucket = Some(3))
    def scansOf(df: org.apache.spark.sql.DataFrame, sub: String): Int =
      df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(sub)) => s
      }.size
    // still the stats fast path (one band scan), yet the stats-less
    // bucket must be probed as size-unknown, not silently dropped
    assert(scansOf(probe, "/bands") === 1)
    assert(scansOf(probe, "/stats") === 1)
    val verdict = probe.collect().head
    assert(verdict.getAs[Boolean]("is_dup") === true &&
      verdict.getAs[Long]("match_id") === 100L,
      s"torn-append bucket was dropped from the capped probe: $verdict")
    // repair restores exact counts; the verdict is unchanged
    Dedup.backfillLshStats(spark, path)
    val healed = Dedup.dedupAgainstLshIndex(
      Seq((500L, template)).toDF("doc_id", "text"), path,
      threshold = 0.5, maxBucket = Some(3)).collect().head
    assert(healed.getAs[Boolean]("is_dup") === true)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("incremental dedup: append on a legacy (stats-less) index must not create a partial stats table") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val path = java.nio.file.Files.createTempDirectory("lsh_legacy").toString
    Dedup.saveLshIndex(docs.where(pmod(col("doc_id"), lit(3)) === 0),
      k = 3, bands = 8, rowsPerBand = 4, path, nBucketParts = 4)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sessionState.newHadoopConf())
    val statsPath = new org.apache.hadoop.fs.Path(s"$path/stats")
    fs.delete(statsPath, true) // simulate the pre-stats layout
    Dedup.appendToLshIndex(docs.where(pmod(col("doc_id"), lit(3)) === 1), path)
    // a stats table born from just the append slice would under-size
    // resident buckets (cap never trips) AND drop stats-less buckets
    // from the sizes join entirely (real dups missed) — the append
    // must leave the legacy index on the counting fallback instead
    assert(!fs.exists(statsPath),
      "append must not create a partial stats table on a legacy index")
    val batch = docs.where(pmod(col("doc_id"), lit(3)) === 2)
    val viaCounting = Dedup.dedupAgainstLshIndex(batch, path,
      threshold = 0.05, maxBucket = Some(3)).collect().map(_.toSeq).toSeq
    // wholesale migration then matches exactly (and appends resume
    // writing slices once the table exists)
    Dedup.backfillLshStats(spark, path)
    val viaStats = Dedup.dedupAgainstLshIndex(batch, path,
      threshold = 0.05, maxBucket = Some(3)).collect().map(_.toSeq).toSeq
    assert(viaStats === viaCounting)
  }

  test("incremental dedup: degenerate-bucket cap drops template-bucket fan-out, spares small buckets") {
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = ((1L to 6L).map(i => (i, template)) :+
        (7L, "completely unrelated corpus text about parquet file layouts"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, template), // lands in the 6-member template bucket
      (101L, "another unrelated new document about shuffle partitioning"))
      .toDF("doc_id", "text")
    def probe(cap: Option[Int]) =
      Dedup.incrementalLshDedup(corpus, batch, k = 2, bands = 4,
          rowsPerBand = 2, threshold = 0.5, maxBucket = cap)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getAs[Boolean]("is_dup"))).toMap
    val uncapped = probe(None)
    assert(uncapped(100L) === ((6L, true)),
      s"template batch doc should match all 6 corpus copies: $uncapped")
    assert(uncapped(101L)._2 === false)
    // identical docs share EVERY band bucket, so the 6-member bucket
    // exceeds cap=3 in all bands and the whole template family is
    // skipped — the documented recall trade that keeps one hot bucket
    // from fanning out B candidates per probing doc
    val capped = probe(Some(3))
    assert(capped(100L) === ((0L, false)), s"capped: $capped")
    assert(capped(101L) === ((0L, false)))
  }

  test("LSH index compaction: append-grown band partitions shrink to one file, probes unchanged") {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val path = java.nio.file.Files.createTempDirectory("lsh_compact").toString
    // save a third of the corpus, append the other two thirds in two
    // batches — every touched part accretes a file per append
    Dedup.saveLshIndex(docs.where(pmod(col("doc_id"), lit(3)) === 0),
      k = 3, bands = 8, rowsPerBand = 4, path, nBucketParts = 4)
    Dedup.appendToLshIndex(docs.where(pmod(col("doc_id"), lit(3)) === 1), path)
    Dedup.appendToLshIndex(docs.where(pmod(col("doc_id"), lit(3)) === 2), path)
    val probe = Seq((1000000L,
      "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
      .unionByName(docs.where(pmod(col("doc_id"), lit(37)) === 5)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    val before = Dedup.dedupAgainstLshIndex(probe, path, threshold = 0.05)
      .collect().map(_.toSeq).toSeq
    val beforeCapped = Dedup.dedupAgainstLshIndex(probe, path,
      threshold = 0.05, maxBucket = Some(4)).collect().map(_.toSeq).toSeq
    val fs = FileSystem.get(new HPath(path).toUri,
      spark.sessionState.newHadoopConf())
    def maxFiles(sub: String): Int = fs.listStatus(new HPath(s"$path/$sub"))
      .filter(_.isDirectory).map(d => fs.listStatus(d.getPath)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))).max
    assert(maxFiles("bands") > 1,
      "appends should have fragmented at least one part")
    assert(maxFiles("stats") > 1,
      "appends should have fragmented the stats side table too")
    val compacted = Dedup.compactLshBands(spark, path, maxFilesPerPart = 1)
    assert(compacted.nonEmpty)
    assert(maxFiles("bands") === 1, "every fragmented part should be one file now")
    assert(maxFiles("stats") === 1, "stats parts should compact alongside")
    val after = Dedup.dedupAgainstLshIndex(probe, path, threshold = 0.05)
      .collect().map(_.toSeq).toSeq
    assert(after === before, "compaction must never change probe results")
    // capped probes read the stats table: merging its FILES must not
    // move the summed per-bucket sizes the cap sees
    val afterCapped = Dedup.dedupAgainstLshIndex(probe, path,
      threshold = 0.05, maxBucket = Some(4)).collect().map(_.toSeq).toSeq
    assert(afterCapped === beforeCapped)
  }

  test("incremental dedup: probing after appendToLshIndex is idempotent (no self-matches) and sees appended docs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different resident corpus document here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("lsh_inc").toString
    Dedup.saveLshIndex(corpus, k = 2, bands = 4, rowsPerBand = 2, path)
    val before = Dedup.dedupAgainstLshIndex(batch, path, threshold = 0.5)
      .collect().map(_.toSeq).toSeq
    assert(before.nonEmpty && before.head(3) === true, s"$before") // 10 ≈ 1
    // the daily loop's resume shape: the batch was already appended;
    // re-probing must flag the same dups, never a self-match
    Dedup.appendToLshIndex(batch, path)
    val after = Dedup.dedupAgainstLshIndex(batch, path, threshold = 0.5)
      .collect().map(_.toSeq).toSeq
    assert(after === before)
    // and a LATER batch near-dup of the appended doc does match it
    val later = Seq((20L, "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    val hit = Dedup.dedupAgainstLshIndex(later, path, threshold = 0.5)
      .collect().head
    assert(hit.getAs[Boolean]("is_dup") && hit.getLong(1) >= 2L,
      s"later batch should match resident + appended docs: $hit")
  }
}
