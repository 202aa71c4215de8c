package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Registry, TextFunctions}

/** Deduplication operators for a training-data pipeline: exact
  * (hash-groupBy), n-gram Jaccard (exact near-dup ground truth),
  * MinHash+LSH (scalable candidate generation), SimHash (bit-band
  * clustering). SURVEY §7.4 item 10 / builder-prompt extension ops.
  *
  * Scale posture (100 TB): every operator shuffles on a
  * *content-derived* key (md5, shingle, band hash) so work distributes
  * by data, never by source partition; candidate verification touches
  * only bucket-cohabiting pairs, not the cross product.
  */
object Dedup {

  import org.apache.spark.sql.expressions.Window

  // ------------------------------------------------------------ exact

  /** Exact dedup summary over a text column: total docs, distinct texts
    * (by md5 — same digest function in the DuckDB oracle), dup count. */
  def exactSummary(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_distinct"),
      (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dups"))

  /** Exact dedup: keep the first (lowest doc_id) row per distinct text. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
  }

  // --------------------------------------------- exact n-gram Jaccard

  /** Top-N near-duplicate pairs by exact k-shingle Jaccard similarity.
    * Self-equi-join on shingle → intersection counts → |A∪B| from
    * per-doc set sizes. This is the ground truth MinHash approximates;
    * at scale the shingle join IS the LSH bucket join with bands of 1.
    */
  def ngramJaccardTopN(docs: DataFrame, k: Int, topN: Int,
                       sampleMod: Option[Int] = None): DataFrame = {
    // optional deterministic sample: the all-pairs shingle join is
    // quadratic in corpus density — at bench scale the operator is
    // exercised on a doc_id-sampled cohort (oracle applies the same cut)
    val cohort = sampleMod.map(m => docs.where(col("doc_id") % m === 0)).getOrElse(docs)
    // native ShingleHashes (one JVM loop, no string materialization) and
    // an 8-byte join key: the interpreted HOF + string-key formulation
    // measured ~10× slower; 64-bit collisions (~1e-11 here) are the
    // standard trade for hash-based shingling
    // no cache: shingle hashing is a cheap native loop, and pinning the
    // exploded relation for the session's lifetime starves later queries
    val sh = cohort.select(col("doc_id"),
        explode(Registry.shingleHashes(
          TextFunctions.wsTokens(lower(col("text"))), k)).as("s_h"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b").hint("SHUFFLE_HASH"),
        col("a.s_h") === col("b.s_h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("sz", "sz2"), "id2")
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter"))).as("jaccard"))
      .orderBy(desc("jaccard"), col("id1"), col("id2"))
      .limit(topN)
  }

  /** DuckDB oracle for [[ngramJaccardTopN]] (k fixed at call site). */
  def ngramJaccardSql(k: Int, topN: Int, sampleMod: Option[Int] = None): String = {
    val sample = sampleMod.map(m => s"WHERE doc_id % $m = 0").getOrElse("")
    val joins = (1 until k).map(j =>
      s"JOIN p t$j ON t$j.doc_id = t0.doc_id AND t$j.pos = t0.pos + $j").mkString(" ")
    val catted = (0 until k).map(j => s"t$j.tok").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents $sample),
       |p AS (
       |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
       |  FROM toks),
       |sh AS (
       |  SELECT DISTINCT t0.doc_id, $catted AS s
       |  FROM p t0 $joins),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id1, id2,
       |       CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
       |FROM inter
       |JOIN sz s1 ON s1.doc_id = id1
       |JOIN sz s2 ON s2.doc_id = id2
       |ORDER BY jaccard DESC, id1, id2 LIMIT $topN""".stripMargin
  }

  // ------------------------------------------------------ MinHash+LSH

  /** MinHash signature — native expression (graft.functions.MinHashSig):
    * one tight loop per row instead of numHashes interpreted
    * array traversals. */
  def minhashSig(shingleHashes: Column, numHashes: Int): Column =
    Registry.minhashSig(shingleHashes, numHashes)

  /** MinHash-LSH near-dup pairs: signature → bands → bucket join →
    * exact-Jaccard verification of candidates only.
    * @param bands × @param rowsPerBand = signature length. */
  def minhashLshPairs(docs: DataFrame, k: Int, bands: Int, rowsPerBand: Int,
                      threshold: Double): DataFrame = {
    val numHashes = bands * rowsPerBand
    // shingling+hashing+signature are native expressions — the whole
    // MinHash preparation is two JVM loops per row (SURVEY: composed
    // HOF lambdas run interpreted and re-walk the array per hash fn)
    val withSig = docs
      .select(col("doc_id"),
        Registry.shingleHashes(TextFunctions.wsTokens(lower(col("text"))), k).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSig(col("sh"), numHashes))
    // band b = hash of sig[b*r .. b*r+r). The band join carries only
    // (doc_id, band, bucket) — shuffling the shingle-hash arrays bands×
    // on both sides would dominate at scale; the arrays join back once
    // per side for the verification step only.
    val banded = withSig.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b), concat_ws(",",
          (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val candIds = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .dropDuplicates("id1", "id2")
    val shSets = withSig.select(col("doc_id"), col("sh"))
    val cand = candIds
      .join(shSets.withColumnRenamed("doc_id", "id1").withColumnRenamed("sh", "sh1"), "id1")
      .join(shSets.withColumnRenamed("doc_id", "id2").withColumnRenamed("sh", "sh2"), "id2")
    cand
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  // ---------------------------------------------------------- SimHash

  /** 64-bit SimHash per doc via the native [[graft.functions.SimHash64]]
    * expression: per-token FNV-1a 64, each bit votes ±1, sign sets the
    * bit. Pure map-side — the previous explode → 64 conditional sums →
    * groupBy formulation shuffled every token. */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      Registry.simhash64(TextFunctions.wsTokens(lower(col("text")))).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, using
    * band blocking. Pigeonhole: complete recall requires dist < bands —
    * enforced, because silently missing qualifying pairs is worse than
    * an explicit band-count choice (more bands ⇒ narrower bands ⇒ more
    * candidate collisions; 4×16 bits covers the standard dist ≤ 3). */
  def simhashPairs(docs: DataFrame, maxDist: Int, bands: Int = 4): DataFrame = {
    require(maxDist < bands,
      s"band blocking with $bands bands only guarantees recall for dist < $bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val sh = simhash(docs)
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("simhash"), b * width).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("dist"))
      .dropDuplicates("id1", "id2")
      .where(col("dist") <= maxDist)
      .orderBy(col("id1"), col("id2"))
  }
}
