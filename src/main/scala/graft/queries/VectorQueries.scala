package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables
import graft.operators.Similarity

/** Similarity-search extension queries over `embeddings` (64-dim
  * float vectors). Brute-force cosine top-k is oracle-checked against an
  * unrolled-arithmetic DuckDB query (identical IEEE evaluation order);
  * the LSH variant is the scale path, oracle-checked too (plane
  * constants embedded as exact double literals — Similarity
  * .lshCosinePairsSql) plus a ScalaTest recall assertion vs brute force.
  */
object VectorQueries {
  val Dim = 64
  val SampleMod = 50
  val TopK = 5

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_cosine_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), SampleMod, TopK)),

    "v2_lsh_cosine_pairs" -> ((s, dir) =>
      Similarity.lshCosinePairs(Tables.embeddings(s, dir), Dim,
        nBits = 12, minCos = 0.2)),

    "v3_embedding_neardup_pairs" -> ((s, dir) =>
      Similarity.nearDupPairs(Tables.embeddings(s, dir), minCos = 0.35,
        sampleMod = Some(2))),

    "v4_ivf_topk" -> ((s, dir) =>
      Similarity.ivfSearch(Tables.embeddings(s, dir), k = TopK,
        nCentroids = 16, nProbe = 4, sampleMod = SampleMod)),

    "v5_quantized_topk" -> ((s, dir) =>
      Similarity.quantizedTopK(Tables.embeddings(s, dir),
        sampleMod = SampleMod, k = TopK, rescoreK = 4 * TopK)),

    // The composed serving path: IVF probe × int8 scoring × exact
    // rescore — v4's cell pruning and v5's byte shrink in one plan.
    "v6_ivf_quantized_topk" -> ((s, dir) =>
      Similarity.ivfQuantizedSearch(Tables.embeddings(s, dir), k = TopK,
        nCentroids = 16, nProbe = 4, rescoreK = 4 * TopK, sampleMod = SampleMod)),

    // Product quantization + ADC: 8 one-byte codes per 64-dim vector
    // (32× memory shrink), fixed-point lookup-table scoring, exact
    // rescore — the billion-scale memory tier of the family.
    "v7_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(Tables.embeddings(s, dir), m = 8, kCode = 256,
        sampleMod = SampleMod, k = TopK, rescoreK = 4 * TopK)),

    // Contrastive triplet mining: per sampled anchor, (positive = most
    // similar in-cell neighbor >= posMin, hard negative = most similar
    // in-cell vector still < negMax) — the embedding-model training-set
    // op built on the same cluster-then-compare skeleton as d6.
    "v8_triplet_mining" -> ((s, dir) =>
      Similarity.mineTriplets(Tables.embeddings(s, dir), nCentroids = 16,
        posMin = 0.3, negMax = 0.1, sampleMod = 1)),

    // Margin-based alignment mining (CCMatrix/LASER): per sampled
    // even-id source, the best ODD-id target by margin = cos relative
    // to both sides' k-NN neighborhoods — the hubness-immune bitext
    // rule. Brute cohort form (sampled side broadcast); the in-cell
    // FromAssigned variant is the scale path, spec-pinned equal on a
    // one-cell assignment.
    "v9_margin_alignment" -> ((s, dir) =>
      Similarity.marginAlignment(Tables.embeddings(s, dir), k = 4,
        minMargin = 1.0, sampleMod = SampleMod))
  )

  def oracles: Map[String, String] = Map(
    "v1_cosine_topk" -> Similarity.bruteForceTopKSql(Dim, SampleMod, TopK),
    "v2_lsh_cosine_pairs" -> Similarity.lshCosinePairsSql(Dim, nBits = 12, minCos = 0.2),
    "v3_embedding_neardup_pairs" -> Similarity.nearDupPairsSql(Dim, minCos = 0.35, sampleMod = Some(2)),
    "v4_ivf_topk" -> Similarity.ivfSearchSql(Dim, k = TopK,
      nCentroids = 16, nProbe = 4, sampleMod = SampleMod),
    "v5_quantized_topk" -> Similarity.quantizedTopKSql(Dim,
      sampleMod = SampleMod, k = TopK, rescoreK = 4 * TopK),
    "v6_ivf_quantized_topk" -> Similarity.ivfQuantizedSearchSql(Dim, k = TopK,
      nCentroids = 16, nProbe = 4, rescoreK = 4 * TopK, sampleMod = SampleMod),
    "v7_pq_topk" -> Similarity.pqTopKSql(Dim, m = 8, kCode = 256,
      sampleMod = SampleMod, k = TopK, rescoreK = 4 * TopK),
    "v8_triplet_mining" -> Similarity.mineTripletsSql(Dim, nCentroids = 16,
      posMin = 0.3, negMax = 0.1, sampleMod = 1),
    "v9_margin_alignment" -> Similarity.marginAlignmentSql(Dim, k = 4,
      minMargin = 1.0, sampleMod = SampleMod)
  )
}
