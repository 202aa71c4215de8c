package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Dedup

/** Deduplication extension queries over `documents`. The exact-Jaccard
  * query is the oracle-checked ground truth; MinHash-LSH and SimHash are
  * the scale-path approximations (no SQL oracle — DuckDB has no
  * equivalent hash; the driver records a rows-only check, and the
  * ScalaTest suite asserts LSH candidates ⊆-recall against the exact
  * pairs).
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
      Dedup.simhashPairs(Tables.documents(s, dir), maxDist = 3))
  )

  def oracles: Map[String, String] = Map(
    "d1_exact_dedup_summary" ->
      """SELECT COUNT(*) AS n_docs,
        |       COUNT(DISTINCT md5(text)) AS n_distinct,
        |       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
        |FROM documents""".stripMargin,

    "d2_ngram_jaccard_top20" -> Dedup.ngramJaccardSql(k = 3, topN = 20, sampleMod = Some(3))
  )
}
