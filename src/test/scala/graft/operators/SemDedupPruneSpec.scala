package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins [[Dedup.semDedupPrune]] — the SemDeDup keep-first selection
  * step — to hand-computed verdicts on constructed geometry, the
  * pair-list law (dropped ≡ the id2 side of
  * [[Dedup.semanticNearDupPairs]]' output, for BOTH the seed and
  * trained cell variants), its deliberate difference from the
  * components closure, and partition-layout independence.
  */
class SemDedupPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private def verdicts(df: org.apache.spark.sql.DataFrame,
                       nCentroids: Int, minCos: Double) =
    Dedup.semDedupPrune(df, nCentroids, minCos)
      .orderBy(col("vec_id")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap

  test("hand-computed keep-first verdicts on constructed geometry") {
    // one cell (nCentroids = 1). cos(1,2) = cos(2,3) ≈ 0.707 ≥ 0.5,
    // cos(1,3) = 0 < 0.5: keep-first keeps ONLY vector 1 — 2 drops to
    // 1, and 3 drops to 2 even though 2 itself dropped (the documented
    // keep-first property)
    val chain = vecs(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 1f)), (3L, Seq(0f, 1f)))
    assert(verdicts(chain, 1, 0.5) ===
      Map(1L -> false, 2L -> true, 3L -> true))
    // star INTO the largest id: 1~3 and 2~3 but NOT 1~2 — keep-first
    // keeps both 1 and 2 (no smaller near neighbor for either), drops
    // only 3; a components min-id closure would have kept only 1.
    // (3 is the normalized midpoint of 1 and 2.)
    val n = math.sqrt(0.5).toFloat
    val star = vecs(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(n, n)))
    assert(verdicts(star, 1, 0.5) ===
      Map(1L -> false, 2L -> false, 3L -> true))
    // exact duplicates: the smaller id survives, every copy drops
    val dups = vecs(
      (7L, Seq(3f, 4f)), (9L, Seq(3f, 4f)), (11L, Seq(3f, 4f)))
    assert(verdicts(dups, 1, 0.99) ===
      Map(7L -> false, 9L -> true, 11L -> true))
  }

  test("law: dropped is exactly the id2 side of the pair list, for seed and trained cells") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    def law(prune: org.apache.spark.sql.DataFrame,
            pairs: org.apache.spark.sql.DataFrame): Unit = {
      val droppedIds = prune.where(col("dropped"))
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val id2s = pairs.select(col("id2")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(droppedIds === id2s, "dropped set must equal the pair id2 side")
      assert(droppedIds.nonEmpty, "fixture must exercise the prune")
    }
    law(Dedup.semDedupPrune(emb, nCentroids = 8, minCos = 0.2),
      Dedup.semanticNearDupPairs(emb, nCentroids = 8, minCos = 0.2))
    law(Dedup.semDedupPruneTrained(emb, nCentroids = 8, minCos = 0.2),
      Dedup.semanticNearDupPairsTrained(emb, nCentroids = 8, minCos = 0.2))
  }

  test("verdicts are partition-layout independent and cover every vector exactly once") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val a = Dedup.semDedupPrune(emb, nCentroids = 8, minCos = 0.2)
      .orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
    val b = Dedup.semDedupPrune(emb.repartition(7), nCentroids = 8,
        minCos = 0.2)
      .orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.length === emb.count(),
      "one verdict per vector — the left join must not drop or dup rows")
  }
}
