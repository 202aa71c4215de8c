package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Token-chunking boundary semantics and near-dup survivor selection. */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkTokens: stride/overlap boundaries, short docs, tail chunks") {
    // 10 tokens, chunk=4, overlap=1 → stride 3 → starts 0,3,6 → 3 chunks
    // (ceil((10-1)/3) = 3); chunk 2 covers tokens 7..10
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "a b"),        // shorter than one chunk → single short chunk
      (3L, "x y z q"),    // exactly one chunk
      (4L, "  ")          // no tokens → no rows
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, chunk = 4, overlap = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2).toList))
      .sortBy(t => (t._1, t._2)).toList
    assert(out === List(
      (1L, 0L, List("w1", "w2", "w3", "w4")),
      (1L, 1L, List("w4", "w5", "w6", "w7")),   // overlap carries w4
      (1L, 2L, List("w7", "w8", "w9", "w10")),
      (2L, 0L, List("a", "b")),
      (3L, 0L, List("x", "y", "z", "q"))))
    // every token of every doc appears in at least one chunk
    val covered = out.filter(_._1 == 1L).flatMap(_._3).toSet
    assert(covered === (1 to 10).map(i => s"w$i").toSet)
  }

  test("snapshotDiff: added/removed/changed/unchanged classified per key") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val b = Seq((1L, "x"), (2L, "Y2"), (4L, "new")).toDF("doc_id", "text")
    val out = Diff.snapshotDiff(a, b, "doc_id", md5(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val sums = Diff.diffSummary(a, b, "doc_id", md5(col("text"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums === Map("added" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "unchanged" -> 1L))
  }

  test("survivors: best quality wins, ties to lowest id, singletons excluded") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    val quality = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (10L, 0.1), (11L, 0.1))
      .toDF("id", "quality")
    val out = Dedup.survivors(comps, quality).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // comp 1: quality tie 2 vs 3 → lower id 2; comp 10: tie → 10
    assert(out === List((1L, 3L, 2L), (10L, 2L, 10L)))
  }
}
