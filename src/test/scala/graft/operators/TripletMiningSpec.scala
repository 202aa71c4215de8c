package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Fixture pins for contrastive triplet mining (v8): positive = MOST
  * similar in-cell neighbor at/above the floor, hard negative = most
  * similar vector still below the ceiling, anchors missing either side
  * emit nothing, ties break to the lower candidate id.
  */
class TripletMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one IVF cell (nCentroids=1): geometry is fully hand-computable.
  // axis vectors: a=(1,0..), near-dup b=cos .9806 with a, mid c=cos .7071,
  // far d=cos 0, and e on a different axis pair entirely
  private def vec(xs: (Int, Float)*): Seq[Float] = {
    val arr = Array.fill(4)(0f)
    xs.foreach { case (i, v) => arr(i) = v }
    arr.toSeq
  }

  test("positive = most-similar above floor; hard negative = most-similar below ceiling") {
    val emb = Seq(
      (0L, vec(0 -> 1f)),                 // anchor
      (1L, vec(0 -> 1f, 1 -> 0.2f)),      // cos ~.9806 -> positive
      (2L, vec(0 -> 1f, 1 -> 1f)),        // cos ~.7071 -> above ceiling, below floor: neither
      (3L, vec(1 -> 1f)),                 // cos 0      -> negative candidate
      (4L, vec(1 -> 1f, 2 -> 0.1f))       // cos 0      -> negative tie, higher id loses
    ).toDF("vec_id", "embedding")
    val rows = Similarity.mineTriplets(emb, nCentroids = 1,
        posMin = 0.9, negMax = 0.5, sampleMod = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toList
    // anchor 0: pos=1 (.98), neg=3 (ties 3/4 at cos 0 -> lower id)
    assert(rows.contains((0L, 1L, 3L)))
    // anchor 2 has positives at .7071? no (floor .9) and id1 is .7071?
    // cos(2,1) = (1+0.2)/(sqrt(2)*sqrt(1.04)) ~ .832 < .9 -> no positive
    assert(!rows.exists(_._1 == 2L))
    // anchors 3/4: their only >=.9 in-cell neighbor is each other
    // (cos(3,4) = 1/sqrt(1.01) ~ .995); negatives are 0/1/2 at cos <= .14
    assert(rows.exists(r => r._1 == 3L && r._2 == 4L))
  }

  test("anchors with a positive but no sub-ceiling vector emit nothing") {
    // two near-identical vectors alone in the cell: positive exists,
    // hard negative does not -> zero triplets
    val emb = Seq(
      (0L, vec(0 -> 1f)),
      (1L, vec(0 -> 1f, 1 -> 0.1f))).toDF("vec_id", "embedding")
    assert(Similarity.mineTriplets(emb, nCentroids = 1,
      posMin = 0.9, negMax = 0.5, sampleMod = 1).count() === 0L)
  }

  test("sampleMod restricts anchors, not candidates") {
    val emb = Seq(
      (0L, vec(0 -> 1f)),
      (1L, vec(0 -> 1f, 1 -> 0.1f)),
      (3L, vec(1 -> 1f))).toDF("vec_id", "embedding")
    val rows = Similarity.mineTriplets(emb, nCentroids = 1,
        posMin = 0.9, negMax = 0.5, sampleMod = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toList
    // only vec 0 is an anchor (0 % 2 == 0; 1 and 3 are not) but 1 and 3
    // still serve as its positive / negative
    assert(rows === List((0L, 1L, 3L)))
  }
}
