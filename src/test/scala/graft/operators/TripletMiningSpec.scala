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

  /** Dup-heavy corpus — the input triplet mining actually runs on
    * (mining presupposes near-dups to serve as positives): half the
    * vectors are tiny perturbations of ONE base (ids even), the rest
    * spread over 7 real clusters. buildIvf's every-(n/k)-th seed lands
    * every centroid inside the dup blob (step = 512/16 = 32, all even),
    * so the non-blob half of the corpus piles into whichever of 16
    * near-identical centroids is nearest — a hot cell that turns the
    * in-cell candidate join near-quadratic. Deterministic (fixed RNG).
    */
  private lazy val dupHeavy: org.apache.spark.sql.DataFrame = {
    // blob center scaled up (norm ~12) with sigma 0.3 so blob members
    // are genuine near-dups (cos ~.99) yet carry enough variance that
    // a trained index CAN split the blob; the 7 real clusters are
    // tight (sigma 0.3), so under seed centroids — ALL of which land
    // inside the blob (every 32nd id is even) — each far cluster
    // funnels coherently into whichever near-identical centroid leans
    // its way: few hot cells, the near-cartesian candidate join.
    val dim = 16; val n = 512
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8, dim)(rnd.nextGaussian() * 1.6)
    val blob = centers(0).map(_ * 3.0)
    (0 until n).map { i =>
      val c = if (i % 2 == 0) blob else centers(1 + rnd.nextInt(7))
      val v = c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  /** Candidate-join cost proxy: Σ |cell|² (every anchor in a cell meets
    * every member of that cell). */
  private def joinCost(assigned: org.apache.spark.sql.DataFrame): Long =
    assigned.groupBy("cell").count().collect()
      .map(r => r.getLong(1) * r.getLong(1)).sum

  test("dup-heavy corpus: seed cells make the candidate join near-quadratic; trained cells keep it linear-per-cell") {
    val emb = dupHeavy.cache()
    try {
      val (_, seedAssigned) = Similarity.buildIvf(emb, k = 16)
      val (_, trainAssigned) = Similarity.buildIvfTrained(emb, k = 16)
      val (seedCost, trainCost) = (joinCost(seedAssigned), joinCost(trainAssigned))
      def maxCell(a: org.apache.spark.sql.DataFrame): Long =
        a.groupBy("cell").count().collect().map(_.getLong(1)).max
      val (seedMax, trainMax) = (maxCell(seedAssigned), maxCell(trainAssigned))
      withClue(s"seed sum(cell^2)=$seedCost max=$seedMax " +
        s"trained sum(cell^2)=$trainCost max=$trainMax: ") {
        // the scale killer is the hot cell (one straggler task doing
        // |cell|^2 cosine work); total cost collapses with it
        assert(seedMax >= 2 * trainMax)
        assert(seedCost >= (1.5 * trainCost).toLong)
      }
      // the trained path still mines. Mining needs MIXED cells (the
      // hard negative must share the anchor's cell), so mine over a
      // coarser k=4 trained assignment — blob cells stay pure (those
      // anchors legitimately emit nothing) while far clusters share
      // cells — and sample anchors at mod 3, which includes odd
      // (non-blob) ids; mod-2/mod-4 sampling would select only blob
      // members. Every triplet must satisfy the selection contract.
      val (_, mineAssigned) = Similarity.buildIvfTrained(emb, k = 4)
      val rows = Similarity.mineTripletsFromAssigned(mineAssigned,
        posMin = 0.9, negMax = 0.5, sampleMod = 3).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (a, p, pc, n, nc) = (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getDouble(4))
        assert(pc >= 0.9 && nc < 0.5 && p != a && n != a,
          s"contract violated for anchor $a: pos=$p($pc) neg=$n($nc)")
      }
      // a blob anchor's positive, when it mines at all, is another
      // blob member (only the blob has cos >= .9 neighbors there)
      rows.filter(_.getLong(0) % 2 == 0).foreach(r =>
        assert(r.getLong(1) % 2 == 0,
          s"blob anchor ${r.getLong(0)} picked non-blob positive ${r.getLong(1)}"))
    } finally emb.unpersist()
  }

  test("trained entry point == FromAssigned over the trained assignment; seed entry point == FromAssigned over the seed assignment") {
    val emb = dupHeavy.where($"vec_id" < 64).cache()
    try {
      val (_, trainAssigned) = Similarity.buildIvfTrained(emb, k = 4)
      val direct = Similarity.mineTripletsTrained(emb, nCentroids = 4,
        posMin = 0.8, negMax = 0.4, sampleMod = 1).collect().toSeq
      val viaAssigned = Similarity.mineTripletsFromAssigned(trainAssigned,
        posMin = 0.8, negMax = 0.4, sampleMod = 1).collect().toSeq
      assert(direct === viaAssigned)
      val (_, seedAssigned) = Similarity.buildIvf(emb, k = 4)
      val seedDirect = Similarity.mineTriplets(emb, nCentroids = 4,
        posMin = 0.8, negMax = 0.4, sampleMod = 1).collect().toSeq
      val seedVia = Similarity.mineTripletsFromAssigned(seedAssigned,
        posMin = 0.8, negMax = 0.4, sampleMod = 1).collect().toSeq
      assert(seedDirect === seedVia)
      // at least one entry point mines on this geometry (a pure-blob
      // cell has positives but no in-cell sub-ceiling negative, so
      // either single path may legitimately come up empty)
      assert((direct ++ seedDirect).nonEmpty)
    } finally emb.unpersist()
  }

  test("mining off a PERSISTED index (saveIvf -> loadIvf) equals mining off the in-memory assignment") {
    val emb = dupHeavy.where($"vec_id" < 128).cache()
    try {
      val (index, assigned) = Similarity.buildIvfTrained(emb, k = 4)
      val path = java.nio.file.Files.createTempDirectory("v8_idx").toString
      Similarity.saveIvf(index, assigned, path)
      val (_, loaded) = Similarity.loadIvf(spark, path)
      val direct = Similarity.mineTripletsFromAssigned(assigned,
        posMin = 0.8, negMax = 0.4, sampleMod = 1).collect().toSeq
      val persisted = Similarity.mineTripletsFromAssigned(loaded,
        posMin = 0.8, negMax = 0.4, sampleMod = 1).collect().toSeq
      assert(persisted === direct)
      assert(persisted.nonEmpty)
    } finally emb.unpersist()
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
