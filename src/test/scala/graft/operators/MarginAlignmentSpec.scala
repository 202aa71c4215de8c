package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Margin-based alignment mining (v9, CCMatrix/LASER rule): the margin
  * must rank a pair by cosine RELATIVE to both neighborhoods — a hub
  * target that is "close to everything" must lose to a mutually
  * specific target even at lower raw cosine; the FromAssigned in-cell
  * form must equal the brute form on a one-cell assignment.
  */
class MarginAlignmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(xs: (Int, Float)*): Seq[Float] = {
    val arr = Array.fill(8)(0f)
    xs.foreach { case (i, v) => arr(i) = v }
    arr.toSeq
  }

  /** Hub geometry. Source side (even ids): x=0 on axis 0, plus sources
    * 2/4/6/8 clustered near the hub direction (axis 2). Target side
    * (odd ids): hub h=1 near axis 2 but tilted toward x (cos(x,h)
    * moderate, while EVERY source is close to h — big avgk(h));
    * specific s=3 tilted toward x with no other admirers. Raw cosine
    * ranks h above s for x; the margin must invert that. */
  private lazy val emb = {
    val rows = Seq(
      (0L, vec(0 -> 1f, 2 -> 0.55f)),              // x (sampled source)
      (2L, vec(2 -> 1f, 3 -> 0.1f)),               // hub admirers
      (4L, vec(2 -> 1f, 3 -> -0.1f)),
      (6L, vec(2 -> 1f, 4 -> 0.1f)),
      (8L, vec(2 -> 1f, 4 -> -0.1f)),
      (1L, vec(2 -> 1f, 0 -> 0.75f)),              // hub target h
      (3L, vec(0 -> 1f, 2 -> 0.1f, 5 -> 0.9f)),    // specific target s
      (5L, vec(6 -> 1f)),                          // filler targets
      (7L, vec(7 -> 1f)),
      (9L, vec(6 -> 1f, 7 -> 0.2f)))
    rows.toDF("vec_id", "embedding")
  }

  private def cosSeq(a: Seq[Float], b: Seq[Float]): Double = {
    val (x, y) = (a.map(_.toDouble), b.map(_.toDouble))
    val dot = x.zip(y).map { case (p, q) => p * q }.sum
    dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
  }

  test("margin inverts a raw-cosine hub win; values match the hand formula") {
    val rows = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val (x, h, s) = (rows(0L), rows(1L), rows(3L))
    assert(cosSeq(x, h) > cosSeq(x, s),
      "fixture must make the hub win on raw cosine")
    val got = Similarity.marginAlignment(emb, k = 2, minMargin = 0.0,
        sampleMod = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // hand margin for (x, s): avg2(x) over targets, avg2(s) over sources
    def top2avg(v: Seq[Float], side: Seq[Seq[Float]]) = {
      val cs = side.map(cosSeq(v, _)).sorted.reverse.take(2)
      (cs(0) + cs(1)) / 2.0
    }
    val targets = Seq(1L, 3L, 5L, 7L, 9L).map(rows)
    val sources = Seq(0L, 2L, 4L, 6L, 8L).map(rows)
    def margin(a: Seq[Float], b: Seq[Float]) =
      cosSeq(a, b) / ((top2avg(a, targets) + top2avg(b, sources)) / 2.0)
    assert(margin(x, s) > margin(x, h),
      s"fixture: margin must favor the specific target " +
        s"(m(x,s)=${margin(x, s)} m(x,h)=${margin(x, h)})")
    val (tgt, cosGot, mGot) = got(0L)
    assert(tgt === 3L, s"margin pick must invert the hub win, got $got")
    assert(math.abs(cosGot - cosSeq(x, s)) < 1e-12)
    assert(math.abs(mGot - margin(x, s)) < 1e-9)
  }

  test("minMargin filters; sources below it emit nothing") {
    val got = Similarity.marginAlignment(emb, k = 2, minMargin = 50.0,
      sampleMod = 2)
    assert(got.count() === 0L)
  }

  test("FromAssigned on a one-cell assignment equals the brute form; contract holds on a trained assignment") {
    val oneCell = emb.select(col("vec_id"), lit(0).as("cell"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    val brute = Similarity.marginAlignment(emb, k = 2, minMargin = 0.0,
      sampleMod = 2).collect().map(_.toSeq).toSeq
    val inCell = Similarity.marginAlignmentFromAssigned(oneCell, k = 2,
      minMargin = 0.0, sampleMod = 2).collect().map(_.toSeq).toSeq
    assert(inCell === brute)
    assert(brute.nonEmpty)
    // trained cells on a bigger deterministic corpus: every emitted
    // pair obeys the contract (sampled even source, odd target,
    // margin >= floor)
    val rnd = new scala.util.Random(3)
    val big = (0 until 256).map { i =>
      (i.toLong, Seq.fill(8)((rnd.nextGaussian() * (1 + i % 3)).toFloat))
    }.toDF("vec_id", "embedding")
    val (_, assigned) = Similarity.buildIvfTrained(big, k = 4)
    val mined = Similarity.marginAlignmentFromAssigned(assigned, k = 2,
      minMargin = 1.0, sampleMod = 4).collect()
    assert(mined.nonEmpty)
    mined.foreach { r =>
      assert(r.getLong(0) % 4 == 0 && r.getLong(1) % 2 == 1 &&
        r.getDouble(3) >= 1.0,
        s"contract violated: ${r.toSeq}")
    }
  }

  test("persisted margin index: marginAgainstIvf on the corpus's own sampled anchors equals marginAlignmentFromAssigned") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val big = (0 until 256).map { i =>
      (i.toLong, Seq.fill(8)((rnd.nextGaussian() * (1 + i % 3)).toFloat))
    }.toDF("vec_id", "embedding")
    val (index, assigned) = Similarity.buildIvfTrained(big, k = 4)
    val pinned = assigned.localCheckpoint()
    val path = java.nio.file.Files.createTempDirectory("margin_idx").toString
    Similarity.saveMarginIndex(index, pinned, k = 2, path)
    val direct = Similarity.marginAlignmentFromAssigned(pinned, k = 2,
      minMargin = 1.0, sampleMod = 4).collect().map(_.toSeq).toSeq
    // the same sampled even anchors, this time as a QUERY batch
    // against the persisted artifact — yden over ALL targets vs the
    // touched-only recompute must be pure precomputation
    val queries = big.where(col("vec_id") % 4 === 0 && col("vec_id") % 2 === 0)
    val served = Similarity.marginAgainstIvf(spark, path, queries,
        minMargin = 1.0)
      .collect().map(_.toSeq).toSeq
    assert(served === direct)
    assert(served.nonEmpty)
  }
}
