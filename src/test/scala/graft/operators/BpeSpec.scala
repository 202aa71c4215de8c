package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The distributed BPE merge loop vs an independent sequential
  * reference run on the same (collected) token sequences: merges,
  * counts, and the post-merge corpus must agree exactly.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Sequential reference: same argmax total order (count desc, then
    * (a, b) lexicographic) and the same greedy left-to-right
    * non-overlapping merge. */
  private def seqTrain(docs0: Map[Long, Vector[String]], nMerges: Int)
      : (Seq[(String, String, Long)], Map[Long, Vector[String]]) = {
    var docs = docs0
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 0 until nMerges if !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      docs.values.foreach(_.sliding(2).foreach {
        case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _ =>
      })
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((a, b, n))
        val m = a + " " + b
        docs = docs.view.mapValues(_.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ m
          else acc :+ x
        }).toMap
      }
    }
    (merges.result(), docs)
  }

  test("distributed merge loop equals the sequential reference exactly") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .where(pmod(col("doc_id"), lit(5)) === 0)
    val (merges, syms) = Bpe.train(docs, nMerges = 5)
    try {
      // ground truth starts from the SAME tokenization (collected from
      // the untrained frame), so only the loop logic is under test
      val initial = docs
        .select(col("doc_id"), TextAnalysis.toks(col("text")).as("syms"))
        .as[(Long, Vector[String])].collect().toMap
      val (refMerges, refDocs) = seqTrain(initial, nMerges = 5)
      assert(merges.map(m => (m.a, m.b, m.n)) === refMerges)
      val got = syms.as[(Long, Vector[String])].collect().toMap
      assert(got === refDocs)
      // merged symbols really appear in the final vocabulary
      val vocab = Bpe.vocab(syms).as[(String, Long)].collect().toMap
      merges.headOption.foreach(m =>
        assert(vocab.contains(m.a + " " + m.b), s"vocab missing ${m.a} ${m.b}"))
    } finally syms.unpersist()
  }

  test("encode with the learned merges reproduces the trainer's final corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .where(pmod(col("doc_id"), lit(7)) === 0)
    val (merges, syms) = Bpe.train(docs, nMerges = 4)
    try {
      val trained = syms.as[(Long, Vector[String])].collect().toMap
      val encoded = Bpe.encode(docs, merges)
        .as[(Long, Vector[String])].collect().toMap
      assert(encoded === trained)
      // and encoding UNSEEN text applies the same merges
      val fresh = Seq((999L, merges.head.a + " " + merges.head.b + " zzz_unseen"))
        .toDF("doc_id", "text")
      val enc = Bpe.encode(fresh, merges)
        .as[(Long, Vector[String])].collect().head._2
      assert(enc.head === merges.head.a + " " + merges.head.b, enc)
    } finally syms.unpersist()
  }

  test("merge counts are non-increasing and early-exhaustion stops cleanly") {
    val tiny = Seq((1L, "x y x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val (merges, syms) = Bpe.train(tiny, nMerges = 50)
    try {
      // round 1 must pick (x, y) with count 4; the loop must stop on its
      // own well before 50 rounds once no pair repeats
      assert(merges.head.a === "x" && merges.head.b === "y" && merges.head.n === 4L)
      assert(merges.map(_.n) === merges.map(_.n).sorted.reverse)
      assert(merges.size < 50)
    } finally syms.unpersist()
  }
}
