package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Exactness of the Misra-Gries two-phase heavy-hitter plan: the
  * candidate sweep is layout-sensitive, so the property that matters —
  * confirmed output == brute-force groupBy output — is driven across
  * adversarial partition layouts, not just the natural one.
  */
class FrequentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteForce(docs: org.apache.spark.sql.DataFrame,
      num: Long, denom: Long): Seq[(String, Long)] = {
    val toks = docs.select(explode(TextAnalysis.toks(col("text"))).as("term"))
    val n = toks.count()
    toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * denom >= num * n)
      .orderBy(col("cnt").desc, col("term"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  private def run(docs: org.apache.spark.sql.DataFrame,
      num: Long, denom: Long): Seq[(String, Long)] =
    Frequent.frequentTerms(docs, num, denom)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Zipf-ish corpus: few heavy words, a long unique-token tail. */
  private def corpus(nDocs: Int, seed: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val rnd = new scala.util.Random(seed * 7919 + i)
      val words = (0 until 20).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 30) "alpha" else if (r < 45) "beta"
        else if (r < 52) "gamma" else s"tail${rnd.nextInt(100000)}"
      }
      (i.toLong, words.mkString(" "))
    }

  test("exact vs brute force across partition layouts (incl. single and over-partitioned)") {
    val rows = corpus(400, seed = 1)
    for (parts <- Seq(1, 3, 16, 64)) {
      val docs = spark.createDataFrame(rows).toDF("doc_id", "text")
        .repartition(parts)
      assert(run(docs, 1, 50) === bruteForce(docs, 1, 50), s"parts=$parts")
    }
  }

  test("adversarial layout: heavy term confined to one partition is still found") {
    // range partition by doc_id puts ALL "skewword" docs in one
    // partition — the layout where a naive per-partition top-k (without
    // the MG density guarantee) under-samples the heavy term
    val rows = corpus(300, seed = 2).map { case (id, t) =>
      if (id < 30) (id, ("skewword " * 20).trim) else (id, t)
    }
    val docs = spark.createDataFrame(rows).toDF("doc_id", "text")
      .repartitionByRange(10, col("doc_id"))
    val got = run(docs, 1, 50)
    assert(got === bruteForce(docs, 1, 50))
    assert(got.exists(_._1 == "skewword"))
  }

  test("threshold boundary is exact Long arithmetic: cnt*denom == num*N is IN") {
    // 1 doc, 10 tokens, theta=2/10: "a" appears exactly twice → equality
    val docs = Seq((1L, "a a b c d e f g h i")).toDF("doc_id", "text")
    val got = run(docs, 2, 10)
    assert(got === Seq(("a", 2L)))
  }

  test("misraGries summary: capacity respected, guaranteed superset on a hostile stream") {
    // stream = heavy item at exactly 1/3 density interleaved with
    // all-distinct filler; capacity 3 must retain it
    val stream = (0 until 3000).flatMap(i => Seq("heavy", s"u${2 * i}", s"u${2 * i + 1}"))
    val out = Frequent.misraGries(3, stream.iterator).toSet
    assert(out.size <= 3)
    assert(out.contains("heavy"))
  }

  test("degenerate thetas: theta=1 returns only an all-dominant term; tiny corpus safe") {
    val one = Seq((1L, "x x x")).toDF("doc_id", "text")
    assert(run(one, 1, 1) === Seq(("x", 3L)))
    val mixed = Seq((1L, "x y")).toDF("doc_id", "text")
    assert(run(mixed, 1, 1) === Seq.empty)
  }
}
