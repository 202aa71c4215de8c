package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Model-based quality filter: held-out separation, determinism, and
  * the map-side scoring plan (the property that matters at 100 TB —
  * train small, score everything with zero shuffles).
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val clean = Vector("the", "court", "holds", "that", "contract",
    "liability", "applies", "under", "statute", "review", "evidence",
    "judgment", "appeal", "ruling", "doctrine")
  private val spam = Vector("click", "buy", "free", "winner", "casino",
    "pills", "cheap", "offer", "subscribe", "jackpot")

  /** Deterministic labeled corpus: good docs draw only clean words, bad
    * docs mix in heavy spam vocabulary. */
  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val good = i % 2 == 0
      val words = (0 until 20).map { _ =>
        if (good || rnd.nextDouble() < 0.4) clean(rnd.nextInt(clean.length))
        else spam(rnd.nextInt(spam.length))
      }
      (i.toLong, words.mkString(" "), if (good) 1.0 else 0.0)
    }.toDF("doc_id", "text", "label")
  }

  test("held-out accuracy >= 0.9; filter keeps what the score says") {
    val model = QualityClassifier.train(corpus(300, seed = 13))
    val heldOut = corpus(100, seed = 99)
    val scored = QualityClassifier.score(model, heldOut)
    val acc = scored
      .withColumn("hit", ((col("quality_prob") >= 0.5).cast("int") === col("label").cast("int")).cast("int"))
      .agg(avg(col("hit"))).head().getDouble(0)
    assert(acc >= 0.9, s"held-out accuracy $acc")
    // the gate is exactly score >= threshold
    val kept = QualityClassifier.filterByQuality(model, heldOut, minProb = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val expect = scored.where(col("quality_prob") >= 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === expect)
    assert(kept.nonEmpty && kept.size < 100)
  }

  test("training is deterministic: same data, same coefficients") {
    val m1 = QualityClassifier.train(corpus(200, seed = 7))
    val m2 = QualityClassifier.train(corpus(200, seed = 7))
    assert(m1.coefficients === m2.coefficients)
    assert(m1.intercept === m2.intercept)
  }

  test("scoring is map-side: no exchange anywhere in the scoring plan") {
    val model = QualityClassifier.train(corpus(200, seed = 7))
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = QualityClassifier.score(model, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // and it scores real rows without touching more than the text column
    val n = QualityClassifier.score(model, docs).count()
    assert(n === docs.count())
  }

  /** Three separable "languages" by vocabulary — the multiclass form's
    * fixture (the gradient-trained sibling of LangId's NB). */
  private def langCorpus(n: Int, seed: Int) = {
    val vocab = Map(
      "aa" -> Vector("alpha", "apex", "anchor", "atlas", "amber"),
      "bb" -> Vector("bravo", "basin", "boulder", "birch", "bison"),
      "cc" -> Vector("cedar", "canyon", "cobalt", "crater", "cliff"))
    val rnd = new scala.util.Random(seed)
    val langs = vocab.keys.toSeq.sorted
    (0 until n).map { i =>
      val l = langs(i % 3)
      val words = (0 until 15).map(_ => vocab(l)(rnd.nextInt(5)))
      (i.toLong, l, words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
  }

  test("multiclass: held-out argmax labels recover the class; label order deterministic") {
    val (model, labels) = QualityClassifier.trainMulticlass(
      langCorpus(150, seed = 3))
    assert(labels === Seq("aa", "bb", "cc")) // sorted-distinct contract
    val held = langCorpus(60, seed = 77)
    val got = QualityClassifier.predictLabel(model, labels, held)
    val acc = got.withColumn("hit",
        (col("pred_label") === col("lang")).cast("int"))
      .agg(avg(col("hit"))).head.getDouble(0)
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("multiclass training rejects null labels loudly, not with a mid-job NPE") {
    import spark.implicits._
    val bad = Seq((1L, "en", "the dog runs"), (2L, null: String, "le chien"))
      .toDF("doc_id", "lang", "text")
    val ex = intercept[IllegalArgumentException](
      QualityClassifier.trainMulticlass(bad))
    assert(ex.getMessage.contains("NULL") && ex.getMessage.contains("lang"),
      ex.getMessage)
  }

  test("multiclass scoring is map-side: no exchange in the prediction plan") {
    val (model, labels) = QualityClassifier.trainMulticlass(
      langCorpus(90, seed = 5))
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = QualityClassifier.predictLabel(model, labels, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
