package graft.lexam

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Property-based invariants (SURVEY §5.3) over scalacheck-generated
  * inputs. Sampling is driven directly from `Gen` with a fixed seed
  * (the scalatest↔scalacheck bridge artifact isn't on the offline
  * classpath), so failures are reproducible.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val qs = Fixtures.questions.toDS().toDF()
  private lazy val vs = Fixtures.variants.toDS().toDF()

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val genFilter: Gen[FilterConfig] = for {
    area <- Gen.someOf(Seq("Private", "Public", "Criminal", "Interdisciplinary"))
    lang <- Gen.someOf(Seq("de", "en"))
    cfg  <- Gen.someOf(Seq("mcq_4_choices", "open_question", "mcq_32_choices"))
    neg  <- Gen.option(Gen.oneOf(true, false))
  } yield FilterConfig(area = area.toSeq, language = lang.toSeq,
    config = cfg.toSeq, negative_question = neg)

  test("property: filters are conjunctive/monotone — adding a dim never adds rows") {
    samples(genFilter, 15).foreach { fc =>
      val base = Filters.filterQuestions(qs, vs, fc.copy(area = Nil)).count()
      val narrowed = Filters.filterQuestions(qs, vs, fc).count()
      assert(narrowed <= base, s"$fc")
    }
  }

  test("property: pagination partitions the ordered result exactly") {
    val all = QuestionService.listQuestions(qs, vs, limit = 100)
      .items.select("id").as[String].collect().toSeq
    samples(Gen.choose(1, 4), 4).foreach { pageSize =>
      val paged = (0 until 8).flatMap { p =>
        QuestionService.listQuestions(qs, vs,
          offset = p * pageSize, limit = pageSize)
          .items.select("id").as[String].collect().toSeq
      }.take(all.size)
      assert(paged === all, s"pageSize=$pageSize")
    }
  }

  test("property: extract_score is null or clamped to [0,1]") {
    val genScore = Gen.oneOf(
      Gen.choose(0.0, 20.0).map(d => f"judgment [[$d%.2f]] end"),
      Gen.alphaStr)
    val inputs = samples(genScore, 30)
    val got = inputs.toDF("t")
      .select(TextFunctions.extractScore(col("t"))).as[Option[Double]].collect()
    got.flatten.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(got.flatten.nonEmpty) // generator produced real scores
  }

  test("property: pivot row sums equal group totals (A4)") {
    val dq = DatasetAnalytics.dashboardQuestions(qs, vs, Nil, Nil)
    val years = DatasetAnalytics.dashboardYears(dq).collect()
    assert(years.map(_.getAs[Long]("total")).sum === dq.count())
    years.foreach { r =>
      val cells = DatasetAnalytics.Areas.map(a => r.getAs[Long](a)).sum
      assert(cells === r.getAs[Long]("total"))
    }
  }

  test("property: minhash similarity estimates track exact jaccard") {
    import graft.functions.{MinHashSig, ShingleHashes}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
    def shingleSet(tokens: Seq[String]): Set[Long] =
      ShingleHashes(Literal.create(tokens, ArrayType(StringType)), 2)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSet
    def sig(hs: Set[Long]): Array[Long] =
      MinHashSig(Literal.create(hs.toSeq.sorted, ArrayType(LongType)), 64)
        .eval(null).asInstanceOf[ArrayData].toLongArray()
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    val genDoc = Gen.listOfN(30, Gen.oneOf(vocab))
    samples(Gen.zip(genDoc, genDoc), 10).foreach { case (d1, d2) =>
      val s1 = shingleSet(d1); val s2 = shingleSet(d2)
      if (s1.nonEmpty && s2.nonEmpty) {
        val exact = (s1 & s2).size.toDouble / (s1 | s2).size
        val m1 = sig(s1); val m2 = sig(s2)
        val est = m1.zip(m2).count { case (a, b) => a == b }.toDouble / 64
        assert(math.abs(est - exact) <= 0.35, // 64 hashes → σ≈0.06; generous
          s"est=$est exact=$exact d1=$d1 d2=$d2")
      }
    }
  }
}
