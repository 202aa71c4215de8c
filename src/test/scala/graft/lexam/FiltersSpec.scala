package graft.lexam

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** F1–F4 + A7 semantics (reference main.py:58-132), incl. the tri-state
  * null rules of SURVEY §7.4 item 1.
  */
class FiltersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val qs = Fixtures.questions.toDS().toDF()
  private lazy val vs = Fixtures.variants.toDS().toDF()

  private def ids(fc: FilterConfig, search: Option[String] = None): Set[String] =
    Filters.filterQuestions(qs, vs, fc, search)
      .select("id").as[String].collect().toSet

  test("empty filter returns everything") {
    assert(ids(FilterConfig()) === Set("q1", "q2", "q3", "q4", "q5", "q6"))
  }

  test("question-dim IN lists are conjunctive") {
    assert(ids(FilterConfig(area = Seq("Private"))) === Set("q1", "q4"))
    assert(ids(FilterConfig(area = Seq("Private"), language = Seq("de"))) === Set("q4"))
    assert(ids(FilterConfig(year = Seq(2020, 2022))) === Set("q1", "q3", "q5", "q6"))
  }

  test("variant dims restrict via semi-join (question qualifies if ANY variant matches)") {
    assert(ids(FilterConfig(config = Seq("open_question"))) === Set("q1", "q3", "q4", "q6"))
    assert(ids(FilterConfig(config = Seq("mcq_32_choices"))) === Set("q5"))
    assert(ids(FilterConfig(config = Seq("open_question"), split = Seq("test")))
      === Set("q3", "q4")) // both predicates must hold on the SAME variant
  }

  test("tri-state booleans: None = no filter; True/False exclude NULL rows") {
    assert(ids(FilterConfig(negative_question = Some(true))) === Set("q2", "q6"))
    assert(ids(FilterConfig(negative_question = Some(false))) === Set("q1", "q4")) // q3,q5 NULL excluded
    assert(ids(FilterConfig(international = Some(false))) === Set("q2", "q3", "q6")) // q4 NULL excluded
  }

  test("search: question text OR variant answer, case-insensitive (F4/J4)") {
    assert(ids(FilterConfig(), Some("SEPARATION")) === Set("q3"))   // question text
    assert(ids(FilterConfig(), Some("cisg")) === Set("q6"))         // variant answer only
    assert(ids(FilterConfig(), Some("answer")) === Set("q5"))       // in question text of q5
    assert(ids(FilterConfig(), Some("zzz-nope")) === Set.empty)
  }

  test("filters are monotone: adding a filter never adds rows (property)") {
    val base = ids(FilterConfig(language = Seq("en")))
    val narrowed = ids(FilterConfig(language = Seq("en"), area = Seq("Public")))
    assert(narrowed.subsetOf(base))
  }

  test("facets: viable values exclude own dim, honor others (A7)") {
    val langs = Filters.viableValues(qs, vs,
      FilterConfig(area = Seq("Private"), language = Seq("de")), "language")
      .as[String].collect().toSeq
    assert(langs === Seq("de", "en")) // own dim ignored → both viable
    val configs = Filters.viableValues(qs, vs,
      FilterConfig(area = Seq("Interdisciplinary")), "config")
      .as[String].collect().toSeq
    assert(configs === Seq("mcq_32_choices"))
  }

  test("facet consistency: every offered value yields ≥1 row (property)") {
    val fc = FilterConfig(language = Seq("en"))
    for (dim <- Seq("area", "course", "jurisdiction", "config", "split")) {
      val values = Filters.viableValues(qs, vs, fc, dim).collect().map(_.get(0))
      values.foreach { v =>
        val withDim = dim match {
          case "area" => fc.copy(area = Seq(v.toString))
          case "course" => fc.copy(course = Seq(v.toString))
          case "jurisdiction" => fc.copy(jurisdiction = Seq(v.toString))
          case "config" => fc.copy(config = Seq(v.toString))
          case "split" => fc.copy(split = Seq(v.toString))
        }
        assert(ids(withDim).nonEmpty, s"facet $dim=$v offered but yields 0 rows")
      }
    }
  }

  test("cohort selection joins variant- and question-level dims (generation.py:40-63)") {
    val cohort = Filters.filterVariants(vs, qs,
      FilterConfig(config = Seq("open_question"), language = Seq("en")))
      .select("id").as[Long].collect().toSet
    assert(cohort === Set(3L, 5L, 6L, 10L))
  }

  test("cohort ignores negative_question (generation.py:40-63 has no such filter)") {
    val base = FilterConfig(config = Seq("open_question"), language = Seq("en"))
    val withFlag = base.copy(negative_question = Some(true))
    val a = Filters.filterVariants(vs, qs, base).select("id").as[Long].collect().toSet
    val b = Filters.filterVariants(vs, qs, withFlag).select("id").as[Long].collect().toSet
    assert(a === b) // flag in filter_config does not narrow the cohort
    // ...while the explore path DOES honor it (main.py:93-95)
    val explore = Filters.filterQuestions(qs, vs, withFlag)
    assert(explore.count() < Filters.filterQuestions(qs, vs, base).count())
  }
}
