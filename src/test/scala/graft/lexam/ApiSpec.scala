package graft.lexam

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.lexam.pipeline._

/** JSON façade shapes: parse with a real JSON reader (via Spark's
  * from_json on the driver is overkill — use scala.util.parsing? none;
  * assert structure with string checks + round-trip through Spark). */
class ApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val qs = Fixtures.questions.toDS().toDF()
  private lazy val vs = Fixtures.variants.toDS().toDF()

  private def parse(json: String): Any = {
    // validate well-formedness by parsing through Spark's JSON reader
    val df = spark.read.json(Seq(json).toDS())
    assert(!df.columns.contains("_corrupt_record"), s"invalid JSON: $json")
    df
  }

  test("questions page JSON: total/offset/limit/items with nested variants") {
    val json = Api.questionsPage(qs, vs, FilterConfig(language = Seq("en")), limit = 2)
    parse(json)
    assert(json.contains("\"total\": 4"))
    assert(json.contains("\"items\": ["))
    assert(json.contains("\"variants\": ["))
  }

  test("single question JSON: nested variants; not-found error object") {
    val json = Api.question(qs, vs, "q1")
    parse(json)
    assert(json.contains("\"id\": \"q1\"") && json.contains("\"variants\": ["))
    assert(json.contains("\"mcq_8_choices\""))
    assert(Api.question(qs, vs, "nope") === """{"error": "not found"}""")
  }

  test("stats JSON: full golden equality on the fixtures (SURVEY §5.2)") {
    val expected =
      """{"total_questions": 6, "total_variants": 10, """ +
      """"by_config": {"mcq_4_choices": 2, "mcq_8_choices": 1, "open_question": 5, "mcq_16_choices": 1, "mcq_32_choices": 1}, """ +
      """"by_area": {"Private": 2, "Criminal": 1, "Public": 2, "Interdisciplinary": 1}, """ +
      """"by_language": {"en": 4, "de": 2}, """ +
      """"by_year": {"2020": 2, "2021": 2, "2022": 2}}"""
    // map iteration order is not part of the contract — compare parsed
    val got = Api.stats(qs, vs)
    def norm(j: String): Map[String, String] =
      "\"(\\w+)\": (\\{[^}]*\\}|\\d+)".r.findAllMatchIn(j)
        .map(m => m.group(1) -> m.group(2).replaceAll("[\\s]", ""))
        .toMap.map { case (k, v) =>
          k -> (if (v.startsWith("{"))
            v.stripPrefix("{").stripSuffix("}").split(",").sorted.mkString(",")
          else v)
        }
    assert(norm(got).view.filterKeys(_ != "by_config").toMap ===
      norm(expected).view.filterKeys(_ != "by_config").toMap)
    assert(norm(got)("by_config") === norm(expected)("by_config"))
  }

  test("stats JSON matches reference key names") {
    val json = Api.stats(qs, vs)
    parse(json)
    for (k <- Seq("total_questions", "total_variants", "by_config", "by_area",
        "by_language", "by_year")) assert(json.contains(s""""$k""""), k)
  }

  test("filters JSON: years descending (main.py:493)") {
    val json = Api.filters(qs, vs, FilterConfig())
    parse(json)
    assert(json.contains("\"years\": [2022, 2021, 2020]"))
  }

  test("search-summary JSON: by_course insertion-ordered by count desc") {
    val json = Api.searchSummary(qs, vs, FilterConfig(), "the")
    parse(json)
    val courses = "\"by_course\": \\{([^}]*)\\}".r.findFirstMatchIn(json).get.group(1)
    val counts = ": (\\d+)".r.findAllMatchIn(courses).map(_.group(1).toLong).toSeq
    assert(counts === counts.sortBy(-_))
  }

  test("answers/judgments pages + experiment list JSON shapes") {
    val dir = java.nio.file.Files.createTempDirectory("api_store2").toString
    val store = new LexamStore(spark, dir)
    Fixtures.writeTo(store)
    store.saveExperiment(Experiment(id = 8, name = "pages",
      filter_config = FilterConfig(language = Seq("en"))))
    val progress = new ProgressStore
    Jobs.runGeneration(store, progress, new DeterministicStubClient, 8L, parallelism = 2)
    Jobs.runJudging(store, progress, new DeterministicStubClient, 8L, "j1", parallelism = 2)

    val ansJson = Api.answersPage(store, 8L, offset = 1, limit = 3)
    parse(ansJson)
    assert(ansJson.contains("\"total\": 7") && ansJson.contains("\"question_text\""))
    val jJson = Api.judgmentsPage(store, 8L)
    parse(jJson)
    assert(jJson.contains("\"judge_model\": \"j1\""))
    val listJson = Api.listExperiments(store)
    parse(listJson)
    assert(listJson.contains("\"answer_count\": 7") &&
      listJson.contains("\"judgment_count\": 4"))
    // full _serialize field set + per-judge breakdown (experiments.py:180-211)
    for (k <- Seq("filter_config", "open_question_prompt", "mcq_prompt",
        "judge_system_prompt", "judge_prompt", "temperature", "max_tokens",
        "judge_temperature", "judge_max_tokens", "updated_at", "judges"))
      assert(listJson.contains(s""""$k""""), k)
    assert(listJson.contains(""""judges": [{"model": "j1", "count": 4}]"""))
    val oneJson = Api.getExperiment(store, 8L)
    parse(oneJson)
    assert(oneJson.contains("\"answer_count\": 7") &&
      oneJson.contains(""""judges": [{"model": "j1", "count": 4}]"""))
    intercept[NoSuchElementException](Api.getExperiment(store, 12345L))
    assert(Api.questionCount(store,
      FilterConfig(language = Seq("en"))) === 7L)
    // POST-body-shaped preview (experiments.py:174-178): partial dict
    // normalizes (bare scalar promoted), absent/null filter_config
    // counts everything, unknown keys ignored
    assert(Api.questionCountPreview(store,
      Map("filter_config" -> Map("language" -> "en", "bogus" -> 1))) === 7L)
    val total = Api.questionCount(store, FilterConfig())
    assert(Api.questionCountPreview(store, Map.empty) === total)
    assert(Api.questionCountPreview(store,
      Map("filter_config" -> null)) === total)
    // a present-but-non-object config is rejected, not treated as empty
    intercept[IllegalArgumentException](Api.questionCountPreview(store,
      Map("filter_config" -> """{"language": "en"}""")))

    // orphaned judgments: a bulk answers delete (generation.py:73-84
    // bypasses ORM cascade) leaves judgment rows on disk, but the
    // reference counts judgments THROUGH ExperimentAnswer
    // (experiments.py:79-84,183-189) — orphans must report as zero
    store.deleteAnswers(8L)
    assert(!store.judgments.isEmpty) // rows really are orphaned, not gone
    val orphanedList = Api.listExperiments(store)
    assert(orphanedList.contains("\"judgment_count\": 0") &&
      orphanedList.contains("\"judges\": []"))
    val orphanedOne = Api.getExperiment(store, 8L)
    assert(orphanedOne.contains("\"judgment_count\": 0") &&
      orphanedOne.contains("\"judges\": []"))
  }

  test("dashboard JSON: full golden equality on the fixtures (main.py:312-459)") {
    val expected =
      """{"total_questions": 6, "total_courses": 5, "total_de": 2, "total_en": 4, """ +
      """"min_year": 2020, "max_year": 2022, """ +
      """"courses": [{"course": "Public Law", "area": "Public", "count": 2, "lang_de": 0, "lang_en": 2}, """ +
      """{"course": "International Trade Law", "area": "Interdisciplinary", "count": 1, "lang_de": 0, "lang_en": 1}, """ +
      """{"course": "Privatrecht", "area": "Private", "count": 1, "lang_de": 1, "lang_en": 0}, """ +
      """{"course": "Strafrecht I", "area": "Criminal", "count": 1, "lang_de": 1, "lang_en": 0}, """ +
      """{"course": "US Business Law", "area": "Private", "count": 1, "lang_de": 0, "lang_en": 1}], """ +
      """"areas": [{"name": "Criminal", "value": 1}, {"name": "Interdisciplinary", "value": 1}, """ +
      """{"name": "Private", "value": 2}, {"name": "Public", "value": 2}], """ +
      """"jurisdictions": [{"name": "Generic", "value": 1}, {"name": "International", "value": 2}, """ +
      """{"name": "Swiss", "value": 3}], """ +
      """"years": [{"year": 2020, "Private": 1, "Public": 1, "Criminal": 0, "Interdisciplinary": 0, "total": 2}, """ +
      """{"year": 2021, "Private": 1, "Public": 0, "Criminal": 1, "Interdisciplinary": 0, "total": 2}, """ +
      """{"year": 2022, "Private": 0, "Public": 1, "Criminal": 0, "Interdisciplinary": 1, "total": 2}], """ +
      """"splits": [{"name": "dev", "value": 4, "pct": "67%"}, {"name": "test", "value": 5, "pct": "83%"}], """ +
      """"area_jurisdiction": [{"area": "Private", "Swiss": 1, "International": 1, "Generic": 0}, """ +
      """{"area": "Public", "Swiss": 1, "International": 0, "Generic": 1}, """ +
      """{"area": "Criminal", "Swiss": 1, "International": 0, "Generic": 0}, """ +
      """{"area": "Interdisciplinary", "Swiss": 0, "International": 1, "Generic": 0}], """ +
      """"lang_area": [{"area": "Private", "de": 1, "en": 1}, {"area": "Public", "de": 0, "en": 2}, """ +
      """{"area": "Criminal", "de": 1, "en": 0}, {"area": "Interdisciplinary", "de": 0, "en": 1}], """ +
      """"answer_lengths": [{"range": "< 50 words", "count": 4}, {"range": "50–100", "count": 1}, """ +
      """{"range": "100–200", "count": 0}, {"range": "200–400", "count": 0}, """ +
      """{"range": "400–600", "count": 0}, {"range": "600+", "count": 0}], """ +
      """"answer_stats": [{"area": "Private", "avgWords": 6, "medianWords": 6, "minWords": 6, "maxWords": 7}, """ +
      """{"area": "Public", "avgWords": 21, "medianWords": 8, "minWords": 5, "maxWords": 50}]}"""
    val got = Api.dashboard(qs, vs)
    parse(got)
    assert(got === expected)
  }

  test("dashboard aggregates share ONE cached cohort: every per-section job reads the InMemoryTableScan, not the source") {
    // the §3.3 design note: the dashboard's sections (courses, years,
    // splits, areas, jurisdictions, area×jurisdiction, lang×area,
    // total count) are small driver round-trips, but each must derive
    // from the SAME cached filtered-cohort scan — six re-reads of the
    // source at 100× would be the reference's N+1 re-filtering shape
    val cohort = DatasetAnalytics.dashboardQuestions(qs, vs, Nil, Nil).cache()
    try {
      cohort.count() // materialize the cache
      def readsCache(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.executedPlan.toString.contains("InMemoryTableScan")
      import org.apache.spark.sql.functions.col
      val sections = Seq(
        DatasetAnalytics.dashboardCourses(cohort),
        DatasetAnalytics.dashboardYears(cohort),
        DatasetAnalytics.dashboardSplits(vs, cohort, Nil),
        cohort.groupBy(col("area")).count(),
        cohort.groupBy(col("jurisdiction")).count(),
        DatasetAnalytics.dashboardAreaJurisdiction(cohort),
        DatasetAnalytics.dashboardLangArea(cohort))
      sections.zipWithIndex.foreach { case (df, i) =>
        assert(readsCache(df), s"dashboard section $i re-reads the source " +
          s"instead of the cached cohort:\n${df.queryExecution.executedPlan}")
      }
    } finally cohort.unpersist()
  }

  test("dashboard JSON respects config + language filters (main.py:320-337)") {
    // only q1 (en) and q2 (de) have an mcq_4 variant — full golden
    val expected =
      """{"total_questions": 2, "total_courses": 2, "total_de": 1, "total_en": 1, """ +
      """"min_year": 2020, "max_year": 2021, """ +
      """"courses": [{"course": "Strafrecht I", "area": "Criminal", "count": 1, "lang_de": 1, "lang_en": 0}, """ +
      """{"course": "US Business Law", "area": "Private", "count": 1, "lang_de": 0, "lang_en": 1}], """ +
      """"areas": [{"name": "Criminal", "value": 1}, {"name": "Private", "value": 1}], """ +
      """"jurisdictions": [{"name": "International", "value": 1}, {"name": "Swiss", "value": 1}], """ +
      """"years": [{"year": 2020, "Private": 1, "Public": 0, "Criminal": 0, "Interdisciplinary": 0, "total": 1}, """ +
      """{"year": 2021, "Private": 0, "Public": 0, "Criminal": 1, "Interdisciplinary": 0, "total": 1}], """ +
      """"splits": [{"name": "dev", "value": 1, "pct": "50%"}, {"name": "test", "value": 1, "pct": "50%"}], """ +
      """"area_jurisdiction": [{"area": "Private", "Swiss": 0, "International": 1, "Generic": 0}, """ +
      """{"area": "Criminal", "Swiss": 1, "International": 0, "Generic": 0}], """ +
      """"lang_area": [{"area": "Private", "de": 0, "en": 1}, {"area": "Criminal", "de": 1, "en": 0}], """ +
      """"answer_lengths": [{"range": "< 50 words", "count": 1}, {"range": "50–100", "count": 0}, """ +
      """{"range": "100–200", "count": 0}, {"range": "200–400", "count": 0}, """ +
      """{"range": "400–600", "count": 0}, {"range": "600+", "count": 0}], """ +
      """"answer_stats": [{"area": "Private", "avgWords": 7, "medianWords": 7, "minWords": 7, "maxWords": 7}]}"""
    val got = Api.dashboard(qs, vs, config = Seq("mcq_4_choices"))
    parse(got)
    assert(got === expected)
    val gotLang = Api.dashboard(qs, vs, language = Seq("de"))
    parse(gotLang)
    assert(gotLang.contains("\"total_questions\": 2")) // q2, q4
  }

  test("dashboard comparison JSON: open-vs-MCQ full-outer merge with zero-fill, golden (Dashboard.jsx:595-629)") {
    // open side = {q1,q3,q4,q6}; MCQ side = {q1,q2,q4,q5}. Every merge
    // direction is exercised: Public exists ONLY open-side (MCQ
    // zero-filled), Criminal/Interdisciplinary ONLY mcq-side
    // (Open-Ended zero-filled), Private on both.
    val expected =
      """{"area_comparison": [{"area": "Private", "Open-Ended": 2, "MCQ": 2}, """ +
      """{"area": "Public", "Open-Ended": 2, "MCQ": 0}, """ +
      """{"area": "Criminal", "Open-Ended": 0, "MCQ": 1}, """ +
      """{"area": "Interdisciplinary", "Open-Ended": 0, "MCQ": 1}], """ +
      """"year_comparison": [{"year": 2020, "Open-Ended": 2, "MCQ": 1}, """ +
      """{"year": 2021, "Open-Ended": 1, "MCQ": 2}, """ +
      """{"year": 2022, "Open-Ended": 1, "MCQ": 1}], """ +
      """"course_comparison": [""" +
      """{"course": "Privatrecht", "area": "Private", "open": 1, "mcq": 1, "total": 2}, """ +
      """{"course": "Public Law", "area": "Public", "open": 2, "mcq": 0, "total": 2}, """ +
      """{"course": "US Business Law", "area": "Private", "open": 1, "mcq": 1, "total": 2}, """ +
      """{"course": "International Trade Law", "area": "Interdisciplinary", "open": 0, "mcq": 1, "total": 1}, """ +
      """{"course": "Strafrecht I", "area": "Criminal", "open": 0, "mcq": 1, "total": 1}]}"""
    val got = Api.dashboardComparison(qs, vs)
    parse(got)
    assert(got === expected)
    // language filter narrows BOTH sides before the merge (the JSX
    // appends the same language param to both fetches)
    val expectedDe =
      """{"area_comparison": [{"area": "Private", "Open-Ended": 1, "MCQ": 1}, """ +
      """{"area": "Criminal", "Open-Ended": 0, "MCQ": 1}], """ +
      """"year_comparison": [{"year": 2021, "Open-Ended": 1, "MCQ": 2}], """ +
      """"course_comparison": [""" +
      """{"course": "Privatrecht", "area": "Private", "open": 1, "mcq": 1, "total": 2}, """ +
      """{"course": "Strafrecht I", "area": "Criminal", "open": 0, "mcq": 1, "total": 1}]}"""
    val gotDe = Api.dashboardComparison(qs, vs, language = Seq("de"))
    parse(gotDe)
    assert(gotDe === expectedDe)
  }

  test("compare-judges / by-question / judge-summary JSON shapes") {
    val dir = java.nio.file.Files.createTempDirectory("api_store3").toString
    val store = new LexamStore(spark, dir)
    Fixtures.writeTo(store)
    store.saveExperiment(Experiment(id = 11, name = "judge-facades",
      filter_config = FilterConfig(language = Seq("en"))))
    val progress = new ProgressStore
    Jobs.runGeneration(store, progress, new DeterministicStubClient, 11L, parallelism = 2)
    Jobs.runJudging(store, progress, new DeterministicStubClient, 11L, "j1", parallelism = 2)
    Jobs.runJudging(store, progress, new DeterministicStubClient, 11L, "j2", parallelism = 2)

    val cj = Api.compareJudges(store, 11L)
    parse(cj)
    for (k <- Seq("judge_model", "judged", "avg_score", "median_score"))
      assert(cj.contains(s""""$k""""), k)
    assert(cj.contains("\"j1\"") && cj.contains("\"j2\""))

    val bq = Api.statsByQuestion(store, 11L)
    parse(bq)
    for (k <- Seq("question_id", "course", "area", "config", "mcq_correct",
        "avg_score", "answer_count", "judgment_count"))
      assert(bq.contains(s""""$k""""), k)
    // reference dict order: question_id first, judgment_count last per row
    val firstRow = bq.substring(bq.indexOf('{'))
    assert(firstRow.indexOf("question_id") < firstRow.indexOf("avg_score"))
    assert(firstRow.indexOf("avg_score") < firstRow.indexOf("judgment_count"))
    // sorted by avg_score desc (nulls treated like 0 by the reference)
    val avgs = "\"avg_score\": ([0-9.]+)".r.findAllMatchIn(bq)
      .map(_.group(1).toDouble).toSeq
    assert(avgs === avgs.sortBy(-(_: Double)))

    val js = Api.judgeSummary(store, 11L)
    parse(js)
    for (k <- Seq("judge_model", "count", "avg_score"))
      assert(js.contains(s""""$k""""), k)
    // judge-summary counts include NULL-score judgments
    // (routers/judging.py:111-132 has no score filter)
    val total = "\"count\": (\\d+)".r.findAllMatchIn(js).map(_.group(1).toLong).sum
    assert(total === store.judgments
      .join(store.answers.where(org.apache.spark.sql.functions.col("experiment_id") === 11L)
        .select(org.apache.spark.sql.functions.col("id").as("answer_id")),
        Seq("answer_id"), "left_semi").count())
    // non-existent experiment → error, like the reference 404
    intercept[NoSuchElementException](Api.compareJudges(store, 999L))
  }

  test("experiment stats JSON: full reference shape") {
    val dir = java.nio.file.Files.createTempDirectory("api_store").toString
    val store = new LexamStore(spark, dir)
    Fixtures.writeTo(store)
    store.saveExperiment(Experiment(id = 9, name = "api",
      filter_config = FilterConfig(language = Seq("en")), n_answers = 2))
    val progress = new ProgressStore
    Jobs.runGeneration(store, progress, new DeterministicStubClient, 9L, parallelism = 2)
    Jobs.runJudging(store, progress, new DeterministicStubClient, 9L, "j1", parallelism = 2)
    val json = Api.experimentStats(store, 9L)
    parse(json)
    for (k <- Seq("total_answers", "mcq", "accuracy", "open", "score_distribution",
        "by_area", "by_course", "tokens", "self_consistency", "unanimous_rate"))
      assert(json.contains(s""""$k""""), k)
  }
}
