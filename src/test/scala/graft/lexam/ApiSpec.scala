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
    assert(Api.questionCount(store,
      FilterConfig(language = Seq("en"))) === 7L)
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
