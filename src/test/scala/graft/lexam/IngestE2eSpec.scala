package graft.lexam

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** S1 end to end: JSONL config exports → coerced tables with
  * first-writer-wins, plus compaction and the non-unanimous
  * self-consistency path (FIXTURES §A content requirements).
  */
class IngestE2eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("JSONL config exports ingest into coerced questions+variants (S1/S2/S5)") {
    val dir = java.nio.file.Files.createTempDirectory("hf_export")
    def write(name: String, lines: Seq[String]): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      p.toString
    }
    val mcq4 = write("mcq4.jsonl", Seq(
      """{"id":"q1","question":"Q one","course":"International Trade Law","language":"en","area":"Private","jurisdiction":"Swiss","year":"2022-rev1","choices":"['a', 'b', 'c', 'd']","gold":2,"split":"dev"}""",
      """{"id":"q2","question":"Q two","course":"Strafrecht I","language":"de","area":"Criminal","jurisdiction":"Swiss","year":"2021","choices":"['w', 'x']","gold":0,"split":"test"}"""))
    val open = write("open.jsonl", Seq(
      """{"id":"q1","question":"Q one OPEN-VARIANT-TEXT","course":"International Trade Law","language":"en","area":"Private","jurisdiction":"Swiss","year":"2022","answer":"Because.","split":"dev"}""",
      """{"id":"q3","question":"Q three","course":"Public Law","language":"en","area":"Public","jurisdiction":"Generic","year":"2020","answer":"Separation.","split":"test"}"""))

    val (questions, variants) = Ingest.ingestConfigs(spark,
      Seq("mcq_4_choices" -> mcq4, "open_question" -> open),
      internationalCourses = Seq("International Trade Law"))

    val qs = questions.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(qs.keySet === Set("q1", "q2", "q3"))
    // first-writer-wins: q1's question text comes from mcq_4 (priority 1)
    assert(qs("q1").getAs[String]("question") === "Q one")
    // coercions: "2022-rev1" → 2022; stringified choices → array
    assert(qs("q1").getAs[Int]("year") === 2022)
    assert(qs("q1").getAs[Boolean]("international") === true)
    assert(qs("q3").getAs[Boolean]("international") === false)
    val v = variants.where(col("question_id") === "q1" &&
      col("config") === "mcq_4_choices").first()
    assert(v.getAs[Seq[String]]("choices") === Seq("a", "b", "c", "d"))
    assert(variants.count() === 4)
  }

  test("non-unanimous self-consistency with a run-varying client (A15)") {
    val dir = java.nio.file.Files.createTempDirectory("sc_store").toString
    val store = new pipeline.LexamStore(spark, dir)
    Fixtures.writeTo(store)
    store.saveExperiment(Experiment(id = 21, name = "sc",
      filter_config = FilterConfig(config = Seq("mcq_4_choices", "mcq_8_choices")),
      n_answers = 3))
    // letters vary by call count → variants get disagreeing runs
    val varying = new pipeline.LlmClient {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      override def complete(model: String, messages: Seq[pipeline.LlmMessage],
                            temperature: Double, maxTokens: Int): pipeline.LlmResult = {
        val l = ('A' + n.getAndIncrement() % 3).toChar
        pipeline.LlmResult(s"###$l###", 1, 1)
      }
    }
    val progress = new pipeline.ProgressStore
    pipeline.Jobs.runGeneration(store, progress, varying, 21L, parallelism = 1)
    val enriched = ExperimentAnalytics.enriched(store.answers, store.variants,
      store.questions, store.judgments, 21L)
    val c = ExperimentAnalytics.selfConsistency(enriched)
    assert(c.totalVariants === 3)      // variants 1,2,4 (mcq_4/8)
    assert(c.unanimous < c.totalVariants) // letters rotate → disagreement
    assert(c.unanimousRate < 1.0)

    // compaction: many small appended files → 1 per partition, same rows
    val before = store.answers.where(col("experiment_id") === 21).count()
    store.compactAnswers(21L)
    assert(store.answers.where(col("experiment_id") === 21).count() === before)
  }
}
