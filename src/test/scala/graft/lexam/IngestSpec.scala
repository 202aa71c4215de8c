package graft.lexam

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("S5: year coercion truncates to 4 chars and survives garbage") {
    val got = Seq("2022-06", "1999", "20", "abcd", null)
      .toDF("y").select(Ingest.coerceYear(col("y"))).as[Option[Int]].collect().toSeq
    assert(got === Seq(Some(2022), Some(1999), Some(20), None, None))
  }

  test("S5: stringified choices list → array<string>") {
    val got = Seq("['a', 'b c', 'd']", """["x", "y"]""", "[]")
      .toDF("c").select(Ingest.coerceChoices(col("c"))).as[Seq[String]].collect().toSeq
    assert(got(0) === Seq("a", "b c", "d"))
    assert(got(1) === Seq("x", "y"))
    assert(got(2) === Seq.empty)
  }

  test("S5: escaped quotes inside choices") {
    val got = Seq("""['it\'s fine', 'plain']""").toDF("c")
      .select(Ingest.coerceChoices(col("c"))).as[Seq[String]].head()
    assert(got === Seq("it's fine", "plain"))
  }

  test("S2: first-writer-wins keeps the highest-priority config's row") {
    val perConfig = Seq(
      ("q1", "from-mcq8", "mcq_8_choices"),
      ("q1", "from-mcq4", "mcq_4_choices"),
      ("q2", "from-open", "open_question"))
      .toDF("id", "question", "_config")
    val priority = Seq("mcq_4_choices", "mcq_8_choices", "open_question")
    val got = Ingest.firstWriterWins(perConfig, priority)
      .orderBy("id").select("question").as[String].collect().toSeq
    assert(got === Seq("from-mcq4", "from-open"))
  }

  test("S3: idempotence guard drops already-loaded configs") {
    val incoming = Seq(("mcq_4_choices", 1L), ("open_question", 2L))
      .toDF("config", "vid")
    val existing = Seq(Tuple1("mcq_4_choices")).toDF("config")
    val got = Ingest.notYetLoaded(incoming, existing).select("config").as[String].collect().toSeq
    assert(got === Seq("open_question"))
  }

  test("S4: derived + backfilled international flag") {
    val intl = Seq("International Trade Law")
    val qs = Seq(("a", "International Trade Law", Some(false)),
                 ("b", "Strafrecht I", None),
                 ("c", "International Trade Law", None))
      .toDF("id", "course", "international")
    val got = Ingest.backfillInternational(qs, intl)
      .orderBy("id").select("international").as[Boolean].collect().toSeq
    // explicit false is preserved; NULLs recomputed from the course set
    assert(got === Seq(false, false, true))
  }
}
