package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins [[TextAnalysis.repetitionSignals]] to hand-computed Gopher
  * fractions on a constructed doc (every signal's numerator and
  * denominator worked out on paper), the zero-branch edge cases, and
  * the scale posture: the per-doc signal projection is shuffle-free.
  */
class RepetitionSignalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def signals(docs: Seq[(Long, String)], segWords: Int = 2,
                      topNs: Seq[Int] = Seq(2), dupNs: Seq[Int] = Seq(2)) =
    TextAnalysis.repetitionSignals(
      docs.toDF("doc_id", "text"), segWords, topNs, dupNs)
      .orderBy(col("doc_id")).collect()

  test("hand-computed fractions on a repetitive doc") {
    // words: a b a b a b c d  (8 words, 8 token chars)
    // 2-word lines: "a b","a b","a b","c d" -> 4 lines, 2 distinct
    //   dup_line_frac = (4-2)/4 = 0.5
    //   dup_line_chars = (3-1)*2 = 4 -> 0.5
    // bigrams: "a b"x3, "b a"x2, "b c", "c d"
    //   top2 = 3 occurrences * 2 chars = 6 -> 0.75
    //   duplicated bigrams cover word positions 1..6 -> 6 chars -> 0.75
    val Array(r) = signals(Seq((1L, "a b a b a b c d")))
    assert(r.getAs[Long]("n_words") === 8L)
    assert(r.getAs[Long]("total_chars") === 8L)
    assert(r.getAs[Long]("n_lines") === 4L)
    assert(r.getAs[Double]("dup_line_frac") === 0.5)
    assert(r.getAs[Double]("dup_line_char_frac") === 0.5)
    assert(r.getAs[Double]("top2_char_frac") === 0.75)
    assert(r.getAs[Double]("dup2_char_frac") === 0.75)
  }

  test("repetition-free doc: dup signals zero, top-gram still counts its single occurrence") {
    val Array(r) = signals(Seq((1L, "x y z w")))
    assert(r.getAs[Double]("dup_line_frac") === 0.0)
    assert(r.getAs[Double]("dup_line_char_frac") === 0.0)
    // most frequent bigram occurs once: 1 * 2 chars / 4 chars
    assert(r.getAs[Double]("top2_char_frac") === 0.5)
    assert(r.getAs[Double]("dup2_char_frac") === 0.0)
  }

  test("empty text and docs shorter than n hit the zero guards") {
    val rows = signals(Seq((1L, ""), (2L, "one two")),
      segWords = 8, topNs = Seq(3), dupNs = Seq(10))
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val empty = byId(1L)
    assert(empty.getAs[Long]("n_words") === 1L) // split("") -> [""]
    assert(empty.getAs[Long]("total_chars") === 0L)
    Seq("dup_line_frac", "dup_line_char_frac", "top3_char_frac",
      "dup10_char_frac").foreach(c =>
      assert(empty.getAs[Double](c) === 0.0, s"$c on empty text"))
    // 2 words < n for both gram widths: no grams, fractions 0
    val short = byId(2L)
    assert(short.getAs[Double]("top3_char_frac") === 0.0)
    assert(short.getAs[Double]("dup10_char_frac") === 0.0)
  }

  test("overlapping duplicated n-grams are position-unioned, not double-counted") {
    // words: a a a a b  -> duplicated trigram "a a a" at pos 1,2
    // covers positions 1..4 (union, NOT 3+3=6 chars) -> 4/5
    val Array(r) = signals(Seq((1L, "a a a a b")),
      segWords = 8, topNs = Seq(3), dupNs = Seq(3))
    assert(r.getAs[Double]("dup3_char_frac") === 0.8)
  }

  test("signal projection is shuffle-free (pure per-row expressions)") {
    val df = TextAnalysis.repetitionSignals(
      Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetitionSignals must not shuffle:\n$plan")
  }

  test("registered SQL function ignores null array elements instead of NPEing") {
    // split() never yields null elements, but repetition_stats is a
    // registered SQL function a user can hand an arbitrary array — null
    // elements must be skipped (the HOF formulation's array_join rule),
    // never crash the task. With the null dropped the stats equal the
    // 3-token doc's.
    val r = spark.sql(
      "SELECT repetition_stats(array('a', CAST(NULL AS string), 'a', 'a'), 2, '2', '2') AS st")
      .collect()(0).getAs[scala.collection.Seq[Long]]("st")
    val clean = spark.sql(
      "SELECT repetition_stats(array('a', 'a', 'a'), 2, '2', '2') AS st")
      .collect()(0).getAs[scala.collection.Seq[Long]]("st")
    assert(r === clean)
    assert(r.head === 3L) // n_words counts non-null tokens
  }

  test("invalid params rejected") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.repetitionSignals(df, segWords = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.repetitionSignals(df, topNs = Seq(0))
    }
    // duplicate widths would emit duplicate output columns (Spark) /
    // duplicate CTE names (DuckDB twin) — both must refuse
    intercept[IllegalArgumentException] {
      TextAnalysis.repetitionSignals(df, topNs = Seq(2, 2))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.repetitionSignals(df, dupNs = Seq(5, 5))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.repetitionSignalsSql(topNs = Seq(2, 2))
    }
  }
}
