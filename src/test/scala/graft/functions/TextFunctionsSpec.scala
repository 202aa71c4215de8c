package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** X1–X8 semantics vs the reference cascade
  * (`backend/app/services/letter_extract.py`, `judging.py:13-17`,
  * `generation.py:12-37`) — adversarial cases from SURVEY §5 item 1.
  */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def letter(s: String): Option[String] =
    Seq(s).toDF("t").select(TextFunctions.extractLetter(col("t"))).as[Option[String]].head()
  private def score(s: String): Option[Double] =
    Seq(s).toDF("t").select(TextFunctions.extractScore(col("t"))).as[Option[Double]].head()
  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.stripThinking(col("t"))).as[String].head()
  private def wc(s: String): Int =
    Seq(s).toDF("t").select(TextFunctions.wordCount(col("t"))).as[Int].head()

  test("X1 pattern 1: ###X### wins over everything") {
    assert(letter("Answer: B but really ### C ###") === Some("C"))
    assert(letter("###A###") === Some("A"))
  }

  test("X1 pattern 2: Answer: X / answer is X, optional parens") {
    assert(letter("The answer is (D) obviously") === Some("D"))
    assert(letter("Answer: E") === Some("E"))
    // lowercase target letter does not match pattern 2 (case-sensitive class)
    assert(letter("the answer is b") === None)
  }

  test("X1 pattern 3: LAST standalone capital at a line end (multiline)") {
    assert(letter("A.\nsome reasoning\nB.") === Some("B"))
    assert(letter("thinking...\n(C)\n") === Some("C"))
  }

  test("X1 pattern 4: correct answer is X, case-insensitive, uppercased") {
    assert(letter("the CORRECT ANSWER is (f)") === Some("F"))
  }

  test("X1 no match → null") {
    assert(letter("no letters here at all") === None)
  }

  test("X2 score extraction and clamping") {
    assert(score("Verdict [[0.7]] done") === Some(0.7))
    assert(score("[[1.5]]") === Some(1.0))   // clamp high
    assert(score("[[0]]") === Some(0.0))
    assert(score("no score") === None)
  }

  test("X4 strip thinking removes all blocks and trims") {
    assert(strip("<think>abc</think>  hello <think>x\ny</think> world  ") === "hello  world")
    assert(strip("plain") === "plain")
  }

  test("X5 format choices: A) lines, 26 max") {
    val out = Seq(Seq("alpha", "beta", "gamma")).toDF("c")
      .select(TextFunctions.formatChoices(col("c"))).as[String].head()
    assert(out === "A) alpha\nB) beta\nC) gamma")
    val twentySeven = (1 to 27).map(_.toString)
    val out27 = Seq(twentySeven).toDF("c")
      .select(TextFunctions.formatChoices(col("c"))).as[String].head()
    assert(out27.linesIterator.size === 26 && out27.endsWith("Z) 26"))
  }

  test("X6 build prompt substitutes both placeholders") {
    val out = Seq(("T {course_name}: {question}", "Law", "Q?")).toDF("t", "c", "q")
      .select(TextFunctions.buildPrompt(col("t"), col("c"), col("q"))).as[String].head()
    assert(out === "T Law: Q?")
  }

  test("X8 MCQ grading: null letter with gold set → false") {
    val df = Seq(("A", 0), (null, 0), ("B", 0)).toDF("letter", "gold")
    val got = df.select(TextFunctions.mcqCorrect(col("letter"), col("gold")))
      .as[Option[Boolean]].collect().toSeq
    assert(got === Seq(Some(true), Some(false), Some(false)))
  }

  test("A17 word count matches Python str.split()") {
    assert(wc("  a  b\t\nc ") === 3)
    assert(wc("") === 0)
    assert(wc("   ") === 0)
    assert(wc("one") === 1)
  }

  test("bpe_token_count ≡ size(regexp_extract_all(lower(text), TokenP, 0))") {
    // the r17 native byte-scan twin must count exactly what the regex
    // counted: letter/digit runs once each, every OTHER non-whitespace
    // codepoint once — incl. multibyte UTF-8, supplementary codepoints,
    // NBSP (not Java \s, so it counts), İ whose full lowercase is two
    // codepoints (i + combining dot), and case-joined letter runs
    val fixtures = Seq(
      "", " \t\n\f\r ", "hello world", "ABCdef GHI", "a1b2c3",
      "don't stop-me now!!", "...", "42 1337x9", "tab\tsep\ncr\rend",
      "café Über straße", "你好世界",
      "😀😀 twice", "İstanbul", "a b",
      "MiXeD123CaSe!@#", "  leading trailing  ")
    val df = fixtures.toDF("text")
    val regexForm = size(regexp_extract_all(lower(col("text")),
      lit(TextFunctions.TokenP), lit(0)))
    val rows = df.select(col("text"), regexForm.as("re"),
      TextFunctions.tokenCount(col("text")).as("nat")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2), s"text=${r.getString(0)}")
    }
    // and a value pin so both forms can't drift together
    val got = df.select(TextFunctions.tokenCount(col("text"))).as[Int].collect().toSeq
    assert(got === Seq(0, 0, 2, 2, 6, 9, 3, 4, 4, 7, 4, 3, 3, 3, 6, 2))
  }

  test("poly_hash64 matches the documented fold and is SQL-callable") {
    PolyHash64.register(spark)
    val viaSql = spark.sql("SELECT poly_hash64('hi')").as[Long].head()
    assert(viaSql === (104L * 131 + 105) % 1000000007L)
    assert(PolyHash64.hash(org.apache.spark.unsafe.types.UTF8String.fromString("")) === 0L)
  }
}
