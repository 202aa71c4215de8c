package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions X1–X10 (SURVEY §2.7), re-expressed as pure
  * Catalyst `Column` combinators — no Scala UDFs, so whole-stage codegen
  * and pushdown stay intact (SURVEY §2.9).
  *
  * Semantics mirror the reference exactly:
  *  - extract_letter: 4-pattern cascade, pattern 3 takes the LAST
  *    multiline match (reference `backend/app/services/letter_extract.py:9-40`)
  *  - extract_score: `[[x.y]]` → double clamped to [0,1], null on no
  *    match (`letter_extract.py:43-53`)
  *  - gold_to_letter: 0-based index → 'A'+i (`letter_extract.py:4-6`)
  *  - strip_thinking: drop `<think>…</think>`, strip outer whitespace
  *    (`services/judging.py:13-17`)
  *  - format_choices: "A) …" lines, max 26 (`services/generation.py:12-19`)
  *  - build_prompt: `{course_name}`/`{question}` substitution
  *    (`services/generation.py:22-37`)
  */
object TextFunctions {

  // Regexes are written in the RE2-compatible subset (no lookaround /
  // backrefs) so the same pattern strings run in Java regex (Spark) and
  // RE2 (DuckDB oracle) with identical results.
  val LetterP1 = "###\\s*([A-Z])\\s*###"
  val LetterP2 = "(?:answer|Answer)\\s*(?:is|:)\\s*\\(?([A-Z])\\)?"
  val LetterP3 = "(?m)(?:^|\\s)\\(?([A-Z])\\)?[\\.\\s]*$"
  val LetterP4 = "(?i)correct\\s+(?:answer|option|choice)\\s+is\\s+\\(?([A-Z])\\)?"
  val ScoreP   = "\\[\\[(\\d+\\.?\\d*)\\]\\]"
  val ThinkP   = "<think>[\\s\\S]*?</think>"

  /** regexp_extract returns "" on no-match; promote to NULL. */
  private def nn(c: Column): Column = when(c =!= "", c)

  /** Python-`str.strip()` equivalent (Spark `trim` only strips spaces). */
  def trimWs(c: Column): Column =
    regexp_replace(regexp_replace(c, "^\\s+", ""), "\\s+$", "")

  /** X1 — MCQ letter extraction cascade; null when no pattern matches. */
  def extractLetter(text: Column): Column = {
    val p3all = regexp_extract_all(text, lit(LetterP3), lit(1))
    coalesce(
      nn(regexp_extract(text, LetterP1, 1)),
      nn(regexp_extract(text, LetterP2, 1)),
      when(size(p3all) > 0, element_at(p3all, -1)),
      upper(nn(regexp_extract(text, LetterP4, 1))))
  }

  /** X2 — judge score extraction, clamped to [0,1]; null on no match. */
  def extractScore(text: Column): Column = {
    val m = nn(regexp_extract(text, ScoreP, 1)).cast("double")
    when(m.isNotNull, least(greatest(m, lit(0.0)), lit(1.0)))
  }

  /** X3 — 0-based gold index → answer letter. */
  def goldToLetter(gold: Column): Column = chr(lit(65) + gold)

  /** X4 — remove <think> blocks, strip outer whitespace. */
  def stripThinking(text: Column): Column =
    trimWs(regexp_replace(text, ThinkP, ""))

  /** X5 — choices array → "A) …\nB) …" block (≤26 options). */
  def formatChoices(choices: Column): Column =
    array_join(
      transform(slice(choices, 1, 26),
        (c, i) => concat(chr(lit(65) + i), lit(") "), c)),
      "\n")

  /** X6 — prompt template substitution ({course_name}, {question}). */
  def buildPrompt(template: Column, courseName: Column, questionText: Column): Column =
    replace(replace(template, lit("{course_name}"), courseName),
            lit("{question}"), questionText)

  /** X8 — MCQ grading: letter equality against gold, false when the
    * letter is missing but gold is set (`services/generation.py:114-118`). */
  def mcqCorrect(extracted: Column, gold: Column): Column =
    when(gold.isNotNull,
      coalesce(extracted === goldToLetter(gold), lit(false)))

  /** A17 — Python `len(s.split())`: whitespace tokens, 0 for blank. */
  def wordCount(text: Column): Column = {
    val t = trimWs(text)
    when(t === "", 0).otherwise(size(split(t, "\\s+")))
  }

  /** Whitespace tokenization matching Python `s.split()` / DuckDB
    * `string_split_regex(trim(s), '\s+')`. */
  def wsTokens(text: Column): Column = {
    val t = trimWs(text)
    when(t === "", array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** BPE-ish token count: letter runs, digit runs, single punctuation.
    * Native since r17 ([[BpeTokenCount]]): one byte scan instead of the
    * regexp_extract_all pass + match-list materialization, identical
    * counts (spec-pinned); [[TokenP]] stays the oracle-side contract. */
  val TokenP = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokenCount(text: Column): Column =
    Registry.bpeTokenCount(text)

  // ------------------------------------------------------------------
  // DuckDB oracle-side equivalents. Generated from the same pattern
  // constants so Spark and oracle can't drift. NOTE: DuckDB
  // regexp_replace needs the 'g' flag to replace all matches (Spark and
  // Python re.sub always replace all).
  // ------------------------------------------------------------------

  def trimWsSql(s: String): String =
    s"regexp_replace(regexp_replace($s, '^\\s+', ''), '\\s+$$', '')"

  def wsTokensSql(s: String): String =
    s"(CASE WHEN ${trimWsSql(s)} = '' THEN CAST([] AS VARCHAR[]) " +
      s"ELSE string_split_regex(${trimWsSql(s)}, '\\s+') END)"

  def wordCountSql(s: String): String = s"len(${wsTokensSql(s)})"

  def extractLetterSql(s: String): String =
    s"""COALESCE(
       |  nullif(regexp_extract($s, '$LetterP1', 1), ''),
       |  nullif(regexp_extract($s, '$LetterP2', 1), ''),
       |  CASE WHEN len(regexp_extract_all($s, '$LetterP3', 1)) > 0
       |       THEN regexp_extract_all($s, '$LetterP3', 1)[-1] END,
       |  upper(nullif(regexp_extract($s, '$LetterP4', 1), '')))""".stripMargin

  def extractScoreSql(s: String): String =
    s"(CASE WHEN nullif(regexp_extract($s, '$ScoreP', 1), '') IS NOT NULL " +
      s"THEN least(greatest(CAST(regexp_extract($s, '$ScoreP', 1) AS DOUBLE), 0.0), 1.0) END)"

  def stripThinkingSql(s: String): String =
    trimWsSql(s"regexp_replace($s, '$ThinkP', '', 'g')")

  def tokenCountSql(s: String): String =
    s"len(regexp_extract_all(lower($s), '$TokenP', 0))"
}
