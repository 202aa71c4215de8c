package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Text-analysis operators for an LLM training-data pipeline: language
  * identification (stopword-hit heuristic), quality scoring, token
  * counting. All pure Column expressions (codegen'd, no UDFs), with the
  * word lists shared between the Spark side and the generated DuckDB
  * oracle SQL so the two can never drift.
  *
  * At 100 TB these are embarrassingly parallel map-side expressions —
  * no shuffle until the final aggregate.
  */
object TextAnalysis {

  /** Stopword marker lists per language. Order = deterministic argmax
    * tiebreak priority (first wins on equal hit counts). */
  val LangWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "no", "por", "para", "una", "como", "pero"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "you", "he", "zai", "ren", "ta"))

  /** Tokenization shared by every analysis: PRECOMPUTE this into its
    * own column when combining analyses — higher-order functions block
    * Spark's subexpression elimination, so inlining the split into each
    * per-language filter multiplies the dominant regex cost (measured
    * 5× on langId). */
  def toks(text: Column): Column = TextFunctions.wsTokens(lower(text))

  /** Hit count of `words` among a pre-tokenized array. */
  def langHitsFromTokens(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(words)))

  def langHits(text: Column, words: Seq[String]): Column =
    langHitsFromTokens(toks(text), words)

  /** Predicted language from a pre-tokenized array: argmax of stopword
    * hits, priority-ordered tiebreak, "und" when zero hits. Hit counts
    * come from ONE native pass over the tokens
    * ([[graft.functions.StopwordHits]]) instead of a filter lambda per
    * language. */
  def langIdFromTokens(tokens: Column): Column = {
    val hitsArr = graft.functions.Registry.langStopwordHits(tokens)
    langIdFromHits(hitsArr)
  }

  /** Argmax over a precomputed per-language hit-count array. */
  def langIdFromHits(hitsArr: Column): Column = {
    val hits = LangWords.zipWithIndex.map { case ((l, _), i) =>
      l -> element_at(hitsArr, i + 1)
    }
    val maxHits = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((l, h), acc) =>
      when(h === maxHits && maxHits > 0, lit(l)).otherwise(acc)
    }
  }

  def langId(text: Column): Column = langIdFromTokens(toks(text))

  /** DuckDB equivalent of [[langId]] over column `col`. */
  def langIdSql(col: String): String = {
    def hits(ws: Seq[String]) =
      s"len(list_filter(${TextFunctions.wsTokensSql(s"lower($col)")}, " +
        s"t -> t IN (${ws.map(w => s"'$w'").mkString(",")})))"
    val hs = LangWords.map { case (l, ws) => l -> hits(ws) }
    val maxExpr = s"greatest(${hs.map(_._2).mkString(", ")})"
    val cases = hs.map { case (l, h) =>
      s"WHEN $h = m AND m > 0 THEN '$l'"
    }.mkString(" ")
    s"(SELECT CASE $cases ELSE 'und' END FROM (SELECT $maxExpr AS m))"
  }

  /** Heuristic quality score in [0,1]:
    *  0.4 · min(words/100, 1)  — enough content
    *  0.3 · stopword ratio ×5 capped — natural-language-ness
    *  0.3 · distinct-token ratio     — not a single repeated token
    * Arithmetic is association-ordered identically in [[qualitySql]]. */
  def qualityScoreFromTokens(t: Column): Column = {
    val n = size(t).cast("double")
    val enHits = langHitsFromTokens(t, LangWords.head._2).cast("double")
    val distinctRatio = size(array_distinct(t)).cast("double") / n
    val lenScore = least(n / 100.0, lit(1.0))
    val stopScore = least(enHits / n * 5.0, lit(1.0))
    when(n === 0.0, 0.0)
      .otherwise(lenScore * 0.4 + stopScore * 0.3 + distinctRatio * 0.3)
  }

  def qualityScore(text: Column): Column = qualityScoreFromTokens(toks(text))

  def qualitySql(col: String): String = {
    val t = TextFunctions.wsTokensSql(s"lower($col)")
    val ws = LangWords.head._2.map(w => s"'$w'").mkString(",")
    s"""(SELECT CASE WHEN n = 0 THEN 0.0 ELSE
       |   least(n / 100.0, 1.0) * 0.4
       | + least(eh / n * 5.0, 1.0) * 0.3
       | + (dn / n) * 0.3 END
       | FROM (SELECT CAST(len($t) AS DOUBLE) AS n,
       |              CAST(len(list_filter($t, x -> x IN ($ws))) AS DOUBLE) AS eh,
       |              CAST(len(list_distinct($t)) AS DOUBLE) AS dn))""".stripMargin
  }
}
