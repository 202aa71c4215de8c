package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content scrubbing + repetition quality signals for a training-data
  * pipeline: URL/email/phone redaction and repeated-n-gram detection.
  * Pure Column expressions; the regex patterns live in the RE2-compatible
  * subset so the DuckDB oracle runs the identical patterns.
  */
object Scrub {

  // RE2-safe patterns (no lookaround). Phone requires ≥7 actual digits
  // (each after the first preceded by optional separators) — a plain
  // separator-class quantifier would also swallow e.g. "2020  2021".
  val UrlP   = "https?://[^\\s]+"
  val EmailP = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneP = "\\+?[0-9](?:[()\\-\\s]*[0-9]){6,}"

  def redactUrls(c: Column): Column   = regexp_replace(c, UrlP, "<URL>")
  def redactEmails(c: Column): Column = regexp_replace(c, EmailP, "<EMAIL>")
  def redactPhones(c: Column): Column = regexp_replace(c, PhoneP, "<PHONE>")

  /** Full scrub pipeline (URL first: URLs can contain @). */
  def scrub(c: Column): Column = redactPhones(redactEmails(redactUrls(c)))

  def urlCount(c: Column): Column =
    size(regexp_extract_all(c, lit(UrlP), lit(0)))
  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailP), lit(0)))

  /** SQL twins (DuckDB regexp_replace needs 'g' for replace-all). */
  def scrubSql(col: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($col, '$UrlP', '<URL>', 'g'), " +
      s"'$EmailP', '<EMAIL>', 'g'), '$PhoneP', '<PHONE>', 'g')"
  def urlCountSql(col: String): String =
    s"len(regexp_extract_all($col, '$UrlP', 0))"
  def emailCountSql(col: String): String =
    s"len(regexp_extract_all($col, '$EmailP', 0))"

  /** Repetition ratio: occurrences of the MOST frequent k-gram divided
    * by the number of k-grams — the "repeated n-gram" quality filter
    * (docs full of one phrase score near 1). Expressed with one
    * explode+groupBy over positions, no UDF. */
  def repetitionRatio(docs: org.apache.spark.sql.DataFrame, k: Int,
                      textCol: String = "text",
                      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    import graft.functions.{Registry, TextFunctions}
    val toks = Registry.wsLowerTokens(col(textCol))
    // all k-gram positions (NOT distinct — frequency matters here)
    val grams = docs.select(col(idCol),
        explode(when(size(toks) >= k,
          transform(sequence(lit(0), size(toks) - k),
            i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
          .otherwise(array().cast("array<string>"))).as("g"))
    grams.groupBy(col(idCol), col("g")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg((max(col("n")).cast("double") / sum(col("n"))).as("rep_ratio"),
        sum(col("n")).as("n_grams"))
  }

  def repetitionRatioSql(k: Int, sampleWhere: String = ""): String = {
    val joins = (1 until k).map(j =>
      s"JOIN p t$j ON t$j.doc_id = t0.doc_id AND t$j.pos = t0.pos + $j").mkString(" ")
    val catted = (0 until k).map(j => s"t$j.tok").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, ${graft.functions.TextFunctions.wsTokensSql("lower(text)")} AS t
       |  FROM documents $sampleWhere),
       |p AS (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos FROM toks),
       |grams AS (SELECT t0.doc_id, $catted AS g FROM p t0 $joins),
       |freq AS (SELECT doc_id, g, COUNT(*) AS n FROM grams GROUP BY 1, 2)
       |SELECT doc_id, CAST(MAX(n) AS DOUBLE) / SUM(n) AS rep_ratio,
       |       CAST(SUM(n) AS BIGINT) AS n_grams
       |FROM freq GROUP BY doc_id""".stripMargin
  }
}
