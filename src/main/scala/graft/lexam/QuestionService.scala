package graft.lexam

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explore surface: `GET /api/questions` (reference main.py:159-207) —
  * filter + search + dynamic sort + offset/limit pagination + nested
  * variant serialization (J3), and `GET /api/questions/{id}`.
  */
object QuestionService {

  case class Page(total: Long, offset: Int, limit: Int, items: DataFrame)

  /** Questions with their variants nested as a sorted array of structs
    * (joinedload serialization, main.py:189,554-577). Left join keeps
    * variant-less questions with an empty array. */
  def withNestedVariants(questions: DataFrame, variants: DataFrame): DataFrame = {
    val nested = variants
      .groupBy(col("question_id"))
      .agg(sort_array(collect_list(struct(
        col("id"), col("config"), col("split"),
        col("choices"), col("gold"), col("answer")))).as("variants"))
      .withColumnRenamed("question_id", "id")
    questions.join(nested, Seq("id"), "left_outer")
      .withColumn("variants", coalesce(col("variants"), array()))
  }

  /** Sort-key whitelist (main.py:135-156). The `config`/`split` keys are
    * the reference's correlated scalar subqueries `min(variant.x)` —
    * rewritten as a groupBy+join (J7, SURVEY §2.3). */
  val SortableColumns: Set[String] = Set(
    "id", "config", "split", "area", "course", "language", "year",
    "negative_question", "international", "question")

  /** One page of questions: (filters, search, sort, offset/limit) →
    * Page(total, items ordered with `id` tiebreak).
    * Default order: year DESC, id ASC (main.py:200).
    *
    * Both actions the endpoint needs — the total count (main.py:193)
    * and the ordered page (main.py:198) — run off ONE materialization
    * of the filtered cohort: the reference issues two Postgres
    * round-trips, but replaying that as two Spark jobs re-scanned the
    * question source (and every filter semi-join) per page request —
    * the visible duplicate cost of the hottest endpoint at scale. The
    * filtered frame is cached, counted (the action that populates the
    * cache, one source scan), paged from the cache
    * (spec-pinned: the page plan reads InMemoryTableScan, zero
    * question-source scans), and released before returning — `items`
    * is the collected page re-wrapped as a local DataFrame, which is
    * exactly a page-size (≤ 200-row, main.py:174) serving result, so
    * pinning executor cache blocks for a lazy consumer would buy
    * nothing. Deliberately NOT `count(*) over ()`: that form computes
    * the total inside the page query but forces the whole cohort
    * through a single-partition window — the plan shape this library
    * rejects everywhere else. */
  def listQuestions(questions: DataFrame, variants: DataFrame,
                    fc: FilterConfig = FilterConfig(),
                    search: Option[String] = None,
                    sortBy: Option[String] = None, sortDir: String = "asc",
                    offset: Int = 0, limit: Int = 50): Page = {
    val spark = questions.sparkSession
    val filtered = Filters.filterQuestions(questions, variants, fc, search).cache()
    try {
      val total = filtered.count()
      val pageDf = pageFrame(filtered, variants, sortBy, sortDir, offset, limit)
      val rows = pageDf.collect()
      Page(total, offset, limit,
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), pageDf.schema))
    } finally filtered.unpersist(blocking = false)
  }

  /** The ordered/offset/limited page over an (already cached) filtered
    * cohort — split out so the plan is inspectable: its only reads are
    * the cache and the variants side. */
  private[lexam] def pageFrame(filtered: DataFrame, variants: DataFrame,
                               sortBy: Option[String], sortDir: String,
                               offset: Int, limit: Int): DataFrame = {
    val base = withNestedVariants(filtered, variants)
    val withSortKeys = sortBy match {
      case Some(k @ ("config" | "split")) =>
        val minKeys = variants.groupBy(col("question_id"))
          .agg(min(col(k)).as(s"_min_$k"))
          .withColumnRenamed("question_id", "id")
        base.join(minKeys, Seq("id"), "left_outer")
      case _ => base
    }
    val sortCol: Option[Column] = sortBy.collect {
      case k @ ("config" | "split") if SortableColumns(k) => col(s"_min_$k")
      case k if SortableColumns(k)                        => col(k)
    }
    val ordered = sortCol match {
      case Some(c) =>
        val o = if (sortDir == "desc") c.desc else c.asc
        withSortKeys.orderBy(o, col("id"))
      case None => withSortKeys.orderBy(desc("year"), col("id"))
    }
    ordered.drop("_min_config", "_min_split").offset(offset).limit(limit)
  }

  /** Single question with nested variants (main.py:210-221). */
  def getQuestion(questions: DataFrame, variants: DataFrame, id: String): DataFrame =
    withNestedVariants(questions.where(col("id") === id), variants)
}
