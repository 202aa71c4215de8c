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
    * Default order: year DESC, id ASC (main.py:200). */
  def listQuestions(questions: DataFrame, variants: DataFrame,
                    fc: FilterConfig = FilterConfig(),
                    search: Option[String] = None,
                    sortBy: Option[String] = None, sortDir: String = "asc",
                    offset: Int = 0, limit: Int = 50): Page = {
    val filtered = Filters.filterQuestions(questions, variants, fc, search)
    val total = filtered.count()

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
    Page(total, offset, limit,
      ordered.drop("_min_config", "_min_split").offset(offset).limit(limit))
  }

  /** Single question with nested variants (main.py:210-221). */
  def getQuestion(questions: DataFrame, variants: DataFrame, id: String): DataFrame =
    withNestedVariants(questions.where(col("id") === id), variants)
}
