package graft.lexam

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment analytics (reference `routers/experiment_stats.py`):
  * stats, judge comparison, per-question rollup. The reference's N+1
  * per-answer lookups (`:229-230`) become two broadcast joins; every
  * sub-stat is an aggregation over one cached enriched DataFrame
  * (SURVEY §3.3).
  */
object ExperimentAnalytics {

  /** answers ⋈ variants ⋈ questions (broadcast dims) ⟕ judgments.
    * The shared lineage for all experiment stats. */
  def enriched(answers: DataFrame, variants: DataFrame, questions: DataFrame,
               judgments: DataFrame, experimentId: Long,
               modelName: Option[String] = None): DataFrame = {
    var a = answers.where(col("experiment_id") === experimentId)
    modelName.foreach(m => a = a.where(col("model_name") === m))
    a.join(broadcast(variants.select(col("id").as("variant_id"),
        col("question_id"), col("config"), col("gold"))),
        Seq("variant_id"), "left_outer")
      .join(broadcast(questions.select(col("id").as("question_id"),
        col("course"), col("area"))), Seq("question_id"), "left_outer")
  }

  /** Judgments restricted to the given answers, scored rows only
    * (`score.isnot(None)`, F5) and optionally one judge. */
  def scopedJudgments(judgments: DataFrame, answerIds: DataFrame,
                      judgeModel: Option[String]): DataFrame = {
    var j = judgments.where(col("score").isNotNull)
    judgeModel.foreach(m => j = j.where(col("judge_model") === m))
    j.join(answerIds, Seq("answer_id"), "left_semi")
  }

  case class McqStats(total: Long, correct: Long, accuracy: Double)
  case class OpenStats(total: Long, judged: Long, avgScore: Double,
                       medianScore: Double, scoreDistribution: Seq[(String, Long)])

  /** MCQ accuracy over answers with an extracted letter (A13;
    * experiment_stats.py:31-35). */
  def mcqStats(enriched: DataFrame): McqStats = {
    val r = enriched.where(col("extracted_letter").isNotNull)
      .agg(count(lit(1)).as("total"),
        sum(when(col("mcq_correct") === true, 1).otherwise(0)).as("correct"))
      .first()
    val total = r.getLong(0); val correct = r.getLong(1)
    McqStats(total, correct,
      if (total > 0) math.rint(correct.toDouble / total * 10000) / 10000 else 0.0)
  }

  /** Score histogram: 11 buckets of 0.1, scores ≥ 1.0 in the last
    * bucket (experiment_stats.py:54-61). Zero-count buckets emitted. */
  def scoreDistribution(scores: DataFrame): Seq[(String, Long)] = {
    val byBucket = scores
      .withColumn("bucket", least(floor(col("score") * 10).cast("int"), lit(10)))
      .groupBy(col("bucket")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 to 10).map { i =>
      val lo = i / 10.0; val hi = (i + 1) / 10.0
      f"$lo%.1f-$hi%.1f" -> byBucket.getOrElse(i, 0L)
    }
  }

  /** Open-question stats from judgments (experiment_stats.py:38-61). */
  def openStats(enriched: DataFrame, judgments: DataFrame,
                judgeModel: Option[String] = None): OpenStats = {
    val open = enriched.where(col("extracted_letter").isNull)
    val openTotal = open.count()
    val scores = scopedJudgments(judgments,
      open.select(col("id").as("answer_id")), judgeModel).cache()
    try {
      val r = scores.agg(count(lit(1)), avg(col("score")), median(col("score"))).first()
      val judged = r.getLong(0)
      OpenStats(openTotal, judged,
        if (judged > 0) math.rint(r.getDouble(1) * 10000) / 10000 else 0.0,
        if (judged > 0) math.rint(r.getDouble(2) * 10000) / 10000 else 0.0,
        if (judged > 0) scoreDistribution(scores) else Nil)
    } finally scores.unpersist()
  }

  /** Per-area / per-course breakdown: MCQ accuracy + open score avg in
    * one grouped pass (experiment_stats.py:225-259; the reference's N+1
    * loop collapses into the enriched join). */
  def breakdownByField(enriched: DataFrame, judgments: DataFrame,
                       field: String, judgeModel: Option[String] = None): DataFrame = {
    val j = scopedJudgments(judgments, enriched.select(col("id").as("answer_id")),
      judgeModel).groupBy(col("answer_id"))
      .agg(sum(col("score")).as("score_sum"), count(lit(1)).as("score_n"))
    enriched.join(j, enriched("id") === j("answer_id"), "left_outer")
      .groupBy(col(field).as("name"))
      .agg(
        sum(when(col("extracted_letter").isNotNull, 1).otherwise(0)).as("mcq_total"),
        sum(when(col("extracted_letter").isNotNull && col("mcq_correct") === true, 1)
          .otherwise(0)).as("mcq_correct_n"),
        sum(when(col("extracted_letter").isNull, col("score_sum"))).as("open_score_sum"),
        sum(when(col("extracted_letter").isNull, col("score_n"))).as("open_total"))
      .select(col("name"),
        when(col("mcq_total") > 0,
          round(col("mcq_correct_n").cast("double") / col("mcq_total"), 4))
          .as("mcq_accuracy"),
        col("mcq_total"),
        when(col("open_total") > 0,
          round(col("open_score_sum") / col("open_total"), 4)).as("open_avg_score"),
        coalesce(col("open_total"), lit(0L)).as("open_total"))
      .orderBy(col("name"))
  }

  /** Token usage totals (experiment_stats.py:67-83, A9). */
  def tokenTotals(enriched: DataFrame, judgments: DataFrame,
                  judgeModel: Option[String] = None): (Long, Long, Long, Long) = {
    val g = enriched.agg(
      coalesce(sum(col("input_tokens")), lit(0L)),
      coalesce(sum(col("output_tokens")), lit(0L))).first()
    val open = enriched.where(col("extracted_letter").isNull)
    var j = judgments.join(open.select(col("id").as("answer_id")), Seq("answer_id"), "left_semi")
    judgeModel.foreach(m => j = j.where(col("judge_model") === m))
    val js = j.agg(
      coalesce(sum(col("input_tokens")), lit(0L)),
      coalesce(sum(col("output_tokens")), lit(0L))).first()
    (g.getLong(0), g.getLong(1), js.getLong(0), js.getLong(1))
  }

  /** Self-consistency across runs (A15; experiment_stats.py:262-284). */
  case class Consistency(totalVariants: Long, unanimous: Long, unanimousRate: Double)
  def selfConsistency(enriched: DataFrame): Consistency = {
    val perVariant = enriched.where(col("extracted_letter").isNotNull)
      .groupBy(col("variant_id"))
      .agg(countDistinct(col("extracted_letter")).as("n_distinct"))
    val r = perVariant.agg(count(lit(1)),
      sum(when(col("n_distinct") === 1, 1).otherwise(0))).first()
    val total = r.getLong(0); val unam = if (r.isNullAt(1)) 0L else r.getLong(1)
    Consistency(total, unam,
      if (total > 0) math.rint(unam.toDouble / total * 10000) / 10000 else 0.0)
  }

  /** Per-judge comparison (experiment_stats.py:117-160): count, avg,
    * exact median — the reference's per-judge median refetch loop is
    * the same single groupBy here (A16). */
  def compareJudges(answers: DataFrame, judgments: DataFrame,
                    experimentId: Long): DataFrame = {
    val expAnswers = answers.where(col("experiment_id") === experimentId)
      .select(col("id").as("answer_id"))
    judgments.where(col("score").isNotNull)
      .join(expAnswers, Seq("answer_id"), "left_semi")
      .groupBy(col("judge_model"))
      .agg(count(lit(1)).as("judged"),
        round(avg(col("score")), 4).as("avg_score"),
        round(median(col("score")), 4).as("median_score"))
      .orderBy(col("judge_model"))
  }

  /** Per-judge judgment counts + avg score (routers/judging.py:111-132).
    * Unlike [[compareJudges]], the count includes NULL-score judgments
    * (the reference's `/judge-summary` has no `score.isnot(None)`
    * filter); avg naturally skips nulls and is null when all are. */
  def judgeSummary(answers: DataFrame, judgments: DataFrame,
                   experimentId: Long): DataFrame = {
    val expAnswers = answers.where(col("experiment_id") === experimentId)
      .select(col("id").as("answer_id"))
    judgments.join(expAnswers, Seq("answer_id"), "left_semi")
      .groupBy(col("judge_model"))
      .agg(count(lit(1)).as("count"),
        bround(avg(col("score")), 4).as("avg_score"))
      .orderBy(col("judge_model"))
  }

  /** Per-question rollup sorted by avg score desc
    * (experiment_stats.py:163-222, A14). `mcq_correct`: any non-null
    * value across runs (the reference keeps the last seen; with
    * homogeneous MCQ grading per variant these agree). */
  def statsByQuestion(enriched: DataFrame, judgments: DataFrame,
                      judgeModel: Option[String] = None): DataFrame = {
    val j = scopedJudgments(judgments, enriched.select(col("id").as("answer_id")),
      judgeModel).groupBy(col("answer_id"))
      .agg(sum(col("score")).as("score_sum"), count(lit(1)).as("score_n"))
    enriched.join(j, enriched("id") === j("answer_id"), "left_outer")
      .groupBy(col("question_id"))
      .agg(
        first(col("course")).as("course"),
        first(col("area")).as("area"),
        first(col("config")).as("config"),
        max(col("mcq_correct")).as("mcq_correct"),
        count(lit(1)).as("answer_count"),
        coalesce(sum(col("score_n")), lit(0L)).as("judgment_count"),
        round(sum(col("score_sum")) / sum(col("score_n")), 4).as("avg_score"))
      .orderBy(desc_nulls_last("avg_score"), col("question_id"))
  }
}
