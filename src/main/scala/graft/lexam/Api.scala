package graft.lexam

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Thin JSON façade reproducing the reference's endpoint response
  * shapes (SURVEY §7.1 layer 8; serialization semantics of
  * main.py:554-577 and the routers). A reference-API consumer can
  * switch to these and parse identical structures — including ordering
  * rules like the count-desc insertion order of search-summary
  * by_course (SURVEY §7.4 item 9) and years-descending facets
  * (main.py:493).
  */
object Api {

  // ----------------------------------------------------- tiny renderer

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def render(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => render(x)
    case s: String => jstr(s)
    case b: Boolean => b.toString
    case d: Double => if (d == math.rint(d) && !d.isInfinite) f"$d%.1f" else d.toString
    case n: Number => n.toString
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => jstr(k.toString) + ": " + render(x) }.mkString("{", ", ", "}")
    case s: Seq[_] => s.map(render).mkString("[", ", ", "]")
    case r: Row => render(rowToMap(r))
    case ts: java.sql.Timestamp =>
      jstr(ts.toInstant.toString.stripSuffix("Z")) // ISO, like datetime.isoformat()
    case other => jstr(other.toString)
  }

  private def rowToMap(r: Row): scala.collection.Map[String, Any] = {
    val m = scala.collection.mutable.LinkedHashMap[String, Any]()
    r.schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (r.isNullAt(i)) null else r.get(i) match {
        case nested: Row => rowToMap(nested)
        case seq: scala.collection.Seq[_] =>
          seq.map { case rr: Row => rowToMap(rr); case x => x }.toSeq
        case x => x
      }
      m += f.name -> v
    }
    m
  }

  // ------------------------------------------------------- endpoints

  /** GET /api/questions (main.py:159-207). */
  def questionsPage(questions: DataFrame, variants: DataFrame,
                    fc: FilterConfig = FilterConfig(),
                    search: Option[String] = None,
                    sortBy: Option[String] = None, sortDir: String = "asc",
                    offset: Int = 0, limit: Int = 50): String = {
    val page = QuestionService.listQuestions(questions, variants, fc, search,
      sortBy, sortDir, offset, limit)
    render(scala.collection.immutable.ListMap(
      "total" -> page.total, "offset" -> offset, "limit" -> limit,
      "items" -> page.items.collect().toSeq))
  }

  /** GET /api/questions/{id} (main.py:210-221): one question with its
    * nested variants, or the reference's not-found error object. */
  def question(questions: DataFrame, variants: DataFrame, id: String): String =
    QuestionService.getQuestion(questions, variants, id).collect().headOption
      .map(render)
      .getOrElse("""{"error": "not found"}""")

  /** GET /api/stats (main.py:223-249). */
  def stats(questions: DataFrame, variants: DataFrame): String = {
    val s = DatasetAnalytics.stats(questions, variants)
    render(scala.collection.immutable.ListMap(
      "total_questions" -> s.totalQuestions,
      "total_variants" -> s.totalVariants,
      "by_config" -> s.byConfig, "by_area" -> s.byArea,
      "by_language" -> s.byLanguage,
      "by_year" -> scala.collection.immutable.ListMap(
        s.byYear.map { case (y, n) => y.toString -> (n: Any) }: _*)))
  }

  /** GET /api/filters (main.py:460-493): facet values per dimension
    * given the other active filters; years descending. */
  def filters(questions: DataFrame, variants: DataFrame,
              fc: FilterConfig, search: Option[String] = None): String = {
    def vals(dim: String): Seq[Any] =
      Filters.viableValues(questions, variants, fc, dim, search)
        .collect().map(_.get(0)).toSeq
    render(scala.collection.immutable.ListMap(
      "configs" -> vals("config"), "splits" -> vals("split"),
      "areas" -> vals("area"), "languages" -> vals("language"),
      "courses" -> vals("course"), "jurisdictions" -> vals("jurisdiction"),
      "years" -> vals("year").map(_.asInstanceOf[Int]).sorted.reverse))
  }

  /** GET /api/search-summary (main.py:496-551) — by_course keeps
    * count-desc insertion order. */
  def searchSummary(questions: DataFrame, variants: DataFrame,
                    fc: FilterConfig, search: String): String = {
    val (total, byArea, byLang, byCourse) =
      DatasetAnalytics.searchSummary(questions, variants, fc, search)
    def kv(df: DataFrame): scala.collection.immutable.ListMap[String, Any] =
      scala.collection.immutable.ListMap(df.collect().toSeq
        .map(r => r.get(0).toString -> (r.getLong(1): Any)): _*)
    render(scala.collection.immutable.ListMap(
      "total" -> total, "by_area" -> kv(byArea),
      "by_language" -> kv(byLang), "by_course" -> kv(byCourse)))
  }

  /** GET /api/course-summary (main.py:252-310). */
  def courseSummary(questions: DataFrame, variants: DataFrame,
                    language: Option[String] = None): String =
    render(DatasetAnalytics.courseSummary(questions, variants, language)
      .collect().toSeq)

  /** GET /api/experiments/{id}/answers (routers/generation.py:30-70):
    * id-ordered page enriched with variant+question context — the
    * reference's per-row N+1 lookups become two broadcast joins. */
  def answersPage(store: pipeline.LexamStore, experimentId: Long,
                  offset: Int = 0, limit: Int = 50): String = {
    val base = store.answers.where(col("experiment_id") === experimentId)
    val total = base.count()
    val enrichedPage = base.orderBy(col("id")).offset(offset).limit(limit)
      .join(broadcast(store.variants.select(col("id").as("variant_id"),
        col("question_id"), col("config"), col("answer").as("gold_answer"),
        col("gold").as("gold_index"), col("choices"))), Seq("variant_id"), "left_outer")
      .join(broadcast(store.questions.select(col("id").as("question_id"),
        col("course"), col("area"), col("question").as("question_text"))),
        Seq("question_id"), "left_outer")
      .select("id", "variant_id", "question_id", "config", "course", "area",
        "question_text", "gold_answer", "gold_index", "choices", "run_index",
        "model_name", "answer_text", "extracted_letter", "mcq_correct",
        "input_tokens", "output_tokens", "created_at")
      .orderBy(col("id"))
    render(scala.collection.immutable.ListMap(
      "total" -> total, "offset" -> offset, "limit" -> limit,
      "items" -> enrichedPage.collect().toSeq))
  }

  /** GET /api/experiments/{id}/judgments (routers/judging.py:35-78). */
  def judgmentsPage(store: pipeline.LexamStore, experimentId: Long,
                    judgeModel: Option[String] = None,
                    offset: Int = 0, limit: Int = 50): String = {
    var j = store.judgments
      .join(store.answers.where(col("experiment_id") === experimentId)
        .select(col("id").as("answer_id")), Seq("answer_id"), "left_semi")
    judgeModel.foreach(m => j = j.where(col("judge_model") === m))
    val total = j.count()
    val page = j.orderBy(col("id")).offset(offset).limit(limit)
      .join(broadcast(store.answers.select(col("id").as("answer_id"),
        col("variant_id"), col("answer_text"))), Seq("answer_id"), "left_outer")
      .select("id", "answer_id", "variant_id", "judge_model", "judgment_text",
        "score", "answer_text", "input_tokens", "output_tokens", "created_at")
      .orderBy(col("id"))
    render(scala.collection.immutable.ListMap(
      "total" -> total, "offset" -> offset, "limit" -> limit,
      "items" -> page.collect().toSeq))
  }

  /** `_serialize` twin (routers/experiments.py:192-211) — full field
    * set in the reference dict order. filter_config renders the typed
    * normalized form (all dimensions, inactive = []/null) rather than
    * the reference's raw stored dict. */
  def serializeExperiment(e: Experiment): scala.collection.immutable.ListMap[String, Any] =
    scala.collection.immutable.ListMap(
      "id" -> e.id, "name" -> e.name, "description" -> e.description,
      "filter_config" -> scala.collection.immutable.ListMap(
        "config" -> e.filter_config.config, "split" -> e.filter_config.split,
        "area" -> e.filter_config.area, "language" -> e.filter_config.language,
        "course" -> e.filter_config.course,
        "jurisdiction" -> e.filter_config.jurisdiction,
        "year" -> e.filter_config.year,
        "negative_question" -> e.filter_config.negative_question,
        "international" -> e.filter_config.international),
      "open_question_prompt" -> e.open_question_prompt,
      "mcq_prompt" -> e.mcq_prompt,
      "judge_system_prompt" -> e.judge_system_prompt,
      "judge_prompt" -> e.judge_prompt,
      "model_name" -> e.model_name, "temperature" -> e.temperature,
      "max_tokens" -> e.max_tokens,
      "judge_temperature" -> e.judge_temperature,
      "judge_max_tokens" -> e.judge_max_tokens,
      "n_answers" -> e.n_answers, "status" -> e.status,
      "created_at" -> e.created_at, "updated_at" -> e.updated_at)

  /** The one judgment read path — see LexamStore.liveJudgments. */
  private def liveJudgments(store: pipeline.LexamStore): DataFrame =
    store.liveJudgments()

  /** Per-experiment judge breakdown rows (`_judge_breakdown`,
    * routers/experiments.py:180-189), keyed by experiment id — ALL
    * experiments in one grouped pass instead of the reference's
    * per-experiment query. */
  private def judgeBreakdowns(store: pipeline.LexamStore):
      Map[Long, Seq[scala.collection.immutable.ListMap[String, Any]]] =
    liveJudgments(store)
      .groupBy(col("eid"), col("judge_model"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("judge_model")).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.toSeq.map(r => scala.collection.immutable.ListMap[String, Any](
        "model" -> r.getString(1), "count" -> r.getLong(2)))).toMap

  /** GET /api/experiments (routers/experiments.py:72-95): experiments
    * newest-first, full serialization + answer/judgment counts + judge
    * breakdown — the reference's three-per-experiment N+1 queries
    * collapse into three grouped aggregates total. */
  def listExperiments(store: pipeline.LexamStore): String = {
    // partition-column inference reads experiment_id back as int
    val aCounts = store.answers.groupBy(col("experiment_id").cast("long"))
      .agg(count(lit(1)).as("answer_count")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // judgment counts via the answers join (reference semantics: a
    // judgment whose answer was deleted counts as 0, experiments.py:79-84)
    val jCounts = liveJudgments(store)
      .groupBy(col("eid"))
      .agg(count(lit(1)).as("judgment_count")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val judges = judgeBreakdowns(store)
    val items = store.experiments
      .sortBy(e => (-e.created_at.map(_.getTime).getOrElse(0L), -e.id))
      .map { e =>
        serializeExperiment(e) ++ scala.collection.immutable.ListMap[String, Any](
          "answer_count" -> aCounts.getOrElse(e.id, 0L),
          "judgment_count" -> jCounts.getOrElse(e.id, 0L),
          "judges" -> judges.getOrElse(e.id, Nil))
      }
    render(items)
  }

  /** GET /api/experiments/{id} (routers/experiments.py:96-113). */
  def getExperiment(store: pipeline.LexamStore, experimentId: Long): String = {
    val e = store.getExperiment(experimentId)
      .getOrElse(throw new NoSuchElementException(s"experiment $experimentId"))
    val answerCount = store.answers
      .where(col("experiment_id") === experimentId).count()
    val judgmentCount = liveJudgments(store)
      .where(col("eid") === experimentId).count()
    render(serializeExperiment(e) ++ scala.collection.immutable.ListMap[String, Any](
      "answer_count" -> answerCount, "judgment_count" -> judgmentCount,
      "judges" -> judgeBreakdowns(store).getOrElse(experimentId, Nil)))
  }

  /** GET /api/experiments/{id}/question-count
    * (routers/experiments.py:165-176). */
  def questionCount(store: pipeline.LexamStore, fc: FilterConfig): Long =
    Filters.filterVariants(store.variants, store.questions, fc).count()

  /** POST /api/experiments/{id}/question-count
    * (routers/experiments.py:174-178): preview the variant count for an
    * UNSAVED config. The body is the reference's loose dict — a missing
    * or null `filter_config` means "no filters" (`body.get(...)` with a
    * `{}` default), and a partial one normalizes through the same
    * scalar-promoting, falsy-inactive rules as create/update. */
  def questionCountPreview(store: pipeline.LexamStore,
                           body: Map[String, Any]): Long =
    questionCount(store, body.get("filter_config") match {
      case Some(m: Map[_, _]) =>
        FilterConfig.fromMap(m.asInstanceOf[Map[String, Any]])
      case None | Some(null) => FilterConfig()
      case Some(other) =>
        // a present-but-non-object config (e.g. double-encoded JSON
        // string) errors in the reference too (dict ops on a str) —
        // returning the unfiltered total would be a plausible-looking
        // wrong answer
        throw new IllegalArgumentException(
          s"filter_config must be an object, got ${other.getClass.getSimpleName}")
    })

  /** GET /api/experiments/{id}/stats (experiment_stats.py:13-114). */
  def experimentStats(store: pipeline.LexamStore, experimentId: Long,
                      modelName: Option[String] = None,
                      judgeModel: Option[String] = None): String = {
    val exp = store.getExperiment(experimentId)
      .getOrElse(throw new NoSuchElementException(s"experiment $experimentId"))
    val enriched = ExperimentAnalytics.enriched(store.answers, store.variants,
      store.questions, store.judgments, experimentId, modelName).cache()
    try {
    val totalAnswers = enriched.count()
    val mcq = ExperimentAnalytics.mcqStats(enriched)
    val open = ExperimentAnalytics.openStats(enriched, store.judgments, judgeModel)
    val (gi, go, ji, jo) = ExperimentAnalytics.tokenTotals(enriched, store.judgments, judgeModel)
    val consistency =
      if (exp.n_answers > 1) Some(ExperimentAnalytics.selfConsistency(enriched)) else None
    render(scala.collection.immutable.ListMap(
      "total_answers" -> totalAnswers,
      "mcq" -> scala.collection.immutable.ListMap(
        "total" -> mcq.total, "correct" -> mcq.correct, "accuracy" -> mcq.accuracy),
      "open" -> scala.collection.immutable.ListMap(
        "total" -> open.total, "judged" -> open.judged,
        "avg_score" -> open.avgScore, "median_score" -> open.medianScore,
        "score_distribution" -> open.scoreDistribution.map { case (range, n) =>
          scala.collection.immutable.ListMap("range" -> range, "count" -> n) }),
      "by_area" -> ExperimentAnalytics.breakdownByField(enriched, store.judgments,
        "area", judgeModel).collect().toSeq,
      "by_course" -> ExperimentAnalytics.breakdownByField(enriched, store.judgments,
        "course", judgeModel).collect().toSeq,
      "tokens" -> scala.collection.immutable.ListMap(
        "generation_input" -> gi, "generation_output" -> go,
        "judge_input" -> ji, "judge_output" -> jo,
        "total" -> (gi + go + ji + jo)),
      "self_consistency" -> consistency.map(c => scala.collection.immutable.ListMap(
        "total_variants" -> c.totalVariants, "unanimous" -> c.unanimous,
        "unanimous_rate" -> c.unanimousRate))))
    } finally enriched.unpersist()
  }

  /** GET /api/dashboard (main.py:312-459): composite analytics response.
    * Every reference Python-dict accumulation is one of the
    * [[DatasetAnalytics]] aggregations; this method only assembles the
    * JSON shape. List orders: courses count-desc (course-asc ties,
    * deterministic where the reference's dict order is not), facet lists
    * name-asc, years ascending, area-keyed tables in the reference's
    * fixed area order filtered to areas present (main.py:396,407,441). */
  def dashboard(questions: DataFrame, variants: DataFrame,
                config: Seq[String] = Nil, language: Seq[String] = Nil): String = {
    import scala.collection.immutable.ListMap
    val qs = DatasetAnalytics
      .dashboardQuestions(questions, variants, config, language).cache()
    val wcs = DatasetAnalytics.answerWordCounts(qs, variants).cache()
    try {
      val courses = DatasetAnalytics.dashboardCourses(qs).collect().toSeq
      def nameValue(df: DataFrame): Seq[Any] = df.collect().toSeq
        .map(r => ListMap[String, Any]("name" -> r.get(0), "value" -> r.getLong(1)))
      val years = DatasetAnalytics.dashboardYears(qs).collect().toSeq
      val splits = DatasetAnalytics.dashboardSplits(variants, qs, config)
        .collect().toSeq.map(r => ListMap[String, Any](
          "name" -> r.get(0), "value" -> r.getLong(1), "pct" -> r.getString(2)))
      def areaOrdered(df: DataFrame): Seq[Any] = {
        val byArea = df.collect().map(r => r.getAs[String]("area") -> r).toMap
        DatasetAnalytics.Areas.filter(byArea.contains).map(a => rowToMap(byArea(a)))
      }
      val histMap = DatasetAnalytics.answerLengthHistogram(wcs).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val answerLengths = DatasetAnalytics.WordBins.map { case (_, _, label) =>
        ListMap[String, Any]("range" -> label, "count" -> histMap.getOrElse(label, 0L))
      }
      render(ListMap[String, Any](
        "total_questions" -> qs.count(),
        "total_courses" -> courses.length,
        "total_de" -> courses.map(_.getAs[Long]("lang_de")).sum,
        "total_en" -> courses.map(_.getAs[Long]("lang_en")).sum,
        "min_year" -> years.headOption.map(_.getInt(0)).getOrElse(0),
        "max_year" -> years.lastOption.map(_.getInt(0)).getOrElse(0),
        "courses" -> courses,
        "areas" -> nameValue(qs.groupBy(col("area")).count().orderBy(col("area"))),
        "jurisdictions" -> nameValue(
          qs.groupBy(col("jurisdiction")).count().orderBy(col("jurisdiction"))),
        "years" -> years,
        "splits" -> splits,
        "area_jurisdiction" -> areaOrdered(DatasetAnalytics.dashboardAreaJurisdiction(qs)),
        "lang_area" -> areaOrdered(DatasetAnalytics.dashboardLangArea(qs)),
        "answer_lengths" -> answerLengths,
        "answer_stats" -> areaOrdered(DatasetAnalytics.answerStatsByArea(wcs))))
    } finally { wcs.unpersist(); qs.unpersist() }
  }

  /** The frontend's Open-Ended vs MCQ comparison (Dashboard.jsx:595-629)
    * served as ONE response instead of two /api/dashboard fetches merged
    * client-side: areas / years / courses, each a full-outer zero-fill
    * merge of the open_question side against the MCQ-config side (the
    * U2 operator). Key names match the JSX chart fields ("Open-Ended",
    * "MCQ"; course rows open/mcq/total). Orders are deterministic where
    * the JSX depends on fetch/insertion order: areas follow the fixed
    * area order filtered to areas present (AREA_ORDER, jsx:603), years
    * ascend (jsx:614), courses sort total-desc with course-asc ties. */
  def dashboardComparison(questions: DataFrame, variants: DataFrame,
      mcqConfigs: Seq[String] = DatasetAnalytics.McqConfigs,
      language: Seq[String] = Nil): String = {
    import scala.collection.immutable.ListMap
    val oe = DatasetAnalytics
      .dashboardQuestions(questions, variants, Seq("open_question"), language)
      .cache()
    val mcq = DatasetAnalytics
      .dashboardQuestions(questions, variants, mcqConfigs, language).cache()
    try {
      val areaRows = DatasetAnalytics.comparisonAreas(oe, mcq).collect()
        .map(r => r.getAs[String]("area") -> r).toMap
      val areas = DatasetAnalytics.Areas.filter(areaRows.contains).map { a =>
        val r = areaRows(a)
        ListMap[String, Any]("area" -> a,
          "Open-Ended" -> r.getAs[Long]("open_ended"),
          "MCQ" -> r.getAs[Long]("mcq"))
      }
      val years = DatasetAnalytics.comparisonYears(oe, mcq).collect().toSeq
        .map(r => ListMap[String, Any]("year" -> r.getAs[Int]("year"),
          "Open-Ended" -> r.getAs[Long]("open_ended"),
          "MCQ" -> r.getAs[Long]("mcq")))
      val courses = DatasetAnalytics.comparisonCourses(oe, mcq).collect().toSeq
        .map(r => ListMap[String, Any](
          "course" -> r.getAs[String]("course"),
          "area" -> r.getAs[String]("area"),
          "open" -> r.getAs[Long]("open"), "mcq" -> r.getAs[Long]("mcq"),
          "total" -> r.getAs[Long]("total")))
      render(ListMap[String, Any]("area_comparison" -> areas,
        "year_comparison" -> years, "course_comparison" -> courses))
    } finally { mcq.unpersist(); oe.unpersist() }
  }

  /** GET /api/experiments/{id}/stats/compare-judges
    * (experiment_stats.py:117-160): per-judge count/avg/exact-median
    * over scored judgments. */
  def compareJudges(store: pipeline.LexamStore, experimentId: Long): String = {
    store.getExperiment(experimentId)
      .getOrElse(throw new NoSuchElementException(s"experiment $experimentId"))
    render(ExperimentAnalytics
      .compareJudges(store.answers, store.judgments, experimentId)
      .collect().toSeq)
  }

  /** GET /api/experiments/{id}/stats/by-question
    * (experiment_stats.py:163-222): per-question rollup, avg-score-desc.
    * Columns reordered to the reference dict order. */
  def statsByQuestion(store: pipeline.LexamStore, experimentId: Long,
                      modelName: Option[String] = None,
                      judgeModel: Option[String] = None): String = {
    store.getExperiment(experimentId)
      .getOrElse(throw new NoSuchElementException(s"experiment $experimentId"))
    val enriched = ExperimentAnalytics.enriched(store.answers, store.variants,
      store.questions, store.judgments, experimentId, modelName)
    render(ExperimentAnalytics.statsByQuestion(enriched, store.judgments, judgeModel)
      .select("question_id", "course", "area", "config", "mcq_correct",
        "avg_score", "answer_count", "judgment_count")
      .collect().toSeq)
  }

  /** GET /api/experiments/{id}/judge-summary (routers/judging.py:111-132):
    * judgment counts (nulls included) and avg scores per judge model. */
  def judgeSummary(store: pipeline.LexamStore, experimentId: Long): String =
    render(ExperimentAnalytics
      .judgeSummary(store.answers, store.judgments, experimentId)
      .collect().toSeq)
}
