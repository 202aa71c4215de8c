package graft.lexam

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Dataset-level analytics surfaces (reference main.py:223-551):
  * `/api/stats`, `/api/dashboard`, `/api/course-summary`,
  * `/api/search-summary`. Each reference Python-dict pivot/set-union is
  * one Spark aggregation (SURVEY §2.4); nothing leaves the cluster
  * until the final small collect by the API layer.
  */
object DatasetAnalytics {

  val Areas = Seq("Private", "Public", "Criminal", "Interdisciplinary")
  val Jurisdictions = Seq("Swiss", "International", "Generic")
  val McqConfigs = Seq("mcq_4_choices", "mcq_8_choices", "mcq_16_choices", "mcq_32_choices")

  // ----------------------------------------------------- /api/stats

  case class Stats(totalQuestions: Long, totalVariants: Long,
                   byConfig: Map[String, Long], byArea: Map[String, Long],
                   byLanguage: Map[String, Long], byYear: Seq[(Int, Long)])

  /** main.py:223-249 — totals + four group-counts (A1/A2). The
    * reference's six separate queries collapse into two GROUPING SETS
    * jobs — one scan of questions (total ∪ by-area ∪ by-language ∪
    * by-year) and one of variants (total ∪ by-config); grouping_id
    * tells the slices apart. */
  def stats(questions: DataFrame, variants: DataFrame): Stats = {
    val q = questions.groupingSets(
        Seq(Seq.empty, Seq(col("area")), Seq(col("language")), Seq(col("year"))),
        col("area"), col("language"), col("year"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .collect()
    // gid bit per groupBy column (MSB first), 1 = aggregated away:
    // {area}=0b011, {language}=0b101, {year}=0b110, {}=0b111
    def slice(gid: Long): Seq[Row] =
      q.filter(_.getAs[Number]("gid").longValue == gid).toSeq
    val v = variants.groupingSets(Seq(Seq.empty, Seq(col("config"))), col("config"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .collect()
    Stats(
      totalQuestions = slice(7L).head.getAs[Long]("n"),
      totalVariants  = v.filter(_.getAs[Number]("gid").longValue == 1L)
        .head.getAs[Long]("n"),
      byConfig   = v.filter(_.getAs[Number]("gid").longValue == 0L)
        .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap,
      byArea     = slice(3L).map(r => r.getString(0) -> r.getAs[Long]("n")).toMap,
      byLanguage = slice(5L).map(r => r.getString(1) -> r.getAs[Long]("n")).toMap,
      byYear     = slice(6L).map(r => r.getInt(2) -> r.getAs[Long]("n"))
        .sortBy(_._1))
  }

  // ------------------------------------------------- /api/dashboard

  /** Dashboard question cohort (main.py:320-337 `fq`): optional config
    * semi-join + language filter. */
  def dashboardQuestions(questions: DataFrame, variants: DataFrame,
                         config: Seq[String], language: Seq[String]): DataFrame = {
    var q = questions
    if (config.nonEmpty) {
      val qids = variants.where(col("config").isin(config: _*))
        .select(col("question_id").as("id")).distinct()
      q = q.join(qids, Seq("id"), "left_semi")
    }
    if (language.nonEmpty) q = q.where(col("language").isin(language: _*))
    q
  }

  /** Courses table: per-course count + lang_de/lang_en pivot, sorted by
    * count desc (main.py:342-357). */
  def dashboardCourses(qs: DataFrame): DataFrame =
    qs.groupBy(col("course"), col("area"))
      .agg(count(lit(1)).as("count"),
        sum(when(col("language") === "de", 1).otherwise(0)).as("lang_de"),
        sum(when(col("language") =!= "de", 1).otherwise(0)).as("lang_en"))
      .orderBy(desc("count"), col("course"))

  /** Year rows with fixed area pivot columns + total (main.py:369-380). */
  def dashboardYears(qs: DataFrame): DataFrame =
    qs.groupBy(col("year"))
      .pivot("area", Areas).agg(count(lit(1)))
      .na.fill(0, Areas)
      .withColumn("total", Areas.map(col).reduce(_ + _))
      .orderBy(col("year"))

  /** Distinct questions per split with pct (main.py:382-385). */
  def dashboardSplits(variants: DataFrame, qs: DataFrame,
                      config: Seq[String]): DataFrame = {
    var v = variants
    if (config.nonEmpty) v = v.where(col("config").isin(config: _*))
    v = v.join(qs.select(col("id").as("question_id")), Seq("question_id"), "left_semi")
    val total = v.agg(countDistinct(col("question_id"))).first().getLong(0)
    v.groupBy(col("split"))
      .agg(countDistinct(col("question_id")).as("value"))
      .withColumn("pct",
        if (total == 0) lit("0%")
        // bround = half-even, matching Python round() (main.py:385)
        else concat(bround(col("value") * 100.0 / total.toDouble).cast("int"), lit("%")))
      .orderBy(col("split"))
  }

  // ------------------- open-vs-MCQ comparison (Dashboard.jsx:595-629)

  /** The frontend's client-side open-vs-MCQ area merge
    * (Dashboard.jsx:596-604) re-expressed as the engine's full-outer
    * zero-fill join (the U2 operator shape): each side counts its own
    * filtered question set per area; an area present on one side only
    * zero-fills the other — exactly the JSX maps' `|| 0` defaults. */
  def comparisonAreas(oe: DataFrame, mcq: DataFrame): DataFrame =
    oe.groupBy(col("area")).agg(count(lit(1)).as("open_ended"))
      .join(mcq.groupBy(col("area")).agg(count(lit(1)).as("mcq")),
        Seq("area"), "full_outer")
      .na.fill(0, Seq("open_ended", "mcq"))

  /** Year merge (Dashboard.jsx:607-615): the JSX reads each side's
    * `years[].total`, which is the per-year question count — same
    * full-outer zero-fill, sorted year ascending like the JSX sort. */
  def comparisonYears(oe: DataFrame, mcq: DataFrame): DataFrame =
    oe.groupBy(col("year")).agg(count(lit(1)).as("open_ended"))
      .join(mcq.groupBy(col("year")).agg(count(lit(1)).as("mcq")),
        Seq("year"), "full_outer")
      .na.fill(0, Seq("open_ended", "mcq"))
      .orderBy(col("year"))

  /** Course merge (Dashboard.jsx:617-629): per-course open/mcq counts
    * with the course's area carried through, total = open + mcq (the
    * JSX updates total when the mcq side matches; a one-sided course
    * keeps the other side at 0). Ordered (total desc, course asc) —
    * the JSX's stable sort ties break on fetch/insertion order, which
    * is not reproducible; course-asc is this repo's deterministic
    * stand-in, same stance as the dashboard courses table. Joined on
    * (course, area): area is functionally determined by course in the
    * LEXam data, so this equals the JSX's course-keyed map. */
  def comparisonCourses(oe: DataFrame, mcq: DataFrame): DataFrame =
    oe.groupBy(col("course"), col("area")).agg(count(lit(1)).as("open"))
      .join(mcq.groupBy(col("course"), col("area"))
          .agg(count(lit(1)).as("mcq")),
        Seq("course", "area"), "full_outer")
      .na.fill(0, Seq("open", "mcq"))
      .withColumn("total", col("open") + col("mcq"))
      .orderBy(desc("total"), col("course"))

  /** area × jurisdiction cross-tab, fixed columns (main.py:388-396). */
  def dashboardAreaJurisdiction(qs: DataFrame): DataFrame =
    qs.groupBy(col("area"))
      .pivot("jurisdiction", Jurisdictions).agg(count(lit(1)))
      .na.fill(0, Jurisdictions)

  /** area × language cross-tab (main.py:399-407). */
  def dashboardLangArea(qs: DataFrame): DataFrame =
    qs.groupBy(col("area"))
      .pivot("language", Seq("de", "en")).agg(count(lit(1)))
      .na.fill(0, Seq("de", "en"))

  /** Open-answer word counts: histogram bins + per-area stats
    * (main.py:410-449). Bins are [lo, hi) with 600+ open-ended; the
    * reference's mean/median are Python statistics over ints, exactly
    * reproduced by avg/median. */
  def answerWordCounts(qs: DataFrame, variants: DataFrame): DataFrame =
    variants
      .where(col("config") === "open_question" && col("answer").isNotNull)
      .join(qs.select(col("id").as("question_id"), col("area")),
        Seq("question_id"), "inner")
      .withColumn("wc", TextFunctions.wordCount(col("answer")))

  val WordBins: Seq[(Int, Double, String)] = Seq(
    (0, 50, "< 50 words"), (50, 100, "50–100"), (100, 200, "100–200"),
    (200, 400, "200–400"), (400, 600, "400–600"),
    (600, Double.PositiveInfinity, "600+"))

  def answerLengthHistogram(wcs: DataFrame): DataFrame = {
    val bin = WordBins.foldRight(lit(null: String)) { case ((lo, hi, label), acc) =>
      when(col("wc") >= lo && (if (hi.isInfinite) lit(true) else col("wc") < hi),
        lit(label)).otherwise(acc)
    }
    wcs.withColumn("range", bin).groupBy(col("range")).agg(count(lit(1)).as("count"))
  }

  def answerStatsByArea(wcs: DataFrame): DataFrame =
    wcs.groupBy(col("area"))
      .agg(
        // bround = half-even, matching Python round(statistics.mean/median)
        // (main.py:437-446); medians of ints land on exact .5 ties often
        bround(avg(col("wc"))).cast("long").as("avgWords"),
        bround(median(col("wc"))).cast("long").as("medianWords"),
        min(col("wc")).as("minWords"),
        max(col("wc")).as("maxWords"))

  // -------------------------------------------- /api/course-summary

  /** Per-course rollup with distinct-qid set sizes per config bucket,
    * set-union total, sorted (area asc, total desc) — main.py:252-310's
    * Python set accumulation as one aggregation (A6). */
  def courseSummary(questions: DataFrame, variants: DataFrame,
                    language: Option[String] = None): DataFrame = {
    var joined = variants.join(questions,
      variants("question_id") === questions("id"), "inner")
    language.foreach(l => joined = joined.where(col("language") === l))
    joined
      .groupBy(col("course"))
      .agg(
        first(col("area")).as("area"),
        array_join(array_sort(collect_set(col("jurisdiction"))), ", ").as("jurisdiction"),
        (max(when(col("international") === true, 1).otherwise(0)) === 1).as("international"),
        countDistinct(when(col("config") === "mcq_4_choices", col("question_id"))).as("mcq_4"),
        countDistinct(when(col("config").isin(McqConfigs: _*), col("question_id"))).as("mcq_all"),
        countDistinct(when(col("config") === "open_question", col("question_id"))).as("open_qa"),
        countDistinct(when(col("config") === "open_question" && col("split") === "dev",
          col("question_id"))).as("open_dev"),
        countDistinct(when(col("config") === "open_question" && col("split") === "test",
          col("question_id"))).as("open_test"),
        countDistinct(when(col("config") === "mcq_4_choices" ||
          col("config").isin(McqConfigs: _*) ||
          col("config") === "open_question", col("question_id"))).as("total"),
        (countDistinct(col("language")) > 1).as("multi_lang"),
        min(col("language")).as("single_lang"))
      .withColumn("language",
        when(col("multi_lang"), "both").otherwise(col("single_lang")))
      .drop("multi_lang", "single_lang")
      .orderBy(col("area"), desc("total"), col("course"))
  }

  // -------------------------------------------- /api/search-summary

  /** Search summary (main.py:496-551): total + by_area/by_language +
    * top-10 courses by match count desc (A8). */
  def searchSummary(questions: DataFrame, variants: DataFrame,
                    fc: FilterConfig, search: String):
      (Long, DataFrame, DataFrame, DataFrame) = {
    val q = Filters.filterQuestions(questions, variants, fc, Some(search)).cache()
    val total = q.count()
    val byArea = q.groupBy(col("area")).count().orderBy(col("area"))
    val byLanguage = q.groupBy(col("language")).count().orderBy(col("language"))
    val byCourse = q.groupBy(col("course")).count()
      .orderBy(desc("count"), col("course")).limit(10)
    (total, byArea, byLanguage, byCourse)
  }
}
