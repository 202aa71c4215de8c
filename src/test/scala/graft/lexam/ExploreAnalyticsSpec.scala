package graft.lexam

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Explore (O1–O3, J3) + dataset analytics (stats / dashboard /
  * course-summary / search-summary) golden assertions on the fixtures.
  */
class ExploreAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val qs = Fixtures.questions.toDS().toDF()
  private lazy val vs = Fixtures.variants.toDS().toDF()

  test("default sort: year DESC, id ASC with stable pagination (O1/O3)") {
    val page = QuestionService.listQuestions(qs, vs, limit = 3)
    assert(page.total === 6)
    assert(page.items.select("id").as[String].collect().toSeq === Seq("q3", "q5", "q2"))
    val page2 = QuestionService.listQuestions(qs, vs, offset = 3, limit = 3)
    assert(page2.items.select("id").as[String].collect().toSeq === Seq("q4", "q1", "q6"))
    // pagination partitions the ordered result exactly (property, SURVEY §5.3)
    val all = QuestionService.listQuestions(qs, vs, limit = 50)
      .items.select("id").as[String].collect().toSeq
    assert(all === Seq("q3", "q5", "q2", "q4", "q1", "q6"))
  }

  test("single-pass page: the page plan reads the cached cohort, never re-scans the question source; no cache leak") {
    // parquet-backed tables so a source re-scan would be visible as a
    // FileSourceScan of the questions path
    val dir = java.nio.file.Files.createTempDirectory("qsvc_scan").toString
    qs.write.mode("overwrite").parquet(s"$dir/questions")
    vs.write.mode("overwrite").parquet(s"$dir/variants")
    val pq = spark.read.parquet(s"$dir/questions")
    val pv = spark.read.parquet(s"$dir/variants")
    val filtered = Filters.filterQuestions(pq, pv, FilterConfig(), None).cache()
    try {
      filtered.count() // the ONE action that scans the source (cache fill)
      val page = QuestionService.pageFrame(filtered, pv, None, "asc", 0, 3)
      val scans = page.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("/questions")) => s
      }
      assert(scans.isEmpty, page.queryExecution.sparkPlan.toString)
      assert(page.queryExecution.sparkPlan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => m
      }.nonEmpty, "page must read the cached cohort")
    } finally filtered.unpersist(blocking = true)
    // end-to-end: results identical to the fixture goldens and the
    // internal cache is released before listQuestions returns
    val p = QuestionService.listQuestions(pq, pv, limit = 3)
    assert(p.total === 6)
    assert(p.items.select("id").as[String].collect().toSeq === Seq("q3", "q5", "q2"))
    // cacheManager matches by plan (see RankingSpec), so re-deriving
    // the same cohort plan finds any entry listQuestions leaked
    assert(spark.sharedState.cacheManager
        .lookupCachedData(Filters.filterQuestions(pq, pv, FilterConfig(), None)
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .isEmpty,
      "listQuestions must not leave cohort cache blocks behind")
  }

  test("subquery sort key min(variant.config) (O2/J7)") {
    val page = QuestionService.listQuestions(qs, vs, sortBy = Some("config"))
    val got = page.items.select("id").as[String].collect().toSeq
    // min config per question, LEXICOGRAPHIC (same as the reference's
    // SQL min over strings): mcq_16 < mcq_32 < mcq_4 < open_question
    assert(got === Seq("q4", "q5", "q1", "q2", "q3", "q6"))
  }

  test("nested variants are sorted arrays; variant-less questions keep empty array (J3)") {
    val nested = QuestionService.withNestedVariants(qs, vs)
    val q1 = nested.where(col("id") === "q1")
      .select(size(col("variants"))).as[Int].head()
    assert(q1 === 3)
    val withExtra = qs.union(Seq(Question("q9", "No variants?", "X", "en",
      "Public", "Swiss", 2023)).toDS().toDF())
    val q9 = QuestionService.withNestedVariants(withExtra, vs)
      .where(col("id") === "q9").select(size(col("variants"))).as[Int].head()
    assert(q9 === 0)
  }

  test("/api/stats shape (A1/A2)") {
    val s = DatasetAnalytics.stats(qs, vs)
    assert(s.totalQuestions === 6 && s.totalVariants === 10)
    assert(s.byConfig("open_question") === 5L)
    assert(s.byArea === Map("Private" -> 2L, "Criminal" -> 1L, "Public" -> 2L,
      "Interdisciplinary" -> 1L))
    assert(s.byYear === Seq(2020 -> 2L, 2021 -> 2L, 2022 -> 2L))
  }

  test("dashboard pivots: years × area with totals (A4)") {
    val dq = DatasetAnalytics.dashboardQuestions(qs, vs, Nil, Nil)
    val years = DatasetAnalytics.dashboardYears(dq).collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("total")).toMap
    assert(years === Map(2020 -> 2L, 2021 -> 2L, 2022 -> 2L))
    val aj = DatasetAnalytics.dashboardAreaJurisdiction(dq)
    val priv = aj.where(col("area") === "Private").first()
    assert(priv.getAs[Long]("Swiss") === 1L && priv.getAs[Long]("International") === 1L)
  }

  test("dashboard config filter restricts to questions having a matching variant (J6)") {
    val dq = DatasetAnalytics.dashboardQuestions(qs, vs, Seq("mcq_4_choices"), Nil)
    assert(dq.select("id").as[String].collect().toSet === Set("q1", "q2"))
  }

  test("splits: distinct questions per split with pct (A5)") {
    val dq = DatasetAnalytics.dashboardQuestions(qs, vs, Nil, Nil)
    val splits = DatasetAnalytics.dashboardSplits(vs, dq, Nil).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    // dev: q1,q3,q4,q6 → 4 distinct; test: q1,q2,q3,q4,q5 → 5 distinct; total distinct=6
    assert(splits === Seq(("dev", 4L, "67%"), ("test", 5L, "83%")))
  }

  test("course summary: set sizes, union total, both-language label, sort (A6/U1/O4)") {
    val cs = DatasetAnalytics.courseSummary(qs, vs).collect()
    val rows = cs.map(r => r.getAs[String]("course") -> r).toMap
    val usbl = rows("US Business Law")
    assert(usbl.getAs[Long]("mcq_4") === 1 && usbl.getAs[Long]("mcq_all") === 1 &&
      usbl.getAs[Long]("open_qa") === 1 && usbl.getAs[Long]("total") === 1)
    assert(usbl.getAs[Boolean]("international"))
    val pl = rows("Public Law")
    assert(pl.getAs[Long]("open_dev") === 2 && pl.getAs[Long]("open_test") === 1 &&
      pl.getAs[Long]("total") === 2)
    // sorted by (area asc, total desc)
    val areas = cs.map(_.getAs[String]("area")).toSeq
    assert(areas === areas.sorted)
  }

  test("answer word-count bins hit the reference edges (A12/A17)") {
    val dq = DatasetAnalytics.dashboardQuestions(qs, vs, Nil, Nil)
    val wcs = DatasetAnalytics.answerWordCounts(dq, vs)
    val hist = DatasetAnalytics.answerLengthHistogram(wcs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // q3 dev answer = 50 words → "50–100" ([50,100)); remaining 4 open answers < 50
    assert(hist === Map("< 50 words" -> 4L, "50–100" -> 1L))
  }

  test("search summary: top courses by count desc (A8)") {
    val (total, _, _, byCourse) =
      DatasetAnalytics.searchSummary(qs, vs, FilterConfig(), "the")
    assert(total > 0)
    val counts = byCourse.select("count").as[Long].collect().toSeq
    assert(counts === counts.sortBy(-_))
  }
}
