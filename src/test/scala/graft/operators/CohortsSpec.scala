package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Funnel step semantics (strictly-after ordering, monotone stage
  * counts) and retention cohort arithmetic on hand fixtures.
  */
class CohortsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = 1700000000000000L
  private def ts(offsetSec: Long) =
    new java.sql.Timestamp((t0 + offsetSec * 1000000L) / 1000)

  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (u, t, ty) => (u, ts(t), ty) }
      .toDF("user_id", "ts", "event_type")

  test("funnel: strictly-after ordering, earliest-match chaining, monotone counts") {
    val events = ev(
      // user 1: full in-order journey
      (1L, 0, "signup"), (1L, 10, "click"), (1L, 20, "purchase"),
      // user 2: purchase BEFORE the click → stops at step 2
      (2L, 0, "signup"), (2L, 10, "purchase"), (2L, 20, "click"),
      // user 3: click at the SAME ts as signup → strictly-after fails step 2
      (3L, 5, "signup"), (3L, 5, "click"),
      // user 4: clicked and purchased but never signed up → not in funnel
      (4L, 0, "click"), (4L, 10, "purchase"),
      // user 5: earliest-match rule — the t10 click (not the t30 one)
      // anchors step 2, so the t20 purchase counts
      (5L, 0, "signup"), (5L, 10, "click"), (5L, 30, "click"), (5L, 20, "purchase"))
    val out = Cohorts.funnel(events, Seq("signup", "click", "purchase")).collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) === ((4L, 3L, 2L)))
  }

  test("retention: integer week cohorts, distinct users per offset") {
    // epoch-day week index: week 0 = days 0-6, week 1 = days 7-13, ...
    val day = 86400L
    val events = ev(
      // user 1: first in week 0, active again weeks 1 and 3
      (1L, 0 * day, "click"), (1L, 8 * day, "click"), (1L, 22 * day, "view"),
      // user 2: first in week 0 (two events same week dedupe), only week 0
      (2L, 2 * day, "click"), (2L, 3 * day, "view"),
      // user 3: first in week 1, active week 2
      (3L, 9 * day, "click"), (3L, 15 * day, "click"))
    val out = Cohorts.retention(events, "2023-11-14").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out === List(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }
}
