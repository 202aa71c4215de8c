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

  test("property: funnel matches a naive per-user scan on random event sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val steps = Seq("s1", "s2", "s3")
    val genEvents: Gen[List[(Long, Long, String)]] = for {
      n <- Gen.choose(0, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 5L); t <- Gen.choose(0L, 20L)
        ty <- Gen.oneOf(steps :+ "noise")
      } yield (u, t, ty))
    } yield evs
    (0 until 10).foreach { i =>
      val Some(rows) = genEvents.apply(Gen.Parameters.default, Seed(11L + i))
      val got = Cohorts.funnel(ev(rows: _*), steps).collect()(0)
      // naive: per user walk min-after chain over the raw tuples
      def reach(u: Long): Int = {
        val mine = rows.filter(_._1 == u)
        var prev = Long.MinValue
        var depth = 0
        var stop = false
        for (s <- steps if !stop) {
          val cand = mine.filter(e => e._3 == s &&
            (if (depth == 0) true else e._2 > prev)).map(_._2)
          if (cand.isEmpty) stop = true
          else { prev = cand.min; depth += 1 }
        }
        depth
      }
      val users = rows.map(_._1).distinct
      val want = (1 to steps.size).map(d => users.count(reach(_) >= d).toLong)
      val gotCounts = (0 until steps.size).map(got.getLong)
      assert(gotCounts === want, s"seed ${11 + i}: got $gotCounts want $want")
    }
  }

  test("property: retention matches a naive per-user computation") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val day = 86400L
    val genEvents: Gen[List[(Long, Long, String)]] = for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 6L); d <- Gen.choose(0L, 35L)
      } yield (u, d * day, "click"))
    } yield evs
    (0 until 8).foreach { i =>
      val Some(rows) = genEvents.apply(Gen.Parameters.default, Seed(23L + i))
      val got = Cohorts.retention(ev(rows: _*), "2023-11-14").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val byUser = rows.groupBy(_._1).view.mapValues(_.map(_._2 / day / 7).distinct)
      val want = byUser.toSeq.flatMap { case (_, weeks) =>
        val cohort = weeks.min
        weeks.map(w => (cohort, w - cohort))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got === want, s"seed ${23 + i}")
    }
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
