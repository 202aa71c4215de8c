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

  private def evId(rows: (Long, Long, Long)*) =
    rows.map { case (id, u, t) => (id, u, ts(t)) }
      .toDF("event_id", "user_id", "ts")

  test("sessionize: 30-min gap splits, duration = last - first, ts ties keep one session") {
    val g = 30 * 60L // gap in seconds
    val events = evId(
      // user 1: gaps of 100s and 1700s (both ≤ 30 min) keep one session;
      // the 1901s gap to the fourth event opens a second one
      (1L, 1L, 0), (2L, 1L, 100), (3L, 1L, g), (4L, 1L, g + 1901),
      // user 2: single event → singleton session, zero duration
      (5L, 2L, 50),
      // user 3: two events at the identical timestamp → one session
      (6L, 3L, 7), (7L, 3L, 7))
    val out = Cohorts.sessionize(events, gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toList
    assert(out === List(
      (1L, 1L, 3L, g * 1000000L),
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L),
      (3L, 1L, 2L, 0L)))
  }

  test("property: sessionize matches a naive per-user gap scan") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gapMin = 3
    val gapUs = gapMin * 60L * 1000000L
    val genEvents: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(1, 50)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 5L); t <- Gen.choose(0L, 3000L)
      } yield (u, t))
    } yield evs.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
    (0 until 8).foreach { i =>
      val Some(rows) = genEvents.apply(Gen.Parameters.default, Seed(31L + i))
      val got = Cohorts.sessionize(evId(rows: _*), gapMin).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      // naive: per user, sort by (ts, event_id), split where gap > gapUs
      val want = rows.groupBy(_._2).flatMap { case (u, mine) =>
        val sorted = mine.map(e => (e._3 * 1000000L, e._1)).sorted
        val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
          case (acc, e) =>
            if (e._1 - acc.head.head._1 > gapUs) List(e) :: acc
            else (e :: acc.head) :: acc.tail
        }.reverse.map(_.reverse)
        sessions.zipWithIndex.map { case (s, k) =>
          (u, (k + 1).toLong) -> (s.size.toLong, s.last._1 - s.head._1)
        }
      }.toMap
      assert(got === want, s"seed ${31 + i}")
    }
  }

  test("sessionize and built-in session_window agree, including the exact-gap boundary") {
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    val g = 30 * 60L
    def builtinCounts(events: org.apache.spark.sql.DataFrame) = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n")).collect().map(_.getLong(2)).sorted.toList
    def lagCounts(events: org.apache.spark.sql.DataFrame) =
      Cohorts.sessionize(events, gapMinutes = 30)
        .collect().map(_.getLong(2)).sorted.toList
    // EXACTLY gap apart: both keep one session — session_window's merge
    // is inclusive (next ≤ last + gap), same as the lag twin's `<=`.
    // This is the boundary the e9 oracle relies on; if an upgrade flips
    // session_window to a half-open boundary this pin fails first.
    val boundary = evId((1L, 1L, 0), (2L, 1L, g))
    assert(lagCounts(boundary) === List(2L))
    assert(builtinCounts(boundary) === List(2L))
    // one past the gap: both split
    val past = evId((1L, 1L, 0), (2L, 1L, g + 1))
    assert(lagCounts(past) === List(1L, 1L))
    assert(builtinCounts(past) === List(1L, 1L))
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
