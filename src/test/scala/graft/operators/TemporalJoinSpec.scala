package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Temporal join edge semantics: as-of tie rules and null handling;
  * interval-join bin-boundary correctness and zero-match windows.
  */
class TemporalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = 1700000000000000L // epoch micros
  private def ts(offsetSec: Long) =
    new java.sql.Timestamp((t0 + offsetSec * 1000000L) / 1000)

  test("asOfJoin: <= tie, highest-event-id tie among rights, null when no prior") {
    // rights (clicks): user 1 at t10 (ids 100,101 — same ts), t30; user 2 none
    val right = Seq(
      (100L, ts(10), 1L, 3.0),
      (101L, ts(10), 1L, 4.0),
      (102L, ts(30), 1L, 5.0)).toDF("event_id", "ts", "user_id", "value")
    // lefts (purchases): user 1 at t10 (same ts as clicks), t20, t40; user 2 at t15
    val left = Seq(
      (200L, ts(10), 1L, 0.0),
      (201L, ts(20), 1L, 0.0),
      (202L, ts(40), 1L, 0.0),
      (203L, ts(15), 2L, 0.0)).toDF("event_id", "ts", "user_id", "value")
    val out = TemporalJoin.asOfJoin(left, right).collect()
      .map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(200L) === Some(4.0)) // same-ts click matches; id 101 beats 100
    assert(out(201L) === Some(4.0)) // still the t10 winner
    assert(out(202L) === Some(5.0)) // t30 click now latest
    assert(out(203L) === None)      // user 2 has no clicks at all
  }

  test("intervalJoin: [start,end) boundaries, bin-spanning windows, zero-match kept") {
    val W = 600L * 1000000 // 10-minute bins
    // window A [100, 700): spans two 600s bins; window B [5000, 5600): empty
    val windows = Seq(
      (1L, ts(100), ts(700)),
      (2L, ts(5000), ts(5600))).toDF("window_id", "ws", "we")
    val points = Seq(
      (ts(100), 1.0),   // == start → included
      (ts(650), 2.0),   // in the second bin of window A → included
      (ts(700), 4.0),   // == end → excluded
      (ts(99), 8.0)     // before start → excluded
    ).toDF("ts", "value")
    val out = TemporalJoin.intervalJoin(windows, points, W).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toList
    assert(out === List(
      (1L, 2L, Some(3.0)), // 1.0 + 2.0, decimal-exact
      (2L, 0L, None)))     // zero-match window kept with NULL total
  }

  test("intervalJoin: inverted window (we <= ws) matches nothing, no bin blow-up") {
    val W = 600L * 1000000
    // window 1 is inverted by ~28 hours: an unclamped sequence(b0, b1)
    // would DESCEND through ~170 spurious bins; window 2 is zero-width
    val windows = Seq(
      (1L, ts(100000), ts(100)),
      (2L, ts(500), ts(500))).toDF("window_id", "ws", "we")
    val points = Seq((ts(500), 1.0), (ts(50000), 2.0)).toDF("ts", "value")
    val out = TemporalJoin.intervalJoin(windows, points, W).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toList
    assert(out === List((1L, 0L, None), (2L, 0L, None)))
  }

  test("property: asOfJoin matches a naive per-row scan on random event sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small key/time domains force heavy collisions and ties
    val genEvents: Gen[(List[(Long, Long, Long, Double)], List[(Long, Long, Long, Double)])] =
      for {
        nl <- Gen.choose(0, 15); nr <- Gen.choose(0, 15)
        l <- Gen.listOfN(nl, for {
          u <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 10L)
        } yield (u, t, 0L, 0.0))
        r <- Gen.listOfN(nr, for {
          u <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 10L); v <- Gen.choose(1, 99)
        } yield (u, t, 0L, v.toDouble))
      } yield (l, r)
    (0 until 12).foreach { i =>
      val Some((l0, r0)) = genEvents.apply(Gen.Parameters.default, Seed(7L + i))
      // unique event ids: left 1000+, right 2000+
      val l = l0.zipWithIndex.map { case ((u, t, _, _), j) => (1000L + j, ts(t), u, 0.0) }
      val r = r0.zipWithIndex.map { case ((u, t, _, v), j) => (2000L + j, ts(t), u, v) }
      val got = TemporalJoin.asOfJoin(
          l.toDF("event_id", "ts", "user_id", "value"),
          r.toDF("event_id", "ts", "user_id", "value"))
        .collect()
        .map(row => row.getLong(0) ->
          (Option(row.get(3)).map(_.toString), Option(row.get(4)))).toMap
      // naive oracle: per left row, max (ts, event_id) right row at-or-before
      l.foreach { case (id, t, u, _) =>
        val best = r.filter(x => x._3 == u && !x._2.after(t))
          .sortBy(x => (x._2.getTime, x._1)).lastOption
        assert(got(id)._1 === best.map(_._2.toString), s"seed ${7 + i} left $id")
        assert(got(id)._2 === best.map(_._4), s"seed ${7 + i} left $id")
      }
      assert(got.size === l.size)
    }
  }

  test("interval join physical plan is a bin equi-join, not a cross product") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val windows = ev.where(col("event_type") === "error")
      .select(col("event_id").as("window_id"), col("ts").as("ws"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("we"))
    val points = ev.where(col("event_type") === "click").select(col("ts"), col("value"))
    val p = TemporalJoin.intervalJoin(windows, points, 600L * 1000000)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
