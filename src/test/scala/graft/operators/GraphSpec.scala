package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side replay of the exact integer recurrence. */
  private def reference(edges: Seq[(Long, Long, Long)], iters: Int,
      scale: Long = 1000000000000L, dNum: Long = 85,
      dDen: Long = 100): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val wout = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val base = (dDen - dNum) * scale / dDen
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val c = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => r(s) * w / wout(s) }.sum).toMap
      r = nodes.map(n => n -> (base + dNum * c.getOrElse(n, 0L) / dDen)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Long)], iters: Int,
      parts: Int = 1, checkpointEvery: Int = 5): Map[Long, Long] = {
    val df = edges.toDF("src", "dst", "w")
    Graph.pageRank(if (parts > 1) df.repartition(parts) else df,
        iters = iters, checkpointEvery = checkpointEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("safeScale: no Long overflow even with full mass concentration at the returned scale") {
    for (n <- Seq(1L, 1000L, 1000000L, 5000000000L);
         wMax <- Seq(1L, 7L, 1000000L)) {
      val s = Graph.safeScale(n, wMax)
      assert(s >= 1L)
      // worst case: all mass (n * scale) lands on one node; then BOTH
      // hot products must fit — the damped product 85 * c (128 > 85
      // leaves headroom) and r * w, where the multiply happens BEFORE
      // the div so the raw weight is a real factor in the bound
      assert(BigInt(85) * BigInt(n) * BigInt(s) <= BigInt(Long.MaxValue),
        s"damping product n=$n wMax=$wMax scale=$s")
      assert(BigInt(n) * BigInt(s) * BigInt(wMax) <= BigInt(Long.MaxValue),
        s"weight product n=$n wMax=$wMax scale=$s")
    }
    // the weight term binds once wMax > 128: a 1e6-weight graph gets a
    // scale ~7800x smaller than the unit-weight bound at the same |V|
    assert(Graph.safeScale(1000L, 1000000L) < Graph.safeScale(1000L) / 1000)
  }

  test("overflow trap: rank*w that would wrap Long raise_errors instead of corrupting ranks") {
    // scale * w = 1e12 * 1e7 = 1e19 > 2^63: iteration 1's r*w wraps in
    // the unguarded recurrence (positive operands can wrap to a
    // positive wrong value — silent corruption); the trap must throw
    val edges = Seq((1L, 2L, 10000000L), (2L, 1L, 10000000L)).toDF("src", "dst", "w")
    val e = intercept[Exception] {
      Graph.pageRank(edges, iters = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("safeScale")), messages(e).mkString("; "))
    // the remedy the error names actually works, and weights scale out
    // of the quotient so the safe run still ranks the cycle uniformly
    // (up to a few units of truncation drift — safeScale's output is
    // not a multiple of 100, so the 15/85 split loses ulps per round)
    val s = Graph.safeScale(2L, 10000000L)
    val got = Graph.pageRank(edges, iters = 2, scale = s)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet.size === 1, s"cycle must stay uniform: $got")
    assert(math.abs(got.values.head - s) <= 4L, s"scale=$s got=$got")
  }

  test("hard precondition: (|V|+1)*scale must fit Long; weights must be positive") {
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(edges, iters = 1, scale = Long.MaxValue / 2)
    }
    assert(e.getMessage.contains("safeScale"))
    val z = intercept[IllegalArgumentException] {
      Graph.pageRank(Seq((1L, 2L, 0L)).toDF("src", "dst", "w"), iters = 1)
    }
    assert(z.getMessage.contains("positive"))
  }

  test("uniform cycle is a fixpoint: every rank stays exactly at scale") {
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6, 1L))
    assert(run(cycle, iters = 4).values.toSet === Set(1000000000000L))
  }

  test("star graph ranks the hub above leaves; dangling hub starves them") {
    // 5 leaves → hub; hub has no out-edge (dangling: contributes nothing)
    val star = (1L to 5L).map(l => (l, 0L, 1L))
    val got = run(star, iters = 3)
    val base = 150000000000L
    assert(got.filterKeys(_ != 0L).values.toSet === Set(base),
      "after round 2+, leaves hold only the teleport base")
    assert(got(0L) > got(1L) * 2, "hub collects the leaf mass")
    assert(got === reference(star, 3))
  }

  test("weighted random graph matches the driver-side replay, any partitioning, deep iteration") {
    val rnd = new scala.util.Random(11)
    val edges = (for (_ <- 1 to 120) yield
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong, 1L + rnd.nextInt(9)))
      .distinct.groupBy(e => (e._1, e._2)) // collapse parallel edges
      .map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSeq
    val want = reference(edges, 7)
    assert(run(edges, iters = 7) === want)
    // merge/shuffle path + the lineage-truncation path (checkpoint fires
    // twice inside 7 rounds) must not change a single bit
    assert(run(edges, iters = 7, parts = 13, checkpointEvery = 3) === want)
  }
}
