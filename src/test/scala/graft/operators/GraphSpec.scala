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
    for (n <- Seq(1L, 1000L, 1000000L, 5000000000L)) {
      val s = Graph.safeScale(n)
      // worst case: all mass (n * scale) lands on one node, then the
      // damped product 85 * c must not wrap; 128 > 85 leaves headroom
      assert(s >= 1000L)
      if (128L * n >= 1)
        assert(BigInt(85) * (BigInt(n.max(1L)) * BigInt(s)) <= BigInt(Long.MaxValue),
          s"n=$n scale=$s")
    }
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
