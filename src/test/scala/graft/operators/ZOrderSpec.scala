package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Z-value arithmetic (bit placement, clamping, locality) and the
  * layout's actual data-skipping benefit over a single-key sort.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue: exact bit interleave, clamped domain") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (5L, 3L), (65535L, 65535L), (-7L, 70000L))
      .toDF("a", "b")
    val got = rows.select(ZOrder.zValue($"a", $"b").as("z"))
      .collect().map(_.getLong(0)).toList
    def morton(a: Long, b: Long): Long = {
      val ca = math.min(math.max(a, 0L), 65535L)
      val cb = math.min(math.max(b, 0L), 65535L)
      (0 until 16).map(i =>
        (((ca >> i) & 1L) << (2 * i)) | (((cb >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    }
    assert(got === List((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (5L, 3L), (65535L, 65535L), (-7L, 70000L)).map((morton _).tupled))
    // spot values: interleave of (1,0) -> 1, (0,1) -> 2, (1,1) -> 3
    assert(got(1) === 1L && got(2) === 2L && got(3) === 3L)
  }

  test("z-order layout: min/max envelopes prune point queries on BOTH dims better than a single-key sort") {
    // two independent uniform dims — the adversarial case for a
    // single-key layout (sorting by a leaves b unsorted everywhere)
    val n = 20000
    val df = (0 until n).map { i =>
      // deterministic pseudo-random pair from a hash-ish mix
      val a = (i * 2654435761L >>> 8) % 1024
      val b = (i * 40503L >>> 4) % 1024
      (a, b)
    }.toDF("a", "b")
    val parts = 32

    def pruneRate(laidOut: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val env = ZOrder.envelopes(laidOut, "a", "b").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // fraction of partitions a point predicate can SKIP, averaged
      // over a grid of probe values, per dimension
      val probes = (0 until 1024 by 97).map(_.toLong)
      val aRate = probes.map(v =>
        env.count(e => v < e._1 || v > e._2).toDouble / env.length).sum / probes.size
      val bRate = probes.map(v =>
        env.count(e => v < e._3 || v > e._4).toDouble / env.length).sum / probes.size
      (aRate, bRate)
    }

    val zOrdered = ZOrder.clusterBy(df, "a", "b", parts)
    val aSorted = df.repartitionByRange(parts, $"a").sortWithinPartitions($"a")
    val (zA, zB) = pruneRate(zOrdered)
    val (sA, sB) = pruneRate(aSorted)
    // single-key sort: near-perfect pruning on a, none on b.
    // z-order: strong pruning on BOTH dims.
    assert(sB < 0.15, s"a-sorted layout should barely prune b (got $sB)")
    assert(zA > 0.5 && zB > 0.5, s"z-order should prune both dims (got $zA / $zB)")
    assert(zB > sB + 0.5, s"z-order must beat single-key sort on the second dim ($zB vs $sB)")
  }

  test("clusterBy drops the helper column and preserves every row") {
    val df = Seq((1L, 2L, "x"), (3L, 4L, "y")).toDF("a", "b", "payload")
    val out = ZOrder.clusterBy(df, "a", "b", 2)
    assert(out.columns.toList === List("a", "b", "payload"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet ===
      Set((1L, 2L, "x"), (3L, 4L, "y")))
  }
}
