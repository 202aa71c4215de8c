package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.TestSpark
import graft.functions.PolyHash64

/** Pins [[Sampling.groupCap]]: at most `cap` rows survive per group,
  * over-cap groups keep exactly the cap smallest (hash, id) pairs,
  * under-cap groups pass through whole, the choice is partitioning-
  * independent, and the plan is the bounded-heap aggregate — no
  * per-group window sort.
  */
class GroupCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // group a: 40 rows, group b: 5 rows, group c: 12 rows
  private val rows =
    (1L to 40L).map(i => ("a", i)) ++
    (101L to 105L).map(i => ("b", i)) ++
    (201L to 212L).map(i => ("c", i))
  private def df = rows.toDF("g", "id")
  private def key = concat(col("id").cast("string"), lit("/"), col("g"))

  private def expectedKept(cap: Int): Map[String, Set[Long]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map { case (_, id) =>
        (PolyHash64.hash(UTF8String.fromString(s"$id/$g")), id)
      }.sortBy(identity).take(cap).map(_._2).toSet
    }

  test("over-cap groups keep exactly the cap smallest hashes; under-cap pass whole") {
    val out = Sampling.groupCap(df, "g", "id", key, cap = 10).collect()
      .groupBy(_.getString(0)).map { case (g, rs) =>
        g -> rs.map(_.getLong(1)).toSet
      }
    val exp = expectedKept(10)
    assert(out("a") === exp("a") && out("a").size === 10)
    assert(out("b") === (101L to 105L).toSet) // under cap: untouched
    assert(out("c") === exp("c") && out("c").size === 10)
  }

  test("selection is partitioning-independent") {
    val base = Sampling.groupCap(df, "g", "id", key, cap = 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    Seq(1, 3, 16).foreach { n =>
      val re = Sampling.groupCap(df.repartition(n), "g", "id", key, cap = 7)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(re === base, s"kept set changed under repartition($n)")
    }
  }

  test("no per-group window sort in the plan") {
    val plan = Sampling.groupCap(df, "g", "id", key, cap = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"groupCap must not plan a window:\n$plan")
  }

  test("NULL group is capped as its own group, not dropped") {
    // key = concat(id, '/', g) is NULL for the NULL group, so every
    // hash in that group ties (NULLS LAST) and ids break the tie:
    // the cap smallest ids survive. Before the null-safe fix the
    // composite-key semi join silently dropped ALL null-group rows.
    val withNull = df.union(
      (301L to 308L).map(i => (null.asInstanceOf[String], i)).toDF("g", "id"))
    val out = Sampling.groupCap(withNull, "g", "id", key, cap = 5)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
    val nullKept = out.filter(_._1.isEmpty).map(_._2).toSet
    assert(nullKept === (301L to 305L).toSet,
      s"NULL group must keep the cap smallest ids, got $nullKept")
    // the real groups are untouched by the NULL group's presence
    assert(out.filter(_._1.contains("b")).map(_._2).toSet ===
      (101L to 105L).toSet)
    assert(out.filter(_._1.contains("a")).map(_._2).toSet ===
      expectedKept(5)("a"))
  }

  test("invalid cap rejected") {
    intercept[IllegalArgumentException] {
      Sampling.groupCap(df, "g", "id", key, cap = 0)
    }
  }
}
