package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.TestSpark
import graft.functions.PolyHash64

/** Pins [[Sampling.componentSplits]]: whole near-dup clusters land in
  * one split (the property the s14 leakage audit checks), singletons
  * are their own component, the assignment is the documented pure
  * function of the component id, and cut validation fails loudly.
  */
class ComponentSplitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val items = (1L to 200L).toDF("id")
  private val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (150L, 160L))
    .toDF("id1", "id2")

  private def expectedSplit(comp: Long): String = {
    val b = PolyHash64.hash(UTF8String.fromString(comp.toString)) % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  test("clusters are split-atomic, singletons self-labeled, assignment is the documented hash") {
    val out = Sampling.componentSplits(items, pairs,
      assumeDistinctPairs = true).collect()
    assert(out.length === 200)
    val byId = out.map(r =>
      r.getAs[Long]("id") -> (r.getAs[Long]("comp"), r.getAs[String]("split"))).toMap
    // component structure: {1,2,3} -> 1, {7,8} -> 7, {150,160} -> 150
    assert(Seq(1L, 2L, 3L).map(byId(_)._1).distinct === Seq(1L))
    assert(Seq(7L, 8L).map(byId(_)._1).distinct === Seq(7L))
    assert(Seq(150L, 160L).map(byId(_)._1).distinct === Seq(150L))
    // whole-cluster atomicity: one split per component
    Seq(Seq(1L, 2L, 3L), Seq(7L, 8L), Seq(150L, 160L)).foreach { c =>
      assert(c.map(byId(_)._2).distinct.size === 1, s"cluster $c split apart")
    }
    // singletons: comp == id
    val paired = Set(1L, 2L, 3L, 7L, 8L, 150L, 160L)
    byId.filterNot(kv => paired(kv._1)).foreach { case (id, (comp, _)) =>
      assert(comp === id, s"singleton $id got comp $comp")
    }
    // the split is the documented pure function of the component
    byId.foreach { case (id, (comp, split)) =>
      assert(split === expectedSplit(comp), s"id $id comp $comp")
    }
    // and therefore zero leakage across the pair graph
    Seq((1L, 2L), (2L, 3L), (7L, 8L), (150L, 160L)).foreach { case (a, b) =>
      assert(byId(a)._2 === byId(b)._2, s"pair ($a,$b) leaked across splits")
    }
  }

  test("custom cuts respected; every declared bucket reachable") {
    val out = Sampling.componentSplits(items, pairs,
      cuts = Seq("a" -> 50, "b" -> 100), assumeDistinctPairs = true)
      .select(col("split")).distinct().as[String].collect().toSet
    assert(out === Set("a", "b"))
  }

  test("invalid cuts rejected") {
    intercept[IllegalArgumentException] {
      Sampling.componentSplits(items, pairs, cuts = Seq("train" -> 80))
    }
    intercept[IllegalArgumentException] {
      Sampling.componentSplits(items, pairs,
        cuts = Seq("a" -> 90, "b" -> 80, "c" -> 100))
    }
    // a bound <= 0 or a tied bound makes that split unreachable —
    // must fail loudly, not silently produce an empty split
    intercept[IllegalArgumentException] {
      Sampling.componentSplits(items, pairs,
        cuts = Seq("a" -> 0, "b" -> 100))
    }
    intercept[IllegalArgumentException] {
      Sampling.componentSplits(items, pairs,
        cuts = Seq("a" -> 80, "b" -> 80, "c" -> 100))
    }
  }

  test("cuts validated BEFORE the eager components fixpoint runs") {
    // pairs that explode if the graph is ever evaluated: the bad-cuts
    // require must fire first (connectedComponents is eager — paying
    // the full fixpoint before a trivial argument check would be hours
    // at scale). If the fixpoint ran, we'd see a SparkException here.
    import org.apache.spark.sql.functions.{col, udf}
    val boom = udf((_: Long) => {
      throw new RuntimeException("fixpoint must not run"); 0L
    })
    val poisonPairs = items.select(boom(col("id")).as("id1"),
      boom(col("id")).as("id2"))
    intercept[IllegalArgumentException] {
      Sampling.componentSplits(items, poisonPairs,
        cuts = Seq("train" -> 80))
    }
  }

  test("precomputed-components form equals the recomputing form") {
    val comps = Dedup.connectedComponents(pairs, assumeDistinctPairs = true)
    val a = Sampling.componentSplitsFromComponents(items, comps)
      .collect().map(_.toSeq).toSet
    val b = Sampling.componentSplits(items, pairs, assumeDistinctPairs = true)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("SQL twin computes the hash once and escapes split names") {
    val sql = Sampling.componentSplitSql("c.comp",
      cuts = Seq("don't" -> 80, "rest" -> 100))
    // the rolling hash is hoisted into the derived table — exactly one
    // occurrence, not one per CASE branch
    val hashHits = graft.functions.PolyHash64.sql("CAST(c.comp AS VARCHAR)")
    assert(sql.split(java.util.regex.Pattern.quote(hashHits)).length - 1 === 1,
      s"hash must appear exactly once, got: $sql")
    assert(sql.contains("'don''t'"), s"quote not escaped: $sql")
  }
}
