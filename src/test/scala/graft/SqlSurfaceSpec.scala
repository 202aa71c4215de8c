package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The SQL surface (SURVEY §7.3's "optional Catalyst surface"): all
  * tables registered as temp views and every custom expression callable
  * from plain `spark.sql`, so SQL-first users get the full engine.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registered views + native functions compose in plain SQL") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val df = spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |       sum(cast(l_quantity AS decimal(18,2))) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    assert(df.count() === 3)

    val fp = spark.sql(
      "SELECT doc_id, poly_hash64(text) AS fp FROM documents WHERE doc_id < 3")
    assert(fp.collect().forall(r => r.getLong(1) >= 0))

    val mh = spark.sql(
      """SELECT doc_id,
        |  size(minhash_sig(shingle_hashes(split(lower(text), '\\s+'), 3), 16)) AS siglen,
        |  simhash64(split(lower(text), '\\s+')) AS sh,
        |  cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS self_cos,
        |  size(gram_hashes(split(text, ' '), 3)) AS ngrams,
        |  size(split(text, ' ')) AS ntoks
        |FROM documents WHERE doc_id < 2""".stripMargin).collect()
    assert(mh.forall(_.getAs[Int]("siglen") === 16))
    assert(mh.forall(r => math.abs(r.getAs[Double]("self_cos") - 1.0) < 1e-12))
    // positional grams: exactly n-k+1 of them, duplicates kept
    assert(mh.forall(r => r.getAs[Int]("ngrams") === r.getAs[Int]("ntoks") - 2))
  }

  test("driver contract: every declared query carries a DuckDB oracle, and no oracle is orphaned") {
    // a query without an oracleSql entry silently downgrades the
    // driver's check to rows-only — this suite makes that an explicit
    // decision, never an omission (today the exception set is empty);
    // an oracle without a query is dead SQL that can rot unnoticed
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((q -- o) === Set.empty, s"queries missing an oracle: ${q -- o}")
    assert((o -- q) === Set.empty, s"oracles without a query: ${o -- q}")
  }
}
