package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class IvfSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IVF top-k: high recall vs brute force at nProbe=4/16 cells") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (index, assigned) = Similarity.buildIvf(emb, k = 16)
    assert(index.centroids.length === 16)
    // every vector lands in exactly one cell
    assert(assigned.count() === emb.count())
    val queries = emb.where(col("vec_id") % 100 === 0)
    val ivf = Similarity.ivfTopK(index, assigned, queries, k = 5, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(emb, sampleMod = 100, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    // deterministic-seed variant (kept for the bit-exact v4/v6 oracles):
    // on these near-uniform embeddings probing 6/16 cells must clearly
    // beat the 6/16 random-probe floor; the PRODUCTION recall bar
    // (trained centroids, >= 0.8) lives in TrainedIvfSpec
    assert(recall >= 0.6, s"IVF recall $recall too low")
    // full probe = exact
    val full = Similarity.ivfTopK(index, assigned, queries, k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(full === exact)
  }

  test("salted aggregation equals plain aggregation") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val plain = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"), salts = 8,
      partials = Seq(
        ("n", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
        ("q", sum(col("l_quantity").cast("decimal(18,2)")), (c: org.apache.spark.sql.Column) => sum(c))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(salted === plain)
  }

  test("salted join equals plain join") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    val o = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(o, "l_orderkey").groupBy("o_orderstatus").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salts = 4)
      .groupBy("o_orderstatus").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted === plain)
  }
}
