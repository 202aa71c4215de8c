package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("k-means over embeddings: deterministic, covers all vectors") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (a1, c1) = Clustering.kmeansEmbeddings(emb, k = 8)
    val (a2, c2) = Clustering.kmeansEmbeddings(emb, k = 8)
    assert(c1.length === 8)
    // fixed seed → identical assignments across runs
    val m1 = a1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val m2 = a2.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m1 === m2)
    assert(m1.size === emb.count())
    val sizes = Clustering.clusterSizes(a1).collect().map(_.getLong(1))
    assert(sizes.sum === emb.count() && sizes.forall(_ > 0))
  }
}
