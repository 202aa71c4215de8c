package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Embedding clustering via Spark ML k-means — the principled
  * counterpart of [[Similarity.buildIvf]]'s sampled centroids. Training
  * data pipelines use this for corpus topic balancing and as the
  * coarse quantizer of a production IVF index (cluster → cell).
  * Deterministic: fixed seed, k-means|| init.
  */
object Clustering {

  private val toVec = udf((arr: Seq[Float]) =>
    Vectors.dense(arr.map(_.toDouble).toArray))

  /** Cluster the `embedding` column into k cells; returns
    * (assignments: vec_id → cluster, centroids). */
  def kmeansEmbeddings(emb: DataFrame, k: Int, maxIter: Int = 20,
                       seed: Long = 42L): (DataFrame, Array[Vector]) = {
    val features = emb.select(col("vec_id"), toVec(col("embedding")).as("features"))
    val model = new KMeans().setK(k).setMaxIter(maxIter).setSeed(seed)
      .fit(features)
    val assigned = model.transform(features)
      .select(col("vec_id"), col("prediction").as("cluster"))
    (assigned, model.clusterCenters)
  }

  /** Cluster-size histogram — corpus balance check. */
  def clusterSizes(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .orderBy(col("cluster"))
}
