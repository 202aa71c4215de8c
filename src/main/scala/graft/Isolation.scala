package graft
import org.apache.spark.sql.SparkSession

/** Cross-query residue scrub shared by the Bench and Verify mains.
  * `cacheManager.clearCache()` alone only drops SQL-layer cache
  * entries; localCheckpoint blocks (iterative operators: connected
  * components, distributed ranking) are plain persistent RDDs, and
  * accumulated broadcasts (IVF index/centroid maps) are freed by the
  * ContextCleaner only after a GC collects their weak refs. One helper
  * so the two mains cannot drift (the first Verify copy had already
  * dropped the GC step). */
object Isolation {
  def scrub(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc()
  }
}
