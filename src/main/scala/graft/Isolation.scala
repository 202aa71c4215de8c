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
  /** CONTRACT: call only BETWEEN fully-consumed queries, never while
    * any frame still awaits consumption. This unpersists EVERY
    * persistent RDD in the session — and localCheckpointed RDDs are
    * non-recomputable by design (their lineage is truncated), so a
    * frame built on one breaks PERMANENTLY if scrub runs between its
    * materialization and its last action. The Bench/Verify mains
    * satisfy the contract structurally (each query is executed to
    * completion, then scrubbed); a shared interactive session with
    * long-lived checkpointed frames must not call this. */
  def scrub(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc()
  }
}
