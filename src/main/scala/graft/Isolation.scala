package graft
import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Cross-query residue scrub shared by the Bench and Verify mains.
  * `cacheManager.clearCache()` alone only drops SQL-layer cache
  * entries; localCheckpoint blocks (iterative operators: connected
  * components, distributed ranking) are plain persistent RDDs, and
  * accumulated broadcasts (IVF index/centroid maps) are freed by the
  * ContextCleaner only after a GC collects their weak refs. One helper
  * so the two mains cannot drift (the first Verify copy had already
  * dropped the GC step).
  *
  * SCOPE: scrub is bounded by an epoch watermark, not session-global.
  * RDDs persisted at or before the context's epoch ([[begin]], or the
  * first [[scrub]] call if begin was never called) are PROTECTED —
  * localCheckpointed RDDs are non-recomputable by design (truncated
  * lineage), so unpersisting a long-lived one a caller still holds
  * would break it permanently. Only residue persisted AFTER the epoch
  * — the per-query accumulation the mains exist to clear — is
  * unpersisted. The mains call [[begin]] right after session creation
  * (nothing exists yet, so every later query's residue is in scope); a
  * shared interactive session that calls scrub cold gets the
  * protective default: the first call records the epoch and unpersists
  * nothing. SQL-layer cache entries are still cleared globally — a
  * .cache()'d frame is recomputable from lineage, so clearing it costs
  * recompute time, never correctness. */
object Isolation {
  // RDD ids are allocated from one monotonically increasing counter
  // per context, so "persisted after the epoch" = "id > the highest
  // persistent id at epoch time". Weak keys: a stopped context's entry
  // must not pin it.
  private val epochs = new java.util.WeakHashMap[SparkContext, Integer]()

  private def maxPersistentId(sc: SparkContext): Int = {
    val ids = sc.getPersistentRDDs.keys
    if (ids.isEmpty) -1 else ids.max
  }

  /** Mark the isolation epoch for this context: everything persisted
    * up to now survives every future [[scrub]]. Call after session
    * creation in a bench/verify main (scrub-everything behavior), or
    * after building long-lived checkpointed state in a shared session
    * (protect it, scrub only later residue). */
  def begin(spark: SparkSession): Unit = epochs.synchronized {
    epochs.put(spark.sparkContext, maxPersistentId(spark.sparkContext))
  }

  /** Spec-only: forget the context's epoch so a test can exercise the
    * cold-scrub path on the shared session. */
  private[graft] def forgetEpoch(spark: SparkSession): Unit =
    epochs.synchronized { epochs.remove(spark.sparkContext); () }

  /** Unpersist query residue: every RDD persisted since this context's
    * epoch. First call without a prior [[begin]] records the epoch and
    * removes nothing (protective default for shared sessions). */
  def scrub(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    spark.sharedState.cacheManager.clearCache()
    val epoch: Option[Int] = epochs.synchronized {
      val e = Option(epochs.get(sc)).map(_.intValue)
      if (e.isEmpty) epochs.put(sc, maxPersistentId(sc))
      e
    }
    epoch.foreach { watermark =>
      sc.getPersistentRDDs.collect { case (id, rdd) if id > watermark => rdd }
        .foreach(_.unpersist(blocking = true))
    }
    System.gc()
  }
}
