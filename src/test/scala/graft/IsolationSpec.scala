package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scrub-scope contract: [[Isolation.scrub]] reclaims residue
  * persisted since the epoch, and NEVER touches state persisted at or
  * before it — localCheckpointed RDDs are non-recomputable, so an
  * unscoped scrub (the round-7 shape: unpersist EVERYTHING) would
  * permanently break a long-lived checkpointed frame in any session
  * that isn't structured exactly like the bench mains. */
class IsolationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keys.toSet

  test("pre-epoch localCheckpointed frame survives scrubs and stays consumable; post-epoch residue is reclaimed") {
    // drop SQL-cache leftovers from earlier suites on the shared
    // session first: scrub clears the SQL cache GLOBALLY by contract
    // (recomputable, so epoch protection deliberately does not apply),
    // and the exact-set assertions below are about epoch-scoped RDD
    // protection, not about other suites' cache entries
    spark.sharedState.cacheManager.clearCache()
    // long-lived state, created BEFORE the epoch
    val longLived = (1L to 50L).toDF("id").localCheckpoint()
    assert(longLived.count() === 50L)
    val before = persistentIds
    assert(before.nonEmpty, "localCheckpoint must register a persistent RDD")
    Isolation.begin(spark) // protect everything up to here

    // per-query residue, created AFTER the epoch
    val residue = (1L to 10L).toDF("id").localCheckpoint()
    assert(residue.count() === 10L)
    val withResidue = persistentIds
    assert(withResidue.size > before.size)

    Isolation.scrub(spark)
    // the residue's blocks are gone, the pre-epoch frame's are not
    assert(persistentIds === before,
      s"scrub must reclaim exactly the post-epoch RDDs: $persistentIds vs $before")
    // and the pre-epoch frame is still CONSUMABLE — the whole point:
    // its lineage is truncated, an unpersist would have been permanent
    assert(longLived.count() === 50L)

    // idempotent: a second scrub with no new residue changes nothing
    Isolation.scrub(spark)
    assert(persistentIds === before)
    assert(longLived.count() === 50L)
  }

  test("cold scrub (no begin) records the epoch instead of unpersisting: protective default for shared sessions") {
    spark.sharedState.cacheManager.clearCache() // same leftover guard
    val frame = (1L to 20L).toDF("id").localCheckpoint()
    assert(frame.count() === 20L)
    val before = persistentIds
    // a session whose first Isolation contact IS a scrub (no begin):
    // the call must record the epoch and remove NOTHING
    Isolation.forgetEpoch(spark)
    Isolation.scrub(spark)
    assert(persistentIds === before, "cold scrub must not unpersist anything")
    assert(frame.count() === 20L)
    // ...and having recorded the epoch, the SECOND scrub reclaims only
    // what appeared in between
    val residue = (1L to 5L).toDF("id").localCheckpoint()
    assert(residue.count() === 5L)
    Isolation.scrub(spark)
    assert(persistentIds === before)
    assert(frame.count() === 20L)
  }
}
