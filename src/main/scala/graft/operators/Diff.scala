package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff for dataset versioning: which rows were added, removed,
  * or changed between two keyed snapshots of a table — the audit step
  * before promoting a new training-data version.
  *
  * Content equality is decided by a caller-supplied digest expression
  * (md5 of the payload by default usage), so the join carries only
  * (key, digest) — at 100 TB the shuffle is two slim columns per side,
  * never the payloads themselves. One full-outer hash join on the key.
  */
object Diff {

  /** Per-key status frame (`key`, `status` ∈ added|removed|changed|
    * unchanged). `digest` is evaluated against each snapshot's rows. */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
                   digest: Column): DataFrame = {
    val av = a.select(col(key).as("_k_a"), digest.as("_dig_a"))
    val bv = b.select(col(key).as("_k_b"), digest.as("_dig_b"))
    av.join(bv, col("_k_a") === col("_k_b"), "full_outer")
      .select(coalesce(col("_k_a"), col("_k_b")).as(key),
        when(col("_k_a").isNull, "added")
          .when(col("_k_b").isNull, "removed")
          // null-safe: a digest that is NULL on one side only (e.g.
          // md5 of a NULL payload) IS a change, not an "unchanged"
          .when(!(col("_dig_a") <=> col("_dig_b")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Status totals — the one-line summary a version gate reads. */
  def diffSummary(a: DataFrame, b: DataFrame, key: String,
                  digest: Column): DataFrame =
    snapshotDiff(a, b, key, digest)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
}
