package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply and incremental aggregate maintenance —
  * the two mutation shapes a batch lakehouse pipeline runs on every
  * sync cycle (the reference mutates rows one-at-a-time through an OLTP
  * store, e.g. upsert-on-ingest `seed.py:87-109` and status rewrites
  * `routers/experiments.py:149-153`; at 100 TB the same semantics are
  * expressed as set-based merges).
  *
  * Scale posture: [[applyChangelog]] is one shuffle on the key (window
  * row_number) — the standard CDC compaction; [[mergeAggStates]] never
  * re-reads the base data, it re-aggregates two ALREADY-REDUCED states,
  * so a daily refresh shuffles |keys| rows instead of |base| rows.
  */
object Cdc {

  /** Apply an insert/update/delete changelog to nothing (full compact):
    * per key keep the row with the highest `seq`; drop it if that final
    * op is a delete. Rows must carry `op` ∈ {I, U, D}. Latest-wins is
    * decided by (seq, tiebreak...) — pass extra tiebreak columns if seq
    * can collide. */
  def applyChangelog(log: DataFrame, key: String, seq: String,
                     tiebreak: Column*): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy((desc(seq) +: tiebreak.map(_.desc)): _*)
    log.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("op") =!= "D")
      .drop("_rn", "op", seq)
  }

  /** Merge two partial aggregate states that carry re-aggregatable
    * partials (counts and sums): union + one groupBy on the key set.
    * Partials are addition-merged — exact for integer/decimal partials,
    * which is why the state columns should be decimal-summed counts and
    * sums, never averages (averages don't merge; derive them after). */
  def mergeAggStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val partialCols = a.columns.filterNot(keys.contains)
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(partialCols.head)).as(partialCols.head),
        partialCols.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
