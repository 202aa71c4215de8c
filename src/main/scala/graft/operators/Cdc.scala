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
    * op is a delete. Rows must carry `op` ∈ {I, U, D} — any other value
    * (or a null) fails the job rather than silently upserting. Latest-
    * wins is decided by (seq, tiebreak...) — pass extra tiebreak columns
    * if seq can collide. */
  def applyChangelog(log: DataFrame, key: String, seq: String,
                     tiebreak: Column*): DataFrame = {
    // collision-proof helper column: never clobber an input `_rn`
    val rn = Iterator.from(0)
      .map(i => if (i == 0) "_rn" else s"_rn$i")
      .find(c => !log.columns.contains(c)).get
    val w = Window.partitionBy(col(key))
      .orderBy((desc(seq) +: tiebreak.map(_.desc)): _*)
    log.withColumn("op",
        when(col("op").isin("I", "U", "D"), col("op")).otherwise(raise_error(
          concat(lit("applyChangelog: op must be one of I/U/D, got "),
            coalesce(col("op"), lit("NULL"))))))
      .withColumn(rn, row_number().over(w))
      .where(col(rn) === 1 && col("op") =!= "D")
      .drop(rn, "op", seq)
  }

  /** Merge two partial aggregate states that carry re-aggregatable
    * partials (counts and sums): union + one groupBy on the key set.
    * EVERY non-key column is addition-merged — exact for integer/
    * decimal counts and sums, WRONG for non-additive partials (avg,
    * max, distinct counts): carry (sum, count) / (min, max) components
    * instead and derive the non-additive form after the merge. */
  def mergeAggStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val partialCols = a.columns.filterNot(keys.contains)
    require(partialCols.nonEmpty,
      s"mergeAggStates: no partial columns to merge — inputs carry only " +
        s"the key columns ${keys.mkString("[", ", ", "]")}")
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(partialCols.head)).as(partialCols.head),
        partialCols.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
