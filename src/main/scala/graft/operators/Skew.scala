package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY scale posture / builder prompt
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles sort-merge cases at runtime; these helpers
  * cover the two shapes AQE does not: hot-key AGGREGATION (two-phase
  * salted aggregate) and broadcast-ineligible hot-key JOINs (salt ×
  * replicate). The salt is derived from row CONTENT, never from
  * placement-dependent ids: with monotonically_increasing_id a shuffle
  * fetch failure + partial stage retry can re-salt rows differently and
  * double-count/drop them (the SPARK-23207 class of bug).
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): hash of the full row
    * content. Stable under task retries and repartitioning. */
  private def contentSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong))

  /** Two-phase salted aggregation: groupBy(keys + salt) partial, then
    * groupBy(keys) final. Turns one hot reducer into `salts` reducers.
    * `partials` maps each final aggregate to (partialAgg, finalAgg) —
    * e.g. count → (count, sum), sum → (sum, sum). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      partials: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("_salt", contentSalt(df, salts))
    val phase1 = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head._2.as(s"_p_${partials.head._1}"),
        partials.tail.map(p => p._2.as(s"_p_${p._1}")): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(partials.head._3(col(s"_p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map(p => p._3(col(s"_p_${p._1}")).as(p._1)): _*)
  }

  /** Salted join for a skewed LEFT side against a small-but-not-tiny
    * right side: left rows get a deterministic salt in [0, salts); the
    * right side is replicated `salts` times. Equivalent to the plain
    * equi-join, but the hot key's rows spread over `salts` tasks. */
  def saltedJoin(skewedLeft: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedL = skewedLeft.withColumn("_salt", contentSalt(skewedLeft, salts))
    val replicatedR = right.withColumn("_salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedL.join(replicatedR, Seq(key, "_salt")).drop("_salt")
  }
}
