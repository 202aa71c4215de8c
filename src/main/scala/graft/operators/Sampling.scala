package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash64

/** Deterministic sampling for training-data mixing: per-stratum rates
  * decided by a content hash of the row key, not an RNG. The hash makes
  * the sample a pure function of the data — identical across runs,
  * executors, partitionings, and stage retries (the SPARK-23207 class
  * of resample-on-retry bugs cannot happen), and it is reproducible in
  * the DuckDB oracle through the same portable PolyHash64.
  */
object Sampling {

  val Buckets = 10000

  /** Keep a row iff hash(key) mod 10000 falls under its stratum's
    * fraction. Map-side only — at scale this is a free filter pushed
    * against the scan, never a shuffle. */
  def stratifiedSample(df: DataFrame, strataCol: String, key: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double): DataFrame = {
    val bucket = PolyHash64.polyHash64(key) % Buckets
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      lit((defaultFraction * Buckets).toInt)) { case (acc, (s, f)) =>
        when(col(strataCol) === s, lit((f * Buckets).toInt)).otherwise(acc)
    }
    df.where(bucket < threshold)
  }

  /** DuckDB twin of the bucket predicate for stratum column `strata`
    * and key expression `keySql`. */
  def stratifiedSampleSql(strata: String, keySql: String,
                          fractions: Map[String, Double],
                          defaultFraction: Double): String = {
    val cases = fractions.toSeq.sortBy(_._1).map { case (s, f) =>
      s"WHEN $strata = '$s' THEN ${(f * Buckets).toInt}"
    }.mkString(" ")
    s"(${PolyHash64.sql(keySql)}) % $Buckets < " +
      s"(CASE $cases ELSE ${(defaultFraction * Buckets).toInt} END)"
  }
}
