package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate (sketch) aggregates — the 100 TB tier where exact
  * answers stop being worth their shuffle: HyperLogLog++ distinct
  * counts, rank-error-bounded quantiles, and heavy hitters. All are
  * Spark built-ins (codegen'd, map-side partial, mergeable sketches —
  * the whole point at scale is that the sketch, not the data, crosses
  * the wire); this module pins the engine surface and the error
  * contracts the specs assert.
  *
  * No DuckDB oracle rows: sketch encodings are engine-specific, so the
  * correctness check is the error bound vs the exact answer
  * (SketchesSpec), not a hash match.
  */
object Sketches {

  /** HyperLogLog++ distinct count per group; `rsd` = target relative
    * standard deviation (Spark default 0.05). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame = {
    val agg = approx_count_distinct(col(valueCol), rsd).as("approx_distinct")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Quantiles with bounded RANK error: `accuracy` trades memory for
    * precision — returned value sits within ±(1/accuracy)·n ranks of
    * the true quantile (percentile_approx contract). */
  def approxQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
                      accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(col(valueCol),
      array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Heavy hitters with support ≥ `support` (Karp-style frequent
    * items; may over-report, never under-reports a true heavy hitter —
    * the one-sided guarantee the spec asserts). */
  def frequentItems(df: DataFrame, cols_ : Seq[String],
                    support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols_, support)
}
