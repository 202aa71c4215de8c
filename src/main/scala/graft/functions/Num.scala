package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-exact numeric aggregation helpers.
  *
  * Floating-point SUM is order-dependent, and Spark's partial/final
  * aggregation order differs from a single-node engine's scan order, so a
  * raw `sum(double)` can differ from the DuckDB oracle in the last ulp —
  * enough to break a hash compare. We therefore aggregate money-like
  * doubles as exact decimals (associative, order-independent) and cast the
  * final result back to double. Decimal hash-agg is still codegen'd and
  * map-side-combined, so the 100 TB plan shape is unchanged.
  */
object Num {
  /** Two-decimal money/ratio column → exact decimal. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-independent SUM(double) with exact decimal accumulation. */
  def sumExact(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent AVG: exact decimal sum, then one double divide. */
  def avgExact(c: Column): Column =
    sum(dec(c)).cast("double") / count(c)

  /** DuckDB-side equivalents (kept adjacent so the two stay in sync). */
  def sqlSumExact(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlAvgExact(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / COUNT($col)"
}
