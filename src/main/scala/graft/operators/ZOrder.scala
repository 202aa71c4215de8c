package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for data-skipping: interleave the bits
  * of two dimension keys and range-partition + sort by the interleaved
  * value. Files/row-groups then carry TIGHT min/max ranges on BOTH
  * dimensions, so a reader's predicate on either column prunes most
  * partitions — the standard lakehouse layout trick for multi-column
  * point/range queries, expressed as plain Spark: one codegen'd
  * Column expression + repartitionByRange + sortWithinPartitions.
  *
  * At 100 TB this runs as one range-exchange over the write set (the
  * same shuffle a plain sorted write pays) and buys min/max skipping
  * on the second dimension for free afterwards.
  */
object ZOrder {

  /** Morton-interleave two non-negative ints, `bits` bits each: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Built as a
    * balanced fold of shift/and/or Column arithmetic — whole-stage
    * codegen keeps it a straight-line integer kernel. Values are
    * clamped into [0, 2^bits) so outliers cannot corrupt the ordering
    * of in-range keys. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val max = (1L << bits) - 1
    val ca = least(greatest(a.cast("long"), lit(0L)), lit(max))
    val cb = least(greatest(b.cast("long"), lit(0L)), lit(max))
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_.bitwiseOR(_))
  }

  /** DuckDB twin of [[zValue]] — the identical clamp + bit placement as
    * a list_reduce over bit positions. */
  def zValueSql(a: String, b: String, bits: Int = 16): String = {
    val max = (1L << bits) - 1
    val ca = s"least(greatest(CAST($a AS BIGINT), 0), $max)"
    val cb = s"least(greatest(CAST($b AS BIGINT), 0), $max)"
    val terms = (0 until bits).map { i =>
      s"((($ca // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"(($cb // ${1L << i}) % 2) * ${1L << (2 * i + 1)})"
    }
    s"CAST((${terms.mkString(" + ")}) AS BIGINT)"
  }

  /** Cluster `df` for two-dimensional skipping: range-partition on the
    * z-value (balanced output sizes via range exchange sampling), sort
    * within each partition so row-group min/max stay tight. The z
    * column is dropped — layout is the product, not a new column. */
  def clusterBy(df: DataFrame, a: String, b: String, partitions: Int,
                bits: Int = 16): DataFrame =
    df.withColumn("_z", zValue(col(a), col(b), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")

  /** Per-partition min/max envelope of two columns — the statistics a
    * format's footer would carry; used to measure skipping. */
  def envelopes(df: DataFrame, a: String, b: String): DataFrame =
    df.select(spark_partition_id().as("pid"), col(a), col(b))
      .groupBy(col("pid"))
      .agg(min(col(a)).as("min_a"), max(col(a)).as("max_a"),
        min(col(b)).as("min_b"), max(col(b)).as("max_b"))
}
