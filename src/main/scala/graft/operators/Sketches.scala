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

  /** Bottom-k (KMV) sketch as a custom typed Aggregator — the one
    * sketch this family needs that Spark does NOT ship: the k smallest
    * (hash, value) pairs per group. The state is an O(k) sorted list,
    * mergeable by union+truncate, so it rides map-side partial
    * aggregation like any built-in; the result doubles as (a) a
    * DETERMINISTIC uniform k-sample of the group (hash order is content
    * order, stable across runs/partitionings/retries) and (b) the KMV
    * distinct-count estimator ((k−1)/h_(k) on the normalized k-th
    * hash). Unlike the HLL/quantile built-ins, the output is exact
    * bytes — which is why a21 can hash-match a DuckDB oracle.
    *
    * IN = (hash, value): the hash is computed OUTSIDE the aggregator
    * (PolyHash64 — codegen'd, and reproducible in the oracle). */
  class BottomK(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, String), Seq[(Long, String)], Seq[String]] {
    require(k >= 1)
    override def zero: Seq[(Long, String)] = Vector.empty
    private def truncate(s: Seq[(Long, String)]) =
      if (s.size <= k) s else s.take(k)
    override def reduce(b: Seq[(Long, String)],
                        in: (Long, String)): Seq[(Long, String)] = {
      // insert in (hash, value) order; bail early only when the new
      // pair is STRICTLY past a full buffer's tail — an equal pair
      // takes the insert path, so tie handling matches the non-full
      // case and the sort-take/ROW_NUMBER oracle (duplicates kept)
      // regardless of buffer fill
      if (b.size == k && implicitly[Ordering[(Long, String)]].lt(b.last, in)) b
      else {
        val (lo, hi) = b.span(implicitly[Ordering[(Long, String)]].lt(_, in))
        truncate((lo :+ in) ++ hi)
      }
    }
    override def merge(a: Seq[(Long, String)],
                       b: Seq[(Long, String)]): Seq[(Long, String)] = {
      // merge two sorted runs, keep k
      val out = Vector.newBuilder[(Long, String)]
      var (i, j, n) = (0, 0, 0)
      val ord = implicitly[Ordering[(Long, String)]]
      while (n < k && (i < a.size || j < b.size)) {
        val takeA = j >= b.size || (i < a.size && ord.lteq(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }
    override def finish(r: Seq[(Long, String)]): Seq[String] = r.map(_._2)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** KMV (k-minimum-values) distinct-count sketch state: the k smallest
    * DISTINCT signed hashes per group, kept sorted. Distinctness is the
    * difference from [[BottomK]] (a sample keeps duplicates; a
    * cardinality sketch must not let a repeated value occupy two
    * slots). O(k) mergeable state → rides map-side partial aggregation:
    * at 100 TB only k longs per group cross the wire, never the keys.
    *
    * The estimator itself lives in the query layer ((k−1)/u_(k) on the
    * normalized k-th hash, or |sketch| when the group has fewer than k
    * distinct hashes — then the sketch IS the distinct set), because
    * its double arithmetic must be written once and replayed verbatim
    * by the SQL oracle. */
  class BottomKLongs(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Long, Seq[Long], Seq[Long]] {
    require(k >= 1)
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (b.size == k && b.last < h) b
      else {
        val (lo, hi) = b.span(_ < h)
        if (hi.nonEmpty && hi.head == h) b // already present
        else {
          val m = (lo :+ h) ++ hi
          if (m.size > k) m.take(k) else m
        }
      }
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      // merge two sorted distinct runs, dedup across runs, keep k
      val out = Vector.newBuilder[Long]
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < a.size || j < b.size)) {
        val v =
          if (j >= b.size) { val x = a(i); i += 1; x }
          else if (i >= a.size) { val x = b(j); j += 1; x }
          else if (a(i) < b(j)) { val x = a(i); i += 1; x }
          else if (b(j) < a(i)) { val x = b(j); j += 1; x }
          else { val x = a(i); i += 1; j += 1; x } // equal: consume both
        out += v; n += 1
      }
      out.result()
    }
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

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
