package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking / NTILE.
  *
  * A bare `Window.orderBy(...)` (no partitionBy) funnels the whole frame
  * through ONE task — tolerable on a reduced frame at sf0.1, a scale-killer
  * at 100 TB (the per-customer spend frame is millions of rows). The classic
  * distributed fix: range-partition on the sort key, rank locally within
  * each range, and add broadcasted per-partition row-count offsets. Two
  * narrow shuffles plus one numPartitions-row collect replace the
  * single-partition sort; no task ever sees more than its range.
  *
  * Reference analog: the dashboard's client-side quartile bucketing
  * (frontend/src/components/Dashboard.jsx:762-781) — here re-expressed as
  * an exact, distributed NTILE so the semantics survive a 100x scale-up.
  */
object Ranking {

  /** Range-shuffled, checkpointed snapshot of `df` with a partition-id
    * column — the shared first stage of every exact-global operator here
    * (rank, NTILE, prefix sum).
    *
    * The INPUT frame is transiently persisted (SQL-layer cache, dropped
    * as soon as the shuffled frame materializes): without it the
    * upstream executes three times — the range-sampling pass, the
    * offset job, and the final job each recompute it (measured 2.7x on
    * w5's agg input). persist, not localCheckpoint, for that snapshot:
    * its blocks are dead the moment the shuffled frame materializes,
    * and only cacheManager-tracked frames can be unpersisted cleanly
    * here — a leaked checkpoint per call would be exactly the residue
    * class the round-6 bench forensic closed. The range-SHUFFLED frame
    * is localCheckpoint'ed so the exchange also runs once (offset and
    * final jobs read its blocks instead of re-shuffling); Bench's
    * per-query scrub reclaims those blocks. If the CALLER persisted
    * this plan, persist() would be a no-op but unpersist() would evict
    * THEIR entry (cacheManager matches by plan) and silently force
    * full recomputation on their next use — so skip both in that case. */
  /** Whether the CALLER already cached this exact plan. Needs the
    * Spark 4 'classic' Dataset — match instead of casting so a
    * connect-mode session (or an upgrade that reshapes the hierarchy)
    * returns false and [[rangeSnapshot]] degrades to its transient
    * persist rather than throwing ClassCastException at runtime. */
  private[operators] def lookupCallerCached(df: DataFrame): Boolean = df match {
    case d: org.apache.spark.sql.classic.Dataset[_] =>
      df.sparkSession.sharedState.cacheManager.lookupCachedData(d).isDefined
    case _ => false
  }

  /** `cachedOverride` exists for the spec to force the non-classic
    * fallback (`lookupCallerCached` = false) on a session where every
    * local Dataset IS classic — production callers never pass it. The
    * degraded path re-runs persist on a possibly-cached plan (a no-op)
    * and unpersists after — safe for correctness, at worst it evicts a
    * cache entry the caller must rebuild. */
  private[operators] def rangeSnapshot(df: DataFrame, sortCols: Seq[Column],
                            numPartitions: Int, pidCol: String,
                            cachedOverride: Option[Boolean] = None): DataFrame = {
    val callerCached = cachedOverride.getOrElse(lookupCallerCached(df))
    val snap =
      if (callerCached) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try snap.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint() // eager: range sampling + shuffle run ONCE here
    finally if (!callerCached) snap.unpersist(blocking = false)
  }

  /** Exclusive per-partition prefix offsets from a (pid → value) map:
    * pid p's offset is the sum of values of all partitions < p. Partition
    * ids ascend along the range order, so this is the global prefix.
    * Returns (offsets, grand total). */
  private def prefixOffsets(perPart: Map[Int, Long]): (Map[Int, Long], Long) = {
    val pids = perPart.keys.toSeq.sorted
    var acc = 0L
    val offsets = pids.map { p => val o = acc; acc += perPart(p); p -> o }.toMap
    (offsets, acc)
  }

  private def rankedParts(df: DataFrame, sortCols: Seq[Column],
                          rankCol: String, numPartitions: Int)
      : (DataFrame, Long) = {
    val parts = rangeSnapshot(df, sortCols, numPartitions, "_rk_pid")
    // numPartitions rows — tiny collect, also yields the global count.
    val counts = parts.groupBy(col("_rk_pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (offsets, n) = prefixOffsets(counts)
    val w = Window.partitionBy(col("_rk_pid")).orderBy(sortCols: _*)
    val ranked = parts
      .withColumn(rankCol, row_number().over(w).cast("long") +
        element_at(typedLit(offsets), col("_rk_pid")))
      .drop("_rk_pid")
    (ranked, n)
  }

  /** Adds `cumCol` = exact global running sum of `valueCol` (cast to long;
    * nulls count as 0 on both the offset and the window side) under the
    * total order `sortCols` — SQL's
    * `SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` without the
    * single-partition window: per-range partial sums are collected
    * (numPartitions rows) and broadcast back as offsets, exactly the
    * rank/NTILE scheme with SUM in place of COUNT. The sort keys must
    * form a total order (unique tiebreak) or the running sum at ties is
    * nondeterministic. Long-typed by design: exact prefix sums need
    * integer (or decimal) values — float running sums are
    * order-dependent in a way no distribution scheme can fix. */
  def cumsumExact(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                  cumCol: String, numPartitions: Int = 32): DataFrame = {
    // the value column is derived AFTER the snapshot: wrapping df in a
    // withColumn first would make rangeSnapshot's caller-cache lookup
    // miss (cacheManager matches by plan), re-persisting data the
    // caller already cached. Post-checkpoint it's a cheap projection
    // over the snapshot's blocks, evaluated once per downstream job.
    val parts = rangeSnapshot(df, sortCols, numPartitions, "_cs_pid")
      .withColumn("_cs_v", coalesce(valueCol.cast("long"), lit(0L)))
    val sums = parts.groupBy(col("_cs_pid"))
      .agg(sum(col("_cs_v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (offsets, _) = prefixOffsets(sums)
    // ROWS, not the default RANGE frame: under RANGE, peer rows (ties in
    // sortCols) would each see the full tie-group's sum. sortCols are
    // required to be a total order anyway, but ROWS keeps the semantics
    // honest if that contract is violated upstream.
    val w = Window.partitionBy(col("_cs_pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.withColumn(cumCol,
        sum(col("_cs_v")).over(w) + element_at(typedLit(offsets), col("_cs_pid")))
      .drop("_cs_pid", "_cs_v")
  }

  /** Adds `rankCol` = exact 1-based global rank under `sortCols`. The sort
    * keys must form a total order (include a unique tiebreak column). */
  def globalRank(df: DataFrame, sortCols: Seq[Column], rankCol: String,
                 numPartitions: Int = 32): DataFrame =
    rankedParts(df, sortCols, rankCol, numPartitions)._1

  /** Adds `tileCol` = NTILE(k) under `sortCols` — identical to SQL NTILE
    * semantics (the first N%k tiles get one extra row) computed from the
    * exact distributed rank, with no single-partition Window anywhere in
    * the plan. */
  def ntileExact(df: DataFrame, k: Int, sortCols: Seq[Column],
                 tileCol: String, numPartitions: Int = 32): DataFrame = {
    require(k >= 1, "ntile requires k >= 1")
    val (ranked, n) = rankedParts(df, sortCols, "_nt_rank", numPartitions)
    val base = n / k
    val rem = n % k
    val cut = rem * (base + 1) // ranks <= cut fall in the base+1-sized tiles
    // base == 0 only when n < k; then every rank is <= cut and the
    // otherwise-branch is never evaluated — max(base,1) just keeps the
    // unevaluated divisor nonzero under ANSI mode.
    val smallSz = math.max(base, 1L)
    val r = col("_nt_rank")
    // long/long division of rank-magnitude values is exact in double
    // (both operands and any integer quotient are < 2^53), so the
    // truncating cast implements integer division correctly here.
    ranked.withColumn(tileCol,
        when(r <= cut, ((r - 1) / (base + 1)).cast("long") + 1)
          .otherwise(lit(rem) + ((r - cut - 1) / smallSz).cast("long") + 1)
          .cast("int"))
      .drop("_nt_rank")
  }

  /** Bounded per-group top-k accumulator — the at-scale replacement for
    * the `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`
    * pattern. The window form shuffles and SORTS every row of every
    * group; this Aggregator keeps only the k best (key, id) pairs in
    * its buffer, so map-side partial aggregation bounds what crosses
    * the wire at k pairs per group per input partition, and no sort of
    * the full data ever happens. Ordering is key DESC, id ASC
    * (deterministic ties); the buffer stays sorted best-first, so the
    * finished array IS the ranked top-k (rank = position + 1).
    * Identical (key, id) duplicates are kept, matching row_number
    * (which also keeps both). */
  class TopKLongPairs(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    require(k >= 1)
    private def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    override def zero: Seq[(Long, Long)] = Vector.empty
    override def reduce(b: Seq[(Long, Long)],
                        x: (Long, Long)): Seq[(Long, Long)] =
      if (b.size == k && !better(x, b.last)) b
      else {
        val (lo, hi) = b.span(better(_, x))
        val m = (lo :+ x) ++ hi
        if (m.size > k) m.take(k) else m
      }
    override def merge(a: Seq[(Long, Long)],
                       b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val out = Vector.newBuilder[(Long, Long)]
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < a.size || j < b.size)) {
        val x =
          if (j >= b.size) { val v = a(i); i += 1; v }
          else if (i >= a.size) { val v = b(j); j += 1; v }
          else if (better(a(i), b(j)) || a(i) == b(j)) { val v = a(i); i += 1; v }
          else { val v = b(j); j += 1; v }
        out += x; n += 1
      }
      out.result()
    }
    override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }
}
