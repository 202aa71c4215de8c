package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off measurement main for the distributed-NTILE trade (SURVEY
  * §6): on a synthetic frame big enough that one task matters, time
  * quartile assignment via the single-partition global window (w5's
  * old plan) vs Ranking.ntileExact, and assert the outputs agree.
  * Usage: runMain graft.operators.RankingBench [nRows]
  */
object RankingBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Isolation.begin(spark) // epoch now = everything later is residue
    spark.sparkContext.setLogLevel("WARN")
    // deterministic pseudo-random spend per id; 32 input partitions
    val df = spark.range(0, n, 1, 32)
      .select(col("id"), (xxhash64(col("id")) % 1000000).as("v"))
    import BenchTime.timed
    // per-tile id checksum, not just (count, min, max): equal v values
    // straddling a tile boundary could swap rows between tiles without
    // moving any aggregate — sum(id) pins the exact row-to-tile
    // assignment (ids are unique; sums stay far below Long.Max)
    def summarize(d: org.apache.spark.sql.DataFrame, tile: String) =
      d.groupBy(col(tile)).agg(count(lit(1)).as("n"),
          min(col("v")).as("lo"), max(col("v")).as("hi"),
          sum(col("id")).as("id_checksum"))
        .orderBy(col(tile)).collect()
    def globalNtile(d: org.apache.spark.sql.DataFrame) = {
      val w = Window.orderBy(desc("v"), col("id"))
      summarize(d.withColumn("q", ntile(4).over(w)), "q")
    }
    def distNtile(d: org.apache.spark.sql.DataFrame) =
      summarize(Ranking.ntileExact(d, 4, Seq(desc("v"), col("id")), "q"), "q")
    // JIT/codegen warmup for BOTH code paths before either is timed —
    // timing the first path cold and the second warm would fold the
    // documented ~1.5-2x cold/warm gap into the comparison
    val warm = spark.range(0, n / 10, 1, 32)
      .select(col("id"), (xxhash64(col("id")) % 1000000).as("v"))
    globalNtile(warm); distNtile(warm)
    graft.Isolation.scrub(spark)
    val (gRes, gSec) = timed(globalNtile(df))
    graft.Isolation.scrub(spark)
    val (dRes, dSec) = timed(distNtile(df))
    require(gRes.map(_.toSeq).toSeq == dRes.map(_.toSeq).toSeq,
      s"distributed NTILE diverged from the global window:\n" +
        s"${gRes.toSeq}\nvs\n${dRes.toSeq}")
    println(f"n=$n globalWindow=${gSec}%.1fs distributed=${dSec}%.1fs " +
      f"speedup=${gSec / dSec}%.2fx (per-tile counts, min/max and id " +
      "checksums identical)")

    // ---- same race for the exact global running sum (cumsumExact,
    // s16's machinery: SUM offsets in place of COUNT offsets). The
    // checksum is an order-independent sum of per-row cum residues, so
    // any single row's running sum differing between the paths shows.
    def sumCheck(d: org.apache.spark.sql.DataFrame) =
      d.agg(count(lit(1)).as("n"), max(col("cum")).as("top"),
          sum(pmod(col("cum"), lit(1000003L))).as("cum_checksum"))
        .collect()
    def globalCumsum(d: org.apache.spark.sql.DataFrame) =
      sumCheck(d.withColumn("cum",
        sum(col("v")).over(Window.orderBy(desc("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    def distCumsum(d: org.apache.spark.sql.DataFrame) =
      sumCheck(Ranking.cumsumExact(d, Seq(desc("v"), col("id")), col("v"), "cum"))
    globalCumsum(warm); distCumsum(warm)
    graft.Isolation.scrub(spark)
    val (gcRes, gcSec) = timed(globalCumsum(df))
    graft.Isolation.scrub(spark)
    val (dcRes, dcSec) = timed(distCumsum(df))
    require(gcRes.map(_.toSeq).toSeq == dcRes.map(_.toSeq).toSeq,
      s"distributed cumsum diverged from the global window:\n" +
        s"${gcRes.toSeq}\nvs\n${dcRes.toSeq}")
    println(f"n=$n cumsum globalWindow=${gcSec}%.1fs distributed=${dcSec}%.1fs " +
      f"speedup=${gcSec / dcSec}%.2fx (count, max and per-row residue " +
      "checksum identical)")

    // ---- grouped top-k race (a25's machinery): window row_number
    // sorts every row of every group; TopKLongPairs crosses the wire
    // with k pairs per group per input partition. 100 groups × n/100
    // rows, k=10 — the curation shape ("best 10 docs per source").
    val k = 10
    val gdf = spark.range(0, n, 1, 32)
      .select((col("id") % 100).as("g"), (xxhash64(col("id")) % 1000000).as("v"),
        col("id"))
    def topkSummary(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    def windowTopK(d: org.apache.spark.sql.DataFrame) = topkSummary(
      d.withColumn("rnk", row_number()
          .over(Window.partitionBy(col("g")).orderBy(desc("v"), col("id")))
          .cast("long"))
        .where(col("rnk") <= k).select(col("g"), col("rnk"), col("v"), col("id"))
        .collect())
    val tkAgg = udaf(new Ranking.TopKLongPairs(k))
    def aggTopK(d: org.apache.spark.sql.DataFrame) = topkSummary(
      d.groupBy(col("g")).agg(tkAgg(col("v"), col("id")).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), (col("pos") + 1).cast("long").as("rnk"),
          col("col._1").as("v"), col("col._2").as("id"))
        .collect())
    val gwarm = spark.range(0, n / 10, 1, 32)
      .select((col("id") % 100).as("g"), (xxhash64(col("id")) % 1000000).as("v"),
        col("id"))
    windowTopK(gwarm); aggTopK(gwarm)
    graft.Isolation.scrub(spark)
    val (wRes, wSec) = timed(windowTopK(gdf))
    graft.Isolation.scrub(spark)
    val (aRes, aSec) = timed(aggTopK(gdf))
    require(wRes == aRes,
      s"aggregator top-k diverged from the window formulation")
    println(f"n=$n topk windowSort=${wSec}%.1fs aggregator=${aSec}%.1fs " +
      f"speedup=${wSec / aSec}%.2fx (all ${wRes.size} ranked rows identical)")
    spark.stop()
  }
}
