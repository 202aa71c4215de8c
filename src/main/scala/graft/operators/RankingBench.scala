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
    spark.stop()
  }
}
