package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Registry

/** Scale evidence for d11 (`Dedup.duplicatedSpanRemoval`), run at the
  * no-broadcast (cluster) shape the operator's scaladoc argues about:
  *
  *   runMain graft.operators.SpanDedupBench <documentsParquet> [k]
  *
  * Races the shipped one-shuffle windowed-duplicate-count formulation
  * against the obvious aggregate-then-join alternative (kept here as
  * bench scaffolding only), asserting identical outputs via per-corpus
  * checksums. Run it on `/root/testdata/sf0.1/documents.parquet` (1x)
  * and an 8x replicated dup-heavy copy to see both the formulation gap
  * and the operator's scaling slope. Both paths are JIT-warmed on a
  * subset before either is timed (same fairness rule as RankingBench).
  */
object SpanDedupBench {
  /** The aggregate-then-join formulation the operator deliberately does
    * NOT use: count per hash, semi-join occurrences back. Generates and
    * hashes every gram twice at the no-broadcast shape (column pruning
    * defeats ReuseExchange between the two occurrence subtrees). */
  private def aggJoinSpanRemoval(docs: DataFrame, k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
    val withG = toks.withColumn("gh", Registry.gramHashes(col("toks"), k))
    val occ = withG.select(col("doc_id"), posexplode(col("gh")))
      .toDF("doc_id", "idx", "h")
    val dupH = occ.groupBy(col("h")).count()
      .where(col("count") >= 2).select(col("h"))
    val dupStarts = occ.join(dupH, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("idx") + 1)).as("starts"))
    toks.join(dupStarts, Seq("doc_id"), "left")
      .withColumn("starts",
        coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("kept", filter(col("toks"),
        (_, i) => !exists(col("starts"),
          s => s <= i + 1 && s >= i + lit(2) - k)))
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        (col("n") - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/testdata/sf0.1/documents.parquet")
    val k = if (args.length > 1) args(1).toInt else 13
    val spark = SparkSession.builder().master("local[32]")
      .appName("span-dedup-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // the cluster shape under test: duplicate-hash sets at 100 TB are
      // billions of rows — nothing here may assume a broadcastable side
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Isolation.begin(spark) // epoch now = everything later is residue
    spark.sparkContext.setLogLevel("ERROR")
    Registry.registerAll(spark)
    val docs = spark.read.parquet(path).select(col("doc_id"), col("text"))

    // doc-count, token/removal totals, and a content checksum: equal
    // checksums pin that the two formulations excise IDENTICAL spans
    def summarize(d: DataFrame) =
      d.agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("toks"),
          sum(col("n_removed")).as("removed"),
          sum(crc32(concat_ws("|", col("doc_id"), col("clean_text"))))
            .as("checksum"))
        .collect()(0).toSeq
    import BenchTime.timed
    // JIT/codegen warmup for BOTH paths before either is timed
    val warm = docs.limit(2000).localCheckpoint()
    summarize(Dedup.duplicatedSpanRemoval(warm, k))
    summarize(aggJoinSpanRemoval(warm, k))
    graft.Isolation.scrub(spark)
    val (wRes, wSec) = timed(summarize(Dedup.duplicatedSpanRemoval(docs, k)))
    graft.Isolation.scrub(spark)
    val (jRes, jSec) = timed(summarize(aggJoinSpanRemoval(docs, k)))
    require(wRes == jRes,
      s"windowed and agg-join span removal diverged:\n$wRes\nvs\n$jRes")
    println(f"path=$path k=$k window=${wSec}%.2fs aggJoin=${jSec}%.2fs " +
      f"speedup=${jSec / wSec}%.2fx (docs/token/removal/checksum identical: $wRes)")
    spark.stop()
  }
}
