package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main for the sampled-vs-full IVF training
  * trade (SURVEY §6): on a dup-heavy corpus, time buildIvfTrained with
  * full-corpus k-means vs hashed-subsample k-means, and compare the
  * two indexes' search results. Usage:
  *   runMain graft.operators.IvfTrainBench <embeddingsDir> [sampleMod]
  *
  * Curve mode — the v6 serving-path operating curve (recall@10 and
  * wall time vs nProbe at 1x and Nx corpus), the table an operator
  * sets nProbe from. Copies get a deterministic first-component
  * perturbation so duplicated vectors don't make top-k a tie lottery:
  *   runMain graft.operators.IvfTrainBench <embeddingsDir> curve [copies]
  */
object IvfTrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    if (args.length > 1 && args(1) == "curve") {
      curve(dir, if (args.length > 2) args(2).toInt else 1)
      return
    }
    val sampleMod = if (args.length > 1) args(1).toLong else 8L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.registerAll(spark)
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).cache()
    val n = emb.count()
    import BenchTime.timed
    val ((fullIdx, fullAssigned), tFull) =
      timed { val r = Similarity.buildIvfTrained(emb, k = 16); r._2.count(); r }
    val ((sampIdx, sampAssigned), tSamp) =
      timed { val r = Similarity.buildIvfTrained(emb, k = 16, sampleMod = sampleMod)
              r._2.count(); r }
    val queries = emb.where(pmod(col("vec_id"), lit(1000)) === 0)
    def topk(idx: Similarity.IvfIndex, a: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(idx, a, queries, k = 10, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val (fullRes, sampRes) = (topk(fullIdx, fullAssigned), topk(sampIdx, sampAssigned))
    // recall vs exact ground truth — the fair comparison (two valid
    // indexes legitimately probe different cells, so cross-index overlap
    // understates quality)
    val exact = Similarity.bruteForceTopK(emb, sampleMod = 1000, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val (fullRec, sampRec) =
      ((fullRes & exact).size.toDouble / exact.size,
       (sampRes & exact).size.toDouble / exact.size)
    def bal(a: org.apache.spark.sql.DataFrame) = {
      val s = a.groupBy("cell").count().collect().map(_.getLong(1))
      s.max.toDouble / (s.sum.toDouble / s.length)
    }
    println(f"n=$n sampleMod=$sampleMod full=${tFull}%.1fs sampled=${tSamp}%.1fs " +
      f"speedup=${tFull / tSamp}%.2fx recall(full)=${fullRec}%.3f " +
      f"recall(samp)=${sampRec}%.3f " +
      f"bal(full)=${bal(fullAssigned)}%.2f bal(samp)=${bal(sampAssigned)}%.2f")
    spark.stop()
  }

  /** recall@10 + wall time of the composed serving path
    * (ivfQuantizedTopK: trained cells × int8 scoring × exact rescore)
    * for nProbe in {1,4,10,16}, against brute-force ground truth, with
    * the brute-force scan itself timed as the flat-scan anchor. */
  private def curve(dir: String, copies: Int): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.registerAll(spark)
    val base = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val emb = (if (copies <= 1) base
      else (0 until copies).map { c =>
        // 10M id stride (PipelineScaleBench convention): a 1M stride
        // would collide copy ids on any >=1M-vector base corpus and
        // silently corrupt the ground truth
        base.select((col("vec_id") + lit(c * 10000000L)).as("vec_id"),
          // deterministic per-copy nudge on component 0: keeps the Nx
          // corpus realistic (near-dups, not bit-dups) and makes
          // ground-truth top-k well-separated instead of an 8-way tie
          transform(col("embedding"), (x, i) =>
            when(i === 0, (x + lit(c * 0.001f)).cast("float")).otherwise(x))
            .as("embedding"))
      }.reduce(_.unionByName(_))).cache()
    val n = emb.count()
    import BenchTime.timed
    val (index, assigned0) = Similarity.buildIvfTrained(emb, k = 16)
    val assigned = assigned0.localCheckpoint() // the resident serving index
    assigned.count()
    val queries = emb.where(pmod(col("vec_id"), lit(100)) === 0)
    val nq = queries.count()
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    // one untimed pass so the first curve point doesn't bill codegen/JIT
    // warmup to nProbe=1
    Similarity.ivfQuantizedTopK(index, assigned, queries,
      k = 10, nProbe = 4, rescoreK = 40).collect()
    val (exactRows, tExact) =
      timed(Similarity.bruteForceTopK(emb, sampleMod = 100, k = 10).collect())
    val exact = pairs(exactRows)
    println(f"curve corpus=${copies}x n=$n queries=$nq " +
      f"bruteforce=${tExact}%.2fs (flat-scan anchor)")
    Seq(1, 4, 10, 16).foreach { p =>
      val (rows, t) = timed(Similarity.ivfQuantizedTopK(
        index, assigned, queries, k = 10, nProbe = p, rescoreK = 40).collect())
      val rec = (pairs(rows) & exact).size.toDouble / exact.size
      println(f"curve corpus=${copies}x nProbe=$p%2d time=${t}%.2fs recall@10=${rec}%.3f")
    }
    spark.stop()
  }
}
