package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main for the sampled-vs-full IVF training
  * trade (SURVEY §6): on a dup-heavy corpus, time buildIvfTrained with
  * full-corpus k-means vs hashed-subsample k-means, and compare the
  * two indexes' search results. Usage:
  *   runMain graft.operators.IvfTrainBench <embeddingsDir> [sampleMod]
  */
object IvfTrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
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
}
