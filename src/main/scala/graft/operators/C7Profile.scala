package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Registry

// Temporary stage profiler for c7 — not part of the library surface.
object C7Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.registerAll(spark)
    import BenchTime.timed

    def t[A](label: String)(f: => A): A = {
      val (r, sec) = timed(f)
      println(f"c7prof $label%-12s ${sec}%.2fs")
      r
    }

    // replicate the c7 query stage by stage
    import graft.operators.{Dedup, Sampling, TextAnalysis}
    val wr = split(col("text"), " ")
    val rep = concat(col("text"), lit(" "),
      array_join(slice(wr, 1, 12), " "), lit(" "),
      array_join(slice(wr, 1, 12), " "))
    val all = graft.sources.Tables.documents(spark, dir)
    val docs = t("docs-pin") {
      all.where(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id"), col("source"),
          when(pmod(col("doc_id"), lit(30)) === 0, rep)
            .otherwise(col("text")).as("text"))
        .localCheckpoint()
    }
    val sig = TextAnalysis.repetitionSignals(docs,
      topNs = Seq(2), dupNs = Seq(10))
    val gated = t("gate-pin") {
      docs.join(
        sig.where(col("dup10_char_frac") < 0.10).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
        .localCheckpoint()
    }
    val bench = all.where(pmod(col("doc_id"), lit(3)) === 1)
    val kept = t("decon-pin") {
      Dedup.decontaminateFrames(gated, bench, k = 8, maxContainment = 0.5)
        .localCheckpoint()
    }
    val pairs = t("lsh-pairs") {
      Dedup.minhashLshPairs(kept, k = 3, bands = 8,
        rowsPerBand = 4, threshold = 0.05).select(col("id1"), col("id2"))
    }
    val comps = t("components") {
      Dedup.connectedComponents(pairs, assumeDistinctPairs = true)
    }
    val labeled = Sampling.componentSplitsFromComponents(
      kept.select(col("doc_id").as("id")), comps)
    val curated = kept.join(
      labeled.select(col("id").as("doc_id"), col("split")), Seq("doc_id"))
    val out = t("quota+agg") {
      Sampling.groupCap(curated, "source", "doc_id",
          key = concat(col("doc_id").cast("string"), lit("/"), col("source")),
          cap = 5)
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("chars"),
          sum(col("doc_id")).cast("long").as("id_checksum"))
        .orderBy(col("source"), col("split"))
        .collect()
    }
    println(s"c7prof rows=${out.length}")
    spark.stop()
  }
}
