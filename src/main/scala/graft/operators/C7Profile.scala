package graft.operators

import org.apache.spark.sql.SparkSession
import graft.functions.Registry

/** Stage profiler for the c7 curation chain — a dev tool, not part of
  * the library surface. Calls the SAME stage builders the declared
  * query uses ([[graft.queries.CurationStages]]), so the profiled
  * pipeline cannot drift from the benchmarked/oracle-gated one.
  *
  * Every stage is FORCED inside its timer (the pinned stages by their
  * own localCheckpoint; the lazy ones by an explicit one), so each
  * printed number is that stage's cost and nothing downstream — the
  * earlier version timed the lazy pair builder at ~0 s and billed the
  * whole candidate join to the components stage. The checkpoint cuts
  * on the normally-lazy stages mean the profiled TOTAL is not the
  * fused bench time; per-stage attribution is the point here.
  */
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

    import graft.queries.CurationStages._
    val all = graft.sources.Tables.documents(spark, dir)
    val docs = t("docs-pin") { synthesized(all) }
    val gatedDocs = t("gate-pin") { gated(docs) }
    val kept = t("decon-pin") { decontaminated(gatedDocs, benchSlice(all)) }
    val pairs = t("lsh-pairs") { nearDupPairs(kept).localCheckpoint() }
    val comps = t("components") { components(pairs).localCheckpoint() }
    val out = t("quota+agg") { quotaRollup(curated(kept, comps)).collect() }
    println(s"c7prof rows=${out.length}")
    spark.stop()
  }
}
