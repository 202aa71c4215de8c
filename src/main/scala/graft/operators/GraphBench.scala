package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for [[Graph.pageRank]] (SURVEY §6): wall time vs
  * edge volume at a fixed iteration count, on deterministic synthetic
  * graphs with a realistic skewed degree distribution.
  *
  *   runMain graft.operators.GraphBench [edges...]   (default 1e5 8e5 6.4e6)
  *
  * Graph construction (pure column arithmetic, no driver-side graph):
  * edge i connects src = h(i) mod V, dst = h'(i) mod ⌈V/50⌉ — dst
  * concentrated on 2% of nodes, the hub-heavy shape of a real web-host
  * graph (the PageRank use case). V scales with E (E = 10·V) so both
  * axes grow together, like crawl snapshots do.
  *
  * The scale claims under test: per-iteration cost grows ~linearly
  * with |E| (the ranks⋈edges shuffle is the whole job), and nothing
  * driver-side grows with the graph (ranks stay a distributed |V|-row
  * relation end to end — the count() that stops the clock is the only
  * collect-like action). */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(100000L, 800000L, 6400000L)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graph-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Isolation.begin(spark) // epoch now = everything later is residue
    spark.sparkContext.setLogLevel("ERROR")

    def edges(e: Long) = {
      val v = e / 10
      val hubs = math.max(1L, v / 50)
      spark.range(e).select(
        (pmod(xxhash64(col("id")), lit(v))).as("src"),
        (pmod(xxhash64(col("id") + 1000000007L), lit(hubs))).as("dst"),
        (pmod(col("id"), lit(7)) + 1).as("w"))
    }

    import BenchTime.timed
    // warmup: the full operator at a thin slice
    Graph.pageRank(edges(10000L), iters = 5).count()
    graft.Isolation.scrub(spark)

    val lines = sizes.map { e =>
      val (rows, sec) = timed(Graph.pageRank(edges(e), iters = 5).count())
      graft.Isolation.scrub(spark)
      f"""{"edges":$e,"nodes":$rows,"iters":5,"sec":$sec%.2f}"""
    }
    println(lines.mkString("[", ",", "]"))
    spark.stop()
  }
}
