package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for corpus curation. The motivating production use
  * is host-level PageRank as a document-quality prior (the Common
  * Crawl curation signal: rank the web-host graph, score each page by
  * its host), computed here as the general weighted-PageRank operator
  * over any (src, dst, w) edge relation.
  *
  * Scale posture (100 TB): each iteration is the Pregel superstep shape
  * — ranks join edges partitioned by src (one shuffle), contributions
  * aggregate by dst (one shuffle, map-side combined). Rank state is
  * |V| rows, edges |E| rows; nothing quadratic, no driver-side graph.
  * The iterated relation is localCheckpointed every `checkpointEvery`
  * rounds so the logical plan cannot double per round (the same
  * lineage-blowup fix as [[Dedup.connectedComponents]]).
  *
  * All arithmetic is FIXED-POINT on BIGINT (ranks scaled by `scale`,
  * damping as the rational dampNum/dampDen, integer division
  * throughout): integer sums are order-independent, so the result is
  * bit-identical across engines, partitionings, and retries — a
  * floating-point PageRank cannot hash-match a SQL oracle, this one
  * can ([[pageRankSql]] unrolls the same recurrence as CTEs).
  *
  * Semantics: r₀(v) = scale;
  * rᵢ₊₁(v) = base + (dampNum · Σ_{(u,v,w)∈E} ⌊rᵢ(u)·w / wout(u)⌋) div dampDen
  * with base = ⌊(dampDen − dampNum)·scale / dampDen⌋. Dangling nodes
  * (no out-edges) contribute nothing — the documented simplification;
  * total mass decays slightly instead of being redistributed.
  */
object Graph {

  /** Weighted fixed-point PageRank over `edges(src, dst, w)`.
    * Returns (id, rank_fp) for every node appearing as src or dst.
    *
    * Overflow bound — the REAL one accounts for mass concentration,
    * not just edge weights: total rank mass starts at |V|·scale and
    * only decays, and on a hub-heavy graph almost all of it can land
    * on one node, so the hot expressions (`r·w`, `dampNum·c`) are
    * bounded by ~dampNum·|V|·scale. Safe iff
    * `scale ≤ 2^63 / (dampNum · |V|)` in the worst case — for the
    * default 10^12 that is |V| up to ~10^5 with full concentration,
    * or far larger when mass spreads (GraphBench runs 5M nodes with
    * 2% hubs comfortably). For an unknown graph pick
    * [[Graph.safeScale]]; ranks are relative, so a smaller scale only
    * costs fixed-point resolution. */
  def pageRank(edges: DataFrame, iters: Int,
               scale: Long = 1000000000000L,
               dampNum: Long = 85, dampDen: Long = 100,
               checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampNum < dampDen, s"damping must be in (0,1)")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    // (src, dst, w, wout) — the static operand every iteration joins.
    // EAGER localCheckpoint, not cache: the loop is lazy (no action
    // until the caller's), so a cache would never materialize before
    // use and the upstream edge derivation (often a multi-table join)
    // would re-execute once per iteration branch. All operands are
    // positive, so Spark's truncating `div` and DuckDB's flooring `//`
    // agree.
    val ew = e.join(deg, Seq("src")).localCheckpoint()
    // node set read off the checkpointed leaf — consumed iters+1 times
    val nodes = ew.select(col("src").as("id"))
      .union(ew.select(col("dst").as("id"))).distinct().localCheckpoint()
    val base = (dampDen - dampNum) * scale / dampDen
    var ranks = nodes.withColumn("r", lit(scale))
    for (i <- 1 to iters) {
      val contrib = ew.join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("r * w div wout").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      ranks = nodes.join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"$dampNum * coalesce(c, 0L) div $dampDen")).as("r"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("id"), col("r").as("rank_fp"))
  }

  /** Largest scale that cannot overflow Long even if ALL rank mass
    * concentrates on one node of an `nNodes`-node graph (with the
    * default 85/100 damping and headroom for the weight product). */
  def safeScale(nNodes: Long): Long =
    math.max(1000L, Long.MaxValue / math.max(1L, 128L * nNodes))

  /** DuckDB twin of [[pageRank]]: the identical integer recurrence
    * unrolled as one CTE chain per iteration over an `edges` CTE the
    * caller binds (must produce columns src, dst, w). */
  def pageRankSql(edgesCte: String, iters: Int,
                  scale: Long = 1000000000000L,
                  dampNum: Long = 85, dampDen: Long = 100): String = {
    val base = (dampDen - dampNum) * scale / dampDen
    val sb = new StringBuilder
    sb.append(s"""WITH e AS ($edgesCte),
                 |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
                 |deg AS (SELECT src, SUM(w) AS wout FROM e GROUP BY src),
                 |r0 AS (SELECT id, CAST($scale AS BIGINT) AS r FROM nodes)""".stripMargin)
    for (i <- 1 to iters) {
      val prev = s"r${i - 1}"
      sb.append(s""",
                   |c$i AS (
                   |  SELECT e.dst AS id, SUM(($prev.r * e.w) // d.wout) AS c
                   |  FROM e JOIN $prev ON e.src = $prev.id
                   |         JOIN deg d ON d.src = e.src
                   |  GROUP BY e.dst),
                   |r$i AS (
                   |  SELECT n.id,
                   |         CAST($base AS BIGINT) +
                   |           ($dampNum * COALESCE(c$i.c, 0)) // $dampDen AS r
                   |  FROM nodes n LEFT JOIN c$i ON n.id = c$i.id)""".stripMargin)
    }
    // SUM over BIGINT is HUGEINT in DuckDB and infects every later
    // expression — cast the final rank back so the column hash-matches
    sb.append(s"\nSELECT id, CAST(r AS BIGINT) AS rank_fp FROM r$iters")
    sb.toString
  }
}
