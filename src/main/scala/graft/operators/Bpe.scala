package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE-style vocabulary induction: the iterative merge loop
  * on top of the pair counting `t8_bpe_pair_counts` exercises once.
  * Each round counts adjacent symbol pairs across the whole corpus,
  * picks the globally most frequent (count desc, then lexicographic
  * (a, b) — a total order, so the winner is deterministic), and merges
  * its adjacent occurrences left-to-right non-overlapping in every
  * document.
  *
  * Shapes like the standard big-data BPE trainer: the per-round
  * argmax is one explode + groupBy + limit(1) (shuffle bounded by the
  * distinct-pair count, with map-side partial aggregation), the merge
  * itself is a pure map-side array fold, and the driver only ever
  * holds the single winning pair per round — never token data.
  * Symbols here are whitespace tokens (phrase induction); running the
  * same loop over character arrays gives classic subword BPE.
  */
object Bpe {

  /** One learned merge: the pair and its count at merge time. */
  final case class Merge(a: String, b: String, n: Long)

  private def adjacentPairs(syms: DataFrame): DataFrame =
    syms.where(size(col("syms")) >= 2)
      .select(explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"))

  /** Greedy left-to-right merge of adjacent (a, b) into one symbol
    * `"a b"` — the fold keeps runs non-overlapping exactly like the
    * sequential reference: [a, a, b] merges the SECOND a, [a, a, a]
    * with pair (a, a) merges once and leaves the tail a. */
  private def mergeColumn(a: String, b: String) =
    aggregate(col("syms"), array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + " " + b))))
        .otherwise(concat(acc, array(x))))

  /** Run `nMerges` rounds over `docs` (columns `doc_id`, `text`).
    * Returns the learned merges in order plus the final per-document
    * symbol arrays (`doc_id`, `syms`) — CACHED; callers that keep the
    * frame long-term should unpersist it when done. Stops early if the
    * corpus runs out of repeated pairs. */
  def train(docs: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    var syms = docs.select(col("doc_id"),
      TextAnalysis.toks(col("text")).as("syms")).cache()
    val merges = Seq.newBuilder[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = adjacentPairs(syms)
        .orderBy(desc("n"), col("a"), col("b")).limit(1).collect()
      // a pair seen once still merges (standard BPE has no min count);
      // only a corpus with NO adjacent pairs at all ends the loop early
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(a, b, n)
        val next = syms.select(col("doc_id"), mergeColumn(a, b).as("syms")).cache()
        next.count() // materialize before releasing the parent's blocks
        syms.unpersist()
        syms = next
      }
      round += 1
    }
    (merges.result(), syms)
  }

  /** Final vocabulary: symbol frequencies after training. */
  def vocab(syms: DataFrame): DataFrame =
    syms.select(explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("sym"))

  /** Apply learned merges to a corpus — the tokenizer-inference side of
    * [[train]]. Merges apply in learned order, each with the same
    * greedy left-to-right fold, so
    * `encode(docs, train(docs, n)._1) == train(docs, n)._2` exactly.
    *
    * Pure map-side: a per-partition imperative loop (no shuffle, no
    * state), the shape tokenizer application always has at 100 TB. The
    * in-JVM loop replaces m chained HOF folds — one array pass per
    * merge rank without m plan nodes. */
  def encode(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.map(m => (m.a, m.b)).toArray
    docs.select(col("doc_id"),
        TextAnalysis.toks(col("text")).as("syms"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.map { case (id, toks0) =>
          var toks = toks0
          ms.foreach { case (a, b) =>
            val merged = a + " " + b
            val out = scala.collection.mutable.ArrayBuffer[String]()
            toks.foreach { x =>
              if (out.nonEmpty && out.last == a && x == b)
                out(out.length - 1) = merged
              else out += x
            }
            toks = out.toSeq
          }
          (id, toks)
        }
      }
      .toDF("doc_id", "syms")
  }
}
