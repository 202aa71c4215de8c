package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact θ-frequent-terms ("heavy hitters") over a tokenized text
  * column, at corpus scale.
  *
  * The naive plan — `groupBy(term).count()` over every token, then
  * filter — shuffles the FULL term cardinality: at 100 TB that is
  * billions of distinct terms (typo space, numbers, code identifiers),
  * and the partial-aggregate hash maps spill long before the heavy
  * hitters are known. But θ-heavy hitters admit a two-phase exact plan
  * whose shuffle is bounded by 1/θ, not by the vocabulary:
  *
  *  1. **Candidate sweep** — one map pass running a Misra–Gries summary
  *     (capacity ⌈1/θ⌉) per partition (`mapPartitions`: the genuine
  *     per-partition imperative case). MG guarantees every term with
  *     local count ≥ θ·n_p survives its partition's summary, and a term
  *     with global count ≥ θ·N must (pigeonhole) reach local θ-density
  *     in at least one partition — so the union of per-partition
  *     survivors is a SUPERSET of the true answer, of size ≤
  *     partitions·⌈1/θ⌉ regardless of vocabulary size.
  *  2. **Exact confirm** — count ONLY the candidates (broadcast
  *     semi-join keeps the token stream map-side) and keep those with
  *     `cnt·denom ≥ num·N`. Counts are exact, so false candidates from
  *     step 1 die here; the summary affects the plan, never the answer.
  *
  * θ is taken as the rational `num/denom` and the final comparison runs
  * in Long arithmetic — bit-exact across engines, no float boundary.
  * The total token count N is a single-number driver aggregate (the
  * bounded kind), computed from `sum(size(tokens))` without exploding.
  *
  * Determinism: the candidate SET depends on partition layout (MG is
  * order-sensitive), but the confirmed OUTPUT does not — any layout's
  * candidates are a superset of the answer and the confirm step is
  * exact. FrequentSpec drives this property across adversarial layouts.
  */
object Frequent {

  /** Terms with frequency ≥ num/denom of all tokens: (term, cnt),
    * cnt descending then term. */
  def frequentTerms(docs: DataFrame, num: Long, denom: Long,
      textCol: String = "text"): DataFrame = {
    require(num > 0 && denom > 0 && num <= denom,
      s"theta must be a rational in (0,1]: $num/$denom")
    val spark = docs.sparkSession
    import spark.implicits._
    val capacity = math.ceil(denom.toDouble / num).toInt
    val tokCol: Column = TextAnalysis.toks(col(textCol))
    val toks = docs.select(explode(tokCol).as("term"))
    // N: no explode — per-doc token counts sum map-side to one number
    // (sum over zero rows is NULL — an empty corpus has no terms)
    val totalRow = docs.select(sum(size(tokCol)).cast("long")).collect()(0)
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val candidates = toks.as[String]
      .mapPartitions(it => misraGries(capacity, it))
      .toDF("term").distinct()
    toks.join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(denom) >= lit(num) * lit(total))
      .orderBy(col("cnt").desc, col("term"))
  }

  /** Misra–Gries streaming summary: every item whose count in `it`
    * exceeds n/(capacity+1) is guaranteed to be in the output (there
    * can be false survivors — the caller confirms exactly). O(capacity)
    * space; decrement sweeps amortize to O(1) per element. */
  private[operators] def misraGries(capacity: Int,
      it: Iterator[String]): Iterator[String] = {
    val counts = new java.util.HashMap[String, Long](capacity * 2)
    while (it.hasNext) {
      val x = it.next()
      val c = counts.get(x)
      if (c != 0L || counts.containsKey(x)) counts.put(x, c + 1L)
      else if (counts.size < capacity) counts.put(x, 1L)
      else {
        // decrement-all: kills one "vote" of every tracked term AND the
        // incoming term — the classic O(capacity) step that keeps true
        // heavy hitters alive (they out-vote the sweeps)
        val iter = counts.entrySet().iterator()
        while (iter.hasNext) {
          val e = iter.next()
          if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().asScala.toVector.iterator
  }

  /** DuckDB oracle twin: full exact count + the same Long-arithmetic
    * threshold (the sketch is plan-only, so the oracle never sees it). */
  def frequentTermsSql(num: Long, denom: Long): String = {
    val toks = graft.functions.TextFunctions.wsTokensSql("lower(text)")
    s"""WITH toks AS (
       |  SELECT unnest($toks) AS term FROM documents),
       |tot AS (SELECT COUNT(*) AS n FROM toks),
       |c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY term)
       |SELECT term, cnt FROM c, tot
       |WHERE cnt * $denom >= $num * n
       |ORDER BY cnt DESC, term""".stripMargin
  }
}
