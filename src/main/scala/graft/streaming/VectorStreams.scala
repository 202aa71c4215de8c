package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Registry
import graft.operators.Similarity

/** Streaming vector operators — the serving-side analog of
  * [[DocStreams]]: arriving documents' embeddings are enriched with
  * their nearest neighbors from a persisted PQ-IVF index
  * ([[Similarity.savePqIvf]]), the stream-static shape of a retrieval
  * or dedup-candidate feed. The index is the STATIC side (cell scans
  * are ordinary pruned parquet joins against the micro-batch), so the
  * query needs no state beyond the per-batch group shells — arriving
  * vectors are enriched and forgotten.
  */
object VectorStreams {

  /** Internal ADC-phase row (public only because Spark's generated
    * encoder code cannot touch a private class). */
  case class AdcHit(q_id: Long, q_emb: Seq[Float], cell: Int,
                    vec_id: Long, qscore: Long)
  case class Neighbor(q_id: Long, rank: Int, neighbor_id: Long, cos: Double)

  /** Enrich a stream of (vec_id, embedding) rows with their top-`k`
    * neighbors from the persisted PQ-IVF index at `path` — EXACTLY
    * [[Similarity.pqIvfSearch]]'s ranking rules, because the whole ADC
    * front half (probe selection, LUT layout, self-exclusion, scoring)
    * IS the batch implementation, shared via
    * [[Similarity.pqIvfAdcCandidates]]; the streamed verdicts equal a
    * batch search over the same arrivals row for row (spec-pinned).
    * The one mechanical difference: per-query top-k on a stream cannot
    * use a row_number window (unsupported in append streams), so both
    * cuts run as bounded heaps inside STATELESS flatMapGroupsWithState
    * shells — a query's candidates all live in the micro-batch that
    * carried the query, no state is ever written, and memory per group
    * is O(rescoreK), not O(candidates). */
  def pqIvfEnrich(stream: DataFrame, path: String, k: Int, nProbe: Int,
                  rescoreK: Int): Dataset[Neighbor] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val (cand0, cells) =
      Similarity.pqIvfAdcCandidates(spark, path, stream, nProbe)
    val top = cand0.as[AdcHit].groupByKey(_.q_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[AdcHit], _: GroupState[Boolean]) =>
          topBy(rows, rescoreK)(h => (-h.qscore, h.vec_id)).iterator
      }
    val rescored = top.toDF()
      .join(cells.select(col("cell"), col("vec_id"), col("embedding")),
        Seq("cell", "vec_id"))
      .withColumn("cos", Registry.cosineSim(col("q_emb"), col("embedding")))
      .select(col("q_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)]
    rescored.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Long, Double)],
         _: GroupState[Boolean]) =>
          topBy(rows, k)(t => (cosKey(t._3), t._2)).zipWithIndex.map {
            case ((_, vid, cos), i) => Neighbor(qid, i + 1, vid, cos)
          }.iterator
      }
  }

  /** Descending-cosine sort key matching Spark's `desc("cos")`
    * ordering rules exactly on the degenerate doubles: Spark orders
    * NaN ABOVE every double, so a NaN cosine (a zero-norm embedding —
    * 0/0) ranks FIRST in the batch window cut — plain negation would
    * invert that (−NaN is still NaN, the worst key in an ascending
    * heap); and Spark treats −0.0 == +0.0 (falling through to the
    * vec_id tie-break) while Double.compare separates them — so both
    * zeros collapse to one key. */
  private def cosKey(cos: Double): Double =
    if (cos.isNaN) Double.NegativeInfinity
    else if (cos == 0.0) 0.0 // collapse ±0.0 to the tie-break, like Spark
    else -cos

  /** The `n` smallest rows by `key` in `key` order — a bounded heap
    * (O(rows·log n) time, O(n) memory), the streaming stand-in for
    * `row_number() <= n`. Effectively-unbounded cuts fall back to a
    * plain sort, which is what an unbounded heap degenerates to
    * anyway. */
  private def topBy[T, K](rows: Iterator[T], n: Int)(key: T => K)(
      implicit ord: Ordering[K]): Vector[T] = {
    if (n >= Int.MaxValue / 2) return rows.toVector.sortBy(key)
    val pq = scala.collection.mutable.PriorityQueue.empty[T](Ordering.by(key))
    rows.foreach { r =>
      if (pq.size < n) pq.enqueue(r)
      else if (ord.lt(key(r), key(pq.head))) { pq.dequeue(); pq.enqueue(r) }
    }
    pq.toVector.sortBy(key)
  }
}
