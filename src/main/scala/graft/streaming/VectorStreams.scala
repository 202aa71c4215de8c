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
    * [[Similarity.pqIvfSearch]]'s ranking rules (nearest-cell probe
    * selection, fixed-point ADC, exact-cosine rescore of the ADC top
    * `rescoreK`, ties to the lowest vec_id), so the streamed verdicts
    * equal a batch search over the same arrivals row for row
    * (spec-pinned). The one mechanical difference: per-query top-k on
    * a stream cannot use a row_number window (unsupported in append
    * streams), so both cuts run as bounded heaps inside STATELESS
    * flatMapGroupsWithState shells — a query's candidates all live in
    * the micro-batch that carried the query, no state is ever written,
    * and memory per group is O(rescoreK), not O(candidates). */
  def pqIvfEnrich(stream: DataFrame, path: String, k: Int, nProbe: Int,
                  rescoreK: Int): Dataset[Neighbor] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/meta").head()
    val (m, kCode) = (meta.getInt(0), meta.getInt(1))
    val index = Similarity.IvfIndex(
      spark.read.parquet(s"$path/centroids").collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1))
    val cbFlat = typedLit(
      spark.read.parquet(s"$path/codebooks").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2)).toSeq.flatMap(_._3))
    val cells = spark.read.parquet(s"$path/cells")
    val bc = spark.sparkContext.broadcast(index)
    val qCells = stream.select(col("vec_id").as("q_id"), col("embedding"))
      .map { r =>
        val f = r.getSeq[Float](1).toArray
        (r.getLong(0), f,
          Similarity.nearestCells(bc.value, f.map(_.toDouble), nProbe).toSeq)
      }.toDF("q_id", "q_emb", "cells")
    val probes = qCells
      .withColumn("lut", Registry.pqLut(col("q_emb"), cbFlat, m, kCode))
      .select(col("q_id"), col("q_emb"), col("lut"),
        explode(col("cells")).as("cell"))
    val cand = probes
      .join(cells.select(col("cell"), col("vec_id"), col("codes")), Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("qscore", Registry.pqAdc(col("codes"), col("lut"), kCode))
      .select(col("q_id"), col("q_emb"), col("cell"), col("vec_id"),
        col("qscore"))
      .as[AdcHit]
    val top = cand.groupByKey(_.q_id)
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
          topBy(rows, k)(t => (-t._3, t._2)).zipWithIndex.map {
            case ((_, vid, cos), i) => Neighbor(qid, i + 1, vid, cos)
          }.iterator
      }
  }

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
