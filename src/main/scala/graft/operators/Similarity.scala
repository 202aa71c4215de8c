package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline; the
  * random-hyperplane LSH bucketed variant is the 100 TB scale path
  * (candidates only meet inside a bucket — the cross product never
  * materializes). Dot products are left-fold `aggregate` over
  * `zip_with`, which matches the left-associated unrolled `+` chain in
  * the DuckDB oracle term-for-term in IEEE order, so scores compare
  * exactly.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as an in-order left fold (IEEE-stable across engines). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column, n2a: Column, n2b: Column): Column =
    dot(a, b) / (sqrt(n2a) * sqrt(n2b))

  /** Brute-force cosine top-k: every (query ∈ sample) × (candidate).
    * Queries are broadcast; candidates stream — no shuffle until the
    * per-query top-k window. */
  def bruteForceTopK(emb: DataFrame, sampleMod: Int, k: Int): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      norm2(col("embedding")).as("n2"))
    val queries = withNorm.where(col("vec_id") % sampleMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("n2").as("q_n2"))
    val pairs = withNorm.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding"), col("q_n2"), col("n2")))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** DuckDB oracle for [[bruteForceTopK]]: unrolled 64-term dot/norm
    * chains (left-associated `+` = Spark's left fold). */
  def bruteForceTopKSql(dim: Int, sampleMod: Int, k: Int): String = {
    def n2(t: String) = (1 to dim)
      .map(i => s"CAST($t.embedding[$i] AS DOUBLE)*CAST($t.embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    val dotE = (1 to dim)
      .map(i => s"CAST(q.embedding[$i] AS DOUBLE)*CAST(c.embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    s"""WITH q AS (SELECT vec_id, embedding, ${n2("q")} AS n2
       |           FROM embeddings q WHERE vec_id % $sampleMod = 0),
       |c AS (SELECT vec_id, embedding, ${n2("c")} AS n2 FROM embeddings c),
       |pairs AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         ($dotE) / (sqrt(q.n2) * sqrt(c.n2)) AS cos
       |  FROM q JOIN c ON c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT q_id, neighbor_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY q_id
       |                            ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM pairs)
       |SELECT q_id, rank, neighbor_id, cos FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** Random-hyperplane LSH (sign sketch): `nBits` fixed deterministic
    * pseudo-hyperplanes; bucket = sign bit vector. Near-dup candidates
    * share a bucket; verification is exact cosine within bucket only.
    * This is the shape that survives 1000 executors — bucket join, no
    * cross product. */
  def lshCosinePairs(emb: DataFrame, dim: Int, nBits: Int,
                     minCos: Double): DataFrame = {
    // deterministic "random" hyperplanes from a hash of (bit, dim index)
    val planes: Seq[Seq[Double]] = (0 until nBits).map { b =>
      (0 until dim).map { d =>
        val x = (b * 1315423911L + d * 2654435761L) & 0xFFFFFFFFL
        (x.toDouble / 0xFFFFFFFFL.toDouble) * 2.0 - 1.0
      }
    }
    def sig(embCol: Column): Column =
      (0 until nBits).map { b =>
        val proj = (0 until dim).map(d =>
          element_at(embCol, d + 1).cast("double") * planes(b)(d))
          .reduce(_ + _)
        when(proj > 0, lit(1L << b)).otherwise(0L)
      }.reduce((a, c) => a.bitwiseOR(c))

    val withSig = emb.select(col("vec_id"), col("embedding"),
      norm2(col("embedding")).as("n2"), sig(col("embedding")).as("bucket"))
    withSig.as("a").join(withSig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.embedding"), col("b.embedding"),
        col("a.n2"), col("b.n2")))
      .where(col("cos") >= minCos)
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"), col("cos"))
      .orderBy(col("id1"), col("id2"))
  }
}
