package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Similarity

/** Streaming PQ-IVF enrichment vs its batch twin: the stream-static
  * form must reproduce [[Similarity.pqIvfSearch]]'s results row for
  * row on the same arrivals — same probe selection, ADC scores,
  * rescore, ranks and tie-breaks — and leave no streaming state
  * behind (the shells are stateless by construction).
  */
case class VecRow(vec_id: Long, embedding: Seq[Float])

class VectorStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runStream(path: String, queries: Seq[Seq[VecRow]], k: Int,
                        nProbe: Int, rescoreK: Int): (Seq[Seq[Any]], Long) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[VecRow]
    val name = s"vecstream_${System.nanoTime()}"
    val q = VectorStreams.pqIvfEnrich(input.toDF(), path, k, nProbe, rescoreK)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      queries.foreach { t => input.addData(t: _*); q.processAllAvailable() }
      val rows = spark.table(name)
        .orderBy(col("q_id"), col("rank"))
        .collect().map(_.toSeq).toSeq
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      (rows, stateRows)
    } finally q.stop()
  }

  test("streaming enrichment equals batch pqIvfSearch on the same arrivals; shells keep zero state") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val resident = emb.where(col("vec_id") % 7 =!= 0)
    val arriving = emb.where(col("vec_id") % 7 === 0)
      .as[VecRow].collect().toSeq
    assert(arriving.nonEmpty)
    val path = java.nio.file.Files.createTempDirectory("pqivf_stream").toString
    val nCells = 8
    Similarity.savePqIvf(resident, nCentroids = nCells, m = 8, kCode = 16, path)
    // two triggers: the enrichment is per-arrival, so the split must
    // not matter
    val (streamed, stateRows) = runStream(path,
      Seq(arriving.take(arriving.size / 2), arriving.drop(arriving.size / 2)),
      k = 5, nProbe = 3, rescoreK = 20)
    val batch = Similarity.pqIvfSearch(spark, path,
        arriving.toDF(), k = 5, nProbe = 3, rescoreK = 20)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
    assert(streamed.nonEmpty)
    // the group shells never write state: arrivals are enriched and
    // forgotten — the stream-static join is the whole memory story
    assert(stateRows === 0L, s"expected stateless shells, got $stateRows rows")
  }

  test("streaming enrichment, exhaustive configuration: equals brute force over the index") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val resident = emb.where(col("vec_id") % 7 =!= 0)
    val arriving = emb.where(col("vec_id") % 7 === 0).as[VecRow].collect().toSeq
    val path = java.nio.file.Files.createTempDirectory("pqivf_stream2").toString
    val nCells = 8
    Similarity.savePqIvf(resident, nCentroids = nCells, m = 8, kCode = 16, path)
    val (streamed, _) = runStream(path, Seq(arriving), k = 5,
      nProbe = nCells, rescoreK = Int.MaxValue)
    // every cell probed + unbounded rescore ⇒ the exact pass owns the
    // ranking; batch pqIvfSearch in this configuration is already
    // pinned equal to brute force (TrainedIvfSpec), so equality here
    // chains the streamed result to brute-force exactness too
    val exhaustive = Similarity.pqIvfSearch(spark, path,
        arriving.toDF(), k = 5, nProbe = nCells, rescoreK = Int.MaxValue)
      .collect().map(_.toSeq).toSeq
    assert(streamed === exhaustive)
    assert(streamed.nonEmpty)
  }

  test("degenerate zero-norm embeddings: NaN cosines rank identically to the batch window cut") {
    // a zero vector's cosine is 0/0 = NaN; Spark's desc() puts NaN
    // FIRST, and the streaming heap key must mirror that exactly
    val zero = Seq.fill(64)(0f)
    val resident = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
      .where(col("vec_id") % 7 =!= 0)
      .unionByName(Seq((900001L, zero.toSeq)).toDF("vec_id", "embedding"))
    val arriving = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
      .where(col("vec_id") % 7 === 0).as[VecRow].collect().toSeq :+
      VecRow(900002L, zero)
    val path = java.nio.file.Files.createTempDirectory("pqivf_nan").toString
    Similarity.savePqIvf(resident, nCentroids = 8, m = 8, kCode = 16, path)
    val (streamed, _) = runStream(path, Seq(arriving), k = 5,
      nProbe = 8, rescoreK = Int.MaxValue)
    val batch = Similarity.pqIvfSearch(spark, path, arriving.toDF(),
        k = 5, nProbe = 8, rescoreK = Int.MaxValue)
      .collect().map(_.toSeq).toSeq
    // NaN != NaN under Seq equality — compare doubles by bit pattern
    def norm(rows: Seq[Seq[Any]]) = rows.map(_.map {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    })
    assert(norm(streamed) === norm(batch))
    // the degenerate rows actually exercised the NaN path
    assert(batch.exists(r => r(3).asInstanceOf[Double].isNaN))
  }

  private def runTripletStream(path: String, arrivals: Seq[Seq[VecRow]],
                               posMin: Double, negMax: Double)
      : (Seq[Seq[Any]], Long) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[VecRow]
    val name = s"tripstream_${System.nanoTime()}"
    val q = VectorStreams.tripletEnrich(input.toDF(), path, posMin, negMax)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      arrivals.foreach { t => input.addData(t: _*); q.processAllAvailable() }
      val rows = spark.table(name).orderBy(col("anchor_id"))
        .collect().map(_.toSeq).toSeq
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      (rows, stateRows)
    } finally q.stop()
  }

  test("continuous triplet mining equals the batch miner on the same arrivals; shells keep zero state") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val resident = emb.where(col("vec_id") % 7 =!= 0)
    val arriving = emb.where(col("vec_id") % 7 === 0).as[VecRow].collect().toSeq
    assert(arriving.nonEmpty)
    val path = java.nio.file.Files.createTempDirectory("ivf_trip").toString
    val (index, assigned) = Similarity.buildIvfTrained(resident, k = 8)
    Similarity.saveIvf(index, assigned, path)
    // thresholds chosen so real corpus cosines populate BOTH sides
    val (streamed, stateRows) = runTripletStream(path,
      Seq(arriving.take(arriving.size / 2), arriving.drop(arriving.size / 2)),
      posMin = 0.2, negMax = 0.2)
    val batch = Similarity.mineTripletsAgainstIvf(spark, path,
        arriving.toDF(), posMin = 0.2, negMax = 0.2)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
    assert(streamed.nonEmpty)
    assert(stateRows === 0L, s"expected stateless shells, got $stateRows rows")
  }

  test("continuous triplet mining: zero-norm NaN arrivals pick identically to the batch struct-max") {
    val zero = Seq.fill(64)(0f)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val resident = emb.where(col("vec_id") % 7 =!= 0)
    val arriving = emb.where(col("vec_id") % 7 === 0)
      .as[VecRow].collect().toSeq :+ VecRow(900002L, zero)
    val path = java.nio.file.Files.createTempDirectory("ivf_trip_nan").toString
    val (index, assigned) = Similarity.buildIvfTrained(resident, k = 8)
    Similarity.saveIvf(index, assigned, path)
    val (streamed, _) = runTripletStream(path, Seq(arriving),
      posMin = 0.2, negMax = 0.2)
    val batch = Similarity.mineTripletsAgainstIvf(spark, path,
        arriving.toDF(), posMin = 0.2, negMax = 0.2)
      .collect().map(_.toSeq).toSeq
    def norm(rows: Seq[Seq[Any]]) = rows.map(_.map {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    })
    assert(norm(streamed) === norm(batch))
    // the NaN anchor's every cosine is 0/0 = NaN: under SQL ordering it
    // passes `>= posMin` (NaN ranks top) but can never pass `< negMax`,
    // so the anchor must drop — on BOTH engines identically. A Java-
    // ordered fold would instead fail the pos side too; same drop, but
    // for the wrong reason, and a mixed-NaN cell would then diverge —
    // the parity above is what pins the ordering.
    assert(!batch.exists(_.head == 900002L))
    assert(!streamed.exists(_.head == 900002L))
    assert(streamed.nonEmpty)
  }

  test("continuous margin mining equals batch marginAgainstIvf on the same arrivals; shells keep zero state") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    // corpus = the resident index (even sources feed yden, odd rows are
    // the stored targets); arrivals = fresh source vectors with ids
    // disjoint from the stored targets
    val resident = emb.where(col("vec_id") % 7 =!= 0)
    val (index, assigned) = Similarity.buildIvfTrained(resident, k = 8)
    val path = java.nio.file.Files.createTempDirectory("margin_stream").toString
    Similarity.saveMarginIndex(index, assigned.localCheckpoint(), k = 3, path)
    val arriving = emb.where(col("vec_id") % 7 === 0)
      .as[VecRow].collect().toSeq
    assert(arriving.nonEmpty)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[VecRow]
    val name = s"marginstream_${System.nanoTime()}"
    val q = VectorStreams.marginEnrich(input.toDF(), path, minMargin = 0.8)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val (streamed, stateRows) =
      try {
        input.addData(arriving.take(arriving.size / 2): _*)
        q.processAllAvailable()
        input.addData(arriving.drop(arriving.size / 2): _*)
        q.processAllAvailable()
        (spark.table(name).orderBy(col("src_id")).collect().map(_.toSeq).toSeq,
          Option(q.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L))
      } finally q.stop()
    val batch = Similarity.marginAgainstIvf(spark, path,
        arriving.toDF(), minMargin = 0.8)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
    assert(streamed.nonEmpty)
    assert(stateRows === 0L, s"expected stateless shells, got $stateRows rows")
  }
}
