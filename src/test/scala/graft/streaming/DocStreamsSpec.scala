package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Streaming near-dup dedup vs its batch twin: the continuous form
  * must agree with d14's incremental-dedup verdicts on the same
  * corpus/batch split, and the online bucket cap must both bound state
  * and stop producing from closed buckets.
  */
case class StreamDoc(doc_id: Long, text: String)
case class EvStreamDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

class DocStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Doc = StreamDoc
  private def Doc(id: Long, text: String) = StreamDoc(id, text)

  private def runWith(op: org.apache.spark.sql.DataFrame =>
                          org.apache.spark.sql.Dataset[DocStreams.NearDupMatch],
                      triggers: Seq[Seq[Doc]]): Seq[DocStreams.NearDupMatch] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val name = s"docstream_out_${System.nanoTime()}"
    val q = op(input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      triggers.foreach { t => input.addData(t: _*); q.processAllAvailable() }
      spark.table(name).as[DocStreams.NearDupMatch].collect().toSeq
    } finally q.stop()
  }

  private def run(triggers: Seq[Seq[Doc]], threshold: Double,
                  maxBucket: Int): Seq[DocStreams.NearDupMatch] =
    runWith(DocStreams.streamingLshDedup(_, k = 3, bands = 8,
      rowsPerBand = 4, threshold = threshold, maxBucket = maxBucket), triggers)

  test("streaming matches equal the batch incremental-dedup verdicts (corpus trigger, then batch trigger)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).as[Doc].collect().toSeq
    val corpus = docs.filter(_.doc_id % 11 != 0)
    val batch = docs.filter(_.doc_id % 11 == 0)
    val corpusIds = corpus.map(_.doc_id).toSet
    val got = run(Seq(corpus, batch), threshold = 0.05,
      maxBucket = Int.MaxValue)
      // the streaming query also surfaces corpus-internal and
      // batch-internal matches (every arrival is a future resident);
      // the batch twin scores batch-vs-corpus only — compare that slice
      .filter(m => m.doc_id % 11 == 0 && corpusIds(m.match_id))
      .groupBy(_.doc_id)
      .map { case (id, ms) => id -> ((ms.size.toLong, ms.map(_.match_id).min)) }
    val expected = graft.operators.Dedup.incrementalLshDedup(
        corpus.toDF(), batch.toDF(), k = 3, bands = 8, rowsPerBand = 4,
        threshold = 0.05)
      .where(col("is_dup")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty) // the split must actually contain dups
  }

  test("online bucket cap: matches stop once a bucket closes; closed state is dropped") {
    // ten identical docs: every band bucket fills in arrival (doc_id)
    // order — with cap 3 the 4th arrival still verifies against the 3
    // residents, then the bucket closes; docs 5..10 produce nothing
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (1L to 10L).map(Doc(_, text))
    val got = run(Seq(docs), threshold = 0.5, maxBucket = 3)
      .map(m => (m.doc_id, m.match_id)).toSet
    val expected = Set(
      (2L, 1L), (3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L), (4L, 3L))
    assert(got === expected)
  }

  test("streaming near-dup under the RocksDB state store: identical matches (bucket state lives off-heap)") {
    // the production state-store for corpus-sized residency: membership
    // (shingle sets per bucket) goes to local disk instead of the
    // executor heap; the query semantics must not move at all
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (1L to 10L).map(Doc(_, text))
    val expected = Set(
      (2L, 1L), (3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L), (4L, 3L))
    val got = EventStreams.withRocksDbStateStore(spark) {
      run(Seq(docs), threshold = 0.5, maxBucket = 3)
        .map(m => (m.doc_id, m.match_id)).toSet
    }
    assert(got === expected)
  }

  test("sig-only lean-state variant: verdicts equal a driver-side replay of the signature-agreement rule") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).as[Doc].collect().toSeq
    val corpus = docs.filter(_.doc_id % 11 != 0)
    val batch = docs.filter(_.doc_id % 11 == 0)
    val thr = 0.25
    val got = runWith(DocStreams.streamingLshDedupSigOnly(_, k = 3,
        bands = 8, rowsPerBand = 4, threshold = thr,
        maxBucket = Int.MaxValue), Seq(corpus, batch))
      .map(m => (m.doc_id, m.match_id) -> m.jaccard).toMap
    // driver replay of the whole rule: same signatures/banding (read
    // off the batch operators), arrival order = (trigger, doc_id),
    // score = fraction of equal signature components
    val allDf = docs.toDF()
    val sigDf = graft.operators.Dedup.minhashSignatures(allDf, 3, 32)
    val sigs = sigDf.select(col("doc_id"), col("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val bandRows = graft.operators.Dedup.bandedFrame(sigDf, 8, 4)
      .select(col("doc_id"), col("band"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def arrival(id: Long) = (if (id % 11 == 0) 1 else 0, id)
    val expected = bandRows.groupBy(t => (t._2, t._3)).values.flatMap { grp =>
      val ms = grp.map(_._1).distinct.sortBy(arrival)
      for {
        i <- ms.indices; j <- 0 until i
        (a, b) = (sigs(ms(i)), sigs(ms(j)))
        agree = a.zip(b).count(p => p._1 == p._2).toDouble / a.size
        if agree >= thr
      } yield (ms(i), ms(j)) -> agree
    }.toMap
    assert(expected.nonEmpty, "fixture must produce sig-agreement matches")
    assert(got === expected)
  }

  test("same-trigger hot-bucket flood: bounded buffer keeps the exact capped semantics") {
    // 3000 identical docs arrive in ONE trigger; with cap 3 only the 4
    // smallest doc_ids are ever processed (the 4th closes the bucket),
    // so the bounded bottom-k buffer must reproduce exactly the small
    // fixture's match set — and do it in O(cap), not O(flood), memory
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = scala.util.Random.shuffle((1L to 3000L).toList).map(Doc(_, text))
    val got = run(Seq(docs), threshold = 0.5, maxBucket = 3)
      .map(m => (m.doc_id, m.match_id)).toSet
    assert(got === Set(
      (2L, 1L), (3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L), (4L, 3L)))
  }

  test("at-least-once replay: a resident's re-arrival cannot displace a new doc from the bounded admission buffer") {
    // bucket holds residents 1,2 (cap 3, admit = 2 slots). The next
    // trigger replays BOTH residents plus new docs 10 and 11: before
    // the fix the replayed ids (smallest doc_ids) filled the buffer and
    // 10/11 were never scored; resident-filtered admission must score
    // them and close the bucket after the 4th member
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val got = run(Seq(
        Seq(Doc(1L, text), Doc(2L, text)),
        Seq(Doc(1L, text), Doc(2L, text), Doc(10L, text), Doc(11L, text))),
      threshold = 0.5, maxBucket = 3)
      .map(m => (m.doc_id, m.match_id)).toSet
    assert(got === Set(
      (2L, 1L), (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (11L, 10L)))
  }

  // The eviction tests drive the horizon on EVENT time: each trigger's
  // docs carry a synthetic timestamp, the watermark advances with the
  // data, and retirement is a pure function of the data — no sleeps,
  // no wall-clock flake. (Processing-time timeouts were rejected in
  // the operator itself: they busy-loop no-data micro-batches and
  // never signal no-new-data, hanging processAllAvailable.)
  private def evDocs(docs: Seq[Doc], tsMs: Long): Seq[EvStreamDoc] =
    docs.map(d => EvStreamDoc(d.doc_id, d.text,
      new java.sql.Timestamp(tsMs)))

  test("state horizon: cold buckets retire, total state rows plateau over a long distinct-content stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // 6 triggers of fully-distinct content, 10 s of event time apart,
    // horizon 5 s; without eviction the (band, bucket) key space grows
    // ~linearly with triggers — with the horizon shorter than the
    // inter-trigger gap, each trigger's batch retires the previous
    // triggers' buckets and the resident row count plateaus
    def trigger(t: Int): Seq[EvStreamDoc] = (0 until 200).map { i =>
      EvStreamDoc(t * 1000L + i,
        s"doc t$t i$i " + (1 to 8).map(w => s"w${t}_${i}_$w").mkString(" "),
        new java.sql.Timestamp(t * 10000L))
    }
    // the evicting query runs on its own derived session: the two
    // eviction confs never leak to queries other threads may start
    val es = DocStreams.evictionSession(spark)
    implicit val esCtx: org.apache.spark.sql.SQLContext = es.sqlContext
    val input = MemoryStream[EvStreamDoc]
    val q = DocStreams.streamingLshDedup(input.toDF(), k = 3, bands = 8,
        rowsPerBand = 4, threshold = 0.5, maxBucket = 8,
        eviction = Some(DocStreams.EvictionHorizon("ts", horizonMs = 5000L)))
      .writeStream.format("memory")
      .queryName(s"docstream_evict_${System.nanoTime()}")
      .outputMode("append").start()
    try {
      val totals = (1 to 6).map { t =>
        input.addData(trigger(t): _*); q.processAllAvailable()
        q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      }
      // each trigger's ~1600 band rows are new keys; eviction retires
      // the previous triggers' (deadline t·10s+5s < the next trigger's
      // watermark), so the total stays near one trigger's worth
      // instead of accreting all six
      assert(totals.last < totals.head * 3,
        s"state should plateau under eviction: $totals")
      assert(totals.head > 0, s"state metrics must be visible: $totals")
    } finally q.stop()
  }

  test("state horizon: in-horizon duplicates still match; streaming equals batch verdicts within the window") {
    // generous horizon (1 h of event time over a 1 s spread): nothing
    // retires, so the evicting variant must agree exactly with the
    // batch twin
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).as[Doc].collect().toSeq
    val corpus = docs.filter(_.doc_id % 11 != 0)
    val batch = docs.filter(_.doc_id % 11 == 0)
    val corpusIds = corpus.map(_.doc_id).toSet
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val es = DocStreams.evictionSession(spark)
    implicit val esCtx: org.apache.spark.sql.SQLContext = es.sqlContext
    val input = MemoryStream[EvStreamDoc]
    val name = s"docstream_inhorizon_${System.nanoTime()}"
    val q = DocStreams.streamingLshDedup(input.toDF(), k = 3, bands = 8,
        rowsPerBand = 4, threshold = 0.05, maxBucket = Int.MaxValue,
        eviction = Some(DocStreams.EvictionHorizon("ts", horizonMs = 3600000L)))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val got = try {
      Seq(evDocs(corpus, 1000L), evDocs(batch, 2000L)).foreach { t =>
        input.addData(t: _*); q.processAllAvailable()
      }
      // the memory sink's temp view lives in the session that started
      // the query
      es.table(name).as[DocStreams.NearDupMatch].collect().toSeq
    } finally q.stop()
    val filtered = got
      .filter(m => m.doc_id % 11 == 0 && corpusIds(m.match_id))
      .groupBy(_.doc_id)
      .map { case (id, ms) => id -> ((ms.size.toLong, ms.map(_.match_id).min)) }
    val expected = graft.operators.Dedup.incrementalLshDedup(
        corpus.toDF(), batch.toDF(), k = 3, bands = 8, rowsPerBand = 4,
        threshold = 0.05)
      .where(col("is_dup")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(expected.nonEmpty)
    assert(filtered === expected)
  }

  test("state horizon: the sig-only lean-state variant evicts through the same shared core") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val es = DocStreams.evictionSession(spark)
    implicit val esCtx: org.apache.spark.sql.SQLContext = es.sqlContext
    // in-horizon: generous horizon ⇒ verdicts equal the NoTimeout twin
    // on identical triggers (the eviction plumbing must be invisible
    // inside the window); and a distinct-content stream's state still
    // plateaus — the core is shared, both variants inherit both halves
    def trigger(t: Int): Seq[EvStreamDoc] = (0 until 120).map { i =>
      EvStreamDoc(t * 1000L + i,
        s"doc t$t i$i " + (1 to 8).map(w => s"w${t}_${i}_$w").mkString(" "),
        new java.sql.Timestamp(t * 10000L))
    }
    val dupA = EvStreamDoc(900001L,
      "alpha beta gamma delta epsilon zeta eta theta", new java.sql.Timestamp(10000L))
    val dupB = EvStreamDoc(900002L,
      "alpha beta gamma delta epsilon zeta eta iota", new java.sql.Timestamp(20000L))
    val input = MemoryStream[EvStreamDoc]
    val q = DocStreams.streamingLshDedupSigOnly(input.toDF(), k = 3, bands = 8,
        rowsPerBand = 4, threshold = 0.25, maxBucket = 8,
        eviction = Some(DocStreams.EvictionHorizon("ts", horizonMs = 5000L)))
      .writeStream.format("memory")
      .queryName(s"docstream_sig_evict_${System.nanoTime()}")
      .outputMode("append").start()
    val totals = try {
      (1 to 5).map { t =>
        val extra = if (t == 1) Seq(dupA) else if (t == 2) Seq(dupB) else Nil
        input.addData(trigger(t) ++ extra: _*); q.processAllAvailable()
        q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      }
    } finally q.stop()
    assert(totals.last < totals.head * 3,
      s"sig-only state should plateau under eviction: $totals")
    // retirement happens when the WATERMARK passes deadline: trigger 2
    // processes under trigger 1's watermark (10s < the 15s deadline),
    // so the trigger-1 resident is still live when its near-dup
    // arrives — the match must emit even though wall-of-data distance
    // exceeds the horizon; only buckets silent past the watermark
    // clock retire (the plateau above)
    val matched = es.table(q.name).as[DocStreams.NearDupMatch].collect()
      .exists(m => m.doc_id == 900002L && m.match_id == 900001L)
    assert(matched, "next-trigger near-dup must match before retirement fires")
  }

  test("cross-trigger residency: a later arrival matches an earlier trigger's resident") {
    val a = Doc(1L, "one two three four five six seven eight")
    val b = Doc(2L, "one two three four five six seven nine")
    val got = run(Seq(Seq(a), Seq(b)), threshold = 0.3,
      maxBucket = Int.MaxValue)
    assert(got.map(m => (m.doc_id, m.match_id)) === Seq((2L, 1L)))
    assert(got.head.jaccard > 0.3)
  }
}
