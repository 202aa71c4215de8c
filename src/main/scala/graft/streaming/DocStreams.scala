package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** Streaming document operators — the continuous form of the corpus
  * curation loop. The reference has no stream processing; this is the
  * d14 incremental-dedup probe re-expressed as a Structured Streaming
  * query: instead of a daily batch probing a persisted index, documents
  * arrive continuously and the LSH bucket membership IS the state.
  */
object DocStreams {

  case class BandRow(doc_id: Long, sh: Seq[Long], band: Int, bucket: Long)
  case class BucketState(members: Vector[(Long, Seq[Long])], closed: Boolean)
  case class NearDupMatch(doc_id: Long, match_id: Long, jaccard: Double)

  /** Streaming near-dup detection: each arriving document is shingled,
    * MinHash-signed and banded exactly like the batch/index paths (the
    * banding rule is shared code — [[Dedup.bandedFrame]]), then each
    * (band, bucket) group's resident members live in
    * flatMapGroupsWithState state. A new arrival is verified by EXACT
    * shingle Jaccard against its bucket's residents (the same
    * inter/(s1+s2−inter) arithmetic as the batch verification, so a
    * match here is a match there), emits every verified (doc, resident)
    * pair once (cross-band duplicates collapsed by the trailing
    * stateful dropDuplicates), and becomes a resident itself.
    *
    * `maxBucket` is the ONLINE form of d14's degenerate-bucket guard,
    * and doubles as the state bound: when a bucket's membership would
    * exceed the cap, the bucket closes — its members are dropped from
    * state and it never produces candidates again. Per-bucket state is
    * thereby bounded by `maxBucket` shingle sets, so total state grows
    * with DISTINCT content (buckets), never with a hot template's
    * repetition count. Unlike the batch guard (which replays the cap
    * over the complete corpus, dropping the whole bucket
    * retroactively), the online guard is prefix-dependent: matches
    * emitted before the bucket filled stay emitted — the unavoidable
    * difference between a replayable batch rule and an online one,
    * pinned in the spec.
    *
    * State note at 100 TB: membership stores each doc's shingle set
    * once per band (×bands memory). The RocksDB state store
    * ([[EventStreams.withRocksDbStateStore]]) keeps that on local disk;
    * a leaner production variant stores signatures only and rescores
    * against a doc store, trading a stream-static join per trigger.
    */
  def streamingLshDedup(docs: DataFrame, k: Int, bands: Int,
                        rowsPerBand: Int, threshold: Double,
                        maxBucket: Int): Dataset[NearDupMatch] = {
    import docs.sparkSession.implicits._
    val banded = Dedup.bandedFrame(
      Dedup.minhashSignatures(docs, k, bands * rowsPerBand),
      bands, rowsPerBand, carry = Seq("sh")).as[BandRow]
    statefulBucketDedup(banded, threshold, maxBucket,
      sh => { val s = sh.toSet; msh =>
        val inter = msh.count(s.contains)
        inter.toDouble / (sh.size + msh.size - inter) })
  }

  /** [[streamingLshDedup]]'s LEAN-STATE sibling: bucket residents store
    * their MinHash SIGNATURE (bands·rowsPerBand longs — a fixed ~256 B
    * per member) instead of the full shingle set, and a new arrival is
    * scored by signature AGREEMENT — the fraction of equal signature
    * components, the unbiased MinHash estimator of Jaccard similarity.
    * The trade is exactness for state size: the exact variant's
    * verdicts are true Jaccard (a match there is a match in the batch
    * d14 path bit for bit), this one's are the estimator (spec-pinned
    * against a driver-side replay of the same rule); production
    * pipelines that need exact verdicts rescore this stream's matches
    * against a doc store. `threshold` is the minimum agreement
    * fraction. */
  def streamingLshDedupSigOnly(docs: DataFrame, k: Int, bands: Int,
                               rowsPerBand: Int, threshold: Double,
                               maxBucket: Int): Dataset[NearDupMatch] = {
    import docs.sparkSession.implicits._
    val banded = Dedup.bandedFrame(
        Dedup.minhashSignatures(docs, k, bands * rowsPerBand),
        bands, rowsPerBand, carry = Seq("sig"))
      .withColumnRenamed("sig", "sh").as[BandRow]
    statefulBucketDedup(banded, threshold, maxBucket,
      sig => msh => {
        var eq = 0; var i = 0
        while (i < sig.size) { if (sig(i) == msh(i)) eq += 1; i += 1 }
        eq.toDouble / sig.size
      })
  }

  /** The shared stateful core: per-(band, bucket) residency, bounded
    * per-trigger admission, online cap; `mkScore` is applied to the
    * arrival's payload once and to each resident's payload — the exact
    * variant passes shingle-set Jaccard, the lean variant signature
    * agreement. */
  private def statefulBucketDedup(banded: Dataset[BandRow],
      threshold: Double, maxBucket: Int,
      mkScore: Seq[Long] => Seq[Long] => Double): Dataset[NearDupMatch] = {
    import banded.sparkSession.implicits._

    def fn(key: (Int, Long), rows: Iterator[BandRow],
           state: GroupState[BucketState]): Iterator[NearDupMatch] = {
      var st = state.getOption.getOrElse(BucketState(Vector.empty, closed = false))
      val out = Vector.newBuilder[NearDupMatch]
      // Processing runs in doc_id order within the trigger —
      // deterministic replay of the arrival sequence regardless of
      // shuffle partitioning. BOUNDED buffering: once the bucket has
      // admitted (maxBucket + 1) members it is closed, so only the
      // (maxBucket + 1 − |members|) smallest arriving doc_ids can ever
      // be processed — keep exactly that many (a bottom-k insertion,
      // the TopKLongPairs shape) and drain the rest of the iterator
      // untouched. A same-trigger flood of one hot template bucket
      // costs O(cap) memory here, never O(arrivals) — without this the
      // sort itself would buffer the entire flood before the cap could
      // act.
      val admit: Long =
        if (st.closed) 0L else maxBucket.toLong + 1L - st.members.size
      // tiny caps → O(cap) bottom-k insertion; effectively-unbounded
      // caps → plain sort (insertion would go quadratic, and with no
      // cap the whole trigger is processed anyway)
      val buf: Seq[BandRow] =
        if (admit <= 0) Vector.empty
        else if (admit > 4096) rows.toSeq.sortBy(_.doc_id)
        else {
          var b = Vector.empty[BandRow] // sorted by doc_id, size <= admit
          rows.foreach { r =>
            if (b.size < admit || r.doc_id < b.last.doc_id) {
              val (lo, hi) = b.span(_.doc_id < r.doc_id)
              if (!(hi.nonEmpty && hi.head.doc_id == r.doc_id)) { // in-trigger dup
                val m = (lo :+ r) ++ hi
                b = if (m.size > admit) m.take(admit.toInt) else m
              }
            }
          }
          b
        }
      buf.foreach { r =>
        if (!st.closed && !st.members.exists(_._1 == r.doc_id)) {
          val scoreAgainst = mkScore(r.sh)
          st.members.foreach { case (mid, msh) =>
            val j = scoreAgainst(msh)
            if (j >= threshold) out += NearDupMatch(r.doc_id, mid, j)
          }
          if (st.members.size + 1 > maxBucket)
            st = BucketState(Vector.empty, closed = true) // cap hit: free + close
          else st = st.copy(members = st.members :+ (r.doc_id -> r.sh))
        }
      }
      state.update(st)
      out.result().iterator
    }

    banded
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
      // a pair that cohabits several bands verifies identically in each
      // (same shingle sets → same jaccard): collapse to one emission
      .dropDuplicates("doc_id", "match_id")
      .as[NearDupMatch]
  }
}
