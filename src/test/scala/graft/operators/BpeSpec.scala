package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The distributed BPE merge loop vs an independent sequential
  * reference run on the same (collected) token sequences: merges,
  * counts, and the post-merge corpus must agree exactly.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Sequential reference: same argmax total order (count desc, then
    * (a, b) lexicographic) and the same greedy left-to-right
    * non-overlapping merge. */
  private def seqTrain(docs0: Map[Long, Vector[String]], nMerges: Int)
      : (Seq[(String, String, Long)], Map[Long, Vector[String]]) = {
    var docs = docs0
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 0 until nMerges if !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      docs.values.foreach(_.sliding(2).foreach {
        case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _ =>
      })
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((a, b, n))
        val m = a + " " + b
        docs = docs.view.mapValues(_.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ m
          else acc :+ x
        }).toMap
      }
    }
    (merges.result(), docs)
  }

  test("distributed merge loop equals the sequential reference exactly") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .where(pmod(col("doc_id"), lit(5)) === 0)
    val (merges, syms) = Bpe.train(docs, nMerges = 5)
    try {
      // ground truth starts from the SAME tokenization (collected from
      // the untrained frame), so only the loop logic is under test
      val initial = docs
        .select(col("doc_id"), TextAnalysis.toks(col("text")).as("syms"))
        .as[(Long, Vector[String])].collect().toMap
      val (refMerges, refDocs) = seqTrain(initial, nMerges = 5)
      assert(merges.map(m => (m.a, m.b, m.n)) === refMerges)
      val got = syms.as[(Long, Vector[String])].collect().toMap
      assert(got === refDocs)
      // merged symbols really appear in the final vocabulary
      val vocab = Bpe.vocab(syms).as[(String, Long)].collect().toMap
      merges.headOption.foreach(m =>
        assert(vocab.contains(m.a + " " + m.b), s"vocab missing ${m.a} ${m.b}"))
    } finally syms.unpersist()
  }

  test("encode with the learned merges reproduces the trainer's final corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .where(pmod(col("doc_id"), lit(7)) === 0)
    val (merges, syms) = Bpe.train(docs, nMerges = 4)
    try {
      val trained = syms.as[(Long, Vector[String])].collect().toMap
      val encoded = Bpe.encode(docs, merges)
        .as[(Long, Vector[String])].collect().toMap
      assert(encoded === trained)
      // and encoding UNSEEN text applies the same merges
      val fresh = Seq((999L, merges.head.a + " " + merges.head.b + " zzz_unseen"))
        .toDF("doc_id", "text")
      val enc = Bpe.encode(fresh, merges)
        .as[(Long, Vector[String])].collect().head._2
      assert(enc.head === merges.head.a + " " + merges.head.b, enc)
    } finally syms.unpersist()
  }

  private def countJobs(group: String)(body: => Unit): Int = {
    spark.sparkContext.setJobGroup(group, group)
    try body finally spark.sparkContext.clearJobGroup()
    // the status tracker is fed asynchronously — poll until the count
    // stabilizes instead of trusting one fixed sleep
    def count() = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    var (prev, cur, waited) = (-1, count(), 0)
    while (cur != prev && waited < 5000) {
      Thread.sleep(200); waited += 200
      prev = cur; cur = count()
    }
    cur
  }

  test("batched trainer: valid BPE merge sequence (every count true at application time), >=10x fewer Spark jobs") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .where(pmod(col("doc_id"), lit(3)) === 0)
    var seq: (Seq[Bpe.Merge], org.apache.spark.sql.DataFrame) = null
    var bat: (Seq[Bpe.Merge], org.apache.spark.sql.DataFrame) = null
    val seqJobs = countJobs("bpe_seq") { seq = Bpe.train(docs, nMerges = 40) }
    val batJobs = countJobs("bpe_bat") { bat = Bpe.trainBatched(docs, nMerges = 40) }
    try {
      // every round's FIRST pick is the global argmax — provably the
      // same pair the per-merge loop takes
      assert(bat._1.head === seq._1.head)
      assert(bat._1.size === 40)
      // replay validity: disjoint batching promises each recorded count
      // is the TRUE pair count at the moment the merge applies (stale
      // counts are exactly what the disjointness + halving rules
      // exclude) — replay the sequence with exact recounting and check
      var corpus = docs
        .select(col("doc_id"), TextAnalysis.toks(col("text")).as("syms"))
        .as[(Long, Vector[String])].collect().toMap
      bat._1.foreach { m =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        corpus.values.foreach(_.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ =>
        })
        assert(counts.getOrElse((m.a, m.b), 0L) === m.n,
          s"stale count recorded for $m")
        val mm = m.a + " " + m.b
        corpus = corpus.view.mapValues(_.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == m.a && x == m.b) acc.init :+ mm
          else acc :+ x
        }).toMap
      }
      // the replayed corpus is exactly the trainer's final corpus
      assert(bat._2.as[(Long, Vector[String])].collect().toMap === corpus)
      assert(seqJobs >= 10 * batJobs,
        s"jobs: per-merge=$seqJobs batched=$batJobs — batching lost its point")
    } finally { seq._2.unpersist(); bat._2.unpersist() }
  }

  test("sampled trainer: merges identical to the distributed reference, >=10x fewer Spark jobs") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .where(pmod(col("doc_id"), lit(7)) === 0)
    var ref: (Seq[Bpe.Merge], org.apache.spark.sql.DataFrame) = null
    var sampled: Seq[Bpe.Merge] = null
    val refJobs = countJobs("bpe_ref") { ref = Bpe.train(docs, nMerges = 6) }
    val samJobs = countJobs("bpe_sam") {
      sampled = Bpe.trainSampled(docs, nMerges = 6, sampleMod = 1)
    }
    try {
      assert(sampled === ref._1)
      assert(refJobs >= 10 * samJobs,
        s"jobs: distributed=$refJobs sampled=$samJobs")
      // encode with sampled merges is the fully-distributed path
      val enc = Bpe.encode(docs, sampled).as[(Long, Vector[String])].collect().toMap
      assert(enc === ref._2.as[(Long, Vector[String])].collect().toMap)
    } finally ref._2.unpersist()
  }

  test("property: batched replay validity holds on random overlap-heavy corpora, and encode reproduces the trainer") {
    // tiny vocabulary forces heavy pair overlap — the regime where the
    // disjointness/halving reasoning earns its keep. The invariant is
    // UNIVERSAL (disjoint accepted pairs cannot perturb each other's
    // counts), so any seed failing here is a real trainer bug.
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 30).map { i =>
        (i.toLong, (0 until 15).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }.toDF("doc_id", "text")
      val (merges, syms) = Bpe.trainBatched(docs, nMerges = 8, batchCap = 4)
      try {
        var corpus = docs
          .select(col("doc_id"), TextAnalysis.toks(col("text")).as("syms"))
          .as[(Long, Vector[String])].collect().toMap
        merges.foreach { m =>
          val counts = scala.collection.mutable.Map[(String, String), Long]()
          corpus.values.foreach(_.sliding(2).foreach {
            case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
            case _ =>
          })
          assert(counts.getOrElse((m.a, m.b), 0L) === m.n,
            s"seed $seed: stale count recorded for $m")
          val mm = m.a + " " + m.b
          corpus = corpus.view.mapValues(_.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == m.a && x == m.b) acc.init :+ mm
            else acc :+ x
          }).toMap
        }
        assert(syms.as[(Long, Vector[String])].collect().toMap === corpus,
          s"seed $seed: trainer corpus != replay")
        // encode(learned merges) over the raw docs = the trainer's corpus
        val enc = Bpe.encode(docs, merges)
          .as[(Long, Vector[String])].collect().toMap
        assert(enc === corpus, s"seed $seed: encode != trainer corpus")
      } finally syms.unpersist()
    }
  }

  test("merge counts are non-increasing and early-exhaustion stops cleanly") {
    val tiny = Seq((1L, "x y x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val (merges, syms) = Bpe.train(tiny, nMerges = 50)
    try {
      // round 1 must pick (x, y) with count 4; the loop must stop on its
      // own well before 50 rounds once no pair repeats
      assert(merges.head.a === "x" && merges.head.b === "y" && merges.head.n === 4L)
      assert(merges.map(_.n) === merges.map(_.n).sorted.reverse)
      assert(merges.size < 50)
    } finally syms.unpersist()
  }
}
