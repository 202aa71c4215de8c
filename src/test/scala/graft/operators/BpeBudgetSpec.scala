package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** BPE-true token budgets (s24): (1) the gaps-and-islands parity rule
  * the SQL oracle uses for one merge application is equivalent to the
  * sequential greedy left-to-right fold ([[Bpe.encode]]'s semantics) —
  * replayed position by position over adversarial and randomized
  * sequences, including chained merges whose pairs involve earlier
  * products; (2) BPE counts diverge from whitespace counts exactly on
  * repetitive text (fertility), which MOVES token-budget shard
  * boundaries — the mis-sizing s24 exists to fix.
  */
class BpeBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The reference semantics: greedy left-to-right non-overlapping
    * merge with an evolving accumulator (Bpe.mergeColumn / encode). */
  private def foldMerge(toks: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    toks.foreach { x =>
      if (out.nonEmpty && out.last == a && x == b)
        out(out.length - 1) = a + " " + b
      else out += x
    }
    out.toSeq
  }

  /** The SQL twin's rule (Bpe.trainEncodeSql): mark candidate positions
    * on the ROUND INPUT, group consecutive candidates into islands,
    * merge the odd-indexed candidate of each island, drop the consumed
    * successor. */
  private def parityMerge(toks: Seq[String], a: String, b: String): Seq[String] = {
    val n = toks.length
    val cand = Array.tabulate(n)(i =>
      i < n - 1 && toks(i) == a && toks(i + 1) == b)
    val sel = Array.fill(n)(false)
    var i = 0
    while (i < n) {
      if (cand(i)) {
        var j = i; var idx = 0
        while (j < n && cand(j)) { sel(j) = idx % 2 == 0; idx += 1; j += 1 }
        i = j
      } else i += 1
    }
    val out = Seq.newBuilder[String]
    var k = 0
    while (k < n) {
      if (sel(k)) { out += a + " " + b; k += 2 } else { out += toks(k); k += 1 }
    }
    out.result()
  }

  test("parity rule == greedy fold on the documented adversarial shapes") {
    val cases = Seq(
      (Seq("a", "a", "b"), ("a", "b")),           // second a merges
      (Seq("a", "a", "a"), ("a", "a")),           // one merge, tail a
      (Seq("a", "a", "a", "a"), ("a", "a")),      // two merges
      (Seq("a", "b", "a", "b"), ("a", "b")),      // both merge
      (Seq("a", "b", "b", "b"), ("b", "b")),      // run after non-run
      (Seq("b", "a", "a", "a", "c"), ("a", "a")), // interior run
      (Seq.empty[String], ("a", "b")),
      (Seq("a"), ("a", "a")))
    cases.foreach { case (toks, (a, b)) =>
      assert(parityMerge(toks, a, b) === foldMerge(toks, a, b),
        s"input=$toks pair=($a,$b)")
    }
  }

  test("parity rule == greedy fold over randomized multi-round merge chains") {
    val rnd = new scala.util.Random(13)
    (1 to 400).foreach { caseIdx =>
      var toksF = Seq.fill(rnd.nextInt(14))(Seq("a", "b", "c")(rnd.nextInt(3)))
      var toksP = toksF
      // three chained rounds; later pairs may involve earlier products,
      // exactly like a learned merge table
      (1 to 3).foreach { _ =>
        val vocab = (toksF ++ Seq("a", "b")).distinct
        val (a, b) = (vocab(rnd.nextInt(vocab.size)), vocab(rnd.nextInt(vocab.size)))
        toksF = foldMerge(toksF, a, b)
        toksP = parityMerge(toksP, a, b)
        assert(toksF === toksP, s"case $caseIdx pair=($a,$b)")
      }
    }
  }

  test("parity replay of a learned merge table matches Bpe.encode") {
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "a b a b a b c c c"),
      (3L, "one two three four")).toDF("doc_id", "text")
    val (merges, syms) = Bpe.train(docs, nMerges = 4)
    syms.unpersist(blocking = false)
    val got = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      var t: Seq[String] = text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      merges.foreach(m => t = parityMerge(t, m.a, m.b))
      assert(got(id) === t, s"doc $id")
    }
  }

  test("BPE counts move shard boundaries that whitespace counts miss") {
    // doc 1 is one phrase repeated: BPE merges collapse it hard. docs
    // 2-4 are unique-token padding. Under a 16-token shard budget the
    // packing cursor falls behind the whitespace cursor, so later docs
    // land in EARLIER shards.
    val docs = Seq(
      (1L, Seq.fill(6)("the cat sat").mkString(" ")),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu nu xi omicron pi"),
      (4L, "rho sigma tau upsilon phi chi psi omega")).toDF("doc_id", "text")
    val (merges, syms) = Bpe.train(docs, nMerges = 6)
    syms.unpersist(blocking = false)
    val nBpe = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).size).toMap
    val nWs = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").length).toMap
    assert(nBpe(1L) < nWs(1L), s"repetitive doc must compress: $nBpe vs $nWs")
    // shard id = floor(preceding-cum / 16), docs packed in id order
    def shards(n: Map[Long, Int]): Map[Long, Long] = {
      var cum = 0L
      Seq(1L, 2L, 3L, 4L).map { id =>
        val s = cum / 16; cum += n(id); id -> s
      }.toMap
    }
    val (sWs, sBpe) = (shards(nWs), shards(nBpe))
    assert(sWs !== sBpe,
      s"whitespace and BPE budgets agreed on every shard: ws=$sWs bpe=$sBpe")
  }
}
