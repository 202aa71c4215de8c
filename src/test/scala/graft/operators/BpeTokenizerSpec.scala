package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The persisted-tokenizer lifecycle (c11): save→load→encode must
  * equal in-memory encode exactly (the artifact IS the vocabulary, the
  * same way save≡train pins the c9 LM), overwrite semantics must
  * replace rather than merge, and the SQL twin's exhaustion rule — an
  * empty-argmax round is a NO-OP, not an annihilator — must match
  * [[Bpe.train]]'s early stop (the r13 advice finding: the old CROSS
  * JOIN emptied the whole state when a round ran out of pairs).
  */
class BpeTokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("saveTokenizer/loadTokenizer round-trips merges in learned order") {
    val d = docs((1L, "a b a b c"), (2L, "a b c a b"), (3L, "b c b c"))
    val (merges, syms) = Bpe.train(d, nMerges = 3)
    syms.unpersist(blocking = false)
    assert(merges.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("bpe_tok").toString
    Bpe.saveTokenizer(spark, merges, dir)
    assert(Bpe.loadTokenizer(spark, dir) === merges)
  }

  test("save→load→encode equals in-memory encode row for row") {
    val train = docs((1L, "x y x y z"), (2L, "x y z z"), (3L, "z x y"))
    val corpus = docs((10L, "x y z x y"), (11L, "z z x y x"), (12L, "q"))
    val (merges, syms) = Bpe.train(train, nMerges = 4)
    syms.unpersist(blocking = false)
    val dir = java.nio.file.Files.createTempDirectory("bpe_tok2").toString
    Bpe.saveTokenizer(spark, merges, dir)
    val frozen = Bpe.loadTokenizer(spark, dir)
    val a = Bpe.encode(corpus, merges).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
    val b = Bpe.encode(corpus, frozen).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
    assert(a === b)
  }

  test("saveTokenizer overwrites: the second artifact fully replaces the first") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_tok3").toString
    Bpe.saveTokenizer(spark,
      Seq(Bpe.Merge("a", "b", 5L), Bpe.Merge("b", "c", 3L)), dir)
    Bpe.saveTokenizer(spark, Seq(Bpe.Merge("x", "y", 9L)), dir)
    assert(Bpe.loadTokenizer(spark, dir) === Seq(Bpe.Merge("x", "y", 9L)))
  }

  /** The SQL twin's per-round rule with an EMPTY argmax (candidate
    * flag FALSE everywhere — the LEFT JOIN ON TRUE + COALESCE(...,
    * FALSE) path): replayed in Scala the way BpeBudgetSpec replays the
    * parity rule. The no-op identity is what keeps an exhausted round
    * from annihilating the state. */
  private def emptyArgmaxRound(toks: Seq[String]): Seq[String] = {
    // cd: c = COALESCE(sym = NULL AND next = NULL, FALSE) = FALSE
    val sel = toks.map(_ => false)
    // st: no position selected, none dropped — identity up to pos
    toks.zip(sel).collect { case (t, false) => t }
  }

  test("exhausted round is a no-op, matching train's early stop") {
    // one merge exhausts this corpus: after (a,a) -> "a a", no doc has
    // any adjacent pair left... actually "a a" + b still has a pair, so
    // use single-token docs post-merge: each doc is exactly one pair
    val d = docs((1L, "a a"), (2L, "a a"), (3L, "a a"))
    val (merges, syms) = Bpe.train(d, nMerges = 5)
    val finalSyms = syms.orderBy("doc_id")
      .collect().map(_.getSeq[String](1)).toSeq
    syms.unpersist(blocking = false)
    // early stop: only one merge is learnable
    assert(merges === Seq(Bpe.Merge("a", "a", 3L)))
    assert(finalSyms === Seq(Seq("a a"), Seq("a a"), Seq("a a")))
    // the SQL's remaining rounds replay as no-ops on the merged state
    finalSyms.foreach { toks =>
      var st = toks
      (1 to 4).foreach(_ => st = emptyArgmaxRound(st))
      assert(st === toks)
    }
    // and encode under the short merge table reproduces the state
    val enc = Bpe.encode(d, merges).orderBy("doc_id")
      .collect().map(_.getSeq[String](1)).toSeq
    assert(enc === finalSyms)
  }

  test("byte mode: byteSyms is the UTF-8 hex-pair stream, multi-byte characters included") {
    assert(Bpe.byteSyms("hi") === Seq("68", "69"))
    assert(Bpe.byteSyms("über") === Seq("C3", "BC", "62", "65", "72"))
    assert(Bpe.byteSyms("") === Seq.empty)
  }

  test("byte mode: save→load→encodeBytes equals in-memory, and merges NEVER span a pre-token boundary") {
    // "ab ab ab": pair (61,62) occurs once INSIDE each word = 3x; the
    // cross-word pair (62,61) must never be counted or merged — each
    // word is its own sequence
    val train = docs((1L, "ab ab ab"), (2L, "ab cd"))
    val merges = Bpe.trainBytesLocal(train, nMerges = 1)
    assert(merges === Seq(Bpe.Merge("61", "62", 4L)),
      s"top byte pair must be in-word (61,62) x4, got $merges")
    val dir = java.nio.file.Files.createTempDirectory("bpe_byte").toString
    Bpe.saveTokenizer(spark, merges, dir)
    val frozen = Bpe.loadTokenizer(spark, dir)
    val corpus = docs((10L, "ab ba abab"))
    val enc = Bpe.encodeBytes(corpus, frozen).collect().head.getSeq[String](1)
    // "ab" -> ["61 62"]; "ba" -> ["62","61"] (cross pair never merged);
    // "abab" -> ["61 62","61 62"]
    assert(enc === Seq("61 62", "62", "61", "61 62", "61 62"))
    assert(enc === Bpe.encodeBytes(corpus, merges).collect().head.getSeq[String](1))
  }

  test("byte mode: trainBytesLocal's driver collect is bounded — AUTO mod " +
      "derives from corpus bytes, in-budget corpora pass through whole") {
    // the modulus formula: within budget -> 1 (identity, so gate-SF
    // hashes are untouched by the guard); past budget -> ceil division
    assert(Bpe.autoByteSampleMod(100L, Bpe.TrainBudgetBytes) === 1L)
    assert(Bpe.autoByteSampleMod(Bpe.TrainBudgetBytes, Bpe.TrainBudgetBytes) === 1L)
    assert(Bpe.autoByteSampleMod(Bpe.TrainBudgetBytes + 1L, Bpe.TrainBudgetBytes) === 2L)
    assert(Bpe.autoByteSampleMod(5L * (512L << 20), 512L << 20) === 5L)
    // a corpus past a (tiny, injected) budget is SAMPLED: AUTO equals
    // the explicit xxhash64(doc_id)-mod slice trained with the same
    // greedy loop, never the whole corpus
    val d = docs((0L until 40L).map(i =>
      (i, if (i % 2 == 0) "aa aa" else "bb bb")): _*)
    val budget = 20L // bytes; total is 200 -> mod 10
    val auto = Bpe.trainBytesLocal(d, nMerges = 1, budgetBytes = budget)
    val manual = Bpe.trainBytesLocal(
      d.where(pmod(xxhash64(col("doc_id")), lit(10L)) === 0),
      nMerges = 1, sampleMod = 1)
    assert(auto === manual)
    // default budget on a small corpus = identity (c16's contract)
    assert(Bpe.trainBytesLocal(d, nMerges = 1) ===
      Bpe.trainBytesLocal(d, nMerges = 1, sampleMod = 1))
  }

  test("byte mode: greedy order and utf8 tie-break match the word-level trainer's rules") {
    // two competing pairs with equal counts: ("61","61") from "aa" x2
    // and ("62","62") from "bb" x2 — tie breaks to the byte-lex
    // smaller pair, then the next round picks the other
    val train = docs((1L, "aa bb"), (2L, "aa bb"))
    val merges = Bpe.trainBytesLocal(train, nMerges = 2)
    assert(merges === Seq(Bpe.Merge("61", "61", 2L), Bpe.Merge("62", "62", 2L)))
  }

  test("split-form contract: merges learned on train apply to encode docs " +
      "identically whether applied incrementally or as a frozen sequence") {
    // the trainEncodeSplitSql equivalence argument in miniature: for a
    // doc OUTSIDE the train slice, applying each merge as it is
    // learned (the SQL's incremental state) equals applying the final
    // frozen sequence at the end (Bpe.encode) — both are in-order
    // greedy folds
    val train = docs((1L, "p q p q r"), (2L, "p q r r"))
    val (merges, syms) = Bpe.train(train, nMerges = 3)
    syms.unpersist(blocking = false)
    val outside = Seq("r", "p", "q", "p", "q", "r", "r")
    var incremental = outside
    merges.foreach { m =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      incremental.foreach { x =>
        if (out.nonEmpty && out.last == m.a && x == m.b)
          out(out.length - 1) = m.a + " " + m.b
        else out += x
      }
      incremental = out.toSeq
    }
    val frozen = Bpe.encode(docs((9L, outside.mkString(" "))), merges)
      .collect().head.getSeq[String](1)
    assert(frozen === incremental)
  }
}
