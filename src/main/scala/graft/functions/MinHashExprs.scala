package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash expressions.
  *
  * The compositional formulation — `transform(shingles, polyHash64)`
  * inside 32 × `array_min(transform(...))` — runs interpreted (Spark
  * evaluates higher-order-function lambdas per element with no codegen)
  * and re-walks the shingle array once per hash function: measured 37 s
  * for 5000 docs at sf0.1. These two expressions do the same work in
  * one tight JVM loop per row (~1000× fewer allocations): this is the
  * "custom Expression where built-ins can't express it efficiently"
  * case of the extension-preference order.
  *
  * Every expression here implements `doGenCode` as a constant-reference
  * call into the same typed `compute` method `nullSafeEval` uses (the
  * BloomMightContainLong pattern): emitting the loop itself as generated
  * Java would compile to the same bytecode, but a CodegenFallback node
  * excludes its whole host operator from whole-stage codegen
  * (CollapseCodegenStages rejects any plan node whose expressions
  * contain one), splitting the scan→project→generate span and paying a
  * row materialization at the seam on ~60 queries' hot path.
  */

/** Distinct k-token-shingle hashes of an array<string> token column:
  * FNV-1a 64 over the shingle's token bytes with a separator byte —
  * full 64-bit space (collision odds ~1e-11 at 1e5 shingles), never
  * materializes the joined string. Output order: first occurrence. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // token bytes fetched once
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { tb(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](n - k + 1)
    var start = 0
    while (start <= n - k) {
      val h = ShingleHashes.hashGram(tb, start, k)
      if (seen.add(h)) out += h
      start += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime  = 0x100000001b3L

  /** FNV-1a of the space-joined k-gram starting at `start` in the
    * pre-fetched token-bytes array — THE gram hash, shared by
    * [[ShingleHashes]] (set semantics) and [[GramHashes]] (positional):
    * the d11 oracle's gram-string grouping stands in for exactly this
    * arithmetic, so the two expressions must never diverge. */
  def hashGram(tb: Array[Array[Byte]], start: Int, k: Int): Long = {
    var h = FnvOffset
    var j = start
    while (j < start + k) {
      if (j > start) { h ^= ' '.toLong; h *= FnvPrime }
      val bytes = tb(j)
      var b = 0
      while (b < bytes.length) {
        h ^= (bytes(b) & 0xffL); h *= FnvPrime
        b += 1
      }
      j += 1
    }
    h
  }
}

/** Position-ordered k-gram hashes: out(i) = FNV-1a of the space-joined
  * gram starting at token i (0-based), ALL n-k+1 positions, duplicates
  * kept — [[ShingleHashes]]'s set semantics lose exactly the
  * information span-level dedup needs (where each occurrence sits).
  * Same hash arithmetic, token bytes fetched once, no gram string ever
  * materialized — replaces a transform(slice+concat_ws+xxhash64) chain
  * that allocated two objects per gram (measured ~25% off d11's
  * gram-generation stage at sf0.1). */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHashes", this, classOf[GramHashes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { tb(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    val out = new Array[Long](n - k + 1)
    var start = 0
    while (start <= n - k) {
      out(start) = ShingleHashes.hashGram(tb, start, k)
      start += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

/** Bucketed char-trigram hash stream of a string — the LangId feature
  * extractor in ONE in-row pass: out(i) = poly_hash64(substring(s, i+1, 3))
  * pmod `buckets`, one element per codepoint position 0..n-3, duplicates
  * kept (they are the per-doc term frequencies). Replaces the
  * explode(sequence)+substring+poly_hash64 chain, which under whole-stage
  * codegen still pays two allocations per position (the substring's byte
  * copy and poly_hash64's toString); here the codepoints are decoded once
  * per document and every window is three multiply-mods on ints —
  * measured ~35% off LangId.trainPredict's corpus scan at sf0.1.
  * Arithmetic is EXACTLY [[PolyHash64.hash]] over each 3-codepoint
  * window (h starts at 0; every codepoint < Mod), then `% buckets` on
  * the non-negative hash — bit-identical to the chain it replaces and
  * to the DuckDB twin's per-position substr form (spec-pinned). */
case class CharTrigramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_trigram_buckets"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charTrigramBuckets", this, classOf[CharTrigramBuckets].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(input: UTF8String): ArrayData = {
    val str = input.toString
    val len = str.length
    // one decode pass: codepoint array (substring/length/poly_hash64 all
    // count codepoints, so windows must too)
    val n = str.codePointCount(0, len)
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val cps = new Array[Int](n)
    var i = 0; var j = 0
    while (i < len) {
      val cp = str.codePointAt(i); cps(j) = cp; j += 1
      i += Character.charCount(cp)
    }
    val out = new Array[Long](n - 2)
    val B = PolyHash64.Base; val M = PolyHash64.Mod
    var p = 0
    while (p <= n - 3) {
      var h = cps(p) % M
      h = (h * B + cps(p + 1)) % M
      h = (h * B + cps(p + 2)) % M
      out(p) = h % buckets
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharTrigramBuckets =
    copy(child = newChild)
}

/** Adjacent word n-grams of a raw text column in ONE in-row pass —
  * the LmScore bigram/trigram stream builder: lowercase (the same
  * UTF8String.toLowerCase `lower()` calls), whitespace-tokenize, and
  * emit array<struct<w1..wn>> of every adjacent n-tuple. Bit-identical
  * to the arrays_zip(slice…)-over-wsTokens(lower(text)) chain it
  * replaces (spec-pinned): tokens are the maximal runs of
  * non-whitespace with Java regex `\s` = the six ASCII whitespace
  * chars — all single-byte in UTF-8 and never continuation bytes, so
  * the byte scan splits exactly where trim+split("\\s+") does (NBSP
  * and other non-ASCII spaces separate in NEITHER form). The chain it
  * replaces paid three regex passes per document (two trims + the
  * split) plus two array slices and the zip's per-element rows; here
  * the only per-token allocation is the zero-copy UTF8String view.
  * Fewer than n tokens → empty array (the `size(t) >= n` guard's
  * rows explode away identically). */
case class WordGrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 2)
  override def dataType: DataType = ArrayType(
    StructType((1 to n).map(i => StructField(s"w$i", StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "word_grams"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordGrams", this, classOf[WordGrams].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(input: UTF8String): ArrayData = {
    val toks = WsTok.lowerTokens(input)
    val ntok = toks.length
    if (ntok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](ntok - n + 1)
    var p = 0
    while (p <= ntok - n) {
      val vals = new Array[Any](n)
      var j = 0
      while (j < n) { vals(j) = toks(p + j); j += 1 }
      out(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

/** The shared single-pass lower+whitespace tokenizer behind
  * [[WordGrams]] and [[WsLowerTokens]] — one definition so the n-gram
  * stream and the plain token array can never tokenize differently. */
object WsTok {
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d) // Java \s: space \t \n \x0B \f \r

  /** Tokens of lower(s): maximal runs of non-whitespace bytes, where
    * whitespace = Java regex `\s` (six ASCII chars — all single-byte
    * in UTF-8 and never continuation bytes, so the byte scan splits
    * exactly where trimWs+split("\\s+") does). Zero-copy views. */
  def lowerTokens(s: UTF8String): Array[UTF8String] = {
    val bytes = s.toLowerCase.getBytes
    val len = bytes.length
    var ntok = 0
    var i = 0
    while (i < len) {
      if (!isWs(bytes(i))) {
        ntok += 1
        while (i < len && !isWs(bytes(i))) i += 1
      } else i += 1
    }
    val toks = new Array[UTF8String](ntok)
    i = 0; var t = 0
    while (i < len) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < len && !isWs(bytes(i))) i += 1
        toks(t) = UTF8String.fromBytes(bytes, start, i - start)
        t += 1
      } else i += 1
    }
    toks
  }
}

/** array<string> of lower(text)'s whitespace tokens — the native twin
  * of `wsTokens(lower(text))` (TextAnalysis.toks): that chain pays
  * three regex passes per document (two trimWs regexp_replaces and
  * the split); this is one byte scan with zero-copy token views.
  * Identical output incl. the ''/all-whitespace → [] guard
  * (spec-pinned in LmScoreSpec/TextAnalysis specs). */
case class WsLowerTokens(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "ws_lower_tokens"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wsLowerTokens", this, classOf[WsLowerTokens].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(input: UTF8String): ArrayData =
    new GenericArrayData(WsTok.lowerTokens(input).asInstanceOf[Array[Any]])

  override protected def withNewChildInternal(newChild: Expression): WsLowerTokens =
    copy(child = newChild)
}

/** MinHash signature over an array<long> of shingle hashes:
  * sig[i] = min over shingles of (a_i·h + b_i) mod (2^61−1).
  * Seeds are deterministic (task retries must reproduce signatures). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val as: Array[Long] = MinHashSig.seedsA(numHashes)
  @transient private lazy val bs: Array[Long] = MinHashSig.seedsB(numHashes)

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = MinHashSig.mod61(h * as(j) + bs(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P: Long = 2305843009213693951L // 2^61 - 1
  def seedsA(n: Int): Array[Long] = (1 to n).map(i => 2L * i * 1000003L + 1L).toArray
  def seedsB(n: Int): Array[Long] = (1 to n).map(i => i * 998244353L % P).toArray
  /** Sign-safe (x mod 2^61−1): shingle hashes span the full 64-bit
    * range, so a·h+b may wrap negative — floorMod keeps the signature
    * deterministic and non-negative. */
  def mod61(x: Long): Long = java.lang.Math.floorMod(x, P)
}

/** Registration + Column API for the graft native expressions. */
object Registry {
  def registerAll(spark: SparkSession): Unit = {
    val reg = org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash64",
      exprs => PolyHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes",
      exprs => ShingleHashes(exprs(0), exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("gram_hashes",
      exprs => GramHashes(exprs(0), exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("char_trigram_buckets",
      exprs => CharTrigramBuckets(exprs(0), exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("word_grams",
      exprs => WordGrams(exprs(0), exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("ws_lower_tokens",
      exprs => WsLowerTokens(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSig(exprs(0), exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_sig",
      exprs => HyperplaneSig(exprs(0), exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("int_dot",
      exprs => IntDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("bpe_token_count",
      exprs => BpeTokenCount(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("lang_stopword_hits",
      exprs => StopwordHits(exprs.head,
        graft.operators.TextAnalysis.LangWords.map(_._2)), "scala_udf")
    reg.createOrReplaceTempFunction("bloom_might_contain_long",
      BloomExprs.fromExprs, "scala_udf")
    reg.createOrReplaceTempFunction("pq_encode",
      exprs => PqEncode(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int], exprs(3).eval().asInstanceOf[Int]),
      "scala_udf")
    reg.createOrReplaceTempFunction("pq_lut",
      exprs => PqLut(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int], exprs(3).eval().asInstanceOf[Int]),
      "scala_udf")
    reg.createOrReplaceTempFunction("pq_adc",
      exprs => PqAdc(exprs(0), exprs(1), exprs(2).eval().asInstanceOf[Int]),
      "scala_udf")
    // widths ride as CSV literals — empty string = empty width list
    def csvInts(e: Expression): Seq[Int] = {
      val s = e.eval().toString
      if (s.isEmpty) Nil else s.split(',').toSeq.map(_.toInt)
    }
    reg.createOrReplaceTempFunction("repetition_stats",
      exprs => RepetitionStats(exprs(0), exprs(1).eval().asInstanceOf[Int],
        csvInts(exprs(2)), csvInts(exprs(3))), "scala_udf")
  }

  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def intDot(a: Column, b: Column): Column = call_function("int_dot", a, b)
  def hyperplaneSig(emb: Column, nBits: Int, dim: Int): Column =
    call_function("hyperplane_sig", emb, lit(nBits), lit(dim))
  def langStopwordHits(tokens: Column): Column =
    call_function("lang_stopword_hits", tokens)

  def shingleHashes(tokens: Column, k: Int): Column =
    call_function("shingle_hashes", tokens, lit(k))
  def gramHashes(tokens: Column, k: Int): Column =
    call_function("gram_hashes", tokens, lit(k))
  def charTrigramBuckets(text: Column, buckets: Int): Column =
    call_function("char_trigram_buckets", text, lit(buckets))
  def wordGrams(text: Column, n: Int): Column =
    call_function("word_grams", text, lit(n))
  def wsLowerTokens(text: Column): Column =
    call_function("ws_lower_tokens", text)
  def bpeTokenCount(text: Column): Column =
    call_function("bpe_token_count", text)
  def minhashSig(shingleHashes: Column, numHashes: Int): Column =
    call_function("minhash_sig", shingleHashes, lit(numHashes))

  def repetitionStats(tokens: Column, segWords: Int,
                      topNs: Seq[Int], dupNs: Seq[Int]): Column =
    call_function("repetition_stats", tokens, lit(segWords),
      lit(topNs.mkString(",")), lit(dupNs.mkString(",")))

  def pqEncode(emb: Column, cbFlat: Column, m: Int, kCode: Int): Column =
    call_function("pq_encode", emb, cbFlat, lit(m), lit(kCode))
  def pqLut(qEmb: Column, cbFlat: Column, m: Int, kCode: Int): Column =
    call_function("pq_lut", qEmb, cbFlat, lit(m), lit(kCode))
  def pqAdc(codes: Column, lutCol: Column, kCode: Int): Column =
    call_function("pq_adc", codes, lutCol, lit(kCode))
}
