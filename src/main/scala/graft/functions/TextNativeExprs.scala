package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native text expressions for the hot per-document loops.
  *
  * Both replace formulations that needed a shuffle (SimHash: explode →
  * 64 conditional sums → groupBy) or N interpreted array traversals
  * (stopword hits: one `filter` lambda per language). As single
  * expressions they are pure map-side work — at 100 TB these run inside
  * the scan stage with no exchange at all.
  *
  * All implement `doGenCode` as a constant-reference call into the same
  * typed `compute` method `nullSafeEval` uses: a CodegenFallback node
  * would exclude its whole host operator from whole-stage codegen and
  * split the scan span (see MinHashExprs' header note).
  */

/** 64-bit SimHash of an array<string> token column: per-token 64-bit
  * FNV-1a, each bit votes ±1, sign of the sum sets the bit. Identical
  * output to the explode/groupBy formulation with the same token hash. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val bytes = tokens.getUTF8String(i).getBytes
      var h = ShingleHashes.FnvOffset
      var b = 0
      while (b < bytes.length) {
        h ^= (bytes(b) & 0xffL); h *= ShingleHashes.FnvPrime
        b += 1
      }
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) fp |= (1L << bit)
      bit += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Stopword hit counts for N wordlists in ONE pass over the tokens:
  * returns array<int> of per-list counts (duplicates counted, matching
  * `size(filter(tokens, _.isin(words)))` per list). */
case class StopwordHits(child: Expression, wordlists: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_hits"

  // token → bitmask of wordlists containing it
  @transient private lazy val lookup: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    wordlists.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach(w => m.merge(w, 1 << i, (a, b) => a | b))
    }
    m
  }

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordHits", this, classOf[StopwordHits].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(tokens: ArrayData): ArrayData = {
    val counts = new Array[Int](wordlists.size)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val mask = lookup.getOrDefault(tokens.getUTF8String(i).toString, 0)
      if (mask != 0) {
        var j = 0
        var m = mask
        while (m != 0) {
          if ((m & 1) != 0) counts(j) += 1
          j += 1; m >>>= 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** Cosine similarity of two array<float|double> embeddings in one loop:
  * dot and both norms accumulate left-to-right in double — bit-exact
  * with the oracle's left-associated unrolled SQL chains (float→double
  * widening is exact, so mixed element types still compare exactly).
  * The unrolled Column-expression formulation generated 64-term codegen
  * trees whose per-element ANSI bounds checks made it slower than
  * interpreted HOFs; this native loop beats both.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSim].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two array<int> columns as one long-accumulating loop —
  * the int8-quantized scoring hot path. Integer sums are
  * order-independent, so unlike the float cosines the loop exists
  * purely for speed (interpreted zip_with+aggregate walks the arrays
  * three times through lambda closures).
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intDot", this, classOf[IntDot].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  def compute(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L; var i = 0
    while (i < n) { s += x.getInt(i).toLong * y.getInt(i); i += 1 }
    s
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntDot = copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket for an array<float> embedding: bit i =
  * sign of the projection onto a deterministic pseudo-hyperplane. One
  * loop over nBits×dim; replaces an nBits×dim-term generated expression
  * chain (same codegen-bloat problem as the unrolled cosine).
  */
case class HyperplaneSig(child: Expression, nBits: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  // deterministic "random" planes — same formula the Column-based
  // implementation used, so buckets are stable across versions
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (b, d) =>
      val x = (b * 1315423911L + d * 2654435761L) & 0xFFFFFFFFL
      (x.toDouble / 0xFFFFFFFFL.toDouble) * 2.0 - 1.0
    }

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSig", this, classOf[HyperplaneSig].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(v: ArrayData): Long = {
    val n = math.min(dim, v.numElements())
    var sig = 0L
    var b = 0
    while (b < nBits) {
      val plane = planes(b)
      var proj = 0.0
      var d = 0
      while (d < n) { proj += v.getFloat(d).toDouble * plane(d); d += 1 }
      if (proj > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** Count of BPE-ish tokens in lower(text) — the native twin of
  * `size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]', 0))`
  * ([[TextFunctions.tokenCount]]): letter runs and digit runs count one
  * each, every other non-whitespace CODEPOINT counts one. One byte scan
  * over the same `UTF8String.toLowerCase` bytes `lower()` produces —
  * the alternation's match walk is reproduced exactly because `[a-z]+`
  * and `[0-9]+` are maximal runs under first-match semantics, Java `\s`
  * without UNICODE_CHARACTER_CLASS is the six ASCII whitespace chars
  * (single-byte in UTF-8, never continuation bytes), and `[^a-z0-9\s]`
  * matches any OTHER codepoint once (a multi-byte UTF-8 sequence = one
  * lead byte). Replaces the last regex pass on the hot text paths
  * (t5/t9/t13/q2/c12-class token accounting); spec-pinned equal to the
  * regex form. */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokenCount", this, classOf[BpeTokenCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(input: org.apache.spark.unsafe.types.UTF8String): Int = {
    val bytes = input.toLowerCase.getBytes
    val len = bytes.length
    // 0 = none/other, 1 = inside [a-z]+ run, 2 = inside [0-9]+ run
    var state = 0
    var count = 0
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') {
        if (state != 1) { count += 1; state = 1 }
        i += 1
      } else if (b >= '0' && b <= '9') {
        if (state != 2) { count += 1; state = 2 }
        i += 1
      } else if (b == 0x20 || (b >= 0x09 && b <= 0x0d)) {
        state = 0
        i += 1
      } else {
        // any other codepoint matches [^a-z0-9\s] alone: ASCII is one
        // byte; a multi-byte sequence counts once at its lead byte
        count += 1
        state = 0
        i += 1
        while (i < len && (bytes(i) & 0xc0) == 0x80) i += 1
      }
    }
    count
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** All Gopher repetition-signal integer numerators in ONE linear
  * HashMap pass over the token array (reference semantics:
  * [[graft.operators.TextAnalysis.repetitionSignals]]'s documented
  * rules; Rae et al. 2021 table A1). Replaces the per-row
  * higher-order-function formulation whose nested `filter` count was
  * O(grams²) string comparisons per document — ~10⁶ compares for a
  * 10³-word doc PER width, which measured 32 s for 1.7k sf0.1 docs
  * where this pass takes under a second. Counting by hash map is
  * exact (token sequences joined by a single space are injective when
  * tokens are themselves space-free, which `split(text, ' ')`
  * guarantees), and every emitted value is the same exact integer the
  * lambda form produced, so the DuckDB oracle is unchanged.
  *
  * Output layout (array<long>):
  * `[n_words, total_chars, n_lines, dup_line_excess, dup_line_chars]`
  * then one `top_chars` per width in `topNs`, then one
  * `dup_covered_chars` (positional union) per width in `dupNs`. */
case class RepetitionStats(child: Expression, segWords: Int,
                           topNs: Seq[Int], dupNs: Seq[Int])
    extends UnaryExpression {
  require(segWords >= 1 && (topNs ++ dupNs).forall(_ >= 1))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionStats", this, classOf[RepetitionStats].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(w: ArrayData): ArrayData = {
    val nRaw = w.numElements()
    val toks = new Array[String](nRaw)
    val tokLen = new Array[Long](nRaw)
    var totalChars = 0L
    // null elements are ignored, matching the replaced HOF formulation
    // (array_join skips nulls). split() never yields them, but the
    // registered SQL function must not NPE on a hand-built array.
    var n = 0
    var i = 0
    while (i < nRaw) {
      if (!w.isNullAt(i)) {
        val s = w.getUTF8String(i)
        toks(n) = s.toString
        tokLen(n) = s.numChars().toLong
        totalChars += tokLen(n)
        n += 1
      }
      i += 1
    }
    val out = new Array[Long](5 + topNs.size + dupNs.size)
    out(0) = n.toLong
    out(1) = totalChars

    // ---- fixed-width "lines" (segWords-token segments)
    val nLines = (n + segWords - 1) / segWords
    out(2) = nLines.toLong
    if (nLines > 0) {
      // seg string -> (count, token-chars); equal strings have equal
      // token-char sums, so chars recorded at first sight are exact
      val segs = new java.util.HashMap[String, Array[Long]]()
      val sb = new java.lang.StringBuilder
      var li = 0
      while (li < nLines) {
        sb.setLength(0)
        val start = li * segWords
        val end = math.min(start + segWords, n)
        var chars = 0L
        var j = start
        while (j < end) {
          if (j > start) sb.append(' ')
          sb.append(toks(j)); chars += tokLen(j)
          j += 1
        }
        val e = segs.computeIfAbsent(sb.toString, _ => Array(0L, chars))
        e(0) += 1L
        li += 1
      }
      var excess = 0L
      var dupChars = 0L
      val it = segs.values().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e(0) >= 2) { excess += e(0) - 1; dupChars += (e(0) - 1) * e(1) }
      }
      out(3) = excess
      out(4) = dupChars
    }

    // ---- per-width n-gram signals
    val widths = (topNs ++ dupNs).distinct
    val topChars = new java.util.HashMap[Int, Long]()
    val dupCovered = new java.util.HashMap[Int, Long]()
    widths.foreach { nn =>
      val g = n - nn + 1
      if (g <= 0) { topChars.put(nn, 0L); dupCovered.put(nn, 0L) }
      else {
        // gram string -> (count, token-chars); plus per-position gram
        // refs so the coverage pass re-reads counts without re-joining
        val counts = new java.util.HashMap[String, Array[Long]]()
        val atPos = new Array[Array[Long]](g)
        val sb = new java.lang.StringBuilder
        var p = 0
        while (p < g) {
          sb.setLength(0)
          var chars = 0L
          var j = p
          while (j < p + nn) {
            if (j > p) sb.append(' ')
            sb.append(toks(j)); chars += tokLen(j)
            j += 1
          }
          val e = counts.computeIfAbsent(sb.toString, _ => Array(0L, chars))
          e(0) += 1L
          atPos(p) = e
          p += 1
        }
        // the max scan only pays off for widths actually emitted as a
        // top-gram signal — dupNs-only widths (and the sink's
        // topNs=Nil case) skip it entirely
        if (topNs.contains(nn)) {
          var top = 0L
          val it = counts.values().iterator()
          while (it.hasNext) {
            val e = it.next()
            val cover = e(0) * e(1)
            if (cover > top) top = cover
          }
          topChars.put(nn, top)
        }
        if (dupNs.contains(nn)) {
          // positional union: a word covered by ANY >=2x gram counts once
          val covered = new Array[Boolean](n)
          p = 0
          while (p < g) {
            if (atPos(p)(0) >= 2L) {
              var j = p
              while (j < p + nn) { covered(j) = true; j += 1 }
            }
            p += 1
          }
          var sum = 0L
          var j = 0
          while (j < n) { if (covered(j)) sum += tokLen(j); j += 1 }
          dupCovered.put(nn, sum)
        }
      }
    }
    var o = 5
    topNs.foreach { nn => out(o) = topChars.get(nn); o += 1 }
    dupNs.foreach { nn => out(o) = dupCovered.get(nn); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}
