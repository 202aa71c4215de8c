package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native text expressions for the hot per-document loops.
  *
  * Both replace formulations that needed a shuffle (SimHash: explode →
  * 64 conditional sums → groupBy) or N interpreted array traversals
  * (stopword hits: one `filter` lambda per language). As single
  * expressions they are pure map-side work — at 100 TB these run inside
  * the scan stage with no exchange at all.
  */

/** 64-bit SimHash of an array<string> token column: per-token 64-bit
  * FNV-1a, each bit votes ±1, sign of the sum sets the bit. Identical
  * output to the explode/groupBy formulation with the same token hash. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
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
    extends UnaryExpression with CodegenFallback {
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

  protected override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
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
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
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
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
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
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  // deterministic "random" planes — same formula the Column-based
  // implementation used, so buckets are stable across versions
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (b, d) =>
      val x = (b * 1315423911L + d * 2654435761L) & 0xFFFFFFFFL
      (x.toDouble / 0xFFFFFFFFL.toDouble) * 2.0 - 1.0
    }

  protected override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
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
