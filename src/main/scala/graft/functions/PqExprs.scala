package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels (`Similarity.pqTopK` hot path).
  *
  * The interpreted HOF formulation (explode per subspace → zip_with +
  * aggregate per codeword) walks n·m·kCode lambda closures with array
  * allocations — it benched 12.4 s at sf0.1 where these loops bench
  * ~1 s. Each expression takes the flat codebook as a foldable array
  * literal child (s-major, then codeword, then dimension), extracted
  * once per executor into a primitive array.
  *
  * Arithmetic contracts (the DuckDB oracle replays them verbatim):
  * - distances/dots accumulate left-to-right in double over the
  *   dimension index — bit-exact with the oracle's left-associated
  *   term chains (float→double widening is exact);
  * - argmin scans codewords ascending with strict `<`, so ties keep
  *   the LOWEST codeword id, matching `ORDER BY dist, j`;
  * - LUT entries are fixed point: floor(dot · 2^16) as long — the ADC
  *   sum is then an integer sum, order-independent by construction.
  */
object PqExprs {
  /** Flat-codebook accessor shared by the three kernels. */
  private[functions] def cbArray(e: Expression): Array[Double] =
    e.eval().asInstanceOf[ArrayData].toDoubleArray()
}

/** array<float|double> embedding → array<int> of m codeword ids. */
case class PqEncode(left: Expression, right: Expression, m: Int, kCode: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val cb = PqExprs.cbArray(right)
  @transient private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  // the codebook rides in the expression (extracted once per task via
  // the lazy `cb`), so codegen only needs the embedding argument; the
  // literal child is still null-checked by defineCodeGen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    defineCodeGen(ctx, ev, (a, _) => s"$ref.compute($a)")
  }

  def compute(x: ArrayData): ArrayData = {
    val dim = x.numElements()
    val subDim = dim / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val vOff = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < kCode) {
        val cOff = (s * kCode + j) * subDim
        var dist = 0.0
        var d = 0
        while (d < subDim) {
          val xv = if (isFloat) x.getFloat(vOff + d).toDouble
                   else x.getDouble(vOff + d)
          val t = xv - cb(cOff + d)
          dist += t * t
          d += 1
        }
        if (dist < bestD) { bestD = dist; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqEncode = copy(left = newLeft, right = newRight)
}

/** array<float|double> query → array<long> flat ADC lookup table
  * (s-major, then codeword): entry = floor(dot(q_sub, codeword)·2^16). */
case class PqLut(left: Expression, right: Expression, m: Int, kCode: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val cb = PqExprs.cbArray(right)
  @transient private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    defineCodeGen(ctx, ev, (a, _) => s"$ref.compute($a)")
  }

  def compute(x: ArrayData): ArrayData = {
    val dim = x.numElements()
    val subDim = dim / m
    val out = new Array[Long](m * kCode)
    var s = 0
    while (s < m) {
      val vOff = s * subDim
      var j = 0
      while (j < kCode) {
        val cOff = (s * kCode + j) * subDim
        var dot = 0.0
        var d = 0
        while (d < subDim) {
          val xv = if (isFloat) x.getFloat(vOff + d).toDouble
                   else x.getDouble(vOff + d)
          dot += xv * cb(cOff + d)
          d += 1
        }
        out(s * kCode + j) = math.floor(dot * 65536.0).toLong
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqLut = copy(left = newLeft, right = newRight)
}

/** (codes: array<int>, lut: array<long>) → Σ_s lut[s·kCode + codes[s]]
  * — m table reads and integer adds per scored pair. */
case class PqAdc(left: Expression, right: Expression, kCode: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  def compute(codes: ArrayData, lut: ArrayData): Long = {
    var s = 0
    var sum = 0L
    val m = codes.numElements()
    while (s < m) {
      sum += lut.getLong(s * kCode + codes.getInt(s))
      s += 1
    }
    sum
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)
}
