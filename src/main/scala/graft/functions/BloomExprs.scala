package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built [[BloomFilter]], carried
  * in the expression as its serialized bytes.
  *
  * Why bytes and not the filter object: the serialized form is what
  * `df.stat.bloomFilter` hands back portably, it makes the expression a
  * pure function of its constructor args (testable without a session),
  * and it rides to executors inside the stage's broadcast task binary —
  * the same once-per-executor shipping as an explicit broadcast
  * variable, so a multi-MB filter costs one transfer, not one per task.
  * Each task deserializes once ([[bloom]] is transient lazy) and the
  * generated code probes via a constant reference — no per-row boxing,
  * no UDF serialization wall.
  *
  * This is the scale lever behind [[graft.operators.Dedup.bloomContamination]]:
  * a probe-only filter stays inside whole-stage codegen BELOW the first
  * exchange, so rows that cannot match never reach a shuffle. A plain
  * broadcast semi-join gives the same plan shape but materializes the
  * keys as a hash relation (~30+ bytes/key); at ~9.6 bits/key (1% fpp)
  * the bloom form holds ~25x more keys in the same executor memory —
  * the regime where the probe side is big enough to matter (benchmark
  * shingle sets in the 100M+ range) is exactly where the hash relation
  * stops fitting. False positives are the caller's contract to confirm
  * (an exact join on the survivors).
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_long needs a BIGINT probe, got ${child.dataType}")
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  protected override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the DESERIALIZED filter as the codegen reference: one readFrom per
    // task at reference-array deserialization, constant-folded probe calls
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomExprs {
  /** Column wrapper: `bloom_might_contain_long(col)` against `bytes`.
    * Goes through the session function registry (like the other graft
    * natives) with the bytes as a foldable binary literal argument. */
  def mightContainLong(value: Column, bytes: Array[Byte]): Column =
    call_function("bloom_might_contain_long", value, lit(bytes))

  private[graft] def fromExprs(exprs: Seq[Expression]): Expression =
    BloomMightContainLong(exprs(0), exprs(1).eval().asInstanceOf[Array[Byte]])
}
