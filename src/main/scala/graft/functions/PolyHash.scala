package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Document fingerprint: polynomial rolling hash over Unicode codepoints,
  * base 131 mod 1e9+7 (SURVEY §7.4 extension op "document fingerprinting").
  *
  * Implemented as a native Catalyst `Expression` with Java codegen so it
  * participates in whole-stage codegen (preferred over a Scala UDF — see
  * the builder guide's extension-preference order). The formula is
  * deliberately engine-portable: the DuckDB oracle computes the identical
  * value with `list_reduce(string_split(text,''), (h,c) -> (h*131+ord(c)) % 1000000007)`.
  */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"

  protected override def nullSafeEval(input: Any): Any =
    PolyHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {
  final val Base = 131L
  final val Mod  = 1000000007L

  /** Left fold over codepoints; empty string → 0 (matches the oracle's
    * CASE len=0 guard around list_reduce). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Register in the session FunctionRegistry (idempotent) so both the
    * Column API below and plain SQL (`SELECT poly_hash64(text)`) can use
    * the expression — SURVEY §7.3 "optional Catalyst surface". */
  def register(spark: SparkSession): Unit =
    castToImpl(spark).sessionState.functionRegistry
      .createOrReplaceTempFunction("poly_hash64", exprs => PolyHash64(exprs.head), "scala_udf")

  /** Column API — requires [[register]] on the active session (the
    * graft.sources.Tables loaders call it). */
  def polyHash64(c: Column): Column = call_function("poly_hash64", c)

  /** DuckDB-side equivalent expression for oracle SQL. */
  def sql(col: String): String =
    s"(CASE WHEN length($col) = 0 THEN 0 ELSE " +
      s"list_reduce(list_transform(string_split($col, ''), c -> CAST(ord(c) AS BIGINT)), " +
      s"(h, c) -> (h * $Base + c) % $Mod) END)"
}
