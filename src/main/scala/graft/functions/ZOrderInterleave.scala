package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) bit interleave of two dimension values — the
  * space-filling-curve key behind multi-dimensional data layout: sorting
  * by the z-value clusters rows that are close in BOTH dimensions into
  * the same files/row groups, so a box predicate on either dimension
  * prunes most of the scan (min/max skipping works per dimension, where
  * a single-column sort only ever helps its leading column).
  *
  * Each input is taken modulo 2^31 (low 31 bits), keeping the 62-bit
  * result non-negative so SIGNED long ordering equals unsigned z-curve
  * order — the property range partitioning relies on. Codegen'd via the
  * shared spread routine; value-identical to the bit-by-bit SQL form
  * (`ZOrderInterleave.duckSql` renders it), which is what lets the
  * oracle check the curve itself.
  */
case class ZOrderInterleaveExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType | LongType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder_interleave requires integral inputs, got ($l, $r)")
    }

  override def dataType: DataType = LongType

  private def asLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderInterleave.interleave31(asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderInterleave.interleave31((long)($a), (long)($b))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder_interleave"
}

object ZOrderInterleave {
  val name = "zorder_interleave"

  /** Spread the low 31 bits of `v` onto even bit positions 0,2,..,60. */
  private def spread31(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** a's bits on even positions, b's on odd: a 62-bit non-negative
    * z-value. (Static forwarder — callable from generated Java code.)
    */
  def interleave31(a: Long, b: Long): Long =
    spread31(a) | (spread31(b) << 1)

  /** The identical curve as engine-portable SQL (bit-by-bit): used to
    * generate the DuckDB oracle from the same constants as the codegen'd
    * fast path. `a`/`b` must be non-negative BIGINT expressions.
    */
  def duckSql(a: String, b: String): String = {
    // every term FULLY parenthesized: DuckDB gives | and << equal
    // precedence left-to-right, so a bare `x << i | y << j` would
    // compound the shifts
    val terms =
      (0 until 31).map(i => s"(((($a) >> $i) & 1) << ${2 * i})") ++
        (0 until 31).map(i => s"(((($b) >> $i) & 1) << ${2 * i + 1})")
    terms.mkString("(", " | ", ")")
  }

  val builder: Seq[Expression] => Expression =
    exprs => ZOrderInterleaveExpr(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  def zorderInterleave(a: Column, b: Column): Column =
    call_function(name, a, b)
}
