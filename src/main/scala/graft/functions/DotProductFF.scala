package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two float-array columns, accumulating
  * sequentially in DOUBLE.
  *
  * Replaces `aggregate(zip_with(a, b, ...))` in the similarity operators:
  * higher-order functions are `CodegenFallback` (per-row interpreted lambda
  * + per-element boxing), which dominated the embedding pair queries. This
  * expression participates in whole-stage codegen: one fused loop over the
  * unsafe array data, no allocation.
  *
  * NUMERIC CONTRACT (do not change): the accumulation order is element 0..n
  * left-to-right in double — bit-identical to the DuckDB oracle's
  * `list_sum(list_transform(list_zip(a,b), ...))` and to the previous
  * fold-based implementation (see graft.operators.Similarity).
  *
  * NULL CONTRACT: a NULL array on either side gives NULL (null-intolerant
  * binary expression), and a NULL ELEMENT at any consumed index also gives
  * NULL — strict propagation, never a silent read-as-zero. Note the DuckDB
  * oracle form above is laxer (SUM skips NULL products), so oracle-checked
  * queries must only apply dot_ff to null-free embeddings — true of every
  * registry query; the element-null path exists so foreign data fails
  * loudly-as-NULL instead of corrupting similarity scores.
  *
  * LENGTH CONTRACT: arrays of different lengths consume the common prefix
  * — deliberately identical to the oracle form (DuckDB `list_zip` pads the
  * shorter list with NULLs, the NULL products drop out of `list_sum`).
  * Mixed-dimensionality embedding tables therefore produce prefix dot
  * products in BOTH engines, not an error; validate dimensions upstream
  * when that matters.
  */
case class DotProductFF(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_ff requires array<float|double> inputs, got " +
          s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHoldNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true // unresolved — be conservative
  }

  // Nullable not just when an INPUT can be null but also when either
  // array type admits null ELEMENTS (strict propagation; see class doc).
  override def nullable: Boolean =
    left.nullable || right.nullable ||
      mayHoldNullElems(left) || mayHoldNullElems(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      // Element null checks only emitted for sides whose type admits null
      // elements — containsNull=false arrays keep the branch-free loop.
      val nullChecks = Seq(
        if (mayHoldNullElems(left)) Some(s"$x.isNullAt($i)") else None,
        if (mayHoldNullElems(right)) Some(s"$y.isNullAt($i)") else None
      ).flatten
      // With no possible null elements the expression may be NON-nullable,
      // in which case nullSafeCodeGen never declares the ev.isNull variable
      // — the branch-free template must not reference it at all.
      if (nullChecks.isEmpty)
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${get(x, isFloat(left))} * ${get(y, isFloat(right))};
           |}
           |${ev.value} = $s;
         """.stripMargin
      else
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (${nullChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }
           |  $s += ${get(x, isFloat(left))} * ${get(y, isFloat(right))};
           |}
           |if (!${ev.isNull}) { ${ev.value} = $s; }
         """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_ff"
}

object DotProductFF {
  val name = "dot_ff"

  /** Shared SQL builder (used by both registration paths). */
  val builder: Seq[Expression] => Expression = exprs => DotProductFF(exprs(0), exprs(1))

  /** Register into a session's function registry (idempotent). Sessions
    * built via [[graft.GraftSession]] call this automatically; foreign
    * sessions must call it before analyzing a plan that uses [[dotFF]].
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Column-level API: dot product in double of two ArrayType(FloatType).
    * Resolves against the session registry at analysis time.
    */
  def dotFF(a: Column, b: Column): Column = call_function(name, a, b)
}
