package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style rolling fingerprint over a token array: the minimum
  * [[PortableHash32]] over every `window`-token shingle (space-joined).
  *
  * Value-identical to the composed form
  * `array_min(transform(sequence(...), i -> portable_hash32(concat_ws(' ',
  * slice(toks, i, w)))))` — but that pipeline is a higher-order function
  * (interpreted lambda, per-window array allocations for slice + sequence).
  * This expression runs one fused JVM loop per row: join window, digest,
  * track min. It was the slowest text query's entire cost.
  *
  * Windowing contract (mirrors the SQL oracle): windows start at every
  * token index 1..max(n-window+1, 1); documents shorter than `window`
  * contribute their single partial window.
  */
case class RollingFingerprintExpr(child: Expression, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires array<string> input, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    RollingFingerprint.rollingMin(v.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingFingerprint.rollingMin($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rolling_fingerprint"
}

object RollingFingerprint {
  val name = "rolling_fingerprint"

  private val Space = UTF8String.fromString(" ")

  /** Min portable hash over all window-token shingles. Static forwarder —
    * callable from generated Java code.
    */
  def rollingMin(tokens: ArrayData, window: Int): Long = {
    val n = tokens.numElements()
    val starts = math.max(n - window + 1, 1)
    var minHash = Long.MaxValue
    var i = 0
    while (i < starts) {
      val len = math.min(window, n - i)
      val parts = new Array[UTF8String](len)
      var j = 0
      while (j < len) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      val joined = UTF8String.concatWs(Space, parts: _*)
      val h = PortableHash32.hash32(joined.getBytes)
      if (h < minHash) minHash = h
      i += 1
    }
    if (n == 0) PortableHash32.hash32(Array.emptyByteArray) else minHash
  }

  /** Shared SQL builder (used by both registration paths): the optional
    * second argument must be a foldable integer expression (a literal or
    * something constant-reducible like CAST(5 AS BIGINT) — folding runs
    * AFTER function resolution, so plain Literal matching is not enough) —
    * anything non-constant fails analysis loudly instead of silently
    * falling back to the default.
    */
  val builder: Seq[Expression] => Expression = exprs => {
    val w = exprs.lift(1) match {
      case None => 5
      case Some(e) if e.foldable =>
        e.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case s: Short => s.toInt
          case other => throw new IllegalArgumentException(
            s"rolling_fingerprint window must be an integer constant, got $other")
        }
      case Some(other) => throw new IllegalArgumentException(
        s"rolling_fingerprint window must be a constant integer expression, got $other")
    }
    RollingFingerprintExpr(exprs.head, w)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  def rollingFingerprint(tokens: Column, window: Int = 5): Column =
    call_function(name, tokens, org.apache.spark.sql.functions.lit(window))
}
