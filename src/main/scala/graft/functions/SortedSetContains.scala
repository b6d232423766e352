package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd membership test of a string against a FOLDABLE string-array
  * literal, via binary search — O(log n) per row where `array_contains`
  * scans all n elements per row.
  *
  * Built for plan-literal membership screens (exposed as the
  * `sorted_set_contains` SQL function): a query evaluating
  * `array_contains(<100k-element literal>, x)` per row pays an
  * O(rows x keys) linear scan; a literal set that is static per query
  * makes the log-time probe free to set up. (The streaming screens that
  * motivated it now probe via broadcast stream-static joins —
  * [[graft.streaming.DocumentStream.incrementalClassified]] — this
  * remains the right tool when the set IS a plan literal, e.g.
  * hand-authored SQL screens.) The literal is evaluated ONCE per
  * operator instance (lazy val / codegen reference object, never per
  * row) and SORTED here in UTF8String (byte-wise) order — callers need
  * not pre-sort, and java.lang.String order (which differs from byte
  * order beyond ASCII) never leaks in.
  *
  * NULL CONTRACT: a null input STRING gives NULL (null-intolerant binary
  * expression). A NULL key-array literal is rejected at ANALYSIS
  * (checkInputDataTypes) — never at evaluation — so interpreted and
  * codegen execution cannot diverge on it (codegen forces the sorted
  * set at plan time; interpreted eval would otherwise short-circuit a
  * null probe first). Null ELEMENTS in the literal are rejected at
  * first evaluation (a screen set with a null key is a bug, not a
  * lookup).
  */
case class SortedSetContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"${SortedSetContains.name} requires a string probe, got ${left.dataType}")
    else right.dataType match {
      case ArrayType(StringType, _) if right.foldable =>
        // Reject a NULL literal HERE so both execution modes agree:
        // codegen forces the sorted set at plan time (would throw),
        // while interpreted eval would short-circuit a null probe first
        // (would return NULL) — analysis is before either.
        if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure(
            s"${SortedSetContains.name}: the key-set literal is NULL — " +
              "a screen with no set is a construction bug, not an " +
              "empty lookup")
        else TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(
          s"${SortedSetContains.name} requires a FOLDABLE key array " +
            "(the set is baked into the plan and sorted once)")
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"${SortedSetContains.name} requires array<string> keys, got $t")
    }

  override def dataType: DataType = BooleanType

  /** The literal set, materialized and sorted once per operator instance
    * (driver for interpreted eval; shipped as a codegen reference object
    * to executors). UTF8String.compareTo is byte-wise — the order
    * binarySearch then uses for every probe.
    */
  @transient private lazy val sortedKeys: Array[AnyRef] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    // Unreachable when analyzed (checkInputDataTypes rejects a null
    // literal); kept as a guard for direct unanalyzed construction.
    require(arr != null,
      s"${SortedSetContains.name}: the key-set literal is NULL — a screen " +
        "with no set is a construction bug, not an empty lookup")
    val out = new Array[AnyRef](arr.numElements())
    var i = 0
    while (i < out.length) {
      require(!arr.isNullAt(i),
        s"${SortedSetContains.name}: key set contains a null element")
      out(i) = arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  override def nullSafeEval(v: Any, unused: Any): Any =
    java.util.Arrays.binarySearch(sortedKeys, v.asInstanceOf[UTF8String]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val keysRef = ctx.addReferenceObj("sortedKeys", sortedKeys, "java.lang.Object[]")
    val probe = left.genCode(ctx)
    ev.copy(code =
      code"""
         |${probe.code}
         |boolean ${ev.isNull} = ${probe.isNull};
         |boolean ${ev.value} = false;
         |if (!${ev.isNull}) {
         |  ${ev.value} = java.util.Arrays.binarySearch($keysRef, ${probe.value}) >= 0;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = SortedSetContains.name
}

object SortedSetContains {
  val name = "sorted_set_contains"

  val builder: Seq[Expression] => Expression =
    exprs => SortedSetContains(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** `probe IN keys` as a Column; `keys` becomes a plan literal. */
  def contains(probe: Column, keys: Seq[String]): Column =
    call_function(name, probe, typedlit(keys))
}
