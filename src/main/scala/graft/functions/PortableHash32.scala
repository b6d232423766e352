package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable 32-bit content hash: the first 4 bytes of md5 as a non-negative
  * long — the engine's standard engine-portable hash (DuckDB oracle:
  * `CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)`).
  *
  * Equivalent to `conv(substring(md5(x), 1, 8), 16, 10) cast long` but
  * skips materializing the 32-char hex string and the decimal string per
  * row: one digest, four bytes, one long. Used in the hot paths of
  * minhash/simhash (one hash per word occurrence) and rolling fingerprints
  * (one per shingle window).
  */
case class PortableHash32Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"portable_hash32 requires string or binary input, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    PortableHash32.hash32(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toBytes = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case BinaryType => (c: String) => c
    }
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHash32.hash32(${toBytes(c)})")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "portable_hash32"
}

object PortableHash32 {
  val name = "portable_hash32"

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes big-endian as an unsigned 32-bit value in a long.
    * (Static forwarder — callable from generated Java code.)
    */
  def hash32(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Shared SQL builder (used by both registration paths). */
  val builder: Seq[Expression] => Expression = exprs => PortableHash32Expr(exprs.head)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  def portableHash32(c: Column): Column = call_function(name, c)
}

/** One-call registration for every graft custom function. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    DotProductFF.register(spark)
    PortableHash32.register(spark)
    RollingFingerprint.register(spark)
    ZOrderInterleave.register(spark)
    KMinSketch.register(spark)
    SortedSetContains.register(spark)
  }
}
