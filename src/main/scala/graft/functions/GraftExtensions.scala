package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions integration: injects the engine's custom
  * expressions into a session's function registry AT BUILD TIME —
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or, config-only (no code changes in the launching app):
  * // --conf spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * This is the deployment-grade registration path: every session derived
  * from the builder (including `newSession()` clones and thrift/connect
  * sessions created from the same context) sees `dot_ff`,
  * `portable_hash32`, and `rolling_fingerprint` as SQL-callable functions
  * with catalog metadata. The per-session
  * [[GraftFunctions.register]] remains for foreign sessions the engine
  * does not construct.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(DotProductFF.name),
      info(DotProductFF.name,
        "dot_ff(a, b) - dot product of two float/double arrays, sequential double accumulation"),
      (exprs: Seq[Expression]) => DotProductFF(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(PortableHash32.name),
      info(PortableHash32.name,
        "portable_hash32(x) - first 4 md5 bytes of x as a non-negative long"),
      (exprs: Seq[Expression]) => PortableHash32Expr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier(RollingFingerprint.name),
      info(RollingFingerprint.name,
        "rolling_fingerprint(tokens[, window]) - min portable hash over token shingle windows"),
      (exprs: Seq[Expression]) => {
        val w = exprs.lift(1) match {
          case Some(Literal(v: Int, _)) => v
          case _ => 5
        }
        RollingFingerprintExpr(exprs.head, w)
      }))
  }
}
