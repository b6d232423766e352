package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** dot_ff null semantics: strict propagation for null ELEMENTS (never a
  * silent read-as-zero), NULL for null arrays, exercised on both the
  * interpreted and codegen paths via a DataFrame scan (wholestage codegen)
  * and a literal-folded projection.
  */
class DotProductFFSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("null element anywhere in the consumed prefix makes the result NULL") {
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(3f), Some(4f))),
      (2L, Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(3f), Some(4f))),
      (3L, Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](None, Some(4f)))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), DotProductFF.dotFF(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L) == Some(1.0 * 3 + 2.0 * 4))
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
  }

  test("codegen compiles for every nullability shape (no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // GenerateMutableProjection compiles the generated Java eagerly and
    // throws on any Janino error — unlike whole-stage codegen, which falls
    // back to interpreted execution and hides the bug.
    for (cn <- Seq(false, true); nullableIn <- Seq(false, true)) {
      val t = ArrayType(FloatType, containsNull = cn)
      val e = DotProductFF(
        BoundReference(0, t, nullable = nullableIn),
        BoundReference(1, t, nullable = nullableIn))
      val proj = GenerateMutableProjection.generate(Seq(e))
      val row = InternalRow(
        ArrayData.toArrayData(Array(1f, 2f)), ArrayData.toArrayData(Array(3f, 4f)))
      assert(proj(row).getDouble(0) == 1.0 * 3 + 2.0 * 4, s"cn=$cn nullable=$nullableIn")
    }
  }

  test("NULL array input gives NULL; containsNull=false arrays stay non-null results") {
    val df = Seq(
      (1L, Some(Seq(1f, 2f)), Some(Seq(3f, 4f))),
      (2L, None: Option[Seq[Float]], Some(Seq(3f, 4f)))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"), DotProductFF.dotFF(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L) && rows(2L))
  }
}
