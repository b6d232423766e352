package graft.sources

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Laws of the type-widening lattice used by [[SchemaUnion]]: widening must
  * be order-insensitive (files arrive in arbitrary order) and stable, or
  * reconciled schemas would depend on directory listing order.
  */
object SchemaWidenProperties extends Properties("schemaWiden") {

  private val types: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, DateType)

  property("commutative") = forAll(types, types) { (a, b) =>
    SchemaUnion.widen(a, b) == SchemaUnion.widen(b, a)
  }

  property("idempotent") = forAll(types) { a =>
    SchemaUnion.widen(a, a) == a
  }

  property("associative") = forAll(types, types, types) { (a, b, c) =>
    SchemaUnion.widen(SchemaUnion.widen(a, b), c) ==
      SchemaUnion.widen(a, SchemaUnion.widen(b, c))
  }

  property("absorbing at StringType (the TEXT fallback)") = forAll(types) { a =>
    SchemaUnion.widen(a, StringType) == StringType
  }

  property("numeric pairs widen to a numeric type, never TEXT") =
    forAll(types, types) { (a, b) =>
      (a, b) match {
        case (_: NumericType, _: NumericType) =>
          SchemaUnion.widen(a, b).isInstanceOf[NumericType]
        case _ => true
      }
    }
}
