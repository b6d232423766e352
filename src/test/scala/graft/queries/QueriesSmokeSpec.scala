package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Every registry query runs at sf0.001 and produces a sane result; the
  * exact-value gate is the DuckDB differential (tools/check_oracle.py /
  * driver t2) — this spec catches plan-breaking regressions fast.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // Queries whose correct result can legitimately be empty at tiny SF.
  private val mayBeEmpty = Set("q15_anti_join", "q18_except")

  // No declared query may emit a DECIMAL-typed column (r17: q248/q251
  // were the registry's only two and the driver's hash canonicalizes
  // DECIMAL differently between its Spark-parquet and DuckDB read
  // paths — value-correct results still hashed red). The repo's edge
  // convention is cast-to-DOUBLE (or BIGINT for integral scores);
  // DECIMAL stays an INTERNAL accumulation type only. Recursive so a
  // decimal can't hide inside a struct/array/map output column.
  private def hasDecimal(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: DecimalType => true
      case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType => hasDecimal(a.elementType)
      case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _ => false
    }
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.run(spark, SparkTestSession.sf0001)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.forall(c => c == c.toLowerCase || c == "UID"),
        s"${q.name} has non-lowercase columns: ${df.columns.mkString(",")}")
      val decimals = df.schema.fields.filter(f => hasDecimal(f.dataType))
      assert(decimals.isEmpty,
        s"${q.name} emits DECIMAL-typed output (driver hash seam): " +
          decimals.map(f => s"${f.name}: ${f.dataType.sql}").mkString(", "))
    }
  }

  test("entry() flagship returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("registry names are unique — a duplicate would silently drop a query from the driver map") {
    val names = SparkEntry.registry.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate registry names: ${dupes.mkString(", ")}")
  }

  test("every query ships an oracle — no rows-only checks remain") {
    val missing = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.mkString(", ")}")
  }
}
