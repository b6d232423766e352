package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema guard: pins the dtype contract of every driver-generated
  * table so a regenerated `/root/testdata` that shifts an encoding fails
  * HERE, with the fixture and remedy named — not as a pile of cryptic
  * analysis errors deep inside 28 query tests (the round-12 failure mode,
  * when `events.ts` silently moved from TIMESTAMP(NANOS) to timestamp[us]
  * and broke 14 queries at once).
  *
  * Two layers of guard:
  *   1. every table's column names + a *logical* dtype class per column
  *      (integral / fractional / string / event-time / embedding vector);
  *   2. the normalized event-time contract: whatever physical encoding
  *      `events.ts` carries, [[Tables.normalizeTsNs]] must surface int64
  *      nanoseconds — that is the single adaptation point every
  *      event-time query relies on.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sf0001

  private def remedy(table: String): String =
    s"fixture $dir/$table.parquet changed shape — the driver regenerated " +
      "/root/testdata with a new schema. Update graft.Tables (and this spec) " +
      "in one place; for event-time encodings extend Tables.normalizeTsNs."

  /** Logical dtype classes: the engine cares that a column is integral,
    * not whether the generator emitted int32 vs int64 this round.
    */
  private def dtypeClass(dt: DataType): String = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType => "integral"
    case _: DoubleType | _: FloatType | _: DecimalType => "fractional"
    case _: StringType => "string"
    case _: TimestampType | _: TimestampNTZType | _: DateType => "time"
    case ArrayType(et, _) => s"array<${dtypeClass(et)}>"
    case other => other.simpleString
  }

  val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "integral", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "integral", "n_name" -> "string",
      "n_regionkey" -> "integral"),
    "customer" -> Seq("c_custkey" -> "integral", "c_name" -> "string",
      "c_nationkey" -> "integral", "c_acctbal" -> "fractional",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "integral", "s_name" -> "string",
      "s_nationkey" -> "integral", "s_acctbal" -> "fractional"),
    "part" -> Seq("p_partkey" -> "integral", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "integral",
      "p_retailprice" -> "fractional"),
    "orders" -> Seq("o_orderkey" -> "integral", "o_custkey" -> "integral",
      "o_orderstatus" -> "string", "o_totalprice" -> "fractional",
      "o_orderdate" -> "time", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "integral", "l_partkey" -> "integral",
      "l_suppkey" -> "integral", "l_linenumber" -> "integral",
      "l_quantity" -> "fractional", "l_extendedprice" -> "fractional",
      "l_discount" -> "fractional", "l_tax" -> "fractional",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "time"),
    "documents" -> Seq("doc_id" -> "integral", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "integral"),
    "embeddings" -> Seq("vec_id" -> "integral",
      "embedding" -> "array<fractional>", "label" -> "integral")
  )

  expected.foreach { case (table, cols) =>
    test(s"fixture schema: $table columns and dtype classes") {
      val schema = Tables(spark, dir, table).schema
      val got = schema.fields.toSeq.map(f => f.name -> dtypeClass(f.dataType))
      assert(got == cols, s"\n${remedy(table)}\n  expected: $cols\n  got:      $got")
    }
  }

  test("fixture schema: events columns, and ts is a supported event-time encoding") {
    val schema = Tables.eventsRaw(spark, dir).schema
    assert(schema.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      remedy("events"))
    val tsType = schema("ts").dataType
    assert(
      tsType == LongType || tsType == TimestampType || tsType == TimestampNTZType,
      s"\nevents.ts arrived as $tsType — a NEW fixture timestamp encoding. " +
        "Every event-time query reads ts through Tables.normalizeTsNs; " +
        "extend that one function (and this spec) to cover the new encoding.")
  }

  test("event-time contract: normalizeTsNs surfaces int64 ns with plausible epoch values") {
    val df = Tables.eventsTsNs(spark, dir)
    assert(df.schema("ts").dataType == LongType,
      "Tables.eventsTsNs must yield ts as LongType int64 nanoseconds — " +
        "the engine-wide event-time contract (SURVEY.md §1)")
    // Value sanity: ns-since-epoch for any plausible fixture date lands in
    // [2000-01-01, 2100-01-01) — catches a wrong-unit normalization (µs or
    // ms mistakenly passed through as ns) that a dtype check alone misses.
    import org.apache.spark.sql.functions._
    val (lo, hi) = (946684800L * 1000000000L, 4102444800L * 1000000000L)
    val bad = df.filter(col("ts") < lo || col("ts") >= hi).count()
    assert(bad == 0L,
      s"$bad events.ts values outside [2000,2100) as int64 ns — " +
        "normalizeTsNs produced the wrong unit for this fixture encoding")
  }
}
