package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md).
  *
  * One parquet file per table under `\$dir/<name>.parquet`. The `events`
  * table carries an event-time column `ts` whose PHYSICAL encoding has
  * varied across fixture generations — TIMESTAMP(NANOS) in earlier drops,
  * `timestamp[us]` since 2026-08-13 — so [[eventsTsNs]] normalizes it to
  * ONE logical type at the loader seam: int64 nanoseconds-since-epoch,
  * matching the reference's own int64-ns data model (SURVEY.md §1:
  * `main.js:158-162`). Every event-time query consumes that contract;
  * the dtype adaptation lives here and nowhere else.
  */
object Tables {
  val starSchema: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extension: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = starSchema ++ extension

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "events")

  /** `events` read with whatever `ts` dtype the fixture carries (plus the
    * `nanosAsLong` conf so a TIMESTAMP(NANOS) generation reads as long
    * instead of failing with [PARQUET_TYPE_ILLEGAL]). Prefer
    * [[eventsTsNs]]; this raw form exists for schema discovery — e.g. the
    * streaming file source must declare the FILE's schema, then apply
    * [[normalizeTsNs]] as a transform (a long-typed schema over a µs file
    * would fail the parquet column conversion).
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    // Session-sticky by design: the flag must be live whenever this
    // DataFrame plans/executes, so restoring it here would be a
    // use-after-free. It only affects NANOS-precision parquet columns —
    // harmless for every other table. Isolate with spark.newSession() if
    // foreign code needs PARQUET_TYPE_ILLEGAL semantics.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, dir, "events")
  }

  /** Normalize an events frame's `ts` to the engine contract: int64
    * nanoseconds-since-epoch (`LongType`), whatever the fixture's physical
    * encoding. Handles all three generations seen from the driver:
    *
    *  - `LongType` — TIMESTAMP(NANOS) parquet read under `nanosAsLong`
    *    (pre-2026-08-13 fixtures): already ns, pass through;
    *  - `TimestampType` — µs-precision, session-tz-adjusted: lossless
    *    `unix_micros * 1000`;
    *  - `TimestampNTZType` — µs-precision naive (what pandas-written
    *    `timestamp[us]` infers as under `parquet.inferTimestampNTZ`):
    *    cast to TimestampType first. All sessions here pin
    *    `spark.sql.session.timeZone=UTC` (GraftSession/Verify/Bench), so
    *    the NTZ→LTZ cast is the identity on the underlying micros and
    *    matches DuckDB's naive read of the same file on the oracle side.
    *
    * Any other dtype fails loudly with the fixture named — a fourth
    * silent regeneration should break ONE clearly-named place, not 28
    * downstream analysis errors (round-12 post-mortem).
    */
  def normalizeTsNs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other: DataType =>
        throw new IllegalStateException(
          s"events.ts arrived as $other — the driver regenerated the fixtures with a new " +
            "timestamp encoding. Supported: int64/TIMESTAMP(NANOS) (via nanosAsLong), " +
            "timestamp[us] (TimestampType/TimestampNTZType). " +
            "Extend graft.Tables.normalizeTsNs — the single adaptation point.")
    }

  /** `events` with `ts` surfaced as int64 nanoseconds-since-epoch — the
    * engine's event-time contract (the reference's own representation:
    * int64 ns operated on as BigInt, `/root/reference/main.js:158-162`).
    * Dtype-adaptive across fixture generations; see [[normalizeTsNs]].
    *
    * UNIT guard (once per dir per JVM): the dtype match alone cannot
    * tell ns-decoded NANOS parquet from a hypothetical future fixture
    * storing raw int64 µs/ms — both arrive as `LongType` — so the first
    * load probes ONE row and fails loudly if the value is not a
    * plausible ns epoch ([2000, 2100)), instead of letting every
    * event-time query silently compute 1000x off. Cost: a single-row
    * head on first touch of a dir; streaming reads can't probe
    * (unbounded plans have no head), but they borrow this check because
    * [[graft.streaming.EventStream.readEvents]] derives its schema from
    * a batch load of the same fixture family.
    */
  def eventsTsNs(spark: SparkSession, dir: String): DataFrame = {
    val df = normalizeTsNs(eventsRaw(spark, dir))
    if (!unitChecked.contains(dir)) {
      df.select(col("ts")).head(1).foreach { r =>
        val ns = r.getLong(0)
        val (lo, hi) = (946684800L * 1000000000L, 4102444800L * 1000000000L)
        if (ns < lo || ns >= hi)
          throw new IllegalStateException(
            s"events.ts in $dir normalized to $ns, outside [2000, 2100) as int64 ns — " +
              "the fixture likely stores a raw integer in a different unit (µs/ms). " +
              "Extend graft.Tables.normalizeTsNs — the single adaptation point.")
      }
      unitChecked.add(dir)
    }
    df
  }

  private val unitChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The engine's derived event-time columns over the contract `ts`
    * (int64 ns, what [[eventsTsNs]]/[[normalizeTsNs]] guarantee). ALL
    * unit math over `ts` lives here — queries reference these named
    * derivations, so the next drift in the fixtures' event-time encoding
    * or precision has exactly two fix points, both in this file:
    * [[normalizeTsNs]] (physical dtype -> ns) and this object (ns ->
    * query units). TracePipeline's duration derivation stays separate by
    * design: its columns are caller-configured (`TraceConfig`), not the
    * fixture's `ts`.
    */
  object EventTime {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{expr, timestamp_micros}

    /** µs since epoch — same value DuckDB's `epoch_us(ts)` computes on
      * the oracle side (integral `div`: truncation toward zero, exact
      * for the non-negative epochs in scope).
      */
    def us: Column = expr("ts div 1000")

    /** ns truncated to the µs boundary: the oracle-identical int64-ns
      * form (`epoch_ns(ts)` on a µs-precision fixture has zero sub-µs
      * bits; truncating ours makes both generations agree).
      */
    def nsUsAligned: Column = expr("ts div 1000 * 1000")

    /** Hour index (µs div 3.6e9) — tumbling-window key. */
    def hourIdx: Column = expr("ts div 1000 div 3600000000")

    /** `TimestampType` event time at µs precision — the form Spark's
      * window/watermark/session operators require.
      */
    def eventTime: Column = timestamp_micros(us)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
