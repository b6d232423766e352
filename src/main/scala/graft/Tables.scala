package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md).
  *
  * One parquet file per table under `\$dir/<name>.parquet`. The `events`
  * table carries a nanosecond-precision parquet timestamp; Spark's parquet
  * reader cannot represent TIMESTAMP(NANOS) in `TimestampType` (µs), so we
  * read it with `spark.sql.legacy.parquet.nanosAsLong=true` semantics when
  * needed — exposed here as [[eventsWithTsNs]] which yields `ts` as int64
  * nanoseconds, matching the reference's own int64-ns data model
  * (SURVEY.md §1: `main.js:158-162`).
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

  /** `events` with `ts` surfaced as int64 nanoseconds-since-epoch.
    *
    * The parquet file carries TIMESTAMP(NANOS), which Spark's µs
    * `TimestampType` cannot represent ([PARQUET_TYPE_ILLEGAL]);
    * `spark.sql.legacy.parquet.nanosAsLong` reads it losslessly as
    * `LongType` — which is also the reference's own representation
    * (int64 ns operated on as BigInt, `/root/reference/main.js:158-162`).
    * The conf only affects NANOS-precision parquet columns, so leaving it
    * set is harmless for every other table. It IS session-sticky by
    * design (the flag must be live whenever this DataFrame plans/executes,
    * so restoring it here would be a use-after-free): in a session shared
    * with foreign code that reads ns-precision parquet and expects the
    * PARQUET_TYPE_ILLEGAL error or µs semantics, isolate with
    * `spark.newSession()`.
    */
  def eventsTsNs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
