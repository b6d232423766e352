package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables: the 100 TB answer to REPEATED
  * same-key joins and aggregations. Writing both sides bucketed on the
  * join key — same bucket count, sorted within buckets — lets every later
  * join/groupBy on that key run with ZERO shuffle exchange: each task
  * sort-merges bucket i of the left table against bucket i of the right
  * (`BucketedJoinSpec` proves the no-Exchange property on the real plan).
  *
  * The write itself costs one shuffle; the point is amortization — bucket
  * once at ingest, then every downstream join of the fact tables (daily
  * reports, backfills, the reference's repeated reruns over the same
  * inputs, SURVEY.md §2 O10) skips its exchange. Bucket count is chosen
  * at write time to keep bucket files near the executor-memory sweet spot
  * at the deployment's scale; it must match on both sides of a join.
  */
object Bucketing {

  /** Write `df` as a parquet-backed managed table bucketed (and sorted)
    * on `key`. Overwrites any previous table of that name — including the
    * stale-location case: a managed table written by an EARLIER session
    * into the same warehouse dir is unknown to a fresh metastore, so its
    * leftover files would fail the CREATE with LOCATION_ALREADY_EXISTS;
    * the location is cleared explicitly after the DROP.
    */
  /** DROP the managed table and clear any stale warehouse location a
    * previous session left behind (fresh-metastore + old-warehouse runs
    * would otherwise fail the CREATE with LOCATION_ALREADY_EXISTS).
    * Default-database unqualified names only — a qualified name would
    * both misparse under the backticks and compute the wrong location.
    */
  def dropWithLocation(spark: SparkSession, table: String): Unit = {
    require(!table.contains("."),
      s"expected an unqualified default-database table name, got '$table'")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    dropWithLocation(df.sparkSession, table)
    // Pre-shuffle onto the bucket hash (r22 — guide §6 "hash
    // distribution before the write"): a V1 bucketed write otherwise
    // emits one file per (input task x non-empty bucket) — a 32-task
    // upstream fragments the table into up to 32 x buckets KB-scale
    // files every later scan pays open cost on, while a single-task
    // upstream (one small parquet input) serializes the whole
    // sort+encode on one core. repartition(buckets, key) IS the bucket
    // mapping (HashPartitioning = pmod(murmur3, n), exactly the
    // function bucketBy applies), so each writer task holds exactly
    // one whole bucket: `buckets` files total, `buckets`-way write
    // parallelism, identical rows in identical buckets.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Append into a bucketed table (creating it on first use), SAME bucket
    * spec — the per-micro-batch write an accumulating delta segment uses
    * (e.g. streaming IVF maintenance: each arrival batch appends its
    * bucket files; readers see base ∪ all appended batches). Unlike
    * [[writeBucketed]] this is NOT idempotent per call — a replayed batch
    * appends twice; exactly-once is the streaming engine's job
    * (checkpointed foreachBatch ids).
    */
  def appendBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("append")
      .saveAsTable(table)

  /** Bucket both sides of a join on their keys and return the co-located
    * table handles. Same bucket count on both sides — the requirement for
    * the shuffle-free plan.
    */
  def colocate(
      spark: SparkSession,
      left: DataFrame, leftKey: String, leftTable: String,
      right: DataFrame, rightKey: String, rightTable: String,
      buckets: Int): (DataFrame, DataFrame) = {
    writeBucketed(left, leftTable, leftKey, buckets)
    writeBucketed(right, rightTable, rightKey, buckets)
    (spark.table(leftTable), spark.table(rightTable))
  }
}
