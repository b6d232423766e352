package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderInterleave

/** Multi-dimensional data layout: order rows along a Z (Morton) curve so
  * that files and row groups stay clustered in BOTH dimensions. A
  * single-column sort only ever prunes on its leading column; the
  * z-layout lets parquet min/max statistics skip most files for a box
  * predicate on EITHER dimension — the write-side technique that turns
  * full scans into partial scans at 100 TB (LayoutSpec measures the file
  * pruning on a real written-and-filtered grid).
  */
object Layout {

  /** Order `df` along the z-curve of two integral dimensions: one range
    * exchange on the z-value (sampled boundaries, a distributed sort) +
    * local sorts — the same honest total-order cost as
    * [[Sampling.materializeOrder]], keyed by the interleaved curve.
    * Write the result with `df.write.parquet` and each output file holds
    * a compact z-range, i.e. a small rectangle of the dimension space.
    *
    * The curve key is RETAINED in the output as `z_value` (deliberate:
    * written alongside the data it lets a reader range-filter on the
    * curve directly, and its file min/max stats are the pruning handle).
    * The input must not already carry a `z_value` column — refused
    * loudly rather than silently overwritten.
    *
    * Dimension contract: the interleave is RAW-BIT, so the two
    * dimensions must span comparable value ranges — if one is orders of
    * magnitude wider, its high bits dominate the curve and the layout
    * degenerates to a single-column sort (no pruning on the narrow
    * dimension). Pre-scale skewed dimensions onto a common lattice,
    * e.g. `dim * 32767 / (max + 1)` (Bench's zorder metric shows the
    * pattern; production systems rank-normalize the same way).
    */
  def zOrderBy(
      df: DataFrame,
      dimA: Column,
      dimB: Column,
      partitions: Int): DataFrame = {
    require(partitions > 0, s"partitions must be positive: $partitions")
    require(!df.columns.contains("z_value"),
      "zOrderBy emits the curve key as `z_value`; the input already has " +
        "a z_value column — rename it first (silent overwrite refused)")
    df.withColumn("z_value", ZOrderInterleave.zorderInterleave(dimA, dimB))
      .repartitionByRange(partitions, col("z_value"))
      .sortWithinPartitions("z_value")
  }

  /** Fixed z-range bucket: `z_value >> shiftBits` — DETERMINISTIC curve
    * segments, unlike [[zOrderBy]]'s sampled range boundaries (which
    * differ run to run). Stable bucket identity across writes is what
    * makes the layout INCREMENTALLY maintainable: an arrival batch lands
    * in exactly the buckets its z-values name, and compaction can
    * rewrite those buckets without touching (or even listing) the rest.
    * The cost of fixed-width segments is skew tolerance — a hot
    * rectangle concentrates rows in few buckets — so `shiftBits` sets
    * the granularity trade (smaller shift = more, finer buckets).
    */
  def zBucket(z: Column, shiftBits: Int): Column = {
    require(shiftBits >= 1 && shiftBits <= 61, s"shiftBits out of range: $shiftBits")
    call_function("shiftright", z, lit(shiftBits))
  }

  private def withZCols(
      df: DataFrame, dimA: Column, dimB: Column, shiftBits: Int): DataFrame =
    df.withColumn("z_value", ZOrderInterleave.zorderInterleave(dimA, dimB))
      .withColumn("zbucket", zBucket(col("z_value"), shiftBits))

  /** Write `df` as a zbucket-partitioned, z-sorted base layout: one
    * parquet file per non-empty bucket (hash repartition on the bucket
    * puts each bucket in one task; `partitionBy` splits directories),
    * rows z-sorted within — so every file holds one compact curve
    * segment and its min/max stats prune box predicates on either
    * dimension, same as [[zOrderBy]]'s output.
    */
  def writeZBase(
      df: DataFrame, dimA: Column, dimB: Column,
      dir: String, shiftBits: Int): Unit =
    withZCols(df, dimA, dimB, shiftBits)
      .repartition(col("zbucket"))
      .sortWithinPartitions("zbucket", "z_value")
      .write.mode("overwrite").partitionBy("zbucket").parquet(dir)

  /** Append an arrival batch into the bucketed layout (small files land
    * INSIDE their bucket directories — readers stay correct immediately,
    * just less pruned) and return the touched bucket ids. The returned
    * set is bucket-geometry-bounded (distinct buckets, not rows) — the
    * deliberate driver-side scalar the compaction plan needs, same class
    * as BloomScreen's maxPlanBits-bounded collect.
    */
  def appendArrivals(
      arrivals: DataFrame, dimA: Column, dimB: Column,
      dir: String, shiftBits: Int): Seq[Long] = {
    val keyed = withZCols(arrivals, dimA, dimB, shiftBits)
    keyed.write.mode("append").partitionBy("zbucket").parquet(dir)
    keyed.select("zbucket").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
  }

  /** Re-compact ONLY the touched buckets: read them back (partition
    * pruning keeps untouched directories unlisted in the scan), re-sort
    * each bucket locally, and dynamic-partition-overwrite — untouched
    * bucket files are never rewritten, so compaction cost scales with
    * the ARRIVAL footprint, not the table. After compaction every
    * touched bucket is again one z-sorted file; contents are identical
    * to a from-scratch [[writeZBase]] of the full data (spec-pinned and
    * oracle-checked via q166) because bucket identity is deterministic.
    * At 100 TB this is the OPTIMIZE-ZORDER lifecycle: base write once,
    * appends land bucket-local, compaction amortizes per touched
    * segment.
    */
  def compactTouched(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, touched: Seq[Long]): Unit = {
    if (touched.isEmpty) return
    // localCheckpoint pins the touched rows (arrival-footprint-sized,
    // never table-sized) before the overwrite: Spark refuses a write
    // whose plan still reads the destination path, and the checkpoint
    // also guarantees the old files aren't needed mid-rewrite. Block
    // order survives checkpointing, so the per-bucket z-sort holds.
    val compacted = spark.read.parquet(dir)
      .filter(col("zbucket").isin(touched: _*))
      .repartition(col("zbucket"))
      .sortWithinPartitions("zbucket", "z_value")
      .localCheckpoint()
    try compacted.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("zbucket").parquet(dir)
    finally compacted.unpersist()
  }

  /** File-skipping audit — the number that justifies paying for a
    * layout: simulate the file geometry a writer would produce (fixed
    * `chunkSize`-row files cut along the layout's total order `okeyCol`),
    * record each file's min/max of `valueCol` (exactly what parquet
    * footers store), and evaluate a range predicate `[lo, hi]` the way a
    * footer-pruning reader does — a file is READ iff its [min, max]
    * overlaps the range. One row: total files, files read, rows read
    * (the I/O actually paid), rows matched (the useful part). Run it
    * once over a clustered okey and once over a scattered one and the
    * gap between rows_read and rows_matched IS the layout's value.
    *
    * The rank that cuts files is [[ShardedPrefix.globalRank]] over one
    * corpus-wide group — the two-phase sharded device, never a
    * single-task window; per-file stats are one groupBy on the file id.
    * `okeyCol` must be a unique non-null long (the rank contract; the
    * audit's chunk stats inherit determinism from it).
    */
  def skippingAudit(
      df: DataFrame,
      okeyCol: String,
      valueCol: String,
      layout: String,
      chunkSize: Long,
      lo: Long,
      hi: Long): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    val v = col(valueCol)
    val chunks = ShardedPrefix.globalRank(
        df.withColumn("__g", lit(1)), "__g", okeyCol, "__rank")
      .withColumn("__chunk", expr(s"(__rank - 1) div ${chunkSize}L"))
      .groupBy("__chunk")
      .agg(
        min(v).as("__mn"), max(v).as("__mx"),
        count(lit(1)).as("__n"),
        sum(when(v.between(lo, hi), 1L).otherwise(0L)).as("__matched"))
    val read = col("__mx") >= lo && col("__mn") <= hi
    chunks.agg(
        count(lit(1)).as("n_chunks"),
        sum(when(read, 1L).otherwise(0L)).as("chunks_read"),
        sum(when(read, col("__n")).otherwise(0L)).as("rows_read"),
        sum(col("__matched")).as("rows_matched"))
      .select(lit(layout).as("layout"), col("n_chunks"),
        col("chunks_read"), col("rows_read"), col("rows_matched"))
  }
}
