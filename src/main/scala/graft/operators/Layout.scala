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
}
