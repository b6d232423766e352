package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group prefix aggregates (running sum / global rank)
  * over a total order, WITHOUT the single-partition-per-group window.
  *
  * `Window.partitionBy(group).orderBy(order)` with an unbounded-preceding
  * frame puts every row of a group in ONE window partition — at corpus
  * scale a group (a source) is billions of rows on one task. This is the
  * classic two-phase parallel prefix-sum fix:
  *
  *  1. shard each group into `shards` ORDER-CONTIGUOUS ranges (every row
  *     of shard s precedes every row of shard s+1 in the group order);
  *  2. run the running aggregate per (group, shard) — parallelism becomes
  *     groups x shards;
  *  3. aggregate per-shard totals (tiny: groups x shards rows), turn them
  *     into cumulative offsets with a window over that TINY table, and
  *     broadcast-join the offsets back: global prefix = shard offset +
  *     within-shard prefix.
  *
  * Order-contiguity is what makes the decomposition exact, and it falls
  * out of a monotone bucketing of the order key: shard =
  * floor((order - min) * shards / (max - min + 1)) with per-group
  * (min, max) from a map-side-combined aggregate broadcast back. IEEE
  * double multiply/divide round monotonically, so the bucket function is
  * weakly monotone in the order key no matter the value range; skewed
  * order-key distributions only unbalance shard SIZES (performance), never
  * correctness. Same two-phase shape as
  * [[Sampling.fillTokenBudgetSharded]], generalized to unbounded prefixes.
  *
  * Contract: `orderCol` must be numeric, non-null, and unique per group
  * (uniqueness is what makes any running-total layout deterministic —
  * same contract as the one-window form); `groupCol` must be non-null
  * (a null group would drop at the bounds join). Non-nullness is
  * ENFORCED at runtime — a null group or order key raises instead of
  * silently landing in shard 0 with nondeterministic window placement /
  * dropping at the bounds join. The check is a narrow codegen'd branch
  * fused into the bounds aggregate's input (zero extra pass, zero shuffle);
  * per-group uniqueness stays a caller contract (verifying it would
  * cost a full extra shuffle on exactly the key being sharded).
  */
object ShardedPrefix {

  /** Adds `shardName`: a deterministic, order-monotone shard id in
    * [0, shards) within each group, range-contiguous in `orderCol`.
    * Raises `SHARDED_PREFIX_NULL_KEY` on any null group/order key.
    */
  def withOrderShard(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      shards: Int,
      shardName: String): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val o = col(orderCol).cast("double")
    // The null checks ride the BOUNDS AGGREGATE, which sees every input
    // row: the order check is min/max's argument (cannot be pruned), and
    // the GROUP check is fused into the grouping expression itself —
    // the inner bounds join makes the optimizer infer isnotnull(group)
    // and push it below the aggregate, and a filter over the checked
    // grouping expression must still EVALUATE it, so a null group raises
    // instead of silently filtering. Both fire while building the tiny
    // broadcast side, before the join could drop rows from the main
    // stream. Zero extra pass, stays in codegen.
    def nullRaise = raise_error(lit(
      s"SHARDED_PREFIX_NULL_KEY: $groupCol and $orderCol must be non-null " +
        "(ShardedPrefix contract; a null key would mis-shard silently)"))
    val gChecked = when(col(groupCol).isNotNull, col(groupCol)).otherwise(nullRaise)
    val oChecked = when(col(orderCol).isNotNull, o).otherwise(nullRaise)
    val bounds = df.groupBy(gChecked.as(groupCol))
      .agg(min(oChecked).as("__sp_min"), max(oChecked).as("__sp_max"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(shardName,
        greatest(lit(0), least(lit(shards - 1),
          floor((o - col("__sp_min")) * shards /
            (col("__sp_max") - col("__sp_min") + 1.0)).cast("int"))))
      .drop("__sp_min", "__sp_max")
  }

  /** Adds `outCol` = EXCLUSIVE per-group running sum of `value` in
    * `orderCol` order (sum of all strictly-earlier rows; long). Output
    * rows and every input column are unchanged — only the column is
    * added (join key ordering aside).
    *
    * One wide shuffle (hash on (group, shard)); the per-shard totals
    * reuse that exchange (the aggregate hangs off the same shuffled
    * child, pinned in ShardedPrefixSpec), and offsets come back as a
    * broadcast. Cost shape: identical bytes shuffled vs the one-window
    * form, parallelism groups x shards instead of groups.
    */
  def exclusivePrefixSum(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      value: Column,
      outCol: String,
      shards: Int = 32): DataFrame = {
    val v = value.cast("long")
    val sharded = withOrderShard(df, groupCol, orderCol, shards, "__sp_shard")
    val w1 = Window
      .partitionBy(col(groupCol), col("__sp_shard"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = sharded.withColumn("__sp_cum", sum(v).over(w1))
    // Tiny: groups x shards rows. Derived from `marked` so the wide
    // (group, shard) exchange is shared with the window (ReuseExchange).
    val totals = marked.groupBy(col(groupCol), col("__sp_shard"))
      .agg(sum(v).as("__sp_tot"))
    val wOff = Window
      .partitionBy(col(groupCol)).orderBy(col("__sp_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__sp_off", coalesce(sum(col("__sp_tot")).over(wOff), lit(0L)))
      .drop("__sp_tot")
    marked.join(broadcast(offsets), Seq(groupCol, "__sp_shard"))
      .withColumn(outCol, col("__sp_off") + col("__sp_cum") - v)
      .drop("__sp_shard", "__sp_cum", "__sp_off")
  }

  /** Adds `outCol` = exact per-group 1-based rank of the row in
    * `orderCol` order (long) — the distributed `row_number` over
    * `partitionBy(group).orderBy(order)`: an exclusive prefix COUNT
    * plus one.
    */
  def globalRank(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      outCol: String,
      shards: Int = 32): DataFrame =
    exclusivePrefixSum(df, groupCol, orderCol, lit(1L), "__sp_before", shards)
      .withColumn(outCol, col("__sp_before") + 1L)
      .drop("__sp_before")
}
