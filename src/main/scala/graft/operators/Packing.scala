package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents (or chunks) out into fixed-capacity
  * training bins — the layout step between curation and tokenized
  * batches.
  *
  * This is GREEDY CONTIGUOUS packing: rows are placed in a deterministic
  * order (per group) and each row's bin is wherever its running-total
  * START position falls — `bin_id = start div capacity`,
  * `bin_offset = start mod capacity`. A row can straddle its bin's end;
  * downstream either splits it at the boundary (the usual pre-training
  * choice — offsets give the exact cut points) or pads. Contiguity is
  * what makes the layout a pure running-total window: one shuffle on the
  * group, no bin-packing coordination state, identical output under any
  * partitioning (vs first-fit-decreasing, which is inherently sequential
  * and unstable under reordering — the wrong trade at corpus scale for
  * a few percent less padding).
  */
object Packing {

  /** @param capacity bin size in tokens (e.g. the training context
    *                 length); bins are per `groupCol` value
    * @return input rows plus (bin_id, bin_offset) — bin-relative start —
    *         and seq_tokens (the row's own token count echoed as long)
    */
  def contiguousPack(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      tokensCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("seq_tokens", col(tokensCol).cast("long"))
      .withColumn("pack_start",
        sum(col(tokensCol).cast("long")).over(w) - col(tokensCol).cast("long"))
      .withColumn("bin_id", expr(s"pack_start div ${capacity}L"))
      .withColumn("bin_offset", expr(s"pack_start % ${capacity}L"))
      .drop("pack_start")
  }

  /** [[contiguousPack]] at corpus scale: identical output (packing is a
    * pure per-group prefix sum), but the running total runs two-phase via
    * [[ShardedPrefix.exclusivePrefixSum]] — per-shard sums in parallel
    * plus broadcast shard offsets — instead of one window partition per
    * group. The one-window form serializes each group through a single
    * task (a 30 TB source = one task); this is the production path.
    * Equality with the one-window form is property-tested
    * (ShardedPrefixSpec). `orderCol` must be numeric, non-null, unique
    * per group (the [[ShardedPrefix]] contract).
    */
  def contiguousPackSharded(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      tokensCol: String,
      capacity: Long,
      shards: Int = 32): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    ShardedPrefix.exclusivePrefixSum(
        df.withColumn("seq_tokens", col(tokensCol).cast("long")),
        groupCol, orderCol, col(tokensCol).cast("long"), "pack_start", shards)
      .withColumn("bin_id", expr(s"pack_start div ${capacity}L"))
      .withColumn("bin_offset", expr(s"pack_start % ${capacity}L"))
      .drop("pack_start")
  }
}
