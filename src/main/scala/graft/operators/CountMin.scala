package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over an item stream, materialized as its count
  * matrix — the heavy-hitter / frequency-estimate primitive that
  * complements the KMV distinct sketch: fixed depth x width cells
  * regardless of stream size, mergeable by cell-wise addition, estimate
  * never under-counts.
  *
  * The hash family is the portable md5-derived 32-bit hash with a
  * per-row salt, so the sketch is DETERMINISTIC and engine-portable: the
  * whole matrix reproduces bit-for-bit in any engine with md5 (which is
  * what lets the oracle check the sketch itself, not just its
  * estimates). Scale shape: one narrow depth-way cell explode, one
  * map-side-combined shuffle whose key space is depth x width cells —
  * the aggregate output is CONSTANT-sized however large the corpus.
  */
object CountMin {

  /** Row `r`'s cell index for an item: the salted portable hash mod
    * `width` — public so row-local probes ([[CorpusStats
    * .tokenRaritySketch]]) evaluate the identical hash family without
    * duplicating the formula.
    */
  def cellExpr(item: Column, r: Int, width: Int): Column =
    pmod(
      TextAnalysis.portableHash32(concat(lit(s"cm$r:"), item)),
      lit(width.toLong))

  private def cellCol(itemCol: String, r: Int, width: Int) =
    cellExpr(col(itemCol), r, width)

  /** Build the sketch: one row per non-empty cell, (r, c, cnt).
    * Cells never touched by the stream are absent (implicitly zero) —
    * at depth 4 x width 64 the dense form is at most 256 rows.
    */
  def sketch(
      items: DataFrame,
      itemCol: String,
      depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape: $depth x $width")
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("r"), cellCol(itemCol, r, width).as("c")))
    items.select(explode(array(cells: _*)).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two count-min matrices built over DISJOINT underlying
    * multisets: cell-wise SUM — the additive monoid that lets per-shard /
    * per-batch sketches fold into a served global sketch without
    * touching raw data again (commutative and associative, so shard
    * order never matters; absent cells are implicit zeros and pass
    * through). The estimate bound is preserved exactly: counting a
    * multiset union cell-by-cell IS counting the union, so
    * merge(sketch(A), sketch(B)) == sketch(A ⊎ B) row for row.
    *
    * REPLAY CAVEAT (the one way this differs from the HLL max-merge,
    * [[HyperLogLog.merge]]): max is idempotent — folding the same shard
    * twice is harmless there — but sum is not, so each underlying item
    * must be counted into exactly ONE input. In a streaming fold that is
    * the engine's checkpointed-batch-id contract (the
    * [[graft.operators.Bucketing.appendBucketed]] note); in a batch
    * pipeline, disjoint input partitions (as q162's even/odd split).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("r"), col("c"), col("cnt"))
      .unionByName(b.select(col("r"), col("c"), col("cnt")))
      .groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate item frequencies against a built sketch: min over
    * rows of the item's cell counts (the classic CMS upper bound — never
    * below the true count, above it only through collisions). The sketch
    * is broadcast (it is constant-sized by construction); a missing cell
    * means no stream item ever hashed there, so the estimate is 0.
    */
  def estimate(
      sk: DataFrame,
      queries: DataFrame,
      itemCol: String,
      depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape: $depth x $width")
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("r"), cellCol(itemCol, r, width).as("c")))
    queries
      .select(col(itemCol).as("item"),
        explode(array(cells: _*)).as("cell"))
      .join(broadcast(sk),
        col("cell.r") === col("r") && col("cell.c") === col("c"),
        "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
