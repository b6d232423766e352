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

  /** Build the sketch and collect it into a dense depth x width matrix —
    * the plan-literal form row-local probes bake into codegen. The
    * collect is bounded by construction (the [[BloomScreen]]
    * bounded-collect convention): at most `maxPlanCells` cells ever
    * cross to the driver, enforced before any job runs.
    */
  def densePlanMatrix(
      items: DataFrame,
      itemCol: String,
      depth: Int,
      width: Int,
      maxPlanCells: Int = 1 << 16): Array[Array[Long]] = {
    require(depth >= 1 && width >= 1, s"bad sketch shape: $depth x $width")
    require(depth.toLong * width <= maxPlanCells,
      s"$depth x $width cells exceed maxPlanCells = $maxPlanCells: the " +
        "matrix is a plan literal; raise the cap only with a measured " +
        "plan-size check")
    val dense = Array.fill(depth, width)(0L)
    sketch(items, itemCol, depth, width)
      .collect()
      .foreach(r => dense(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    dense
  }

  /** The row-local CMS estimate against a dense plan-literal matrix:
    * min over rows of a literal-array lookup at the item's cell — pure
    * narrow projection inside whole-stage codegen, no join, no shuffle.
    */
  def estimateExpr(
      matrix: Array[Array[Long]],
      item: Column,
      width: Int): Column = {
    val lit2d = typedLit(matrix.map(_.toSeq).toSeq)
    least(matrix.indices.map(r =>
      element_at(element_at(lit2d, r + 1),
        (cellExpr(item, r, width) + 1).cast("int"))): _*)
  }

  /** Two-pass exact heavy hitters: every item value with true count
    * >= `minCount`, found by a row-local CMS screen followed by exact
    * counting of only the SURVIVING rows — output provably identical
    * to the direct group-count (the oracle runs the direct form).
    *
    * Why the screen is lossless: CMS never under-counts, so
    * est >= c_t pointwise and every true heavy hitter passes; false
    * positives (collision-inflated estimates) are removed by the exact
    * second filter. What the screen buys at 100 TB: the exact count's
    * reducer key space and partial-aggregate state shrink from the FULL
    * vocabulary (every task holds a hash map over every distinct value
    * it sees — the dominant memory/shuffle cost for web-scale n-gram
    * vocabularies) to the screened sliver, while the screen itself is a
    * narrow codegen'd filter at scan bandwidth.
    */
  def heavyHitters(
      items: DataFrame,
      itemCol: String,
      depth: Int,
      width: Int,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val m = densePlanMatrix(items, itemCol, depth, width)
    items
      .filter(estimateExpr(m, col(itemCol), width) >= minCount)
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

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
