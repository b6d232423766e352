package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HDR-style quantile histogram sketch over non-negative integer metrics
  * (latencies, token counts, sizes): values bucket by (exponent,
  * top-`subBits`-mantissa), giving a fixed <= ~64 * 2^subBits cells per
  * group with relative bucket width 2^-subBits — the HdrHistogram /
  * DDSketch idea with base-2 buckets so EVERYTHING is integer
  * arithmetic. Completes the mergeable-sketch family: distinct samples
  * (KMV q54), frequency (count-min q98), cardinality (HLL q103), and now
  * quantiles — merge is cell-wise COUNT ADDITION, so per-shard
  * histograms roll up without rescanning data.
  *
  * DETERMINISM: the exponent is `length(bin(v)) - 1` (the minimal binary
  * rendering both Spark and DuckDB provide — an exact floor(log2) with
  * no libm), sub-buckets are right-shifts, bucket lower bounds are
  * left-shifts, and the quantile walk is a cumulative-count scan picking
  * integer bucket bounds at integer ranks. The sketch AND the quantile
  * estimates reproduce bit-for-bit in any engine with md5-free integer
  * SQL — both are DuckDB-oracle-checked (q108/q109).
  *
  * Scale shape: one exchange onto the constant (group x cell) key space
  * with count as the map-side combiner; the quantile walk runs on the
  * constant-size sketch, never on raw data. Estimates are bucket LOWER
  * bounds: est <= true q-quantile < est * (1 + 2^-subBits) + 1, the
  * guarantee HdrSketchSpec pins.
  */
object HdrSketch {

  /** Exponent cell: floor(log2 v) for v > 0, -1 for v = 0 (its own exact
    * cell). Negative inputs violate the contract and fail fast rather
    * than bucketing as garbage (bin() of a negative long is its 64-bit
    * two's complement — e = 63 — which would silently poison the tail).
    */
  private def eCol(v: Column, subBits: Int): Column =
    when(v < 0, raise_error(concat(
      lit("HDR_SKETCH_NEGATIVE_VALUE: hdr sketch requires non-negative values, got "),
      v.cast("string"))))
      .when(v === 0, lit(-1))
      .otherwise(length(bin(v)) - lit(1))

  /** Sub-bucket: the value itself while exponents still resolve exactly
    * (e <= subBits), else the top subBits+1 mantissa bits (leading bit
    * kept, so sub ranges over [2^subBits, 2^(subBits+1)) there).
    */
  private def subCol(v: Column, e: Column, subBits: Int): Column =
    when(e <= subBits, v)
      .otherwise(call_function("shiftright", v, (e - lit(subBits)).cast("int")))

  /** Inclusive lower bound of cell (e, sub) — the quantile estimate the
    * walk emits. Exact cells (e <= subBits) bound at the value itself.
    */
  def lowerBound(e: Column, sub: Column, subBits: Int): Column =
    when(e <= subBits, sub)
      .otherwise(call_function("shiftleft", sub, (e - lit(subBits)).cast("int")))

  /** Build the histogram: one row per non-empty cell,
    * (groupCols..., e, sub, cnt). Constant-size per group regardless of
    * stream size; merge sketches by summing cnt on (group, e, sub).
    */
  def sketch(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      subBits: Int): DataFrame = {
    require(subBits >= 1 && subBits <= 16, s"subBits must be in [1,16]: $subBits")
    df.select(groupCols.map(col) :+ col(valueCol).cast("long").as("__hdr_v"): _*)
      .withColumn("e", eCol(col("__hdr_v"), subBits))
      .withColumn("sub", subCol(col("__hdr_v"), col("e"), subBits))
      .groupBy(groupCols.map(col) :+ col("e") :+ col("sub"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two histograms: cell-wise count addition — the same additive
    * monoid as [[CountMin.merge]], with the SAME delivery-semantics
    * contract: merge(sketch(A), sketch(B)) == sketch(A ⊎ B) holds for
    * DISJOINT underlying multisets only.
    *
    * REPLAY CAVEAT (mirroring `CountMin.merge`, and unlike
    * [[HyperLogLog.merge]]'s idempotent cell-wise max): sum is NOT
    * idempotent, so folding the same shard twice double-counts every
    * cell — counts inflate and every quantile walk shifts (spec-pinned
    * in HdrSketchSpec). Each underlying value must be counted into
    * exactly ONE merge input: in a streaming fold that is the engine's
    * checkpointed-batch-id exactly-once contract; in a batch pipeline,
    * disjoint input partitions.
    */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols ++ Seq("e", "sub")
    a.select((keys :+ "cnt").map(col): _*)
      .unionByName(b.select((keys :+ "cnt").map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile estimates from a histogram: for each (label, q), the lower
    * bound of the first cell (in (e, sub) order) whose cumulative count
    * reaches rank ceil(q * n). Integer ranks, integer bounds — the whole
    * walk is oracle-reproducible.
    *
    * Plan shape: the group total `n` comes from a whole-partition window
    * over the SAME frame as the cumulative count — both windows share
    * one (constant-size) exchange on the group keys, so deriving
    * quantiles from a sketch expression costs ONE pass over its input
    * (a naive totals-join would re-evaluate the sketch subtree — at
    * corpus scale, a second full scan). The per-q probes explode a
    * 3-element literal per cell, all on sketch-sized data.
    */
  def quantiles(
      sk: DataFrame,
      groupCols: Seq[String],
      qs: Seq[(String, Double)],
      subBits: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"quantiles must lie in (0, 1]: $qs")
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cum = sk
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy(col("e"), col("sub"))))
      .withColumn("n", sum(col("cnt")).over(byGroup))
    cum.select(
        groupCols.map(col) :+ col("n") :+ col("cum") :+
          lowerBound(col("e"), col("sub"), subBits).as("__hdr_lb") :+
          explode(array(qs.map { case (name, q) =>
            struct(lit(name).as("pq"), lit(q).as("q"))
          }: _*)).as("p"): _*)
      .withColumn("rank", ceil(col("p.q") * col("n")).cast("long"))
      .filter(col("cum") >= col("rank"))
      .groupBy(groupCols.map(col) :+ col("p.pq").as("pq") :+ col("n") :+ col("rank"): _*)
      .agg(min(col("__hdr_lb")).as("est"))
  }
}
