package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group z-score anomaly flagging — the metric-stream outlier screen
  * (a value more than `threshold` standard deviations from its group's
  * mean), with the group statistics computed under the
  * [[graft.queries.Q]] determinism contract: sums accumulate in exact
  * DECIMAL (order-independent under any partitioning) and cast to
  * double ONCE, so mean/std/z are fixed-shape IEEE scalar ops both
  * engines reproduce bit for bit. Constant groups (std = 0) flag
  * nothing and score z = 0 rather than dividing by zero.
  *
  * Scale shape: one map-side-combined group aggregate (output bounded
  * by the group-key space, not the stream), joined back on the group
  * key — broadcast when small, hash otherwise (AQE decides); the
  * scoring itself is a narrow projection.
  */
object Anomaly {

  /** The (groupCols..., __mean, __std) statistics table — exposed so the
    * streaming serving twin ([[graft.streaming.EventStream.anomalyScored]])
    * can score arrivals against a batch-refreshed copy of exactly these
    * numbers.
    */
  /** @param precision
    *   decimal accumulator precision (default 18 — values up to ~1e14
    *   at scale 4). A legitimately large metric opts into a wider
    *   accumulator here instead of editing the operator; determinism is
    *   unchanged (DECIMAL sums are exact at any precision).
    * @param scale decimal accumulator scale (fractional digits kept).
    */
  def groupStats(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      precision: Int = 18,
      scale: Int = 4): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(precision >= 1 && precision <= 38 && scale >= 0 && scale < precision,
      s"invalid decimal($precision,$scale): need 1 <= precision <= 38, 0 <= scale < precision")
    val decTy = s"decimal($precision,$scale)"
    val dec = col(valueCol).cast(decTy)
    val mean = col("__sv") / col("__n")
    // n counts values that SURVIVE the decimal cast, and any value the
    // cast nulls out (overflowing decimal(precision,scale) silently under
    // non-ANSI mode) raises instead of skewing mean/std — the silent-
    // wrap class the Bm25/sourceDrift guards exist for. Input nulls are
    // skipped like every aggregate skips them. The SUMS can also
    // overflow without any single value doing so (sum(dec*dec) caps at
    // decimal(38,2*scale); ~100 values near the cast limit overflow it
    // to NULL non-ANSI, and greatest(NULL, 0.0) would then report
    // std = 0 for the whole group) — so a null sum over a non-empty
    // group raises through the same fail-fast gate.
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(dec).as("__n"),
        sum(when(col(valueCol).isNotNull && dec.isNull, 1L).otherwise(0L))
          .as("__overflow"),
        sum(dec).cast("double").as("__sv"),
        sum(dec * dec).cast("double").as("__sv2"))
      .select(groupCols.map(col) ++ Seq(
        when(col("__overflow") > 0, raise_error(concat(
            lit("Anomaly.groupStats: "), col("__overflow").cast("string"),
            lit(s" value(s) overflow $decTy; widen precision/scale or " +
              "clean the metric"))))
          .when(col("__n") > 0 && (col("__sv").isNull || col("__sv2").isNull),
            raise_error(lit(
              s"Anomaly.groupStats: group sum overflows the $decTy " +
                "accumulator (decimal 38-digit cap); widen precision/scale " +
                "or clean the metric")))
          .otherwise(mean).as("__mean"),
        sqrt(greatest(col("__sv2") / col("__n") - mean * mean, lit(0.0)))
          .as("__std")): _*)
  }

  def zScores(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      keepCols: Seq[String],
      threshold: Double = 3.0,
      precision: Int = 18,
      scale: Int = 4): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val z = (col(valueCol) - col("__mean")) / col("__std")
    df.join(groupStats(df, groupCols, valueCol, precision, scale), groupCols)
      .select(keepCols.map(col) ++ groupCols.map(col) ++ Seq(
        col(valueCol),
        when(col("__std") > 0, z).otherwise(lit(0.0)).as("z"),
        when(col("__std") > 0, abs(z) > threshold).otherwise(lit(false))
          .as("is_anomaly")): _*)
  }
}
