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
  def groupStats(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val dec = col(valueCol).cast("decimal(18,4)")
    val mean = col("__sv") / col("__n")
    // n counts values that SURVIVE the decimal cast, and any value the
    // cast nulls out (|v| >= 1e14 overflows decimal(18,4) silently under
    // non-ANSI mode) raises instead of skewing mean/std — the silent-
    // wrap class the Bm25/sourceDrift guards exist for. Input nulls are
    // skipped like every aggregate skips them.
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(dec).as("__n"),
        sum(when(col(valueCol).isNotNull && dec.isNull, 1L).otherwise(0L))
          .as("__overflow"),
        sum(dec).cast("double").as("__sv"),
        sum(dec * dec).cast("double").as("__sv2"))
      .select(groupCols.map(col) ++ Seq(
        when(col("__overflow") === 0, mean)
          .otherwise(raise_error(concat(
            lit("Anomaly.groupStats: "), col("__overflow").cast("string"),
            lit(" value(s) overflow decimal(18,4); widen the cast or " +
              "clean the metric")))).as("__mean"),
        sqrt(greatest(col("__sv2") / col("__n") - mean * mean, lit(0.0)))
          .as("__std")): _*)
  }

  def zScores(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      keepCols: Seq[String],
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val z = (col(valueCol) - col("__mean")) / col("__std")
    df.join(groupStats(df, groupCols, valueCol), groupCols)
      .select(keepCols.map(col) ++ groupCols.map(col) ++ Seq(
        col(valueCol),
        when(col("__std") > 0, z).otherwise(lit(0.0)).as("z"),
        when(col("__std") > 0, abs(z) > threshold).otherwise(lit(false))
          .as("is_anomaly")): _*)
  }
}
