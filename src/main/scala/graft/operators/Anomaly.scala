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
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("__n"),
        sum(dec).cast("double").as("__sv"),
        sum(dec * dec).cast("double").as("__sv2"))
      .select(groupCols.map(col) ++ Seq(
        mean.as("__mean"),
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
