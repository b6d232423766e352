package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed hour grid per key and forward-fill gaps — the step that turns
  * raw event logs into the aligned series every downstream aggregate /
  * model-feature join expects.
  *
  * Semantics: per user, one row per hour from their first to last active
  * hour; `value_ff` = the last observed value at or before that hour
  * (within an hour, "last" orders by (µs timestamp, event id) — µs, not
  * ns, so the tiebreak is identical to engines that truncate nanosecond
  * parquet timestamps); `is_gap` marks hours with no event. The first
  * grid hour always has an observation, so `value_ff` is never null.
  *
  * Scale shape: the in-hour "last" is a max of a (ts, id, value) struct
  * — one map-side-combined aggregate, never a sort; the grid is a
  * bounded narrow `sequence` explode (span/step rows per key); the fill
  * is one per-key window ordered by hour. Per-key state is span-sized
  * (a month = 720 rows) — for multi-year spans at billions of keys,
  * shard the fill with the [[ShardedPrefix]] two-phase pattern.
  * `maxSpanHours` fail-fasts a key whose span would explode the grid
  * (one corrupt epoch-0 timestamp next to a current one = a 480k-hour
  * grid row bomb per key) instead of silently materializing it.
  */
object Resample {

  val HourNs = 3600000000000L

  def hourlyForwardFill(
      events: DataFrame,
      userCol: String,
      tsNsCol: String,
      idCol: String,
      valueCol: String,
      maxSpanHours: Long = 100000L): DataFrame = {
    require(maxSpanHours > 0, s"maxSpanHours must be positive: $maxSpanHours")
    val e = events.select(
      col(userCol).as("user_id"),
      expr(s"$tsNsCol div $HourNs").as("h"),
      expr(s"$tsNsCol div 1000").as("__us"),
      col(idCol).as("__id"),
      col(valueCol).as("__v"))
    val hourly = e.groupBy("user_id", "h")
      .agg(max(struct(col("__us"), col("__id"), col("__v"))).as("__last"))
      .select(col("user_id"), col("h"), col("__last.__v").as("hour_value"))
    val grid = e.groupBy("user_id")
      .agg(min("h").as("__h0"), max("h").as("__h1"))
      .select(col("user_id"),
        explode(expr(s"""CASE WHEN __h1 - __h0 <= ${maxSpanHours}L
          | THEN sequence(__h0, __h1)
          | ELSE raise_error(concat('Resample.hourlyForwardFill: key ',
          |   CAST(user_id AS STRING), ' spans ', CAST(__h1 - __h0 AS STRING),
          |   ' hours > maxSpanHours=${maxSpanHours} — likely a corrupt
          |   timestamp; clean or raise the cap')) END""".stripMargin
          .replace("\n", " "))).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select(
        col("user_id"), col("h"),
        last(col("hour_value"), ignoreNulls = true).over(w).as("value_ff"),
        col("hour_value").isNull.as("is_gap"))
  }
}
