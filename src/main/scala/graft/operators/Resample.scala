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
  * [[hourlyForwardFillSharded]] shards the fill with the
  * [[ShardedPrefix]] two-phase pattern ("last non-null" is an
  * associative reduce, so it decomposes exactly like a prefix sum).
  * `maxSpanHours` fail-fasts a key whose span would explode the grid
  * (one corrupt epoch-0 timestamp next to a current one = a 480k-hour
  * grid row bomb per key) instead of silently materializing it.
  */
object Resample {

  val HourNs = 3600000000000L

  /** FLOOR division of a BIGINT SQL expression by a positive constant.
    * SQL `div` truncates toward zero while DuckDB's `//` (and
    * mathematical flooring) round toward -infinity — they differ on
    * negative operands, so a pre-1970 timestamp bucketed with `div`
    * lands on a different hour/day than the oracle. The correction
    * subtracts one exactly when the truncating division rounded up
    * (remainder negative).
    */
  def floorDivSql(a: String, d: Long): String = {
    require(d > 0, s"divisor must be positive: $d")
    s"((($a) div $d) - (CASE WHEN ($a) % $d < 0 THEN 1 ELSE 0 END))"
  }

  /** Shared prep for both fill forms: the complete per-key hour grid
    * left-joined with the in-hour "last" observation — (user_id, h,
    * hour_value) with hour_value null on gap hours.
    */
  private def hourGrid(
      events: DataFrame,
      userCol: String,
      tsNsCol: String,
      idCol: String,
      valueCol: String,
      maxSpanHours: Long): DataFrame = {
    require(maxSpanHours > 0, s"maxSpanHours must be positive: $maxSpanHours")
    val e = events.select(
      col(userCol).as("user_id"),
      expr(floorDivSql(tsNsCol, HourNs)).as("h"),
      expr(floorDivSql(tsNsCol, 1000L)).as("__us"),
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
    grid.join(hourly, Seq("user_id", "h"), "left")
  }

  def hourlyForwardFill(
      events: DataFrame,
      userCol: String,
      tsNsCol: String,
      idCol: String,
      valueCol: String,
      maxSpanHours: Long = 100000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourGrid(events, userCol, tsNsCol, idCol, valueCol, maxSpanHours)
      .select(
        col("user_id"), col("h"),
        last(col("hour_value"), ignoreNulls = true).over(w).as("value_ff"),
        col("hour_value").isNull.as("is_gap"))
  }

  /** The multi-year-span escape hatch: identical output to
    * [[hourlyForwardFill]] (equality-property-tested), but the per-key
    * fill runs over `shards` ORDER-CONTIGUOUS hour ranges instead of one
    * window partition per key — parallelism keys x shards, per-task state
    * span/shards rows.
    *
    * Decomposition: "last non-null at or before h" is an associative
    * reduce (rightmost non-null wins), so it splits exactly like
    * [[ShardedPrefix.exclusivePrefixSum]]: (1) running last-non-null
    * within each (key, shard); (2) a TINY (keys x shards) table of each
    * shard's final observation, turned into a per-shard carry-in with a
    * null-skipping `last` window over the tiny table; (3) join the
    * carries back — fill = coalesce(within-shard last, carry-in). The
    * wide exchange on (key, shard) is shared between the window and the
    * carry aggregate (the exchange-reuse shape ShardedPrefixSpec pins
    * for prefix sums).
    *
    * The carry join's strategy is left to Catalyst/AQE deliberately: the
    * carries table is keys x shards rows, so at modest key counts AQE
    * broadcasts it, while at the billions-of-keys scale this operator
    * exists for a forced broadcast would blow the driver/broadcast
    * limits — there AQE falls back to a shuffled join on the same
    * (key, shard) layout the frame already has.
    */
  def hourlyForwardFillSharded(
      events: DataFrame,
      userCol: String,
      tsNsCol: String,
      idCol: String,
      valueCol: String,
      maxSpanHours: Long = 100000L,
      shards: Int = 32): DataFrame = {
    val g = hourGrid(events, userCol, tsNsCol, idCol, valueCol, maxSpanHours)
    val sharded = ShardedPrefix.withOrderShard(g, "user_id", "h", shards, "__shard")
    val wIn = Window.partitionBy("user_id", "__shard").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = sharded.withColumn("__in_last",
      last(col("hour_value"), ignoreNulls = true).over(wIn))
    // Tiny: keys x shards rows. max skips nulls, and (h, value) struct
    // ordering makes it "the observation at the latest observed hour".
    val shardLast = filled.groupBy("user_id", "__shard")
      .agg(max(when(col("hour_value").isNotNull,
        struct(col("h"), col("hour_value")))).as("__obs"))
    val wCarry = Window.partitionBy("user_id").orderBy("__shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = shardLast
      .withColumn("__carry",
        last(col("__obs"), ignoreNulls = true).over(wCarry)("hour_value"))
      .drop("__obs")
    filled.join(carries, Seq("user_id", "__shard"))
      .select(
        col("user_id"), col("h"),
        coalesce(col("__in_last"), col("__carry")).as("value_ff"),
        col("hour_value").isNull.as("is_gap"))
  }
}
