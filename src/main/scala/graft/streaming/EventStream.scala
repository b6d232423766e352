package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.Tables

/** Structured Streaming surface (north-star extension; the reference is
  * batch-only — SURVEY.md §2 'Streaming ABSENT').
  *
  * The file source replays the same parquet the batch path reads, so each
  * streaming query has an exact batch twin (see q08_window_tumbling) and the
  * spec asserts streaming == batch. `Trigger.AvailableNow`-style draining via
  * `processAllAvailable` makes the tests synchronous.
  *
  * Scale notes: the tumbling agg is keyed on (hour, event_type) — state per
  * open window only; with a watermark the state store evicts closed windows,
  * so memory is bounded by window width x key cardinality, not stream
  * length. The sessionizer keeps one small state row per user.
  */
object EventStream {

  final case class UserActivity(user_id: Long, n_events: Long, total_value: Double)

  /** File-source stream over a DIRECTORY of events parquet files (the file
    * source watches directories). `schemaFrom` points at any existing
    * events table; the stream declares that file's RAW schema (a stream
    * must match the physical encoding on disk) and then applies the same
    * [[Tables.normalizeTsNs]] the batch reader uses, so `ts` is int64 ns
    * here too — batch and stream share one event-time contract whatever
    * the fixture generation's timestamp encoding.
    */
  def readEvents(spark: SparkSession, watchDir: String, schemaFrom: String): DataFrame = {
    // eventsRaw sets the session's nanosAsLong conf (needed for
    // NANOS-generation fixtures) as well as supplying the raw schema.
    val schema = Tables.eventsRaw(spark, schemaFrom).schema
    Tables.normalizeTsNs(spark.readStream.schema(schema).parquet(watchDir))
  }

  /** Streaming twin of q08_window_tumbling: 1-hour tumbling counts/sums.
    * NO watermark — state retains every (hour, type) group for the life
    * of the query, which is fine for the bounded complete-mode test twin
    * this is; a long-running deployment uses
    * [[hourlyCountsWatermarked]], whose watermark evicts closed windows.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(Tables.EventTime.hourIdx.as("hour_idx"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))

  /** Watermarked append-mode tumbling windows over real event-time: the
    * production shape — state for open windows only, closed windows emit
    * exactly once, data later than the 2-hour watermark is dropped. Memory
    * stays bounded by (window width + lateness) x key cardinality no matter
    * how long the stream runs.
    */
  def hourlyCountsWatermarked(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", Tables.EventTime.eventTime)
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))

  /** Stateful per-user accumulation via mapGroupsWithState (the custom-state
    * seam: sessionization, dedup-within-key, CDC fold all plug in here).
    * State is ONE row per distinct user for the life of the query —
    * bounded by key cardinality, not stream length, which is the contract
    * a lifetime-running-total needs. For unbounded key cardinality, swap
    * `NoTimeout` for `ProcessingTimeTimeout`/`EventTimeTimeout` and evict
    * idle keys in the handler (`state.setTimeoutDuration` +
    * `state.hasTimedOut`) — the seam is this same function.
    */
  def userActivity(spark: SparkSession, events: DataFrame): Dataset[UserActivity] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserActivity]) =>
          val prev = state.getOption.getOrElse(UserActivity(user, 0L, 0.0))
          val (n, v) = rows.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), (_, value)) => (cn + 1, cv + value)
          }
          val next = UserActivity(user, n, v)
          state.update(next)
          next
      }
  }

  final case class FunnelProgress(
      user_id: Long,
      step_times_us: Seq[Long], // -1 = step not yet reached
      depth: Long,
      n_events: Long) // total funnel-relevant events folded (monotone)

  /** Streaming twin of the q114 ordered funnel: per-user step times and
    * horizon-gated depth maintained in `mapGroupsWithState` — state is
    * exactly k longs per user (the step-time vector), bounded by key
    * cardinality, never by stream length, which is what lets a funnel
    * run over an unbounded event stream.
    *
    * Semantics contract: equals the batch [[graft.operators.Funnel]]
    * when each user's events are PROCESSED in event-time order. Each
    * micro-batch group is sorted by event time before folding (in-batch
    * disorder is free); an event arriving in a LATER batch with an
    * earlier timestamp than already-folded state can only extend the
    * funnel, never rewind t_k to the smaller value — the same
    * late-data-drops contract as a watermarked aggregation, made
    * explicit here because exact out-of-order repair would need every
    * candidate event retained per user (unbounded state) plus
    * retractions. Emits the updated row per user per batch (Update
    * mode); `n_events` is monotone so a consumer can pick the latest.
    */
  def funnelDepth(
      spark: SparkSession,
      events: DataFrame,
      steps: Seq[String],
      horizonUs: Long): Dataset[FunnelProgress] = {
    import spark.implicits._
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be nonempty and distinct: $steps")
    val stepIdx = steps.zipWithIndex.toMap
    events
      .select(col("user_id"), col("event_type"), Tables.EventTime.us.as("us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[FunnelProgress]) =>
          val prev = state.getOption.getOrElse(
            FunnelProgress(user, Seq.fill(steps.size)(-1L), 0L, 0L))
          val times = prev.step_times_us.toArray
          var n = prev.n_events
          // in-batch event-time order makes "first of step k strictly
          // after t_{k-1}" a single forward fold
          rows.toSeq.sortBy(_._3).foreach { case (_, ty, us) =>
            stepIdx.get(ty).foreach { i =>
              n += 1
              if (times(i) < 0 &&
                (i == 0 || (times(i - 1) >= 0 && us > times(i - 1))))
                times(i) = us
            }
          }
          val depth = times.zipWithIndex.takeWhile { case (t, _) =>
            t >= 0 && t - times(0) <= horizonUs
          }.length.toLong
          val next = FunnelProgress(user, times.toSeq, depth, n)
          state.update(next)
          next
      }
  }

  /** Stream-static enrichment join: each micro-batch of events joins the
    * (small, broadcast) static dimension — the standard streaming lookup
    * pattern; the static side re-resolves per batch, so slowly-changing
    * dims refresh on re-read without restarting the query.
    */
  def enrichedWithUsers(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")

  /** Streaming anomaly scoring — the SERVING face of q139: arrivals
    * score against a batch-computed (group -> mean/std) statistics
    * table via a broadcast stream-static join (the [[enrichedWithUsers]]
    * dim pattern — the static side re-resolves per batch, so a periodic
    * batch refresh of the stats shows up without restarting the query).
    * Zero keyed state, row-local scoring, identical flags to the batch
    * twin fed the same stats (StreamingIncrementalSpec asserts it).
    * Computing the statistics IN-stream would be an aggregation-
    * before-join (state + update mode); the batch-stats/stream-score
    * split is the production anomaly-detection shape.
    */
  def anomalyScored(
      events: DataFrame,
      stats: DataFrame,
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val z = (col("value") - col("__mean")) / col("__std")
    events
      .join(broadcast(stats), Seq("user_id", "event_type"), "left")
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        when(col("__std") > 0, z).otherwise(lit(0.0)).as("z"),
        when(col("__std") > 0, abs(z) > threshold).otherwise(lit(false))
          .as("is_anomaly"))
  }

  /** Streaming exactly-once dedup: drop replayed/duplicate events by id
    * within the watermark horizon — the streaming face of the engine's
    * dedup story. `dropDuplicatesWithinWatermark` keys state on event_id
    * but expires each entry once the watermark passes the event time it
    * was first seen with, so state is bounded by (watermark delay x id
    * arrival rate) regardless of stream length. Plain
    * `dropDuplicates("event_id")` would NOT be bounded here: Spark only
    * evicts dedup state when the event-time column is part of the dedup
    * key, and keying on (event_id, event_time) would wrongly keep
    * duplicates that carry distinct timestamps. A replay of the same id
    * more than 2 hours (event time) later is treated as a new event — the
    * documented horizon, not a bug.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", Tables.EventTime.eventTime)
      .withWatermark("event_time", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming sessionization: the SAME session_window operator as the
    * batch twin (q09_session_window), watermarked so closed sessions emit
    * once and state holds open sessions only — per-key memory is bounded
    * by (gap + lateness) x active users, not stream length.
    */
  def sessionized(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", Tables.EventTime.eventTime)
      .withWatermark("event_time", "2 hours")
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))

  /** Stream-stream interval join: purchases matched to the signups they
    * follow within one hour, per user — both sides watermarked so the state
    * store evicts rows once they can no longer match (state is bounded by
    * watermark + interval width, not stream length).
    */
  def purchasesWithinHourOfSignup(signups: DataFrame, purchases: DataFrame): DataFrame = {
    val s = signups
      .filter(col("event_type") === "signup")
      .select(col("user_id"), Tables.EventTime.eventTime.as("signup_time"),
        col("event_id").as("signup_id"))
      .withWatermark("signup_time", "2 hours")
    val p = purchases
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), Tables.EventTime.eventTime.as("purchase_time"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_time", "2 hours")
    s.join(p,
      s("user_id") === p("user_id") &&
        col("purchase_time") >= col("signup_time") &&
        col("purchase_time") <= col("signup_time") + expr("INTERVAL 1 HOUR"))
      .select(s("user_id"), col("signup_id"), col("purchase_id"),
        col("signup_time"), col("purchase_time"), col("value"))
  }

  /** Drain a streaming DataFrame synchronously into an in-memory table. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
