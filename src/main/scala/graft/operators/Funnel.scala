package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-funnel analysis: how far does each user get through a
  * required step sequence (view -> click -> purchase), and how many reach
  * each stage within a conversion horizon — the sequence-pattern operator
  * behind product funnels and, in a training-data pipeline, multi-stage
  * interaction mining (impression -> engagement -> conversion labels).
  *
  * Semantics (earliest-completion, strict order): t1 = the user's first
  * step-1 event; t_k = the first step-k event STRICTLY after t_{k-1};
  * the user's depth = the longest prefix with t_k defined and
  * t_k - t1 <= horizon. Because the t_k are nondecreasing in k, the
  * horizon test is monotone and depth is well-defined.
  *
  * Distributed shape: each t_k is a conditional MIN window over the SAME
  * user partitioning — k sequential Window nodes but ONE exchange (the
  * q108/q109 shared-partitioning lesson: identical partition keys let
  * every pass reuse the first shuffle), no self-joins, no per-step scans
  * of the event stream. State per user is k longs; the rollup aggregates
  * k rows per user onto a k-sized key space.
  */
object Funnel {

  /** Per-user step times and depth: (user_id, t1_us .. tk_us, depth).
    * Users present in the stream but never reaching step 1 report
    * depth 0 with all-null times. `usCol` must be epoch-microseconds.
    */
  def userDepth(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      usCol: String,
      steps: Seq[String],
      horizonUs: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, s"steps must be distinct: $steps")
    require(horizonUs > 0, s"horizonUs must be > 0: $horizonUs")
    // Partition by the POST-rename column: `base` below aliases userCol to
    // user_id, so a spec built on the caller's name would fail to resolve
    // for any userCol other than the literal "user_id".
    val w = Window.partitionBy(col("user_id"))
    val base = events.select(
      col(userCol).as("user_id"),
      col(typeCol).as("__ft"),
      col(usCol).cast("long").as("__fus"))
    val withTimes = steps.zipWithIndex.foldLeft(base) { case (df, (s, i)) =>
      val cond =
        if (i == 0) col("__ft") === s
        else col("__ft") === s && col("__fus") > col(s"t${i}_us")
      df.withColumn(s"t${i + 1}_us", min(when(cond, col("__fus"))).over(w))
    }
    val depth = (1 to steps.size).map { k =>
      when(col(s"t${k}_us").isNotNull &&
        col(s"t${k}_us") - col("t1_us") <= horizonUs, 1L).otherwise(0L)
    }.reduce(_ + _)
    withTimes
      .groupBy((col("user_id") +: (1 to steps.size).map(k => col(s"t${k}_us"))): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("depth", depth)
      .select((col("user_id") +:
        (1 to steps.size).map(k => col(s"t${k}_us"))) :+ col("depth"): _*)
  }

  /** The funnel rollup: one row per step, (step_idx, step, n_users) =
    * users whose depth reaches that step. Monotone nonincreasing in
    * step_idx by construction.
    */
  def counts(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      usCol: String,
      steps: Seq[String],
      horizonUs: Long): DataFrame = {
    val d = userDepth(events, userCol, typeCol, usCol, steps, horizonUs)
    d.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(
          lit(i + 1L).as("step_idx"),
          lit(s).as("step"),
          when(col("depth") >= i + 1, 1L).otherwise(0L).as("hit"))
      }: _*)).as("e"))
      .groupBy(col("e.step_idx").as("step_idx"), col("e.step").as("step"))
      .agg(sum(col("e.hit")).as("n_users"))
  }
}
