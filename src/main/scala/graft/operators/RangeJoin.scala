package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: point-in-interval matching WITHOUT an
  * equi key.
  *
  * Spark plans a bare `p.ts BETWEEN i.start AND i.end` join as a
  * BroadcastNestedLoopJoin (or cartesian) — every point against every
  * interval, quadratic at scale. The production shape discretizes the
  * domain into fixed-width bins: each interval explodes to the bins it
  * covers (replication factor = interval_width / bin_width + 1, a small
  * constant when bins are sized near the typical interval), each point
  * maps to exactly ONE bin, and the join becomes an equi-join on the bin
  * id — shuffle-partitioned, AQE-skew-splittable — followed by the exact
  * range predicate. Because a point lives in exactly one bin, a
  * qualifying (point, interval) pair meets exactly once: no dedup pass
  * is needed and the equi-join output is the final answer after the
  * verify filter.
  *
  * Intervals are half-open [start, end): a point at `end` does not match,
  * so back-to-back intervals never double-count a boundary point.
  * Rows with a null timestamp or null bounds are excluded (null bins join
  * nothing / explode to nothing) — spec-pinned.
  */
object RangeJoin {

  /** @param points    rows carrying `pointId` and a numeric `pointTs`
    * @param intervals rows carrying `intervalId`, `startCol`, `endCol`
    *                  (same numeric domain as `pointTs`; end > start)
    * @param binWidth  bin size in that domain — tune toward the typical
    *                  interval width; smaller bins = more interval
    *                  replication, bigger bins = more false candidates
    *                  for the verify filter
    * @param maxBinsPerInterval replication cap: an interval spanning more
    *                  than this many bins is NOT exploded (one
    *                  pathologically long interval would otherwise
    *                  replicate to millions of bin rows and hot-spot the
    *                  equi-join); it is routed to a broadcast theta join
    *                  instead, which is exact and cheap precisely because
    *                  such outliers are rare — if they were common, the
    *                  broadcast would blow up, which is the natural guard.
    *                  Each interval takes exactly one path, so the
    *                  pair-meets-exactly-once property is preserved.
    *                  `None` (default) keeps the pure binned plan.
    * @return (interval_id, point_id, p_ts) for every point inside an
    *         interval, each pair exactly once
    */
  def pointInInterval(
      points: DataFrame,
      pointId: String,
      pointTs: String,
      intervals: DataFrame,
      intervalId: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      maxBinsPerInterval: Option[Int] = None): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    maxBinsPerInterval.foreach(c =>
      require(c > 0, s"maxBinsPerInterval must be positive: $c"))
    val p = points
      .select(col(pointId).as("point_id"), col(pointTs).as("p_ts"))
      .withColumn("bin", expr(s"p_ts div ${binWidth}L"))
    val base = intervals
      .select(col(intervalId).as("interval_id"),
        col(startCol).as("start_ts"), col(endCol).as("end_ts"))
      // null bounds yield a null span and fall out of BOTH branch filters
      // below — the same excluded-not-matched semantics as the uncapped
      // plan, where a null bound explodes to zero bins.
      .withColumn("n_bins",
        expr(s"(end_ts - 1L) div ${binWidth}L - start_ts div ${binWidth}L + 1L"))
    // n_bins < 1 <=> end_ts <= start_ts: a half-open [start, end) with
    // end <= start matches NO point, so dropping such intervals is
    // semantics-preserving — and mandatory for safety: sequence()'s
    // default step is -1 when start > stop, so one inverted interval
    // (e.g. end_ts=0, start_ts huge) would otherwise explode to a
    // DESCENDING bin range of billions of rows, bypassing the cap
    // (n_bins <= 0 always passes the `n_bins <= c` filter).
    val wellFormed = base.filter(col("n_bins") >= 1)
    val binnable =
      maxBinsPerInterval.fold(wellFormed)(c => wellFormed.filter(col("n_bins") <= c))
    val i = binnable
      .withColumn("bin",
        explode(sequence(
          expr(s"start_ts div ${binWidth}L"),
          expr(s"(end_ts - 1L) div ${binWidth}L"))))
    val binned = p.join(i, Seq("bin"))
      .filter(col("p_ts") >= col("start_ts") && col("p_ts") < col("end_ts"))
      .select(col("interval_id"), col("point_id"), col("p_ts"))
    maxBinsPerInterval match {
      case None => binned
      case Some(c) =>
        val outliers = wellFormed.filter(col("n_bins") > c)
          .select("interval_id", "start_ts", "end_ts")
        val outlierPairs = p
          .join(broadcast(outliers),
            col("p_ts") >= col("start_ts") && col("p_ts") < col("end_ts"))
          .select(col("interval_id"), col("point_id"), col("p_ts"))
        binned.unionByName(outlierPairs)
    }
  }
}
