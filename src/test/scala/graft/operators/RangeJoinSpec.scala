package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(binWidth: Long,
      pts: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)]) =
    RangeJoin.pointInInterval(
        pts.toDF("id", "ts"), "id", "ts",
        ivs.toDF("id", "s", "e"), "id", "s", "e", binWidth)
      .select("interval_id", "point_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("binned result equals the naive theta join; boundaries are half-open") {
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 100L))
    val ivs = Seq((10L, 10L, 20L), (11L, 0L, 7L), (12L, 95L, 101L))
    // naive ground truth
    val want = for {
      (pid, ts) <- pts; (iid, s, e) <- ivs; if ts >= s && ts < e
    } yield (iid, pid)
    // bin width much smaller AND much larger than intervals — same answer,
    // and each qualifying pair appears exactly once (no dedup in the op)
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val got = run(w, pts, ivs)
      assert(got.length == got.distinct.length, s"duplicate pairs at binWidth=$w")
      assert(got.sorted.toSeq == want.sorted, s"binWidth=$w")
    }
    // half-open explicitly: point 4 sits at interval 10's end and must miss
    assert(!run(5L, pts, ivs).contains((10L, 4L)))
  }

  test("null timestamps and null bounds are excluded, not matched or crashed on") {
    val pts = Seq((1L, Some(5L)), (2L, None)).toDF("id", "ts")
    val ivs = Seq((10L, Some(0L), Some(10L)), (11L, None, Some(10L)))
      .toDF("id", "s", "e")
    val got = RangeJoin.pointInInterval(pts, "id", "ts", ivs, "id", "s", "e", 4L)
      .select("interval_id", "point_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // null ts -> null bin (joins nothing); null start -> null bin sequence
    // (explodes to nothing); only the fully-defined pair survives
    assert(got == Set((10L, 1L)))
  }

  test("randomized: binned equals scalar ground truth for 300 points x 100 intervals, 4 bin widths") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 300L).map(i => (i, rnd.nextLong(10000L)))
    val ivs = (1L to 100L).map { i =>
      val s = rnd.nextLong(9500L)
      // every 10th interval malformed (empty or inverted): the half-open
      // predicate matches nothing for them, and the n_bins >= 1 guard
      // must drop them instead of exploding a descending bin sequence
      if (i % 10 == 0) (i, s, s - rnd.nextLong(2000L))
      else (i, s, s + 1L + rnd.nextLong(800L))
    }
    val want = (for {
      (pid, ts) <- pts; (iid, s, e) <- ivs; if ts >= s && ts < e
    } yield (iid, pid)).sorted
    for (w <- Seq(1L, 13L, 256L, 100000L)) {
      val got = run(w, pts, ivs)
      assert(got.length == got.distinct.length, s"duplicate pairs at binWidth=$w")
      assert(got.sorted.toSeq == want, s"binWidth=$w: ${got.length} vs ${want.length}")
    }
  }

  test("events fixture: binned == theta join, and the binned plan is an equi-join") {
    val ev = graft.Tables.eventsTsNs(spark, SparkTestSession.sf0001)
    val intervals = ev
      .filter(col("event_type") === "signup" && col("event_id") % 97 === 0)
      .select(col("event_id"),
        expr("ts div 1000").as("start_ts"),
        (expr("ts div 1000") + lit(21600000000L)).as("end_ts"))
    val points = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), expr("ts div 1000").as("p_ts"))
    val binned = RangeJoin.pointInInterval(points, "event_id", "p_ts",
      intervals, "event_id", "start_ts", "end_ts", binWidth = 3600000000L)
    val naive = points.as("p").join(intervals.as("i"),
        col("p.p_ts") >= col("i.start_ts") && col("p.p_ts") < col("i.end_ts"))
      .select(col("i.event_id").as("interval_id"), col("p.event_id").as("point_id"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("interval_id", "point_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs(binned)
    assert(got == pairs(naive))
    assert(got.nonEmpty, "fixture slice produced no matches; test is vacuous")

    import org.apache.spark.sql.execution.FormattedMode
    val plan = binned.queryExecution.explainString(FormattedMode)
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      plan.linesIterator.take(30).mkString("\n"))
    val naivePlan = naive.queryExecution.explainString(FormattedMode)
    assert(naivePlan.contains("BroadcastNestedLoop") || naivePlan.contains("CartesianProduct"),
      "theta join no longer plans as a nested loop — revisit the operator's premise")
  }

  test("replication cap: capped equals uncapped equals scalar ground truth on mixed-width intervals") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i => (i, rnd.nextLong(10000L)))
    // mostly narrow intervals; every 10th is pathologically long (spans
    // hundreds of bins at binWidth=13 — the hot-spot the cap exists for)
    val ivs = (1L to 100L).map { i =>
      val s = rnd.nextLong(9000L)
      val len = if (i % 10 == 0) 5000L + rnd.nextLong(4000L) else 1L + rnd.nextLong(50L)
      (i, s, s + len)
    }
    val want = (for {
      (pid, ts) <- pts; (iid, s, e) <- ivs; if ts >= s && ts < e
    } yield (iid, pid)).sorted
    // cap below every span, mixed, and above every span — identical answers
    for (cap <- Seq(1, 8, 1000000)) {
      val got = RangeJoin.pointInInterval(
          pts.toDF("id", "ts"), "id", "ts",
          ivs.toDF("id", "s", "e"), "id", "s", "e",
          binWidth = 13L, maxBinsPerInterval = Some(cap))
        .select("interval_id", "point_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length, s"duplicate pairs at cap=$cap")
      assert(got.sorted.toSeq == want, s"cap=$cap: ${got.length} vs ${want.length}")
    }
  }

  test("replication cap routes outliers to a broadcast branch; null bounds stay excluded on both paths") {
    val pts = Seq((1L, Some(5L)), (2L, None)).toDF("id", "ts")
    val ivs = Seq(
      (10L, Some(0L), Some(10L)),      // 3 bins at width 4 -> binned path
      (11L, None, Some(10L)),          // null bound -> excluded everywhere
      (12L, Some(0L), Some(1000000L))  // 250k bins -> broadcast, NOT exploded
    ).toDF("id", "s", "e")
    val out = RangeJoin.pointInInterval(
      pts, "id", "ts", ivs, "id", "s", "e",
      binWidth = 4L, maxBinsPerInterval = Some(4))
    val got = out.select("interval_id", "point_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (12L, 1L)))
    import org.apache.spark.sql.execution.FormattedMode
    val plan = out.queryExecution.explainString(FormattedMode)
    assert(plan.contains("BroadcastNestedLoop"), "expected the broadcast outlier branch")
    assert(plan.contains("Union"), "expected the binned + outlier union")
  }

  test("inverted/empty intervals (end <= start) match nothing and never explode a descending bin range") {
    // end=0/start=10^12 would, without the n_bins >= 1 guard, generate a
    // DESCENDING sequence of ~10^12/binWidth bins (sequence's default
    // step is -1) — n_bins <= 0 slips past the `n_bins <= cap` filter.
    // The guard drops such intervals on BOTH the capped and uncapped
    // paths; correct, because a half-open [start, end) with end <= start
    // contains no point.
    val pts = Seq((1L, 0L), (2L, 5L), (3L, 1000000000000L)).toDF("id", "ts")
    val ivs = Seq(
      (20L, 0L, 10L),             // well-formed: catches ts=0, ts=5
      (21L, 10L, 10L),            // empty
      (22L, 1000000000000L, 0L)   // inverted, pathological span
    ).toDF("id", "s", "e")
    for (cap <- Seq(None, Some(4): Option[Int])) {
      val got = RangeJoin.pointInInterval(
          pts, "id", "ts", ivs, "id", "s", "e",
          binWidth = 4L, maxBinsPerInterval = cap)
        .select("interval_id", "point_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((20L, 1L), (20L, 2L)), s"cap=$cap")
    }
  }
}
