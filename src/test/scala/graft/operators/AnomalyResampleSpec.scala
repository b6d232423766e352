package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth for [[Anomaly.zScores]] and [[Resample.hourlyForwardFill]]:
  * the z statistics match scalar math, constant groups never flag or
  * divide by zero, the hour grid is complete with correct forward fill,
  * and the in-hour "last" respects the (µs, id) tiebreak.
  */
class AnomalyResampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zScores: planted outlier flagged; constant group scores 0 and never flags") {
    // a single outlier among n points maxes out at z = sqrt(n-1), so 10
    // points would sit EXACTLY at 3.0 and never exceed it — use 17
    // (16 identical inliers -> the outlier lands at z = 4)
    val rows = (1L to 16L).map(i => (i, "g1", 10.0)) ++
      Seq((17L, "g1", 1000.0)) ++ (18L to 21L).map(i => (i, "g2", 5.0))
    val got = Anomaly.zScores(
        rows.toDF("event_id", "grp", "value"),
        groupCols = Seq("grp"), valueCol = "value",
        keepCols = Seq("event_id"), threshold = 3.0)
      .as[(Long, String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val vs = (1 to 16).map(_ => 10.0) :+ 1000.0
    val mean = vs.sum / 17
    val std = math.sqrt(vs.map(v => v * v).sum / 17 - mean * mean)
    val zOut = (1000.0 - mean) / std
    assert(math.abs(got(17L)._4 - zOut) < 1e-9)
    assert(math.abs(zOut - 4.0) < 1e-9)       // the sqrt(n-1) identity
    assert(got(17L)._5, "outlier not flagged")
    assert((1L to 16L).forall(i => !got(i)._5), "inliers flagged")
    (18L to 21L).foreach { i =>
      assert(got(i)._4 == 0.0 && !got(i)._5, s"constant group misbehaved: ${got(i)}")
    }
  }

  test("hourlyForwardFill: complete grid, correct fill, (us, id) in-hour tiebreak") {
    val h = Resample.HourNs
    val events = Seq(
      // user 1: hours 0, 1 (two events — later us wins), gap at 2-3, hour 4
      (1L, 0L * h + 5L, 100L, 1.0),
      (1L, 1L * h + 10L, 101L, 2.0),
      (1L, 1L * h + 20L, 102L, 3.0),   // later in hour 1 -> wins
      (1L, 4L * h + 1L, 103L, 4.0),
      // user 2: same-µs tie in hour 7 -> higher id wins
      (2L, 7L * h + 1000L, 200L, 5.0),
      (2L, 7L * h + 1000L, 201L, 6.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Resample.hourlyForwardFill(events, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.keySet == ((0L to 4L).map(1L -> _) ++ Seq(2L -> 7L)).toSet)
    assert(got((1L, 0L)) == ((1.0, false)))
    assert(got((1L, 1L)) == ((3.0, false)))   // later event in the hour
    assert(got((1L, 2L)) == ((3.0, true)))    // gap carries hour 1's value
    assert(got((1L, 3L)) == ((3.0, true)))
    assert(got((1L, 4L)) == ((4.0, false)))
    assert(got((2L, 7L)) == ((6.0, false)))   // same µs -> id tiebreak
  }

  test("zScores raises on values that overflow the decimal cast instead of skewing stats") {
    // under ANSI mode (Spark 4 default) the cast itself throws; under
    // non-ANSI it nulls silently and the groupStats guard raises — either
    // way an overflowing metric NEVER silently skews mean/std
    val rows = Seq((1L, "g", 10.0), (2L, "g", 1e15)) // 1e15 overflows decimal(18,4)
      .toDF("event_id", "grp", "value")
    val ex = intercept[Exception] {
      Anomaly.zScores(rows, Seq("grp"), "value", Seq("event_id")).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("overflow decimal") ||
      chain.contains("NUMERIC_VALUE_OUT_OF_RANGE"), s"unexpected: $ex")
  }

  test("hourlyForwardFill: a span exactly at maxSpanHours passes (inclusive cap)") {
    val h = Resample.HourNs
    val events = Seq((1L, 0L, 100L, 1.0), (1L, 5L * h, 101L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Resample.hourlyForwardFill(
      events, "user_id", "ts", "event_id", "value", maxSpanHours = 5L).collect()
    assert(got.length == 6) // hours 0..5 inclusive
  }

  test("hourlyForwardFill fails fast on a span past maxSpanHours (corrupt timestamp)") {
    val h = Resample.HourNs
    val bad = Seq(
      (1L, 0L, 100L, 1.0),                    // epoch 0
      (1L, 500000L * h, 101L, 2.0))           // ~57 years later
      .toDF("user_id", "ts", "event_id", "value")
    val ex = intercept[Exception] {
      Resample.hourlyForwardFill(bad, "user_id", "ts", "event_id", "value").collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("maxSpanHours"), s"unexpected: $ex")
  }

  test("plans: the z-score aggregate and the in-hour last are map-side-combinable") {
    val df = Seq((1L, "a", 1.0)).toDF("event_id", "grp", "value")
    val p1 = Anomaly.zScores(df, Seq("grp"), "value", Seq("event_id"))
      .queryExecution.explainString(FormattedMode)
    assert(!p1.contains("CartesianProduct"), p1)
    val ev = Seq((1L, 10L, 1L, 1.0)).toDF("user_id", "ts", "event_id", "value")
    val p2 = Resample.hourlyForwardFill(ev, "user_id", "ts", "event_id", "value")
      .queryExecution.explainString(FormattedMode)
    // the in-hour last is a HashAggregate max, never a per-group sort
    assert(p2.contains("HashAggregate"), p2)
    assert(!p2.contains("CartesianProduct"), p2)
  }
}
