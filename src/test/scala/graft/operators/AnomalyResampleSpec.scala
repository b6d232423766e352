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

  test("zScores: widened precision accepts metrics the default cast rejects") {
    // 1e15 overflows decimal(18,4) (the default) but fits decimal(30,4);
    // the caller opts into the wider accumulator instead of editing the
    // operator. Stats stay exact-decimal-then-one-double-cast.
    val rows = Seq((1L, "g", 1e15), (2L, "g", 3e15)).toDF("event_id", "grp", "value")
    val got = Anomaly.zScores(rows, Seq("grp"), "value", Seq("event_id"),
        threshold = 3.0, precision = 30, scale = 4)
      .as[(Long, String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 2)
    // mean 2e15, std 1e15 -> z = +/-1, below threshold
    assert(math.abs(got(1L)._4 + 1.0) < 1e-9 && !got(1L)._5)
    assert(math.abs(got(2L)._4 - 1.0) < 1e-9 && !got(2L)._5)
  }

  test("groupStats raises when the SUM overflows decimal even though no single value does") {
    // sum(dec*dec) accumulates in decimal(38, 2*scale) (~1e30 cap at
    // scale 4): 150 values of 9e13 each fit decimal(18,4) individually
    // but their squares sum to ~1.2e30 — non-ANSI Spark nulls that sum
    // silently, and without the guard greatest(NULL, 0.0) would report
    // std = 0 for the whole group (every anomaly masked). ANSI mode
    // throws on its own; force non-ANSI to pin the guard itself.
    val prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val rows = (1L to 150L).map(i => (i, "g", 9e13)).toDF("event_id", "grp", "value")
      val ex = intercept[Exception] {
        Anomaly.groupStats(rows, Seq("grp"), "value").collect()
      }
      val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(chain.contains("group sum overflows"), s"unexpected: $ex")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
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

  test("hourlyForwardFill: pre-1970 timestamps floor to the previous hour (DuckDB // parity)") {
    val h = Resample.HourNs
    // ts = -1 ns is inside hour -1 under floor division; `div` would
    // truncate it to hour 0 and diverge from the oracle's `//`
    val events = Seq(
      (1L, -1L, 100L, 1.0),
      (1L, h + 1L, 101L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Resample.hourlyForwardFill(events, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(got.keySet == Set(-1L, 0L, 1L), s"grid hours: ${got.keySet}")
    assert(got(-1L) == ((1.0, false)))
    assert(got(0L) == ((1.0, true)))   // gap hour carries the -1h value
    assert(got(1L) == ((2.0, false)))
  }

  test("hourlyForwardFillSharded equals the windowed form (equality property)") {
    val h = Resample.HourNs
    // deterministic pseudo-random stream: 5 users, sparse hours over a
    // ~200-hour span, some in-hour collisions — every fill/carry shape
    val events = (0 until 400).map { i =>
      val u = (i * 7919) % 5
      val hour = (i * 6151) % 200
      val inHour = (i * 104729) % 3600
      (u.toLong, hour * h + inHour * 1000000000L, i.toLong, (i % 17).toDouble)
    }.toDF("user_id", "ts", "event_id", "value")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Boolean)].collect().sorted.toSeq
    val windowed = canon(
      Resample.hourlyForwardFill(events, "user_id", "ts", "event_id", "value"))
    // shards = 3 so a 200-hour span genuinely splits across shard
    // boundaries (carry-in exercised), not just degenerate 1-row shards
    val sharded = canon(
      Resample.hourlyForwardFillSharded(events, "user_id", "ts", "event_id", "value",
        shards = 3))
    assert(windowed.nonEmpty && windowed == sharded)
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
