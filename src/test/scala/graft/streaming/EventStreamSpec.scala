package graft.streaming

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Streaming == batch equivalence on the replayed events file source. */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** The file source watches a directory: stage the events file into one. */
  lazy val watchDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sf0001, "events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling-window agg equals its batch twin (q08)") {
    val stream = EventStream.readEvents(spark, watchDir, SparkTestSession.sf0001)
    val q = EventStream.runToMemory(
      EventStream.hourlyCounts(stream), "hourly", OutputMode.Complete())
    try {
      val streamed = spark.sql("SELECT * FROM hourly ORDER BY hour_idx, event_type").collect()
      val batch = EventStream.hourlyCounts(
        Tables.eventsTsNs(spark, SparkTestSession.sf0001))
        .orderBy("hour_idx", "event_type").collect()
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }

  test("watermarked append mode emits closed windows exactly once, drops late data") {
    import org.apache.spark.sql.functions._
    val wDir = java.nio.file.Files.createTempDirectory("events_wm")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sf0001, "events.parquet"),
      wDir.resolve("f1.parquet"))
    val stream = EventStream.readEvents(spark, wDir.toString, SparkTestSession.sf0001)
    val q = EventStream.runToMemory(
      EventStream.hourlyCountsWatermarked(stream), "wm",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      // batch 1 sets the watermark; a second (fully late, duplicate) file
      // advances processing -> windows older than the watermark emit, and
      // the duplicates in them are dropped as late.
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(SparkTestSession.sf0001, "events.parquet"),
        wDir.resolve("f2.parquet"))
      q.processAllAvailable()
      val emitted = spark.sql("SELECT * FROM wm").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(emitted.nonEmpty)
      // every emitted window matches the single-file batch count (the f2
      // copy was late beyond the 2h watermark for any CLOSED window)
      val batch = EventStream.hourlyCountsWatermarked(
        Tables.eventsTsNs(spark, SparkTestSession.sf0001))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      emitted.foreach { case (k, cnt) => assert(batch(k) == cnt, s"window $k") }
    } finally q.stop()
  }

  test("streaming sessionization matches the batch twin on closed sessions") {
    val wd = java.nio.file.Files.createTempDirectory("events_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sf0001, "events.parquet"),
      wd.resolve("f1.parquet"))
    val stream = EventStream.readEvents(spark, wd.toString, SparkTestSession.sf0001)
    val q = EventStream.runToMemory(
      EventStream.sessionized(stream), "sess",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      // batch 1 sets the watermark; the duplicate file advances processing
      // so sessions closed below the watermark emit exactly once.
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(SparkTestSession.sf0001, "events.parquet"),
        wd.resolve("f2.parquet"))
      q.processAllAvailable()
      val emitted = spark.sql("SELECT * FROM sess").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      assert(emitted.nonEmpty)
      val batch = EventStream.sessionized(
        Tables.eventsTsNs(spark, SparkTestSession.sf0001))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      emitted.foreach { case (k, n) => assert(batch(k) == n, s"session $k") }
    } finally q.stop()
  }

  test("stream-static broadcast join enriches each micro-batch") {
    import org.apache.spark.sql.functions._
    val stream = EventStream.readEvents(spark, watchDir, SparkTestSession.sf0001)
    val users = Tables.eventsTsNs(spark, SparkTestSession.sf0001)
      .select("user_id").distinct()
      .withColumn("user_tier", when(col("user_id") % 2 === 0, "even").otherwise("odd"))
    val q = EventStream.runToMemory(
      EventStream.enrichedWithUsers(stream, users), "enriched",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val n = spark.sql("SELECT count(*) FROM enriched WHERE user_tier IS NOT NULL")
        .head.getLong(0)
      assert(n == 1000) // every event matched its user tier
    } finally q.stop()
  }

  test("streaming dedup: a fully replayed file contributes zero new events") {
    val wd = java.nio.file.Files.createTempDirectory("events_dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sf0001, "events.parquet"),
      wd.resolve("f1.parquet"))
    val stream = EventStream.readEvents(spark, wd.toString, SparkTestSession.sf0001)
    val q = EventStream.runToMemory(
      EventStream.dedupedEvents(stream), "dedup_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      assert(spark.sql("SELECT count(*) FROM dedup_stream").head.getLong(0) == 1000)
      // replay the identical file -> every event id already seen/late
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(SparkTestSession.sf0001, "events.parquet"),
        wd.resolve("f2.parquet"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM dedup_stream").head.getLong(0) == 1000)
      assert(spark.sql("SELECT count(DISTINCT event_id) FROM dedup_stream").head.getLong(0) == 1000)
      // State must be the watermark-evicting dedup operator: plain
      // dropDuplicates(event_id) never evicts (id alone isn't event-time
      // keyed) and would grow state forever on a long-running stream.
      assert(q.lastProgress.stateOperators.exists(_.operatorName == "dedupeWithinWatermark"),
        s"expected dedupeWithinWatermark state operator, got " +
          q.lastProgress.stateOperators.map(_.operatorName).mkString(","))
    } finally q.stop()
  }

  test("stream-stream interval join equals its batch twin") {
    val s1 = EventStream.readEvents(spark, watchDir, SparkTestSession.sf0001)
    val s2 = EventStream.readEvents(spark, watchDir, SparkTestSession.sf0001)
    val q = EventStream.runToMemory(
      EventStream.purchasesWithinHourOfSignup(s1, s2), "ssjoin",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val streamed = spark.sql(
        "SELECT signup_id, purchase_id FROM ssjoin ORDER BY 1, 2").collect()
      val batchEvents = Tables.eventsTsNs(spark, SparkTestSession.sf0001)
      val batch = EventStream.purchasesWithinHourOfSignup(batchEvents, batchEvents)
        .orderBy("signup_id", "purchase_id")
        .select("signup_id", "purchase_id").collect()
      assert(streamed.nonEmpty)
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }

  test("stateful mapGroupsWithState accumulates per-user state") {
    val stream = EventStream.readEvents(spark, watchDir, SparkTestSession.sf0001)
    val q = EventStream.runToMemory(
      EventStream.userActivity(spark, stream).toDF(), "peruser", OutputMode.Update())
    try {
      val got = spark.sql("SELECT user_id, n_events FROM peruser").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Tables.eventsTsNs(spark, SparkTestSession.sf0001)
        .groupBy("user_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally q.stop()
  }
}
