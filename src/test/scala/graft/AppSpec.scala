package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end application-driver spec (t1-style smoke over a synthesized
  * trace input — FIXTURES.md §B): config validation (O18), run-versioned
  * CSV fan-out (O12-O13, O20), schema union across heterogeneous files.
  */
class AppSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("no sink selected is a startup error (O18)") {
    val e = intercept[IllegalArgumentException] {
      App.configFromEnv(Map.empty, "in", "out")
    }
    assert(e.getMessage.contains("No sink selected"))
  }

  test("zero matching input files is a clean no-op run, not a crash (reference parity)") {
    val out = Files.createTempDirectory("app_empty").toString
    val cfg = App.configFromEnv(
      Map("WRITE_CSV" -> "1", "GRAFT_RUN_ID" -> "empty-run"),
      "/tmp/definitely_not_here_graft/*.parquet", out)
    val outDir = App.run(spark, cfg) // must not throw
    assert(outDir == s"$out/empty-run")
    assert(!new java.io.File(s"$outDir/full").exists()) // no sinks ran
  }

  test("full pipeline: heterogeneous input -> versioned CSV fan-out with thresholds honored") {
    val in = Files.createTempDirectory("app_in").toString
    val out = Files.createTempDirectory("app_out").toString
    (0L until 100L).map(i => (i * 1_000_000_000L, i * 1_000_000_000L + (i % 40) * 100_000_000L, s"op$i"))
      .toDF("start_time", "end_time", "op")
      .coalesce(1).write.parquet(s"$in/a.parquet")
    (0L until 10L).map(i => (0L, 3_000_000_000L + i, i))
      .toDF("start_time", "end_time", "extra")
      .coalesce(1).write.parquet(s"$in/b.parquet")

    val cfg = App.configFromEnv(
      Map("WRITE_CSV" -> "1", "GRAFT_RUN_ID" -> "spec-run"),
      s"$in/*.parquet", out)
    val outDir = App.run(spark, cfg)
    assert(outDir == s"$out/spec-run") // O20

    val full = spark.read.option("header", "true").csv(s"$outDir/full")
    val long = spark.read.option("header", "true").csv(s"$outDir/long")
    // file a durations: (i%40)*100ms, i in 0..99 -> >=2000ms for i%40 in
    // 20..39, which occurs for i in 20..39 and 60..79 -> 40 rows;
    // file b durations: 3000ms each, all 10 rows distinct (extra differs)
    assert(full.count() == 50)
    // long >=2650ms: a needs i%40 in 27..39 (i in 27..39, 67..79 -> 26), b all 10
    assert(long.count() == 36)
    assert(full.columns.head == "duration_ms") // O6 reorder survives the sink
    assert(full.columns.toSet == Set("duration_ms", "start_time", "end_time", "op", "extra"))
  }
}
