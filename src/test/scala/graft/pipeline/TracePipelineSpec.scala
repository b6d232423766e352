package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Reference-parity pipeline behavior, pinned to *intent* semantics with the
  * SURVEY.md §2.10 divergences asserted explicitly (FIXTURES.md §B):
  * heterogeneous schemas union with null padding, duplicates actually
  * dedupe (B1), corrupt files are skipped (O3), duration math truncates
  * per operand (O4), zeros stay zeros (B4).
  */
class TracePipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Write a DataFrame as one flat parquet FILE (the reference's input
    * layout is loose files under a glob, main.js:39-40, not Spark dirs).
    */
  private def writeSingleFile(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
    val tmp = Files.createTempDirectory("part").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(dest))
  }

  /** Two parquet files with different column sets + duplicate rows +
    * threshold-straddling durations, plus one corrupt .parquet file.
    */
  lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("trace_fixture").toString
    // file A: start/end/duration straddles thresholds; exact duplicate rows;
    // per-operand corner: end just over an ms boundary, start just under.
    val a = Seq(
      // (start_ns, end_ns, tag)  -> duration_ms
      (1_000_000_500L, 3_500_000_400L, "dup"), // 3500-1000=2500 per-operand; naive 2499
      (1_000_000_500L, 3_500_000_400L, "dup"), // exact duplicate (B1)
      (0L, 1_999_999_999L, "below"), // 1999 -> filtered
      (0L, 2_000_000_000L, "keep"), // 2000 -> kept
      (0L, 2_650_000_000L, "long"), // 2650 -> long slice
      (0L, 3_000_000_123L, "zero0") // extra col exercise
    ).toDF("start_time", "end_time", "tag")
    writeSingleFile(a, s"$dir/a.parquet")
    // file B: different column set (no tag; adds extra_col + zero-valued col)
    val b = Seq(
      (10_000_000_000L, 14_000_000_000L, "x1", 0L),
      (10_000_000_000L, 11_000_000_000L, "x2", 7L) // 1000 ms -> filtered
    ).toDF("start_time", "end_time", "extra_col", "zero_col")
    writeSingleFile(b, s"$dir/b.parquet")
    // corrupt file: not parquet at all
    Files.write(Paths.get(dir, "corrupt.parquet"), "not a parquet file".getBytes)
    dir
  }

  lazy val cfg = TraceConfig(inputGlob = s"$fixtureDir/*.parquet")

  test("read unions heterogeneous schemas with null padding and skips corrupt files (O1-O3, O8)") {
    val df = TracePipeline.read(spark, cfg)
    assert(df.columns.toSet == Set("start_time", "end_time", "tag", "extra_col", "zero_col"))
    assert(df.count() == 8) // corrupt file contributes zero rows, run succeeds
    val padded = df.filter(col("extra_col").isNotNull).select("tag").collect()
    assert(padded.forall(_.isNullAt(0))) // B-file rows have null tag
  }

  test("duration derives with per-operand truncation (O4) — not naive difference") {
    val df = TracePipeline.deriveDuration(TracePipeline.read(spark, cfg), cfg)
    val corner = df.filter(col("tag") === "dup").select("duration_ms").head.getLong(0)
    assert(corner == 2500L) // 3500000400 div 1e6 - 1000000500 div 1e6 = 3500 - 1000
    val naive = (3_500_000_400L - 1_000_000_500L) / 1_000_000L
    assert(naive == 2499L) // the divergence the survey flags (§7 hard part c)
  }

  test("keep-filter and long slice honor the reference thresholds (O5, O13)") {
    val t = TracePipeline.transform(TracePipeline.read(spark, cfg), cfg)
    val durations = t.select("duration_ms").as[Long].collect().sorted
    assert(durations.forall(_ >= 2000L))
    assert(!durations.contains(1999L) && !durations.contains(1000L))
    val long = TracePipeline.longSlice(t, cfg).select("duration_ms").as[Long].collect()
    assert(long.forall(_ >= 2650L))
  }

  test("distinct is value-based (B1 intent): duplicate rows collapse") {
    val t = TracePipeline.transform(TracePipeline.read(spark, cfg), cfg)
    assert(t.filter(col("tag") === "dup").count() == 1)
  }

  test("reorder puts duration_ms first (O6)") {
    val t = TracePipeline.transform(TracePipeline.read(spark, cfg), cfg)
    assert(t.columns.head == "duration_ms")
  }

  test("zeros survive as zeros, not 'NULL' strings (B4 intent)") {
    val t = TracePipeline.transform(TracePipeline.read(spark, cfg), cfg)
    val zeroRows = t.filter(col("zero_col") === 0L)
    assert(zeroRows.count() == 1)
  }

  test("deterministic UID is stable; uuid() UID is unique per row (O15)") {
    val t = TracePipeline.transform(TracePipeline.read(spark, cfg), cfg)
    val d1 = TracePipeline.withDeterministicUid(t).select("UID").as[String].collect().sorted
    val d2 = TracePipeline.withDeterministicUid(t).select("UID").as[String].collect().sorted
    assert(d1.sameElements(d2))
    val u = TracePipeline.withUid(t).select("UID").as[String].collect()
    assert(u.distinct.length == u.length)
  }
}
