package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** KMV sketch aggregator: matches the scalar model, ignores duplicates,
  * and is invariant to partitioning (merge order).
  */
class KMinSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kmin keeps the k smallest distinct values, any partitioning") {
    val vals = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 4L, 6L, 2L, 9L)
    val expect = vals.distinct.sorted.take(4)
    Seq(1, 3, 7).foreach { parts =>
      val got = vals.toDF("v").repartition(parts)
        .agg(KMinSketch.kmin(col("v"), 4).as("s"))
        .head.getSeq[Long](0)
      assert(got == expect, s"parts=$parts")
    }
  }

  test("NULL inputs are skipped, never folded to 0") {
    val df = Seq(Some(7L), None, Some(3L), None, Some(9L)).toDF("v")
    val got = df.agg(KMinSketch.kmin(col("v"), 4).as("s")).head.getSeq[Long](0)
    assert(got == Seq(3L, 7L, 9L)) // no spurious 0 from the null slots
  }

  test("SQL surface: kmin_sketch8 callable from plain SQL after registration") {
    GraftFunctions.register(spark)
    Seq((1L, 9L), (1L, 2L), (1L, 2L), (1L, 5L)).toDF("g", "v")
      .createOrReplaceTempView("kmin_in")
    val got = spark.sql("SELECT kmin_sketch8(v) AS s FROM kmin_in GROUP BY g")
      .head.getSeq[Long](0)
    assert(got == Seq(2L, 5L, 9L))
  }

  test("buffer stays capped at k and handles fewer-than-k groups") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("g", "v")
    val got = df.groupBy("g").agg(KMinSketch.kmin(col("v"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(10L, 20L))
    assert(got(2L) == Seq(5L))
  }
}
