package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Per-column table profiling: exact ground truth on a frame with known
  * nulls/duplicates, schema-dynamism (the operator follows the frame it
  * is handed), the approx face's rsd-bounded ndv, and the one-scan plan
  * shape the scaladoc promises.
  */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("exact profile matches hand-computed stats on a frame with nulls and duplicates") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "a"), (2L, null), (null, "b"), (3L, "b"))
      .toDF("k", "s")
    val p = Profile.tableProfile(df)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(p("k") == ((5L, 1L, 3L))) // 5 rows, one null, ndv {1,2,3}
    assert(p("s") == ((5L, 1L, 2L))) // 5 rows, one null, ndv {a,b}
  }

  test("the operator follows the handed frame's schema") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("a", "b").withColumn("c", lit(null).cast("int"))
    val cols = Profile.tableProfile(df).select("column")
      .collect().map(_.getString(0)).toSeq
    assert(cols == Seq("a", "b", "c"))
  }

  test("approx ndv lands within the configured rsd of exact, per column") {
    val li = Tables.lineitem(spark, SparkTestSession.sf0001)
    val exact = Profile.tableProfile(li)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.tableProfileApprox(li, rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, ndv) =>
      // 5 sigma of headroom on the 5% rsd — deterministic for a fixed
      // fixture, far outside plausible HLL error
      assert(math.abs(approx(c) - ndv) <= math.max(2L, (ndv * 0.25).toLong),
        s"$c: approx ${approx(c)} vs exact $ndv")
    }
  }

  test("one scan feeds the whole profile; the exact face carries the documented Expand") {
    val li = Tables.lineitem(spark, SparkTestSession.sf0001)
    val exactPlan = Profile.tableProfile(li)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(exactPlan).size == 1, exactPlan.take(800))
    assert(exactPlan.contains("Expand"), exactPlan.take(800))
    val approxPlan = Profile.tableProfileApprox(li)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(approxPlan).size == 1, approxPlan.take(800))
    assert(!approxPlan.contains("Expand"), approxPlan.take(800))
  }
}
