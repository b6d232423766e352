package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** The approximate-aggregation path PLANS.md recommends at 100 TB where
  * exact COUNT(DISTINCT)'s expand+two-phase cost isn't warranted: HLL-based
  * approx_count_distinct within its error bound against the exact answer.
  * (Not oracle-checked — sketch internals differ across engines by design;
  * accuracy is the contract, pinned here.)
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("approx_count_distinct lands within the configured error of exact") {
    val li = Tables.lineitem(spark, SparkTestSession.sf0001)
    val r = li.agg(
      countDistinct("l_partkey").as("exact"),
      approx_count_distinct("l_partkey", 0.02).as("approx")).head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx $approx vs exact $exact beyond 5%")
  }
}
