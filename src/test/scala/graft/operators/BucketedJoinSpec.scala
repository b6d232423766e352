package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Bucketing = the 100 TB answer to repeated same-key joins: both tables
  * bucketed on the join key at write time join WITHOUT any shuffle exchange
  * (PLANS.md "Joins"). This spec proves the property on the real plan.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("join of two tables bucketed on the key runs with zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, SparkTestSession.sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, SparkTestSession.sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          spark.table("li_b")("l_orderkey") === spark.table("ord_b")("o_orderkey"))
        .select("l_orderkey", "o_orderpriority", "l_quantity")
      assert(joined.count() == 6000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
