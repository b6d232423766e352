package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Salted join == plain join, with the hot key spread across salt shards. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted equi-join returns exactly the plain-join result") {
    // 90% of the big side lands on one hot key
    val big = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong else 1L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (10L, "cold10"), (20L, "cold20")).toDF("k", "label")

    val plain = big.join(small, "k").select("k", "payload", "label")
    val salted = Skew.saltedJoin(big, small, "k", saltBuckets = 8,
      saltSource = Seq("payload")).select("k", "payload", "label")

    val p = plain.collect().map(_.toSeq).sortBy(_.toString)
    val s = salted.collect().map(_.toSeq).sortBy(_.toString)
    assert(p.length == s.length && p.sameElements(s))
  }

  test("AQE skew-join actually splits a hot key (the runtime half of the skew story)") {
    // The Dedup/LSH docstrings lean on "AQE splits hot buckets"; this pins
    // that the mechanism really fires. Thresholds are lowered so a ~10 MB
    // hot partition counts as skewed on the test harness; broadcast is
    // disabled so the join stays sort-merge (the plan shape AQE's skew
    // handling applies to).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16384")

      val pad = "x" * 60
      val big = spark.range(0, 200000)
        .select(
          // 95% of rows land on key 1; the rest spread across 1000 keys
          when(col("id") % 20 =!= 0, lit(1L)).otherwise(col("id") % 1000).as("k"),
          concat(col("id").cast("string"), lit(pad)).as("payload"))
      val small = spark.range(0, 1000).select(
        col("id").as("k"), concat(lit("label"), col("id")).as("label"))

      val joined = big.join(small, "k").select("k", "payload", "label")
      // Execute THIS DataFrame's QueryExecution (a writer would clone the
      // plan and leave this one un-finalized), then read the final
      // adaptive plan it settled on.
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") || finalPlan.contains("skewed"),
        s"AQE did not mark the skew-join split:\n${finalPlan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salt is deterministic and spans buckets") {
    val df = (1 to 100).map(_.toLong).toDF("x")
    val salts = df.select(Skew.salt(8, col("x")).as("s")).as[Int].collect()
    val salts2 = df.select(Skew.salt(8, col("x")).as("s")).as[Int].collect()
    assert(salts.sameElements(salts2))
    assert(salts.forall(s => s >= 0 && s < 8))
    assert(salts.distinct.length > 4) // actually spreads
  }

  test("keySkewProfile: hand-computed stats; the integer trigger fires exactly past the factor") {
    // key 1 x 10 rows, keys 2..6 x 1 row: n=15, ndv=6, top=10
    val df = (Seq.fill(10)(1L) ++ (2L to 6L)).toDF("k")
    val r = Skew.keySkewProfile(df, "k").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((15L, 6L, 10L)))
    // trigger: top*ndv > 4*n -> 60 > 60 is false at factor 4, true at 3
    assert(!(r.getLong(2) * r.getLong(1) > 4 * r.getLong(0)))
    assert(r.getLong(2) * r.getLong(1) > 3 * r.getLong(0))
  }
}
