package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Hot-bucket star-collapse ([[Dedup.lshCandidatePairsStarCapped]]): the
  * capped edge set must preserve downstream connectivity EXACTLY for any
  * cap, shrink over-cap buckets from quadratic to linear, and keep the
  * broadcast shape its scaladoc promises. The adversarial cap here (far
  * below the registry's 64) collapses many buckets at once — the
  * fixture's near-clique plus ordinary buckets — so the equality is
  * exercised where stars dominate the graph, not just on one hot key.
  */
class StarCapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def sig = Dedup.minhashSignatures(
    Tables.documents(spark, SparkTestSession.sf0001), "text", "doc_id", 16)

  test("components over capped edges equal components over uncapped pairs at an adversarial cap") {
    val uncapped = Dedup.lshCandidatePairs(sig, "doc_id", 16, bands = 2)
    val capped = Dedup.lshCandidatePairsStarCapped(
      sig, "doc_id", 16, bands = 2, maxBucket = 3)
    val cu = Components.connectedComponents(uncapped, numPartitions = Some(4))
      .orderBy("id").collect()
    val cc = Components.connectedComponents(capped, numPartitions = Some(4))
      .orderBy("id").collect()
    assert(cu.length > 0 && cc.sameElements(cu))
  }

  test("an over-cap bucket emits exactly B-1 star rows from its min-id hub; under-cap buckets pair verbatim") {
    val exploded = Dedup.bandKeys(sig, "doc_id", 16, bands = 2)
    val buckets = exploded.groupBy("band", "key")
      .agg(count(lit(1)).as("sz"), min("doc_id").as("hub"))
    val cap = 3
    // expected evidence-row count: sum over buckets of
    // (sz*(sz-1)/2 if sz <= cap else sz-1)
    // `div`, not `/`: Spark's `/` on longs is double division
    val expected = buckets.select(
        sum(when(col("sz") <= cap, expr("sz * (sz - 1) div 2"))
          .otherwise(col("sz") - 1)).as("n"))
      .collect()(0).getLong(0)
    val capped = Dedup.lshCandidatePairsStarCapped(
      sig, "doc_id", 16, bands = 2, maxBucket = cap)
    val evidenceRows =
      capped.select(sum("shared_bands")).collect()(0).getLong(0)
    assert(evidenceRows == expected)
    // and the uncapped former emits at least as many evidence rows (the
    // cap only ever removes rows)
    val uncappedRows = Dedup.lshCandidatePairs(sig, "doc_id", 16, bands = 2)
      .select(sum("shared_bands")).collect()(0).getLong(0)
    assert(uncappedRows >= evidenceRows)
    // every hot bucket's hub really is its min member: each star row's
    // doc_a must be <= every doc_b it pairs with (orientation preserved)
    assert(capped.filter(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("a cap above every bucket size degenerates to the uncapped former exactly") {
    val uncapped = Dedup.lshCandidatePairs(sig, "doc_id", 16, bands = 2)
      .orderBy("doc_a", "doc_b").collect()
    val capped = Dedup.lshCandidatePairsStarCapped(
      sig, "doc_id", 16, bands = 2, maxBucket = 1000000)
      .orderBy("doc_a", "doc_b").collect()
    assert(capped.length > 0 && capped.sameElements(uncapped))
  }

  test("the hot screen broadcasts and nothing plans a cartesian") {
    val plan = Dedup.lshCandidatePairsStarCapped(
        sig, "doc_id", 16, bands = 2, maxBucket = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.linesIterator.take(60).mkString("\n"))
    assert(!plan.contains("CartesianProduct"),
      plan.linesIterator.take(60).mkString("\n"))
  }
}
