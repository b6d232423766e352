package graft.queries

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** The self-join scale claim made by the LSH band join and the
  * segment-block fuzzy join: at corpus scale (no broadcast), both join
  * sides plan IDENTICAL shuffles over the same subplan and Spark's
  * exchange reuse executes that pipeline once, feeding both sides from
  * the same shuffle files. The broadcast path the tiny fixtures take
  * hides this, so this spec disables broadcast and pins the reuse.
  */
class ExchangeReuseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // AQE performs exchange reuse at runtime stage materialization, which
  // explain() can't show before execution — so this pins the STATIC
  // ReuseExchange rule with adaptive off (the property is the same: both
  // sides canonicalize to one shuffle).
  private def planNoBroadcast(df: => org.apache.spark.sql.DataFrame): String = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      df.queryExecution.explainString(FormattedMode)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  private def planNoBroadcast(name: String): String =
    planNoBroadcast(SparkEntry.queries(name)(spark, SparkTestSession.sf0001))

  test("dup-graph BUILD: at sort-merge scale the band self-join reuses one signature shuffle") {
    // q32 itself is now a probe of the materialized graph (no join to
    // reuse); the reuse property lives in the build pipeline.
    import graft.operators.Dedup
    val nh = graft.queries.DupGraphPhases.NumHashes
    val docs = graft.Tables.documents(spark, SparkTestSession.sf0001)
    val p = planNoBroadcast(Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(docs, "text", "doc_id", nh, carry = Seq("source")),
      "doc_id", nh, bands = graft.queries.DupGraphPhases.Bands, carry = Seq("source")))
    assert(p.contains("ReusedExchange"), p.linesIterator.take(50).mkString("\n"))
  }

  test("q84: at sort-merge scale the segment self-join reuses one blocking shuffle") {
    val p = planNoBroadcast("q84_fuzzy_blocked")
    assert(p.contains("ReusedExchange"), p.linesIterator.take(50).mkString("\n"))
  }

  test("q83: at sort-merge scale the bucket self-join reuses one bucketing shuffle") {
    val p = planNoBroadcast("q83_embedding_dup_lsh")
    assert(p.contains("ReusedExchange"), p.linesIterator.take(50).mkString("\n"))
  }
}
