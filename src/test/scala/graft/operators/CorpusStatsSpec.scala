package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth and plan shape for [[CorpusStats]]: pair counting matches
  * a scalar recount with a deterministic tiebreak and plans the top-k as
  * TakeOrderedAndProject; gram novelty matches first-occurrence scanning
  * and keeps the gram join equi-only.
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pairCounts equals a scalar recount; ties break lexicographically at the k boundary") {
    val docs = Seq("a b a b c", "b c d", "a b").toDF("text")
    // pairs: a b, b a, a b, b c | b c, c d | a b  -> "a b":3, "b c":2, others 1
    val got = CorpusStats.pairCounts(docs, "text", k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b", 3L), ("b c", 2L), ("b a", 1L)))
    // k past the tie boundary keeps lexicographic order among count-1 pairs
    val all = CorpusStats.pairCounts(docs, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(all == Seq(("a b", 3L), ("b c", 2L), ("b a", 1L), ("c d", 1L)))
  }

  test("pairCounts plans top-k as TakeOrderedAndProject, not a global sort") {
    val q = CorpusStats.pairCounts(
      graft.Tables.documents(spark, SparkTestSession.sf0001), "text", k = 200)
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(25).mkString("\n"))
  }

  test("gramNovelty equals first-occurrence scanning; short docs absent; ratio exact") {
    val docs = Seq(
      (10L, "a b c d"),   // grams (n=2, distinct): "a b","b c","c d" - all first here
      (20L, "b c d e"),   // "b c","c d" seen in 10; "d e" novel
      (30L, "a b a b"),   // "a b" seen; "b a" novel (distinct within doc)
      (40L, "z")          // < n tokens -> absent
    ).toDF("doc_id", "text")
    val got = CorpusStats.gramNovelty(docs, "doc_id", "text", n = 2)
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (10L, 3L, 3L, 1.0),
      (20L, 3L, 1L, 1.0 / 3.0),
      (30L, 2L, 1L, 0.5)))
  }

  test("gramNovelty plan: gram join is equi-only") {
    val q = CorpusStats.gramNovelty(
      graft.Tables.documents(spark, SparkTestSession.sf0001), "doc_id", "text", n = 5)
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      plan.linesIterator.take(25).mkString("\n"))
    assert(q.limit(5).collect().nonEmpty)
  }
}
