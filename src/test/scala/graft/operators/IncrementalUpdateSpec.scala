package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth and plan shape for [[Dedup.incrementalClassify]]: planted
  * exact and near duplicates classify correctly, precedence is
  * exact > near > new, every incoming id appears exactly once, and both
  * screens stay semi joins (no pair stream).
  */
class IncrementalUpdateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and then naps all afternoon " +
      "in the warm summer sun while birds sing overhead in the old oak tree"

  private val existing = Seq(
    (1L, base),
    (2L, "completely different content about spark catalyst optimizer rules " +
      "and distributed shuffle exchange planning for large analytical joins"),
    (3L, "unrelated third existing document mentioning parquet footers and " +
      "vectorized readers with dictionary encoded column chunks"))
    .toDF("doc_id", "text")

  private val incoming = Seq(
    (11L, base),                                   // verbatim copy -> exact_dup
    // one-word edit chosen to survive one of the two bands (banding recall
    // is probabilistic per edit; "naps"->"sleeps", e.g., flips a min in
    // BOTH bands and would honestly classify as new)
    (12L, base.replace("warm", "hot")),            // near edit -> near_dup
    (13L, "entirely novel text on minhash banding recall and jaccard " +
      "similarity estimation over shingled token streams for dedup"))
    .toDF("doc_id", "text")

  test("classifies exact copy, near edit, and novel doc; one row per incoming id") {
    val got = Dedup.incrementalClassify(existing, incoming, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((11L, "exact_dup"), (12L, "near_dup"), (13L, "new")))
  }

  test("an exact dup that also collides in a band reports exact_dup (precedence)") {
    // a verbatim copy shares ALL bands with its original by construction,
    // so it hits both screens; the exact label must win
    val got = Dedup.incrementalClassify(
        existing, Seq((21L, base)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((21L, "exact_dup")))
  }

  test("empty existing corpus classifies everything as new") {
    val got = Dedup.incrementalClassify(
        existing.filter("doc_id < 0"), incoming, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got.map(_._2).forall(_ == "new"))
    assert(got.map(_._1) == Seq(11L, 12L, 13L))
  }

  test("plan: both screens are semi joins — no pair stream, no cross product") {
    val p = Dedup.incrementalClassify(existing, incoming, "doc_id", "text")
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }
}
