package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fragment stitching: find document pairs where one document's tail is
  * another's head — the signature of a source split mid-document
  * (crawl shard boundaries, pagination, chunked exports). Reassembling
  * such fragments before training beats deduplicating them away: the
  * joined document carries long-range context neither fragment has.
  *
  * Scale shape: each document contributes ONE prefix key and ONE suffix
  * key (the portable hash of its first/last k tokens), so the candidate
  * join is an equi-join of two n-row, 16-byte-wide streams — never
  * quadratic, broadcastable when one side is a bounded frontier. The
  * k-token overlap strings ride the join only to verify hash candidates
  * exactly (bounded at k tokens per row); the full bodies never move.
  * Hot keys (a ubiquitous k-token opener — "click here to accept the" —
  * appearing as both head and tail) are boilerplate, not fragments, and
  * are the same screen problem [[Boilerplate]] solves upstream; AQE
  * skew-join covers the residue.
  */
object Stitch {

  /** Candidate fragment pairs: (left_id, right_id, overlap) where
    * `left`'s last k tokens equal `right`'s first k tokens verbatim and
    * the ids differ. Documents shorter than k tokens cannot carry the
    * overlap signature and are excluded on both sides.
    */
  def fragmentCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val toks = TextAnalysis.wsTokens(col(textCol))
    val eligible = docs
      .select(col(idCol).as("id"), toks.as("t"))
      .filter(size(col("t")) >= k)
    val heads = eligible.select(
      col("id").as("right_id"),
      array_join(slice(col("t"), 1, k), " ").as("head_str"))
    val tails = eligible.select(
      col("id").as("left_id"),
      array_join(slice(col("t"), -k, k), " ").as("tail_str"))
    // Join on the 8-byte hash (narrow shuffle), verify the strings — the
    // hash can collide, string equality is the semantic condition.
    val h = tails.withColumn("hk", TextAnalysis.portableHash32(col("tail_str")))
    val p = heads.withColumn("hk", TextAnalysis.portableHash32(col("head_str")))
    h.join(p, Seq("hk"))
      .filter(col("left_id") =!= col("right_id") &&
        col("tail_str") === col("head_str"))
      .select(col("left_id"), col("right_id"), col("tail_str").as("overlap"))
  }
}
