package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values sketch as a typed `Aggregator` — the engine's
  * UDAF-surface exemplar (SURVEY.md §7 anticipated exactly one custom
  * aggregator for corpus-level stats).
  *
  * Keeps the k smallest DISTINCT values of a (portable-hash) column per
  * group: the classic KMV distinct-count/Jaccard sketch (Bar-Yossef et
  * al.) — `(k-1) * 2^32 / kth_min` estimates distinct hashes, and
  * |kmin(A) ∩ kmin(B)| / k estimates resemblance between groups.
  * Crucially the result is a pure set-min: ORDER-INSENSITIVE and
  * duplicate-insensitive, so it is deterministic under any partitioning /
  * merge order — which is what makes it DuckDB-oracle-checkable
  * (`list_slice(list_sort(list(DISTINCT h)), 1, k)`), unlike
  * RNG-reservoir or insertion-ordered sketches.
  *
  * Scale: the buffer is <= k longs; partial aggregation combines sketches
  * map-side, so the shuffle carries one <= k-long array per (partition,
  * group) — corpus-size-independent, the same contract as built-in
  * partial aggs.
  */
case class KMinSketch(k: Int) extends Aggregator[java.lang.Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive: $k")

  // buffer invariant: sorted ascending, distinct, size <= k
  override def zero: Seq[Long] = Nil

  // Boxed input so NULL arrives as null, not 0 (a primitive Long encoder
  // reads a NULL slot as 0L — the smallest plausible hash — silently
  // poisoning the sketch); NULLs are skipped like built-in aggregates and
  // like the oracle's list(DISTINCT h).
  override def reduce(b: Seq[Long], boxed: java.lang.Long): Seq[Long] = {
    if (boxed == null) return b
    val v = boxed.longValue()
    if (b.length == k && v >= b.last) b // fast path: can't enter the sketch
    else if (b.contains(v)) b
    else ((b :+ v).sorted: Seq[Long]).take(k)
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object KMinSketch {
  // udaf() derives encoders reflectively; memoize per k so every entry
  // point (kmin, mergeRegisters, register) pays the derivation once per
  // distinct k, not per call.
  private val udafByK =
    scala.collection.concurrent.TrieMap.empty[Int, org.apache.spark.sql.expressions.UserDefinedFunction]
  private def udafFor(k: Int) = udafByK.getOrElseUpdate(k, udaf(KMinSketch(k)))

  /** Aggregation column: k smallest distinct values of `c` (LongType). */
  def kmin(c: Column, k: Int): Column = udafFor(k).apply(c)

  /** SQL name for the fixed-k=8 variant (UDAFs take constructor params,
    * not SQL args, so the SQL surface pins one k).
    */
  val sqlName8 = "kmin_sketch8"

  private def udaf8 = udafFor(8)

  /** Session registration so `kmin_sketch8(col)` works from plain SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register(sqlName8, udaf8)

  /** DataFrame-level register merge — the K-MIN monoid face of the
    * sketch-serving discipline (HLL: cell-wise max, count-min/HDR:
    * cell-wise sum; KMV: distinct-union-take-k). Inputs are register
    * tables with columns `groupCols :+ kmin: array<long> :+ n_docs:
    * long`; output has the same schema with the k smallest distinct
    * hashes across both inputs and `n_docs` summed (`n_docs` is a
    * COUNT, additive ONLY across disjoint shards — same exactly-once
    * contract as [[graft.operators.CountMin.merge]]; the `kmin` array
    * itself is idempotent under replay like HLL's max).
    *
    * kmin_k(A ∪ B) = kmin_k(kmin_k(A) ∪ kmin_k(B)) — the classic KMV
    * union property — so folding an arrival shard's sketch into the
    * stored registers EQUALS the full-corpus sketch, which is what
    * makes the fold oracle-checkable against a from-scratch rebuild.
    * Scale: both sides are (groups x k) longs; the explode/re-aggregate
    * shuffles register-sized data only, never the summarized corpus.
    */
  def mergeRegisters(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String],
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, sum => fsum}
    val cols = groupCols ++ Seq("kmin", "n_docs")
    val both = a.select(cols.map(col): _*).unionByName(b.select(cols.map(col): _*))
    // n_docs is per-register-row constant within a group on each side;
    // exploding would multiply it by the array length, so split the two
    // reductions: hashes re-sketch, counts sum over the ORIGINAL rows.
    val hashes = both
      .select(groupCols.map(col) :+ explode(col("kmin")).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(KMinSketch.kmin(col("__h"), k).as("kmin"))
    val counts = both.groupBy(groupCols.map(col): _*)
      .agg(fsum(col("n_docs")).as("n_docs"))
    hashes.join(counts, groupCols)
  }
}
