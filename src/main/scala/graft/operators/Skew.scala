package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot join keys at scale.
  *
  * AQE's skew-join split handles most skew automatically (enabled in
  * [[graft.GraftSession]]); explicit salting remains the tool of choice when
  * a single key dominates so heavily that even split partitions overwhelm a
  * task, or when AQE is unavailable (streaming joins). The pattern: salt
  * the big side with a random-but-deterministic shard in [0, n), explode the
  * small side n×, join on (key, salt) — each hot key now spreads over n
  * tasks.
  */
object Skew {

  /** Deterministic salt in [0, n) derived from the row's other columns
    * (hash-based — reproducible across retries, unlike rand()).
    */
  def salt(n: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(n))

  /** Salted equi-join: `big` gets a salt per row; `small` is replicated n
    * times (explode over a salt sequence); join on key + salt. Result
    * equals the plain inner join row-for-row.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCol: String,
      saltBuckets: Int,
      saltSource: Seq[String]): DataFrame = {
    val salted = big.withColumn(
      "__salt", salt(saltBuckets, saltSource.map(col): _*))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted
      .join(replicated, Seq(keyCol, "__salt"))
      .drop("__salt")
  }

  /** Pre-flight skew profile of a join key — the signal that decides
    * whether [[saltedJoin]] (or an AQE skew threshold) pays: one row of
    * `(n, ndv, top_cnt)` — total rows, distinct keys, and the hottest
    * key's row count. The consumer compares `top_cnt` against the
    * uniform expectation `n/ndv`; `top_cnt * ndv > factor * n` is the
    * integer-exact salting trigger (no float compare in the decision).
    *
    * Cost shape: one groupBy on the key (the same exchange the join
    * itself would pay) then a 3-scalar rollup of the per-key counts. At
    * stats-collection time over 100 TB the sketch face is the
    * count-min heavy-hitter pass (q191) — this exact face is what the
    * sketch's estimates are audited against.
    */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
      .agg(
        sum(col("__c")).as("n"),
        count(lit(1)).as("ndv"),
        max(col("__c")).as("top_cnt"))
}
