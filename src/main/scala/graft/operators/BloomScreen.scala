package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership screen: test a corpus stream against a
  * blocklist with CONSTANT broadcast state (an m-bit bitmap), independent
  * of blocklist cardinality. At 100 TB this is the difference between
  * broadcasting a multi-GB key set (or shuffle-joining the corpus against
  * it) and broadcasting a fixed bitmap: false positives at a tunable
  * rate, zero false negatives — the right polarity for a screen whose
  * positives get a second exact look.
  *
  * DETERMINISM: k salted portable md5 hashes mod m set/probe the bits, so
  * filter contents and every probe answer (false positives included)
  * reproduce bit-for-bit in any engine with md5 — the probe column is
  * DuckDB-oracle-checkable, not just statistically characterized.
  *
  * Scale shape: the build is one distinct-aggregate over k*|blocklist|
  * ints whose OUTPUT is bounded by m (the driver-side collect is
  * guarded by exactly that bound, the `maxPlanGrams` plan-literal
  * contract); the probe is row-local codegen against the broadcast
  * bitmap — zero joins, zero shuffles on the corpus stream.
  */
object BloomScreen {

  /** Position of `key` under salted hash `i`, in `[0, m)`. */
  def position(key: Column, i: Int, m: Int): Column =
    pmod(TextAnalysis.portableHash32(concat(lit(s"bloom$i:"), key)), lit(m.toLong))

  /** Build the filter as an m-bit bitmap (little-endian longs). The
    * distinct-position aggregate runs IN Spark (map-side combined); only
    * the <= m surviving positions are collected, so the literal is
    * bounded by the filter geometry, never by blocklist size.
    */
  def build(
      keys: DataFrame,
      keyCol: String,
      k: Int,
      m: Int,
      maxPlanBits: Int = 1 << 20): Array[Long] = {
    require(k >= 1, s"k must be >= 1: $k")
    require(m >= 64 && m % 64 == 0, s"m must be a positive multiple of 64: $m")
    require(m <= maxPlanBits,
      s"m = $m exceeds maxPlanBits = $maxPlanBits: the bitmap is a plan " +
        "literal broadcast with the query; raise the cap deliberately if " +
        "a wider filter is intended")
    val posCols = (0 until k).map(i => position(col(keyCol), i, m))
    val positions = keys
      .select(explode(array(posCols: _*)).as("p"))
      .distinct()
      .collect()
      .map(_.getLong(0))
    val words = new Array[Long](m / 64)
    positions.foreach { p =>
      words((p / 64).toInt) |= (1L << (p % 64).toInt)
    }
    words
  }

  /** Probe column: true iff every one of `key`'s k bits is set — "maybe
    * in the blocklist". Row-local: an element_at into the literal word
    * array plus a variable-amount shiftright (SQL shiftright accepts a
    * column amount; the Scala wrapper does not).
    */
  def maybeContains(key: Column, words: Array[Long], k: Int, m: Int): Column = {
    require(words.length.toLong * 64 == m, s"bitmap/m mismatch: ${words.length} words vs m=$m")
    val wordsLit = lit(words)
    (0 until k).map { i =>
      val p = position(key, i, m)
      val word = element_at(wordsLit, (p / 64L).cast("int") + 1)
      call_function("shiftright", word, (p % 64L).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Screen `df`: adds `maybe_blocked` (the Bloom probe) and
    * `exact_blocked` (a broadcast semi-join ground truth, for measuring
    * the realized false-positive rate). Production screens at scale drop
    * the exact column and route `maybe_blocked` rows to a second-stage
    * exact check over the tiny surviving subset.
    */
  def screen(
      df: DataFrame,
      keyCol: String,
      blocklist: DataFrame,
      blockKeyCol: String,
      k: Int,
      m: Int): DataFrame = {
    val words = build(blocklist, blockKeyCol, k, m)
    val exact = blocklist.select(col(blockKeyCol).as(keyCol)).distinct()
      .withColumn("__bl_hit", lit(true))
    df.withColumn("maybe_blocked", maybeContains(col(keyCol), words, k, m))
      .join(broadcast(exact), Seq(keyCol), "left")
      .withColumn("exact_blocked", coalesce(col("__bl_hit"), lit(false)))
      .drop("__bl_hit")
  }
}
