package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch, completing the mergeable-sketch
  * family beside the KMV distinct sketch ([[graft.functions.KMinSketch]])
  * and the count-min frequency sketch ([[CountMin]]): `m = 2^p` one-byte
  * registers estimate billions of distinct keys, merge by cell-wise max,
  * and never rescan the stream (Flajolet et al., "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm", 2007).
  *
  * DETERMINISM: the hash is the portable md5-derived 32-bit hash
  * ([[TextAnalysis.portableHash32]]), the bucket is its low `p` bits and
  * the rank is computed from the remaining `32-p` bits with integer
  * arithmetic only, so the register table reproduces bit-for-bit in any
  * engine with md5 — the oracle checks the sketch ITSELF, register for
  * register (same contract as the q98 count-min matrix). The harmonic
  * sum behind the estimate is kept in FIXED-POINT: `S * 2^(33-p)` is an
  * integer <= 2^33 (each register contributes `2^(33-p-rank)` >= 1, an
  * absent bucket contributes `2^(33-p)`), so the sum is exact, order-
  * independent BIGINT arithmetic and the raw estimate needs exactly one
  * IEEE double multiply and one divide — bit-identical across engines,
  * with no transcendental in the checked path.
  *
  * Scale shape: one narrow shuffle onto a key space of (group x m) cells
  * with full map-side combine (`max` is the combiner), output size
  * CONSTANT in corpus size. At 100 TB the sketch is the right answer to
  * "distinct tokens per source" where exact countDistinct would shuffle
  * the full key stream.
  */
object HyperLogLog {

  /** Max rank for a 32-bit hash with `p` bucket bits: ranks lie in
    * `[1, 33-p]` (the `32-p` payload bits all-zero case takes rank
    * `33-p`, one past the lowest detectable leading-one position).
    */
  def maxRank(p: Int): Int = 33 - p

  /** Bucket (low `p` bits) and rank (leading-zero count of the high
    * `32-p` bits, plus one) of the portable hash of `key`. The rank uses
    * `length(bin(w))` — the minimal binary rendering both Spark and
    * DuckDB provide — so `rank = (33-p) - bitlen(w)` for `w > 0`.
    */
  private def bucketCol(key: Column, p: Int): Column =
    TextAnalysis.portableHash32(key).bitwiseAND(lit((1L << p) - 1L))

  private def rankCol(key: Column, p: Int): Column = {
    val w = shiftright(TextAnalysis.portableHash32(key), p)
    when(w === 0L, lit(maxRank(p)))
      .otherwise(lit(maxRank(p)) - length(bin(w)))
  }

  /** Build the register table: one row per non-empty (group, bucket) with
    * `register` = max rank observed. Absent buckets are implicitly rank 0
    * (never hit), the convention [[estimate]] and the oracle share. At
    * `p = 6` each group is at most 64 rows however large its key stream.
    */
  def registers(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      p: Int): DataFrame = {
    require(p >= 2 && p <= 16, s"p must be in [2,16]: $p")
    df.select(
        groupCols.map(col) :+ bucketCol(col(keyCol), p).as("bucket") :+
          rankCol(col(keyCol), p).as("rank"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rank")).as("register"))
  }

  /** Merge two register tables (sketch union): cell-wise max, absent
    * cells pass through — the monoid that makes the sketch maintainable
    * incrementally (per-shard sketches, foreachBatch refresh) without
    * touching raw data again.
    */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols :+ "bucket"
    a.select(keys.map(col) :+ col("register"): _*)
      .unionByName(b.select(keys.map(col) :+ col("register"): _*))
      .groupBy(keys.map(col): _*)
      .agg(max(col("register")).as("register"))
  }

  /** The STREAMING face of the q160 fold: fold one arrival micro-batch's
    * registers into a SERVED register table — drive it from
    * `writeStream.foreachBatch`. Because the merge is a cell-wise MAX
    * (idempotent), this refresh tolerates AT-LEAST-ONCE delivery: a
    * replayed batch re-maxes the same registers and the table is
    * unchanged — unlike the additive folds ([[CountMin.merge]],
    * [[IvfIndex.appendDeltaBatch]]'s append), which need the engine's
    * checkpointed batch ids for exactly-once. That asymmetry is the
    * operational reason to prefer max-monoid sketches at the serving
    * seam when both answer the question.
    *
    * The table is constant-size (groups x 2^p cells), so the
    * read-merge-overwrite cycle is register-sized work per batch; the
    * localCheckpoint pins the merged result BEFORE the overwrite drops
    * the old table (a lazy plan reading the table it overwrites would
    * race its own source), and is released after the write lands.
    */
  def refreshBatch(
      batchRegisters: DataFrame,
      table: String,
      groupCols: Seq[String]): Unit = {
    val spark = batchRegisters.sparkSession
    val merged =
      if (spark.catalog.tableExists(table))
        merge(spark.table(table), batchRegisters, groupCols)
      else batchRegisters
    val pinned = merged.localCheckpoint()
    try pinned.write.mode("overwrite").format("parquet").saveAsTable(table)
    finally pinned.unpersist()
  }

  /** Bias-correction constant `alpha_m` (Flajolet et al. §4) as a SQL
    * fragment with every literal cast to DOUBLE — bare decimal literals
    * parse as DECIMAL in both Spark and DuckDB and would pull the
    * arithmetic into (engine-specific) decimal rules; casting each leaf
    * pins identical IEEE double evaluation on both sides.
    */
  def alphaLiteral(p: Int): String = (1 << p) match {
    case 16 => "CAST(0.673 AS DOUBLE)"
    case 32 => "CAST(0.697 AS DOUBLE)"
    case 64 => "CAST(0.709 AS DOUBLE)"
    case m =>
      s"CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + " +
        s"CAST(1.079 AS DOUBLE) / CAST($m AS DOUBLE))"
  }

  /** Raw HLL estimate per group from a register table:
    * `E = alpha_m * m^2 / S` with `S` the harmonic sum over ALL m
    * buckets. Emits the exact fixed-point sum (`s_scaled = S * 2^(33-p)`,
    * BIGINT) alongside the one-divide double estimate — both
    * engine-portable. The small-range linear-counting correction needs
    * `ln` (libm-dependent), so it lives in [[estimateCorrected]] and is
    * spec-pinned rather than oracle-checked.
    */
  def estimateRaw(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val sScaled =
      (lit(m.toLong) - count(lit(1))) * lit(1L << maxRank(p)) +
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${maxRank(p)} - register)"))
    regs.groupBy(groupCols.map(col): _*)
      .agg(sScaled.as("s_scaled"))
      .withColumn("hll_raw",
        expr(s"(${alphaLiteral(p)}) * ${m.toLong * m * (1L << maxRank(p))}.0" +
          " / CAST(s_scaled AS DOUBLE)"))
  }

  /** [[estimateRaw]] plus the standard small-range correction: when
    * `E <= 2.5m` and some buckets are empty, linear counting
    * `m * ln(m / V)` is the better estimator (V = empty buckets). Uses
    * `ln`, so accuracy is spec-pinned (HyperLogLogSpec), not oracled.
    */
  def estimateCorrected(
      regs: DataFrame,
      groupCols: Seq[String],
      p: Int): DataFrame = {
    val m = 1 << p
    val withV = regs.groupBy(groupCols.map(col): _*)
      .agg(
        (lit(m.toLong) - count(lit(1))).as("v_empty"),
        ((lit(m.toLong) - count(lit(1))) * lit(1L << maxRank(p)) +
          sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${maxRank(p)} - register)")))
          .as("s_scaled"))
      .withColumn("hll_raw",
        expr(s"(${alphaLiteral(p)}) * ${m.toLong * m * (1L << maxRank(p))}.0" +
          " / CAST(s_scaled AS DOUBLE)"))
    withV.withColumn("estimate",
      when(col("hll_raw") <= lit(2.5 * m) && col("v_empty") > 0L,
        lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty")))
        .otherwise(col("hll_raw")))
  }
}
