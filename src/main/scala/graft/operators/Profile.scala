package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-grade per-column table profiling — the statistics surface a
  * planner (and a pipeline operator deciding broadcast thresholds, skew
  * handling, or partition counts) reads before touching a table: per
  * column, row count, null count, and number of distinct values.
  *
  * Shape: the exact face runs one trivial counts pass (every column's
  * n/n_nulls in a single narrow aggregate) plus one COLUMN-PRUNED
  * distinct sub-aggregate per column under a single union — each branch
  * reads only its own column (columnar storage makes the union's total
  * bytes the one-scan bytes) and shuffles only that column's distinct
  * values. The earlier one-agg multi-countDistinct form planned Spark's
  * multi-distinct Expand instead — every scanned row replicated once
  * per profiled column through a (cols+1)-wide partial-aggregate key,
  * all before any exchange can spread the work — measured 3.3x slower
  * on the 11-column bench table (r22). At corpus scale the
  * [[tableProfileApprox]] face replaces every `countDistinct` with an
  * HLL `approx_count_distinct` in one narrow pass (no Expand either
  * way), constant-size partials, rsd-bounded error (ProfileSpec pins
  * approx-vs-exact within the configured rsd per column).
  *
  * Columns are taken from the frame's own schema, so the operator
  * profiles any table it is handed — the dynamic-schema discipline of
  * the reference's union path (SURVEY §1) applied to stats collection.
  */
object Profile {

  def tableProfile(df: DataFrame): DataFrame = profileWith(df, exact = true)

  /** The scale face: HLL ndv per column, no Expand, one narrow pass.
    * `rsd` is Spark's relative-standard-deviation knob; the error is a
    * spec-pinned bound, not a silent approximation.
    */
  def tableProfileApprox(df: DataFrame, rsd: Double = 0.05): DataFrame =
    profileWith(df, exact = false, rsd)

  private def profileWith(
      df: DataFrame, exact: Boolean, rsd: Double = 0.05): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "cannot profile a zero-column frame")
    if (exact) {
      // r22 (guide §1.2/§6, measured): the one-agg multi-countDistinct
      // form plans Spark's Expand — the scan's rows replicate once per
      // distinct-aggregated column and the partial aggregate hashes a
      // (cols+1)-wide key per replicated row, all BEFORE any exchange
      // can spread the work. Per-column distinct sub-aggregates under
      // one union read ONLY their own column (columnar pruning), hash a
      // one-column key, and their stages parallelize independently —
      // measured 3.9 s -> 1.2 s warm on the 11-column bench table, and
      // the shuffled bytes are the same distinct (column, value) pairs
      // either way. The exact counts ride their own trivial narrow pass.
      val cAggs = count(lit(1)).as("__n") +:
        cols.map(c => count(col(c)).as(s"__nn_$c"))
      val counts = df.agg(cAggs.head, cAggs.tail: _*)
      val rows = cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls")))
      val longForm =
        counts.select(explode(array(rows: _*)).as("p")).select("p.*")
      val ndvs = cols.map { c =>
        df.select(col(c)).distinct().agg(count(col(c)).as("ndv"))
          .select(lit(c).as("column"), col("ndv"))
      }.reduce(_ unionByName _)
      longForm.join(broadcast(ndvs), Seq("column"))
        .select(col("column"), col("n_rows"), col("n_nulls"), col("ndv"))
    } else {
      // The approx face never plans an Expand (HLL partials are ordinary
      // one-pass aggregates), so the single wide aggregate stays the
      // right shape here.
      val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"__nn_$c"),
          approx_count_distinct(col(c), rsd).as(s"__ndv_$c"))
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val rows = cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__ndv_$c").as("ndv")))
      one.select(explode(array(rows: _*)).as("p")).select("p.*")
    }
  }

  /** Equi-width value histogram — the DISTRIBUTION stat beside the ndv
    * counts: `buckets` equal-width cells over the column's [min, max],
    * each row `(bucket, lo, hi, n_rows)`. Two scan-bounded passes (the
    * bounds, then the counted assignment — at parquet scale pass one is
    * footer min/max, i.e. free); the bounds ride a broadcast 1-row
    * cross, never a shuffle. The top boundary value clamps into the
    * last bucket (the standard closed-top convention). Bucket math is
    * plain IEEE arithmetic both engines reproduce bit for bit, so the
    * oracle renders the identical formula.
    */
  def equiWidthHistogram(
      df: DataFrame, valueCol: String, buckets: Int): DataFrame =
    equiWidthHistogramWithBounds(
      df, valueCol, buckets, columnBounds(df, valueCol))

  /** The [min, max] the histogram spans, as a 1-row `(__mn, __mx)`
    * frame. Split out because the bounds and the counted assignment are
    * SEPARATE stats in production: parquet footers give min/max for
    * free, and a sampled count ([[sampledHistogram]]'s device) must
    * bucket against the FULL bounds, not the sample's.
    */
  def columnBounds(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.filter(v.isNotNull)
      .agg(min(v).cast("double").as("__mn"), max(v).cast("double").as("__mx"))
  }

  /** [[equiWidthHistogram]] against externally supplied bounds (a 1-row
    * `(__mn, __mx)` frame — footer stats, a stored profile, or
    * [[columnBounds]] of a DIFFERENT frame than the counted one).
    */
  def equiWidthHistogramWithBounds(
      df: DataFrame, valueCol: String, buckets: Int,
      bounds: DataFrame): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val v = col(valueCol)
    val mn = col("__mn"); val mx = col("__mx")
    val bucket = when(mx === mn, lit(0L)).otherwise(
      least(lit(buckets - 1L),
        floor((v.cast("double") - mn) * buckets / (mx - mn))))
    df.filter(v.isNotNull).crossJoin(broadcast(bounds))
      .groupBy(bucket.as("bucket"), mn, mx)
      .agg(count(lit(1)).as("n_rows"))
      .select(
        col("bucket"),
        (mn + col("bucket") * (mx - mn) / buckets).as("lo"),
        (mn + (col("bucket") + 1) * (mx - mn) / buckets).as("hi"),
        col("n_rows"))
  }

  /** Most-common-values list — the third classic optimizer stat beside
    * the two histograms: the top-`k` values by exact count, totally
    * ordered by (count desc, value asc) so the cut is deterministic
    * cross-engine even through count ties. Plans as a grouped count
    * (one shuffle) into a global top-k (TakeOrderedAndProject — never a
    * full sort); k rows of state. Equality selectivity reads it as:
    * probe in the list → its exact count; otherwise the uniform
    * remainder `(n - mcv_mass) div (ndv - k)` — the Postgres-style
    * split that keeps heavy hitters exact and spreads the tail.
    */
  def mcvList(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("v").asc)
      .limit(k)
  }

  /** Two-dimensional equi-width grid histogram — the MULTI-COLUMN stat
    * that rescues selectivity estimation when columns correlate:
    * independence-combined marginals (sel_a * sel_b) can be off by the
    * full strength of the correlation, while a grid cell count carries
    * the joint distribution directly. Cells `(bucket_a, bucket_b)` over
    * each column's [min, max]; both bounds ride ONE broadcast 1-row
    * cross; one counted pass. buckets_a x buckets_b rows of state —
    * the quadratic-in-dimensions cost is why real systems keep grids
    * only for known-correlated pairs (and why the q242 audit exists to
    * find them).
    */
  def grid2dHistogram(
      df: DataFrame, colA: String, colB: String,
      bucketsA: Int, bucketsB: Int): DataFrame = {
    require(bucketsA > 0 && bucketsB > 0,
      s"buckets must be positive: $bucketsA, $bucketsB")
    val a = col(colA); val b = col(colB)
    val bounds = df.filter(a.isNotNull && b.isNotNull).agg(
      min(a).cast("double").as("__amn"), max(a).cast("double").as("__amx"),
      min(b).cast("double").as("__bmn"), max(b).cast("double").as("__bmx"))
    def cell(v: Column, mn: Column, mx: Column, k: Int) =
      when(mx === mn, lit(0L)).otherwise(
        least(lit(k - 1L), floor((v.cast("double") - mn) * k / (mx - mn))))
    val amn = col("__amn"); val amx = col("__amx")
    val bmn = col("__bmn"); val bmx = col("__bmx")
    df.filter(a.isNotNull && b.isNotNull).crossJoin(broadcast(bounds))
      .groupBy(
        cell(a, amn, amx, bucketsA).as("bucket_a"),
        cell(b, bmn, bmx, bucketsB).as("bucket_b"),
        amn, amx, bmn, bmx)
      .agg(count(lit(1)).as("n_rows"))
      .select(
        col("bucket_a"), col("bucket_b"),
        (amn + col("bucket_a") * (amx - amn) / bucketsA).as("a_lo"),
        (amn + (col("bucket_a") + 1) * (amx - amn) / bucketsA).as("a_hi"),
        (bmn + col("bucket_b") * (bmx - bmn) / bucketsB).as("b_lo"),
        (bmn + (col("bucket_b") + 1) * (bmx - bmn) / bucketsB).as("b_hi"),
        col("n_rows"))
  }

  /** Conjunctive range selectivity `|a >= ca AND b >= cb|` from a
    * [[grid2dHistogram]]: per cell, the product of each dimension's
    * uniform-within-cell overlap fraction times the cell count —
    * [[rangeSelectivity]]'s rule applied jointly, which is exactly what
    * the independence combination of two marginal histograms CANNOT do.
    * DECIMAL-accumulated like every double fold in the registry.
    * Output: (cutoff_a, cutoff_b, predicted).
    */
  def gridSelectivity(
      grid: DataFrame, cutoffs: Seq[(Double, Double)]): DataFrame = {
    def frac(c: Column, lo: Column, hi: Column): Column =
      when(c <= lo, lit(1.0)).when(c >= hi, lit(0.0))
        .otherwise((hi - c) / (hi - lo))
    val cuts = cutoffs.map { case (a, b) =>
      struct(lit(a).as("cutoff_a"), lit(b).as("cutoff_b")) }
    val contrib = col("n_rows") *
      frac(col("cutoff_a"), col("a_lo"), col("a_hi")) *
      frac(col("cutoff_b"), col("b_lo"), col("b_hi"))
    grid.crossJoin(
        broadcast(grid.sparkSession.range(1).select(
          explode(array(cuts: _*)).as("q")).select("q.*")))
      .groupBy(col("cutoff_a"), col("cutoff_b"))
      .agg(sum(contrib.cast("decimal(28,6)")).cast("double").as("predicted"))
  }

  /** Per-cell counts against FROZEN plan-literal bounds — the streaming
    * histogram's building block. Fixed boundaries are what make the
    * counts ADDITIVE across arrival batches (recomputed bounds would
    * re-bucket history); values outside [mn, mx] land in the explicit
    * DRIFT cells `-1` (below) and `buckets` (above) instead of being
    * clamped invisible — growing drift mass IS the signal that the
    * bounds need recalibration (and a fresh base histogram).
    */
  def bucketizeFrozen(
      df: DataFrame, valueCol: String,
      mn: Double, mx: Double, buckets: Int): DataFrame = {
    require(buckets > 0 && mx > mn,
      s"need positive buckets and mx > mn: $buckets, [$mn, $mx]")
    val v = col(valueCol)
    val cell = when(v < mn, lit(-1L))
      .when(v > mx, lit(buckets.toLong))
      .otherwise(least(lit(buckets - 1L),
        floor((v.cast("double") - mn) * buckets / (mx - mn))))
    df.filter(v.isNotNull)
      .groupBy(cell.as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Streaming histogram maintenance — drive from
    * `writeStream.foreachBatch`: fold one micro-batch's frozen-bounds
    * cell counts ([[bucketizeFrozen]]) additively into the served
    * table. Additive, so it carries the exactly-once batch-id ingest
    * contract (a replayed batch double-counts — unlike the register
    * side of [[refreshBatch]]). Constant buckets+2 rows of state; the
    * read-merge-overwrite cycle is cell-sized work per batch.
    */
  def histRefreshBatch(
      batch: DataFrame, valueCol: String,
      mn: Double, mx: Double, buckets: Int, table: String): Unit = {
    val spark = batch.sparkSession
    val cells = bucketizeFrozen(batch, valueCol, mn, mx, buckets)
    val merged =
      if (spark.catalog.tableExists(table))
        spark.table(table).unionByName(cells)
          .groupBy("bucket").agg(sum("n_rows").as("n_rows"))
      else cells
    val pinned = merged.localCheckpoint()
    try pinned.write.mode("overwrite").format("parquet").saveAsTable(table)
    finally pinned.unpersist()
  }

  /** Sample-estimated histogram beside the truth — the stats-COLLECTION
    * cost story: a deterministic 1-in-`rate` hash sample of the rows
    * (sampleCol), bucketed against the FULL bounds (footers give those
    * free), scaled back by `rate`. At 100 TB the estimate face scans
    * 1/rate of the data (or a maintained sample table); this audit
    * query pays for both faces to put the per-cell error on record.
    * Output: (bucket, n_true, n_est) — both exact integers, the scale-up
    * is arithmetic, so the comparison is engine-portable with no float.
    */
  def sampledHistogram(
      df: DataFrame, valueCol: String, buckets: Int,
      sampleCol: Column, rate: Long): DataFrame = {
    val bounds = columnBounds(df, valueCol)
    val t = equiWidthHistogramWithBounds(df, valueCol, buckets, bounds)
      .select(col("bucket"), col("n_rows").as("n_true"))
    val s = equiWidthHistogramWithBounds(
        df.filter(sampleCol), valueCol, buckets, bounds)
      .select(col("bucket"), (col("n_rows") * rate).as("n_est"))
    t.join(s, Seq("bucket"), "left")
      .select(col("bucket"), col("n_true"),
        coalesce(col("n_est"), lit(0L)).as("n_est"))
  }

  /** Range-selectivity estimate from a stored [[equiWidthHistogram]] —
    * the PREDICATE half of System-R costing beside q231's join half:
    * for each cutoff c, predicted |v >= c| = full buckets above c plus
    * the uniform-within-bucket interpolation of c's own bucket,
    * `n_k * (hi_k - c) / (hi_k - lo_k)`. The evaluation reads the
    * HISTOGRAM (buckets rows), not the table — the whole point of
    * storing it: costing a predicate over 100 TB from KBs of stats.
    * Per-bucket contributions go through exact DECIMAL accumulation
    * (the registry's double-sum determinism rule) so the fold is
    * order-independent. Output: (cutoff, predicted).
    */
  def rangeSelectivity(hist: DataFrame, cutoffs: Seq[Double]): DataFrame = {
    val c = col("cutoff")
    val contrib: Column =
      when(c <= col("lo"), col("n_rows").cast("double"))
        .when(c >= col("hi"), lit(0.0))
        .otherwise(col("n_rows") * (col("hi") - c) / (col("hi") - col("lo")))
    val cuts = cutoffs.map(x => struct(lit(x).as("cutoff")))
    hist.crossJoin(
        broadcast(hist.sparkSession.range(1).select(
          explode(array(cuts: _*)).as("q")).select("q.*")))
      .groupBy(c)
      .agg(sum(contrib.cast("decimal(28,6)")).cast("double").as("predicted"))
  }

  /** Equi-DEPTH histogram — what production optimizers actually store:
    * `buckets` cells of (near-)equal ROW count cut along the value
    * order, boundaries = each cell's observed min/max. Under skew the
    * equi-width face ([[equiWidthHistogram]]) piles most rows into few
    * cells and its uniform-interpolation error is unbounded; equi-depth
    * bounds any range predicate's error at ±1 bucket = ±n/buckets rows
    * by construction. Cost: one total-order rank over `okeyCol`
    * (ShardedPrefix.globalRank — the two-phase device, never a
    * single-task window) + one groupBy on the cell id; the row count
    * rides a broadcast 1-row cross. `okeyCol` must be a unique non-null
    * long whose order refines the value order (value-major composite) —
    * that is what makes the cuts deterministic cross-engine.
    */
  def equiDepthHistogram(
      df: DataFrame,
      valueCol: String,
      okeyCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val cnt = df.agg(count(lit(1)).as("__n"))
    ShardedPrefix.globalRank(
        df.withColumn("__g", lit(1)), "__g", okeyCol, "__rank")
      .crossJoin(broadcast(cnt))
      .withColumn("__bucket",
        expr(s"(__rank - 1) div ((__n + ${buckets - 1}) div ${buckets}L)"))
      .groupBy(col("__bucket").as("bucket"))
      .agg(
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"),
        count(lit(1)).as("n_rows"))
  }

  /** Long-form (column, value-as-string) pairs for sketch-based profile
    * maintenance: ONE scan whatever the column count (each row explodes
    * into its per-column struct), nulls dropped per column (the profile
    * counts them separately and exactly). Restricted to column types
    * whose canonical string rendering is engine-portable (string /
    * integral) — the hash input contract of the portable HLL.
    */
  def columnValues(df: DataFrame, cols: Seq[String]): DataFrame = {
    val rows = cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("v")))
    df.select(explode(array(rows: _*)).as("p")).select("p.*")
      .filter(col("v").isNotNull)
  }

  /** Per-column HLL register table — the profile stat that stays
    * maintainable at 100 TB: `(column, bucket, register)` cells whose
    * cell-wise max-merge ([[HyperLogLog.merge]]) folds shard profiles
    * into the corpus profile without rescanning anything. Constant
    * `cols x 2^p` state however large the table.
    */
  def profileSketch(df: DataFrame, cols: Seq[String], p: Int): DataFrame =
    HyperLogLog.registers(columnValues(df, cols), "v", Seq("column"), p)

  /** Exact count half of the incremental profile: per-column
    * `(n_rows, n_nulls)` in one scan — these fold ADDITIVELY across
    * disjoint shards (each row counts into exactly one shard; the
    * exactly-once contract documented on CountMin.merge), so the
    * served profile's exact counts need no sketch at all.
    */
  def countStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +:
      cols.map(c => count(col(c)).as(s"__nn_$c"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("column"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_nulls")))
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** The served incremental profile: fold shard count-stats (additive)
    * and shard register tables (max-merge) into the corpus-level
    * ANALYZE surface `(column, n_rows, n_nulls, s_scaled, hll_raw)` —
    * counts exact, ndv as the fixed-point HLL raw estimate (the q104
    * device: no transcendental in the checked path). Because both folds
    * are the monoids of their stats, the folded profile EQUALS the
    * from-scratch profile stat for stat — which is what the oracle
    * recomputes. Nothing here touches raw data: shards arrive already
    * reduced to KB-scale stats.
    */
  def foldProfiles(
      counts: Seq[DataFrame],
      sketches: Seq[DataFrame],
      p: Int): DataFrame = {
    val cnt = counts.reduce(_ unionByName _)
      .groupBy("column")
      .agg(sum("n_rows").as("n_rows"), sum("n_nulls").as("n_nulls"))
    val regs = sketches.reduce((a, b) => HyperLogLog.merge(a, b, Seq("column")))
    cnt.join(
      HyperLogLog.estimateRaw(regs, Seq("column"), p), Seq("column"))
  }

  /** The STREAMING face of q234's fold — drive from
    * `writeStream.foreachBatch`: one micro-batch's rows fold into the
    * served stats tables. Registers go through
    * [[HyperLogLog.refreshBatch]] (cell-wise max — idempotent, so
    * AT-LEAST-ONCE delivery is already safe); counts are ADDITIVE, so
    * this side carries the exactly-once ingest contract (the engine's
    * checkpointed batch ids — same contract as CountMin.merge; a
    * replayed batch would double-count rows, which the max side would
    * shrug off). Both tables are constant-size (cols rows / cols x 2^p
    * cells): the read-merge-overwrite cycle is stats-sized work per
    * batch, and the localCheckpoint pins the merged counts BEFORE the
    * overwrite drops the table they were read from.
    */
  def refreshBatch(
      batch: DataFrame,
      cols: Seq[String],
      p: Int,
      cntTable: String,
      regTable: String): Unit = {
    val spark = batch.sparkSession
    HyperLogLog.refreshBatch(
      profileSketch(batch, cols, p), regTable, Seq("column"))
    val batchCnt = countStats(batch, cols)
    val merged =
      if (spark.catalog.tableExists(cntTable))
        spark.table(cntTable).unionByName(batchCnt)
          .groupBy("column")
          .agg(sum("n_rows").as("n_rows"), sum("n_nulls").as("n_nulls"))
      else batchCnt
    val pinned = merged.localCheckpoint()
    try pinned.write.mode("overwrite").format("parquet").saveAsTable(cntTable)
    finally pinned.unpersist()
  }

  /** Derive the q234 ANALYZE surface from the SERVED tables — the read
    * side of [[refreshBatch]]: stats-table-sized work, the corpus is
    * never touched. Equals the batch [[foldProfiles]] over everything
    * ingested (StreamingIncrementalSpec pins it across micro-batches).
    */
  def servedProfile(
      spark: org.apache.spark.sql.SparkSession,
      cntTable: String,
      regTable: String,
      p: Int): DataFrame =
    spark.table(cntTable).join(
      HyperLogLog.estimateRaw(spark.table(regTable), Seq("column"), p),
      Seq("column"))
}
