package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index: build ONCE, probe many times.
  *
  * [[Similarity.cosineTopKIvf]] quantizes the corpus on every query run —
  * correct, but at 100 TB the corpus assignment pass (a full scan +
  * broadcast-centroid scoring) dwarfs any single probe. The production
  * shape materializes the index: a tiny centroid table plus the corpus
  * assignments written BUCKETED BY CELL, so that
  *  - the assignment scan/scoring cost is paid once at build time;
  *  - every probe reads only the probed cells' buckets (bucket pruning on
  *    the cell key) and joins them WITHOUT shuffling the corpus — the
  *    bucketed layout IS the shuffle, amortized;
  *  - recall/cost stays tunable per query via nprobe, unchanged.
  *
  * Probe semantics are identical to [[Similarity.cosineTopKIvf]] (same
  * quantizer, same tiebreaks), which is exactly what the oracle and spec
  * check.
  */
object IvfIndex {

  def centroidTable(prefix: String): String = s"${prefix}_centroids"
  def corpusTable(prefix: String): String = s"${prefix}_cells"

  /** Build the index tables from the corpus. `buckets` sizes the cell
    * layout (cells-per-bucket is fine; bucket pruning still skips
    * non-probed buckets).
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int = 16,
      buckets: Int = 8,
      prefix: String = "graft_ivf",
      centroidsOpt: Option[DataFrame] = None): Unit = {
    val spark = corpus.sparkSession
    // Default: the deterministic first-nlist quantizer (oracle-friendly);
    // production passes Similarity.trainedCentroids for real k-means cells.
    val cents = centroidsOpt.getOrElse(
      Similarity.centroids(corpus, idCol, embCol, nlist))
    Bucketing.dropWithLocation(spark, centroidTable(prefix))
    cents.write.format("parquet").saveAsTable(centroidTable(prefix))
    val assigned = Similarity.assignCells(corpus, cents, idCol, embCol, "neighbor_id", keep = 1)
    Bucketing.writeBucketed(assigned, corpusTable(prefix), "cell", buckets)
  }

  /** Probe the persisted index: assign each query to its `nprobe` nearest
    * centroids (broadcast of the tiny centroid table), join the probed
    * cells' corpus buckets, exact-score the candidates, keep top-k.
    */
  def probe(
      spark: SparkSession,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nprobe: Int = 2,
      prefix: String = "graft_ivf"): DataFrame =
    probeCells(spark, spark.table(corpusTable(prefix)),
      queries, idCol, embCol, k, nprobe, prefix)

  def deltaTable(prefix: String): String = s"${prefix}_delta"

  /** Fold an arrival batch into the persisted index at DELTA cost — the
    * production vector-store segment model (an IVF base segment plus a
    * fresh delta segment, compacted periodically): arrivals are assigned
    * to the FROZEN centroid table (one broadcast-centroid scoring pass
    * over the batch, nothing corpus-sized moves) and written as their own
    * cell-bucketed delta segment; the base postings are untouched.
    * Probes read base ∪ delta ([[probeSegments]]).
    *
    * Centroids are frozen between re-trains, so cell QUALITY degrades
    * gracefully as the arrival distribution drifts — that moves
    * recall-per-nprobe only, never correctness (the probe exact-scores
    * whatever the probed cells contain). Because assignment to a fixed
    * quantizer is deterministic and cell-local, probe(base ∪ delta)
    * EQUALS a probe of an index rebuilt from scratch over the merged
    * corpus with the same centroids, row for row (IvfIndexSpec pins it;
    * q156's oracle floods the merged corpus). The periodic re-train +
    * compact is [[build]] over the merged corpus — the batch path.
    */
  def appendDelta(
      arrivals: DataFrame,
      idCol: String,
      embCol: String,
      buckets: Int = 8,
      prefix: String = "graft_ivf"): Unit = {
    val spark = arrivals.sparkSession
    val cents = spark.table(centroidTable(prefix))
    val assigned = Similarity.assignCells(
      arrivals, cents, idCol, embCol, "neighbor_id", keep = 1)
    Bucketing.writeBucketed(assigned, deltaTable(prefix), "cell", buckets)
  }

  /** The STREAMING face of [[appendDelta]]: fold one arrival micro-batch
    * into an ACCUMULATING delta segment (append, not overwrite) — drive
    * it from `writeStream.foreachBatch`, where the streaming engine's
    * checkpointed batch ids give the exactly-once this append-mode write
    * needs (a replayed batch would append twice; [[appendDelta]]'s
    * overwrite form is the idempotent single-batch tool). Same frozen
    * quantizer, same bucket spec, so [[probeSegments]] semantics are
    * unchanged as batches accumulate; compaction = [[build]] over the
    * merged corpus, exactly the vector-store segment lifecycle.
    */
  def appendDeltaBatch(
      arrivals: DataFrame,
      idCol: String,
      embCol: String,
      buckets: Int = 8,
      prefix: String = "graft_ivf"): Unit = {
    val spark = arrivals.sparkSession
    val cents = spark.table(centroidTable(prefix))
    val assigned = Similarity.assignCells(
      arrivals, cents, idCol, embCol, "neighbor_id", keep = 1)
    Bucketing.appendBucketed(assigned, deltaTable(prefix), "cell", buckets)
  }

  /** Probe base + delta segments: identical semantics to [[probe]] over
    * the merged postings. Both segments are cell-bucketed with the same
    * layout; the query side is a broadcast, so neither segment ever
    * shuffles — the union streams both scans in place.
    */
  def probeSegments(
      spark: SparkSession,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nprobe: Int = 2,
      prefix: String = "graft_ivf"): DataFrame =
    probeCells(spark,
      spark.table(corpusTable(prefix))
        .unionByName(spark.table(deltaTable(prefix))),
      queries, idCol, embCol, k, nprobe, prefix)

  /** SEGMENT COMPACTION — fold the accumulated delta back into the base:
    * the periodic maintenance step the [[appendDelta]] lifecycle promises
    * ("compaction = the batch path over the merged corpus"), made a
    * first-class operator. Base and delta carry identical cell-bucketed
    * layouts and were assigned by the SAME frozen centroid table, so the
    * merge is a union rewrite — no re-assignment pass, centroids
    * untouched — and afterwards [[probe]] of the new base EQUALS the
    * pre-compaction [[probeSegments]] row for row (IvfIndexSpec pins it;
    * q228's oracle floods the merged corpus exactly as q156's does).
    * What compaction buys at serving time: probes stop paying the
    * delta-union scan and the per-cell file count drops back to one
    * segment's worth — the LSM-style read-amplification reset.
    *
    * Staged via rename swap: the merged table is written to a staging
    * name first, then swapped in, so a crash mid-write never leaves a
    * half-written base as the live index. The delta is reset to an
    * EMPTY table with the same schema and bucket spec — the segment
    * lifecycle continues with the next [[appendDeltaBatch]].
    */
  def compact(
      spark: SparkSession,
      buckets: Int = 8,
      prefix: String = "graft_ivf"): Unit = {
    val staging = s"${corpusTable(prefix)}_compacting"
    val merged = spark.table(corpusTable(prefix))
      .unionByName(spark.table(deltaTable(prefix)))
    Bucketing.writeBucketed(merged, staging, "cell", buckets)
    Bucketing.dropWithLocation(spark, corpusTable(prefix))
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `${corpusTable(prefix)}`")
    Bucketing.writeBucketed(
      spark.table(corpusTable(prefix)).limit(0),
      deltaTable(prefix), "cell", buckets)
  }

  private def probeCells(
      spark: SparkSession,
      corpusCells: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nprobe: Int,
      prefix: String): DataFrame = {
    graft.functions.DotProductFF.register(spark)
    val cents = spark.table(centroidTable(prefix))
    val queryCells = Similarity
      .assignCells(queries, cents, idCol, embCol, "q_id", keep = nprobe)
      .withColumnRenamed("emb", "q_emb").withColumnRenamed("nrm", "q_nrm")
    val scored = corpusCells
      .join(queryCells, Seq("cell"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        (Similarity.dotD(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("sim"))
      .dropDuplicates("q_id", "neighbor_id") // a pair can meet in >1 probed cell
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
