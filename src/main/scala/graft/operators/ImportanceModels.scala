package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based data-selection primitives over `documents` — the curation
  * stage a training-data pipeline runs AFTER rule filters (q51) and dedup:
  * score every document against a learned picture of a target distribution,
  * then sample/threshold on the score.
  *
  * Two classic shapes, both re-expressed as pure DataFrame aggregations:
  *
  *  - DSIR-style hashed-feature importance weighting ([[dsirWeights]]):
  *    hash every word occurrence into a small fixed bucket space, estimate
  *    target vs raw bucket masses corpus-wide, and weight each document by
  *    how target-like its token mass is.
  *  - Reference-n-gram-LM scoring ([[bigramLmScore]], CCNet-style): train
  *    add-one-smoothed bigram counts on a reference slice and score every
  *    document by its mean smoothed bigram probability.
  *
  * Cross-engine determinism: classic formulations sum LOG probabilities,
  * but `ln` is a transcendental whose last-ulp rounding is not guaranteed
  * identical across engines, so the DuckDB differential oracle could flap.
  * Both scores here are therefore defined as exact integer-mass ratios —
  * every aggregate is an integer SUM/COUNT and the score is ONE final
  * double division (IEEE-exact on both engines). The ranking they induce
  * serves the same selection purpose (arithmetic-mean likelihood instead
  * of geometric-mean); the monotone log view can be taken downstream where
  * bit-equality is not contractual.
  *
  * Scale shape (100 TB): the learned state is a constant-size bucket table
  * (256 for DSIR, 65 536 for the LM) — broadcast to every executor, never
  * shuffled; token/bigram occurrences shuffle exactly once, onto the
  * document id, with map-side partial aggregation. No driver collect, no
  * all-pairs stage, state independent of corpus size (the same monoid
  * property the sketch family relies on).
  */
object ImportanceModels {

  /** DSIR hashed-feature space: small on purpose (collisions act as the
    * regularizer, per the published recipe) and broadcast-cheap.
    */
  val DsirBuckets = 256

  /** Bigram-LM bucket space: 2^16 hashed bigrams — large enough that
    * add-one smoothing dominates only unseen grams, still < 1 MB to
    * broadcast as (bucket, cnt) longs.
    */
  val LmBuckets = 65536

  /** Engine-portable bucket id in [0, m): md5-derived 32-bit word hash
    * (see [[graft.functions.PortableHash32]]) mod a power-of-two space.
    * Non-negative because the hash is an unsigned 32-bit value in a long.
    */
  private def hashBucket(c: Column, m: Int): Column =
    TextAnalysis.portableHash32(c) % m

  /** DSIR-style importance weight per document.
    *
    * Pass 1 estimates per-bucket token masses of the target slice
    * (`targetPred`) and the raw remainder; pass 2 re-walks each document's
    * tokens against the broadcast bucket table and aggregates the doc's
    * target/raw masses. The weight is the smoothed mass ratio
    * `(target_mass + n) / (raw_mass + n)` — > 1 means the document's
    * vocabulary is more target-like than raw-like; feed it to weighted
    * sampling (q89) for the selection step.
    *
    * Returns (idCol, n_toks, target_mass, raw_mass, dsir_weight).
    */
  def dsirWeights(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      targetPred: Column,
      buckets: Int = DsirBuckets): DataFrame = {
    val occ = docs
      .select(
        col(idCol),
        targetPred.cast("boolean").as("is_target"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .select(
        col(idCol),
        col("is_target"),
        hashBucket(col("w"), buckets).as("bucket"))
    // Constant-size model: `buckets` rows whatever the corpus size.
    val stats = occ
      .groupBy("bucket")
      .agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("target_cnt"),
        sum(when(col("is_target"), 0L).otherwise(1L)).as("raw_cnt"))
    scoreAgainstDsirStats(occ.select(col(idCol), col("bucket")), idCol, stats)
  }

  /** (idCol, bucket) hashed-word occurrence stream — the shared front
    * half of batch DSIR weighting and the streaming stats fold.
    */
  def dsirOccurrences(
      docs: DataFrame, textCol: String, idCol: String,
      buckets: Int = DsirBuckets): DataFrame =
    docs
      .select(col(idCol), explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .select(col(idCol), hashBucket(col("w"), buckets).as("bucket"))

  /** Weight an occurrence stream against TRAINED bucket stats
    * (bucket, target_cnt, raw_cnt) — the back half of [[dsirWeights]],
    * shared with the folded-stats path.
    */
  def scoreAgainstDsirStats(
      occ: DataFrame, idCol: String, stats: DataFrame): DataFrame =
    occ
      .join(broadcast(stats), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_toks"),
        sum("target_cnt").as("target_mass"),
        sum("raw_cnt").as("raw_mass"))
      .withColumn(
        "dsir_weight",
        (col("target_mass") + col("n_toks")).cast("double")
          / (col("raw_mass") + col("n_toks")).cast("double"))

  /** Reference-bigram-LM quality score per document.
    *
    * Trains hashed-bigram counts on the `trainPred` slice, then scores
    * every document (with >= 1 bigram — sub-2-token docs have no bigram
    * stream to score and are dropped, matching the exploded-gram
    * semantics both engines share) by its mean add-one-smoothed bigram
    * probability: `(lm_hits + n) / (n * (total + buckets))` where
    * `lm_hits` is the summed training count of the doc's bigrams. Higher
    * = closer to the reference distribution (the CCNet head/middle/tail
    * split thresholds this score downstream).
    *
    * Returns (idCol, n_bigrams, lm_hits, lm_score).
    */
  def bigramLmScore(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      trainPred: Column,
      buckets: Int = LmBuckets): DataFrame = {
    val bi = docs
      .select(
        col(idCol),
        trainPred.cast("boolean").as("is_train"),
        explode(TextAnalysis.tokenNgrams(TextAnalysis.wsTokens(col(textCol)), 2))
          .as("g"))
      .select(
        col(idCol),
        col("is_train"),
        hashBucket(col("g"), buckets).as("bucket"))
    val train = bi.filter(col("is_train"))
    scoreAgainstLm(
      bi.select(col(idCol), col("bucket")), idCol,
      train.groupBy("bucket").agg(count(lit(1)).as("cnt")),
      train.agg(count(lit(1)).as("total")),
      buckets)
  }

  /** (idCol, bucket) hashed-bigram occurrence stream of `docs` — the
    * shared front half of batch scoring and the streaming fold.
    */
  def bigramBucketStream(
      docs: DataFrame, textCol: String, idCol: String,
      buckets: Int = LmBuckets): DataFrame =
    docs
      .select(
        col(idCol),
        explode(TextAnalysis.tokenNgrams(TextAnalysis.wsTokens(col(textCol)), 2))
          .as("g"))
      .select(col(idCol), hashBucket(col("g"), buckets).as("bucket"))

  /** Score a bucket-occurrence stream against a TRAINED model: `lm` is
    * (bucket, cnt), `tot` the 1-row (total). The back half of
    * [[bigramLmScore]], shared with the folded-model path so the two
    * are the same arithmetic by construction.
    */
  def scoreAgainstLm(
      docBuckets: DataFrame, idCol: String,
      lm: DataFrame, tot: DataFrame, buckets: Int): DataFrame =
    docBuckets
      .join(broadcast(lm), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("cnt"), lit(0L))).as("lm_hits"))
      // 1-row scalar joined in, not collect()ed: keeps the plan lazy and
      // the pattern identical on a real cluster.
      .crossJoin(broadcast(tot))
      .withColumn(
        "lm_score",
        (col("lm_hits") + col("n_bigrams")).cast("double")
          / (col("n_bigrams").cast("double")
            * (col("total") + lit(buckets.toLong)).cast("double")))
      .drop("total")

  /** STREAMING face of the reference-LM trainer — drive from
    * `writeStream.foreachBatch`: fold one micro-batch of TRAINING
    * documents into a partition-per-batch bucket-count table. Counts
    * are additive (not idempotent under replay like the set-based
    * folds), so exactly-once comes from the layout instead: each batch
    * writes ONLY its own `batch_id=` partition with dynamic partition
    * overwrite — an at-least-once redelivery REPLACES its partition
    * with identical rows, and the served model ([[lmFromFolds]], the
    * bucket-summed view) is exact under replay. Per-batch state is the
    * batch's own bucket footprint; the table stays
    * O(buckets x batches) and compacts to O(buckets) whenever
    * convenient (sum-regroup preserves the model).
    */
  def foldLmBatch(
      batchDocs: DataFrame,
      batchId: Long,
      lmTable: String,
      textCol: String,
      idCol: String,
      buckets: Int = LmBuckets): Unit = {
    writeBatchPartition(
      bigramBucketStream(batchDocs, textCol, idCol, buckets)
        .groupBy("bucket").agg(count(lit(1)).as("cnt")),
      batchId, lmTable)
  }

  /** Shared exactly-once fold writer: land `counts` (any per-bucket
    * count columns) as the `batch_id` partition of `table`.
    *
    * insertInto, NOT saveAsTable: overwrite-mode saveAsTable replaces
    * the whole table; insertInto under DYNAMIC partitionOverwriteMode
    * replaces exactly the partitions present in this batch — the
    * replay-exactness contract. The mode must be the SESSION conf:
    * catalog insertInto does not read the per-writer option (measured —
    * the option form silently fell back to static overwrite and
    * truncated every prior batch). Saved/restored around the write.
    * (Position-based insert: counts' column order must match the
    * table's data-then-partition layout, which the first-write path
    * here establishes.)
    */
  private[operators] def writeBatchPartition(
      counts: DataFrame, batchId: Long, table: String): Unit = {
    val spark = counts.sparkSession
    val withBatch = counts.withColumn("batch_id", lit(batchId))
    if (!spark.catalog.tableExists(table))
      withBatch.write.partitionBy("batch_id").format("parquet").saveAsTable(table)
    else {
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.get(key, "STATIC")
      spark.conf.set(key, "dynamic")
      try withBatch.write.mode("overwrite").insertInto(table)
      finally spark.conf.set(key, prev)
    }
  }

  /** STREAMING face of the DSIR stats estimator — the [[foldLmBatch]]
    * idiom applied to the (target_cnt, raw_cnt) bucket table: each
    * corpus micro-batch lands its own bucket stats as a batch_id
    * partition; the served stats ([[dsirFromFolds]]) are the
    * bucket-summed view, exact under at-least-once redelivery.
    */
  def foldDsirBatch(
      batchDocs: DataFrame,
      batchId: Long,
      statsTable: String,
      textCol: String,
      idCol: String,
      targetPred: Column,
      buckets: Int = DsirBuckets): Unit = {
    val counts = batchDocs
      .select(
        targetPred.cast("boolean").as("is_target"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .select(col("is_target"), hashBucket(col("w"), buckets).as("bucket"))
      .groupBy("bucket")
      .agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("target_cnt"),
        sum(when(col("is_target"), 0L).otherwise(1L)).as("raw_cnt"))
    writeBatchPartition(counts, batchId, statsTable)
  }

  /** Served DSIR stats from the fold table: (bucket, target_cnt,
    * raw_cnt) — exactly what [[dsirWeights]] estimates in one shot when
    * the folds partition the same corpus. NOTE: scoring drops
    * occurrences of buckets absent from the stats (inner join — same
    * as the batch path, where the stats cover the scored corpus by
    * construction); fold the full scored corpus before serving.
    */
  def dsirFromFolds(
      spark: org.apache.spark.sql.SparkSession,
      statsTable: String): DataFrame =
    spark.table(statsTable)
      .groupBy("bucket")
      .agg(sum("target_cnt").as("target_cnt"), sum("raw_cnt").as("raw_cnt"))

  /** Compact a fold table (LM or DSIR) to a single `batch_id = -1`
    * partition holding the bucket-summed counts — bounds the table at
    * O(buckets) after any number of batches. ONLY safe when the stream
    * is quiesced past every folded batch: a batch REPLAYED after
    * compaction would re-insert its partition beside the compacted
    * row and double-count. (The served view is sum-regroup invariant,
    * so compaction never changes what [[lmFromFolds]]/[[dsirFromFolds]]
    * serve.)
    */
  def compactFolds(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    val folds = spark.table(table)
    val dataCols = folds.columns.filter(c => c != "bucket" && c != "batch_id")
    val compacted = folds.groupBy("bucket")
      .agg(dataCols.map(c => sum(c).as(c)).toSeq.head,
        dataCols.map(c => sum(c).as(c)).toSeq.tail: _*)
      .localCheckpoint() // pin before overwriting the source table
    try {
      compacted.withColumn("batch_id", lit(-1L))
        .write.mode("overwrite").partitionBy("batch_id")
        .format("parquet").saveAsTable(table)
    } finally compacted.unpersist()
  }

  /** The served model from the fold table: ((bucket, cnt), (total)) —
    * exactly the pair [[bigramLmScore]] trains in one shot when the
    * fold batches partition the same training slice.
    */
  def lmFromFolds(
      spark: org.apache.spark.sql.SparkSession,
      lmTable: String): (DataFrame, DataFrame) = {
    val folds = spark.table(lmTable)
    (folds.groupBy("bucket").agg(sum("cnt").as("cnt")),
      folds.agg(coalesce(sum("cnt"), lit(0L)).as("total")))
  }

  /** FineWeb-style filter-ensemble verdict: every rule filter the engine
    * already exposes (length band, mean-word-length band, punctuation
    * density, stopword density, bigram repetition, declared-vs-predicted
    * language) evaluated per document, fused into one keep/drop with the
    * failed checks named in a deterministic comma-joined `reasons` string
    * (alphabetical label order; empty when kept). One narrow codegen'd
    * projection — no shuffle at any corpus size; the per-check audit is
    * what lets a pipeline report WHY mass was dropped, per source.
    *
    * Returns (idCol, keep, reasons).
    */
  def filterFusion(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      langCol: String): DataFrame = {
    val text = col(textCol)
    val chars = length(text).cast("double")
    val toksD = TextAnalysis.tokenCount(text).cast("double")
    val meanWord = chars / greatest(toksD, lit(1.0))
    val punctRatio =
      TextAnalysis.punctCount(text).cast("double") / greatest(toksD, lit(1.0))
    val stopRatio =
      TextAnalysis.stopwordCount(text).cast("double") / greatest(toksD, lit(1.0))
    // Same bands as qualityScore (q51) / repetition (q49) / langid (q52)
    // — the fusion reuses the exact published thresholds so its verdict
    // is the conjunction of the standalone queries.
    val checks: Seq[(String, Column)] = Seq(
      "lang" -> (TextAnalysis.langIdHeuristic(text) === col(langCol)),
      "length" -> (chars >= 50.0 && chars <= 100000.0),
      "punct" -> (punctRatio <= 0.3),
      "repetition" -> (TextAnalysis.bigramRepetitionRatio(text) <= 0.2),
      "stopword" -> (stopRatio >= 0.05),
      "word_len" -> (meanWord >= 3.0 && meanWord <= 10.0))
    val keep = checks.map(_._2).reduce(_ && _)
    // concat_ws skips NULLs (both engines), so passed checks vanish and
    // the string is stable under any subset of failures.
    val reasons = concat_ws(
      ",",
      checks.map { case (label, ok) =>
        when(ok, lit(null: String)).otherwise(lit(label))
      }: _*)
    docs.select(
      col(idCol),
      keep.as("keep"),
      reasons.as("reasons"))
  }

  /** Per-source rank agreement between the two scoring models: Spearman
    * correlation of the [[dsirWeights]] and [[bigramLmScore]] rankings —
    * the model-validation query a curation pipeline reads before trusting
    * either score alone (high agreement = the cheap score can gate for
    * the expensive one; low agreement = the models see different things
    * and a fused verdict needs both). Returns (source, n_docs, sum_d2,
    * spearman) with spearman = 1 - 6*sum(d^2)/(n(n^2-1)), NULL for
    * single-doc sources.
    *
    * Determinism: both scores are already bit-exact across engines
    * (integer masses, one final division), so ranking on (score DESC,
    * id) is engine-exact; sum_d2 is BIGINT; the correlation is one
    * multiply + one divide + one subtract on exactly-representable
    * operands. Scale shape: both scoring passes are their own operators'
    * plans; the rank windows PARTITION BY source (never a corpus-wide
    * single-task window) and share one exchange; the rollup is
    * source-sized.
    */
  def modelRankAgreement(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      sourceCol: String,
      targetPred: Column,
      trainPred: Column,
      dsirBuckets: Int = DsirBuckets,
      lmBuckets: Int = LmBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = dsirWeights(docs, textCol, idCol, targetPred, dsirBuckets)
      .select(col(idCol), col("dsir_weight"))
    val l = bigramLmScore(docs, textCol, idCol, trainPred, lmBuckets)
      .select(col(idCol), col("lm_score"))
    val j = d.join(l, Seq(idCol))
      .join(docs.select(col(idCol), col(sourceCol).as("source")), Seq(idCol))
    val bySrc = Window.partitionBy("source")
    j.select(
        col("source"),
        row_number().over(
          bySrc.orderBy(col("dsir_weight").desc, col(idCol))).as("__r1"),
        row_number().over(
          bySrc.orderBy(col("lm_score").desc, col(idCol))).as("__r2"))
      .select(col("source"),
        ((col("__r1") - col("__r2")) * (col("__r1") - col("__r2")))
          .cast("long").as("__d2"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("__d2").as("sum_d2"))
      .select(
        col("source"), col("n_docs"), col("sum_d2"),
        when(col("n_docs") >= 2,
          lit(1.0) - (lit(6.0) * col("sum_d2").cast("double")) /
            (col("n_docs") * (col("n_docs") * col("n_docs") - 1))
              .cast("double"))
          .as("spearman"))
  }
}
