package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-perceptron text classifier over hashed token counts — the
  * TRAINED-classifier stage of model-based curation (the fastText-style
  * quality/language gate), as a pure-integer iterative aggregation.
  *
  * Reference scope note: the reference (main.js) has no model stage at
  * all; this extends the curation family (q180-q185) with the third
  * classic scorer — a discriminative linear model — beside the
  * importance-weighting (DSIR) and generative-LM scorers in
  * [[ImportanceModels]].
  *
  * Why a perceptron and not logistic regression: the differential-oracle
  * contract (see [[graft.queries.Q]]) requires bit-equality across
  * engines, which rules out transcendental link functions (`exp`/`ln`
  * last-ulp rounding is engine-specific). The classic batch perceptron
  * needs NOTHING but integer arithmetic: features are token counts
  * hashed into `buckets` integer bins (+ an implicit bias feature of 1),
  * labels are y in {+1, -1}, and each round updates
  *
  *   w  +=  sum over misclassified docs of  y * x        (all integers)
  *
  * where "misclassified" is `y * (w . x + bias) <= 0` — an integer dot
  * product, boundary counted wrong. Margins, updates, and final scores
  * are all BIGINT, so the unrolled-round oracle checks the trained
  * model exactly.
  *
  * Scale shape (100 TB): the model is `buckets + 1` longs — driver-held
  * and re-broadcast as a literal array in the margin expression (the
  * same bounded-plan-scalar pattern as [[BloomScreen]]; the collect per
  * round is the MODEL, never data). Per round the checkpointed
  * (doc, bucket, cnt) feature table shuffles twice: onto doc_id for
  * margins (map-side combined) and onto bucket for the update
  * (`buckets` keys). Rounds are a small constant. Margin magnitudes are
  * bounded by rounds x total token mass — far inside BIGINT at any
  * realistic corpus (overflow needs a ~1e18 weight-count product).
  */
object Perceptron {

  /** Default hashed-feature space: small on purpose (collisions act as
    * regularization, exactly as in the DSIR recipe) and cheap to carry
    * as a literal array in the margin expression.
    */
  val Buckets = 64

  /** Training rounds: enough for margins to separate on real data,
    * small enough that the unrolled oracle SQL stays readable.
    */
  val Rounds = 3

  /** Trained weights (per-bucket longs + bias) and the per-round error
    * trace measured under the weights ENTERING each round (round 1 is
    * always all-misclassified: w = 0 puts every doc ON the boundary).
    */
  final case class Model(
      w: Array[Long],
      bias: Long,
      trace: Seq[(Int, Long, Long)])

  /** (idCol, bucket, cnt, y) long-form feature/label table. */
  def features(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      targetPred: Column,
      buckets: Int = Buckets): DataFrame =
    docs
      .select(
        col(idCol),
        targetPred.cast("boolean").as("is_target"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .select(
        col(idCol),
        col("is_target"),
        (TextAnalysis.portableHash32(col("w")) % buckets).as("bucket"))
      .groupBy(col(idCol), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col(idCol),
        col("bucket"),
        col("cnt"),
        when(col("is_target"), lit(1L)).otherwise(lit(-1L)).as("y"))

  /** `w . x + bias` over the long-form features grouped by doc: the
    * weight vector rides along as a literal array indexed by bucket.
    */
  private def marginCol(w: Array[Long], bias: Long): Column =
    sum(col("cnt") * element_at(
      array(w.map(lit(_)): _*), (col("bucket") + 1).cast("int"))) + bias

  /** Per-doc (idCol, y, margin) under fixed weights. */
  private def margins(feat: DataFrame, idCol: String,
      w: Array[Long], bias: Long): DataFrame =
    feat
      .groupBy(col(idCol), col("y"))
      .agg(marginCol(w, bias).as("margin"))

  /** Train `rounds` batch-perceptron rounds from `initW`/`initBias`.
    * Each round: margins under current weights, misclassified set,
    * one update aggregation (bias folded in as bucket = -1), and a
    * `buckets + 1`-row collect of the new deltas plus the error count.
    */
  def train(
      feat: DataFrame,
      idCol: String,
      buckets: Int = Buckets,
      rounds: Int = Rounds,
      initW: Array[Long] = null,
      initBias: Long = 0L): Model = {
    var w = if (initW == null) Array.fill(buckets)(0L) else initW.clone()
    var bias = initBias
    val trace = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    val nDocs = feat.select(col(idCol)).distinct().count()
    for (r <- 1 to rounds) {
      // The misclassified set feeds the update plan THREE times (the
      // feature join + both synthetic-bucket branches); left lazy, only
      // the shuffle exchange under the margin aggregation is reused and
      // the post-shuffle agg + filter recompute per reference.
      // Materialize it once per round — it is at most doc-count-sized
      // (id, y), the same node-sized budget as `feat`'s checkpoint.
      val mis = margins(feat, idCol, w, bias)
        .filter(col("y") * col("margin") <= 0)
        .select(col(idCol), col("y").as("mis_y"))
        .localCheckpoint(true)
      try {
        // Bias update (constant-1 feature) rides as bucket -1; the error
        // count rides as bucket -2 — one job collects model + trace row.
        val updates = feat
          .join(mis.select(col(idCol)), idCol)
          .select(col("bucket"), (col("y") * col("cnt")).as("d"))
          .unionByName(mis.select(lit(-1L).as("bucket"), col("mis_y").as("d")))
          .unionByName(mis.select(lit(-2L).as("bucket"), lit(1L).as("d")))
          .groupBy("bucket")
          .agg(sum("d").as("dw"))
          .collect()
        var nMis = 0L
        for (row <- updates) {
          val b = row.getLong(0)
          val d = row.getLong(1)
          if (b == -2L) nMis = d
          else if (b == -1L) bias += d
          else w(b.toInt) = w(b.toInt) + d
        }
        trace += ((r, nMis, nDocs))
      } finally Checkpoints.release(mis)
    }
    Model(w, bias, trace.toSeq)
  }

  /** Train on the full corpus and score every document with the final
    * model: (idCol, y, margin, pred); pred = sign(margin), 0 negative
    * (the perceptron's own boundary-is-wrong rule).
    */
  def trainScore(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      targetPred: Column,
      buckets: Int = Buckets,
      rounds: Int = Rounds): DataFrame = {
    val feat = features(docs, textCol, idCol, targetPred, buckets)
      .localCheckpoint(true)
    try {
      val m = train(feat, idCol, buckets, rounds)
      margins(feat, idCol, m.w, m.bias)
        .select(
          col(idCol),
          col("y"),
          col("margin"),
          when(col("margin") > 0, lit(1L)).otherwise(lit(-1L)).as("pred"))
        .localCheckpoint(true)
    } finally Checkpoints.release(feat)
  }

  /** Per-round training-error trace as a DataFrame: (round, n_mis,
    * n_docs) for rounds 1..`rounds` — the convergence audit read before
    * trusting the classifier.
    */
  def errorTrace(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      targetPred: Column,
      buckets: Int = Buckets,
      rounds: Int = Rounds): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feat = features(docs, textCol, idCol, targetPred, buckets)
      .localCheckpoint(true)
    try {
      train(feat, idCol, buckets, rounds).trace
        .toDF("round", "n_mis", "n_docs")
    } finally Checkpoints.release(feat)
  }
}
