package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding quantization: float vectors to int8 codes with a per-vector
  * scale — the storage/serving compression every large embedding corpus
  * applies before ANN serving (4x smaller than float32, SIMD-friendly
  * dot products at serve time).
  *
  * DETERMINISM (the q117 floor-shift device, applied end-to-end): each
  * float widens to double exactly, the 2^30 multiply is an exponent
  * shift (exact), and floor() of that product is the same BIGINT in
  * every engine — so the whole quantization pipeline after that first
  * floor is INTEGER arithmetic: scale = max |iv|, code = (|iv| * 127)
  * div scale with the sign split out (so the truncating division only
  * ever sees non-negative operands — engines disagree on negative
  * integer division, not on this), and the reconstruction error is an
  * exact BIGINT residue. No doubles survive into the output.
  *
  * Scale shape: a pure narrow map — zero shuffle, zero joins; the
  * operator runs at whatever rate the scan runs. The per-element work
  * uses array higher-order functions, which Spark evaluates interpreted
  * (CodegenFallback): acceptable here because the array IS the output
  * (the PLANS.md HOF rule); if profiling ever shows this pass CPU-bound
  * at corpus scale, the swap is a codegen'd Expression in the
  * [[graft.functions.DotProductFF]] mold, not a shuffle.
  */
object Quantize {

  /** 2^30: the largest power of two that keeps |v| <= 8 embeddings inside
    * BIGINT after the *127 step with headroom (|iv| <= 2^33, *127 < 2^40).
    */
  val Shift = 1073741824L

  private def codeCase(x: String): String =
    s"CASE WHEN scale = 0 THEN CAST(0 AS BIGINT) " +
      s"WHEN $x >= 0 THEN ($x * 127) div scale " +
      s"ELSE -((-$x * 127) div scale) END"

  /** Brute-force cosine top-k over the INT8 CODES — the serving-side
    * search an int8-compressed index runs, and (with
    * [[Similarity.topKRecall]]) the end-to-end measure of what the 4x
    * compression costs in retrieval quality.
    *
    * The key algebraic fact: the per-vector scale cancels in cosine —
    * v_hat = q * (scale / (127 * 2^30)) elementwise, so
    * cos(v_hat_a, v_hat_b) = cos(q_a, q_b) — which means the whole
    * similarity computes on the integer codes — and the codes ride the
    * CODEGEN'D [[graft.functions.DotProductFF]] kernel, not an
    * interpreted HOF fold, because int8 codes are exact in float
    * (|q| <= 127, products <= 127^2 < 2^24) and DotProductFF
    * accumulates in double, where sums of those exact products stay
    * exact integers to 2^53 — so the hot-path dot is bit-identical to
    * a BIGINT fold at any realistic dimension. The norms are single
    * IEEE sqrts of exact integers, the one division deterministic in
    * every engine. Zero-norm codes (all-zero vectors) are excluded —
    * cosine is undefined for them.
    *
    * Same shape as [[Similarity.cosineTopK]]: queries broadcast, corpus
    * streams, WindowGroupLimit top-k per query.
    */
  def cosineTopKInt8(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    graft.functions.DotProductFF.register(corpus.sparkSession)
    import graft.operators.Similarity.dotD
    def codes(df: DataFrame, outId: String, vec: String, nrm: String) = {
      val f = int8(df, idCol, embCol)
        .filter(col("scale") > 0)
        .select(col(idCol).as(outId), col("qvec").cast("array<float>").as(vec))
      f.select(col(outId), col(vec), sqrt(dotD(col(vec), col(vec))).as(nrm))
    }
    val c = codes(corpus, "neighbor_id", "c_q", "c_norm")
    val q = codes(queries, "q_id", "q_q", "q_norm")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        (dotD(col("c_q"), col("q_q")) / (col("c_norm") * col("q_norm"))).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Two-stage retrieval: int8 COARSE scoring -> exact fp32 RERANK — the
    * production serving shape for compressed indexes (score the whole
    * corpus on 4x-smaller codes, then re-score only a per-query
    * shortlist at full precision). Stage 1 is [[cosineTopKInt8]] at
    * k = `shortlist`; stage 2 fetches the float vectors for the
    * shortlisted (query, candidate) pairs and takes the exact-cosine
    * top-k.
    *
    * Scale shape: the corpus-sized work is ALL in the coarse stage
    * (which is why it runs on codes); the rerank touches
    * queries x shortlist rows — corpus-size-independent — and both
    * rerank joins put the shortlist/query side on the broadcast build
    * side, so the corpus float table streams in place, never shuffles.
    * Quality: rerank CORRECTS the compression error inside the
    * shortlist (final ordering is exact cosine), so recall@k of the
    * two-stage result is >= the pure-int8 recall at the same k and
    * approaches brute-force as `shortlist` grows — the
    * shortlist-width-vs-recall curve is THE serving knob (q158 tracks
    * the operating point; OperatorsSpec pins the >= property).
    */
  def twoStageTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      shortlist: Int = 20): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"need shortlist >= k >= 1, got k=$k shortlist=$shortlist")
    val coarse = cosineTopKInt8(corpus, queries, idCol, embCol, k = shortlist)
      .select(col("q_id"), col("neighbor_id"))
    Similarity.rerankExactTopK(corpus, queries, idCol, embCol, coarse, k)
  }

  /** Per-vector symmetric int8 quantization of `embCol`
    * (`ArrayType(FloatType)`): output (idCol, scale, qvec, max_abs_err)
    * where `scale` = max |floor(v * 2^30)| (BIGINT; 0 for empty or
    * all-zero vectors), `qvec` the codes in [-127, 127] (BIGINT elements
    * — the value range is int8, the storage cast is the writer's
    * choice), and `max_abs_err` = max |iv*127 - q*scale| — the exact
    * integer reconstruction residue, < scale by the division identity,
    * i.e. a per-element float error below scale / (127 * 2^30).
    */
  def int8(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(
        col(idCol),
        expr(s"transform($embCol, v -> CAST(floor(CAST(v AS DOUBLE) * $Shift.0D) AS BIGINT))")
          .as("__iv"))
      .withColumn("scale",
        coalesce(array_max(expr("transform(__iv, x -> abs(x))")), lit(0L)))
      .withColumn("qvec", expr(s"transform(__iv, x -> ${codeCase("x")})"))
      .withColumn("max_abs_err",
        coalesce(
          array_max(expr(
            s"transform(__iv, x -> abs(x * 127 - (${codeCase("x")}) * scale))")),
          lit(0L)))
      .drop("__iv")
}
