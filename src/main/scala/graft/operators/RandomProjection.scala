package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Rademacher random projection (Johnson-Lindenstrauss
  * sketch): project each embedding onto `outDim` pseudo-random ±1
  * directions — the dimensionality-reduction primitive upstream of
  * LSH/clustering when the native dimension is too wide to shuffle
  * (a 64-float embedding is 256 bytes per row; its 8-long projection is
  * 64, and JL bounds the pairwise-distance distortion).
  *
  * DETERMINISM, twice over: the sign matrix derives from the portable
  * md5 hash (sign(j,k) = +1 iff hash32("rp:j:k") is even), so the
  * "random" directions are identical in every engine, every run, every
  * partition layout; and the arithmetic is the q117 floor-shift device —
  * floor(v * 2^30) is an exact BIGINT on both engines, and the
  * projection is a ±sum of those integers (|sum| <= dim * |v|max * 2^30,
  * far inside Long), so the sketch is oracle-checkable bit for bit.
  * The float view is one exact-operand division away downstream.
  *
  * Plan shape: the sign matrix BAKES INTO the expression (the signs are
  * construction-time constants, so each output dim unrolls to a ±chain
  * of element_at terms inside whole-stage codegen) — no HOF lambda on
  * the hot path, no join, no shuffle; a 100 TB projection is a pure map
  * pass at scan bandwidth.
  */
object RandomProjection {

  /** The exact-int scaling shift shared with [[Quantize]] (q117). */
  val Shift: Long = Quantize.Shift

  /** The deterministic ±1 matrix: signs(k)(j) weights input dim j in
    * output dim k. Public so specs and oracle rendering walk the same
    * bits.
    */
  def signs(inDim: Int, outDim: Int): Array[Array[Int]] =
    Array.tabulate(outDim, inDim)((k, j) =>
      if (graft.functions.PortableHash32.hash32(
        s"rp:$j:$k".getBytes("UTF-8")) % 2 == 0) 1 else -1)

  /** Project: (idCol, p0..p{outDim-1}) BIGINT sketch columns. Inputs
    * must be exactly `inDim` wide — a mismatched row raises rather than
    * silently projecting nulls.
    */
  def project(
      df: DataFrame,
      idCol: String,
      embCol: String,
      inDim: Int,
      outDim: Int): DataFrame = {
    require(inDim >= 1 && outDim >= 1, s"bad shape: $inDim -> $outDim")
    val s = signs(inDim, outDim)
    val iv = when(size(col(embCol)) === inDim,
      expr(s"transform($embCol, v -> CAST(floor(CAST(v AS DOUBLE) * $Shift.0D) AS BIGINT))"))
      .otherwise(raise_error(concat(
        lit(s"RandomProjection.project: embedding width "),
        size(col(embCol)).cast("string"),
        lit(s" != inDim $inDim"))))
    val base = df.select(col(idCol), iv.as("__iv"))
    val projCols = (0 until outDim).map { k =>
      (0 until inDim).map { j =>
        val term = element_at(col("__iv"), j + 1)
        if (s(k)(j) > 0) term else -term
      }.reduce(_ + _).as(s"p$k")
    }
    base.select(col(idCol) +: projCols: _*)
  }

  /** Down-shift applied to projections before coarse dot products:
    * |p| <= dim * |v|max * 2^30 (~2^39 on these fixtures), so a raw
    * p*p product would overflow Long; floor-dividing by 2^15 first
    * bounds each component near 2^24 and the 8-term dot near 2^51 —
    * exact. Floor (not truncating) division so Spark matches DuckDB's
    * `//` on negatives.
    */
  val CoarseShift: Long = 32768L

  /** Projections down-shifted for coarse scoring: (idCol, ps0..psN). */
  def projectedCoarse(
      df: DataFrame,
      idCol: String,
      embCol: String,
      inDim: Int,
      outDim: Int): DataFrame =
    project(df, idCol, embCol, inDim, outDim).select(
      col(idCol) +: (0 until outDim).map(k =>
        expr(Resample.floorDivSql(s"p$k", CoarseShift)).as(s"ps$k")): _*)

  /** Two-stage retrieval with the JL projection as the coarse
    * representation — the 8x-smaller sibling of the int8 two-stage
    * ([[Quantize.twoStageTopK]]): the whole corpus is scored on the
    * 8-long integer projections (normalized projected cosine — exact
    * integer dot, one sqrt and one divide, both correctly-rounded
    * IEEE), a per-query shortlist survives, and only those pairs
    * re-score at exact fp32 cosine via the SHARED rerank stage
    * ([[Similarity.rerankExactTopK]]), so the final ordering is exact
    * and recall approaches brute force as the shortlist widens. Rows
    * whose shifted projection is all-zero score a constant -2 (below
    * any cosine) so they rank last deterministically — a zero norm
    * would make the cosine NaN and NaN ordering is not cross-engine
    * contractual. GUARDED AS AN EXPRESSION, not a filter: a filter on
    * a computed column pushes below the projection by SUBSTITUTING the
    * whole expression tree — measured here re-evaluating the
    * integer-widening transform ~1000x per row (2 norm references x 8
    * squares x 64 element_at terms), 17 s where the guarded form runs
    * in 2 — the q102 lesson's filter-pushdown face.
    */
  def twoStageTopKProjected(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      shortlist: Int,
      inDim: Int,
      outDim: Int): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"need shortlist >= k >= 1, got k=$k shortlist=$shortlist")
    def side(df: DataFrame, outId: String, pfx: String) = {
      val ps = projectedCoarse(df, idCol, embCol, inDim, outDim)
      val n2 = (0 until outDim).map(i =>
        col(s"ps$i") * col(s"ps$i")).reduce(_ + _)
      ps.select(
        col(idCol).as(outId) +:
          (0 until outDim).map(i => col(s"ps$i").as(s"$pfx$i")) :+
          n2.as(s"${pfx}n2"): _*)
        .withColumn(s"${pfx}nrm", sqrt(col(s"${pfx}n2").cast("double")))
    }
    val c = side(corpus, "neighbor_id", "__c")
    val q = side(queries, "q_id", "__q")
    val dot = (0 until outDim).map(i =>
      col(s"__c$i") * col(s"__q$i")).reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("__cd").desc, col("neighbor_id"))
    val coarse = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("q_id"))
      .withColumn("__cd",
        when(col("__cnrm") * col("__qnrm") > 0,
          dot.cast("double") / (col("__cnrm") * col("__qnrm")))
          .otherwise(lit(-2.0)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= shortlist)
      .select(col("q_id"), col("neighbor_id"))
    Similarity.rerankExactTopK(corpus, queries, idCol, embCol, coarse, k)
  }

  /** The identical projection rendered as DuckDB SQL terms: for output
    * dim k, a ±chain over `iv[j+1]` (1-based list indexing), generated
    * from the SAME sign walk so operator and oracle cannot drift.
    */
  def duckProjTerms(ivCol: String, inDim: Int, outDim: Int): Seq[String] = {
    val s = signs(inDim, outDim)
    (0 until outDim).map { k =>
      val chain = (0 until inDim).map { j =>
        val sign = if (s(k)(j) > 0) "+" else "-"
        s"$sign $ivCol[${j + 1}]"
      }.mkString(" ")
      s"(0 $chain) AS p$k"
    }
  }
}
