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
