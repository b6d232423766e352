package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-grade per-column table profiling — the statistics surface a
  * planner (and a pipeline operator deciding broadcast thresholds, skew
  * handling, or partition counts) reads before touching a table: per
  * column, row count, null count, and number of distinct values.
  *
  * Shape: ONE scan of the input whatever the column count. Every column
  * contributes its aggregates to a single partial+final aggregation pass,
  * and the per-column result rows are exploded out of the one aggregate
  * row afterwards (a 1-row array explode — the cheap side of a Generate,
  * same device as the funnel rollup). The exact-ndv face plans Spark's
  * multi-distinct Expand: the scan's rows are replicated once per
  * distinct-aggregated column before the shuffle — the exact path's
  * documented cost, linear in column count. At corpus scale the
  * [[tableProfileApprox]] face replaces every `countDistinct` with an
  * HLL `approx_count_distinct` and the Expand disappears: one narrow
  * pass, constant-size partials, rsd-bounded error (ProfileSpec pins
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
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val ndv =
        if (exact) countDistinct(col(c)) else approx_count_distinct(col(c), rsd)
      Seq(count(col(c)).as(s"__nn_$c"), ndv.as(s"__ndv_$c"))
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
