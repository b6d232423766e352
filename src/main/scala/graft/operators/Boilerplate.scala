package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal: drop text spans that repeat across
  * many documents (headers, footers, navigation chrome, license blurbs) —
  * the C4/RefinedWeb-style cleanup between exact dedup (whole-doc) and
  * near-dedup (whole-doc similarity), operating INSIDE documents.
  *
  * Shape: each document is cut into consecutive non-overlapping
  * `window`-token passages; a passage's document frequency (how many
  * distinct docs contain it verbatim) is computed corpus-wide; passages
  * over the frequency cap are dropped and the survivors are reassembled
  * in order. At 100 TB the passage-frequency table shuffles on the
  * passage value with full map-side combine (a distinct-count aggregate),
  * the screen is an equi-join back on the same key — never all-pairs —
  * and reassembly groups on doc_id, whose group size is bounded by a
  * single document's passage count.
  */
object Boilerplate {

  /** Cut `textCol` into non-overlapping `window`-token passages:
    * (doc_id, pidx, passage), pidx 0-based in document order. A trailing
    * remainder shorter than `window` is dropped (it cannot be compared
    * like-for-like across docs); a document shorter than one window
    * yields no rows.
    */
  def passages(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val toks = TextAnalysis.wsTokens(col(textCol))
    val nWin = (size(toks) / window).cast("int")
    // sequence(0, -1) would count DOWN; guard the no-full-window case
    val idxs = when(nWin > 0, sequence(lit(0), nWin - 1))
      .otherwise(array().cast("array<int>"))
    val cuts = transform(idxs, i =>
      array_join(slice(toks, i * window + 1, lit(window)), " "))
    docs.select(
      col(idCol).as("doc_id"),
      posexplode(cuts).as(Seq("pidx", "passage")))
  }

  /** Remove passages whose corpus-wide document frequency exceeds
    * `maxDf`, returning per-doc (n_kept, n_dropped, cleaned_text) with
    * survivors rejoined in passage order. Docs with no full window are
    * absent from the output (they contributed no passages to screen).
    */
  def removeBoilerplate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1: $maxDf")
    val p = passages(docs, idCol, textCol, window)
    val df = p.groupBy("passage")
      .agg(countDistinct("doc_id").as("passage_df"))
    val kept: Column = col("passage_df") <= maxDf
    p.join(df, "passage")
      .groupBy("doc_id")
      .agg(
        count(when(kept, 1)).as("n_kept"),
        count(when(!kept, 1)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(kept,
              struct(col("pidx"), col("passage"))))),
            s => s.getField("passage")),
          " ").as("cleaned_text"))
  }
}
