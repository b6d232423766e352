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
  * passage value with full map-side combine (a distinct-count aggregate);
  * the screen is a BROADCAST anti-join against the over-cap set — the
  * [[Dedup.ngramJaccardPairs]] stop-gram pattern — never an equi-join of
  * the full passage stream on the passage value (whose hottest keys are,
  * by definition, the boilerplate: a header in 30% of docs would land
  * 30% of the corpus on one task). Reassembly groups on doc_id, whose
  * group size is bounded by a single document's passage count.
  */
object Boilerplate {

  /** Number of full non-overlapping `window`-token passages in `textCol`
    * — computable narrowly from the document alone, which is what lets
    * the screen drop boilerplate instances from the stream entirely and
    * still report per-doc drop counts.
    */
  private def passageCount(text: Column, window: Int): Column =
    greatest((size(TextAnalysis.wsTokens(text)) / window).cast("long"), lit(0L))

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
    val nWin = (size(col("__bp_toks")) / window).cast("int")
    // sequence(0, -1) would count DOWN; guard the no-full-window case.
    // Positions explode FIRST and the slice/join runs codegen'd on the
    // exploded rows — a transform(idxs, i -> array_join(slice(...)))
    // builds every passage through an interpreted lambda (HOFs are
    // CodegenFallback; the SpanDedup.windows lesson, ~8x at bench scale).
    val idxs = when(nWin > 0, sequence(lit(0), nWin - 1))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol).as("doc_id"), toks.as("__bp_toks"))
      .select(col("doc_id"), col("__bp_toks"),
        posexplode(idxs).as(Seq("pidx", "__bp_i")))
      .select(col("doc_id"), col("pidx"),
        array_join(
          slice(col("__bp_toks"), col("__bp_i") * window + 1, lit(window)),
          " ").as("passage"))
  }

  /** Remove passages whose corpus-wide document frequency exceeds
    * `maxDf`, returning per-doc (n_kept, n_dropped, cleaned_text) with
    * survivors rejoined in passage order. Docs with no full window are
    * absent from the output (they contributed no passages to screen).
    *
    * Scale shape: the over-cap passage set is TINY by construction —
    * each member needs > maxDf distinct docs, so there are at most
    * total-passage-instances / maxDf of them — and is broadcast for a
    * LeftAnti hash join. Boilerplate instances therefore leave the
    * stream BEFORE the doc_id reassembly shuffle (the hotter the
    * passage, the more rows the anti-join removes), instead of being
    * shuffled TO one task as an equi-join on the passage would do.
    * n_dropped survives the anti-join because the per-doc passage total
    * is recomputed narrowly from the document itself (same
    * floor(tokens/window) the cut uses): dropped = total - kept.
    */
  def removeBoilerplate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1: $maxDf")
    screenAndReassemble(docs, idCol, textCol, window, maxDf, keyOf = None)
  }

  /** Near-miss chrome normalization: lowercase + every digit run folded to
    * a single `0`, then the portable 32-bit content hash. "© 2024 Acme" /
    * "© 2025 Acme" and "Page 3 of 10" / "Page 7 of 12" collapse to one cap
    * key, so chrome that varies only by dates/counters is screened as ONE
    * passage family where the verbatim screen sees df=1 singletons. The
    * hash (not the folded string) is the key so the broadcast set is 8-byte
    * longs; a 32-bit collision can only over-drop (fold a benign passage
    * into a hot family) — acceptable for a boilerplate screen, and
    * deterministic cross-engine (md5-prefix hash, mirrored by the oracle).
    */
  def normalizedKey(passage: Column): Column =
    TextAnalysis.portableHash32(
      regexp_replace(lower(passage), "[0-9]+", "0"))

  /** [[removeBoilerplate]] with the document-frequency cap applied to the
    * [[normalizedKey]] instead of the verbatim passage — catches chrome
    * that differs only in case or embedded numbers. Same broadcast
    * anti-join shape; reassembly still emits the ORIGINAL passages.
    */
  def removeBoilerplateNormalized(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1: $maxDf")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    screenAndReassemble(docs, idCol, textCol, window, maxDf,
      keyOf = Some(normalizedKey))
  }

  /** Shared screen: df-count on the cap key (the verbatim passage, or
    * `keyOf(passage)` when given), broadcast the over-cap key set,
    * LeftAnti the passage stream, reassemble survivors per doc.
    */
  private def screenAndReassemble(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      maxDf: Long,
      keyOf: Option[Column => Column]): DataFrame = {
    val p0 = passages(docs, idCol, textCol, window)
    val (p, keyCol) = keyOf match {
      case None => (p0, "passage")
      case Some(f) => (p0.withColumn("__bp_key", f(col("passage"))), "__bp_key")
    }
    val hot = p.groupBy(keyCol)
      .agg(countDistinct("doc_id").as("passage_df"))
      .filter(col("passage_df") > maxDf)
      .select(keyCol)
    val keptAgg = p.join(broadcast(hot), Seq(keyCol), "left_anti")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("__bp_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pidx"), col("passage")))),
            s => s.getField("passage")),
          " ").as("__bp_text"))
    // One row per doc with >= 1 full window; an all-boilerplate doc is
    // absent from keptAgg but must still report (0 kept, n dropped, "").
    val totals = docs.select(
        col(idCol).as("doc_id"),
        passageCount(col(textCol), window).as("__bp_total"))
      .filter(col("__bp_total") > 0)
    totals.join(keptAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("__bp_kept"), lit(0L)).as("n_kept"),
        (col("__bp_total") - coalesce(col("__bp_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("__bp_text"), lit("")).as("cleaned_text"))
  }
}
