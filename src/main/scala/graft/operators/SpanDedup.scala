package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN removal: cut the text that repeats verbatim
  * ACROSS documents out of each document, keeping the rest — the
  * substring-level dedup of Lee et al., "Deduplicating Training Data
  * Makes Language Models Better" (ACL 2022), re-expressed Spark-first.
  * (Their single-node tool builds a corpus suffix array; a 100 TB corpus
  * has no single machine to build it on, so the distributed form below
  * works on rolling fixed-width windows instead — every duplicated
  * substring of >= `window` tokens is a union of duplicated windows, so
  * the merged spans cover exactly the >=window-token duplicated text.)
  *
  * Relation to the neighbours in this repo:
  *  - [[Dedup]] drops WHOLE documents (exact or near); this keeps the
  *    document and cuts the shared text out of it.
  *  - [[Boilerplate]] drops fixed non-overlapping passages whose doc
  *    frequency exceeds a HIGH cap (chrome in hundreds of docs); this
  *    marks ANY window seen in >= 2 distinct docs, at stride 1, and
  *    merges overlapping hits into maximal spans — it catches one long
  *    quote shared by two documents, which the df-cap screen keeps.
  *
  * Distributed shape, one stage per line:
  *  1. stride-1 windows (narrow explode; ~n_tokens rows per doc);
  *  2. duplicate flag per fingerprint: min(doc_id) != max(doc_id)
  *     aggregated on the window's md5 — two longs of partial state, so
  *     hot fingerprints collapse map-side (a window in 1M docs sends one
  *     partial row per map task, never 1M rows to one reducer);
  *  3. left-semi join of the window stream against the duplicated
  *     fingerprints — probe-side skew is AQE-splittable because the
  *     build side carries exactly one row per fingerprint;
  *  4. per-document gaps-and-islands merge (shuffle on doc_id, bounded
  *     by one document's window count) into maximal [start, end) spans.
  * The fingerprint is the FULL md5 (128-bit) — at trillions of windows a
  * 32-bit key would collide constantly and over-cut; md5 keeps the
  * shuffle key a fixed 32 chars regardless of window width and is
  * reproduced exactly by the DuckDB oracle.
  */
object SpanDedup {

  /** Stride-1 `window`-token windows: (doc_id, widx, fp) with widx the
    * 0-based token offset and fp = md5 of the space-joined window text.
    * A doc shorter than one window emits no rows.
    *
    * Shape note: positions explode FIRST and the per-window
    * slice/join/md5 runs on the exploded rows — slice, array_join and
    * md5 are all codegen'd there, where the equivalent
    * `transform(idxs, i -> md5(...))` builds the whole fingerprint
    * array per document through an interpreted lambda (HOFs are
    * CodegenFallback) and measured ~8x slower at bench scale. Same
    * rows, same values; only the evaluation site moves.
    */
  def windows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val toks = TextAnalysis.wsTokens(col(textCol))
    val idxs = when(size(col("__sd_toks")) >= window,
      sequence(lit(0), size(col("__sd_toks")) - window))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol).as("doc_id"), toks.as("__sd_toks"))
      .select(col("doc_id"), col("__sd_toks"),
        posexplode(idxs).as(Seq("widx", "__sd_i")))
      .select(col("doc_id"), col("widx"),
        md5(array_join(
          slice(col("__sd_toks"), col("__sd_i") + 1, lit(window)), " ")
          .cast("binary")).as("fp"))
  }

  /** Maximal duplicated spans per document: (doc_id, span_start,
    * span_end, n_windows) with [span_start, span_end) in token offsets.
    * A window is duplicated iff its text occurs in >= 2 DISTINCT docs
    * (within-doc repetition is [[TextAnalysis.bigramRepetitionRatio]]'s
    * job); overlapping or touching duplicated windows merge into one
    * span, so span_end - span_start >= window and every duplicated
    * substring of >= window tokens is covered by exactly one span.
    */
  def dupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int): DataFrame = {
    val w = windows(docs, idCol, textCol, window)
    // >= 2 distinct docs iff min != max: two longs of partial-agg state,
    // the whole point — never a collect_set of doc ids per fingerprint.
    val dup = w.groupBy("fp")
      .agg(min("doc_id").as("d0"), max("doc_id").as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select("fp")
    val hits = w.join(dup, Seq("fp"), "left_semi")
    // Gaps-and-islands on the per-doc hit list: a new island starts when
    // this window begins after every earlier window's end (half-open:
    // widx > running max of widx + window over strictly-preceding rows).
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("widx")
    val prev = byDoc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    hits
      .withColumn("prev_end", max(col("widx") + lit(window)).over(prev))
      .withColumn("new_island",
        when(col("prev_end").isNull || col("widx") > col("prev_end"), 1L)
          .otherwise(0L))
      .withColumn("island", sum("new_island").over(byDoc))
      .groupBy("doc_id", "island")
      .agg(
        min("widx").cast("long").as("span_start"),
        (max("widx") + lit(window)).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** Cut every duplicated span out of every document: (doc_id, n_tokens,
    * n_removed, cleaned_text) for ALL docs (a doc with no duplicated
    * span reports n_removed = 0 and its tokens rejoined verbatim).
    * Spans arrive as a per-doc array via a doc_id equi-join (group size
    * = one document's span count, never corpus-shaped); the keep/drop
    * decision per token is a narrow array `exists` over that span list.
    */
  def removeDupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int): DataFrame = {
    val spans = dupSpans(docs, idCol, textCol, window)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    val toks = TextAnalysis.wsTokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .join(spans, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        // kept token = position covered by no span; positions are
        // 0-based to match the window offsets
        filter(
          transform(col("__toks"),
            (t, i) => struct(i.as("pos"), t.as("tok"))),
          s => !coalesce(
            exists(col("__spans"), sp =>
              s.getField("pos") >= sp.getField("span_start") &&
                s.getField("pos") < sp.getField("span_end")),
            lit(false))).as("__kept"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("n_tokens") - size(col("__kept"))).cast("long").as("n_removed"),
        array_join(transform(col("__kept"), s => s.getField("tok")), " ")
          .as("cleaned_text"))
  }
}
