package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) over token streams: split every
  * document at positions where the rolling `window`-token hash satisfies
  * `hash % modulus == 0`, then deduplicate at CHUNK granularity — the
  * storage-dedup technique (Rabin-fingerprint chunking, as in LBFS /
  * restic / borg) adapted to corpus curation.
  *
  * Why beside the existing family: [[SpanDedup]] finds duplicated text
  * exactly but keeps a stride-1 window stream (~n_tokens rows per doc)
  * alive until the fingerprint aggregate; [[Boilerplate]] chunks at
  * FIXED offsets, so one inserted token upstream shifts every later
  * passage and alignment with a near-copy is lost. CDC boundaries depend
  * only on the last `window` tokens of LOCAL content, so two documents
  * sharing a long run re-synchronize at the first shared boundary and
  * their downstream chunks fingerprint identically — insertion-robust
  * dedup at ~n/modulus rows per doc (the expected chunk length is
  * `modulus` tokens), a modulus-factor cheaper shuffle than stride-1
  * spans, at the price of missing duplicates shorter than a chunk.
  *
  * Distributed shape: the boundary scan is a narrow position explode
  * with the window hash codegen'd on the exploded rows (the round-8 HOF
  * rule — never a per-document interpreted lambda); boundary rows are
  * ~n/modulus of the token stream. Chunk assembly is one doc-keyed
  * window (lag over the boundary list, bounded by one document's
  * boundary count); chunk dedup is one map-side-combined aggregate on
  * the 32-char md5 — two longs of partial state per fingerprint, the
  * [[SpanDedup]] discipline, so a chunk shared by 1M docs combines
  * map-side instead of flooding a reducer.
  */
object CdcChunks {

  /** Boundary positions per document: (doc_id, e) where `e` is a 1-based
    * token position (window end, inclusive) with
    * portable_hash32(last `window` tokens joined) % modulus == 0.
    * Documents shorter than `window` tokens emit no internal boundaries
    * (they become one whole-document chunk downstream).
    */
  def boundaries(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      modulus: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(modulus >= 1, s"modulus must be >= 1: $modulus")
    boundaryRows(docs, idCol, textCol, window, modulus)
      .select(col("doc_id"), col("e"))
  }

  /** Exploded boundary rows with the token array still attached —
    * shared by [[boundaries]] and [[chunks]] so the hash rule lives in
    * one place.
    */
  private def boundaryRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      modulus: Int): DataFrame = {
    val toks = TextAnalysis.wsTokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), toks.as("__t"))
      .select(col("doc_id"), col("__t"),
        explode(
          when(size(col("__t")) >= window,
            sequence(lit(window), size(col("__t"))))
            .otherwise(array().cast("array<int>"))).as("e"))
      .filter(
        pmod(
          TextAnalysis.portableHash32(
            array_join(
              slice(col("__t"), col("e") - lit(window) + 1, lit(window)),
              " ")),
          lit(modulus.toLong)) === 0)
  }

  /** The chunk stream: (doc_id, chunk_start, chunk_end, n_chunk_tokens,
    * fp) with [chunk_start, chunk_end) in 0-based token offsets, chunks
    * covering each document's tokens disjointly and completely, and
    * fp = md5 of the space-rejoined chunk text. A document with no
    * internal boundary is one whole-document chunk; empty documents
    * (zero tokens) emit nothing.
    */
  def chunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      modulus: Int): DataFrame = {
    val toks = TextAnalysis.wsTokens(col(textCol))
    val base = docs
      .select(col(idCol).as("doc_id"), toks.as("__t"))
      .filter(size(col("__t")) > 0)
    // The final chunk always ends at n. A boundary AT the last token
    // would duplicate that row, so interior boundaries (e < n) union
    // the per-doc end — set-equal to distinct(all boundaries ∪ {n}),
    // the form the oracle writes, without paying a distinct exchange
    // for a narrow-derivable property.
    val ends = boundaryRows(docs, idCol, textCol, window, modulus)
      .filter(col("e") < size(col("__t")))
      .select(col("doc_id"), col("e"))
      .unionByName(base.select(col("doc_id"), size(col("__t")).as("e")))
    val byDoc = Window.partitionBy("doc_id").orderBy("e")
    ends
      .withColumn("s", coalesce(lag("e", 1).over(byDoc), lit(0)))
      .join(base, Seq("doc_id"))
      .select(
        col("doc_id"),
        col("s").cast("long").as("chunk_start"),
        col("e").cast("long").as("chunk_end"),
        (col("e") - col("s")).cast("long").as("n_chunk_tokens"),
        md5(array_join(
          slice(col("__t"), col("s") + 1, col("e") - col("s")), " ")
          .cast("binary")).as("fp"))
  }

  /** The whole CDC chunk computation as ONE row-local array expression:
    * array<struct<chunk_start, chunk_end, n_chunk_tokens, fp>> from a
    * token-array column — value-identical to [[chunks]] (spec-pinned).
    * This is the STREAMING-face form: Structured Streaming cannot run
    * [[chunks]]'s per-doc lag window, and a micro-batch of arrivals is
    * delta-sized, so the interpreted HOF lambdas here (filter/zip_with
    * are CodegenFallback — the round-8 rule) price in where they are
    * affordable; the batch path keeps the exploded codegen form for
    * corpus-sized scans.
    */
  def chunkStructsExpr(toks: Column, window: Int, modulus: Int): Column = {
    require(window >= 1, s"window must be >= 1: $window")
    require(modulus >= 1, s"modulus must be >= 1: $modulus")
    val n = size(toks)
    // guard the sequence: start > stop would DESCEND (the range-join
    // inverted-interval hazard), not produce an empty list
    val bs = when(n >= window,
      filter(sequence(lit(window), n), i =>
        pmod(
          TextAnalysis.portableHash32(
            array_join(slice(toks, i - lit(window) + 1, lit(window)), " ")),
          lit(modulus.toLong)) === 0))
      .otherwise(array().cast("array<int>"))
    // boundaries ascend and are <= n, so appending n keeps order;
    // array_union also dedups a boundary landing on the last token
    val ends = array_union(bs, array(n))
    val starts = concat(array(lit(0)), slice(ends, lit(1), size(ends) - 1))
    zip_with(starts, ends, (s, e) =>
      struct(
        s.cast("long").as("chunk_start"),
        e.cast("long").as("chunk_end"),
        (e - s).cast("long").as("n_chunk_tokens"),
        md5(array_join(slice(toks, s + 1, e - s), " ").cast("binary"))
          .as("fp")))
  }

  /** Ingest-time probe: each ARRIVING document's chunks checked against
    * the EXISTING corpus's chunk-fingerprint set — (doc_id, n_chunks,
    * n_tokens, n_dup_chunks, dup_tokens, dup_ratio) per arrival, where
    * a chunk is a duplicate iff its fingerprint appears among the
    * existing corpus's CDC chunks. The operational question at ingest
    * ("how much of this batch is already in the corpus?") answered at
    * batch-proportional probe cost: the arrival side is chunked fresh
    * (delta-sized); the existing side contributes one distinct 32-char
    * fingerprint per chunk, a hash equi-join on the fingerprint. At
    * steady state the existing fingerprints persist as a bucketed table
    * (the q79/q156 build/probe discipline) so the corpus is not
    * re-chunked per batch — recomputing here keeps the registry oracle
    * self-contained (the q126 note).
    */
  def ingestReport(
      existing: DataFrame,
      arrivals: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      modulus: Int): DataFrame = {
    val ex = chunks(existing, idCol, textCol, window, modulus)
      .select(col("fp")).distinct()
      .withColumn("__hit", lit(1L))
    chunks(arrivals, idCol, textCol, window, modulus)
      .join(ex, Seq("fp"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("n_tokens"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_dup_chunks"),
        sum(when(col("__hit").isNotNull, col("n_chunk_tokens"))
          .otherwise(lit(0L))).as("dup_tokens"))
      .select(
        col("doc_id"), col("n_chunks"), col("n_tokens"),
        col("n_dup_chunks"), col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("dup_ratio"))
  }

  /** Directed source-containment matrix over CDC chunks: for every
    * ordered source pair (a, b), the fraction of a's DISTINCT chunk
    * token mass that also occurs as a chunk of b — "how much of source
    * a's content is present in source b", the directed question q106's
    * symmetric minhash overlap matrix cannot answer (a small source
    * wholly copied from a big one shows containment ~1 in one
    * direction, ~0 in the other). Returns (source_a, source_b,
    * shared_mass, total_mass, containment); pairs sharing nothing are
    * absent.
    *
    * Shape: chunks dedup to DISTINCT (source, fp) first — n_chunk_tokens
    * is determined by the fingerprint, so the mass is well-defined —
    * and the pair former is an fp-keyed equi-join whose fan-out is
    * bounded by the number of SOURCES holding a chunk (never document
    * counts); the rollup is source-pair-sized. The q123 template:
    * aggregate to per-group structure first, do quadratic-prone work on
    * the bounded table.
    */
  def sourceContainment(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      window: Int,
      modulus: Int): DataFrame = {
    val s = chunks(docs, idCol, textCol, window, modulus)
      .join(
        docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source")),
        Seq("doc_id"))
      .select(col("source"), col("fp"), col("n_chunk_tokens"))
      .distinct()
    val totals = s.groupBy("source")
      .agg(sum("n_chunk_tokens").as("total_mass"))
    s.select(col("source").as("source_a"), col("fp"), col("n_chunk_tokens"))
      .join(s.select(col("source").as("source_b"), col("fp")), Seq("fp"))
      .filter(col("source_a") =!= col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(sum("n_chunk_tokens").as("shared_mass"))
      .join(
        totals.select(col("source").as("source_a"), col("total_mass")),
        Seq("source_a"))
      .select(
        col("source_a"), col("source_b"), col("shared_mass"),
        col("total_mass"),
        (col("shared_mass").cast("double") / col("total_mass").cast("double"))
          .as("containment"))
  }

  /** [[ingestReport]] against a PERSISTED fingerprint table — the probe
    * face of the stored CDC index (build/probe/fold, the q79/q156
    * discipline). Same output contract as ingestReport; two structural
    * differences tuned to the serving seam:
    *  - the membership test is a LEFT-SEMI join, so duplicate rows in
    *    the stored table (an at-least-once appended batch — see
    *    [[graft.operators.Bucketing.appendBucketed]]) can never
    *    duplicate arrival rows: fingerprint membership is a set
    *    question and semi-join asks exactly that, making the stored
    *    table replay-TOLERANT without a dedup pass;
    *  - the arrival chunk stream is referenced twice (totals + dup
    *    rollup, re-expanded per reference) — the delta side, where
    *    double-chunking is cheap; the corpus-sized stored side is
    *    scanned once, in place.
    */
  def probeStoredReport(
      storedFps: DataFrame,
      arrivals: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      modulus: Int): DataFrame = {
    val ar = chunks(arrivals, idCol, textCol, window, modulus)
    val dup = ar
      .join(storedFps.select(col("fp")), Seq("fp"), "left_semi")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_dup_chunks"),
        sum(col("n_chunk_tokens")).as("dup_tokens"))
    ar.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("n_tokens"))
      .join(dup, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_chunks", "dup_tokens"))
      .select(
        col("doc_id"), col("n_chunks"), col("n_tokens"),
        col("n_dup_chunks"), col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("dup_ratio"))
  }

  /** Chunk-level dedup report per document: (doc_id, n_chunks, n_tokens,
    * n_dup_chunks, dup_tokens, dup_ratio) where a chunk is a duplicate
    * iff its text occurs (as a CDC chunk) in >= 2 DISTINCT documents —
    * the min != max two-long aggregate, never a per-fingerprint doc-id
    * set. dup_ratio is the one final int/int division.
    */
  def dupReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      modulus: Int): DataFrame = {
    val ch = chunks(docs, idCol, textCol, window, modulus)
    val dup = ch.groupBy("fp")
      .agg(min("doc_id").as("d0"), max("doc_id").as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select(col("fp"), lit(1L).as("__dup"))
    ch.join(dup, Seq("fp"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("n_tokens"),
        sum(coalesce(col("__dup"), lit(0L))).as("n_dup_chunks"),
        sum(when(col("__dup").isNotNull, col("n_chunk_tokens"))
          .otherwise(lit(0L))).as("dup_tokens"))
      .select(
        col("doc_id"), col("n_chunks"), col("n_tokens"),
        col("n_dup_chunks"), col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("dup_ratio"))
  }
}
