package graft.operators

import org.apache.spark.sql.DataFrame
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
      .select(col("doc_id"), col("e"))
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
    val ends = boundaries(docs, idCol, textCol, window, modulus)
      // the final chunk always ends at n — distinct because a boundary
      // may itself land on the last token
      .unionByName(base.select(col("doc_id"), size(col("__t")).as("e")))
      .distinct()
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
