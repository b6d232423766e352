package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level token statistics for vocabulary induction and curation
  * ordering — the counting passes a tokenizer-training or data-mixing
  * pipeline runs over the whole corpus.
  */
object CorpusStats {

  /** Adjacent-token pair counts, the BPE/WordPiece merge-selection inner
    * loop: every consecutive whitespace-token pair, counted corpus-wide,
    * top `k` by count with a deterministic lexicographic tiebreak.
    *
    * Scale shape: the pair explode is narrow; the count shuffles once on
    * the pair with full map-side combine; the top-k plans as
    * TakeOrderedAndProject (per-partition top-k, k-row driver merge) —
    * never a global sort.
    */
  def pairCounts(
      docs: DataFrame,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val toks = TextAnalysis.wsTokens(col(textCol))
    val m = size(toks) - 1
    val pairs = zip_with(
      slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => concat_ws(" ", a, b))
    docs.select(explode(pairs).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Per-document n-gram novelty: the fraction of a document's distinct
    * n-grams whose FIRST occurrence (by ascending doc id) is this
    * document — the content-growth signal curation uses to order or
    * prune sources that stop contributing new text.
    *
    * Scale shape: the gram stream shuffles ONCE (the min-doc aggregate,
    * map-side combined); novel counts fall straight out of that
    * aggregate's output re-keyed by the winning doc, and per-doc totals
    * are a narrow doc-keyed count — so the join that assembles the
    * ratio is doc-sized on both sides, never a second pass over the
    * gram stream. Docs with fewer than `n` tokens have no grams and are
    * absent. The novelty ratio is an exact int/int double division —
    * bit-identical across engines.
    */
  def gramNovelty(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val grams = docs.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(
        TextAnalysis.tokenNgrams(TextAnalysis.wsTokens(col(textCol)), n)))
        .as("gram"))
    val novel = grams
      .groupBy("gram").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    val totals = grams
      .groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    totals.join(novel, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_novel"))
      .select(
        col("doc_id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
  }
}
