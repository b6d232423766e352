package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share any exact
  * token n-gram with a held-out evaluation/benchmark set — the standard
  * pre-training hygiene pass (eval answers leaking into training data
  * inflate scores; the countermeasure is n-gram-overlap screening).
  *
  * Scale design (the reason this is join-shaped, not a cross product):
  * the benchmark side is SMALL (eval suites are thousands of documents
  * even when the corpus is 100 TB), so its distinct n-gram set is
  * broadcast — the corpus side streams through a broadcast-hash semi-ish
  * join with NO shuffle of corpus n-grams; the only exchange is the
  * per-document hit-count aggregation, keyed by doc id. Were the
  * benchmark ever too big to broadcast, the same plan degrades gracefully
  * to a shuffled hash join on the n-gram key.
  */
object Decontaminate {

  /** Per-corpus-document contamination report.
    *
    * @return (idCol, n_hits = how many of the document's DISTINCT n-grams
    *         appear anywhere in the benchmark, contaminated = n_hits > 0).
    *         Every corpus document appears exactly once (zero-hit docs
    *         included — the report is the full audit, not just the flags).
    */
  def report(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8): DataFrame = {
    def grams(df: DataFrame) = df.select(
      col(idCol),
      explode(array_distinct(
        TextAnalysis.tokenNgrams(TextAnalysis.wsTokens(col(textCol)), n))).as("g"))
    val benchGrams = grams(benchmark).select(col("g")).distinct()
    val hits = grams(corpus)
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("hits"), lit(0L)).as("n_hits"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }
}
