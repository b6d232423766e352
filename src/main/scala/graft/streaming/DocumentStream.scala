package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis

/** Streaming document curation: the batch text stack (quality floor ->
  * PII redaction -> context-window chunking, q51/q62/q61) run over a
  * file-source stream of document parquet.
  *
  * The load-bearing property: every one of these transforms is NARROW —
  * pure codegen'd projections/filters/generators with zero aggregation
  * state — so the exact same operators compose under `readStream`
  * unchanged, in append mode, with nothing in the state store. A corpus
  * that arrives as a rolling drop of parquet files (the production shape
  * of a crawl) curates incrementally: each micro-batch flows through
  * whole-stage codegen exactly like the batch plan, and the streaming
  * output is bit-identical to running the batch twin over the union of
  * all files (DocumentStreamSpec asserts it).
  *
  * Cross-batch exact dedup composes on top via the same
  * watermark-bounded `dropDuplicatesWithinWatermark` shape EventStream
  * demonstrates (or a foreachBatch anti-join against the served corpus —
  * `IdempotentJdbcSink` shows that delivery pattern).
  */
object DocumentStream {

  /** File-source stream over a DIRECTORY of documents parquet files. */
  def readDocuments(spark: SparkSession, watchDir: String, schemaFrom: String): DataFrame = {
    val schema = Tables.documents(spark, schemaFrom).schema
    spark.readStream.schema(schema).parquet(watchDir)
  }

  /** Quality floor + PII redaction: the per-document curation pass.
    * Scoring happens on the RAW column (plain attribute references push
    * to the scan; q57 documents the alias-inlining trap).
    */
  def curated(docs: DataFrame): DataFrame =
    docs
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
      .select(
        col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("clean_text"))

  /** Curated documents exploded into 50-token training chunks (10-token
    * overlap) — the full pre-training text path, streaming.
    */
  def curatedChunks(docs: DataFrame): DataFrame =
    TextAnalysis.chunkByTokens(
      curated(docs), "clean_text", "doc_id", chunkTokens = 50, overlap = 10)
}
