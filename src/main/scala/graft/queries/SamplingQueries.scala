package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Sampling

/** Deterministic sampling / splitting queries over `documents` (north-star
  * extension; see graft.operators.Sampling for why hash-based beats
  * RNG-based at 100 TB). Oracle: the identical md5-prefix bucket math in
  * DuckDB — the split assignment is engine-portable by construction.
  */
object SamplingQueries {

  val all: Seq[Q] = Seq(
    Q(
      "q38_hash_split",
      "Deterministic train/val/test split: portable-hash bucket of the doc " +
        "id into 80/10/10 bands. Stable across runs, engines, partition " +
        "layouts; any table keyed by doc_id splits consistently.",
      Some("""
        |SELECT doc_id,
        |       CASE WHEN b < 80 THEN 'train'
        |            WHEN b < 90 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id,
        |         CAST('0x' || substr(md5('split1:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS b
        |  FROM documents
        |)
        |""".stripMargin.trim),
      (spark, dir) =>
        Tables.documents(spark, dir).select(
          col("doc_id"),
          Sampling.splitLabel(col("doc_id"), trainPct = 80, valPct = 10,
            salt = "split1:").as("split"))
    ),
    Q(
      "q39_stratified_sample",
      "Stratified deterministic sample by language: en keeps 50%, zh 20%, " +
        "everything else 10% — per-stratum hash-bucket filters, no RNG, no " +
        "shuffle, exact under any partitioning.",
      Some("""
        |SELECT doc_id, lang
        |FROM (
        |  SELECT doc_id, lang,
        |         CAST('0x' || substr(md5('strat1:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS b,
        |         CASE WHEN lang = 'en' THEN 50
        |              WHEN lang = 'zh' THEN 20
        |              ELSE 10 END AS pct
        |  FROM documents
        |)
        |WHERE b < pct
        |""".stripMargin.trim),
      (spark, dir) =>
        Sampling.stratifiedHashSample(
          Tables.documents(spark, dir),
          strataCol = col("lang"),
          key = col("doc_id"),
          rates = Map("en" -> 50, "zh" -> 20),
          defaultPercent = 10,
          salt = "strat1:")
          .select(col("doc_id"), col("lang"))
    )
  )
}
