package graft.queries

import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column queries (north-star extension): binary payload
  * plumbing + batched decode stage. The decode itself is a deterministic
  * stub (see [[graft.operators.Multimodal.decodeStub]]) so the whole
  * pipeline — including the typed mapPartitions boundary — is
  * oracle-checkable.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    Q(
      "q60_multimodal_meta",
      "Binary media pipeline: text -> utf-8 payload (BinaryType) -> batched " +
        "per-partition decode (stubbed codec) -> typed metadata table " +
        "(bytes, md5, stub dimensions, stub format).",
      Some("""
        |SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       md5(text) AS content_md5,
        |       CAST(160 + CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 1280 AS INTEGER) AS width,
        |       CAST(120 + CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 720 AS INTEGER) AS height,
        |       CASE CAST('0x' || substr(md5(text), 9, 2) AS BIGINT) % 3
        |            WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
        |FROM documents
        |""".stripMargin.trim),
      (spark, dir) =>
        Multimodal.metaFromDocuments(spark, Tables.documents(spark, dir)).toDF()
    )
  )
}
