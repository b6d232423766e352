package graft.queries

import graft.Tables
import graft.operators.{MediaRecord, Multimodal}

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
    ),
    Q(
      "q68_multimodal_resize",
      "Resize stage composed into the decode pipeline: payload -> resize " +
        "into a 256x256 box (stub re-encode = deterministic truncation by " +
        "the squared scale factor) -> re-decode metadata of the RESIZED " +
        "payload. The oracle recomputes the whole chain from the text " +
        "payload (all-ASCII fixture, so byte offsets == char offsets on " +
        "the oracle side).",
      Some("""
        |WITH s AS (
        |  SELECT doc_id, text, length(text) AS len,
        |         160 + CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 1280 AS w,
        |         120 + CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 720 AS h
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, text,
        |         CASE WHEN len = 0 THEN 0
        |              ELSE greatest(1, CAST(floor((len * sc) * sc) AS BIGINT)) END AS newlen
        |  FROM (SELECT doc_id, text, len,
        |               least(1.0, least(256.0 / w, 256.0 / h)) AS sc FROM s)
        |), m AS (
        |  SELECT doc_id, substr(text, 1, CAST(newlen AS INTEGER)) AS rp,
        |         CAST(newlen AS INTEGER) AS n_bytes
        |  FROM r
        |)
        |SELECT doc_id, n_bytes, md5(rp) AS content_md5,
        |       CAST(160 + CAST('0x' || substr(md5(rp), 1, 4) AS BIGINT) % 1280 AS INTEGER) AS width,
        |       CAST(120 + CAST('0x' || substr(md5(rp), 5, 4) AS BIGINT) % 720 AS INTEGER) AS height,
        |       CASE CAST('0x' || substr(md5(rp), 9, 2) AS BIGINT) % 3
        |            WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
        |FROM m
        |""".stripMargin.trim),
      (spark, dir) => {
        import spark.implicits._
        val media = Multimodal
          .payloadFromText(Tables.documents(spark, dir), "doc_id", "text")
          .as[MediaRecord]
        Multimodal.extractMeta(Multimodal.resize(media, 256, 256)).toDF()
      }
    ),
    Q(
      "q69_multimodal_embed_ann",
      "Embed -> ANN composition: media payloads through the batched stub " +
        "encoder (16-dim, hex-string-domain derivation) feed the exact " +
        "same brute-force cosine top-k the text embeddings use — near-dup " +
        "media detection without a single multimodal-specific join. " +
        "Queries = doc_id < 5, k = 3.",
      Some("""
        |WITH emb AS (
        |  SELECT doc_id,
        |         list_transform(range(0, 16),
        |           j -> CAST(CAST('0x' || substr(md5(md5(text) || '#' || CAST(j AS VARCHAR)), 1, 8) AS BIGINT)
        |                     / 2147483648.0 - 1.0 AS FLOAT)) AS embedding
        |  FROM documents
        |), e AS (
        |  SELECT doc_id, embedding,
        |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
        |  FROM emb
        |), scored AS (
        |  SELECT q.doc_id AS q_id, c.doc_id AS neighbor_id,
        |         list_sum(list_transform(list_zip(c.embedding, q.embedding),
        |                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (c.norm * q.norm) AS sim
        |  FROM e c JOIN e q ON q.doc_id < 5 AND c.doc_id != q.doc_id
        |)
        |SELECT q_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rn
        |      FROM scored)
        |WHERE rn <= 3
        |""".stripMargin.trim),
      (spark, dir) => {
        import spark.implicits._
        val media = Multimodal
          .payloadFromText(Tables.documents(spark, dir), "doc_id", "text")
          .as[MediaRecord]
        val emb = Multimodal.embed(media, dim = 16)
        graft.operators.Similarity.cosineTopK(
          emb, emb.filter(org.apache.spark.sql.functions.col("doc_id") < 5),
          "doc_id", "embedding", k = 3)
      }
    ),
    Q(
      "q71_multimodal_frames",
      "Frame sampling: 3 deterministic 16-byte frames per media record at " +
        "hash-derived offsets (stub for video frame extraction; the " +
        "one-to-many explode shape and offset math are the contract). " +
        "Frames surface as UTF-8 text for the compare — the fixture " +
        "payloads are ASCII, so the oracle's char slicing equals byte " +
        "slicing.",
      Some("""
        |WITH p AS (
        |  SELECT doc_id, text, length(text) AS n, md5(text) AS hex FROM documents
        |), f AS (
        |  SELECT doc_id, text, n, hex, unnest(range(0, 3)) AS i FROM p
        |), o AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, n, text,
        |         CAST(CASE WHEN n = 0 THEN 0
        |              ELSE CAST('0x' || substr(md5(hex || '#' || CAST(i AS VARCHAR)), 1, 8) AS BIGINT) % n
        |              END AS INTEGER) AS off
        |  FROM f
        |)
        |SELECT doc_id, frame_idx,
        |       substr(text, off + 1, least(16, n - off)) AS frame_text
        |FROM o
        |""".stripMargin.trim),
      (spark, dir) => {
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        val media = Multimodal
          .payloadFromText(Tables.documents(spark, dir), "doc_id", "text")
          .as[MediaRecord]
        Multimodal.sampleFrames(media, framesPerRecord = 3)
          .toDF("doc_id", "frame_idx", "frame")
          .select(col("doc_id"), col("frame_idx"),
            col("frame").cast("string").as("frame_text"))
      }
    ),
    Q(
      "q172_media_dedup",
      "Digest-first media dedup: group payloads by content md5 BEFORE " +
        "any decode — the pipeline-ordering rule that matters at 100 " +
        "TB, where decode is the CPU bill and re-crawled/mirrored media " +
        "are common. Only the 16-byte digest + byte count shuffle " +
        "(payloads never move), and bytes_dup is exactly the byte " +
        "volume the decode stage never has to touch. Same hash-keyed " +
        "map-side-combined shape as text exact-dedup (q30), applied at " +
        "the binary seam.",
      Some("""
        |SELECT md5(text) AS content_md5,
        |       MIN(doc_id) AS keep_id,
        |       COUNT(*) AS n_copies,
        |       CAST(MAX(octet_length(encode(text))) * (COUNT(*) - 1) AS BIGINT) AS bytes_dup
        |FROM documents GROUP BY 1
        |""".stripMargin.trim),
      (spark, dir) => {
        import spark.implicits._
        Multimodal.dedupByDigest(
          Multimodal.payloadFromText(Tables.documents(spark, dir), "doc_id", "text")
            .as[MediaRecord])
      }
    )
  )
}
