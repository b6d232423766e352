package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media record: opaque payload + typed metadata. In production the
  * payload is image/audio/video bytes read from parquet `binary` columns;
  * here it is synthesized from text so the pipeline is runnable in-harness.
  */
final case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)

/** Decoded/extracted media metadata (the output schema of the decode stage). */
final case class MediaMeta(
    doc_id: Long,
    n_bytes: Int,
    content_md5: String,
    width: Int,
    height: Int,
    format: String)

/** Multimodal-column plumbing: treat media as opaque `BinaryType` payloads
  * with typed metadata, and run decode / feature-extraction as a typed
  * `mapPartitions` stage — the Scala analogue of a `mapInPandas` batch UDF:
  * the executor streams batches of records through a per-partition decoder
  * without ever materializing the partition, and the output is a first-class
  * Dataset that joins/filters like any other table.
  *
  * THE DECODE ITSELF IS A STUB (this container has no image/audio codecs):
  * [[decodeStub]] derives deterministic fake dimensions from the payload's
  * md5. Everything around it — binary schema, batch iteration, partition
  * sizing, output encoders — is real and tested. Swap [[decodeStub]] for a
  * JNI/codec call to productionize.
  *
  * Scale: decode is CPU-heavy and embarrassingly parallel; `repartition(n)`
  * upstream sets decode parallelism independent of the file layout, and no
  * shuffle follows (metadata extraction is narrow).
  */
object Multimodal {

  /** Build the media table: payload = utf-8 bytes of the text column.
    * (In production this column arrives as parquet `binary` directly.)
    */
  def payloadFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"))

  /** STUB decode — deterministic fake: dimensions/format derived from the
    * payload md5. A real implementation decodes the actual media here.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, String) = {
    val hex = md5Hex(payload)
    val width = 160 + (java.lang.Long.parseLong(hex.substring(0, 4), 16) % 1280L).toInt
    val height = 120 + (java.lang.Long.parseLong(hex.substring(4, 8), 16) % 720L).toInt
    val format = (java.lang.Long.parseLong(hex.substring(8, 10), 16) % 3L) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    (width, height, format)
  }

  // Reused per thread: a fresh getInstance per record is a JCA provider
  // lookup + allocation in the per-row hot path (same pattern as
  // PortableHash32's digest).
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def md5Digest(bytes: Array[Byte]): Array[Byte] = {
    val md = md5.get(); md.reset(); md.digest(bytes)
  }

  def md5Hex(bytes: Array[Byte]): String =
    md5Digest(bytes).map(b => f"${b & 0xff}%02x").mkString

  /** The decode stage: batched per-partition iteration (batch shape mirrors
    * an Arrow-batch UDF boundary — records are processed `batchSize` at a
    * time so a codec with per-call setup cost amortizes).
    */
  def extractMeta(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          val (w, h, fmt) = decodeStub(rec.payload)
          MediaMeta(rec.doc_id, rec.payload.length, md5Hex(rec.payload), w, h, fmt)
        }
      }
    }
  }

  /** End-to-end: documents -> payload table -> decode -> metadata table. */
  def metaFromDocuments(spark: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    extractMeta(payloadFromText(df, "doc_id", "text").as[MediaRecord])
  }

  /** STUB resize — a real implementation re-encodes pixels; the stub keeps
    * the plumbing contract honest: output is a new payload whose size
    * shrinks with the target box, plus the recomputed metadata. Payload
    * bytes = deterministic truncation (stand-in for re-encoded bytes).
    */
  def resizeStub(payload: Array[Byte], maxW: Int, maxH: Int): Array[Byte] = {
    if (payload.isEmpty) return payload // never fabricate bytes for empty media
    val (w, h, _) = decodeStub(payload)
    val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    val newLen = math.max(1, (payload.length * scale * scale).toInt)
    java.util.Arrays.copyOf(payload, newLen)
  }

  /** Digest-first media dedup: group payloads by content md5 BEFORE any
    * decode — the pipeline-ordering rule that matters at 100 TB, where
    * the decode stage is the CPU bill and identical media (re-crawled
    * images, mirrored videos) are common. Only the 16-byte digest and
    * the byte count shuffle; payloads never move, and every duplicate
    * copy skipped is its full decode cost saved (`bytes_dup` = the
    * bytes the decode stage never sees). Same shape as text exact-dedup
    * (q30): hash-keyed agg with map-side combine.
    */
  def dedupByDigest(media: Dataset[MediaRecord]): DataFrame =
    media.toDF()
      .select(org.apache.spark.sql.functions.md5(col("payload")).as("content_md5"),
        col("doc_id"), length(col("payload")).as("n_bytes"))
      .groupBy("content_md5")
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        (max(col("n_bytes")) * (count(lit(1)) - 1)).cast("long").as("bytes_dup"))

  /** Batched resize stage: same mapPartitions shape as [[extractMeta]]. */
  def resize(ds: Dataset[MediaRecord], maxW: Int, maxH: Int,
      batchSize: Int = 64): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { rec =>
      rec.copy(payload = resizeStub(rec.payload, maxW, maxH))
    }))
  }

  /** STUB feature extraction: a deterministic pseudo-embedding expanded
    * from the payload hash — the seam where a vision/audio encoder model
    * call goes in production (same batched mapPartitions shape, so a
    * model with per-call setup amortizes over `batchSize`). Identical
    * payloads embed identically, so the output feeds the engine's
    * similarity/dedup stack unchanged: near-dup media detection is
    * embed -> [[Similarity.cosineDupPairs]] / ANN top-k, exactly like
    * text embeddings.
    */
  def embedStub(payload: Array[Byte], dim: Int): Array[Float] = {
    // Digest the payload ONCE into its md5 hex string, then derive each
    // dimension from the fixed-length "<hex>#<j>" seed: O(payload + dim)
    // per record instead of O(dim x payload), the full index (no byte
    // truncation aliasing dimensions 256 apart), and the whole derivation
    // lives in the hex-STRING domain — so an engine whose md5 only takes
    // VARCHAR (the DuckDB oracle) reproduces it bit-for-bit (q69).
    val hex = md5Hex(payload)
    Array.tabulate(dim) { j =>
      val h = graft.functions.PortableHash32.hash32(
        (hex + "#" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (h / 2147483648.0 - 1.0).toFloat // [0, 2^32) -> [-1, 1)
    }
  }

  /** Batched embedding stage: (doc_id, embedding ArrayType(FloatType)). */
  def embed(ds: Dataset[MediaRecord], dim: Int = 16,
      batchSize: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { rec =>
      (rec.doc_id, embedStub(rec.payload, dim))
    })).toDF("doc_id", "embedding")
  }

  /** One sampled "frame" per media record: a deterministic slice of the
    * payload at a hash-chosen offset (STUB for video frame extraction —
    * the schema (doc_id, frame_idx, frame bytes) and the one-to-many
    * explode shape are the real contract).
    */
  def sampleFrames(ds: Dataset[MediaRecord], framesPerRecord: Int,
      batchSize: Int = 64): Dataset[(Long, Int, Array[Byte])] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { rec =>
      val n = rec.payload.length
      // One digest per record (not per frame); offsets derive from the
      // fixed-length "<hex>#<i>" seed — same hex-string-domain discipline
      // as [[embedStub]], so frame offsets are oracle-reproducible.
      val hex = md5Hex(rec.payload)
      (0 until framesPerRecord).map { i =>
        val off = if (n == 0) 0 else (PortableOffset.offset(hex, i) % n).toInt
        val len = math.min(16, n - off)
        (rec.doc_id, i, java.util.Arrays.copyOfRange(rec.payload, off, off + len))
      }
    }))
  }

  private object PortableOffset {
    def offset(payloadHex: String, i: Int): Long =
      graft.functions.PortableHash32.hash32(
        (payloadHex + "#" + i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
