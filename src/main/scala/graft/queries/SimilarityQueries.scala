package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Similarity-search queries over `embeddings` (north-star extension).
  * Cosine scores use the sequential-double-fold contract (see
  * [[graft.operators.Similarity]]) so they oracle-compare bit-exactly.
  */
object SimilarityQueries {

  private val NumPlanes = 8
  private val Dim = 64

  /** DuckDB literal for plane j — the exact same constants the Spark plan
    * embeds, generated from one source of truth.
    */
  private def duckPlane(p: Array[Double]): String =
    p.mkString("[", ", ", "]::DOUBLE[]")

  private lazy val planes = Similarity.hyperplanes(NumPlanes, Dim)

  private val duckDot =
    "list_sum(list_transform(list_zip(%s, %s), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  private def duckBucketPlanes(embExpr: String, ps: Array[Array[Double]]): String =
    ps.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN ${duckDot.format(embExpr, duckPlane(p))} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def duckBucket(embExpr: String): String = duckBucketPlanes(embExpr, planes)

  // Banded LSH family for q83's threshold near-dup pairs: independent
  // tables of sign bits, the same constants on both engines.
  private val DupTables = 4
  private val DupBits = 4
  private lazy val dupPlanes = Similarity.hyperplanes(DupTables * DupBits, Dim)

  /** q42's IVF oracle text (deterministic first-16 quantizer, nprobe=2,
    * top-5 for queries vec_id < 8) — shared verbatim by q79, whose
    * persisted-index probe has identical semantics by construction.
    */
  /** The IVF probe oracle, parameterized on the centroid selection so
    * the delta-segment variant (q156: first-16 quantizer of the BASE
    * slice) renders from the same template as q42/q79's full-corpus one.
    */
  private def ivfOracleSqlCents(centsWhere: String): String = {
    val dotEC = duckDot.format("e.embedding", "c.cent_emb")
    val dotCQ = duckDot.format("c.emb", "q.q_emb")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
       |  FROM embeddings
       |), cents AS (
       |  SELECT vec_id AS cell, embedding AS cent_emb, norm AS cent_norm FROM e WHERE $centsWhere
       |), scored_all AS (
       |  SELECT e.vec_id, e.embedding, e.norm, c.cell,
       |         $dotEC / (e.norm * c.cent_norm) AS csim
       |  FROM e, cents c
       |), corpus_cells AS (
       |  SELECT vec_id AS neighbor_id, embedding AS emb, norm AS nrm, cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS cr
       |    FROM scored_all) WHERE cr = 1
       |), query_cells AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_nrm, cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS cr
       |    FROM scored_all WHERE vec_id < 8) WHERE cr <= 2
       |), cand AS (
       |  SELECT DISTINCT q.q_id, c.neighbor_id,
       |         $dotCQ / (c.nrm * q.q_nrm) AS sim
       |  FROM corpus_cells c JOIN query_cells q
       |    ON c.cell = q.cell AND c.neighbor_id != q.q_id
       |)
       |SELECT q_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rn
       |      FROM cand)
       |WHERE rn <= 5""".stripMargin
  }

  private lazy val ivfOracleSql: String = ivfOracleSqlCents("vec_id < 16")

  /** Brute-force top-5 oracle — shared verbatim by q85, whose exhaustive
    * probe (nprobe = nlist) returns exactly the brute-force result no
    * matter what the trained centroids are.
    */
  private val bruteForceSql: String = """
    |WITH e AS (
    |  SELECT vec_id, embedding,
    |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
    |  FROM embeddings
    |),
    |scored AS (
    |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
    |         list_sum(list_transform(list_zip(c.embedding, q.embedding),
    |                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (c.norm * q.norm) AS sim
    |  FROM e c JOIN e q ON q.vec_id < 8 AND c.vec_id != q.vec_id
    |)
    |SELECT q_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
    |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rn
    |      FROM scored)
    |WHERE rn <= 5
    |""".stripMargin.trim

  val all: Seq[Q] = Seq(
    Q(
      "q40_ann_bruteforce",
      "Brute-force cosine top-5 for 8 query vectors: broadcast nested loop " +
        "(queries broadcast, corpus streams), per-query top-k via window. " +
        "The exact baseline ANN variants are measured against.",
      Some(bruteForceSql),
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        Similarity.cosineTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5)
      }
    ),
    Q(
      "q41_ann_lsh",
      s"LSH-bucketed approximate top-5: $NumPlanes random-hyperplane sign " +
        "bits -> 2^8 buckets; only bucket-colocated pairs are scored. The " +
        "plane constants are literals shared with the oracle.",
      Some {
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm,
           |         ${duckBucket("embedding")} AS bucket
           |  FROM embeddings
           |),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
           |         ${duckDot.format("c.embedding", "q.embedding")} / (c.norm * q.norm) AS sim
           |  FROM e c JOIN e q ON c.bucket = q.bucket AND q.vec_id < 8 AND c.vec_id != q.vec_id
           |)
           |SELECT q_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
           |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rn
           |      FROM scored)
           |WHERE rn <= 5""".stripMargin
      },
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        Similarity.cosineTopKLsh(
          e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, numPlanes = NumPlanes, dim = Dim)
      }
    ),
    Q(
      "q42_ann_ivf",
      "IVF-bucketed approximate top-5: deterministic coarse quantizer " +
        "(first-16 vectors as centroid cells), nprobe=2 cells per query; " +
        "oracle expresses the same argmax assignment with window functions.",
      Some(ivfOracleSql),
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        Similarity.cosineTopKIvf(
          e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 2)
      }
    ),
    Q(
      "q79_ann_ivf_index",
      "Persisted IVF index: the corpus assignment pass is paid ONCE at " +
        "build time (centroid table + cell-bucketed corpus table); each " +
        "probe broadcasts the tiny centroid table, reads the probed " +
        "cells, and joins them against the pre-bucketed layout without " +
        "shuffling the corpus. Probe semantics are identical to q42 by " +
        "construction — same oracle text.",
      Some(ivfOracleSql),
      (spark, dir) => {
        IvfPhases.indexBuild(spark, dir)
        IvfPhases.indexProbe(spark, dir)
      }
    ),
    Q(
      "q85_ann_ivf_trained",
      "IVF with REAL trained centroids (seeded Spark ML k-means, 8 cells) " +
        "probed exhaustively (nprobe = nlist): the result is exactly the " +
        "brute-force top-5 whatever the learned centers are, so the " +
        "trained-quantizer plumbing gets an exact centroid-independent " +
        "oracle; recall at nprobe < nlist is pinned separately in " +
        "IvfKmeansSpec.",
      Some(bruteForceSql),
      (spark, dir) => {
        IvfPhases.train(spark, dir)
        IvfPhases.trainedProbe(spark, dir)
      }
    ),
    Q(
      "q88_semantic_decontaminate",
      "SemDeDup-style semantic decontamination: every corpus embedding " +
        "(vec_id % 10 <> 0) scored against the broadcast benchmark slice " +
        "(vec_id % 10 = 0); max cosine per corpus item, flagged at 0.35 — " +
        "catches paraphrased eval leakage that exact n-gram overlap " +
        "(q63) misses. One exchange: the map-side-combined per-id max.",
      Some("""
        |WITH e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
        |  FROM embeddings
        |), c AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
        |b AS (SELECT * FROM e WHERE vec_id % 10 = 0)
        |SELECT c.vec_id,
        |       MAX(list_sum(list_transform(list_zip(c.embedding, b.embedding),
        |            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (c.norm * b.norm)) AS max_bench_sim,
        |       MAX(list_sum(list_transform(list_zip(c.embedding, b.embedding),
        |            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (c.norm * b.norm)) >= 0.35 AS contaminated
        |FROM c, b GROUP BY c.vec_id
        |""".stripMargin.trim),
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        graft.operators.Decontaminate.semanticReport(
          e.filter(col("vec_id") % 10 =!= 0),
          e.filter(col("vec_id") % 10 === 0),
          "vec_id", "embedding", threshold = 0.35)
      }
    ),
    Q(
      "q83_embedding_dup_lsh",
      s"Production embedding near-dup pairs: banded sign-bit LSH " +
        s"($DupTables tables x $DupBits bits), candidates join on " +
        "(table, bucket) — never a cross product — then the exact " +
        "double-fold cosine verifies the threshold (precision 1, recall " +
        "the banding knob). Replaces q35's bounded cross join as the " +
        "at-scale path; same bounded subset so the two are comparable. " +
        "Oracle mirrors the identical plane constants and banding.",
      Some {
        val branches = (0 until DupTables).map { t =>
          val slice = dupPlanes.slice(t * DupBits, (t + 1) * DupBits)
          s"SELECT vec_id, $t AS tbl, ${duckBucketPlanes("embedding", slice)} AS bucket FROM e"
        }.mkString("\n  UNION ALL\n  ")
        val dotAB = duckDot.format("ea.embedding", "eb.embedding")
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
           |  FROM embeddings WHERE vec_id < 1000
           |), b AS (
           |  $branches
           |), cand AS (
           |  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
           |  FROM b a JOIN b c ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.vec_id < c.vec_id
           |)
           |SELECT cand.vec_a, cand.vec_b,
           |       $dotAB / (ea.norm * eb.norm) AS sim
           |FROM cand JOIN e ea ON ea.vec_id = cand.vec_a
           |          JOIN e eb ON eb.vec_id = cand.vec_b
           |WHERE $dotAB / (ea.norm * eb.norm) >= 0.4""".stripMargin
      },
      (spark, dir) =>
        Similarity.cosineDupPairsLsh(
          Tables.embeddings(spark, dir).filter(col("vec_id") < 1000),
          "vec_id", "embedding", threshold = 0.4,
          tables = DupTables, bitsPerTable = DupBits, dim = Dim)
    ),
    Q(
      "q93_semantic_decontaminate_lsh",
      s"q88's at-scale path, oracle-checked: LSH-bucketed semantic " +
        s"decontamination ($DupTables tables x $DupBits sign bits, the " +
        "q83 banding family) — corpus and benchmark bucket under the " +
        "same planes, only (table, bucket)-colocated pairs are scored " +
        "with the exact double-fold cosine, max per corpus id (duplicate " +
        "meetings are max-insensitive, no dedup pass), full-audit left " +
        "join back (null max_bench_sim = no colocated benchmark vector, " +
        "contaminated false). Every flag is a true flag (precision 1); " +
        "recall is the banding knob.",
      Some {
        def branches(src: String) = (0 until DupTables).map { t =>
          val slice = dupPlanes.slice(t * DupBits, (t + 1) * DupBits)
          s"SELECT vec_id, embedding, norm, $t AS tbl, ${duckBucketPlanes("embedding", slice)} AS bucket FROM $src"
        }.mkString("\n  UNION ALL\n  ")
        val dotCB = duckDot.format("ca.embedding", "ba.embedding")
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
           |  FROM embeddings
           |), c AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
           |b AS (SELECT * FROM e WHERE vec_id % 10 = 0),
           |cb AS (
           |  ${branches("c")}
           |), bb AS (
           |  ${branches("b")}
           |), hits AS (
           |  SELECT ca.vec_id,
           |         MAX($dotCB / (ca.norm * ba.norm)) AS max_bench_sim
           |  FROM cb ca JOIN bb ba ON ca.tbl = ba.tbl AND ca.bucket = ba.bucket
           |  GROUP BY ca.vec_id
           |)
           |SELECT c.vec_id, hits.max_bench_sim,
           |       COALESCE(hits.max_bench_sim >= 0.35, FALSE) AS contaminated
           |FROM c LEFT JOIN hits ON c.vec_id = hits.vec_id""".stripMargin
      },
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        graft.operators.Decontaminate.semanticReportLsh(
          e.filter(col("vec_id") % 10 =!= 0),
          e.filter(col("vec_id") % 10 === 0),
          "vec_id", "embedding", threshold = 0.35,
          tables = DupTables, bitsPerTable = DupBits, dim = Dim)
      }
    ),
    Q(
      "q121_ann_recall",
      "Recall@5 of the LSH-bucketed ANN (q41) against the brute-force " +
        "truth (q40), per query: the index-tuning metric itself as a " +
        "tracked query, so banding-knob regressions surface as recall " +
        "deltas, not anecdotes. Both inputs are queries x k rows — " +
        "corpus-size-independent — so the evaluation join is free next " +
        "to the searches. n_exact is the per-query truth size, n_hit " +
        "how many of those the LSH buckets surfaced.",
      Some {
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm,
           |         ${duckBucket("embedding")} AS bucket
           |  FROM embeddings
           |), ex AS (
           |  SELECT q_id, neighbor_id FROM (
           |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
           |             ${duckDot.format("c.embedding", "q.embedding")} / (c.norm * q.norm) DESC, c.vec_id) AS rn
           |    FROM e c JOIN e q ON q.vec_id < 8 AND c.vec_id != q.vec_id)
           |  WHERE rn <= 5
           |), ap AS (
           |  SELECT q_id, neighbor_id FROM (
           |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
           |             ${duckDot.format("c.embedding", "q.embedding")} / (c.norm * q.norm) DESC, c.vec_id) AS rn
           |    FROM e c JOIN e q ON c.bucket = q.bucket AND q.vec_id < 8 AND c.vec_id != q.vec_id)
           |  WHERE rn <= 5
           |)
           |SELECT ex.q_id,
           |       CAST(COUNT(*) AS BIGINT) AS n_exact,
           |       CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hit,
           |       CAST(COUNT(ap.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
           |FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.neighbor_id = ap.neighbor_id
           |GROUP BY ex.q_id""".stripMargin
      },
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        val q = e.filter(col("vec_id") < 8)
        Similarity.topKRecall(
          Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5),
          Similarity.cosineTopKLsh(e, q, "vec_id", "embedding",
            k = 5, numPlanes = NumPlanes, dim = Dim))
      }
    ),
    Q(
      "q122_embed_quantize",
      "Per-vector symmetric int8 quantization: codes in [-127,127] with " +
        "a per-vector scale and the EXACT integer reconstruction " +
        "residue. The q117 floor-shift device end-to-end: floor(v*2^30) " +
        "is the same BIGINT in every engine, and everything after it — " +
        "scale max, sign-split truncating division, error residue — is " +
        "integer arithmetic, so the 4x-compression pass oracle-checks " +
        "bit-for-bit. Pure narrow map: zero shuffle at any corpus size.",
      Some {
        val code = "CASE WHEN scale = 0 THEN 0 WHEN x >= 0 THEN (x * 127) // scale ELSE -((-x * 127) // scale) END"
        s"""WITH v AS (
           |  SELECT vec_id,
           |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1073741824.0) AS BIGINT)) AS iv
           |  FROM embeddings
           |), s AS (
           |  SELECT vec_id, iv,
           |         coalesce(list_max(list_transform(iv, x -> abs(x))), 0) AS scale
           |  FROM v
           |)
           |SELECT vec_id, CAST(scale AS BIGINT) AS scale,
           |       array_to_string(list_transform(iv, x -> $code), ',') AS qvec,
           |       CAST(coalesce(list_max(list_transform(iv,
           |              x -> abs(x * 127 - ($code) * scale))), 0) AS BIGINT) AS max_abs_err
           |FROM s""".stripMargin
      },
      (spark, dir) =>
        graft.operators.Quantize.int8(
            Tables.embeddings(spark, dir), "vec_id", "embedding")
          .select(
            col("vec_id"), col("scale"),
            array_join(col("qvec").cast("array<string>"), ",").as("qvec"),
            col("max_abs_err"))
    ),
    Q(
      "q131_quantized_ann_recall",
      "What the 4x compression costs: recall@5 of brute-force search " +
        "over the INT8 CODES (q122) against the float truth (q40). The " +
        "per-vector scale cancels in cosine — cos(q_a*s_a, q_b*s_b) = " +
        "cos(q_a, q_b) — so the quantized search runs entirely on " +
        "integer codes: exact BIGINT dot folds, one sqrt and one " +
        "division as the only floating ops. The compression-quality " +
        "curve as a tracked query, not a notebook anecdote.",
      Some {
        val code = "CASE WHEN scale = 0 THEN 0 WHEN x >= 0 THEN (x * 127) // scale ELSE -((-x * 127) // scale) END"
        s"""WITH v AS (
           |  SELECT vec_id,
           |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1073741824.0) AS BIGINT)) AS iv
           |  FROM embeddings
           |), s AS (
           |  SELECT vec_id, iv,
           |         coalesce(list_max(list_transform(iv, x -> abs(x))), 0) AS scale
           |  FROM v
           |), n AS (
           |  SELECT vec_id, q,
           |         sqrt(CAST(list_sum(list_transform(list_zip(q, q), x -> x[1] * x[2])) AS DOUBLE)) AS nrm
           |  FROM (SELECT vec_id, list_transform(iv, x -> $code) AS q FROM s WHERE scale > 0)
           |), ap AS (
           |  SELECT q_id, neighbor_id FROM (
           |    SELECT qq.vec_id AS q_id, c.vec_id AS neighbor_id,
           |           ROW_NUMBER() OVER (PARTITION BY qq.vec_id ORDER BY
           |             CAST(list_sum(list_transform(list_zip(c.q, qq.q), x -> x[1] * x[2])) AS DOUBLE)
           |               / (c.nrm * qq.nrm) DESC, c.vec_id) AS rn
           |    FROM n c JOIN n qq ON qq.vec_id < 8 AND c.vec_id != qq.vec_id)
           |  WHERE rn <= 5
           |), ex AS (
           |  SELECT q_id, neighbor_id FROM (
           |    $bruteForceSql
           |  )
           |)
           |SELECT ex.q_id,
           |       CAST(COUNT(*) AS BIGINT) AS n_exact,
           |       CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hit,
           |       CAST(COUNT(ap.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
           |FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.neighbor_id = ap.neighbor_id
           |GROUP BY ex.q_id""".stripMargin
      },
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        val q = e.filter(col("vec_id") < 8)
        Similarity.topKRecall(
          Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5),
          graft.operators.Quantize.cosineTopKInt8(e, q, "vec_id", "embedding", k = 5))
      }
    ),
    Q(
      "q141_ivf_recall",
      "Recall@5 of the IVF index (q42's nprobe=2 deterministic " +
        "quantizer) against the brute-force truth — completing the " +
        "tracked recall family (q121 LSH, q131 int8, q141 IVF): the " +
        "recall-per-nprobe operating point as a regression-guarded " +
        "number. Evaluation join is queries x k rows.",
      Some {
        s"""WITH ex AS (
           |  SELECT q_id, neighbor_id FROM (
           |    $bruteForceSql
           |  )
           |), ap AS (
           |  SELECT q_id, neighbor_id FROM (
           |    $ivfOracleSql
           |  )
           |)
           |SELECT ex.q_id,
           |       CAST(COUNT(*) AS BIGINT) AS n_exact,
           |       CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hit,
           |       CAST(COUNT(ap.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
           |FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.neighbor_id = ap.neighbor_id
           |GROUP BY ex.q_id""".stripMargin
      },
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        val q = e.filter(col("vec_id") < 8)
        Similarity.topKRecall(
          Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5),
          Similarity.cosineTopKIvf(e, q, "vec_id", "embedding",
            k = 5, nlist = 16, nprobe = 2))
      }
    ),
    Q(
      "q117_label_centroids",
      "Per-label embedding centroid + per-dimension variance: class " +
        "prototypes and intra-class spread, the label-quality / " +
        "centroid-drift audit. Accumulation is an exact BIGINT sum of " +
        "floor(v * 2^30) per (label, dim) cell — float->double widening " +
        "and the 2^30 exponent shift are exact, floor is the same " +
        "integer in every engine (DuckDB's double->BIGINT cast ROUNDS " +
        "where Spark's truncates, hence the explicit floor), so the " +
        "only floating ops are the final fixed-shape divisions. One " +
        "narrow posexplode, ONE map-side-combined shuffle onto the " +
        "labels x dims key space — output size independent of corpus " +
        "size.",
      Some("""
        |WITH x AS (
        |  SELECT label,
        |         generate_subscripts(embedding, 1) - 1 AS dim,
        |         unnest(embedding) AS v
        |  FROM embeddings
        |), s AS (
        |  SELECT label, CAST(dim AS BIGINT) AS dim,
        |         CAST(count(*) AS BIGINT) AS n_vecs,
        |         CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1073741824.0) AS BIGINT)) AS BIGINT) AS s1,
        |         CAST(sum(CAST(floor(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) * 1073741824.0) AS BIGINT)) AS BIGINT) AS s2
        |  FROM x GROUP BY 1, 2
        |)
        |SELECT label, dim, n_vecs,
        |       CAST(s1 AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1073741824.0) AS centroid,
        |       CAST(s2 AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1073741824.0)
        |         - (CAST(s1 AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1073741824.0))
        |           * (CAST(s1 AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1073741824.0)) AS variance
        |FROM s
        |""".stripMargin.trim),
      (spark, dir) =>
        graft.operators.Similarity.labelCentroids(
          Tables.embeddings(spark, dir), "label", "embedding")
    ),
    Q(
      "q155_contrastive_triplets",
      "Contrastive (anchor, positive, hard-negative) triplet mining — " +
        "training data FOR the embedding model: candidates from the q83 " +
        "banded sign-bit LSH family mined at the negative floor (0.1), " +
        "symmetrized so each pair serves both endpoints as anchors; per " +
        "anchor the positive is the highest-sim candidate >= 0.4 and " +
        "the hard negative the highest-sim candidate below it (the " +
        "pairs that actually move a contrastive loss — random " +
        "negatives are trivially separable), ties broken on min id. " +
        "Anchors lacking either side drop. No cross product (bucket " +
        "self-join); the per-anchor argmax is a rank<=1 window with a " +
        "WindowGroupLimit partial limit ahead of its shuffle. Same " +
        "bounded subset as q83 so the oracle mirrors plane constants " +
        "and banding verbatim.",
      Some {
        val branches = (0 until DupTables).map { t =>
          val slice = dupPlanes.slice(t * DupBits, (t + 1) * DupBits)
          s"SELECT vec_id, $t AS tbl, ${duckBucketPlanes("embedding", slice)} AS bucket FROM e"
        }.mkString("\n  UNION ALL\n  ")
        val dotAB = duckDot.format("ea.embedding", "eb.embedding")
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
           |  FROM embeddings WHERE vec_id < 1000
           |), b AS (
           |  $branches
           |), cand AS (
           |  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
           |  FROM b a JOIN b c ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.vec_id < c.vec_id
           |), sims AS (
           |  SELECT cand.vec_a, cand.vec_b,
           |         $dotAB / (ea.norm * eb.norm) AS sim
           |  FROM cand JOIN e ea ON ea.vec_id = cand.vec_a
           |            JOIN e eb ON eb.vec_id = cand.vec_b
           |  WHERE $dotAB / (ea.norm * eb.norm) >= 0.1
           |), sym AS (
           |  SELECT vec_a AS anchor_id, vec_b AS cand_id, sim FROM sims
           |  UNION ALL
           |  SELECT vec_b AS anchor_id, vec_a AS cand_id, sim FROM sims
           |), pos AS (
           |  SELECT anchor_id, cand_id AS pos_id, sim AS pos_sim FROM sym
           |  WHERE sim >= 0.4
           |  QUALIFY ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY sim DESC, cand_id) = 1
           |), neg AS (
           |  SELECT anchor_id, cand_id AS neg_id, sim AS neg_sim FROM sym
           |  WHERE sim < 0.4
           |  QUALIFY ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY sim DESC, cand_id) = 1
           |)
           |SELECT pos.anchor_id, pos.pos_id, pos.pos_sim, neg.neg_id, neg.neg_sim
           |FROM pos JOIN neg ON pos.anchor_id = neg.anchor_id""".stripMargin
      },
      (spark, dir) =>
        Similarity.contrastiveTriplets(
          Tables.embeddings(spark, dir).filter(col("vec_id") < 1000),
          "vec_id", "embedding", posThreshold = 0.4, negLo = 0.1,
          tables = DupTables, bitsPerTable = DupBits, dim = Dim)
    ),
    Q(
      "q156_ivf_delta_probe",
      "IVF index with a DELTA segment — the production vector-store " +
        "segment model (base segment + fresh segment, compact " +
        "periodically): arrivals (vec_id = 4 mod 5, 20%) are assigned " +
        "to the FROZEN base centroids in one broadcast-quantizer pass " +
        "over the batch and written as their own cell-bucketed delta " +
        "segment; base postings untouched — per-ingest-batch index " +
        "maintenance at delta cost instead of a corpus-sized rebuild. " +
        "The probe reads base UNION delta (query side broadcast, " +
        "neither segment shuffles). Frozen-quantizer assignment is " +
        "deterministic and cell-local, so the probe EQUALS one against " +
        "an index rebuilt over the merged corpus with the same " +
        "centroids — which is what the oracle floods. Centroid drift " +
        "under arrivals moves recall-per-nprobe only (exact scoring of " +
        "probed cells), reset by the periodic re-train + compact.",
      Some(ivfOracleSqlCents("vec_id < 16 AND vec_id % 5 <> 4")),
      (spark, dir) => IvfPhases.segProbe(spark, dir)
    ),
    Q(
      "q158_two_stage_rerank",
      "Two-stage retrieval — the production serving shape for " +
        "compressed indexes: the whole corpus is scored on 4x-smaller " +
        "int8 codes (q122's exact-integer quantization; per-vector " +
        "scale cancels in cosine so the coarse pass is all-integer), " +
        "a per-query shortlist of 20 survives, and only those pairs " +
        "are re-scored at exact fp32 cosine for the final top-5. The " +
        "corpus-sized work is all in the coarse stage; the rerank is " +
        "queries x shortlist — corpus-size-independent — with the " +
        "shortlist and query sides broadcast, so the float table " +
        "streams in place. Rerank corrects the compression error " +
        "inside the shortlist (final ordering is exact), so recall@5 " +
        ">= the pure-int8 recall and approaches brute force as the " +
        "shortlist widens — the serving knob, tracked as a query.",
      Some {
        val code = "CASE WHEN scale = 0 THEN 0 WHEN x >= 0 THEN (x * 127) // scale ELSE -((-x * 127) // scale) END"
        val dotCQ = duckDot.format("ce.embedding", "qe.embedding")
        s"""WITH v AS (
           |  SELECT vec_id,
           |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1073741824.0) AS BIGINT)) AS iv
           |  FROM embeddings
           |), s AS (
           |  SELECT vec_id, iv,
           |         coalesce(list_max(list_transform(iv, x -> abs(x))), 0) AS scale
           |  FROM v
           |), n AS (
           |  SELECT vec_id, q,
           |         sqrt(CAST(list_sum(list_transform(list_zip(q, q), x -> x[1] * x[2])) AS DOUBLE)) AS nrm
           |  FROM (SELECT vec_id, list_transform(iv, x -> $code) AS q FROM s WHERE scale > 0)
           |), coarse AS (
           |  SELECT q_id, neighbor_id FROM (
           |    SELECT qq.vec_id AS q_id, c.vec_id AS neighbor_id,
           |           ROW_NUMBER() OVER (PARTITION BY qq.vec_id ORDER BY
           |             CAST(list_sum(list_transform(list_zip(c.q, qq.q), x -> x[1] * x[2])) AS DOUBLE)
           |               / (c.nrm * qq.nrm) DESC, c.vec_id) AS rn
           |    FROM n c JOIN n qq ON qq.vec_id < 8 AND c.vec_id != qq.vec_id)
           |  WHERE rn <= 20
           |), e AS (
           |  SELECT vec_id, embedding,
           |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
           |  FROM embeddings
           |), rescored AS (
           |  SELECT co.q_id, co.neighbor_id,
           |         $dotCQ / (ce.norm * qe.norm) AS sim
           |  FROM coarse co
           |  JOIN e ce ON ce.vec_id = co.neighbor_id
           |  JOIN e qe ON qe.vec_id = co.q_id
           |)
           |SELECT q_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
           |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rn
           |      FROM rescored)
           |WHERE rn <= 5""".stripMargin
      },
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        graft.operators.Quantize.twoStageTopK(
          e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, shortlist = 20)
      }
    ),
    Q(
      "q159_two_stage_recall",
      "Recall@5 of the two-stage (int8 coarse -> fp32 rerank, q158) " +
        "result against the brute-force truth — completing the tracked " +
        "recall family (q121 LSH, q131 int8, q141 IVF, q159 two-stage). " +
        "Reading q159 against q131 shows what the RERANK buys back of " +
        "the compression loss at the same k; the shortlist width is the " +
        "knob that closes the rest. Evaluation join is queries x k " +
        "rows — corpus-size-independent.",
      Some {
        val code = "CASE WHEN scale = 0 THEN 0 WHEN x >= 0 THEN (x * 127) // scale ELSE -((-x * 127) // scale) END"
        val dotCQ = duckDot.format("ce.embedding", "qe.embedding")
        s"""WITH v AS (
           |  SELECT vec_id,
           |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1073741824.0) AS BIGINT)) AS iv
           |  FROM embeddings
           |), s AS (
           |  SELECT vec_id, iv,
           |         coalesce(list_max(list_transform(iv, x -> abs(x))), 0) AS scale
           |  FROM v
           |), n AS (
           |  SELECT vec_id, q,
           |         sqrt(CAST(list_sum(list_transform(list_zip(q, q), x -> x[1] * x[2])) AS DOUBLE)) AS nrm
           |  FROM (SELECT vec_id, list_transform(iv, x -> $code) AS q FROM s WHERE scale > 0)
           |), coarse AS (
           |  SELECT q_id, neighbor_id FROM (
           |    SELECT qq.vec_id AS q_id, c.vec_id AS neighbor_id,
           |           ROW_NUMBER() OVER (PARTITION BY qq.vec_id ORDER BY
           |             CAST(list_sum(list_transform(list_zip(c.q, qq.q), x -> x[1] * x[2])) AS DOUBLE)
           |               / (c.nrm * qq.nrm) DESC, c.vec_id) AS rn
           |    FROM n c JOIN n qq ON qq.vec_id < 8 AND c.vec_id != qq.vec_id)
           |  WHERE rn <= 20
           |), e AS (
           |  SELECT vec_id, embedding,
           |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
           |  FROM embeddings
           |), rescored AS (
           |  SELECT co.q_id, co.neighbor_id,
           |         $dotCQ / (ce.norm * qe.norm) AS sim
           |  FROM coarse co
           |  JOIN e ce ON ce.vec_id = co.neighbor_id
           |  JOIN e qe ON qe.vec_id = co.q_id
           |), ap AS (
           |  SELECT q_id, neighbor_id
           |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rn
           |        FROM rescored)
           |  WHERE rn <= 5
           |), ex AS (
           |  SELECT q_id, neighbor_id FROM (
           |    $bruteForceSql
           |  )
           |)
           |SELECT ex.q_id,
           |       CAST(COUNT(*) AS BIGINT) AS n_exact,
           |       CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hit,
           |       CAST(COUNT(ap.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
           |FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.neighbor_id = ap.neighbor_id
           |GROUP BY ex.q_id""".stripMargin
      },
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        val q = e.filter(col("vec_id") < 8)
        Similarity.topKRecall(
          Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5),
          graft.operators.Quantize.twoStageTopK(
            e, q, "vec_id", "embedding", k = 5, shortlist = 20))
      }
    ),
    Q(
      "q195_random_projection",
      "Deterministic Rademacher random projection (the JL sketch): " +
        "each 64-float embedding onto 8 pseudo-random +-1 directions — " +
        "the dimensionality reduction upstream of LSH/clustering when " +
        "the native width is too wide to shuffle (256 bytes -> 64 per " +
        "row). Doubly deterministic: the sign matrix derives from the " +
        "portable md5 hash, and the arithmetic is the q117 floor-shift " +
        "device, so the sketch is exact BIGINT and the oracle renders " +
        "the identical +-chains from the same sign walk. The signs " +
        "bake into the expression as constants — each output dim is an " +
        "unrolled +-chain inside codegen: no HOF on the hot path, no " +
        "join, no shuffle; a 100 TB projection is a map pass at scan " +
        "bandwidth.",
      Some {
        val terms = graft.operators.RandomProjection
          .duckProjTerms("iv", inDim = 64, outDim = 8)
          .mkString(",\n       ")
        s"""WITH v AS (
           |  SELECT vec_id,
           |         list_transform(embedding,
           |           v -> CAST(floor(CAST(v AS DOUBLE) * ${graft.operators.RandomProjection.Shift}) AS BIGINT)) AS iv
           |  FROM embeddings
           |)
           |SELECT vec_id,
           |       $terms
           |FROM v""".stripMargin
      },
      (spark, dir) =>
        graft.operators.RandomProjection.project(
          Tables.embeddings(spark, dir), "vec_id", "embedding",
          inDim = 64, outDim = 8)
    ),
    Q(
      "q196_projection_two_stage",
      "Two-stage retrieval with the q195 JL projection as the coarse " +
        "representation — the 8x-smaller sibling of the int8 two-stage " +
        "(q158): the corpus is scored on 8-long integer projections " +
        "(exact integer dot, normalized by one correctly-rounded sqrt), " +
        "a 20-shortlist survives per query, and only those pairs " +
        "re-score at exact fp32 cosine through the SHARED rerank stage " +
        "(Similarity.rerankExactTopK — q158 now runs the identical " +
        "code). Projections down-shift by 2^15 before the dot so the " +
        "products stay inside exact Long; the oracle re-renders the " +
        "whole chain — sign walk, floor shifts, coarse window, rerank " +
        "— from the same constants. MEASURED VERDICT (r16 sweep, " +
        "sf0.1): at native width 64 this tier is DOMINATED by the " +
        "int8 two-stage on both axes (int8 recall 1.0 in 2.3 s; best " +
        "JL point outDim=32/shortlist=256 recall 0.775 in 8.8 s) — " +
        "the 64 x outDim sign-chain costs more than the full int8 dot " +
        "it was meant to shortcut, and JL distortion swamps the " +
        "corpus's neighbor margins. Retired as a production " +
        "recommendation at this width (PLANS.md r16); kept as the " +
        "correctness face of the JL primitive, whose payoff regime is " +
        "native widths far above 64.",
      Some(duckProjTwoStageSql),
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        graft.operators.RandomProjection.twoStageTopKProjected(
          e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, shortlist = 20, inDim = 64, outDim = 8)
      }
    ),
    Q(
      "q197_projection_recall",
      "Recall@5 of the projection two-stage (q196) against brute-force " +
        "cosine — the sixth tracked operating point in the recall " +
        "family (q121 LSH, q131 int8, q141 IVF, q159 int8 two-stage). " +
        "Reading q197 against q159 prices the representations: the " +
        "projection is 4x smaller than int8 codes (64 bytes vs 256 per " +
        "row at dim 64) and this row says what that compression costs " +
        "in shortlist recall at the same rerank budget. The r16 sweep " +
        "answered it: at this native width the compression buys " +
        "nothing — every (outDim, shortlist) point is dominated by " +
        "int8 on cost AND recall (see q196's verdict note) — so this " +
        "row now serves as the tier's retirement evidence, tracked so " +
        "a regression in the EVIDENCE (not the operating point) would " +
        "surface.",
      Some(
        s"""WITH ap AS (
           |  SELECT q_id, neighbor_id FROM (
           |${indentSql(duckProjTwoStageSql, "  ")}
           |  )
           |), ex AS (
           |  SELECT q_id, neighbor_id FROM (
           |    $bruteForceSql
           |  )
           |)
           |SELECT ex.q_id,
           |       CAST(COUNT(*) AS BIGINT) AS n_exact,
           |       CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hit,
           |       CAST(COUNT(ap.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
           |FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.neighbor_id = ap.neighbor_id
           |GROUP BY ex.q_id""".stripMargin),
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        val q = e.filter(col("vec_id") < 8)
        Similarity.topKRecall(
          Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5),
          graft.operators.RandomProjection.twoStageTopKProjected(
            e, q, "vec_id", "embedding",
            k = 5, shortlist = 20, inDim = 64, outDim = 8))
      }
    ),
    Q(
      "q208_semdedup",
      "SemDeDup (Abbas et al. 2023): semantic dedup in embedding space " +
        "— cluster the corpus into cells (q42's deterministic first-16 " +
        "quantizer over the int8 CODES), then inside each cell drop " +
        "every vector with a lower-id neighbor at cosine >= " +
        s"${graft.operators.SemDedup.TauNum}/${graft.operators.SemDedup.TauDen}" +
        " — the greedy one-keeper-per-ball policy under the id total " +
        "order. The dedup predicate is INTEGER-EXACT (d^2*dot^2 >= " +
        "n^2*|a|^2*|b|^2 on exact int8 codes — no sqrt/division at the " +
        "boundary); the quadratic risk is confined inside cells " +
        "(cell-equi self-join, never a corpus cross product), and a hot " +
        "cell is the AQE skew-join case. Production swaps in trained " +
        "centroids via centroidsOpt with the identical plan (q85's " +
        "pattern). Threshold sits at ~p99.2 of the fixture's in-cell " +
        "pair cosines: 62 of 500 vectors drop.",
      Some(semDedupSql),
      (spark, dir) =>
        graft.operators.SemDedup.screen(
          Tables.embeddings(spark, dir), "vec_id", "embedding")
    ),
    Q(
      "q210_d4_prototype_prune",
      "D4 prototype prune (Tirumala et al. 2023): the stage D4 chains " +
        "AFTER q208's SemDeDup — within each cell, rank the surviving " +
        "vectors by prototypicality (cosine to their own centroid DESC, " +
        "vec_id tie-break: the q42 argmax determinism argument) and " +
        "drop the most-prototypical " +
        s"${graft.operators.SemDedup.DropNum}/${graft.operators.SemDedup.DropDen}" +
        " of the cell at the INTEGER-EXACT boundary kept = " +
        "proto_rank*dropDen > n_cell*dropNum. Once exact tau-ball dups " +
        "are gone, the points most like their centroid carry the least " +
        "marginal information; what survives is each cell's diverse " +
        "shell. One cell-partitioned window on top of q208's plan — " +
        "rank and cell-count share the exchange; centroid vectors " +
        "themselves (csim = 1) prune first, the paper's intent. The " +
        "oracle renders from q208's own CTE prefix, so the two faces " +
        "cannot drift.",
      Some(d4PruneSql),
      (spark, dir) =>
        graft.operators.SemDedup.prototypePrune(
          Tables.embeddings(spark, dir), "vec_id", "embedding")
    ),
    Q(
      "q211_semdedup_index_probe",
      "Stored-index semantic-dedup probe — the incremental face of " +
        "q208 (the q198 stored-probe pattern in embedding space): the " +
        "even-id half of the corpus builds the persisted artifacts " +
        "(SemDedup.centroidTable + keptCodes, the survivors' int8 " +
        "codes), and the odd-id half arrives LATER and is probed " +
        "against them — cell-assigned with the SAME persisted " +
        "centroids, then counted against its cell's index members " +
        "under the identical integer-exact tau predicate. An arrival " +
        "drops if ANY indexed vector sits in its tau-ball (the index " +
        "is logically all-prior — no id order). Scale shape: arrivals " +
        "shuffle once on cell, the index is probed cell-equi, nothing " +
        "is quadratic in the corpus. The streaming twin " +
        "(EmbeddingStream.semDedupScreened) is spec-pinned equal row " +
        "for row; the oracle renders from the same code-chain/argmax " +
        "templates as q208/q210, so the family cannot drift.",
      Some(semDedupProbeSql),
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        val idxSide = e.filter(col("vec_id") % 2 === 0)
        val arrivals = e.filter(col("vec_id") % 2 === 1)
        val cents = graft.operators.SemDedup.centroidTable(
          idxSide, "vec_id", "embedding")
        val kept = graft.operators.SemDedup.keptCodes(
          idxSide, "vec_id", "embedding", centroidsOpt = Some(cents))
        graft.operators.SemDedup.probeIndex(
          arrivals, kept, cents, "vec_id", "embedding")
      }
    ),
    Q(
      "q212_semdedup_miss_audit",
      "Cell-confinement miss audit — the SemDeDup family's TRACKED " +
        "approximation-quality number (the q121/q189 discipline): " +
        "q208 only compares vectors inside a cell, so a tau-pair " +
        "straddling a cell boundary is invisible to the screen. Over " +
        s"the id-gated slice (vec_id < ${graft.operators.SemDedup.AuditMaxId}" +
        " — the exact face is all-pairs, so the gate is mandatory, the " +
        "cosineDupPairs maxId device), the exact broadcast all-pairs " +
        "tau graph vs its same-cell subset: one row of exact BIGINT " +
        "counts (n_pairs_exact / n_pairs_in_cell / n_missed) plus " +
        "their one double quotient. The isotropic fixture's miss rate " +
        "is HIGH by construction (random directions straddle cells); " +
        "on clustered corpora it is the paper's small number — " +
        "tracking it is what says when nlist/tau need recalibration.",
      Some(semDedupMissAuditSql),
      (spark, dir) =>
        graft.operators.SemDedup.cellMissAudit(
          Tables.embeddings(spark, dir), "vec_id", "embedding")
    ),
    Q(
      "q215_semdedup_clustered_miss",
      "q212's miss audit in SemDeDup's OPERATING regime (r16 verdict: " +
        "the isotropic fixture's 0.69 is high by construction — " +
        "boundary pairs dominate random directions — so the one number " +
        "meant to flag nlist/tau drift started at its ceiling). " +
        "SemDedup.plantClusters derives a clustered corpus from the " +
        "SAME fixture, no synthetic data: each gated row blends 7/8 " +
        "toward its anchor row (anchor = id % 16 — the first-16 rows, " +
        "which are also the default quantizer's centroids, so cells " +
        "align with planted clusters by construction) + 1/8 itself. " +
        "Exact binary blend weights make the fixture bit-reproducible " +
        "in DuckDB. In-cluster cosine ~0.98 >> tau, cross-cluster " +
        "~isotropic — the paper's small-miss regime, where the tracked " +
        "rate CAN regress: read this row beside q212 (same audit, " +
        "adversarial regime) for the family's approximation evidence.",
      Some(semDedupClusteredMissSql),
      (spark, dir) =>
        graft.operators.SemDedup.cellMissAudit(
          graft.operators.SemDedup.plantClusters(
            Tables.embeddings(spark, dir), "vec_id", "embedding"),
          "vec_id", "embedding")
    ),
    Q(
      "q216_semdedup_trained",
      "Trained-centroid SemDeDup face with an EXACT centroid-independent " +
        "oracle — the q85 device applied to the dedup family: " +
        "Similarity.trainedCentroids (seeded Spark ML k-means over the " +
        "int8 codes, the production quantizer) feeds screen via " +
        "centroidsOpt, with k = 1 — the exhaustive-cell geometry, where " +
        "every vector lands in the single trained cell and the screen " +
        "verdict is exactly the gated all-pairs lower-id tau dedup " +
        "WHATEVER the learned center is. That pins the whole trained " +
        "path (train -> centroid table -> broadcast argmax -> in-cell " +
        "tau evidence) end to end with an exact oracle; trained-vs-" +
        "default cell QUALITY at k > 1 is spec-pinned separately " +
        "(SemDedupSpec trained-centroid plumbing). Id-gated because one " +
        "cell is all-pairs — the audit-face geometry, not production " +
        "(nlist ~ sqrt(N)); the registry face q208 carries the " +
        "production plan shape.",
      Some(semDedupTrainedSql),
      (spark, dir) => {
        val gated = Tables.embeddings(spark, dir)
          .filter(col("vec_id") < graft.operators.SemDedup.AuditMaxId)
        val codes = graft.operators.Quantize.int8(gated, "vec_id", "embedding")
          .filter(col("scale") > 0)
          .select(col("vec_id"), col("qvec").cast("array<float>").as("q"))
        val cents = Similarity.trainedCentroids(
          codes, "vec_id", "q", nlist = 1, seed = 42L, maxIter = 5)
        graft.operators.SemDedup.screen(
          gated, "vec_id", "embedding", centroidsOpt = Some(cents))
      }
    ),
    Q(
      "q218_ann_mrr",
      "Reciprocal rank of the TRUE nearest neighbor inside the IVF " +
        "top-5 (nprobe=2) — the position-sensitive companion to the " +
        "recall family (recall@k credits position k like position 1; " +
        "this number moves when the index returns the right set in " +
        "the wrong order, the serving-quality failure a top-first " +
        "consumer actually feels; its mean over queries is MRR). Per " +
        "query: the exact rank-1 neighbor, its 1-indexed rank in the " +
        "approximate list (0 = missed), and the one double quotient " +
        "1/rank. Measured on the IVF probe — the index whose fixture " +
        "recall (q141, ~0.9) leaves the number ROOM TO MOVE both " +
        "ways; the LSH face is degenerate here (q121 recall 0 on " +
        "isotropic vectors — the q212-vs-q215 regime lesson). Both " +
        "sides are queries x k rows, so the evaluation join is " +
        "corpus-size-independent — free next to the searches.",
      Some(annMrrSql),
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        val qs = e.filter(col("vec_id") < 8)
        Similarity.nnReciprocalRank(
          Similarity.cosineTopK(e, qs, "vec_id", "embedding", k = 1),
          Similarity.cosineTopKIvf(
            e, qs, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 2))
      }
    ),
    Q(
      "q228_ivf_compacted_probe",
      "IVF segment COMPACTION — the closing step of the q156 delta " +
        "lifecycle, first-class: base ∪ delta is rewritten as ONE " +
        "cell-bucketed base segment (no re-assignment pass — both " +
        "segments were assigned by the same frozen centroids, so the " +
        "merge is a union rewrite, staged behind a rename swap), and " +
        "the delta resets to empty for the next ingest cycle. This " +
        "probe reads the compacted single segment with q156's query " +
        "slice and knobs; its oracle is q156's VERBATIM (flood the " +
        "merged corpus under the frozen base centroids), so the hash " +
        "match is the cross-engine proof that compaction changed the " +
        "index's layout and read amplification — one segment's file " +
        "count per cell, no delta-union scan — and nothing else. " +
        "IvfIndexSpec pins the same equality in-engine (probeSegments " +
        "before == probe after, and the reset delta is empty).",
      Some(ivfOracleSqlCents("vec_id < 16 AND vec_id % 5 <> 4")),
      (spark, dir) => IvfPhases.cmpProbe(spark, dir)
    )
  )

  /** The q122 int8-code chain over a filtered slice of `embeddings`,
    * as CTE text `${p}v/${p}s/${p}n` ending with (vec_id, q, nsq) —
    * the shared building block of every SemDeDup-family oracle.
    */
  private def semDedupCodeChainSql(
      p: String, where: String, from: String = "embeddings"): String = {
    val code = "CASE WHEN scale = 0 THEN 0 WHEN x >= 0 THEN (x * 127) // scale ELSE -((-x * 127) // scale) END"
    s"""${p}v AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1073741824.0) AS BIGINT)) AS iv
       |  FROM $from WHERE $where
       |), ${p}s AS (
       |  SELECT vec_id, iv,
       |         coalesce(list_max(list_transform(iv, x -> abs(x))), 0) AS scale
       |  FROM ${p}v
       |), ${p}n AS (
       |  SELECT vec_id, q,
       |         list_sum(list_transform(list_zip(q, q), x -> x[1] * x[2])) AS nsq
       |  FROM (SELECT vec_id, list_transform(iv, x -> $code) AS q FROM ${p}s WHERE scale > 0)
       |)""".stripMargin
  }

  /** q42's argmax cell assignment as CTE text: `$out` = (vec_id, q,
    * nsq, cell, csim) assigning every `$src` row to its best
    * `$centsName` cell (csim DESC, cell tie-break).
    */
  private def semDedupArgmaxSql(
      src: String, out: String, centsName: String = "cents"): String =
    s"""$out AS (
       |  SELECT vec_id, q, nsq, cell, csim FROM (
       |    SELECT n.vec_id, n.q, n.nsq, c.cell,
       |           CAST(list_sum(list_transform(list_zip(n.q, c.cq), x -> x[1] * x[2])) AS DOUBLE)
       |             / (sqrt(CAST(n.nsq AS DOUBLE)) * c.cnrm) AS csim,
       |           ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |             CAST(list_sum(list_transform(list_zip(n.q, c.cq), x -> x[1] * x[2])) AS DOUBLE)
       |               / (sqrt(CAST(n.nsq AS DOUBLE)) * c.cnrm) DESC, c.cell) AS cr
       |    FROM $src n, $centsName c) WHERE cr = 1
       |)""".stripMargin

  /** The q208 kept-set as a COMPOSABLE CTE fragment (no WITH keyword,
    * every CTE `sd`-prefixed so it nests into another query's WITH
    * chain without collisions): `sdkept` = the semantic-dedup
    * survivors' vec_ids. Rendered from the same templates as q208's
    * own oracle, so a consumer (q213's capstone) cannot drift from
    * the standalone face.
    */
  private[queries] lazy val semDedupKeptCteSql: String = {
    val n2 = graft.operators.SemDedup.TauNum.toLong * graft.operators.SemDedup.TauNum
    val d2 = graft.operators.SemDedup.TauDen.toLong * graft.operators.SemDedup.TauDen
    val nlist = graft.operators.SemDedup.Nlist
    s"""${semDedupCodeChainSql("sd", "TRUE")},
       |sdcents AS (
       |  SELECT vec_id AS cell, q AS cq, sqrt(CAST(nsq AS DOUBLE)) AS cnrm
       |  FROM sdn WHERE vec_id < $nlist
       |), ${semDedupArgmaxSql("sdn", "sdasg", "sdcents")},
       |sddup AS (
       |  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dup_lower FROM (
       |    SELECT b.vec_id,
       |           list_sum(list_transform(list_zip(a.q, b.q), x -> x[1] * x[2])) AS d,
       |           a.nsq AS na, b.nsq AS nb
       |    FROM sdasg a JOIN sdasg b ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |  WHERE d > 0 AND $d2 * d * d >= $n2 * na * nb
       |  GROUP BY 1
       |),
       |sdkept AS (
       |  SELECT sdasg.vec_id
       |  FROM sdasg LEFT JOIN sddup ON sddup.vec_id = sdasg.vec_id
       |  WHERE coalesce(sddup.n_dup_lower, 0) = 0
       |)""".stripMargin
  }

  /** The SemDeDup CTE prefix shared by q208/q210/q211: the code chain,
    * the first-nlist centroid table, the argmax assignment (keeping
    * csim), then the integer-exact in-cell lower-id tau evidence —
    * every constant interpolated from [[graft.operators.SemDedup]].
    * `where` filters the corpus slice the screen runs over.
    */
  private def semDedupPrefixFor(where: String): String = {
    val n2 = graft.operators.SemDedup.TauNum.toLong * graft.operators.SemDedup.TauNum
    val d2 = graft.operators.SemDedup.TauDen.toLong * graft.operators.SemDedup.TauDen
    val nlist = graft.operators.SemDedup.Nlist
    s"""WITH ${semDedupCodeChainSql("", where)},
       |cents AS (
       |  SELECT vec_id AS cell, q AS cq, sqrt(CAST(nsq AS DOUBLE)) AS cnrm
       |  FROM n WHERE vec_id < $nlist
       |), ${semDedupArgmaxSql("n", "asg")},
       |dup AS (
       |  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dup_lower FROM (
       |    SELECT b.vec_id,
       |           list_sum(list_transform(list_zip(a.q, b.q), x -> x[1] * x[2])) AS d,
       |           a.nsq AS na, b.nsq AS nb
       |    FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |  WHERE d > 0 AND $d2 * d * d >= $n2 * na * nb
       |  GROUP BY 1
       |)""".stripMargin
  }

  private lazy val semDedupPrefixSql: String = semDedupPrefixFor("TRUE")

  /** q208's oracle: the shared prefix plus the evidence-join verdict. */
  private lazy val semDedupSql: String =
    s"""$semDedupPrefixSql
       |SELECT asg.vec_id, asg.cell,
       |       coalesce(dup.n_dup_lower, 0) AS n_dup_lower,
       |       coalesce(dup.n_dup_lower, 0) = 0 AS kept
       |FROM asg LEFT JOIN dup ON dup.vec_id = asg.vec_id""".stripMargin

  /** q210's oracle: the shared prefix, survivors only, the in-cell
    * prototypicality rank and the integer drop boundary.
    */
  private lazy val d4PruneSql: String = {
    val dn = graft.operators.SemDedup.DropNum
    val dd = graft.operators.SemDedup.DropDen
    s"""$semDedupPrefixSql,
       |surv AS (
       |  SELECT asg.vec_id, asg.cell, asg.csim
       |  FROM asg LEFT JOIN dup ON dup.vec_id = asg.vec_id
       |  WHERE coalesce(dup.n_dup_lower, 0) = 0
       |)
       |SELECT vec_id, cell, proto_rank, n_cell,
       |       proto_rank * $dd > n_cell * $dn AS kept
       |FROM (
       |  SELECT vec_id, cell,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY cell ORDER BY csim DESC, vec_id) AS BIGINT) AS proto_rank,
       |         CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n_cell
       |  FROM surv)""".stripMargin
  }

  /** q211's oracle: the q208 prefix over the even-id index half (its
    * survivors are the stored index), the arrival code chain + argmax
    * over the odd-id half against the SAME centroid table, then the
    * all-prior tau hit count.
    */
  private lazy val semDedupProbeSql: String = {
    val n2 = graft.operators.SemDedup.TauNum.toLong * graft.operators.SemDedup.TauNum
    val d2 = graft.operators.SemDedup.TauDen.toLong * graft.operators.SemDedup.TauDen
    s"""${semDedupPrefixFor("vec_id % 2 = 0")},
       |kept AS (
       |  SELECT asg.vec_id, asg.q, asg.nsq, asg.cell
       |  FROM asg LEFT JOIN dup ON dup.vec_id = asg.vec_id
       |  WHERE coalesce(dup.n_dup_lower, 0) = 0
       |),
       |${semDedupCodeChainSql("ar", "vec_id % 2 = 1")},
       |${semDedupArgmaxSql("arn", "aasg")},
       |hits AS (
       |  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dup_index FROM (
       |    SELECT a.vec_id,
       |           list_sum(list_transform(list_zip(k.q, a.q), x -> x[1] * x[2])) AS d,
       |           k.nsq AS ni, a.nsq AS nb
       |    FROM aasg a JOIN kept k ON a.cell = k.cell)
       |  WHERE d > 0 AND $d2 * d * d >= $n2 * ni * nb
       |  GROUP BY 1
       |)
       |SELECT aasg.vec_id, aasg.cell,
       |       coalesce(hits.n_dup_index, 0) AS n_dup_index,
       |       coalesce(hits.n_dup_index, 0) = 0 AS kept
       |FROM aasg LEFT JOIN hits ON hits.vec_id = aasg.vec_id""".stripMargin
  }

  /** q212's oracle: the gated code chain + argmax, then the exact
    * all-pairs tau graph against its same-cell subset.
    */
  private lazy val semDedupMissAuditSql: String = {
    val n2 = graft.operators.SemDedup.TauNum.toLong * graft.operators.SemDedup.TauNum
    val d2 = graft.operators.SemDedup.TauDen.toLong * graft.operators.SemDedup.TauDen
    val nlist = graft.operators.SemDedup.Nlist
    val maxId = graft.operators.SemDedup.AuditMaxId
    val inCell = "coalesce(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END), 0)"
    s"""WITH ${semDedupCodeChainSql("", s"vec_id < $maxId")},
       |cents AS (
       |  SELECT vec_id AS cell, q AS cq, sqrt(CAST(nsq AS DOUBLE)) AS cnrm
       |  FROM n WHERE vec_id < $nlist
       |), ${semDedupArgmaxSql("n", "asg")},
       |tp AS (
       |  SELECT ca, cb FROM (
       |    SELECT a.cell AS ca, b.cell AS cb,
       |           list_sum(list_transform(list_zip(a.q, b.q), x -> x[1] * x[2])) AS d,
       |           a.nsq AS na, b.nsq AS nb
       |    FROM asg a JOIN asg b ON a.vec_id < b.vec_id)
       |  WHERE d > 0 AND $d2 * d * d >= $n2 * na * nb
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs_exact,
       |       CAST($inCell AS BIGINT) AS n_pairs_in_cell,
       |       CAST(count(*) - $inCell AS BIGINT) AS n_missed,
       |       CASE WHEN count(*) = 0 THEN 0.0
       |            ELSE CAST(count(*) - $inCell AS DOUBLE) / count(*)
       |       END AS miss_rate
       |FROM tp""".stripMargin
  }

  /** q215's oracle: re-derive the planted-cluster fixture (exact
    * binary blend weights — see [[graft.operators.SemDedup.plantClusters]])
    * as a CTE, then q212's audit body verbatim over it.
    */
  private lazy val semDedupClusteredMissSql: String = {
    val n2 = graft.operators.SemDedup.TauNum.toLong * graft.operators.SemDedup.TauNum
    val d2 = graft.operators.SemDedup.TauDen.toLong * graft.operators.SemDedup.TauDen
    val nlist = graft.operators.SemDedup.Nlist
    val maxId = graft.operators.SemDedup.AuditMaxId
    val wa = graft.operators.SemDedup.BlendAnchorNum.toDouble /
      graft.operators.SemDedup.BlendDen
    val ws = 1.0 - wa
    val inCell = "coalesce(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END), 0)"
    s"""WITH pc AS (
       |  SELECT e.vec_id,
       |         list_transform(list_zip(a.embedding, e.embedding),
       |           x -> $wa * CAST(x[1] AS DOUBLE) + $ws * CAST(x[2] AS DOUBLE)) AS embedding
       |  FROM embeddings e JOIN embeddings a ON a.vec_id = e.vec_id % $nlist
       |  WHERE e.vec_id < $maxId
       |), ${semDedupCodeChainSql("", "TRUE", "pc")},
       |cents AS (
       |  SELECT vec_id AS cell, q AS cq, sqrt(CAST(nsq AS DOUBLE)) AS cnrm
       |  FROM n WHERE vec_id < $nlist
       |), ${semDedupArgmaxSql("n", "asg")},
       |tp AS (
       |  SELECT ca, cb FROM (
       |    SELECT a.cell AS ca, b.cell AS cb,
       |           list_sum(list_transform(list_zip(a.q, b.q), x -> x[1] * x[2])) AS d,
       |           a.nsq AS na, b.nsq AS nb
       |    FROM asg a JOIN asg b ON a.vec_id < b.vec_id)
       |  WHERE d > 0 AND $d2 * d * d >= $n2 * na * nb
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs_exact,
       |       CAST($inCell AS BIGINT) AS n_pairs_in_cell,
       |       CAST(count(*) - $inCell AS BIGINT) AS n_missed,
       |       CASE WHEN count(*) = 0 THEN 0.0
       |            ELSE CAST(count(*) - $inCell AS DOUBLE) / count(*)
       |       END AS miss_rate
       |FROM tp""".stripMargin
  }

  /** q216's oracle: the gated code chain, then the all-pairs lower-id
    * tau verdict with the single trained cell as a constant — exactly
    * what `screen` computes when k = 1, whatever center k-means learns.
    */
  private lazy val semDedupTrainedSql: String = {
    val n2 = graft.operators.SemDedup.TauNum.toLong * graft.operators.SemDedup.TauNum
    val d2 = graft.operators.SemDedup.TauDen.toLong * graft.operators.SemDedup.TauDen
    val maxId = graft.operators.SemDedup.AuditMaxId
    s"""WITH ${semDedupCodeChainSql("", s"vec_id < $maxId")},
       |dup AS (
       |  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dup_lower FROM (
       |    SELECT b.vec_id,
       |           list_sum(list_transform(list_zip(a.q, b.q), x -> x[1] * x[2])) AS d,
       |           a.nsq AS na, b.nsq AS nb
       |    FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |  WHERE d > 0 AND $d2 * d * d >= $n2 * na * nb
       |  GROUP BY 1
       |)
       |SELECT n.vec_id, CAST(0 AS BIGINT) AS cell,
       |       coalesce(dup.n_dup_lower, 0) AS n_dup_lower,
       |       coalesce(dup.n_dup_lower, 0) = 0 AS kept
       |FROM n LEFT JOIN dup ON dup.vec_id = n.vec_id""".stripMargin
  }

  /** q218's oracle: brute rank-1 truth (the q40 template) and the IVF
    * top-5 (q42's own oracle text, verbatim as a subquery), left-joined
    * on the true neighbor.
    */
  private lazy val annMrrSql: String =
    s"""WITH apr AS (
       |  SELECT q_id, neighbor_id, CAST(rank AS BIGINT) AS rn FROM (
       |${indentSql(ivfOracleSql, "  ")}
       |  )
       |), exr AS (
       |  SELECT q_id, neighbor_id FROM (
       |    $bruteForceSql
       |  ) WHERE rank = 1
       |)
       |SELECT exr.q_id, exr.neighbor_id AS nn_id,
       |       CAST(COALESCE(apr.rn, 0) AS BIGINT) AS rank_approx,
       |       CASE WHEN apr.rn IS NULL THEN 0.0
       |            ELSE CAST(1.0 AS DOUBLE) / apr.rn END AS rr
       |FROM exr LEFT JOIN apr
       |  ON apr.q_id = exr.q_id AND apr.neighbor_id = exr.neighbor_id""".stripMargin

  private def indentSql(sql: String, pad: String): String =
    sql.linesIterator.map(l => pad + l).mkString("\n")

  /** q196's oracle body (a def rendered from RandomProjection's own
    * sign walk and constants; q197 re-embeds it, so the pair cannot
    * drift). Mirrors the operator stage for stage: integer projection,
    * 2^15 floor down-shift, normalized coarse window (zero-norm rows
    * excluded — NaN ordering is not cross-engine contractual), exact
    * fp32 rerank.
    */
  private def duckProjTwoStageSql: String = {
    import graft.operators.RandomProjection
    val outDim = 8
    val projTerms = RandomProjection.duckProjTerms("iv", 64, outDim)
      .mkString(",\n       ")
    val shiftTerms = (0 until outDim)
      .map(k => s"p$k // ${RandomProjection.CoarseShift} AS s$k")
      .mkString(", ")
    val sq = (0 until outDim).map(k => s"s$k * s$k").mkString(" + ")
    val dotCS = (0 until outDim).map(k => s"c.s$k * qq.s$k").mkString(" + ")
    val sCols = (0 until outDim).map(k => s"s$k").mkString(", ")
    val dotCQ = duckDot.format("ce.embedding", "qe.embedding")
    s"""WITH v AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           v -> CAST(floor(CAST(v AS DOUBLE) * ${RandomProjection.Shift}) AS BIGINT)) AS iv
       |  FROM embeddings
       |), pr AS (
       |  SELECT vec_id,
       |       $projTerms
       |  FROM v
       |), ps AS (
       |  SELECT vec_id, $shiftTerms FROM pr
       |), nn AS (
       |  SELECT vec_id, $sCols, sqrt(CAST($sq AS DOUBLE)) AS nrm
       |  FROM ps
       |), coarse AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT qq.vec_id AS q_id, c.vec_id AS neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY qq.vec_id ORDER BY
       |             CASE WHEN c.nrm * qq.nrm > 0
       |                  THEN CAST($dotCS AS DOUBLE) / (c.nrm * qq.nrm)
       |                  ELSE -2.0 END DESC, c.vec_id) AS rn
       |    FROM nn c JOIN nn qq ON qq.vec_id < 8 AND c.vec_id != qq.vec_id)
       |  WHERE rn <= 20
       |), e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
       |  FROM embeddings
       |), rescored AS (
       |  SELECT co.q_id, co.neighbor_id,
       |         $dotCQ / (ce.norm * qe.norm) AS sim
       |  FROM coarse co
       |  JOIN e ce ON ce.vec_id = co.neighbor_id
       |  JOIN e qe ON qe.vec_id = co.q_id
       |)
       |SELECT q_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rn
       |      FROM rescored)
       |WHERE rn <= 5""".stripMargin
  }
}

/** Build/probe phase functions behind q79/q85 — shared by the registry
  * entries (which run both phases, so Verify checks the whole path) and
  * by the bench's phase split (the q64 precedent): index build / k-means
  * training is the one-shot ingest-time cost, the probe is what a repeat
  * query pays.
  */
object IvfPhases {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  private def prefix(dir: String) = s"graft_ivf_${Q.scratchTag(dir)}"

  /** One-shot: centroid table + cell-bucketed corpus table (idempotent). */
  def indexBuild(spark: SparkSession, dir: String): Unit =
    graft.operators.IvfIndex.build(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      nlist = 16, prefix = prefix(dir))

  /** Probe against the persisted layout; corpus never reshuffles. */
  def indexProbe(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    graft.operators.IvfIndex.probe(
      spark, e.filter(col("vec_id") < 8), "vec_id", "embedding",
      k = 5, nprobe = 2, prefix = prefix(dir))
  }

  // Trained centroids per input dir: k-means .fit() is eager, so the
  // train phase really pays the training cost; the probe phase reuses
  // the tiny centroid table exactly as a serving system would.
  private val cents = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** One-shot: seeded k-means. maxIter 10: at the oracle's corpus size
    * k-means cost is pure per-iteration scheduling overhead, and the
    * result is exact at ANY centroid quality (exhaustive probe) — keep
    * the bench honest about training cost without paying double for
    * nothing.
    */
  def train(spark: SparkSession, dir: String): Unit =
    cents.put(dir, graft.operators.Similarity.trainedCentroids(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      nlist = 8, seed = 42L, maxIter = 10))

  /** Exhaustive probe (nprobe = nlist) with the trained quantizer;
    * trains on demand if [[train]] has not run for this dir.
    */
  def trainedProbe(spark: SparkSession, dir: String): DataFrame = {
    if (!cents.containsKey(dir)) train(spark, dir)
    val e = Tables.embeddings(spark, dir)
    graft.operators.Similarity.cosineTopKIvf(
      e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 8, centroidsOpt = Some(cents.get(dir)))
  }

  // ---- q156 delta-segment family (own prefix: the base segment is the
  // vec_id % 5 != 4 slice, NOT q79's full-corpus index) ----

  private def segPrefix(dir: String) = s"graft_ivfseg_${Q.scratchTag(dir)}"
  private val segBuilt = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Arrival batch for the delta segment: vec_id ≡ 4 (mod 5) — 20 % of
    * the corpus at every sf; base = the other 80 %.
    */
  def segArrivals(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") % 5 === 4)

  /** One-shot: base IVF index over the existing (non-arrival) slice. */
  def segBaseBuild(spark: SparkSession, dir: String): Unit = {
    graft.operators.IvfIndex.build(
      Tables.embeddings(spark, dir).filter(col("vec_id") % 5 =!= 4),
      "vec_id", "embedding", nlist = 16, prefix = segPrefix(dir))
    segBuilt.add(segPrefix(dir))
  }

  /** Per-ingest-batch: fold the arrivals into a delta segment against the
    * FROZEN base centroids (the cost a vector store pays per batch — one
    * broadcast-quantizer pass over the batch, base postings untouched).
    */
  def segDeltaAppend(spark: SparkSession, dir: String): Unit = {
    if (!segBuilt.contains(segPrefix(dir))) segBaseBuild(spark, dir)
    graft.operators.IvfIndex.appendDelta(
      segArrivals(spark, dir), "vec_id", "embedding", prefix = segPrefix(dir))
    segBuilt.add(graft.operators.IvfIndex.deltaTable(segPrefix(dir)))
  }

  def ensureSegments(spark: SparkSession, dir: String): Unit =
    if (!segBuilt.contains(graft.operators.IvfIndex.deltaTable(segPrefix(dir))))
      segDeltaAppend(spark, dir)

  /** Probe base ∪ delta — identical semantics to a merged-corpus rebuild
    * with the same centroids (q156's oracle floods exactly that).
    */
  def segProbe(spark: SparkSession, dir: String): DataFrame = {
    ensureSegments(spark, dir)
    graft.operators.IvfIndex.probeSegments(
      spark, Tables.embeddings(spark, dir).filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 5, nprobe = 2, prefix = segPrefix(dir))
  }

  // ---- q228 compaction family (own prefix: compaction RESETS the
  // delta, so it cannot share q156's live base ∪ delta segments — q156
  // measures the probe WITH a delta, q228 the probe after the merge) ----

  private def cmpPrefix(dir: String) = s"graft_ivfcmp_${Q.scratchTag(dir)}"
  private val cmpDone = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One-shot: the q156 segment lifecycle carried to its closing step —
    * base build over the non-arrival slice, delta fold of the arrivals,
    * then [[graft.operators.IvfIndex.compact]]. Afterwards the live
    * index is ONE segment whose contents equal the merged corpus under
    * the frozen base centroids.
    */
  def ensureCompacted(spark: SparkSession, dir: String): Unit =
    if (!cmpDone.contains(cmpPrefix(dir))) {
      graft.operators.IvfIndex.build(
        Tables.embeddings(spark, dir).filter(col("vec_id") % 5 =!= 4),
        "vec_id", "embedding", nlist = 16, prefix = cmpPrefix(dir))
      graft.operators.IvfIndex.appendDelta(
        segArrivals(spark, dir), "vec_id", "embedding", prefix = cmpPrefix(dir))
      graft.operators.IvfIndex.compact(spark, prefix = cmpPrefix(dir))
      cmpDone.add(cmpPrefix(dir))
    }

  /** Probe the COMPACTED base — a plain single-segment [[probe]], no
    * delta union — with q156's query slice and knobs, so the result
    * (and the oracle) match q156's row for row by the frozen-quantizer
    * argument compact's scaladoc states.
    */
  def cmpProbe(spark: SparkSession, dir: String): DataFrame = {
    ensureCompacted(spark, dir)
    graft.operators.IvfIndex.probe(
      spark, Tables.embeddings(spark, dir).filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 5, nprobe = 2, prefix = cmpPrefix(dir))
  }
}
