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

  /** q87's oracle, shared verbatim by q92: the sharded two-phase form is
    * EXACT (equality property-tested in SamplingSpec), so the same SQL
    * oracles both the didactic one-window path and the production path.
    */
  private val tokenBudgetSql: String = """
    |WITH t AS (
    |  SELECT doc_id, source,
    |         CAST(LENGTH(text) AS DOUBLE) AS chars,
    |         CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS toks,
    |         len(regexp_extract_all(text, '[.!?,;:]')) AS punct,
    |         len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b')) AS stops
    |  FROM documents
    |), s AS (
    |  SELECT doc_id, source,
    |         ((CASE WHEN chars / greatest(toks, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
    |          + (CASE WHEN CAST(punct AS DOUBLE) / greatest(toks, 1.0) <= 0.3 THEN 1.0 ELSE 0.0 END)
    |          + (CASE WHEN CAST(stops AS DOUBLE) / greatest(toks, 1.0) >= 0.05 THEN 1.0 ELSE 0.0 END)
    |          + (CASE WHEN chars BETWEEN 50.0 AND 100000.0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality,
    |         CAST(toks AS BIGINT) AS ws_tokens
    |  FROM t
    |)
    |SELECT doc_id, source, quality, ws_tokens, cum_tokens FROM (
    |  SELECT *, CAST(SUM(ws_tokens) OVER (
    |    PARTITION BY source ORDER BY quality DESC, doc_id
    |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
    |  FROM s)
    |WHERE cum_tokens <= 800
    |""".stripMargin.trim

  // q124/q125 mixture-epoch constants — one source of truth for the Spark
  // plans and the oracle text below.
  private val EpochWeights = Map("src3" -> 3L, "src7" -> 2L, "src11" -> 0L)
  private val EpochBudget = 40000L
  private val EpochMaxEpochs = 4L

  private def duckEpochWeightCase: String =
    "CAST(CASE source " +
      EpochWeights.toSeq.sortBy(_._1)
        .map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ") +
      " ELSE 1 END AS BIGINT)"

  /** Shared plan CTE chain for q124/q125/q136: per-source token totals,
    * the broadcastable weight total, integer targets and capped epochs —
    * mirror of [[Sampling.mixtureEpochPlan]] constant for constant.
    * `dBody` supplies the (source, doc_id, toks) input relation;
    * `budget` the token budget.
    */
  private def duckEpochPlanCtes: String =
    duckEpochCtesFrom(
      """  SELECT source, doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks
        |  FROM documents""".stripMargin,
      EpochBudget)

  /** Shared q151/q153 CTE chain: temperature ppm weights (w ~ sqrt(p),
    * the q147 fixed point) derived in-plan, then folded through q124's
    * integer epoch arithmetic — mirror of
    * [[Sampling.temperatureWeightsSqrt]] into
    * [[Sampling.mixtureEpochPlanWeighted]] constant for constant.
    */
  private def duckWeightedPlanCtes: String =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS toks
       |  FROM documents
       |), t AS (
       |  SELECT source, CAST(SUM(toks) AS BIGINT) AS tokens FROM d GROUP BY 1
       |), tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt FROM t),
       |s AS (
       |  SELECT source, tokens,
       |         CAST(floor(sqrt(CAST(tokens AS DOUBLE) / CAST(tt AS DOUBLE))
       |                    * 1000000000000) AS BIGINT) AS sc
       |  FROM t, tot
       |), stot AS (SELECT CAST(SUM(sc) AS BIGINT) AS st FROM s),
       |wt AS (
       |  SELECT source, (1000000 * sc) // st AS weight FROM s, stot
       |), per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(toks) AS BIGINT) AS tokens_src,
       |         MAX(doc_id) AS max_id
       |  FROM d GROUP BY source
       |), perw AS (
       |  SELECT per.*, CAST(COALESCE(wt.weight, 0) AS BIGINT) AS weight
       |  FROM per LEFT JOIN wt ON wt.source = per.source
       |), wtot AS (SELECT CAST(SUM(weight) AS BIGINT) AS w_total FROM perw),
       |plan0 AS (
       |  SELECT perw.*, ($EpochBudget * weight) // w_total AS target_tokens
       |  FROM perw, wtot
       |), plan AS (
       |  SELECT *, CAST(LEAST($EpochMaxEpochs,
       |           CASE WHEN target_tokens > 0 AND tokens_src > 0
       |                THEN (target_tokens + tokens_src - 1) // tokens_src
       |                ELSE 0 END) AS BIGINT) AS epochs
       |  FROM plan0
       |)""".stripMargin

  private def duckEpochCtesFrom(dBody: String, budget: Long): String =
    s"""WITH d AS (
       |$dBody
       |), per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(toks) AS BIGINT) AS tokens_src,
       |         MAX(doc_id) AS max_id,
       |         $duckEpochWeightCase AS weight
       |  FROM d GROUP BY source
       |), tot AS (
       |  SELECT CAST(SUM(weight) AS BIGINT) AS w_total FROM per
       |), plan0 AS (
       |  SELECT per.*, ($budget * weight) // w_total AS target_tokens
       |  FROM per, tot
       |), plan AS (
       |  SELECT *, CAST(LEAST($EpochMaxEpochs,
       |           CASE WHEN target_tokens > 0 AND tokens_src > 0
       |                THEN (target_tokens + tokens_src - 1) // tokens_src
       |                ELSE 0 END) AS BIGINT) AS epochs
       |  FROM plan0
       |)""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "q130_global_shuffle",
      "Seeded deterministic global training-order shuffle: every doc " +
        "ranks by the portable hash of (salt, id) — reproducible across " +
        "runs, engines, and partitionings, the property RNG shuffles " +
        "lack — and the rank is the DISTRIBUTED row_number of " +
        "ShardedPrefix.globalRank run with ONE corpus-wide group: the " +
        "single-group case is exactly where the two-phase prefix rank " +
        "earns its keep (a plain row_number window would drag the whole " +
        "corpus through one task). Order key = hash * 2^30 + id " +
        "(unique; ids < 2^30 by the documents contract).",
      Some("""
        |SELECT doc_id,
        |       CAST(ROW_NUMBER() OVER (ORDER BY
        |         CAST('0x' || substr(md5('shuffle42:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |           * 1073741824 + doc_id
        |       ) AS BIGINT) AS shuffle_rank
        |FROM documents
        |""".stripMargin.trim),
      (spark, dir) => {
        import graft.operators.{ShardedPrefix, TextAnalysis}
        val keyed = Tables.documents(spark, dir).select(
            col("doc_id"),
            TextAnalysis.portableHash32(
              concat(lit("shuffle42:"), col("doc_id").cast("string"))).as("__hk"))
          .withColumn("__g", lit(0))
          .withColumn("__okey", col("__hk") * lit(1073741824L) + col("doc_id"))
        ShardedPrefix.globalRank(keyed, "__g", "__okey", "shuffle_rank")
          .select("doc_id", "shuffle_rank")
      }
    ),
    Q(
      "q124_mixture_epoch_plan",
      "Mixture-epoch planning: integer mixture weights + a 40k-token " +
        "budget -> per-source token targets and repeat factors (epochs, " +
        "capped at 4 — the repeat-degradation knob), the arithmetic " +
        "behind oversampling small high-quality sources in a " +
        "pre-training mix. All integer (targets are budget*w div W with " +
        "W summed over sources PRESENT in the data, on a broadcast " +
        "1-row frame); output is sources-sized at any corpus scale. A " +
        "zero weight (src11) excludes a source outright.",
      Some(
        s"""$duckEpochPlanCtes
           |SELECT source, n_docs, tokens_src, max_id, weight, target_tokens,
           |       epochs,
           |       LEAST(target_tokens, epochs * tokens_src) AS planned_tokens
           |FROM plan""".stripMargin),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        Sampling.mixtureEpochPlan(
          Tables.documents(spark, dir), "source", "doc_id",
          TextAnalysis.tokenCount(col("text")), EpochWeights,
          budget = EpochBudget, maxEpochs = EpochMaxEpochs)
      }
    ),
    Q(
      "q125_mixture_epoch_stream",
      "The materialized epoch mixture: each source repeated epoch-major " +
        "(pass 1 streams completely before pass 2) and cut exactly at " +
        "its token target. The repeat is a narrow sequence-explode " +
        "against the broadcast plan — the corpus is scanned ONCE, never " +
        "self-joined — and the per-source running cut is the two-phase " +
        "sharded prefix sum (q90/q92 primitive), so no source " +
        "serializes through one window task.",
      Some(
        s"""$duckEpochPlanCtes, ex AS (
           |  SELECT d.source, d.doc_id, d.toks, CAST(u.e AS BIGINT) AS epoch,
           |         p.target_tokens
           |  FROM d, plan p, UNNEST(range(1, p.epochs + 1)) AS u(e)
           |  WHERE d.source = p.source
           |), c AS (
           |  SELECT source, doc_id, epoch, toks,
           |         CAST(SUM(toks) OVER (
           |           PARTITION BY source ORDER BY epoch, doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
           |         target_tokens
           |  FROM ex
           |)
           |SELECT source, doc_id, epoch, toks AS tokens, cum_tokens
           |FROM c WHERE cum_tokens <= target_tokens""".stripMargin),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        Sampling.mixtureEpochMaterialize(
          Tables.documents(spark, dir), "source", "doc_id",
          TextAnalysis.tokenCount(col("text")), EpochWeights,
          budget = EpochBudget, maxEpochs = EpochMaxEpochs)
      }
    ),
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
    ),
    Q(
      "q91_mixture_interleave",
      "Mixture scheduling (stride interleaving): every doc gets an " +
        "interleave_key so ascending-key order visits languages in " +
        "weight proportion (en 3x, zh 2x, others 1x) — the step that " +
        "turns per-source pools into one training order. The key is " +
        "emitted, not globally ranked (a global row_number would be a " +
        "single-partition window); consumers range-partition by it. " +
        "The per-stratum rank itself is the DISTRIBUTED row_number " +
        "(ShardedPrefix.globalRank: per-shard ranks + broadcast shard " +
        "counts), so no stratum ever serializes through one task.",
      Some("""
        |SELECT doc_id, lang,
        |       (CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS DOUBLE) - 0.5)
        |         / (CASE WHEN lang = 'en' THEN 3.0 WHEN lang = 'zh' THEN 2.0 ELSE 1.0 END)
        |         AS interleave_key
        |FROM documents
        |""".stripMargin.trim),
      (spark, dir) =>
        Sampling.mixtureInterleaveSharded(
          Tables.documents(spark, dir).select("doc_id", "lang"),
          strataCol = col("lang"),
          idCol = col("doc_id"),
          weights = Map("en" -> 3.0, "zh" -> 2.0),
          defaultWeight = 1.0)
          .select("doc_id", "lang", "interleave_key")
    ),
    Q(
      "q90_sequence_pack",
      "Sequence packing: documents laid out into 512-token training bins " +
        "per source (greedy contiguous — bin = running-total start div " +
        "capacity, offset gives the exact split point for straddlers). " +
        "The running total is a TWO-PHASE distributed prefix sum " +
        "(ShardedPrefix: order-contiguous shards + broadcast offsets), " +
        "so a 30 TB source never serializes through one window task; " +
        "layout identical under any partitioning.",
      Some("""
        |WITH s AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS seq_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, seq_tokens,
        |         CAST(SUM(seq_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           - seq_tokens AS pack_start
        |  FROM s
        |)
        |SELECT doc_id, source, seq_tokens,
        |       pack_start // 512 AS bin_id,
        |       pack_start % 512 AS bin_offset
        |FROM c
        |""".stripMargin.trim),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        val docs = Tables.documents(spark, dir).select(
          col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("toks"))
        graft.operators.Packing.contiguousPackSharded(
            docs, "source", "doc_id", "toks", capacity = 512L)
          .select("doc_id", "source", "seq_tokens", "bin_id", "bin_offset")
      }
    ),
    Q(
      "q89_weighted_sample",
      "Deterministic weighted sampling without replacement (Efraimidis-" +
        "Spirakis): 5 docs per language, selection probability " +
        "proportional to quality + 0.25, the draw u hash-derived so the " +
        "sample reproduces across runs/engines/partitionings. The float " +
        "competition key is ordering-only and never output; rank is via " +
        "WindowGroupLimit (streaming top-k, no full sort retention).",
      Some("""
        |WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(LENGTH(text) AS DOUBLE) AS chars,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS toks,
        |         len(regexp_extract_all(text, '[.!?,;:]')) AS punct,
        |         len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b')) AS stops
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang,
        |         ((CASE WHEN chars / greatest(toks, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
        |          + (CASE WHEN CAST(punct AS DOUBLE) / greatest(toks, 1.0) <= 0.3 THEN 1.0 ELSE 0.0 END)
        |          + (CASE WHEN CAST(stops AS DOUBLE) / greatest(toks, 1.0) >= 0.05 THEN 1.0 ELSE 0.0 END)
        |          + (CASE WHEN chars BETWEEN 50.0 AND 100000.0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
        |  FROM t
        |), keyed AS (
        |  SELECT doc_id, lang, quality,
        |         -ln((CAST('0x' || substr(md5('wsamp1:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 0.5)
        |             / 4294967296.0) / (quality + 0.25) AS key
        |  FROM s
        |)
        |SELECT doc_id, lang, quality, CAST(rn AS INTEGER) AS sample_rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key, doc_id) AS rn
        |      FROM keyed)
        |WHERE rn <= 5
        |""".stripMargin.trim),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        val scored = Tables.documents(spark, dir).select(
          col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        Sampling.weightedHashSample(
          scored, col("lang"), col("doc_id"),
          col("quality") + lit(0.25), k = 5, salt = "wsamp1:")
      }
    ),
    Q(
      "q87_token_budget",
      "Greedy per-source token-budget curation: each source contributes " +
        "its highest-quality documents until an 800-token budget fills — " +
        "the data-mixing primitive behind 'best N tokens per source'. " +
        "Total order via the (quality DESC, doc_id) tiebreak makes the " +
        "kept set unique; one hash shuffle on source + in-group sort is " +
        "the exact form's honest cost (pre-thin oversized groups with the " +
        "narrow samplers first at corpus scale).",
      Some(tokenBudgetSql),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        val scored = Tables.documents(spark, dir).select(
          col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ws_tokens"))
        Sampling.fillTokenBudget(
          scored, "source", "quality", "doc_id", "ws_tokens", budget = 800L)
      }
    ),
    Q(
      "q92_token_budget_sharded",
      "q87's PRODUCTION path, oracle-checked: exact two-phase sharded " +
        "token-budget selection (fillTokenBudgetSharded — per-(source, " +
        "shard) windows thin each shard to its budget prefix, the tiny " +
        "per-source cut key broadcasts back, then the exact selection " +
        "runs over the thinned union). Same oracle as q87 because the " +
        "two forms are provably equal (property-tested incl. shards " +
        "overflowing at different points); parallelism is sources x " +
        "shards instead of sources.",
      Some(tokenBudgetSql),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        val scored = Tables.documents(spark, dir).select(
          col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ws_tokens"))
        Sampling.fillTokenBudgetSharded(
          scored, "source", "quality", "doc_id", "ws_tokens", budget = 800L)
          .select("doc_id", "source", "quality", "ws_tokens", "cum_tokens")
      }
    ),
    Q(
      "q136_mixture_capstone",
      "The mixture-assembly capstone: per-source best-quality curation " +
        "(the q87 800-token budget) -> epoch repeats to 30k-token " +
        "mixture targets (the q124/q125 plan, weights 3/2/0) -> " +
        "512-token training bins. The composition insight: the epoch " +
        "stream's running cut total IS the packing prefix, so bin " +
        "assignment is pure arithmetic on cum_tokens — the final stage " +
        "costs ZERO additional shuffles. The curated pool is " +
        "materialized ONCE (localCheckpoint; a parquet write at cluster " +
        "scale) before fanning out into the plan aggregate and the " +
        "epoch stream — the q100 discipline. Each stage is individually " +
        "oracle-green (q92, q125, q116); this checks their composition " +
        "— schema hand-offs, order keys surviving each stage — as one " +
        "plan.",
      Some {
        val curatedBody =
          """  SELECT doc_id, source, ws_tokens AS toks FROM (
            |    SELECT doc_id, source, ws_tokens,
            |           CAST(SUM(ws_tokens) OVER (
            |             PARTITION BY source ORDER BY quality DESC, doc_id
            |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum0
            |    FROM (
            |      SELECT doc_id, source,
            |             ((CASE WHEN chars / greatest(toksd, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
            |              + (CASE WHEN CAST(punct AS DOUBLE) / greatest(toksd, 1.0) <= 0.3 THEN 1.0 ELSE 0.0 END)
            |              + (CASE WHEN CAST(stops AS DOUBLE) / greatest(toksd, 1.0) >= 0.05 THEN 1.0 ELSE 0.0 END)
            |              + (CASE WHEN chars BETWEEN 50.0 AND 100000.0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality,
            |             CAST(toksd AS BIGINT) AS ws_tokens
            |      FROM (
            |        SELECT doc_id, source,
            |               CAST(LENGTH(text) AS DOUBLE) AS chars,
            |               CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS toksd,
            |               len(regexp_extract_all(text, '[.!?,;:]')) AS punct,
            |               len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b')) AS stops
            |        FROM documents
            |      )
            |    )
            |  ) WHERE cum0 <= 800""".stripMargin
        s"""${duckEpochCtesFrom(curatedBody, 30000L)}, ex AS (
           |  SELECT d.source, d.doc_id, d.toks, CAST(u.e AS BIGINT) AS epoch,
           |         p.target_tokens
           |  FROM d, plan p, UNNEST(range(1, p.epochs + 1)) AS u(e)
           |  WHERE d.source = p.source
           |), c AS (
           |  SELECT source, doc_id, epoch, toks,
           |         CAST(SUM(toks) OVER (
           |           PARTITION BY source ORDER BY epoch, doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
           |         target_tokens
           |  FROM ex
           |)
           |SELECT source, doc_id, epoch, toks AS tokens,
           |       (cum_tokens - toks) // 512 AS bin_id,
           |       (cum_tokens - toks) % 512 AS bin_offset
           |FROM c WHERE cum_tokens <= target_tokens""".stripMargin
      },
      (spark, dir) => {
        import graft.operators.TextAnalysis
        val scored = Tables.documents(spark, dir).select(
          col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ws_tokens"))
        val curated = Sampling.fillTokenBudgetSharded(
            scored, "source", "quality", "doc_id", "ws_tokens", budget = 800L)
          .select("doc_id", "source", "ws_tokens")
          .localCheckpoint(false) // materialize the curated pool ONCE
        Sampling.mixtureEpochMaterialize(
            curated, "source", "doc_id", col("ws_tokens"), EpochWeights,
            budget = 30000L, maxEpochs = EpochMaxEpochs)
          .select(col("source"), col("doc_id"), col("epoch"), col("tokens"),
            expr("(cum_tokens - tokens) div 512").as("bin_id"),
            expr("(cum_tokens - tokens) % 512").as("bin_offset"))
      }
    ),
    Q(
      "q116_length_bucketed_pack",
      "Length-bucketed sequence packing: docs bucketed by the GLOBAL " +
        "p25/p50/p75 token-count quartiles read off the q108 HDR sketch " +
        "(bucket = #thresholds <= toks), then each bucket packed " +
        "independently into 512-token bins by the sharded prefix sum — " +
        "homogeneous-length bins cut padding waste in training batches. " +
        "Thresholds come from a constant-size mergeable sketch (never a " +
        "global sort) and ride a broadcast 1-row frame; packing order " +
        "inside a bucket is doc_id, so the layout is deterministic " +
        "under any partitioning.",
      Some("""
        |WITH v AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks
        |  FROM documents
        |), cells AS (
        |  SELECT toks,
        |         CASE WHEN toks = 0 THEN -1
        |              ELSE CAST(length(bin(toks)) AS INTEGER) - 1 END AS e
        |  FROM v
        |), sk AS (
        |  SELECT e,
        |         CASE WHEN e <= 4 THEN toks ELSE toks >> (e - 4) END AS sub,
        |         count(*) AS cnt
        |  FROM cells GROUP BY 1, 2
        |), cum AS (
        |  SELECT e, sub, cnt,
        |         CAST(SUM(cnt) OVER (ORDER BY e, sub
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |         CAST(SUM(cnt) OVER () AS BIGINT) AS n
        |  FROM sk
        |), ests AS (
        |  SELECT pq,
        |         min(CASE WHEN e <= 4 THEN sub ELSE sub << (e - 4) END) AS est
        |  FROM cum, (VALUES ('p25', CAST(0.25 AS DOUBLE)),
        |                    ('p50', CAST(0.50 AS DOUBLE)),
        |                    ('p75', CAST(0.75 AS DOUBLE))) AS qs(pq, q)
        |  WHERE cum >= CAST(ceil(q * n) AS BIGINT)
        |  GROUP BY 1
        |), th AS (
        |  SELECT max(CASE WHEN pq = 'p25' THEN est END) AS q25,
        |         max(CASE WHEN pq = 'p50' THEN est END) AS q50,
        |         max(CASE WHEN pq = 'p75' THEN est END) AS q75
        |  FROM ests
        |), b AS (
        |  SELECT doc_id, toks,
        |         CAST(CAST(toks >= q25 AS INTEGER) + CAST(toks >= q50 AS INTEGER)
        |              + CAST(toks >= q75 AS INTEGER) AS BIGINT) AS bucket
        |  FROM v, th
        |), c AS (
        |  SELECT doc_id, bucket, toks AS seq_tokens,
        |         CAST(SUM(toks) OVER (PARTITION BY bucket ORDER BY doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           - toks AS pack_start
        |  FROM b
        |)
        |SELECT doc_id, bucket, seq_tokens,
        |       pack_start // 512 AS bin_id,
        |       pack_start % 512 AS bin_offset
        |FROM c
        |""".stripMargin.trim),
      (spark, dir) => {
        import graft.operators.{HdrSketch, Packing, TextAnalysis}
        val v = Tables.documents(spark, dir).select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("toks"))
        val th = HdrSketch.quantiles(
            HdrSketch.sketch(v, "toks", Seq.empty, subBits = 4),
            Seq.empty, Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75),
            subBits = 4)
          .groupBy()
          .agg(
            max(when(col("pq") === "p25", col("est"))).as("q25"),
            max(when(col("pq") === "p50", col("est"))).as("q50"),
            max(when(col("pq") === "p75", col("est"))).as("q75"))
        val bucketed = v.crossJoin(broadcast(th))
          .withColumn("bucket",
            ((col("toks") >= col("q25")).cast("int") +
              (col("toks") >= col("q50")).cast("int") +
              (col("toks") >= col("q75")).cast("int")).cast("long"))
        Packing.contiguousPackSharded(
            bucketed, "bucket", "doc_id", "toks", capacity = 512L)
          .select("doc_id", "bucket", "seq_tokens", "bin_id", "bin_offset")
      }
    ),
    Q(
      "q147_temperature_mixture",
      "Temperature-scaled mixture weights (alpha = 1/2): w_s ~ " +
        "sqrt(p_s), the multilingual-sampling rule that flattens a " +
        "natural-frequency source mix toward uniform — the weight table " +
        "that feeds q124's epoch planner when the mix is derived from " +
        "the data rather than hand-set. alpha is pinned at 1/2 because " +
        "IEEE sqrt is correctly rounded (bit-identical across engines) " +
        "where pow is not; the sqrt lands in a 1e12 integer fixed point " +
        "and everything after is exact BIGINT math, fail-fast guarded " +
        "against ppm-numerator wrap. One map-side-combined source " +
        "aggregate + two broadcast 1-row totals; sources-sized output " +
        "at any corpus scale.",
      Some("""
        |WITH t AS (
        |  SELECT source,
        |         CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1
        |), tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt FROM t),
        |s AS (
        |  SELECT source, tokens,
        |         CAST(floor(sqrt(CAST(tokens AS DOUBLE) / CAST(tt AS DOUBLE))
        |                    * 1000000000000) AS BIGINT) AS sc
        |  FROM t, tot
        |), stot AS (SELECT CAST(SUM(sc) AS BIGINT) AS st FROM s)
        |SELECT s.source, s.tokens,
        |       (1000000 * s.tokens) // tt AS p_ppm,
        |       (1000000 * s.sc) // st AS w_ppm
        |FROM s, tot, stot
        |""".stripMargin.trim),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        Sampling.temperatureWeightsSqrt(
          Tables.documents(spark, dir),
          tokens = TextAnalysis.tokenCount(col("text")))
      }
    ),
    Q(
      "q148_temperature_alpha",
      "Temperature mixture at a GENERAL dyadic alpha (3/4 here): " +
        "w_s ~ p_s^(k/2^m) with the power composed from repeated " +
        "correctly-rounded square roots (binary expansion of k; " +
        "3/4 -> sqrt(p) * sqrt(sqrt(p))) — each sqrt IEEE-correctly " +
        "rounded and each double product exactly rounded, so the " +
        "composition stays bit-identical across engines, extending " +
        "q147's alpha = 1/2 argument to the temperature sweep an epoch " +
        "planner runs (the oracle SQL renders the SAME composition from " +
        "the same constants). Identical fixed point, overflow guard, " +
        "and sources-sized one-scan shape.",
      Some {
        // Rendered from the same (num, den) the Spark side passes to
        // Sampling.dyadicPow, mirroring its bit walk — the two sides
        // cannot drift.
        val (num, den) = (3, 4)
        val m = java.lang.Integer.numberOfTrailingZeros(den)
        val pow = (m to 0 by -1).collect {
          case i if (num & (1 << i)) != 0 =>
            (0 until (m - i)).foldLeft("x")((s, _) => s"sqrt($s)")
        }.mkString(" * ")
        s"""
        |WITH t AS (
        |  SELECT source,
        |         CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1
        |), tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt FROM t),
        |x AS (
        |  SELECT source, tokens,
        |         CAST(tokens AS DOUBLE) / CAST(tt AS DOUBLE) AS x
        |  FROM t, tot
        |), s AS (
        |  SELECT source, tokens,
        |         CAST(floor(($pow) * 1000000000000) AS BIGINT) AS sc
        |  FROM x
        |), stot AS (SELECT CAST(SUM(sc) AS BIGINT) AS st FROM s)
        |SELECT s.source, s.tokens,
        |       (1000000 * s.tokens) // tt AS p_ppm,
        |       (1000000 * s.sc) // st AS w_ppm
        |FROM s, tot, stot
        |""".stripMargin.trim
      },
      (spark, dir) => {
        import graft.operators.TextAnalysis
        Sampling.temperatureWeights(
          Tables.documents(spark, dir),
          tokens = TextAnalysis.tokenCount(col("text")),
          alphaNum = 3, alphaDen = 4)
      }
    ),
    Q(
      "q151_mixture_epoch_derived",
      "Epoch planning from DATA-DERIVED weights: the q147 temperature " +
        "table (w_s ~ sqrt(p_s), exact ppm fixed point) flows straight " +
        "into q124's integer epoch arithmetic as ONE declarative plan — " +
        "no driver collect between deriving the mix and planning the " +
        "passes, so 'measure the corpus, set the temperature, plan the " +
        "epochs' is a single job. The sources-sized weight table rides " +
        "a broadcast left join onto the per-source aggregate; weight " +
        "total stays a broadcast 1-row frame; every number after the " +
        "sqrt is exact BIGINT (same cross-engine argument as q147/q148).",
      Some(
        s"""
        |$duckWeightedPlanCtes
        |SELECT source, n_docs, tokens_src, max_id, weight, target_tokens,
        |       epochs,
        |       LEAST(target_tokens, epochs * tokens_src) AS planned_tokens
        |FROM plan
        |""".stripMargin.trim),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        val docs = Tables.documents(spark, dir)
        val toks = TextAnalysis.tokenCount(col("text"))
        val w = Sampling.temperatureWeightsSqrt(docs, "source", toks)
          .select(col("source"), col("w_ppm").as("weight"))
        Sampling.mixtureEpochPlanWeighted(docs, "source", "doc_id", toks, w,
          budget = EpochBudget, maxEpochs = EpochMaxEpochs)
      }
    ),
    Q(
      "q153_mixture_epoch_derived_stream",
      "The materialized DERIVED-weight epoch mixture — q151's plan " +
        "driving q125's repeat-and-cut stream as ONE declarative job: " +
        "temperature ppm weights (w ~ sqrt(p), the q147 fixed point) " +
        "plan the per-source targets and epochs in-flight, each source " +
        "repeats epoch-major against the broadcast sources-sized plan, " +
        "and the cut is the two-phase sharded prefix sum — measure the " +
        "corpus, set the temperature, plan the passes, and lay out the " +
        "training order with no driver collect between any stage. The " +
        "corpus is scanned once for the plan aggregate and once for " +
        "the stream, never self-joined; no source serializes through " +
        "a single window task.",
      Some(
        s"""
        |$duckWeightedPlanCtes, ex AS (
        |  SELECT d.source, d.doc_id, d.toks, CAST(u.e AS BIGINT) AS epoch,
        |         p.target_tokens
        |  FROM d, plan p, UNNEST(range(1, p.epochs + 1)) AS u(e)
        |  WHERE d.source = p.source
        |), c AS (
        |  SELECT source, doc_id, epoch, toks,
        |         CAST(SUM(toks) OVER (
        |           PARTITION BY source ORDER BY epoch, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
        |         target_tokens
        |  FROM ex
        |)
        |SELECT source, doc_id, epoch, toks AS tokens, cum_tokens
        |FROM c WHERE cum_tokens <= target_tokens
        |""".stripMargin.trim),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        val docs = Tables.documents(spark, dir)
        val toks = TextAnalysis.tokenCount(col("text"))
        val w = Sampling.temperatureWeightsSqrt(docs, "source", toks)
          .select(col("source"), col("w_ppm").as("weight"))
        Sampling.mixtureEpochMaterializeWeighted(docs, "source", "doc_id",
          toks, w, budget = EpochBudget, maxEpochs = EpochMaxEpochs)
      }
    )
  )
}
