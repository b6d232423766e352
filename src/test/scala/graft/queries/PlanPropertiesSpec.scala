package graft.queries

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Regression guard for the plan properties PLANS.md claims: these are the
  * load-bearing scale characteristics — if a refactor silently loses a
  * broadcast, a pushdown, or the window-group-limit optimization, this
  * fails even though results stay correct.
  */
class PlanPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SparkTestSession.sf0001)
      .queryExecution.explainString(FormattedMode)

  test("q11: both dimension joins broadcast") {
    assert(plan("q11_join_broadcast_dims")
      .sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 2)
  }

  test("q35: the vec_id bound is pushed into the parquet scan") {
    val p = plan("q35_embedding_dup_pairs")
    assert(p.contains("LessThan(vec_id,1000)"), p.linesIterator.take(30).mkString("\n"))
  }

  test("q13/q40/q82/q89/q165: rank-filter becomes WindowGroupLimit (no full-partition sort retention)") {
    assert(plan("q13_window_rank").contains("WindowGroupLimit"))
    assert(plan("q40_ann_bruteforce").contains("WindowGroupLimit"))
    assert(plan("q82_latest_by_key").contains("WindowGroupLimit"))
    assert(plan("q89_weighted_sample").contains("WindowGroupLimit"))
    // the EWMA's rn <= 16 recency cut plans as per-user top-16 heaps
    assert(plan("q165_ewma_value").contains("WindowGroupLimit"))
  }

  test("q32: the probe is a bare bucketed-table read — no join, no mining, no shuffle") {
    // The band self-join (equi-join, never cartesian) moved into the
    // one-shot DupGraphPhases build (pinned in ExchangeReuseSpec /
    // DupGraphSpec); the repeat-query path must stay this cheap.
    val p = plan("q32_minhash_lsh_pairs")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("Exchange ("), p)
  }

  test("q83: banded-LSH dup pairs join on (table, bucket) — never cartesian/nested-loop") {
    val p = plan("q83_embedding_dup_lsh")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoop"), p.linesIterator.take(40).mkString("\n"))
    // and the id bound still reaches the parquet scan
    assert(p.contains("LessThan(vec_id,1000)"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q84: segment-blocked fuzzy join is an equi-join on the block key — never cartesian") {
    val p = plan("q84_fuzzy_blocked")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoop"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q86: binned range join plans as an equi-join on the bin — never a nested loop") {
    val p = plan("q86_range_join_binned")
    assert(!p.contains("BroadcastNestedLoop"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q87: token-budget selection costs exactly one exchange (the per-source window)") {
    val p = plan("q87_token_budget")
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("q14: global top-k runs as TakeOrderedAndProject, not a full sort") {
    assert(plan("q14_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q01: exactly one shuffle exchange (the value-distinct)") {
    val p = plan("q01_trace_pipeline")
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
  }

  test("q28: as-of join runs with exactly one shuffle (union+window, no pair explosion)") {
    val p = plan("q28_asof_join")
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
    assert(!p.contains("Join"), "as-of must not plan as a join") // no theta-join fallback
  }

  test("q38/q39: deterministic split/sample plan with ZERO exchanges (narrow filters)") {
    Seq("q38_hash_split", "q39_stratified_sample").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange ("), s"$q must not shuffle:\n$p")
    }
  }

  test("q09: sessionization is one shuffle keyed on user_id") {
    val p = plan("q09_session_window")
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
  }

  test("q48/q49: text cleaning and repetition stay inside whole-stage codegen, no shuffle") {
    Seq("q48_text_clean", "q49_repetition").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange ("), s"$q must not shuffle")
      assert(p.contains("[codegen id :"), s"$q must be inside a codegen span")
    }
  }

  test("q57: the whole curation pipeline costs exactly one shuffle (the dedup groupBy)") {
    val p = plan("q57_curation_pipeline")
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("q63: the benchmark n-gram set broadcasts; corpus n-grams are never shuffled for the join") {
    val p = plan("q63_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q65/q66/q68/q71: generators, unpivot, and multimodal stages are narrow (zero exchanges)") {
    Seq("q65_explode_pos", "q66_unpivot", "q68_multimodal_resize",
      "q71_multimodal_frames").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange ("), s"$q must not shuffle:\n$p")
    }
  }

  test("q70: the vocabulary (df) and corpus-size joins broadcast — the corpus never reshuffles on term") {
    val p = plan("q70_tfidf")
    // Two independent pins: the df-table equi-join AND the 1-row corpus
    // count cross join must each broadcast.
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q69: the ANN query set broadcasts under the corpus stream") {
    val p = plan("q69_multimodal_embed_ann")
    assert(p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q74: the priority predicate prunes partitions at planning time") {
    val p = plan("q74_partition_pruning")
    assert(p.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      p.linesIterator.take(40).mkString("\n"))
  }

  test("components small-graph path: the REAL iteration plans broadcast joins, no sort-merge") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "comp")
    val p = graft.operators.Components.propagateMin(edges, labels, small = true)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q102: split labels compute on the materialized pair stream — no join, no mining") {
    // Pre-materialization this pinned the banding carry (labels pushed
    // into the join condition re-hashed per candidate pair, measured 2x).
    // Off the built graph the probe has no join at all: two md5s per
    // SURVIVING pair in a narrow projection.
    val p = SparkEntry.queries("q102_split_leakage")(spark, SparkTestSession.sf0001)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Join"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("Generate"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("Exchange ("), p.linesIterator.take(40).mkString("\n"))
  }

  test("q103: the HLL register table costs one exchange with map-side combine") {
    val p = plan("q103_hll_registers")
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
    // partial + final aggregate: max is the map-side combiner, so the
    // shuffle moves at most (group x 64) partial registers per task
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2, p)
  }

  test("q105: the bloom probe is join-free — the only join is the broadcast exact-truth column") {
    val p = plan("q105_bloom_screen")
    val broadcasts = p.sliding("BroadcastExchange".length)
      .count(_ == "BroadcastExchange")
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    // every Exchange is the broadcast of the tiny exact-truth side; the
    // corpus stream itself never shuffles for the screen
    assert(broadcasts >= 1 && exchanges == broadcasts,
      s"expected only broadcast exchanges, got $exchanges total / $broadcasts broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
  }

  test("q106: one rollup of the materialized pairs — no join, no mining, sources^2 output") {
    // The source labels were carried at BUILD time, so the overlap
    // matrix is a single aggregation of the pair table.
    val p = plan("q106_dup_overlap_matrix")
    assert(!p.contains("Join"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("Generate"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q107: fragment stitch is an equi-join on the overlap hash, never cartesian") {
    val p = plan("q107_fragment_stitch")
    assert(p.contains("hk"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q108: the HDR histogram costs one exchange with map-side combine") {
    val p = plan("q108_hdr_sketch")
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2, p)
  }

  test("q109: quantiles derive from ONE corpus pass — total and cumulative windows share an exchange, no join") {
    val p = plan("q109_hdr_quantiles")
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$p")
    assert(!p.contains("Join"), "the totals must come from a window, not a join")
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 2, s"expected 2 exchanges (sketch agg + group window), got $exchanges:\n$p")
  }

  test("q100: distinct runtime shuffles stay bounded — duplicated layout branches hit exchange reuse") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    val out = SparkEntry.queries("q100_capstone_pipeline")(spark, SparkTestSession.sf0001)
    out.collect() // materialize so AQE finalizes the plan
    def walk(p: SparkPlan): (Set[Int], Int) = {
      val (hereIds, hereReused) = p match {
        case e: Exchange => (Set(e.id), 0)
        case _: ReusedExchangeExec => (Set.empty[Int], 1)
        case _ => (Set.empty[Int], 0)
      }
      val below = p match {
        case a: AdaptiveSparkPlanExec => Seq(walk(a.executedPlan))
        case q: QueryStageExec => Seq(walk(q.plan))
        case other => other.children.map(walk)
      }
      below.foldLeft((hereIds, hereReused)) { case ((ids, r), (i2, r2)) => (ids ++ i2, r + r2) }
    }
    val (distinctExchanges, reused) = walk(out.queryExecution.executedPlan)
    info(s"distinct exchanges=${distinctExchanges.size} reused=$reused")
    // Audited at 8-11 distinct + 3 reused (sf0.001; the count moves a
    // few exchanges run-to-run as AQE's runtime-stat broadcast decisions
    // reshape joins): passage-df agg pair, reassembly groupBy, dedup agg,
    // semi-join sides, the (source, shard) budget window, the final
    // source window, the (group, shard) pack exchange. The property
    // pinned is the ORDER of magnitude: the static plan expands the
    // duplicated sharded-layout branches to 47 exchange nodes, and
    // runtime reuse + the checkpoint must keep actual shuffles at the
    // audited dozen, not the expanded tree.
    assert(distinctExchanges.size <= 14,
      s"capstone shuffle budget blown: ${distinctExchanges.size} distinct exchanges")
    assert(reused >= 1, "expected duplicated branches to reuse at least one exchange")
  }

  test("q130: the corpus-wide rank windows by shard; only the tiny offsets table is single-partition") {
    val p = plan("q130_global_shuffle")
    // main stream: the running-count window partitions on the order shard
    assert(p.contains("hashpartitioning(__sp_shard"), p.linesIterator.take(40).mkString("\n"))
    // exactly one SinglePartition exchange — the shards-sized offsets
    // aggregate — never the document stream
    val single = p.sliding("SinglePartition".length).count(_ == "SinglePartition")
    assert(single <= 1, s"expected <=1 SinglePartition exchange, got $single:\n$p")
  }

  test("q129: the dup-count join is hash-based, never a cartesian/nested loop") {
    val p = plan("q129_corpus_report")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q131: quantized search keeps WindowGroupLimit and the codegen dot kernel") {
    val p = plan("q131_quantized_ann_recall")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("dot_ff"), "integer-code dot should ride the codegen kernel")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q132: the cohort join broadcasts the users-sized aggregate") {
    val p = plan("q132_retention_cohorts")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q134: the benchmark gram map broadcasts into the corpus-side screen") {
    val p = plan("q134_leakage_report")
    // the gram screen is the broadcast inner join; the FINAL left join
    // (zero-leak rows) is benchmark-sized and may sort-merge statically
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q137: the vocabulary join is hash-based; the only nested loop is the 1-row total") {
    val p = plan("q137_token_rarity")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the broadcast 1-row corpus total is the single allowed nested loop
    // (FormattedMode prints each node twice: tree + detail)
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 2, p)
  }

  test("q136: capstone runtime shuffles stay bounded; bin assignment adds none") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    val out = SparkEntry.queries("q136_mixture_capstone")(spark, SparkTestSession.sf0001)
    out.collect() // materialize so AQE finalizes the plan
    def walk(p: SparkPlan): (Set[Int], Int) = {
      val (hereIds, hereReused) = p match {
        case e: Exchange => (Set(e.id), 0)
        case _: ReusedExchangeExec => (Set.empty[Int], 1)
        case _ => (Set.empty[Int], 0)
      }
      val below = p match {
        case a: AdaptiveSparkPlanExec => Seq(walk(a.executedPlan))
        case q: QueryStageExec => Seq(walk(q.plan))
        case other => other.children.map(walk)
      }
      below.foldLeft((hereIds, hereReused)) { case ((ids, r), (i2, r2)) => (ids ++ i2, r + r2) }
    }
    val (distinctExchanges, reused) = walk(out.queryExecution.executedPlan)
    info(s"distinct exchanges=${distinctExchanges.size} reused=$reused")
    // Audited at 12 distinct + 4 reused (sf0.001): the sharded budget
    // windows + cut, the epoch-plan source aggregate + weight total, and
    // the sharded-prefix (source, shard) family downstream of the ONE
    // localCheckpoint materialization. The static tree expands the
    // duplicated curation branches to 77 exchange nodes; the pin keeps
    // the executed plan at the audited order, and the bin-assignment
    // stage (pure cum_tokens arithmetic) must add nothing.
    assert(distinctExchanges.size <= 16,
      s"capstone shuffle budget blown: ${distinctExchanges.size} distinct exchanges")
    assert(reused >= 1, "expected the fanned-out curated pool to reuse exchanges")
  }

  test("q154: the small-delta routing probe is a bucketed-table join — no mining, no propagation") {
    val p = plan("q154_refresh_small_delta")
    assert(p.contains(DupGraphPhases.smallDeltaServingTable(SparkTestSession.sf0001)),
      p.linesIterator.take(60).mkString("\n"))
    assert(!p.contains("Generate"), p.linesIterator.take(60).mkString("\n"))
    assert(!p.contains("portable_hash32"), p.linesIterator.take(60).mkString("\n"))
  }

  test("q156: the segmented probe unions two bucketed scans; query side broadcasts; no cartesian") {
    val df = SparkEntry.queries("q156_ivf_delta_probe")(spark, SparkTestSession.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // both segments appear as bucketed scans, the corpus never exchanges
    // on the join key (the query/cell side rides broadcasts), and the
    // centroid assignment is a broadcast nested loop over the TINY
    // centroid table only — never over corpus-sized inputs
    assert(p.contains("Bucketed: true"), p.linesIterator.take(60).mkString("\n"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.linesIterator.take(60).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(60).mkString("\n"))
  }

  test("q157: the fold screens corpus grams through broadcasts; the stored report scans bucketed") {
    val df = SparkEntry.queries("q157_benchmark_fold")(spark, SparkTestSession.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // novel-gram anti-join and the corpus screen both ride broadcasts —
    // the corpus gram stream is never exchange-joined on the gram key
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(60).mkString("\n"))
    // the stored report streams in place: its fold join is a broadcast
    // left-outer with the delta-sized hit counts on the BUILD side (AQE
    // rightly disables bucketed reading — a broadcast join doesn't need
    // the distribution), so the corpus-sized side has zero exchanges
    assert(p.contains(DecontamPhases.reportTable(SparkTestSession.sf0001)),
      p.linesIterator.take(60).mkString("\n"))
    assert(p.contains("LeftOuter, BuildRight"), p.linesIterator.take(60).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(60).mkString("\n"))
  }

  test("q158: rerank joins broadcast the shortlist/query sides; coarse+final top-k group-limit") {
    val p = plan("q158_two_stage_rerank")
    assert(p.contains("WindowGroupLimit"), p.linesIterator.take(60).mkString("\n"))
    // the only nested-loop is the int8 coarse stage's broadcast of the
    // 8-query set under the corpus stream (the q40/q69 ANN shape); the
    // rerank itself is hash joins with broadcast build sides
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(60).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(60).mkString("\n"))
  }

  test("components shuffle path: the REAL iteration keys the edge join on dst (sort-merge capable)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "comp")
    val p = graft.operators.Components.propagateMin(edges, labels, small = false)
      .queryExecution.explainString(FormattedMode)
    // no broadcast HINT on the big path (AQE may still choose broadcast at
    // runtime for tiny inputs — the guard is that we don't force it)
    assert(!p.contains("ResolvedHint"), p)
  }

  test("q204: repetition screen joins are doc-keyed hash joins; scan pruned to (doc_id, text)") {
    val p = plan("q204_repetition_screen")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoop"), p.linesIterator.take(40).mkString("\n"))
    // column pruning must reach the parquet scan: the screen reads only
    // the id and the text, never lang/source/n_chars
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
    // every aggregation is map-side combined (partial HashAggregates
    // under the (doc_id, gram/word) exchanges)
    assert(p.contains("HashAggregate"), p)
  }

  test("q207: capstone v2 joins stay hash-based — no cartesian, no nested loop") {
    val p = plan("q207_curation_capstone_v2")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoop"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q205: rollup plans as ONE Expand feeding ONE exchange (all levels, one pass)") {
    val p = plan("q205_corpus_rollup")
    assert(p.contains("Expand"), p.linesIterator.take(30).mkString("\n"))
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("q208: the SemDeDup pair stage is an equi-join on cell — never cartesian/nested-loop") {
    // the broadcast centroid argmax is inside the eager checkpoint; the
    // visible plan is the in-cell pair join, which must stay hash-based
    // (the quadratic-confinement claim in code form). q212/q215's audit
    // faces are intentionally gated broadcast nested loops (the exact
    // side is all-pairs by design) and are pinned with q219 below.
    val p = plan("q208_semdedup")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoop"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q215: the planted-cluster audit's only nested-loop is the gated broadcast pair former") {
    val p = plan("q215_semdedup_clustered_miss")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q217: funnel joins stay hash-based and the four stages explode from one aggregate") {
    val p = plan("q217_curation_funnel")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoop"), p.linesIterator.take(40).mkString("\n"))
    // the four stages come from ONE aggregate exploded to tall rows —
    // a per-stage re-scan would show four aggregates over the text scan
    assert(p.contains("explode("), p.linesIterator.take(40).mkString("\n"))
  }

  test("q219: the audit gate reaches the parquet scan; only the GATED pair former is nested-loop") {
    val p = plan("q219_minhash_error_audit")
    assert(p.contains("LessThan(doc_id,64)"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    // the id-gated broadcast pair former is the one intended
    // nested-loop (the audit-face device); nothing may be cartesian
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q233: the whole selectivity evaluation is 3 scan-bounded passes (bounds, counts, actuals)") {
    val p = plan("q233_selectivity_estimate")
    // formatted mode prints each node in the tree AND the details
    // section; count the numbered detail headers
    assert(p.linesIterator.count(l =>
      l.startsWith("(") && l.contains("Scan parquet")) == 3,
      p.linesIterator.filter(_.contains("Scan parquet")).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
  }

  test("q235/q237: the file-cut / cell-cut rank runs SHARDED — every window carries __sp_shard, never a bare global window") {
    // ShardedPrefix.globalRank's contract at plan level: the wide
    // running count partitions by (group, shard); the only other window
    // is the offsets pass over the tiny groups x shards table, which
    // orders by the shard column. A window line without __sp_shard
    // would mean a single-task global row_number snuck back in.
    for (q <- Seq("q235_skipping_audit", "q237_equidepth_histogram")) {
      val winLines = plan(q).linesIterator
        .filter(_.contains("windowspecdefinition")).toSeq
      assert(winLines.nonEmpty, s"$q: expected the rank windows in the plan")
      winLines.foreach(l =>
        assert(l.contains("__sp_shard"), s"$q unsharded window: $l"))
    }
  }

  test("q239/q241: catalog-read costing plans ZERO distinct aggregation — q231's inline face is the contrast") {
    // The stored catalog means no ndv is computed at costing time: the
    // expensive multi-distinct Expand/aggregate must be absent from the
    // serving faces and present in the collection face.
    assert(plan("q231_join_cardinality").contains("distinct"))
    val p239 = plan("q239_stats_catalog_costing")
    assert(!p239.contains("distinct"),
      p239.linesIterator.filter(_.contains("distinct")).mkString("\n"))
    val p241 = plan("q241_join_order_choice")
    assert(!p241.contains("distinct"),
      p241.linesIterator.filter(_.contains("distinct")).mkString("\n"))
    assert(!p241.contains("CartesianProduct"))
  }
}
