package graft.queries

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession, Tables}
import graft.operators.Dedup

/** Ground truth for the materialized dup-graph build/probe split
  * ([[DupGraphPhases]]): the built table equals inline mining exactly
  * (full graph AND the sub-corpus restriction the q36/q37/q138/q142/q143
  * consumers use), probes never re-mine signatures, and doc_a-keyed
  * aggregation over the bucketed table is exchange-free.
  */
class DupGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001
  private val NH = DupGraphPhases.NumHashes

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("built graph equals inline mining (the build is just amortization)") {
    val got = canon(DupGraphPhases.pairs(spark, dir)
      .select("doc_a", "doc_b", "shared_bands", "source_a", "source_b"))
    val docs = Tables.documents(spark, dir)
    val direct = canon(Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(docs, "text", "doc_id", NH, carry = Seq("source")),
      "doc_id", NH, bands = DupGraphPhases.Bands, carry = Seq("source"))
      .select("doc_a", "doc_b", "shared_bands", "source_a", "source_b"))
    assert(got.nonEmpty && got == direct)
  }

  test("pairsUnder equals mining the filtered corpus (signatures are per-document)") {
    // The semantic claim that lets q36/q37/q138/q142/q143 probe the FULL
    // graph: a band key depends only on its own document, so restricting
    // the pair set to both-endpoints-under-maxId is identical to mining
    // the filtered corpus from scratch.
    val got = canon(DupGraphPhases.pairsUnder(spark, dir, 300L)
      .select("doc_a", "doc_b", "shared_bands"))
    val sub = Tables.documents(spark, dir).filter(col("doc_id") < 300)
    val direct = canon(Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(sub, "text", "doc_id", NH),
      "doc_id", NH, bands = DupGraphPhases.Bands)
      .select("doc_a", "doc_b", "shared_bands"))
    assert(got.nonEmpty && got == direct)
  }

  test("probes read the bucketed table without re-mining or re-shuffling it") {
    // No Generate = no token/band explode = zero signature recomputation
    // in any probe plan.
    val scan = DupGraphPhases.pairs(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(!scan.contains("Generate"), scan)
    assert(!scan.contains("Exchange ("), scan)
    // The bucketed layout IS the shuffle: a doc_a-keyed aggregation runs
    // with zero exchanges (HashPartitioning(doc_a, 16) from the buckets
    // satisfies the aggregate's required distribution).
    val agg = DupGraphPhases.pairs(spark, dir)
      .groupBy("doc_a").agg(count(lit(1)).as("n"))
      .queryExecution.explainString(FormattedMode)
    assert(!agg.contains("Exchange ("), agg)
    assert(!agg.contains("Generate"), agg)
  }

  test("derived components/ranks equal the inline iterative runs; probes are table reads") {
    // Determinism is the load-bearing claim: min-label components and
    // integer fixed-point PageRank are partitioning-exact, so the
    // materialized tables (built at 8 partitions) must equal fresh
    // inline runs at a DIFFERENT partition count, row for row.
    val prs = DupGraphPhases
      .pairsUnder(spark, dir, DupGraphPhases.DerivedMaxId)
      .select("doc_a", "doc_b")
    val edges = prs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(prs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    assert(canon(DupGraphPhases.components(spark, dir)) ==
      canon(graft.operators.Components.connectedComponents(prs,
        numPartitions = Some(4))))
    assert(canon(DupGraphPhases.ranks(spark, dir)) ==
      canon(graft.operators.PageRank.ranks(edges, iterations = 5,
        numPartitions = Some(4))))
    // and the probes are bare bucketed-table reads — no iteration, no
    // mining, no shuffle
    Seq(DupGraphPhases.components(spark, dir), DupGraphPhases.ranks(spark, dir))
      .foreach { t =>
        val p = t.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        assert(!p.contains("Generate") && !p.contains("Exchange ("), p)
      }
  }

  test("serving component map equals inline even-components; q144 is a pure probe") {
    // Equality: min-label components are partitioning-exact, so the
    // materialized serving map (built at 8 partitions) must equal a fresh
    // inline run at a different partition count — including the singleton
    // coalesce that makes the map TOTAL over even docs.
    val evenPairs = DupGraphPhases.pairs(spark, dir)
      .filter(col("doc_a") % 2 === 0 && col("doc_b") % 2 === 0)
      .select("doc_a", "doc_b")
    val inline = Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("id"))
      .join(graft.operators.Components.connectedComponents(evenPairs,
        numPartitions = Some(4)), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    assert(canon(DupGraphPhases.servingComponents(spark, dir)) == canon(inline))
    // The probe is a bare bucketed-table read, and q144's whole routing
    // plan does neither signature mining nor label-propagation iteration.
    val scan = DupGraphPhases.servingComponents(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(!scan.contains("Generate") && !scan.contains("Exchange ("), scan)
    val q = SparkEntry.queries("q144_canonical_routing")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(!q.contains("portable_hash32"), q.linesIterator.take(60).mkString("\n"))
    assert(!q.contains("Generate"), q.linesIterator.take(60).mkString("\n"))
  }

  test("q146 cluster-safe split: zero candidate pairs cross the split boundary") {
    // The semantic guarantee the query exists for: hashing the CLUSTER id
    // means no near-dup candidate pair can straddle train/val/test. Check
    // it against the actual pair set, not the construction.
    val split = SparkEntry.queries("q146_cluster_safe_split")(spark, dir)
      .select(col("doc_id"), col("split"))
    val pairs = DupGraphPhases
      .pairsUnder(spark, dir, DupGraphPhases.DerivedMaxId)
      .select("doc_a", "doc_b")
    val crossers = pairs
      .join(split.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), Seq("doc_a"))
      .join(split.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
    assert(crossers.count() == 0)
    // and the split is total + three-way over the sub-corpus
    val n = Tables.documents(spark, dir)
      .filter(col("doc_id") < DupGraphPhases.DerivedMaxId).count()
    assert(split.count() == n)
  }

  test("even base map + local ranks equal inline runs; q145 probes, never rebuilds") {
    val prs = DupGraphPhases
      .pairsUnder(spark, dir, DupGraphPhases.DerivedMaxId)
      .select("doc_a", "doc_b")
    val evenPairs = prs.filter(col("doc_a") % 2 === 0 && col("doc_b") % 2 === 0)
    // Materialized even base map (4th derived product) = inline TOTAL
    // map at a different partition count — the q145 baseComp contract.
    val inlineBase = Tables.documents(spark, dir)
      .filter(col("doc_id") < DupGraphPhases.DerivedMaxId && col("doc_id") % 2 === 0)
      .select(col("doc_id").as("id"))
      .join(graft.operators.Components.connectedComponents(evenPairs,
        numPartitions = Some(4)), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    assert(canon(DupGraphPhases.evenBaseComponents(spark, dir)) == canon(inlineBase))
    // Materialized local ranks (5th) = inline localRanks, ditto.
    val evenEdges = evenPairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(evenPairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    assert(canon(DupGraphPhases.evenLocalRanks(spark, dir)) ==
      canon(graft.operators.PageRank.localRanks(evenEdges, iterations = 5,
        numPartitions = Some(4))))
    // q145's plan: no signature mining, and no label-propagation rebuild
    // of the base map — the ONLY iterative work left is the delta-sized
    // label-graph merge inside Components.incremental.
    val q145 = SparkEntry.queries("q145_incremental_components")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(!q145.contains("Generate"), q145.linesIterator.take(60).mkString("\n"))
    assert(!q145.contains("portable_hash32"), q145.linesIterator.take(60).mkString("\n"))
  }

  test("q149 incremental ranks equal a full merged-graph localRanks recompute") {
    // The load-bearing claim: component-local ranks (r0 = Scale, constant
    // teleport — no graph-global N) are identical computed per touched
    // subgraph + read from the even rank table, vs recomputed over the
    // whole merged graph. Row-for-row, at a different partition count.
    val prs = DupGraphPhases
      .pairsUnder(spark, dir, DupGraphPhases.DerivedMaxId)
      .select("doc_a", "doc_b")
    val allEdges = prs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(prs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val full = graft.operators.PageRank
      .localRanks(allEdges, iterations = 5, numPartitions = Some(4))
      .select(col("id").as("doc_id"), col("rank"))
    val got = SparkEntry.queries("q149_incremental_ranks")(spark, dir)
    assert(canon(got) == canon(full))
    // The reuse is real: some components are untouched (all-even), so
    // the incremental path must read strictly fewer edges than the
    // graph holds — and its plan reads the materialized rank table and
    // never mines signatures.
    val mergedComp = DupGraphPhases.components(spark, dir)
    val touched = mergedComp.filter(col("id") % 2 === 1).select("comp").distinct()
    val untouchedNodes = mergedComp
      .join(touched, Seq("comp"), "left_anti").count()
    assert(untouchedNodes > 0,
      "fixture lost its all-even components; the reuse path is untested")
    val plan = got.queryExecution.explainString(FormattedMode)
    assert(plan.contains(DupGraphPhases.evenRankTable(dir)), plan.linesIterator.take(80).mkString("\n"))
    // The fixed point is the memoized per-batch product, not inline:
    // the plan reads the touched rank table (shared with q150).
    assert(plan.contains(DupGraphPhases.touchedRankTable(dir)),
      plan.linesIterator.take(80).mkString("\n"))
    assert(!plan.contains("Generate"), plan.linesIterator.take(80).mkString("\n"))
    assert(!plan.contains("portable_hash32"), plan.linesIterator.take(80).mkString("\n"))
    // VERDICT r11: the membership set joins with NO forced broadcast
    // hint (its worst case is component-sized — a viral cluster would
    // make a forced broadcast a driver cliff). The strategy must come
    // from the set's ACTUAL size: at test scale it is small, so the
    // planner/AQE still picks a broadcast join for the anti screen.
    val executed = got.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin") && executed.contains("LeftAnti"),
      executed.linesIterator.take(80).mkString("\n"))
  }

  test("q150 incremental canonicals equal a full merged-graph re-decision") {
    // Full recompute: merged labels + merged-graph local ranks + argmax
    // (top rank, tiebreak min id) per component, all inline at a
    // different partition count.
    import org.apache.spark.sql.expressions.Window
    val prs = DupGraphPhases
      .pairsUnder(spark, dir, DupGraphPhases.DerivedMaxId)
      .select("doc_a", "doc_b")
    val allEdges = prs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(prs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val w = Window.partitionBy("comp").orderBy(col("rank").desc, col("id"))
    val full = graft.operators.PageRank
      .localRanks(allEdges, iterations = 5, numPartitions = Some(4))
      .join(graft.operators.Components.connectedComponents(prs,
        numPartitions = Some(4)), Seq("id"))
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("comp"), col("id").as("canonical_id"))
    val got = SparkEntry.queries("q150_incremental_canonicals")(spark, dir)
    assert(canon(got) == canon(full))
    // The correctness-critical displacement case must be EXERCISED by
    // the fixture: at least one touched merged component whose label is
    // odd yet which contains even members (an arrival displaced the
    // even min) — the case the id-keyed screen of the even table exists
    // for. The sub-corpus's interleaved-parity near-dup planting makes
    // this stable.
    val mergedComp = DupGraphPhases.components(spark, dir)
    val displaced = mergedComp.filter(col("comp") % 2 === 1)
      .filter(col("id") % 2 === 0).count()
    assert(displaced > 0,
      "fixture lost its displaced-even-label components; the stale-row " +
        "screen in q150 is untested")
    // Probe shape: reads the materialized canonical table, never mines —
    // and the rank fixed point comes from the SAME memoized touched
    // product as q149, not an inline recompute.
    val plan = got.queryExecution.explainString(FormattedMode)
    assert(plan.contains(DupGraphPhases.evenCanonicalTable(dir)),
      plan.linesIterator.take(80).mkString("\n"))
    assert(plan.contains(DupGraphPhases.touchedRankTable(dir)),
      plan.linesIterator.take(80).mkString("\n"))
    assert(!plan.contains("Generate"), plan.linesIterator.take(80).mkString("\n"))
    assert(!plan.contains("portable_hash32"), plan.linesIterator.take(80).mkString("\n"))
    // Same no-forced-broadcast contract as q149: anti screen of the
    // even canonical table still broadcasts at test scale by SIZE.
    val executed = got.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin") && executed.contains("LeftAnti"),
      executed.linesIterator.take(80).mkString("\n"))
  }

  test("refreshed serving map equals a from-scratch merged-corpus rebuild") {
    // The refreshServing contract: folding the odd arrival batch into
    // the materialized even serving map (Components.incremental) must
    // equal full label propagation over the merged corpus — total over
    // ALL docs, singletons included — at a different partition count.
    val allPairs = DupGraphPhases.pairs(spark, dir).select("doc_a", "doc_b")
    val fullRebuild = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"))
      .join(graft.operators.Components.connectedComponents(allPairs,
        numPartitions = Some(4)), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    assert(canon(DupGraphPhases.refreshedServing(spark, dir)) == canon(fullRebuild))
    // The q152 routing probe is a pure bucketed-table read — no mining,
    // no label-propagation iteration in its plan.
    val q = SparkEntry.queries("q152_serving_refresh")(spark, dir)
    val p = q.queryExecution.explainString(FormattedMode)
    assert(p.contains(DupGraphPhases.refreshedServingTable(dir)),
      p.linesIterator.take(60).mkString("\n"))
    assert(!p.contains("Generate"), p.linesIterator.take(60).mkString("\n"))
    assert(!p.contains("portable_hash32"), p.linesIterator.take(60).mkString("\n"))
    // And the refresh genuinely changes routing vs the pre-refresh map:
    // every odd doc now has a canonical (q144 gives novel docs NULL).
    val n = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 1).count()
    assert(q.count() == n)
  }

  test("small-delta serving refresh equals a from-scratch rebuild of its merged corpus") {
    // Same Components.incremental exactness pin as the 50%-delta test
    // above, at the ~2% batch geometry the bench's dupgraph_refresh_delta
    // phase times: merged corpus = even ids ∪ (ids ≡ 1 mod 50), pairs =
    // every mined pair with both endpoints in that corpus.
    val member = (c: org.apache.spark.sql.Column) =>
      (c % 2 === 0) || (c % 50 === 1)
    val mergedPairs = DupGraphPhases.pairs(spark, dir)
      .filter(member(col("doc_a")) && member(col("doc_b")))
      .select("doc_a", "doc_b")
    val mergedIds = Tables.documents(spark, dir)
      .filter(member(col("doc_id")))
      .select(col("doc_id").as("id"))
    val fullRebuild = mergedIds
      .join(graft.operators.Components.connectedComponents(mergedPairs,
        numPartitions = Some(4)), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    assert(canon(DupGraphPhases.smallDeltaServing(spark, dir)) == canon(fullRebuild))
  }

  test("q143 capstone: zero signature recomputation in the executed pipeline") {
    val q = SparkEntry.queries("q143_curation_capstone")(spark, dir)
    val p = q.queryExecution.explainString(FormattedMode)
    // Signature mining would show as portable_hash32 / a token-explode
    // Generate; off the built graph neither may appear anywhere.
    assert(!p.contains("portable_hash32"), p.linesIterator.take(60).mkString("\n"))
    assert(!p.contains("Generate"), p.linesIterator.take(60).mkString("\n"))
    // and the report itself is sane: every source accounted, kept+dropped
    // partitions both docs and tokens
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), r.toString) // docs
      assert(r.getLong(4) >= 0 && r.getLong(5) >= 0, r.toString)
    }
  }
}
