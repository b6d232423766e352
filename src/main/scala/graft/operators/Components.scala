package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a near-dup candidate-pair graph —
  * the stage that turns pairwise LSH/cosine matches into dedup GROUPS
  * (each document keeps/drops by its cluster's canonical representative).
  *
  * Algorithm: iterative minimum-label propagation with pointer jumping —
  * every node adopts the smallest component id among itself, its
  * neighbors, and its current component's component
  * (`comp(comp(u))` — halves the remaining diameter each round, O(log d)
  * rounds on chains instead of O(d)). On the broadcast path the
  * pointer-jump term is folded in as extra edges `u -> comp(u)` over the
  * SAME propagate-min pass, so one iteration is ONE join + ONE
  * partial-aggregated groupBy. The fixpoint
  * (`comp` = smallest id in the component) is unique, so the result is
  * deterministic regardless of execution order. The driver loop iterates
  * CONTROL, never data (the standard Spark shape for iterative graph
  * algorithms; GraphX does the same underneath).
  *
  * Scale strategy, chosen from a one-time node count:
  *  - node count <= `broadcastNodeLimit`: the label map broadcasts, so
  *    each iteration scans the persisted edges IN PLACE (broadcast hash
  *    join, no edge-sized shuffle); the min-aggregation map-side combines
  *    down to node-sized before its (tiny) shuffle.
  *  - larger graphs: edges are hash-partitioned ONCE on the probe key and
  *    persisted; the per-iteration sort-merge join reuses that layout, so
  *    only the node-sized label frame shuffles each round, plus the
  *    map-side-combined aggregation. Label state is node-sized — far
  *    smaller than the edge set LSH banding emits — so the broadcast path
  *    covers corpora into the tens of millions of documents before the
  *    shuffle path has to take over.
  * Lineage is truncated with an eager localCheckpoint per round so
  * per-iteration cost stays constant (lazy checkpointing let plans grow
  * superlinearly).
  */
object Components {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** @param pairs edge list (two id columns, undirected)
    * @param broadcastNodeLimit max node count for the broadcast-label
    *        strategy (node rows are two longs; the default ~1M keeps the
    *        broadcast tens of MB)
    * @param driverEdgeLimit max UNDIRECTED edge count for the driver
    *        union-find shortcut (r21 optimization): a graph whose whole
    *        edge list is broadcast-scale — quotient graphs, label-space
    *        merge graphs, bounded sub-corpus slices — pays the
    *        distributed loop's per-round fixed cost (join + aggregate +
    *        eager checkpoint + convergence count, times O(log d) rounds)
    *        for data that fits in one task. Collecting it once and
    *        union-finding on the driver is the same trust move the
    *        broadcast path already makes every round (the full label map
    *        transits the driver in each broadcast); the output is
    *        bit-identical (comp = min member id, pure long arithmetic).
    *        The default (1M edges = ~16 MB of longs) keeps corpus-scale
    *        pair graphs on the distributed paths; 0 disables the
    *        shortcut (the spec hook, like broadcastNodeLimit = 0).
    * @return (id, comp) — comp = smallest node id in the component
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIter: Int = 25,
      numPartitions: Option[Int] = None,
      broadcastNodeLimit: Long = 1000000L,
      driverEdgeLimit: Long = 1000000L): DataFrame = {
    // numPartitions: per-iteration join cost is dominated by task overhead
    // when the graph is small relative to the session's shuffle partitions;
    // callers that know the graph is modest can shrink it (scale runs leave
    // it None and inherit the session parallelism).
    // Symmetrize by EXPLODING both orientations out of one pass — a
    // self-union would embed the (often expensive: LSH banding, cosine
    // pair) `pairs` subtree twice and evaluate it per branch.
    val edgesRaw = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
    // Persist WITHOUT a layout first: the broadcast path scans edges in
    // place and would never use a hash layout, so repartitioning before
    // knowing the strategy would be a wasted full-edge shuffle.
    val edgesBase =
      numPartitions.map(edgesRaw.coalesce).getOrElse(edgesRaw).persist()
    var edgesRep: Option[DataFrame] = None
    // guarded: a failure anywhere past the persist must not leak the
    // (largest) cached intermediate into a long-lived session; unpersist
    // on an already-dropped handle is a no-op, so both are always released
    try {
      // Driver union-find shortcut (see driverEdgeLimit). The gate count
      // is one job over the persisted symmetrized frame (2|E| directed
      // rows); the collect takes one orientation (src <= dst keeps
      // self-loop rows, which label-space merge graphs legitimately
      // carry). Exactness: union-by-min-root + path compression gives
      // find(v) = min member id — the same fixpoint the iterative loop
      // converges to, over the same long ids.
      if (driverEdgeLimit > 0 &&
          edgesBase.count() <= 2L * driverEdgeLimit) {
        val rows = edgesBase.filter(col("src") <= col("dst"))
          .select(col("src"), col("dst")).collect()
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var root = x
          while (parent.getOrElse(root, root) != root)
            root = parent.getOrElse(root, root)
          var cur = x
          while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
          root
        }
        val nodes = scala.collection.mutable.LongMap.empty[Unit]
        rows.foreach { r =>
          val a = r.getLong(0); val b = r.getLong(1)
          nodes(a) = (); nodes(b) = ()
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val out = nodes.keysIterator.map(id => (id, find(id))).toSeq
        log.info(s"[components] driver union-find over ${rows.length} edges, " +
          s"${out.size} nodes (<= driverEdgeLimit=$driverEdgeLimit)")
        val session = pairs.sparkSession
        import session.implicits._
        return out.toDF("id", "comp")
      }
      var labels = edgesBase.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id"))
        .localCheckpoint(true)
      val nodeCount = labels.count()
      val small = nodeCount <= broadcastNodeLimit
      val edges = if (small) edgesBase else {
        // Shuffle path: lay edges out by the probe key ONCE (from the
        // cached base, not a recompute) so every iteration's sort-merge
        // join reuses the partitioning; then drop the layout-less copy.
        val rep = numPartitions
          .map(n => edgesBase.repartition(n, col("dst")))
          .getOrElse(edgesBase.repartition(col("dst")))
          .persist()
        edgesRep = Some(rep)
        rep.count()
        edgesBase.unpersist()
        rep
      }

      var iter = 0
      var changed = 1L
      while (changed > 0 && iter < maxIter) {
        // ONE propagation per eager checkpoint + convergence count.
        // Batching two steps per barrier was tried (round 11) and
        // REVERTED by measurement: halving barriers doubled the
        // per-barrier plan — two joins, two aggregations and two
        // node-sized broadcast materializations instead of one — and
        // the dup-graph derive phase ran 2x slower at sf0.1. The
        // broadcast inside each step is itself a driver sync, so deeper
        // plans do not actually buy fewer round trips.
        // Eager checkpoint truncates lineage NOW; the convergence count
        // then reads checkpointed blocks, not a recomputation.
        val updated = propagateMin(edges, labels, small).localCheckpoint(true)
        changed = updated.filter(col("comp") =!= col("prev")).count()
        // The previous round's checkpoint is dead the moment `updated`
        // materializes — free its blocks NOW instead of waiting for
        // GC + ContextCleaner, which can leave rounds' worth of state
        // pinned in a long-lived session (Checkpoints scaladoc).
        Checkpoints.release(labels)
        labels = updated.select("id", "comp")
        iter += 1
      }
      // Observability: pointer jumping converges in O(log diameter) rounds
      // (2-4 on LSH near-clique graphs); a higher count flags an unusual
      // graph shape worth investigating before it costs at scale. INFO so
      // it respects the session's log level instead of spamming stderr on
      // every invocation at fleet scale; the non-convergence case warns.
      val summary =
        s"${if (changed == 0) "converged" else s"STOPPED at maxIter=$maxIter"} " +
          s"after $iter rounds (nodes=$nodeCount, strategy=${if (small) "broadcast" else "shuffle"})"
      if (changed == 0) log.info(s"[components] $summary")
      else log.warn(s"[components] $summary")
      labels
    } finally {
      edgesBase.unpersist()
      edgesRep.foreach(_.unpersist())
    }
  }

  /** One min-propagation round: (id, comp, prev) from (edges, labels).
    * Package-visible so plan specs pin the REAL iteration's strategy.
    */
  private[graft] def propagateMin(
      edges: DataFrame, labels: DataFrame, small: Boolean): DataFrame = {
    def hinted(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val labelMap = labels.select(col("id").as("nid"), col("comp").as("lcomp"))
    if (small) {
      // Fused single pass: real edges PLUS pointer edges u -> comp(u).
      // For a pointer edge the joined label is comp(comp(u)) — exactly
      // the pointer-jump term (comp values are always live node ids, so
      // the join never drops them). One broadcast hash join over the
      // in-place edge scan, one map-side-combined min.
      val allEdges = edges.unionByName(
        labels.select(col("id").as("src"), col("comp").as("dst")))
      val neighborMin = allEdges
        .join(hinted(labelMap), col("dst") === col("nid"))
        .groupBy(col("src"))
        .agg(min("lcomp").as("ncomp"))
      labels
        .join(hinted(neighborMin), col("id") === col("src"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
    } else {
      // Shuffle path: the edge join keys on dst, matching the persisted
      // hash layout, so only the node-sized label frame shuffles per
      // round; the pointer jump is a separate node-sized self-join
      // (unioning it onto the edges would discard their partitioning).
      val neighborMin = edges
        .join(labelMap, col("dst") === col("nid"))
        .groupBy(col("src"))
        .agg(min("lcomp").as("ncomp"))
      val hop = labels
        .join(labelMap, col("comp") === col("nid"))
        .select(col("id").as("hid"), col("lcomp").as("hcomp"))
      labels
        .join(neighborMin, col("id") === col("src"), "left")
        .join(hop, col("id") === col("hid"), "left")
        .select(col("id"),
          least(col("comp"),
            coalesce(col("ncomp"), col("comp")),
            coalesce(col("hcomp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
    }
  }

  /** INCREMENTAL component maintenance — fold a batch of arriving nodes
    * into an existing cluster map at cost proportional to the DELTA,
    * never the corpus. The daily-ingest counterpart of
    * [[connectedComponents]]: at 100 TB the full graph is re-clustered
    * per curation run, not per ingest batch; between runs each batch
    * updates the (id, comp) map with only (a) the arrivals' signature
    * mine and (b) a label-space merge graph no larger than the delta
    * pair set.
    *
    * Contract:
    *  - `baseComp` (id, comp) must be TOTAL over existing nodes —
    *    singletons included with comp = id (what q144-style
    *    coalesce(comp, id) produces). comp = cluster min id, exactly
    *    what [[connectedComponents]] emits.
    *  - `newIds` (id): arriving node ids, disjoint from existing ids.
    *  - `deltaPairs`: every candidate pair with >= 1 new endpoint
    *    (new-new and new-existing). Band keys are per-document, so the
    *    merged corpus's full pair set is exactly oldPairs ∪ deltaPairs —
    *    no old-old pair can appear or vanish when docs arrive.
    *
    * Algorithm: (1) lift each delta edge into LABEL space — every
    * endpoint replaced by its current label (existing -> comp via the
    * touched slice of the base map, new -> own id); (2) run
    * [[connectedComponents]] over the label graph (<= |deltaPairs|
    * edges); (3) relabel — touched labels map to their merged minimum,
    * untouched rows pass through unchanged. Exactness: every base label
    * is its cluster's minimum id and every new label is the node itself,
    * so the min over a merged label-component equals the min over ALL
    * member ids of the merged data-component — the result equals a full
    * recompute row for row (ComponentsSpec pins it, including the case
    * where one arrival bridges two existing clusters).
    *
    * Scale shape: the touched-label slice and the merge map are
    * delta-sized, so every join here puts them on the BUILD side of a
    * broadcast hash join — the corpus-sized base map is only ever
    * scanned in place (plan-pinned: zero exchanges on the base side).
    */
  def incremental(
      baseComp: DataFrame,
      newIds: DataFrame,
      deltaPairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      numPartitions: Option[Int] = None): DataFrame = {
    val base = baseComp.select(col("id"), col("comp"))
    val fresh = newIds.select(col("id"))
    val delta = deltaPairs.select(col(aCol).as("ea"), col(bCol).as("eb"))
    // Touched slice of the base map: broadcast the (delta-sized) endpoint
    // set into a semi join, so the corpus map is scanned, never shuffled.
    val endpoints = delta
      .select(explode(array(col("ea"), col("eb"))).as("id")).distinct()
    val touched = base
      .join(broadcast(endpoints), Seq("id"), "left_semi")
      .select(col("id").as("tid"), col("comp").as("tcomp"))
    // Lift to label space: existing endpoint -> its comp; a new endpoint
    // is absent from the (total) base map, so coalesce to the id itself.
    val labelEdges = delta
      .join(broadcast(touched), col("ea") === col("tid"), "left")
      .select(coalesce(col("tcomp"), col("ea")).as("la"), col("eb"))
      .join(broadcast(touched), col("eb") === col("tid"), "left")
      .select(col("la"), coalesce(col("tcomp"), col("eb")).as("lb"))
    val merged = connectedComponents(
        labelEdges, "la", "lb", numPartitions = numPartitions)
      .select(col("id").as("lab"), col("comp").as("mcomp"))
    // Relabel: merge map on the broadcast side of both left joins; the
    // base map and the arrival list stream through without an exchange.
    val existingOut = base
      .join(broadcast(merged), col("comp") === col("lab"), "left")
      .select(col("id"), coalesce(col("mcomp"), col("comp")).as("comp"))
    val newOut = fresh
      .join(broadcast(merged), col("id") === col("lab"), "left")
      .select(col("id"), coalesce(col("mcomp"), col("id")).as("comp"))
    existingOut.unionByName(newOut)
  }

  /** Dedup by components: drop every document that is not its cluster's
    * canonical (minimum-id) representative. Documents with no near-dup
    * pair survive untouched (left-anti against the non-canonical set).
    */
  def keepCanonical(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      numPartitions: Option[Int] = None): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol, numPartitions = numPartitions)
    val losers = comps.filter(col("id") =!= col("comp")).select(col("id"))
    // anti-join strategy left to Catalyst/AQE: the loser set can be tiny
    // (broadcast) or a large fraction of the corpus (shuffled hash).
    docs.join(losers, docs(idCol) === losers("id"), "left_anti")
  }
}
