package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer fixed-point PageRank — iterative graph importance with an
  * EXACT cross-engine contract, run here over the near-dup candidate
  * graph (importance = how central a document is in its duplication
  * neighborhood; template hubs rank high, and a curation pass can keep
  * the hub as the canonical and drop satellites).
  *
  * DETERMINISM: the textbook damped update r' = (1-d)/N + d * sum(r/deg)
  * is all divisions — so everything is scaled to BIGINT fixed point
  * (Scale = 1e12) and every division is an explicit truncating div at a
  * FIXED point in the dataflow: contrib = r div outdeg once per NODE
  * (not per edge — same value either way, one convention), teleport =
  * (15 * (Scale div N)) div 100, damped sum = (85 * s) div 100. Sums of
  * exact integers are order-independent, so the result is identical
  * under any partitioning and in any engine; the oracle unrolls the same
  * iterations as generated CTE triplets (recursive CTEs cannot aggregate
  * in the recursive term).
  *
  * Scale shape per iteration: one node-keyed broadcast-sized join
  * (ranks x degrees), one edge-keyed equi-join carrying a single long
  * per edge, one map-side-combined sum onto the node space — the
  * [[Components]] iteration discipline, with localCheckpoint pruning
  * lineage between rounds so the plan does not grow with iterations.
  * Total mass is bounded by Scale, so 85 * s never nears Long range.
  */
object PageRank {

  val Scale = 1000000000000L

  /** `iterations` damped fixed-point rounds over directed (src, dst)
    * edges (symmetrize first for an undirected graph). Nodes are the
    * distinct edge endpoints; every node with an out-edge contributes,
    * and in a symmetric graph there are no dangling nodes. Output:
    * (id, rank) with rank the BIGINT fixed-point mass at `Scale`.
    *
    * @param driverEdgeLimit max edge count for the driver fixed-point
    *        shortcut (r21 optimization, the [[Components]] device): the
    *        update is EXACT integer arithmetic, so a local loop over a
    *        collected broadcast-scale edge list is bit-identical to the
    *        distributed rounds while skipping `iterations` x (join +
    *        aggregate) stages of tiny tasks. Sub-corpus/derived graphs
    *        take it; corpus-scale graphs exceed the limit and keep the
    *        distributed shape. 0 disables (spec hook).
    */
  def ranks(
      edges: DataFrame,
      iterations: Int = 5,
      numPartitions: Option[Int] = None,
      driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    // One persisted projection serves the strategy count, the driver
    // collect, AND (on fall-through) the distributed loop's checkpoint
    // source — a join-derived edge frame is computed exactly once
    // either way (the r21 dupgraph_touched lesson: counting and
    // collecting an unpersisted frame re-ran its semi-join derivation).
    val cached = edges.select(col("src"), col("dst")).persist()
    try {
      driverRanks(cached, iterations, driverEdgeLimit, global = true) match {
        case Some(local) => return local
        case None => ()
      }
    val part = numPartitions.getOrElse(
      edges.sparkSession.sessionState.conf.numShufflePartitions)
    // Iteration count is FIXED (no convergence check), so no round needs
    // its own driver action: every round is a LAZY localCheckpoint —
    // which still truncates the logical plan, keeping plan size
    // iteration-count-invariant — and only the LAST round is eager,
    // evaluating the whole chain as ONE multi-stage job (each round's
    // RDD computed once, then block-cached for the next). Session
    // hygiene (round-10 q13 regression): once that job lands, every
    // intermediate round plus e/deg/nodes is materialized and dead, and
    // is released immediately — only the returned frame stays pinned.
    // Compare Components.connectedComponents, where the per-round
    // convergence count forces eager rounds (released one behind).
    val intermediates = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val e = cached.repartition(part, col("src")).localCheckpoint(false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(false)
    val nRow = nodes.agg(count(lit(1)).as("__n"))
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("id"), expr(s"${Scale}L div __n").as("rank"))
      .localCheckpoint(false)
    intermediates ++= Seq(e, deg, nodes, ranks)
    for (i <- 1 to iterations) {
      val next = nodes
        .crossJoin(broadcast(nRow))
        .join(dampedSums(e, deg, ranks), Seq("id"), "left")
        .select(col("id"),
          (expr(s"(15 * (${Scale}L div __n)) div 100") +
            expr("(85 * coalesce(__s, CAST(0 AS BIGINT))) div 100")).as("rank"))
        .localCheckpoint(i == iterations)
      if (i < iterations) intermediates += next
      ranks = next
    }
    intermediates.foreach(Checkpoints.release)
    ranks
    // The final round's EAGER checkpoint above has materialized the
    // whole chain, so the cached projection is dead; the finally frees
    // it on success and failure alike (and right after a driver-path
    // return).
    } finally cached.unpersist(blocking = false)
  }

  /** COMPONENT-LOCAL fixed-point ranks — the same damped update with the
    * graph-global terms removed: r0 = `Scale` for EVERY node and a
    * constant teleport `(15 * Scale) div 100`, i.e. the unnormalized
    * form (per-node mass starts at 1.0 in fixed point; nothing divides
    * by the graph's node count). Because rank mass moves only along
    * edges, a node's local rank depends on nothing outside its connected
    * component — ranking a component's subgraph alone yields bit-equal
    * values to ranking it inside the full graph. That independence is
    * the contract incremental rank maintenance needs (an ingest batch
    * perturbs only the components it touches; every other component's
    * ranks are reusable as-is), which graph-size-normalized
    * [[ranks]] cannot offer: there, N changes globally on every arrival.
    * Same integer-exact determinism argument; per-node mass is bounded
    * by Scale * maxIndegree, far from Long range on LSH band graphs.
    */
  def localRanks(
      edges: DataFrame,
      iterations: Int = 5,
      numPartitions: Option[Int] = None,
      driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    // Same persisted-projection discipline as [[ranks]].
    val cached = edges.select(col("src"), col("dst")).persist()
    try {
      driverRanks(cached, iterations, driverEdgeLimit, global = false) match {
        case Some(local) => return local
        case None => ()
      }
    val part = numPartitions.getOrElse(
      edges.sparkSession.sessionState.conf.numShufflePartitions)
    // Same one-job lazy-round shape as [[ranks]] — see the comment there.
    val intermediates = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val e = cached.repartition(part, col("src")).localCheckpoint(false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(false)
    var ranks = nodes.select(col("id"), lit(Scale).as("rank"))
      .localCheckpoint(false)
    intermediates ++= Seq(e, deg, nodes, ranks)
    for (i <- 1 to iterations) {
      val next = nodes
        .join(dampedSums(e, deg, ranks), Seq("id"), "left")
        .select(col("id"),
          (lit((15L * Scale) / 100L) +
            expr("(85 * coalesce(__s, CAST(0 AS BIGINT))) div 100")).as("rank"))
        .localCheckpoint(i == iterations)
      if (i < iterations) intermediates += next
      ranks = next
    }
    intermediates.foreach(Checkpoints.release)
    ranks
    } finally cached.unpersist(blocking = false)
  }

  /** Driver fixed-point shortcut shared by [[ranks]] (global = true:
    * Scale div N initial mass + N-normalized teleport) and
    * [[localRanks]] (global = false: Scale initial mass + constant
    * teleport). Some(result) when the edge list fits `driverEdgeLimit`;
    * None = caller runs the distributed loop. The arithmetic mirrors
    * the distributed expressions operation for operation (`div` on
    * non-negative longs == Scala `/`), and integer sums are
    * order-independent, so the result is bit-identical — the same
    * exactness argument the operator's cross-engine oracle contract
    * already stands on. Edge MULTIPLICITY is preserved (no dedup):
    * outdeg counts parallel edges and each contributes, exactly as the
    * distributed join does.
    */
  private def driverRanks(
      edges: DataFrame,
      iterations: Int,
      driverEdgeLimit: Long,
      global: Boolean): Option[DataFrame] = {
    if (driverEdgeLimit <= 0) return None
    // The edge frame can be join-derived and expensive (the touched-
    // subgraph rankers); the strategy count and the collect must not
    // each recompute it. The caller hands us a PERSISTED frame and owns
    // its release (distributed fall-through reuses the same cache).
    val rows = {
      if (edges.count() > driverEdgeLimit) return None
      edges.collect()
    }
    val outdeg = scala.collection.mutable.LongMap.empty[Long]
    val nodes = scala.collection.mutable.LongMap.empty[Unit]
    rows.foreach { r =>
      val s = r.getLong(0); val d = r.getLong(1)
      outdeg(s) = outdeg.getOrElse(s, 0L) + 1L
      nodes(s) = (); nodes(d) = ()
    }
    val n = nodes.size.toLong
    if (n == 0L) {
      val session = edges.sparkSession
      import session.implicits._
      return Some(Seq.empty[(Long, Long)].toDF("id", "rank"))
    }
    val teleport =
      if (global) (15L * (Scale / n)) / 100L else (15L * Scale) / 100L
    val r0 = if (global) Scale / n else Scale
    var rank = scala.collection.mutable.LongMap.empty[Long]
    nodes.foreachKey(id => rank(id) = r0)
    for (_ <- 1 to iterations) {
      val sums = scala.collection.mutable.LongMap.empty[Long]
      rows.foreach { r =>
        val s = r.getLong(0); val d = r.getLong(1)
        sums(d) = sums.getOrElse(d, 0L) + rank(s) / outdeg(s)
      }
      val next = scala.collection.mutable.LongMap.empty[Long]
      nodes.foreachKey { id =>
        next(id) = teleport + (85L * sums.getOrElse(id, 0L)) / 100L
      }
      rank = next
    }
    val session = edges.sparkSession
    import session.implicits._
    Some(rank.toSeq.toDF("id", "rank"))
  }

  /** One round's damped in-neighbor sums: (id, __s). contrib = rank div
    * outdeg once per NODE, summed onto each in-neighbor — the shared
    * core of [[ranks]] and [[localRanks]].
    */
  private def dampedSums(
      e: DataFrame, deg: DataFrame, ranks: DataFrame): DataFrame =
    e.join(
        ranks.join(deg, col("id") === col("src"))
          .select(col("src"), expr("rank div outdeg").as("__c")),
        Seq("src"))
      .groupBy(col("dst").as("id"))
      .agg(sum("__c").as("__s"))
}
