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
    */
  def ranks(
      edges: DataFrame,
      iterations: Int = 5,
      numPartitions: Option[Int] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val part = numPartitions.getOrElse(
      edges.sparkSession.sessionState.conf.numShufflePartitions)
    val e = edges.select(col("src"), col("dst"))
      .repartition(part, col("src")).localCheckpoint(false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(false)
    val nRow = nodes.agg(count(lit(1)).as("__n"))
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("id"), expr(s"${Scale}L div __n").as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to iterations) {
      val contrib = ranks.join(deg, col("id") === col("src"))
        .select(col("src"), expr("rank div outdeg").as("__c"))
      val sums = e.join(contrib, Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum("__c").as("__s"))
      ranks = nodes
        .crossJoin(broadcast(nRow))
        .join(sums, Seq("id"), "left")
        .select(col("id"),
          (expr(s"(15 * (${Scale}L div __n)) div 100") +
            expr("(85 * coalesce(__s, CAST(0 AS BIGINT))) div 100")).as("rank"))
        .localCheckpoint(false)
    }
    ranks
  }
}
