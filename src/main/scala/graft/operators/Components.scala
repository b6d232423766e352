package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a near-dup candidate-pair graph —
  * the stage that turns pairwise LSH/cosine matches into dedup GROUPS
  * (each document keeps/drops by its cluster's canonical representative).
  *
  * Algorithm: iterative minimum-label propagation — every node adopts the
  * smallest component id among itself and its neighbors until fixpoint.
  * Each iteration is one join + one groupBy (both shuffle on node id);
  * iterations needed = graph diameter, which for near-dup clusters is tiny
  * (clusters are dense cliques from banding). The fixpoint is unique, so
  * the result is deterministic regardless of execution order. Lineage is
  * truncated with localCheckpoint every few rounds so long runs don't build
  * unbounded plans. The driver loop iterates CONTROL, never data — all data
  * movement stays distributed (this is the standard Spark shape for
  * iterative graph algorithms; GraphX/graphframes do the same underneath).
  */
object Components {

  /** @param pairs edge list (two id columns, undirected)
    * @return (id, comp) — comp = smallest node id in the component
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIter: Int = 25,
      numPartitions: Option[Int] = None): DataFrame = {
    // numPartitions: per-iteration join cost is dominated by task overhead
    // when the graph is small relative to the session's shuffle partitions;
    // callers that know the graph is modest can shrink it (scale runs leave
    // it None and inherit the session parallelism).
    val edgesRaw = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
    val edges = numPartitions.map(edgesRaw.repartition(_)).getOrElse(edgesRaw).persist()

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // neighbor propagation: min component among direct neighbors
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst2"),
          col("dst") === col("dst2"))
        .groupBy(col("src"))
        .agg(min("comp").as("ncomp"))
        .withColumnRenamed("src", "nid")
      // pointer jumping: also adopt the component of one's component
      // (halves the remaining diameter each round -> O(log d) rounds on
      // chains instead of O(d))
      val hop = labels
        .join(
          labels.select(col("id").as("cid"), col("comp").as("ccomp")),
          col("comp") === col("cid"))
        .select(col("id").as("hid"), col("ccomp"))
      val updated = labels
        .join(neighborMin, col("id") === col("nid"), "left")
        .join(hop, col("id") === col("hid"), "left")
        .select(col("id"),
          least(
            col("comp"),
            coalesce(col("ncomp"), col("comp")),
            coalesce(col("ccomp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
        // eager checkpoint: truncate lineage NOW so per-iteration cost stays
        // constant (lazy checkpointing let plans grow superlinearly)
        .localCheckpoint(true)
      changed = updated.filter(col("comp") =!= col("prev")).count()
      // The previous round's checkpoint blocks are NOT freed by
      // Dataset.unpersist (localCheckpoint persists at the RDD level,
      // outside the CacheManager); dropping the reference here lets the
      // ContextCleaner reclaim them asynchronously once GC'd.
      labels = updated.select("id", "comp")
      iter += 1
    }
    edges.unpersist()
    labels
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
