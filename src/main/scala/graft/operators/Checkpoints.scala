package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit release of `localCheckpoint` block-manager state.
  *
  * The iterative operators ([[Components]], [[PageRank]]) truncate
  * lineage with an eager localCheckpoint per round; each checkpoint
  * persists its RDD in the block manager, and `Dataset.unpersist` does
  * NOT free it (localCheckpoint persists at the RDD level, outside the
  * CacheManager). Left alone, the blocks are reclaimed only by the async
  * ContextCleaner after the JVM garbage-collects the RDD reference — in
  * a long-lived session a build phase can therefore leave gigabytes
  * pinned while unrelated queries run (observed: a 4x slowdown on an
  * untouched window query right after the dup-graph derive phase).
  * This helper frees the blocks NOW: it walks the frame's logical plan
  * for [[LogicalRDD]] leaves — the node `localCheckpoint` returns — and
  * unpersists the underlying RDDs directly.
  *
  * Contract: call it only when the frame's CONTENT is no longer needed
  * (e.g. after materializing it to a table); a released checkpoint
  * cannot be recomputed — its lineage was truncated.
  */
object Checkpoints {

  /** Free the block-manager blocks behind every localCheckpointed leaf
    * of `df`'s plan. Non-blocking; safe on frames with no checkpointed
    * leaves (no-op) and on already-released frames (unpersist on an
    * unpersisted RDD is a no-op). Scoped to RDDs that actually ARE
    * materialized checkpoints (`isCheckpointed` — the public
    * checkpointed-and-materialized test; `isLocallyCheckpointed` is
    * private[spark]): a caller-supplied RDD-backed leaf (e.g.
    * `createDataFrame` over a deliberately persisted RDD) is someone
    * else's caching decision and must survive this cleanup. Every
    * in-repo call site releases after the checkpoint chain has run
    * (post table-write / post final eager round), so the guard never
    * skips a block this helper exists to free; a not-yet-materialized
    * lazy checkpoint has no blocks to free anyway.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical.collectLeaves().foreach {
      case lr: LogicalRDD if lr.rdd.isCheckpointed =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
