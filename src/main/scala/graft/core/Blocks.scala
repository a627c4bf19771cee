package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit release of `localCheckpoint` storage.
  *
  * `Dataset.localCheckpoint(eager = true)` materializes the plan into
  * BlockManager blocks owned by an internal RDD; those blocks are freed only
  * when the ContextCleaner notices the RDD became unreachable — i.e. after a
  * driver GC. Iterative algorithms (connected components, BFS, k-means) that
  * checkpoint per round therefore pin every superseded round's blocks for
  * the rest of the session, evicting useful cache and forcing spills in a
  * long multi-query run. This helper drops them eagerly.
  *
  * Safety contract: only call on frames that are themselves checkpoints (or
  * cheap projections over one) AND will never be read again — a local
  * checkpoint has no lineage, so a freed block cannot be recomputed.
  */
object Blocks {

  /** Unpersist the checkpoint blocks reachable from `df`'s analyzed plan.
    * No-op for frames that contain no `LogicalRDD` leaf. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach { rdd =>
      if (rdd.getStorageLevel.isValid) rdd.unpersist(blocking = false)
    }
}
