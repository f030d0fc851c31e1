package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit release of `localCheckpoint` storage.
  *
  * A localCheckpoint'd Dataset is a `LogicalRDD` over an RDD persisted in
  * the block manager — `Dataset.unpersist` does NOT touch it (that only
  * clears CacheManager entries from `.cache()`), so checkpoint blocks
  * normally live until a driver GC lets the ContextCleaner collect the RDD
  * reference. On a large driver heap a full GC may never happen mid-run,
  * and iterative operators that checkpoint per call (dupClusters, the
  * quality-classifier trainer, PageRank) accumulate dead blocks that
  * squeeze unified memory. Operators call [[release]] the moment a
  * checkpoint is provably dead (the value they return no longer references
  * it) instead of waiting for GC.
  */
object Checkpoints {

  /** Drop the block-manager storage behind a localCheckpoint'd Dataset.
    * Safe ONLY when nothing will read `ds` (or a plan built on it) again —
    * a local checkpoint cannot be recomputed once its blocks are gone.
    * Returns false (no-op) when `ds` is not checkpoint-backed.
    */
  def release(ds: Dataset[_]): Boolean = ds.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false); true
    case _ => false
  }
}
