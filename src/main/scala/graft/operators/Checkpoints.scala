package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for `localCheckpoint`-driven iterative loops.
  *
  * `Dataset.unpersist` releases CACHE-MANAGER entries (`df.persist`)
  * and is a no-op for the RDD a `localCheckpoint` materialized: the
  * checkpoint lives in the block manager keyed by the RDD inside the
  * plan's [[LogicalRDD]], and without an explicit release it only
  * drops when the ContextCleaner happens to GC the RDD object —
  * nondeterministic, and on a landmark centrality sweep the superseded
  * per-round state is the largest relation in the job. This helper
  * unpersists the underlying checkpoint RDD(s) directly, removing the
  * blocks deterministically (GraphSpec pins O(1) registered
  * checkpoints per loop, not O(levels)).
  *
  * Call it ONLY on DataFrames whose checkpoints are fully superseded —
  * it releases EVERY checkpoint embedded in the plan, so dropping a
  * composite that still feeds live lineage would strand downstream
  * consumers (a localCheckpoint cannot recompute: its lineage is
  * truncated by construction). */
object Checkpoints {
  def drop(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
