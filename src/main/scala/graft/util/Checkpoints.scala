package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the executor blocks of a `localCheckpoint(true)` frame.
  *
  * `Dataset.localCheckpoint` persists its internal RDD directly (it never
  * registers with the CacheManager), so `Dataset.unpersist()` is a no-op on
  * it — iterative loops that checkpoint each round would otherwise pin
  * O(rounds × |nodes|) blocks until the session-level releaseAll sweep,
  * which library callers outside Bench/Verify never run.
  */
object Checkpoints {
  /** Unpersist the checkpointed RDD behind `df` if `df` is (a projection
    * of) a localCheckpoint frame; silently does nothing otherwise. Safe to
    * call while downstream frames derived from `df` are still unconsumed
    * ONLY if their results have already materialized (the iterative-loop
    * pattern: call on round N-1's frame after round N's eager checkpoint).
    *
    * SINGLE-LEAF contract: `df` must derive from AT MOST ONE checkpointed
    * frame. A frame built from two checkpointed inputs (e.g. a join of
    * round-N labels with a separately checkpointed edge frame) would have
    * this sweep silently release the still-live sibling's blocks — refuse
    * loudly instead; release each input through its own original frame.
    */
  def release(df: DataFrame): Unit = {
    val leaves = df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
    require(leaves.size <= 1,
      s"Checkpoints.release expects a frame derived from at most one localCheckpoint " +
        s"(got ${leaves.size} LogicalRDD leaves) — releasing all of them would drop a " +
        "still-live sibling's blocks; call release on each original frame instead")
    leaves.foreach(_.unpersist(blocking = false))
  }
}
