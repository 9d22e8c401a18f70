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
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
      .foreach(_.unpersist(blocking = false))
}
