package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark's planner turns a bare non-equi predicate join (`p.ts >= i.start AND
  * p.ts < i.end`) into a nested-loop join — O(|points| × |intervals|)
  * comparisons and, without a broadcastable side, a cartesian shuffle. That
  * dies long before 100 TB.
  *
  * The scalable shape buckets the axis: every interval explodes into the
  * buckets it covers (at most `len/bucketWidth + 1` rows), every point maps
  * to exactly ONE bucket, and each qualifying (point, interval) pair meets in
  * exactly one bucket — so the join becomes an EQUI-join on the bucket id
  * with a residual range predicate, no dedup needed. One shuffle per side
  * (or none on the small side when AQE picks broadcast-hash), partial
  * pushdown and codegen intact, AQE's skew handling applies to hot buckets.
  *
  * Pick `bucketWidth` near the TYPICAL interval length: much smaller
  * multiplies the interval-side explode factor; much larger inflates the
  * candidate pairs the residual filter must discard. Both sides must not
  * share column names apart from the generated bucket id (standard join
  * hygiene — rename before calling).
  *
  * Reference analog: none (the reference's joins are metadata-scale); this is
  * the training-pipeline event-alignment primitive (events ↔ incident
  * windows, logs ↔ deploy windows, clicks ↔ campaign flights).
  */
object RangeJoin {

  private val BucketCol = "__graft_range_bucket"

  /** Join `points` to every interval containing them:
    * `start <= point < end`. `pointCol`, `startCol`, `endCol` are LONG
    * columns on an arbitrary shared numeric axis (epoch-nanos works as-is).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn(BucketCol, expr(s"`$pointCol` div $bucketWidth"))
    // end is exclusive: the last covered bucket is the one holding end-1;
    // an empty interval (end <= start) yields an empty sequence → no rows
    val iv = intervals.withColumn(BucketCol, explode(
      when(col(endCol) > col(startCol),
        sequence(expr(s"`$startCol` div $bucketWidth"),
                 expr(s"(`$endCol` - 1) div $bucketWidth")))))
    p.join(iv, Seq(BucketCol), "inner")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop(BucketCol)
  }
}
