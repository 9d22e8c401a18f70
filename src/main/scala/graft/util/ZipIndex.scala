package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global row index in the frame's CURRENT order — the scalable spelling.
  *
  * A global `ORDER BY` leaves the frame RANGE-partitioned, so
  * `zipWithIndex` (one lightweight per-partition count job plus a
  * zero-shuffle map) numbers rows in exactly that order. Deliberately NOT
  * `row_number() OVER (ORDER BY …)`, which collapses every row into a
  * single-partition WindowExec and dies at scale (PlanSpec bans it across
  * the registry).
  */
object ZipIndex {

  /** Append `name` = start, start+1, … in the frame's current global order. */
  def withRowIndex(df: DataFrame, name: String, start: Long = 1L): DataFrame = {
    val schema = df.schema.add(name, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + start))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
