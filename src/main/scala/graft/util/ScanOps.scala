package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Distributed prefix operations in the frame's CURRENT global order.
  *
  * The naive Spark spelling — `sum(x) OVER (ORDER BY …)` — is a
  * single-partition WindowExec: every row moves to one task. The scalable
  * shape is the classic two-pass scan: after a global sort the frame is
  * RANGE-partitioned, so (1) one lightweight job folds each partition to a
  * single partial sum (the driver collects P scalars, not rows), (2) a
  * zero-shuffle second pass re-walks each partition carrying its exclusive
  * prefix offset. Both passes hang off the SAME RDD, so the sort's shuffle
  * files are computed once and re-read — no cache, no recomputation of the
  * upstream plan.
  */
object ScanOps {

  /** Append `outCol` = running sum of `valueCol` in the current row order.
    * Integral inputs accumulate in Long (exact, overflow-checked);
    * fractional in Double. Nulls contribute zero and yield the running sum
    * so far.
    */
  def cumSum(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(valueCol)
    val integral = df.schema(idx).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType                        => false
      case dt => throw new IllegalArgumentException(
        s"row_cumsum needs a numeric column, got ${dt.catalogString}")
    }
    val rdd = df.rdd
    if (integral) {
      def valueOf(r: Row): Long =
        if (r.isNullAt(idx)) 0L else r.get(idx).asInstanceOf[java.lang.Number].longValue()
      val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = 0L
        it.foreach(r => acc = Math.addExact(acc, valueOf(r)))
        Iterator((pid, acc))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = partials.scanLeft(0L)(Math.addExact)
      val out = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = offsets(pid)
        it.map { r => acc = Math.addExact(acc, valueOf(r)); Row.fromSeq(r.toSeq :+ acc) }
      }
      df.sparkSession.createDataFrame(out, df.schema.add(outCol, LongType, nullable = false))
    } else {
      def valueOf(r: Row): Double =
        if (r.isNullAt(idx)) 0.0 else r.get(idx).asInstanceOf[java.lang.Number].doubleValue()
      val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = 0.0
        it.foreach(r => acc += valueOf(r))
        Iterator((pid, acc))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = partials.scanLeft(0.0)(_ + _)
      val out = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = offsets(pid)
        it.map { r => acc += valueOf(r); Row.fromSeq(r.toSeq :+ acc) }
      }
      df.sparkSession.createDataFrame(out, df.schema.add(outCol, DoubleType, nullable = false))
    }
  }
}
