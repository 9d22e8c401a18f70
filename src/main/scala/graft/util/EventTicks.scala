package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader shim: surface the events timeline as epoch-NANOS LONG regardless
  * of the on-disk parquet encoding.
  *
  * The testdata generator has shipped `events.ts` both as TIMESTAMP(NANOS)
  * — which `spark.sql.legacy.parquet.nanosAsLong=true` already reads as a
  * long — and as TIMESTAMP(MICROS), which reads as TIMESTAMP_NTZ. Every
  * operator downstream (sessionization, as-of, scan/funnel, make-series,
  * the KQL surface) computes on the epoch-nanos long axis, so reads funnel
  * through here: a micros encoding converts by ×1000 (exact; the DuckDB
  * oracles are unaffected because DuckDB reads either encoding as TIMESTAMP
  * at µs precision). Sessions run with UTC session time zone, so the
  * NTZ→instant reinterpretation is identity.
  */
object EventTicks {

  def toNanos(df: DataFrame, c: String = "ts"): DataFrame =
    df.schema.find(_.name == c).map(_.dataType) match {
      case Some(LongType) => df
      case Some(TimestampNTZType) =>
        df.withColumn(c, unix_micros(col(c).cast(TimestampType)) * lit(1000L))
      case Some(TimestampType) =>
        df.withColumn(c, unix_micros(col(c)) * lit(1000L))
      case _ => df
    }
}
