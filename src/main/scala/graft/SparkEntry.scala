package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Surface

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator registry itself lives in [[graft.operators.Surface]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the 6-table star join with broadcast dims (q5_region_revenue).
    */
  def entry(spark: SparkSession): DataFrame =
    Surface.registry("q5_region_revenue").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Surface.queries

  /** DuckDB oracle twins (same column names, aligned types) — one per
    * registered query, no exceptions: approximate operators (minhash /
    * simhash / LSH / IVF / sketches) emit in-plan recall or tolerance
    * booleans computed against an exact answer, which their oracles assert
    * TRUE, so nothing falls back to a rows-only check.
    */
  def oracleSql: Map[String, String] = Surface.oracleSql
}
