package graft

import org.apache.spark.sql.SparkSession

/** Prints `explain(formatted)` for selected queries — the plan-review loop:
  * check PushedFilters / ReadSchema on every scan, broadcast vs shuffle on
  * every join, and WholeStageCodegen span coverage.
  * `runMain graft.PlanDump [query ...]` (default: headline queries).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftSessionExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else operators.Surface.headlines
    names.foreach { n =>
      println(s"\n========== $n ==========")
      operators.Surface.registry(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
