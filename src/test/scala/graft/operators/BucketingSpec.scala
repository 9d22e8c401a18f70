package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bucketing: the co-located-join pattern for repeated large⋈large joins at
  * 100 TB — both sides pre-hashed into the same bucket layout at WRITE time,
  * so the join needs no exchange at READ time (the shuffle is paid once, not
  * per query). This suite proves the plan property end-to-end with this
  * build's actual session config rather than asserting it from folklore.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed fact⋈fact join runs with ZERO exchanges") {
    val fact1 = "graft_bucket_fact1"
    val fact2 = "graft_bucket_fact2"
    try {
      spark.range(0, 10000).toDF("k")
        .withColumn("v1", col("k") * 2)
        .write.bucketBy(8, "k").sortBy("k").format("parquet")
        .mode("overwrite").saveAsTable(fact1)
      spark.range(0, 10000).toDF("k")
        .withColumn("v2", col("k") + 7)
        .write.bucketBy(8, "k").sortBy("k").format("parquet")
        .mode("overwrite").saveAsTable(fact2)

      // force the shuffle-join path (both sides "large"): broadcast off
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table(fact1).join(spark.table(fact2), Seq("k"))
          .agg(sum(col("v1") + col("v2")).as("s"))
        assert(joined.head.getLong(0) == (0L until 10000L).map(k => 3 * k + 7).sum)
        val plan = joined.queryExecution.executedPlan.toString
        // bucket layout satisfies the join's distribution on BOTH sides: the
        // only exchange allowed is the 1-row final aggregate's
        val exchanges = "Exchange hashpartitioning\\(k".r.findAllIn(plan).size
        assert(exchanges == 0, s"bucketed join should not shuffle on k:\n$plan")
        assert(plan.contains("SortMergeJoin"), plan)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $fact1")
      spark.sql(s"DROP TABLE IF EXISTS $fact2")
    }
  }
}
