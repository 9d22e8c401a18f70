package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan

import graft.SparkSuite

/** Bucketing = the storage-layout half of the 100 TB join story: two fact
  * tables bucketed on the join key co-locate, so the recurring join plans
  * with ZERO shuffle exchanges — the shuffle is paid once at write time
  * and amortized over every subsequent query. This spec pins that contract
  * on real testdata written through Spark's bucketed writer.
  */
class BucketJoinSpec extends SparkSuite {

  private def shuffles(p: SparkPlan): Int = p.collect {
    case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
    case q: QueryStageExec        => shuffles(q.plan)
    case _: ShuffleExchangeExec   => 1
  }.sum

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    // warehouse dir is a static conf — managed tables land in the default
    // warehouse and DROP TABLE below removes their data
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // make sure neither auto-broadcast nor AQE hides the contract: disable
    // broadcast so a non-bucketed plan WOULD have to shuffle both sides
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == spark.table("li_b").count())
      val nShuffles = shuffles(joined.queryExecution.executedPlan)
      // the join itself is shuffle-free (bucket co-location); the only
      // exchange allowed is the tiny post-join groupBy on o_orderstatus
      assert(nShuffles <= 1,
        s"bucketed join should plan <=1 exchange (the final groupBy), got $nShuffles:\n" +
          joined.queryExecution.executedPlan)

      // the unbucketed twin DOES shuffle both join sides — proves the
      // assertion above is measuring bucketing, not plan luck
      val plain = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet")
          .withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      plain.collect()
      assert(shuffles(plain.queryExecution.executedPlan) >= 2)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
