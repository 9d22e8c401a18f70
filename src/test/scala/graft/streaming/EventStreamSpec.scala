package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

class EventStreamSpec extends SparkSuite {

  /** Copy the sf0.001 events table into a stream-source dir as two "arrival"
    * files so the file source sees multiple input splits.
    */
  private def stageEvents(dir: String): Unit = {
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.filter(col("event_id") % 2 === 0).write.mode("append").parquet(dir)
    df.filter(col("event_id") % 2 === 1).write.mode("append").parquet(dir)
  }

  test("windowed counts with AvailableNow drain equal the batch answer") {
    val src = tmpDir("events-src"); val ckpt = tmpDir("stream-ckpt")
    stageEvents(src)
    val q = EventStream.windowedCounts(EventStream.readEvents(spark, src))
      .writeStream
      .format("memory").queryName("win_counts")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_counts")
      .agg(sum("n")).head.getLong(0)
    // append mode emits only watermark-closed windows; the final window stays
    // open, so streamed <= batch and all closed windows must match the batch
    val batch = spark.read.parquet(s"$src")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val batchByKey = batch
      .select(col("window.start").as("ws"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamRows = spark.table("win_counts").collect()
    assert(streamRows.nonEmpty)
    streamRows.foreach { r =>
      assert(batchByKey((r.getTimestamp(0), r.getString(1))) == r.getLong(2))
    }
    assert(streamed <= batchByKey.values.sum)
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    val src = tmpDir("events-src2"); val ckpt = tmpDir("stream-ckpt2")
    stageEvents(src)
    val q = EventStream.sessionize(EventStream.readEvents(spark, src), gapMinutes = 30)
      .writeStream
      .format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val rows = spark.table("sessions").collect()
    assert(rows.nonEmpty)
    // sessions are well-formed: start<=end, positive counts, gap respected
    rows.foreach { r =>
      assert(r.getAs[Long]("session_start_us") <= r.getAs[Long]("session_end_us"))
      assert(r.getAs[Long]("n_events") >= 1)
    }
    // closed-session counts never exceed total events per user
    val perUser = spark.read.parquet(src).groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      assert(rs.map(_.getAs[Long]("n_events")).sum <= perUser(u))
    }
  }

  test("streaming dedup drops re-delivered files within the watermark") {
    val src = tmpDir("events-src3"); val ckpt = tmpDir("stream-ckpt3")
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(200)
    df.write.mode("append").parquet(src)
    df.write.mode("append").parquet(src) // duplicate delivery
    val q = EventStream.dedupStream(EventStream.readEvents(spark, src), Seq("event_id"))
      .writeStream
      .format("memory").queryName("deduped")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.table("deduped").select("event_id").distinct().count()
    assert(spark.table("deduped").count() == n) // no dup event ids in output
  }

  test("streaming funnel equals the batch ScanSteps answer on one drain") {
    val src = tmpDir("events-src6"); val ckpt = tmpDir("stream-ckpt6")
    stageEvents(src)
    val q = EventStream.funnel(
        EventStream.readEvents(spark, src), Seq("signup", "purchase"))
      .writeStream
      .format("memory").queryName("funnel_hits")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("funnel_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)

    val batch = graft.operators.ScanSteps.scanSteps(
      spark.read.parquet(src)
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us")),
      Seq("user_id"), "us", ascending = true,
      Seq("s" -> (col("event_type") === "signup"),
          "p" -> (col("event_type") === "purchase")))
      .select("user_id", "s_us", "p_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch) // identical completions + attribution
  }

  test("stream-stream attribution join matches the batch answer") {
    val src = tmpDir("events-src5"); val ckpt = tmpDir("stream-ckpt5")
    stageEvents(src)
    val events = EventStream.readEvents(spark, src)
    val q = EventStream.attributionJoin(
        events.filter(col("event_type") === "click"),
        events.filter(col("event_type") === "purchase"),
        windowMinutes = 60)
      .writeStream
      .format("memory").queryName("attributed")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("attributed")
    // batch twin over the same files with the identical join condition
    val all = spark.read.parquet(src)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val c = all.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("event_time").as("click_time"))
    val p = all.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("event_time").as("purchase_time"))
    val batch = p.join(c, Seq("user_id"))
      .filter(col("click_time") <= col("purchase_time") &&
        col("click_time") >= col("purchase_time") - expr("INTERVAL 60 MINUTES"))
    assert(streamed.count() > 0)
    // watermark-held pairs may still be buffered at AvailableNow shutdown;
    // everything EMITTED must be a subset of the batch join, keyed exactly
    assert(streamed.count() <= batch.count())
    val batchKeys = batch.select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    streamed.select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .foreach(k => assert(batchKeys.contains(k), s"stream emitted non-batch pair $k"))
  }

  test("stream-static enrichment joins the broadcast dim per micro-batch") {
    val src = tmpDir("events-src4"); val ckpt = tmpDir("stream-ckpt4")
    stageEvents(src)
    val dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))
    val q = EventStream.enrich(EventStream.readEvents(spark, src), dim, "user_id")
      .writeStream
      .format("memory").queryName("enriched")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val out = spark.table("enriched")
    val total = spark.read.parquet(src).count()
    assert(out.count() == total) // left_outer: no event dropped or fanned out
    // events with a matching customer carry its nation; the join matches the
    // batch answer
    val batchMatched = spark.read.parquet(src).join(dim, Seq("user_id")).count()
    assert(out.filter(col("c_nationkey").isNotNull).count() == batchMatched)
    assert(batchMatched > 0)
  }
}
