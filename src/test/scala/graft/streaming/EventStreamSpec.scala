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
    // ts → epoch-nanos long at staging so the stream schema (ts LONG) holds
    val df = graft.util.EventTicks.toNanos(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
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

  test("windowed t-digest quantiles drain within tolerance of exact per-window percentiles") {
    val src = tmpDir("events-src-td"); val ckpt = tmpDir("stream-ckpt-td")
    stageEvents(src)
    val q = EventStream.windowedQuantiles(EventStream.readEvents(spark, src))
      .writeStream
      .format("memory").queryName("win_quant")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // batch twin uses the SAME estimator (t-digest); at these per-window
    // cardinalities centroids stay uncompressed, so the drained stream
    // must land within sketch tolerance of the batch read — plus a hard
    // rank sandwich against exact order statistics
    val batch = spark.read.parquet(src)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(expr("percentile_tdigest(tdigest(CAST(value AS DOUBLE)), 50.0)").as("b50"),
        expr("percentile_tdigest(tdigest(CAST(value AS DOUBLE)), 95.0)").as("b95"),
        min(col("value").cast("double")).as("vmin"),
        max(col("value").cast("double")).as("vmax"))
      .select(col("window.start").as("ws"), col("b50"), col("b95"), col("vmin"), col("vmax"))
      .collect()
      .map(r => r.getTimestamp(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    val rows = spark.table("win_quant").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b50, b95, vmin, vmax) = batch(r.getTimestamp(0))
      val span = math.max(1.0, vmax - vmin)
      assert(math.abs(r.getDouble(2) - b50) <= 0.05 * span + 1e-9,
        s"p50 ${r.getDouble(2)} vs batch tdigest $b50")
      assert(math.abs(r.getDouble(3) - b95) <= 0.05 * span + 1e-9,
        s"p95 ${r.getDouble(3)} vs batch tdigest $b95")
      // hard envelope: estimates can never leave the window's value range
      assert(r.getDouble(2) >= vmin - 1e-9 && r.getDouble(2) <= vmax + 1e-9)
      assert(r.getDouble(3) >= vmin - 1e-9 && r.getDouble(3) <= vmax + 1e-9)
    }
  }

  test("windowed bottom-k sample drain EQUALS the batch answer exactly") {
    val src = tmpDir("events-src-bk"); val ckpt = tmpDir("stream-ckpt-bk")
    stageEvents(src)
    val q = EventStream.windowedSample(EventStream.readEvents(spark, src))
      .writeStream
      .format("memory").queryName("win_sample")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // the bottom-k-by-md5 sample is merge-order independent, so unlike the
    // t-digest twin the drained stream matches the batch read bit for bit
    val batch = spark.read.parquet(src)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(expr("bottomk_values(sample_bottomk(CAST(user_id AS STRING), 8))").as("sample"))
      .select(col("window.start").as("ws"), col("sample"))
      .collect().map(r => r.getTimestamp(0) -> r.getString(1)).toMap

    val rows = spark.table("win_sample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(batch(r.getTimestamp(0)) == r.getString(2),
        s"window ${r.getTimestamp(0)}: stream sample != batch sample")
    }
  }

  test("sliding-window rolling counts match the batch twin on closed windows") {
    val src = tmpDir("events-src9"); val ckpt = tmpDir("stream-ckpt9")
    stageEvents(src)
    val q = EventStream.slidingCounts(EventStream.readEvents(spark, src))
      .writeStream
      .format("memory").queryName("sliding_counts")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sliding_counts").collect()
    assert(streamed.nonEmpty)
    // batch twin: identical overlapping-window assignment; HLL sketch
    // merge is order-independent, so approx_users must agree EXACTLY
    val batch = spark.read.parquet(src)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "6 hours", "1 hour"))
      .agg(count(lit(1)).as("n"), approx_count_distinct("user_id").as("approx_users"))
      .select(col("window.start").as("ws"), col("n"), col("approx_users")).collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    streamed.foreach { r =>
      val (n, u) = batch(r.getTimestamp(0))
      assert(r.getLong(2) == n && r.getLong(3) == u)
    }
    // each event lands in windowLen/slide = 6 windows; emitted (closed)
    // windows never exceed the full batch set
    assert(streamed.length <= batch.size)
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
    val df = graft.util.EventTicks.toNanos(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet")).limit(200)
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
    // sf0.001 events span ~30 days; a 60-day horizon keeps every sequence
    // alive for the drain so the unbounded batch answer is reproduced
    val q = EventStream.funnel(
        EventStream.readEvents(spark, src), Seq("signup", "purchase"),
        horizonMinutes = 60 * 24 * 60)
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

  /** One crafted events file per call → one micro-batch each under
    * `maxFilesPerTrigger = 1` (file source drains oldest-mtime first; the
    * sleep keeps mtimes strictly ordered). ts is epoch NANOS.
    */
  private def writeEventsFile(
      dir: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(60)
  }

  test("funnel state expires past the event-time horizon and its key is freed") {
    val src = tmpDir("events-src7"); val ckpt = tmpDir("stream-ckpt7")
    val t0 = 1704067200L * 1000000000L // 2024-01-01T00:00Z in ns
    def at(min: Long) = t0 + min * 60L * 1000000000L
    // batch 1: user 1 starts a funnel (signup only)
    writeEventsFile(src, Seq((1L, at(0), 1L, "signup", 0.5, "{}")))
    // batches 2-3: lone purchases (match no extendable step → leave no state)
    // push the watermark to ~170 then ~175 min, past user 1's 60-min horizon,
    // so batch 3's timeout sweep drops user 1's incomplete sequence
    writeEventsFile(src, Seq((2L, at(180), 999L, "purchase", 0.5, "{}")))
    writeEventsFile(src, Seq((3L, at(185), 998L, "purchase", 0.5, "{}")))
    // batch 4: user 1's purchase arrives AFTER expiry → must not complete;
    // user 2 runs a fresh signup→purchase inside the horizon → must complete
    writeEventsFile(src, Seq(
      (4L, at(200), 1L, "purchase", 0.5, "{}"),
      (5L, at(190), 2L, "signup", 0.5, "{}"),
      (6L, at(200), 2L, "purchase", 0.5, "{}")))

    val q = EventStream.funnel(
        EventStream.readEvents(spark, src, maxFilesPerTrigger = 1),
        Seq("signup", "purchase"), horizonMinutes = 60)
      .writeStream
      .format("memory").queryName("funnel_expiry")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val hits = spark.table("funnel_expiry").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only user 2 completes; user 1's pre-expiry signup never attributes
    assert(hits == Set((2L, at(190) / 1000, at(200) / 1000)))
    // and the store is empty: expired (user 1), completed (user 2), and
    // no-step rows (999/998) all freed their keys
    assert(q.lastProgress.stateOperators.head.numRowsTotal == 0L)
  }

  test("funnelScan with arbitrary conditions equals batch ScanSteps on one drain") {
    val src = tmpDir("events-src8"); val ckpt = tmpDir("stream-ckpt8")
    stageEvents(src)
    val steps = Seq(
      "s" -> (col("event_type") === "signup" && col("value") > 0.3),
      "p" -> (col("event_type") === "purchase" && col("value") > 0.3))
    val q = EventStream.funnelScan(
        EventStream.readEvents(spark, src), steps, horizonMinutes = 60 * 24 * 60)
      .writeStream
      .format("memory").queryName("funnel_cond")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("funnel_cond").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)

    val batch = graft.operators.ScanSteps.scanSteps(
      spark.read.parquet(src)
        .select(col("user_id"), col("event_type"), col("value"),
          expr("ts div 1000").as("us")),
      Seq("user_id"), "us", ascending = true, steps)
      .select("user_id", "s_us", "p_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming sequence_detect equals the batch plugin lowering on one drain") {
    val src = tmpDir("events-src9"); val ckpt = tmpDir("stream-ckpt9")
    stageEvents(src)
    val steps = Seq(
      "s" -> (col("event_type") === "signup"),
      "p" -> (col("event_type") === "purchase"))
    // 3-day adjacent-gap bound, 5-day span bound (µs) — tight enough that
    // some scanSteps completions DROP, so the bounds are exercised for real
    val maxStep = 3L * 86400 * 1000000
    val maxSpan = 5L * 86400 * 1000000
    val q = EventStream.sequenceDetectStream(
        EventStream.readEvents(spark, src), steps, maxStep, maxSpan,
        horizonMinutes = 60 * 24 * 60)
      .writeStream
      .format("memory").queryName("seq_hits")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("seq_hits").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).head, r.getSeq[Long](1).last, r.getLong(2)))
      .toSet
    assert(streamed.nonEmpty)

    // the batch sequence_detect recipe: ScanSteps, then gap/span filters
    // and the duration column — applied on the same µs axis
    val all = graft.operators.ScanSteps.scanSteps(
      spark.read.parquet(src)
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us")),
      Seq("user_id"), "us", ascending = true, steps)
    val batch = all
      .filter(col("p_us") - col("s_us") <= maxStep &&
        col("p_us") - col("s_us") <= maxSpan)
      .select(col("user_id"), col("s_us"), col("p_us"),
        (col("p_us") - col("s_us")).as("duration"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    // the bounds really dropped some completions (non-vacuous)
    assert(batch.size < all.count())
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

  test("heavy hitters: space-saving guarantees hold vs exact batch counts") {
    val src = tmpDir("events-src10"); val ckpt = tmpDir("stream-ckpt10")
    val t0 = 1704067200L * 1000000000L
    def at(min: Long) = t0 + min * 60L * 1000000000L
    // window 1 (minutes 0-59): skewed keys — a×30, b×20, c×10, plus 15
    // distinct singletons; capacity 8 counters, N=75, N/m≈9.4 → a, b, c are
    // GUARANTEED in the summary. A later batch pushes the watermark past
    // the window end so the timeout sweep emits the snapshot.
    val heavy = (1 to 30).map(i => (100L + i, at(i % 50), i.toLong, "a", 1.0, "{}")) ++
      (1 to 20).map(i => (200L + i, at(i % 50), i.toLong, "b", 1.0, "{}")) ++
      (1 to 10).map(i => (300L + i, at(i % 50), i.toLong, "c", 1.0, "{}")) ++
      (1 to 15).map(i => (400L + i, at(i % 50), i.toLong, s"z$i", 1.0, "{}"))
    writeEventsFile(src, heavy)
    writeEventsFile(src, Seq((999L, at(200), 999L, "late", 1.0, "{}")))

    val q = EventStream.heavyHittersStream(
        EventStream.readEvents(spark, src, maxFilesPerTrigger = 1),
        keyCol = "event_type", windowLenMinutes = 60, capacity = 8, topK = 3)
      .writeStream
      .format("memory").queryName("hh")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val rows = spark.table("hh").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 == t0 / 1000)
    // the three true heavy keys are identified, in order
    assert(rows.map(_._2).toSeq == Seq("a", "b", "c"), rows.mkString(", "))
    val exact = Map("a" -> 30L, "b" -> 20L, "c" -> 10L)
    rows.foreach { case (_, k, est, err) =>
      // space-saving invariant: est − err ≤ true ≤ est
      assert(est >= exact(k) && est - err <= exact(k), s"$k est=$est err=$err")
    }
    // bounded state: emitted-and-removed window leaves nothing behind
    assert(q.lastProgress.stateOperators.head.numRowsTotal <= 1L) // late window only
  }
}
