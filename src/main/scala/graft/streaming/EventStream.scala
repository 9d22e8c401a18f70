package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference's incremental loop (§2.h) is a hand-rolled micro-batch
  * engine; these are the Spark-native equivalents: file-source `readStream`,
  * event-time watermarks + windowed aggregation, and custom session state
  * via `flatMapGroupsWithState` — the pieces a continuous 100 TB ingest
  * pipeline composes. `Trigger.AvailableNow` gives the reference's
  * one-shot-drain semantics; `Trigger.ProcessingTime("5 seconds")` its
  * continuous 5 s probe loop (DeltaTableOrchestration.cs:16).
  */
object EventStream {

  /** Parquet schema of the events table; `ts` arrives as TIMESTAMP(NANOS)
    * which Spark surfaces as epoch-nanos long under `nanosAsLong`.
    */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files, with a real
    * event-time column recovered from the ns epoch.
    */
  def readEvents(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(EventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // admission control (O8 analog)
      .parquet(dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Watermarked tumbling-window counts per event type — the canonical
    * streaming aggregation (late data beyond 10 min dropped; state bounded).
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Watermarked per-window value quantiles — the streaming twin of the
    * tdigest sketch family. The t-digest TypedImperativeAggregate supports
    * partial merge, so it runs as a first-class streaming aggregation:
    * constant state per open window, closed windows emit the p50/p95 read
    * from the merged sketch and evict. Estimates carry the same ~1%
    * rank-accuracy contract as the batch family (merge order differs
    * between runs — gate against the exact answer with tolerance, not
    * equality).
    */
  def windowedQuantiles(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), windowLen))
      .agg(expr("tdigest(CAST(value AS DOUBLE))").as("td"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"),
        expr("percentile_tdigest(td, 50.0)").as("p50"),
        expr("percentile_tdigest(td, 95.0)").as("p95"))

  /** Watermarked per-window bottom-k distinct sample — the streaming twin
    * of the sample_bottomk sketch family. Unlike the t-digest twin this
    * drain is EXACTLY deterministic: the bottom-k-by-md5 sample is
    * insert-order- and merge-order-independent, so a drained stream equals
    * the batch answer bit for bit (spec-gated with equality, no tolerance).
    * Constant state per open window (k values), eviction by watermark.
    */
  def windowedSample(
      events: DataFrame, windowLen: String = "1 hour", k: Int = 8): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), windowLen))
      .agg(expr(s"sample_bottomk(CAST(user_id AS STRING), $k)").as("sk"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"),
        expr("bottomk_values(sk)").as("sample"))

  /** Sliding-window rolling counts — the streaming twin of the batch
    * `sliding_window_counts` plugin (ActivityMetrics). Spark's native
    * overlapping `window(col, len, slide)` assigns each event to its
    * len/slide covering windows (the same bounded explode shape as the
    * batch operator); distinct users are HLL sketches (exact distinct in
    * unbounded streaming state would grow with the keyspace — the sketch
    * merge is order-independent, so the drained answer is reproducible).
    * State stays bounded by the watermark: closed windows emit and evict.
    */
  def slidingCounts(
      events: DataFrame, windowLen: String = "6 hours",
      slide: String = "1 hour"): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), windowLen, slide))
      .agg(count(lit(1)).as("n"), approx_count_distinct("user_id").as("approx_users"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("n"), col("approx_users"))

  final case class SessionUpdate(
      user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

  /** Per-user in-flight session state (public: Catalyst's generated encoder
    * code needs constructor access).
    */
  final case class SessionState(startUs: Long, lastUs: Long, n: Long)

  /** Custom session state via flatMapGroupsWithState with EVENT-TIME
    * timeouts: a session closes `gapMinutes` after its last event as the
    * watermark passes it. The streaming twin of the batch `q_sessionization`
    * query — same session definition, incremental state instead of a window
    * over history. Event-time (not processing-time) timeouts matter twice:
    * they are replay-deterministic, and an `AvailableNow` drain terminates
    * (processing-time timeouts keep scheduling wake-up batches forever).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("event_time", "10 minutes")
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_time"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, s.startUs, s.lastUs, s.n))
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            var cur    = state.getOption
            val closed = Seq.newBuilder[SessionUpdate]
            sorted.foreach { us =>
              cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  cur = Some(s.copy(lastUs = us, n = s.n + 1))
                case Some(s) =>
                  closed += SessionUpdate(userId, s.startUs, s.lastUs, s.n)
                  cur = Some(SessionState(us, us, 1))
                case None =>
                  cur = Some(SessionState(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes lastEvent+gap (never set a
              // timeout at-or-below the current watermark — Spark rejects it)
              state.setTimeoutTimestamp(
                math.max(s.lastUs / 1000 + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  final case class FunnelHit(user_id: Long, first_us: Long, last_us: Long)

  /** Streaming twin of the restricted batch `scan` funnel
    * ([[graft.operators.ScanSteps]]): per-user ordered step sequence with
    * latest-start attribution and reset-on-completion, as incremental
    * `flatMapGroupsWithState` state (one Option[ts] per non-final step —
    * O(steps) per key, no history retained). Events are processed in ts
    * order WITHIN each micro-batch (groups sort their batch slice); an
    * event arriving in a later batch with an earlier ts cannot
    * retro-insert — the documented micro-batch ordering contract, same as
    * [[sessionize]]. Emits one row per completed sequence: the step-1 and
    * final-step instants (µs).
    *
    * State is BOUNDED two ways, which is what makes this run forever on an
    * unbounded keyspace: (a) per-key state is O(steps) timestamps; (b) a
    * key whose sequence sees no progress for `horizonMinutes` of EVENT time
    * is dropped via `EventTimeTimeout` as the watermark passes it — the
    * incomplete sequence emits nothing and its state store entry is freed
    * (the [[sessionize]] expiry pattern). A key that completes (or whose
    * sequence resets to empty) is removed immediately, so only in-flight
    * funnels occupy the store.
    *
    * `stepTypes` are event_type values forming the sequence; the isin
    * pre-filter pushes to the parquet scan. For arbitrary per-step
    * predicates use [[funnelScan]].
    */
  def funnel(
      events: DataFrame,
      stepTypes: Seq[String],
      horizonMinutes: Int = 1440): Dataset[FunnelHit] =
    funnelScan(
      events.filter(col("event_type").isin(stepTypes: _*)),
      stepTypes.map(t => t -> (col("event_type") === t)),
      horizonMinutes)

  /** General-condition streaming funnel: each step is an arbitrary boolean
    * `Column` over the event row — full parity with batch
    * [[graft.operators.ScanSteps.scanSteps]] conditions. Predicates are
    * evaluated BEFORE the state shuffle as codegen'd columns (exactly how
    * the batch operator stages its `__graft_scan_c*` columns), so the state
    * function only sees a boolean vector per row; rows matching no step are
    * dropped pre-shuffle. Same bounded-state contract as [[funnel]].
    */
  def funnelScan(
      events: DataFrame,
      steps: Seq[(String, Column)],
      horizonMinutes: Int = 1440): Dataset[FunnelHit] = {
    require(steps.size >= 2, "funnel needs at least two steps")
    val spark = events.sparkSession
    import spark.implicits._
    val n         = steps.size
    val horizonMs = horizonMinutes * 60L * 1000L
    val conds     = array(steps.map { case (_, c) => coalesce(c, lit(false)) }: _*)
    events
      .withWatermark("event_time", "10 minutes")
      // event_time must survive the projection: EventTimeTimeout requires
      // the watermarked column in the state operator's child plan
      .select(col("user_id"), expr("ts div 1000").as("us"), conds.as("conds"),
        col("event_time"))
      .filter(array_contains(col("conds"), true))
      .as[(Long, Long, Seq[Boolean], java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Option[Long]], FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[Seq[Option[Long]]]) =>
          if (state.hasTimedOut) {
            // horizon passed with no progress: drop the incomplete sequence
            state.remove()
            Iterator.empty
          } else {
            var st     = state.getOption.getOrElse(Seq.fill[Option[Long]](n - 1)(None))
            var lastUs = Long.MinValue
            val out    = Seq.newBuilder[FunnelHit]
            rows.toSeq.sortBy(_._2).foreach { case (_, us, cs, _) =>
              lastUs = math.max(lastUs, us)
              // deepest extendable step first — mirrors ScanSteps exactly
              val i = (n - 1 to 0 by -1).find(j =>
                cs(j) && (j == 0 || st(j - 1).isDefined))
              i.foreach {
                case j if j == n - 1 =>
                  out += FunnelHit(userId, st.head.get, us)
                  st = Seq.fill[Option[Long]](n - 1)(None) // reset on completion
                case j =>
                  st = st.zipWithIndex.map { case (v, k) =>
                    if (k == j) Some(us) else if (k > j) None else v
                  }
              }
            }
            if (st.forall(_.isEmpty)) state.remove() // nothing in flight: free the key
            else {
              state.update(st)
              // expire at lastEvent+horizon; never at-or-below the watermark
              state.setTimeoutTimestamp(
                math.max(lastUs / 1000 + horizonMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  final case class SequenceHit(user_id: Long, step_us: Seq[Long], duration_us: Long)

  /** Streaming twin of the batch `sequence_detect` plugin (which lowers
    * onto ScanSteps + gap/span filters): the SAME latest-start state
    * machine as [[funnelScan]], but the per-step instants ride in state, so
    * a completion checks ADX's time bounds right in the state function —
    * adjacent-step gaps ≤ `maxStepUs` and total span ≤ `maxSpanUs`. A
    * completion that violates the bounds DROPS and the machine resets,
    * exactly the batch operator's documented divergence (it never retries
    * an earlier pairing), so a one-drain run reproduces the batch answer
    * row for row. Emits every step's instant plus ADX's duration column.
    * Same bounded-state contract as [[funnelScan]]: O(steps) timestamps
    * per key, EventTimeTimeout frees stalled keys past `horizonMinutes`.
    */
  def sequenceDetectStream(
      events: DataFrame,
      steps: Seq[(String, Column)],
      maxStepUs: Long,
      maxSpanUs: Long,
      horizonMinutes: Int = 1440): Dataset[SequenceHit] = {
    require(steps.size >= 2, "sequence_detect needs at least two steps")
    val spark = events.sparkSession
    import spark.implicits._
    val n         = steps.size
    val horizonMs = horizonMinutes * 60L * 1000L
    val conds     = array(steps.map { case (_, c) => coalesce(c, lit(false)) }: _*)
    events
      .withWatermark("event_time", "10 minutes")
      .select(col("user_id"), expr("ts div 1000").as("us"), conds.as("conds"),
        col("event_time"))
      .filter(array_contains(col("conds"), true))
      .as[(Long, Long, Seq[Boolean], java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Option[Long]], SequenceHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[Seq[Option[Long]]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st     = state.getOption.getOrElse(Seq.fill[Option[Long]](n - 1)(None))
            var lastUs = Long.MinValue
            val out    = Seq.newBuilder[SequenceHit]
            rows.toSeq.sortBy(_._2).foreach { case (_, us, cs, _) =>
              lastUs = math.max(lastUs, us)
              val i = (n - 1 to 0 by -1).find(j =>
                cs(j) && (j == 0 || st(j - 1).isDefined))
              i.foreach {
                case j if j == n - 1 =>
                  // setting step j keeps 0..j-1, so ALL prior instants exist
                  val times = st.map(_.get) :+ us
                  val ok = times.sliding(2).forall { case Seq(x, y) => y - x <= maxStepUs } &&
                    times.last - times.head <= maxSpanUs
                  if (ok) out += SequenceHit(userId, times, times.last - times.head)
                  st = Seq.fill[Option[Long]](n - 1)(None)
                case j =>
                  st = st.zipWithIndex.map { case (v, k) =>
                    if (k == j) Some(us) else if (k > j) None else v
                  }
              }
            }
            if (st.forall(_.isEmpty)) state.remove()
            else {
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(lastUs / 1000 + horizonMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Streaming exact dedup on a content key with bounded state: first-seen
    * wins inside the watermark horizon — `dropDuplicates` IS the streaming
    * dedup operator (state pruned by the event-time watermark).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("event_time", "1 hour")
      .dropDuplicates(keyCols :+ "event_time")

  /** Stream-static enrichment: join the event stream against a batch
    * dimension (re-read per micro-batch, so slowly-changing dims stay
    * current). The dim side broadcasts — no stream-side shuffle, stateless,
    * any output mode. The streaming twin of the engine's extent↔blob
    * map-back joins (J4/J5).
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** Stream-STREAM event-time join: each purchase pairs with the clicks of
    * the same user in the preceding `windowMinutes` — the attribution join
    * (batch twin: q_asof_attribution) as a continuous operator. Both sides
    * carry watermarks and the join condition carries the time bound, so
    * Spark can EXPIRE buffered state (without the bound the state store
    * grows forever — the canonical stream-stream join mistake). One state
    * shuffle on user_id.
    */
  def attributionJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      windowMinutes: Int = 60,
      latenessMinutes: Int = 10): DataFrame = {
    // lateness is its own dial: it bounds how far behind the max event time
    // an event may arrive, NOT how far back attribution looks (that is
    // windowMinutes, carried in the join condition for state expiry)
    val c = clicks
      .withWatermark("event_time", s"$latenessMinutes minutes")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
    val p = purchases
      .withWatermark("event_time", s"$latenessMinutes minutes")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("event_time").as("purchase_time"))
    p.join(c,
      p("user_id") === c("user_id") &&
        col("click_time") <= col("purchase_time") &&
        col("click_time") >= col("purchase_time") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(p("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_time"), col("click_time"))
  }

  final case class HeavyHitter(
      window_start_us: Long, key: String, est: Long, max_err: Long)

  /** Streaming heavy hitters per tumbling window with BOUNDED state:
    * Space-Saving counters (Metwally et al., the public stream-summary
    * algorithm) — at most `capacity` counters per window REGARDLESS of key
    * cardinality, where an exact per-window top-k would hold every distinct
    * key in state (the difference between O(m) and O(keys) at 100 TB). On
    * overflow the minimum counter is evicted and the newcomer inherits its
    * count as `max_err`, preserving the classic guarantees: every key with
    * true count > N/capacity is in the summary, and for each counter
    * est − max_err ≤ true ≤ est. Estimates are order-dependent (as in any
    * space-saving deployment); the guarantees are not — the spec asserts
    * the guarantees against the exact batch counts, never raw equality.
    * Keyed by window start; EventTimeTimeout emits each window's top-k
    * snapshot once the watermark passes the window end, then frees the
    * state.
    */
  def heavyHittersStream(
      events: DataFrame,
      keyCol: String,
      windowLenMinutes: Int = 60,
      capacity: Int = 8,
      topK: Int = 3): Dataset[HeavyHitter] = {
    val spark = events.sparkSession
    import spark.implicits._
    val winUs = windowLenMinutes * 60L * 1000000L
    events
      .withWatermark("event_time", "10 minutes")
      .select(expr("ts div 1000").as("us"), col(keyCol).cast("string").as("k"),
        col("event_time"))
      .withColumn("w_us", expr(s"us - pmod(us, ${winUs}L)"))
      .as[(Long, String, java.sql.Timestamp, Long)]
      .groupByKey(_._4)
      .flatMapGroupsWithState[Map[String, (Long, Long)], HeavyHitter](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (wStart, rows, state: GroupState[Map[String, (Long, Long)]]) =>
          if (state.hasTimedOut) {
            val st = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
            state.remove()
            st.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(topK)
              .map { case (k, (c, e)) => HeavyHitter(wStart, k, c, e) }.iterator
          } else {
            var st = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
            // deterministic within a micro-batch: fold in event order
            rows.toSeq.sortBy(r => (r._1, r._2)).foreach { case (_, k, _, _) =>
              st.get(k) match {
                case Some((c, e))               => st += k -> (c + 1, e)
                case None if st.size < capacity => st += k -> (1L, 0L)
                case None =>
                  val (mk, (mc, _)) = st.minBy { case (k2, (c2, _)) => (c2, k2) }
                  st = st - mk + (k -> (mc + 1, mc))
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              (wStart + winUs) / 1000, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
