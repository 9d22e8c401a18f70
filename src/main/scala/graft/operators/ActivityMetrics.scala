package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ADX activity-analytics plugin family (`activity_counts_metrics`,
  * `sliding_window_counts`, `active_users_count`, `activity_metrics`) on a
  * numeric timeline axis (callers bin epoch-nanos to µs or pass any long
  * axis). Reference surface: the ADX `evaluate` activity plugins; the
  * mirror-lake reference itself never emits them (SURVEY §2.g) — this is
  * extension breadth for the analytics surface.
  *
  * Scale design — the 100 TB shape for every rolling metric here is
  * "explode to covered bins", never a range self-join:
  *   - events first collapse to per-bin partials (one hash shuffle on the
  *     bin, or on (id, bin) for distinct metrics) — the only pass over the
  *     full input;
  *   - each partial then explodes to the w = lookback/step output bins it
  *     contributes to (w is a small constant, e.g. 7 for a weekly window on
  *     daily bins) and re-aggregates on the output bin — shuffles scale with
  *     |distinct (id, bin)| · w, not with raw row count, and no executor
  *     ever materializes a window's whole row set;
  *   - even grid-sized passes (cumulative counts, previous-bin rates) avoid
  *     unpartitioned windows: cumulative = suffix-explode of per-bin
  *     partials (grid²-bounded), previous-bin = an equi-join on bin+step —
  *     the registry-wide no-1-task-window invariant holds here too.
  *
  * Window convention (documented, mirrored exactly by every DuckDB oracle):
  * the grid is start, start+step, … strictly below `end`; an event maps to
  * bin(x) = start + ((x-start)/step)*step; the lookback window ending at
  * grid point t covers bins {t-(w-1)·step, …, t} (half-open (t-lookback, t]
  * in axis units). `lookback` must be a positive multiple of `step`.
  */
object ActivityMetrics {

  private def requireGrid(start: Long, end: Long, step: Long): Unit = {
    require(step > 0, s"step must be positive: $step")
    require(end > start, s"empty axis range: [$start, $end)")
  }

  /** bin(x) on the [start,∞) grid; callers pre-filter x >= start so long
    * division truncation equals floor. */
  private def binOf(axis: Column, start: Long, step: Long): Column =
    (lit(start) + ((axis - lit(start)) / lit(step)).cast("long") * lit(step))

  private def lastBin(start: Long, end: Long, step: Long): Long =
    start + ((end - 1 - start) / step) * step

  /** Per-bin activity counts: row count, distinct ids, first-seen distinct
    * ids, and cumulative distinct ids (aggregated_dcount) per grid bin.
    * Output: (timestamp, count, dcount, new_dcount, aggregated_dcount).
    */
  def activityCountsMetrics(
      df: DataFrame, idCol: String, axisCol: String,
      start: Long, end: Long, step: Long): DataFrame = {
    requireGrid(start, end, step)
    val last = lastBin(start, end, step)
    val in = df
      .filter(col(axisCol) >= start && col(axisCol) < end)
      .select(col(idCol).as("__id"), binOf(col(axisCol), start, step).as("__bin"))

    // one full-input shuffle keyed (id, bin): row count partials ride along,
    // so `count` needs no second pass over the raw rows
    val idBin = in.groupBy(col("__id"), col("__bin")).agg(count(lit(1)).as("__rows"))

    val perBin = idBin.groupBy(col("__bin"))
      .agg(sum(col("__rows")).as("count"), count(lit(1)).as("dcount"))

    // first-seen bin per id (shuffle on id, |ids| rows) → per-bin new_dcount
    val firstSeen = idBin.groupBy(col("__id")).agg(min(col("__bin")).as("__bin"))
      .groupBy(col("__bin")).agg(count(lit(1)).as("new_dcount"))

    // cumulative distinct = suffix-explode of the PER-BIN new counts (grid²
    // rows at most — grid-bounded, not data-bounded), keeping the registry's
    // no-unpartitioned-window invariant instead of a 1-task running sum
    val cum = firstSeen
      .select(explode(sequence(col("__bin"), lit(last), lit(step))).as("__bin"),
        col("new_dcount"))
      .groupBy(col("__bin")).agg(sum(col("new_dcount")).as("aggregated_dcount"))

    perBin.join(firstSeen, Seq("__bin"), "left")
      .na.fill(0L, Seq("new_dcount"))
      .join(cum, Seq("__bin"))
      .select(col("__bin").as("timestamp"), col("count"), col("dcount"),
        col("new_dcount"), col("aggregated_dcount"))
  }

  /** Rolling counts over a sliding lookback window: for every grid point t,
    * the row count and distinct-id count among events in (t-lookback, t].
    * Output: (timestamp, count, dcount).
    */
  def slidingWindowCounts(
      df: DataFrame, idCol: String, axisCol: String,
      start: Long, end: Long, lookback: Long, step: Long): DataFrame = {
    requireGrid(start, end, step)
    require(lookback > 0 && lookback % step == 0,
      s"lookback must be a positive multiple of step: lookback=$lookback step=$step")
    val last = lastBin(start, end, step)
    val in = df
      .filter(col(axisCol) >= start && col(axisCol) < end)
      .select(col(idCol).as("__id"), binOf(col(axisCol), start, step).as("__bin"))

    // explode helper: the output bins a source bin contributes to
    def covered(bin: Column): Column =
      sequence(bin, least(bin + lit(lookback - step), lit(last)), lit(step))

    // row counts: per-bin partial (full-input shuffle) → explode w ways → sum
    val rolledRows = in.groupBy(col("__bin")).agg(count(lit(1)).as("__rows"))
      .select(explode(covered(col("__bin"))).as("timestamp"), col("__rows"))
      .groupBy(col("timestamp")).agg(sum(col("__rows")).as("count"))

    // distinct ids: (id, bin) dedup → explode w ways → per-bin exact dcount
    val rolledIds = in.distinct()
      .select(col("__id"), explode(covered(col("__bin"))).as("timestamp"))
      .groupBy(col("timestamp")).agg(countDistinct(col("__id")).as("dcount"))

    rolledRows.join(rolledIds, Seq("timestamp"))
      .select(col("timestamp"), col("count"), col("dcount"))
  }

  /** Distinct ids active in at least `activePeriods` distinct periods inside
    * the lookback window ending at each grid point. `period` buckets
    * activity inside the window (e.g. days inside a week); must divide into
    * the same grid as `step` for the containment test below to be exact:
    * a period bucket p (p = start + ((x-start)/period)·period) is inside
    * the window at t iff t-lookback < p ≤ t.
    * Output: (timestamp, dcount).
    */
  def activeUsersCount(
      df: DataFrame, idCol: String, axisCol: String,
      start: Long, end: Long, lookback: Long, period: Long,
      activePeriods: Int, step: Long): DataFrame = {
    requireGrid(start, end, step)
    require(lookback > 0 && period > 0 && activePeriods > 0,
      s"lookback/period/activePeriods must be positive")
    require(period % step == 0,
      s"period must be a multiple of step so period starts land on the grid: period=$period step=$step")
    require(lookback % step == 0,
      s"lookback must be a multiple of step or the explode bound below silently truncates the window: lookback=$lookback step=$step")
    val last = lastBin(start, end, step)
    // distinct (id, period bucket): the only full-input shuffle
    val idPeriod = df
      .filter(col(axisCol) >= start && col(axisCol) < end)
      .select(col(idCol).as("__id"), binOf(col(axisCol), start, period).as("__p"))
      .distinct()

    // period p is inside the window at t iff p ≤ t < p + lookback
    val atT = idPeriod.select(col("__id"), col("__p"),
      explode(sequence(col("__p"), least(col("__p") + lit(lookback - step), lit(last)), lit(step)))
        .as("timestamp"))

    atT.groupBy(col("timestamp"), col("__id"))
      .agg(countDistinct(col("__p")).as("__np"))
      .filter(col("__np") >= activePeriods)
      .groupBy(col("timestamp")).agg(count(lit(1)).as("dcount"))
  }

  /** Cohort retention (the new_activity_metrics shape): for every cohort
    * (= first-seen bin) and every bin where a cohort member is active, the
    * cohort size, the retained distinct ids, and the retention rate.
    * DIVERGENCE from ADX (documented): the full sparse cohort matrix
    * (from ≤ to, rows only where retained > 0) instead of adjacent-window
    * pairs — the classic cohort table. All steps are id-keyed equi-joins
    * and hash aggregations; output is grid²-bounded.
    * Output: (from_timestamp, to_timestamp, dcount_new, dcount_retained,
    * retention_rate[round 6]).
    */
  def newActivityMetrics(
      df: DataFrame, idCol: String, axisCol: String,
      start: Long, end: Long, step: Long): DataFrame = {
    requireGrid(start, end, step)
    val idBin = df
      .filter(col(axisCol) >= start && col(axisCol) < end)
      .select(col(idCol).as("__id"), binOf(col(axisCol), start, step).as("__bin"))
      .distinct()
    val cohort = idBin.groupBy(col("__id")).agg(min(col("__bin")).as("__cohort"))
    val sizes  = cohort.groupBy(col("__cohort")).agg(count(lit(1)).as("dcount_new"))
    idBin.join(cohort, Seq("__id"))
      .groupBy(col("__cohort"), col("__bin"))
      .agg(count(lit(1)).as("dcount_retained"))
      .join(sizes, Seq("__cohort"))
      .withColumn("retention_rate",
        round(col("dcount_retained").cast("double") / col("dcount_new"), 6))
      .select(col("__cohort").as("from_timestamp"), col("__bin").as("to_timestamp"),
        col("dcount_new"), col("dcount_retained"), col("retention_rate"))
  }

  /** Engagement ratio (the DAU/MAU shape): distinct ids in the trailing
    * `inner` window over distinct ids in the trailing `outer` window, per
    * grid point. Both sides are the slidingWindowCounts explode shape; the
    * join is grid-sized. Output: (timestamp, dcount_activities_inner,
    * dcount_activities_outer, activity_ratio[round 6]).
    */
  def activityEngagement(
      df: DataFrame, idCol: String, axisCol: String,
      start: Long, end: Long, inner: Long, outer: Long, step: Long): DataFrame = {
    require(outer >= inner, s"outer window must contain inner: inner=$inner outer=$outer")
    val in  = slidingWindowCounts(df, idCol, axisCol, start, end, inner, step)
      .select(col("timestamp"), col("dcount").as("dcount_activities_inner"))
    val out = slidingWindowCounts(df, idCol, axisCol, start, end, outer, step)
      .select(col("timestamp"), col("dcount").as("dcount_activities_outer"))
    in.join(out, Seq("timestamp"))
      .withColumn("activity_ratio",
        round(col("dcount_activities_inner").cast("double") /
          col("dcount_activities_outer"), 6))
  }

  /** Sequence analytics (the funnel_sequence shape): occurrences of the
    * exact CONSECUTIVE state sequence per id (ordered by the axis), grouped
    * by the states immediately before and after the match ('' at stream
    * edges). DIVERGENCE from ADX: no per-step time-window bound — the
    * windowed variant is the `scan` operator's job. One shuffle on the id;
    * the k−1 lead chain runs inside the per-id sort, so cost is O(k) per
    * row with no self-joins. Output: (prev, next, matches, dcount_ids).
    */
  def funnelSequence(
      df: DataFrame, idCol: String, axisCol: String, stateCol: String,
      states: Seq[String]): DataFrame = {
    require(states.size >= 2, s"funnel_sequence needs >= 2 states, got $states")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__ax"))
    val hit = states.zipWithIndex.map { case (st, i) =>
      (if (i == 0) col("__st") else lead(col("__st"), i).over(w)) === st
    }.reduce(_ && _)
    df.select(col(idCol).as("__id"), col(axisCol).as("__ax"), col(stateCol).as("__st"))
      .withColumn("__prev", coalesce(lag(col("__st"), 1).over(w), lit("")))
      .withColumn("__next", coalesce(lead(col("__st"), states.size).over(w), lit("")))
      .withColumn("__hit", hit)
      .filter(col("__hit"))
      .groupBy(col("__prev").as("prev"), col("__next").as("next"))
      .agg(count(lit(1)).as("matches"), countDistinct(col("__id")).as("dcount_ids"))
  }

  /** Funnel completion by time budget (the funnel_sequence_completion
    * shape): for every sequence prefix length p (1..k) and every window w,
    * the distinct ids that completed states(0..p−1) with total span ≤ w.
    * Each prefix runs the `scan` state machine once (k is small — a
    * driver-side loop over k plans, each ONE key shuffle + fold), and the
    * per-(prefix, window) counts are single-row aggregates unioned at the
    * end. Output: (prefix, window, dcount), prefix/window ascending.
    */
  def funnelCompletion(
      df: DataFrame, idCol: String, axisCol: String, stateCol: String,
      states: Seq[String], windows: Seq[Long]): DataFrame = {
    require(states.nonEmpty && windows.nonEmpty, "funnel completion needs states and windows")
    val legs = states.indices.map { i =>
      val prefix = states.take(i + 1)
      val steps  = prefix.zipWithIndex.map { case (st, j) =>
        s"s$j" -> (col(stateCol) === st)
      }
      val scanned = ScanSteps.scanSteps(df, Seq(idCol), axisCol, ascending = true, steps)
      val span = col(s"s${i}_$axisCol") - col(s"s0_$axisCol")
      windows.map { w =>
        scanned.filter(span <= w)
          .agg(countDistinct(col(idCol)).as("dcount"))
          .select(lit(i + 1).as("prefix"), lit(w).as("window"), col("dcount"))
      }
    }
    legs.flatten.reduce(_ unionByName _)
      .orderBy(col("prefix"), col("window"))
  }

  /** Rolling exact interpolated percentile of `valueCol` over the trailing
    * `binsPerWindow` bins at each grid point (ADX's plugin is T-digest
    * approximate — documented divergence to keep the DuckDB `quantile_cont`
    * twin exact). Values explode w = binsPerWindow ways and aggregate per
    * output bin — the aggregation buffer holds one window's values per GROUP
    * (distributed across executors by bin), never a per-executor window of
    * the raw stream. Output: (timestamp, rolling_percentile).
    */
  def rollingPercentile(
      df: DataFrame, valueCol: String, pct: Double, axisCol: String,
      start: Long, end: Long, binsPerWindow: Int, step: Long): DataFrame = {
    requireGrid(start, end, step)
    require(pct >= 0 && pct <= 100, s"percentile must be in [0,100]: $pct")
    require(binsPerWindow > 0, s"binsPerWindow must be positive: $binsPerWindow")
    val last = lastBin(start, end, step)
    df.filter(col(axisCol) >= start && col(axisCol) < end)
      .select(col(valueCol).as("__v"), binOf(col(axisCol), start, step).as("__bin"))
      .select(col("__v"),
        explode(sequence(col("__bin"),
          least(col("__bin") + lit((binsPerWindow - 1).toLong * step), lit(last)),
          lit(step))).as("timestamp"))
      .groupBy(col("timestamp"))
      .agg(round(percentile(col("__v"), lit(pct / 100.0)), 6).as("rolling_percentile"))
  }

  /** Per-bin engagement: distinct ids, first-seen ids, and adjacent-bin
    * retention/churn. retention_rate(t) = |ids(t-step) ∩ ids(t)| /
    * |ids(t-step)|; churn_rate = 1 - retention_rate; both NULL on the first
    * bin (no predecessor) and 0/1 when the predecessor bin is empty-free.
    * Output: (timestamp, dcount_values, dcount_newvalues, retention_rate,
    * churn_rate), rates rounded to 6 places.
    */
  def activityMetrics(
      df: DataFrame, idCol: String, axisCol: String,
      start: Long, end: Long, step: Long): DataFrame = {
    requireGrid(start, end, step)
    val idBin = df
      .filter(col(axisCol) >= start && col(axisCol) < end)
      .select(col(idCol).as("__id"), binOf(col(axisCol), start, step).as("__bin"))
      .distinct()

    val perBin = idBin.groupBy(col("__bin")).agg(count(lit(1)).as("dcount_values"))

    val firstSeen = idBin.groupBy(col("__id")).agg(min(col("__bin")).as("__bin"))
      .groupBy(col("__bin")).agg(count(lit(1)).as("dcount_newvalues"))

    // retained(t) = ids active at both t-step and t: equi-join on (id, bin)
    // shifted by one step — |distinct pairs| keys, no window materialization
    val retained = idBin
      .select(col("__id"), (col("__bin") + lit(step)).as("__bin"))
      .join(idBin, Seq("__id", "__bin"))
      .groupBy(col("__bin")).agg(count(lit(1)).as("__retained"))

    // previous-bin dcount via the same shift-join (not a lag window): pairs
    // t with exactly t-step — consistent with `retained`'s pairing on a
    // sparse grid, and no unpartitioned window in the plan
    val prev = perBin.select((col("__bin") + lit(step)).as("__bin"),
      col("dcount_values").as("__prev_dcount"))
    perBin
      .join(firstSeen, Seq("__bin"), "left").na.fill(0L, Seq("dcount_newvalues"))
      .join(retained, Seq("__bin"), "left").na.fill(0L, Seq("__retained"))
      .join(prev, Seq("__bin"), "left")
      .withColumn("retention_rate",
        round(col("__retained").cast("double") / col("__prev_dcount"), 6))
      .withColumn("churn_rate",
        round(lit(1.0) - col("__retained").cast("double") / col("__prev_dcount"), 6))
      .select(col("__bin").as("timestamp"), col("dcount_values"),
        col("dcount_newvalues"), col("retention_rate"), col("churn_rate"))
  }
}
