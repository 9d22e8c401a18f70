package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ActivityMetrics against hand-computed answers on a tiny crafted frame,
  * plus the KQL `evaluate` lowering of the same plugins.
  *
  * Grid: start=0, step=10; ids live on a 4-bin axis [0, 40).
  *   id 1: bins 0, 10, 20, 30  (always active)
  *   id 2: bins 0, 20          (every other bin)
  *   id 3: bin 30              (late joiner; two rows in the bin)
  */
class ActivityMetricsSpec extends SparkSuite {

  private def frame = {
    import spark.implicits._
    Seq(
      (1L, 0L), (1L, 15L), (1L, 25L), (1L, 30L),
      (2L, 5L), (2L, 22L),
      (3L, 31L), (3L, 39L)
    ).toDF("id", "x")
  }

  test("activityCountsMetrics: counts, first-seen and cumulative distinct") {
    val out = ActivityMetrics.activityCountsMetrics(frame, "id", "x", 0L, 40L, 10L)
      .orderBy("timestamp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 2L, 2L),   // rows {1,2}; both new
      (10L, 1L, 1L, 0L, 2L),  // row {1}
      (20L, 2L, 2L, 0L, 2L),  // rows {1,2}
      (30L, 3L, 2L, 1L, 3L))) // rows {1,3,3}; 3 is new
  }

  test("slidingWindowCounts: trailing 2-bin window rolls rows and ids") {
    val out = ActivityMetrics.slidingWindowCounts(frame, "id", "x", 0L, 40L, 20L, 10L)
      .orderBy("timestamp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L),   // bins {0}:    rows 2, ids {1,2}
      (10L, 3L, 2L),  // bins {0,10}: rows 3, ids {1,2}
      (20L, 3L, 2L),  // bins {10,20}
      (30L, 5L, 3L))) // bins {20,30}: rows 2+3, ids {1,2,3}
  }

  test("activeUsersCount: needs k distinct periods inside the lookback") {
    // lookback 30 (3 bins), 2 distinct active bins required
    val out = ActivityMetrics.activeUsersCount(frame, "id", "x", 0L, 40L, 30L, 10L, 2, 10L)
      .orderBy("timestamp").collect().map(r => (r.getLong(0), r.getLong(1)))
    // windows (bin sets): 0→{0}, 10→{0,10}, 20→{0,10,20}, 30→{10,20,30}
    // id1 active bins {0,10,20,30}: qualifies from t=10 on
    // id2 active bins {0,20}: qualifies at t=20 ({0,20}) and t=30 ({20})? no — {20} only → 1
    // id3 active bins {30}: never
    assert(out.toSeq == Seq((10L, 1L), (20L, 2L), (30L, 1L)))
  }

  test("activityMetrics: retention against the previous bin") {
    val out = ActivityMetrics.activityMetrics(frame, "id", "x", 0L, 40L, 10L)
      .orderBy("timestamp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, None, None),              // no predecessor
      (10L, 1L, 0L, Some(0.5), Some(0.5)),   // {1} of prev {1,2}
      (20L, 2L, 0L, Some(1.0), Some(0.0)),   // {1,2}∩{1} = {1}, prev dcount 1
      (30L, 2L, 1L, Some(0.5), Some(0.5))))  // {1,3}∩{1,2} = {1}, prev 2
  }

  test("newActivityMetrics: sparse cohort matrix with retention rates") {
    val out = ActivityMetrics.newActivityMetrics(frame, "id", "x", 0L, 40L, 10L)
      .orderBy("from_timestamp", "to_timestamp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // cohort 0 = {1,2}: active bins 0 {1,2}, 10 {1}, 20 {1,2}, 30 {1}
    // cohort 30 = {3}: active bin 30 only
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 2L, 1.0), (0L, 10L, 2L, 1L, 0.5),
      (0L, 20L, 2L, 2L, 1.0), (0L, 30L, 2L, 1L, 0.5),
      (30L, 30L, 1L, 1L, 1.0)))
  }

  test("activityEngagement: inner/outer rolling dcount ratio") {
    val out = ActivityMetrics.activityEngagement(frame, "id", "x", 0L, 40L, 10L, 20L, 10L)
      .orderBy("timestamp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // inner = 1 bin, outer = 2 bins (see slidingWindowCounts case above)
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 1.0),   // {1,2} / {1,2}
      (10L, 1L, 2L, 0.5),  // {1} / {1,2}
      (20L, 2L, 2L, 1.0),  // {1,2} / {1,2}
      (30L, 2L, 3L, round2(2.0 / 3))))
  }

  private def round2(d: Double): Double = math.rint(d * 1e6) / 1e6

  test("funnelSequence: consecutive matches with edge-padded prev/next") {
    import spark.implicits._
    // id 1: a b a b  → matches at 1 (prev='', next='a') and 3 (prev='b', next='')
    // id 2: a a b    → one match at pos 2: (prev='a', next='')
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "a"), (2L, 3L, "b")
    ).toDF("id", "x", "st")
    val out = ActivityMetrics.funnelSequence(ev, "id", "x", "st", Seq("a", "b"))
      .orderBy("prev", "next").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("", "a", 1L, 1L), ("a", "", 1L, 1L), ("b", "", 1L, 1L)))
  }

  test("rollingPercentile: exact interpolated percentile over trailing bins") {
    import spark.implicits._
    val vals = Seq((0L, 1.0), (0L, 3.0), (10L, 5.0), (10L, 7.0)).toDF("x", "v")
      .withColumn("id", lit(0L))
    val out = ActivityMetrics.rollingPercentile(vals, "v", 50.0, "x", 0L, 20L, 2, 10L)
      .orderBy("timestamp").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // t=0: {1,3} → 2.0; t=10: {1,3,5,7} → 4.0
    assert(out.toSeq == Seq((0L, 2.0), (10L, 4.0)))
  }

  test("KQL evaluate lowering: activity plugins and constant-folded args") {
    val out = graft.kql.KqlPipeline.run(_ => frame,
      """t
        | | evaluate sliding_window_counts(id, x, 0, 40, 2 * 10, 10)
        | | order by timestamp asc""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 2L, 2L), (10L, 3L, 2L), (20L, 3L, 2L), (30L, 5L, 3L)))
  }

  test("property: sliding/active rolling metrics match a naive reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val step = 10L; val start = 0L; val end = 100L // 10-bin grid
      val lookback = step * (1 + rnd.nextInt(4))     // 1..4 bins
      val rows = Seq.fill(120 + rnd.nextInt(80))(
        (rnd.nextInt(6).toLong, start + rnd.nextInt((end - start).toInt).toLong))
      val df = rows.toDF("id", "x")

      // naive reference: full scan per grid point
      val grid = (start until end by step).toSeq
      def inWin(t: Long, x: Long) = { val b = (x / step) * step; b <= t && b > t - lookback }
      val refSliding = grid.map { t =>
        val w = rows.filter { case (_, x) => inWin(t, x) }
        (t, w.size.toLong, w.map(_._1).distinct.size.toLong)
      }.filter(_._2 > 0)
      val gotSliding = ActivityMetrics
        .slidingWindowCounts(df, "id", "x", start, end, lookback, step)
        .orderBy("timestamp").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(gotSliding == refSliding, s"trial $trial lookback $lookback (sliding)")

      val k = 1 + rnd.nextInt(3)
      val refActive = grid.map { t =>
        val ids = rows.filter { case (_, x) => inWin(t, x) }
          .groupBy(_._1).view.mapValues(_.map(v => (v._2 / step) * step).distinct.size)
          .filter(_._2 >= k).keys
        (t, ids.size.toLong)
      }.filter(_._2 > 0)
      val gotActive = ActivityMetrics
        .activeUsersCount(df, "id", "x", start, end, lookback, step, k, step)
        .orderBy("timestamp").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(gotActive == refActive, s"trial $trial lookback $lookback k $k (active)")
    }
  }

  test("KQL sequence_detect: span bound drops late completions, duration emits") {
    import spark.implicits._
    // id 1 completes a→b within span 5; id 2's b arrives 100 ticks later
    val ev = Seq(
      (1L, 10L, "a"), (1L, 13L, "b"),
      (2L, 10L, "a"), (2L, 110L, "b")
    ).toDF("id", "x", "st")
    val out = graft.kql.KqlPipeline.run(_ => ev,
      """t
        | | evaluate sequence_detect(x, 5, 5, id, s1 = st == 'a', s2 = st == 'b')
        | | project id, s1_x, s2_x, duration
        | | order by id asc""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 10L, 13L, 3L)))
  }

  test("KQL ipv4_lookup: longest prefix wins; return_unmatched pads nulls") {
    import spark.implicits._
    val facts = Seq(("10.42.1.5", "a"), ("10.9.9.9", "b"), ("8.8.8.8", "c"))
      .toDF("ip", "tag")
    val nets = Seq(("10.0.0.0/8", "corp"), ("10.42.0.0/16", "lab"))
      .toDF("cidr", "net")
    def run(kql: String) = graft.kql.KqlPipeline.run(
      Map("facts" -> facts, "nets" -> nets), kql)
    val matched = run(
      "facts | evaluate ipv4_lookup(nets, ip, cidr) | project ip, net | order by ip asc")
      .collect().map(r => (r.getString(0), r.getString(1)))
    // 10.42.1.5 matches BOTH /8 and /16 → the /16 (longest prefix) wins
    assert(matched.toSeq == Seq(("10.42.1.5", "lab"), ("10.9.9.9", "corp")))
    val all = run(
      "facts | evaluate ipv4_lookup(nets, ip, cidr, true) | project ip, net | order by ip asc")
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(all.toSeq == Seq(("10.42.1.5", Some("lab")), ("10.9.9.9", Some("corp")),
      ("8.8.8.8", None)))
  }

  test("KQL ipv4_lookup: wide CIDRs (mask < 8) ride the /8 bucket tier, bounded explode") {
    import spark.implicits._
    // a /4 spans 2^28 addresses: the /16 tier would explode it to 4096
    // bucket rows; the /8 tier caps it at 16 — and a /0 default route at 256
    val facts = Seq(("10.42.1.5", "a"), ("200.1.2.3", "b"), ("17.0.0.1", "c"))
      .toDF("ip", "tag")
    val nets = Seq(("0.0.0.0/0", "default"), ("16.0.0.0/4", "wide"),
      ("10.0.0.0/8", "corp")).toDF("cidr", "net")
    val out = graft.kql.KqlPipeline.run(
      Map("facts" -> facts, "nets" -> nets),
      "facts | evaluate ipv4_lookup(nets, ip, cidr) | project ip, net | order by ip asc")
      .collect().map(r => (r.getString(0), r.getString(1)))
    // 16.0.0.0/4 covers 16.0.0.0-31.255.255.255, so:
    //   10.42.1.5 ∈ /0 and /8 → the /8 (longest prefix) wins
    //   17.0.0.1  ∈ /0 and /4 → the /4 wins
    //   200.1.2.3 only ∈ /0   → default
    assert(out.toSeq == Seq(("10.42.1.5", "corp"), ("17.0.0.1", "wide"),
      ("200.1.2.3", "default")))
  }

  test("KQL autocluster drops segments closed by an equal-count refinement") {
    import spark.implicits._
    // b is functionally dependent on a: every (a, *) segment has an
    // equal-count (a, b) refinement and must be dropped by the closed rule
    val df = Seq.tabulate(20)(i => (s"a${i % 2}", s"b${i % 2}"))
      .toDF("a", "b")
    val out = graft.kql.KqlPipeline.run(_ => df,
      """t
        | | evaluate autocluster(0.1)
        | | project a = coalesce(a, '*'), b = coalesce(b, '*'), Count
        | | order by a asc, b asc""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // kept: the two fully-specified segments; dropped: (a0,*), (*,b0), …
    assert(out.toSeq == Seq(("a0", "b0", 10L), ("a1", "b1", 10L)))
  }

  test("KQL diffpatterns: conditional-count cube with per-cohort percents") {
    import spark.implicits._
    val df = (Seq.fill(8)(("A", "x")) ++ Seq.fill(2)(("A", "y")) ++
      Seq.fill(5)(("B", "x")) ++ Seq.fill(5)(("B", "y"))).toDF("split", "seg")
    val out = graft.kql.KqlPipeline.run(_ => df,
      """t
        | | evaluate diffpatterns(split, 'A', 'B')
        | | project seg = coalesce(seg, '*'), CountA, CountB, PercentDiff
        | | order by seg asc""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("x", 8L, 5L, 30.0), ("y", 2L, 5L, -30.0)))
  }
}
