package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The series_* analysis family (KqlCompat rewrites): stats, line fit,
  * Tukey outliers, FIR smoothing, Pearson correlation, dynamic literals —
  * hand-computed fixtures, plus the multi-aggregation make-series form.
  */
class SeriesFunctionsSpec extends SparkSuite {

  private def oneRow(exprStr: String): org.apache.spark.sql.Row = {
    val s = spark
    import s.implicits._
    Seq(1).toDF("one").selectExpr(KqlCompat.rewrite(exprStr)).head()
  }

  test("dynamic([...]) literal becomes an array") {
    assert(oneRow("dynamic([1, 2, 3])").getSeq[Int](0) == Seq(1, 2, 3))
    // no-op on non-bracket content and inside string literals
    assert(KqlCompat.rewrite("'dynamic([1])'") == "'dynamic([1])'")
  }

  test("series_stats_dynamic: min/max/idx/avg/stdev/sum/len on a fixture") {
    val r = oneRow("series_stats_dynamic(dynamic([3, 1, 4, 1, 5]))").getStruct(0)
    assert(r.getAs[Double]("min") == 1.0)
    assert(r.getAs[Long]("min_idx") == 1L) // FIRST occurrence of the min
    assert(r.getAs[Double]("max") == 5.0)
    assert(r.getAs[Long]("max_idx") == 4L)
    assert(math.abs(r.getAs[Double]("avg") - 2.8) < 1e-12)
    // sample stdev of [3,1,4,1,5]: var = (5*52 - 14^2)/(5*4) = 3.2
    assert(math.abs(r.getAs[Double]("stdev") - math.sqrt(3.2)) < 1e-12)
    assert(r.getAs[Double]("sum") == 14.0)
    assert(r.getAs[Long]("len") == 5L)
  }

  test("series_fit_line_dynamic: exact line recovers slope/intercept, r²=1") {
    val r = oneRow("series_fit_line_dynamic(dynamic([2, 5, 8, 11]))").getStruct(0)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("interception") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("rsquare") - 1.0) < 1e-12)
    assert(r.getAs[Double]("rvariance") < 1e-12)
    val fit = r.getSeq[Double](r.fieldIndex("line_fit"))
    assert(fit.zip(Seq(2.0, 5.0, 8.0, 11.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("series_fit_line_dynamic: noisy fixture matches closed-form least squares") {
    // y = [0, 2, 1, 3]: n=4, sx=6, sxx=14, sy=6, sxy=0·0+2·1+1·2+3·3=13
    // slope = (4·13−6·6)/(4·14−36) = 16/20 = 0.8; icept = (6−0.8·6)/4 = 0.3
    val r = oneRow("series_fit_line_dynamic(dynamic([0, 2, 1, 3]))").getStruct(0)
    assert(math.abs(r.getAs[Double]("slope") - 0.8) < 1e-12)
    assert(math.abs(r.getAs[Double]("interception") - 0.3) < 1e-12)
    // fitted [0.3,1.1,1.9,2.7] → SSres = 1.8; SStot = 14−9 = 5; r² = 1−1.8/5
    assert(math.abs(r.getAs[Double]("rsquare") - (1 - 1.8 / 5.0)) < 1e-12)
  }

  test("series_outliers: Tukey fences, type-7 quartiles, zeros inside") {
    // sorted [1,2,3,100]: q25 = 1.75, q75 = 3+0.25*97 = 27.25, iqr = 25.5
    val o = oneRow("series_outliers(dynamic([1, 2, 3, 100]))").getSeq[Double](0)
    assert(math.abs(o(0) - (1 - 1.75) / 25.5) < 1e-12) // below q25
    assert(o(1) == 0.0 && o(2) == 0.0)
    assert(math.abs(o(3) - (100 - 27.25) / 25.5) < 1e-12)
    // constant series: iqr = 0 -> all zeros, no div-by-zero
    val z = oneRow("series_outliers(dynamic([7, 7, 7]))").getSeq[Double](0)
    assert(z.forall(_ == 0.0))
  }

  test("series_fir: centered [1,1,1] is a moving average with renormalized edges") {
    val o = oneRow("series_fir(dynamic([3, 6, 9, 12]), dynamic([1, 1, 1]), true, true)")
      .getSeq[Double](0)
    assert(o.zip(Seq(4.5, 6.0, 9.0, 10.5)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // causal unnormalized [1, 2]: y[i] = x[i] + 2*x[i-1] (edge: just x[0])
    val c = oneRow("series_fir(dynamic([1, 2, 3]), dynamic([1, 2]), false, false)")
      .getSeq[Double](0)
    assert(c.zip(Seq(1.0, 4.0, 7.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("series_pearson_correlation: ±1 on exact linear, 0 on constant") {
    assert(math.abs(oneRow(
      "series_pearson_correlation(dynamic([1, 2, 3]), dynamic([2, 4, 6]))").getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(oneRow(
      "series_pearson_correlation(dynamic([1, 2, 3]), dynamic([6, 4, 2]))").getDouble(0) + 1.0) < 1e-12)
    assert(oneRow(
      "series_pearson_correlation(dynamic([1, 2, 3]), dynamic([5, 5, 5]))").getDouble(0) == 0.0)
  }

  test("series_decompose: classical fixed-period components recompose to x") {
    // perfectly periodic series, period 2: [10, 20, 10, 20, 10, 20]
    val r = oneRow("series_decompose(dynamic([10, 20, 10, 20, 10, 20]), 2)").getStruct(0)
    val x        = Seq(10.0, 20.0, 10.0, 20.0, 10.0, 20.0)
    val trend    = r.getSeq[Double](r.fieldIndex("trend"))
    val seasonal = r.getSeq[Double](r.fieldIndex("seasonal"))
    val baseline = r.getSeq[Double](r.fieldIndex("baseline"))
    val residual = r.getSeq[Double](r.fieldIndex("residual"))
    // centered width-2 MA (c=1) looks at {x[i], x[i+1]} -> 15.0 everywhere
    // except the right edge, which renormalizes to the single sample x[5]
    assert(trend.take(5).forall(v => math.abs(v - 15.0) < 1e-12))
    assert(trend(5) == 20.0)
    // identity: baseline + residual == x exactly
    baseline.zip(residual).zip(x).foreach { case ((b, e), v) =>
      assert(math.abs(b + e - v) < 1e-12)
    }
    // phases alternate low/high and seasonal follows the phase
    assert(seasonal(0) == seasonal(2) && seasonal(1) == seasonal(3))
    assert(seasonal(1) > seasonal(0))
  }

  test("series_decompose_anomalies: a spike scores positive, flat stays 0") {
    // periodic base 10/20 with one +100 spike at index 4 (phase 0)
    val o = oneRow(
      "series_decompose_anomalies(dynamic([10, 20, 10, 20, 110, 20, 10, 20, 10, 20]), 2)")
      .getSeq[Double](0)
    assert(o(4) > 0.0, s"spike not flagged: $o")
    assert(o(4) == o.max)
  }

  test("series_periods_detect: a clean period-4 wave tops the candidates") {
    // 12 points of exact period-4 signal: autocorrelation peaks at lag 4
    // (and its harmonic 8); lag 4 must rank first with a near-1 score
    val o = oneRow(
      "series_periods_detect(dynamic([1, 5, 2, 9, 1, 5, 2, 9, 1, 5, 2, 9]), 2, 8, 2)")
    val row = o.getStruct(0)
    val periods = row.getSeq[Double](row.fieldIndex("periods"))
    val scores  = row.getSeq[Double](row.fieldIndex("scores"))
    assert(periods.head == 4.0, s"expected period 4 first: $periods / $scores")
    // biased estimator: a perfect wave scores the overlap fraction
    // (n−L)/n = 8/12 exactly — the large-lag penalty is intentional
    assert(scores.head == 0.666667, s"scores: $scores")
    assert(periods.size == 2 && scores.size == 2)
  }

  test("series_fit_2lines_dynamic: exact piecewise-linear series recovers the break") {
    // y = i for i<6, y = 22 - 2i for i>=6 — all sums integer-exact in
    // double, so the fit recovers the params exactly and rss is ~0
    val o = oneRow(
      "series_fit_2lines_dynamic(dynamic([0.0, 1, 2, 3, 4, 5, 10, 8, 6, 4]))")
    val r = o.getStruct(0)
    assert(r.getAs[Long]("split_idx") == 6L)
    assert(math.abs(r.getAs[Double]("rsquare") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("left_slope") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("left_interception")) < 1e-9)
    assert(math.abs(r.getAs[Double]("right_slope") + 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("right_interception") - 22.0) < 1e-9)
    val fit = r.getSeq[Double](r.fieldIndex("line_fit"))
    assert(fit.zip(Seq(0.0, 1, 2, 3, 4, 5, 10, 8, 6, 4))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("make-series supports multiple aggregations with per-agg defaults") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 10.0), (1L, 20.0), (1L, 30.0), (3L, 40.0)).toDF("t", "v")
    val out = graft.kql.KqlPipeline.run(Map("e" -> df),
      """e
        | | make-series n = count() default = 0, sv = sum(v) default = -1
        |     on t from 0 to 4 step 1""".stripMargin)
    val r = out.head()
    assert(r.getSeq[Long](r.fieldIndex("n")) == Seq(1L, 2L, 0L, 1L))
    assert(r.getSeq[Double](r.fieldIndex("sv")) == Seq(10.0, 50.0, -1.0, 40.0))
  }

  test("series_fill family: forward/backward/const/linear with edge nulls") {
    val x = "dynamic([null, 4, null, null, 10, null])"
    assert(oneRow(s"series_fill_forward($x)").getSeq[java.lang.Double](0) ==
      Seq(null, 4.0, 4.0, 4.0, 10.0, 10.0))
    assert(oneRow(s"series_fill_backward($x)").getSeq[java.lang.Double](0) ==
      Seq(4.0, 4.0, 10.0, 10.0, 10.0, null))
    assert(oneRow(s"series_fill_const($x, -1.0)").getSeq[java.lang.Double](0) ==
      Seq(-1.0, 4.0, -1.0, -1.0, 10.0, -1.0))
    // interior nulls interpolate (4→10 over 3 steps); edge nulls take the
    // nearest non-null
    assert(oneRow(s"series_fill_linear($x)").getSeq[java.lang.Double](0) ==
      Seq(4.0, 4.0, 6.0, 8.0, 10.0, 10.0))
    // all-null series stays all-null (no neighbor to take)
    assert(oneRow("series_fill_linear(dynamic([null, null]))")
      .getSeq[java.lang.Double](0) == Seq(null, null))
  }

  test("series arithmetic lanes and folds") {
    assert(oneRow("series_multiply(dynamic([1, 2, 3]), dynamic([4, 5, 6]))")
      .getSeq[Double](0) == Seq(4.0, 10.0, 18.0))
    assert(oneRow("series_subtract(dynamic([5, 5]), dynamic([2, 7]))")
      .getSeq[Double](0) == Seq(3.0, -2.0))
    assert(oneRow("series_divide(dynamic([8, 9]), dynamic([2, 3]))")
      .getSeq[Double](0) == Seq(4.0, 3.0))
    assert(oneRow("series_sign(dynamic([-3, 0, 9]))")
      .getSeq[Double](0) == Seq(-1.0, 0.0, 1.0))
    assert(oneRow("series_sum(dynamic([1, 2, 3]))").getDouble(0) == 6.0)
    assert(oneRow("series_avg(dynamic([1, 2, 3, 6]))").getDouble(0) == 3.0)
  }

  test("series_seasonal repeats the per-phase means of the raw series") {
    // exact period: the series IS its seasonal component
    assert(oneRow("series_seasonal(dynamic([1, 2, 3, 1, 2, 3]), 3)")
      .getSeq[Double](0) == Seq(1.0, 2.0, 3.0, 1.0, 2.0, 3.0))
    // noisy phases average: phase0 (1+3)/2, phase1 (2+2)/2, phase2 3
    assert(oneRow("series_seasonal(dynamic([1, 2, 3, 3, 2, 3]), 3)")
      .getSeq[Double](0) == Seq(2.0, 2.0, 3.0, 2.0, 2.0, 3.0))
    // length not a multiple of the period: trailing phases use fewer samples
    assert(oneRow("series_seasonal(dynamic([4, 6, 8, 10, 12]), 2)")
      .getSeq[Double](0) == Seq(8.0, 8.0, 8.0, 8.0, 8.0))
  }
}
