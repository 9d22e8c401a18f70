package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, NumericType}

/** `welch_test(mean1, variance1, count1, mean2, variance2, count2)` — the
  * two-sided p-value of Welch's unequal-variance t-test, the ADX scalar
  * read out of summarize stats (the engine-side shape: means/variances/
  * counts aggregate distributively, the test itself is O(1) per group —
  * exactly how a 100 TB A/B readout should be computed).
  *
  * Student-t tail via the regularized incomplete beta
  * I_{ν/(ν+t²)}(ν/2, ½), evaluated with the standard Lentz continued
  * fraction and a Lanczos log-gamma — textbook public-domain numerics,
  * implemented from the formulas. Null when either count < 2 or a
  * variance is negative.
  */
case class WelchTest(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size != 6)
      TypeCheckResult.TypeCheckFailure(
        "welch_test takes (mean1, var1, count1, mean2, var2, count2)")
    else if (!children.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure("welch_test arguments must be numeric")
    else TypeCheckResult.TypeCheckSuccess

  private def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }

  override def eval(input: InternalRow): Any = {
    val vs = new Array[Double](6)
    var i = 0
    while (i < 6) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = num(v)
      i += 1
    }
    WelchTest.pValue(vs(0), vs(1), vs(2), vs(3), vs(4), vs(5))
      .fold(null: Any)(java.lang.Double.valueOf)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WelchTest = copy(children = newChildren)

  override def prettyName: String = "welch_test"
}

object WelchTest {

  def pValue(m1: Double, v1: Double, n1: Double,
             m2: Double, v2: Double, n2: Double): Option[Double] = {
    if (n1 < 2 || n2 < 2 || v1 < 0 || v2 < 0) return None
    val se1 = v1 / n1
    val se2 = v2 / n2
    val se  = se1 + se2
    if (se == 0.0) return Some(if (m1 == m2) 1.0 else 0.0)
    val t   = (m1 - m2) / math.sqrt(se)
    val dof = se * se / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    // two-sided p = I_{ν/(ν+t²)}(ν/2, 1/2)
    Some(regIncBeta(dof / 2.0, 0.5, dof / (dof + t * t)))
  }

  /** Lanczos log-gamma (g=7, n=9 coefficients). */
  private[expressions] def lnGamma(x0: Double): Double = {
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    val x = x0 - 1.0
    var a = g(0)
    val t = x + 7.5
    var i = 1
    while (i < 9) { a += g(i) / (x + i); i += 1 }
    0.5 * math.log(2.0 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
  }

  /** Regularized incomplete beta I_x(a, b), Lentz continued fraction. */
  private[expressions] def regIncBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val lbeta = lnGamma(a + b) - lnGamma(a) - lnGamma(b) +
      a * math.log(x) + b * math.log(1.0 - x)
    val front = math.exp(lbeta)
    if (x < (a + 1.0) / (a + b + 2.0)) front * betacf(a, b, x) / a
    else 1.0 - math.exp(lnGamma(a + b) - lnGamma(a) - lnGamma(b) +
      b * math.log(1.0 - x) + a * math.log(x)) * betacf(b, a, 1.0 - x) / b
  }

  private def betacf(a: Double, b: Double, x: Double): Double = {
    val eps  = 1e-14
    val tiny = 1e-30
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1.0)
    if (math.abs(d) < tiny) d = tiny
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < tiny) d = tiny
      c = 1.0 + aa / c; if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
      d = 1.0 + aa * d; if (math.abs(d) < tiny) d = tiny
      c = 1.0 + aa / c; if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) return h
      m += 1
    }
    h
  }
}
