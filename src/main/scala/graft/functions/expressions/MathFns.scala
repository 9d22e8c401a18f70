package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ADX math-scalar tail backed by the WelchTest numerics (Lanczos
  * log-gamma, Lentz incomplete beta — textbook public-domain formulas):
  * `gamma(x)`, `loggamma(x)`, `beta_cdf(x, a, b)`. Null outside the
  * positive domain (ADX yields NaN/era errors there; null is this
  * engine's ANSI-friendly contract, same as the to* casts).
  */
private[expressions] trait DoubleIn {
  def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }
}

case class GammaFn(child: Expression)
    extends UnaryExpression with CodegenFallback with DoubleIn {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[NumericType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("gamma takes a numeric argument")
  override def nullSafeEval(v: Any): Any = {
    val x = num(v)
    if (x <= 0.0) null else java.lang.Double.valueOf(math.exp(WelchTest.lnGamma(x)))
  }
  override protected def withNewChildInternal(newChild: Expression): GammaFn =
    copy(child = newChild)
  override def prettyName: String = "gamma"
}

case class LogGammaFn(child: Expression)
    extends UnaryExpression with CodegenFallback with DoubleIn {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[NumericType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("loggamma takes a numeric argument")
  override def nullSafeEval(v: Any): Any = {
    val x = num(v)
    if (x <= 0.0) null else java.lang.Double.valueOf(WelchTest.lnGamma(x))
  }
  override protected def withNewChildInternal(newChild: Expression): LogGammaFn =
    copy(child = newChild)
  override def prettyName: String = "loggamma"
}

/** `beta_cdf(x, a, b)` — the regularized incomplete beta I_x(a, b), ADX's
  * beta distribution CDF. Domain: 0 ≤ x ≤ 1, a > 0, b > 0; null outside.
  */
case class BetaCdf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback with DoubleIn {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("beta_cdf takes (x, a, b) numerics")
  override def nullSafeEval(xv: Any, av: Any, bv: Any): Any = {
    val (x, a, b) = (num(xv), num(av), num(bv))
    if (x < 0.0 || x > 1.0 || a <= 0.0 || b <= 0.0) null
    else java.lang.Double.valueOf(WelchTest.regIncBeta(a, b, x))
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BetaCdf = copy(f, s, t)
  override def prettyName: String = "beta_cdf"
}

/** `beta_inv(p, a, b)` — the inverse of `beta_cdf`, ADX's beta quantile.
  * 80 bisection steps on the monotone I_x(a, b) pin the root to an
  * interval below double ulp — deterministic across JVMs (no
  * Newton-step divergence cases to special-case). Domain: 0 ≤ p ≤ 1,
  * a > 0, b > 0; null outside, endpoints exact.
  */
case class BetaInv(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback with DoubleIn {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("beta_inv takes (p, a, b) numerics")
  override def nullSafeEval(pv: Any, av: Any, bv: Any): Any = {
    val (p, a, b) = (num(pv), num(av), num(bv))
    if (p < 0.0 || p > 1.0 || a <= 0.0 || b <= 0.0) null
    else if (p == 0.0) java.lang.Double.valueOf(0.0)
    else if (p == 1.0) java.lang.Double.valueOf(1.0)
    else {
      var lo = 0.0; var hi = 1.0
      var i = 0
      while (i < 80) {
        val mid = (lo + hi) / 2
        if (WelchTest.regIncBeta(a, b, mid) < p) lo = mid else hi = mid
        i += 1
      }
      java.lang.Double.valueOf((lo + hi) / 2)
    }
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BetaInv = copy(f, s, t)
  override def prettyName: String = "beta_inv"
}

/** `parse_csv(line)` — ADX's CSV record splitter: one line (RFC-4180
  * quoting: embedded commas, doubled quotes) → array of field strings.
  * Reuses the checkpoint store's record splitter — the same dialect the
  * engine already round-trips for its own state files
  * (state/CheckpointStore.scala). Only the FIRST record is returned (the
  * ADX contract for a scalar input); null input stays null.
  */
case class ParseCsv(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("parse_csv takes a string")
  override def nullSafeEval(v: Any): Any = {
    val line = v.asInstanceOf[UTF8String].toString
    val recs = graft.state.CheckpointStore.splitRecords(line)
    val fields = recs.headOption.getOrElse(IndexedSeq(""))
    new GenericArrayData(fields.map(UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): ParseCsv =
    copy(child = newChild)
  override def prettyName: String = "parse_csv"
}
