package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ADX `series_fit_poly(y [, degree])` over the implicit axis 0..n−1 —
  * degree-k least squares by solving the (k+1)×(k+1) normal equations
  * with partially-pivoted Gaussian elimination (well-conditioned for the
  * small degrees ADX allows; degree capped at 8 here, ADX caps at 16).
  * Returns the series_fit_line-shaped struct: rsquare, coefficients
  * (ascending — degree 0 first; documented, ADX lists per-degree),
  * variance, rvariance, poly_fit. Null y elements are rejected as null
  * output; n ≤ degree yields null (underdetermined). rsquare := 1 on a
  * constant series (exact fit), the series_fit_line convention.
  *
  * Metadata-plane scalar: CodegenFallback (a per-row O(n·k + k³) solver
  * gains nothing from generated Java).
  */
case class SeriesFitPoly(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("rsquare", DoubleType),
    StructField("coefficients", ArrayType(DoubleType, containsNull = false)),
    StructField("variance", DoubleType),
    StructField("rvariance", DoubleType),
    StructField("poly_fit", ArrayType(DoubleType, containsNull = false))))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 1 || children.size > 2)
      TypeCheckResult.TypeCheckFailure("series_fit_poly takes (y [, degree])")
    else children.head.dataType match {
      case ArrayType(_: NumericType, _) | ArrayType(NullType, _) =>
        if (children.size == 2 &&
            !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(children(1).dataType))
          TypeCheckResult.TypeCheckFailure("series_fit_poly degree must be integral")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("series_fit_poly input must be a numeric array")
    }

  private def elemToDouble(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: Number  => n.doubleValue()
  }

  override def eval(input: InternalRow): Any = {
    val arr = children.head.eval(input)
    if (arr == null) return null
    val degV = if (children.size == 2) children(1).eval(input) else Integer.valueOf(1)
    if (degV == null) return null
    val deg = degV.asInstanceOf[Number].intValue()
    if (deg < 1 || deg > 8) return null
    val ad = arr.asInstanceOf[ArrayData]
    val et = children.head.dataType.asInstanceOf[ArrayType].elementType
    val n  = ad.numElements()
    if (n <= deg) return null
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (ad.isNullAt(i)) return null
      y(i) = elemToDouble(ad.get(i, et))
      i += 1
    }
    val k = deg + 1
    // normal equations: A[p][q] = Σ i^(p+q), b[p] = Σ y_i · i^p
    val pows = new Array[Double](2 * deg + 1)
    i = 0
    while (i < n) {
      var ip = 1.0
      var p  = 0
      while (p <= 2 * deg) { pows(p) += ip; ip *= i; p += 1 }
      i += 1
    }
    val a = Array.ofDim[Double](k, k + 1)
    var p = 0
    while (p < k) {
      var q = 0
      while (q < k) { a(p)(q) = pows(p + q); q += 1 }
      // b vector in the augmented column
      var s = 0.0
      i = 0
      while (i < n) { s += y(i) * math.pow(i, p); i += 1 }
      a(p)(k) = s
      p += 1
    }
    // Gaussian elimination with partial pivoting
    var col = 0
    while (col < k) {
      var piv = col
      var r = col + 1
      while (r < k) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (a(piv)(col) == 0.0) return null // singular (cannot happen for distinct axis points)
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t }
      r = col + 1
      while (r < k) {
        val f = a(r)(col) / a(col)(col)
        var c = col
        while (c <= k) { a(r)(c) -= f * a(col)(c); c += 1 }
        r += 1
      }
      col += 1
    }
    val coef = new Array[Double](k)
    var rr = k - 1
    while (rr >= 0) {
      var s = a(rr)(k)
      var c = rr + 1
      while (c < k) { s -= a(rr)(c) * coef(c); c += 1 }
      coef(rr) = s / a(rr)(rr)
      rr -= 1
    }
    val fit = new Array[Double](n)
    var ssRes = 0.0; var sy = 0.0; var syy = 0.0
    i = 0
    while (i < n) {
      var v  = 0.0
      var ip = 1.0
      var d  = 0
      while (d < k) { v += coef(d) * ip; ip *= i; d += 1 }
      fit(i) = v
      val r = y(i) - v
      ssRes += r * r
      sy += y(i); syy += y(i) * y(i)
      i += 1
    }
    val ssTot = syy - sy * sy / n
    val rsq   = if (ssTot > 0) 1 - ssRes / ssTot else 1.0
    InternalRow(
      rsq,
      new GenericArrayData(coef.map(java.lang.Double.valueOf(_): Any)),
      if (n > 1) ssTot / (n - 1) else 0.0,
      if (n > 1) ssRes / (n - 1) else 0.0,
      new GenericArrayData(fit.map(java.lang.Double.valueOf(_): Any)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SeriesFitPoly =
    copy(children = newChildren)

  override def prettyName: String = "series_fit_poly"
}
