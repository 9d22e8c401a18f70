package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NumericType}

/** Discrete Fourier transform for the ADX `series_fft` / `series_ifft`
  * pair. O(n log n) for EVERY length: iterative radix-2 Cooley-Tukey for
  * powers of two, Bluestein's chirp-z (the convolution re-expressed
  * through zero-padded power-of-two FFTs) otherwise — per-row series stay
  * cheap no matter how the user binned them, which is what keeps the
  * expression viable inside a 100 TB scan. Forward is unnormalized,
  * inverse divides by n (the numpy/ADX convention), so
  * `series_ifft(series_fft(x))` round-trips.
  *
  * Public algorithm (Cooley-Tukey 1965; Bluestein 1970).
  */
object Fft {
  /** In-place iterative radix-2; n MUST be a power of two. Unnormalized. */
  private def radix2(re: Array[Double], im: Array[Double], invert: Boolean): Unit = {
    val n = re.length
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (invert) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var s = 0
      while (s < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(s + k); val ui = im(s + k)
          val vr0 = re(s + k + len / 2); val vi0 = im(s + k + len / 2)
          val vr = vr0 * cr - vi0 * ci; val vi = vr0 * ci + vi0 * cr
          re(s + k) = ur + vr; im(s + k) = ui + vi
          re(s + k + len / 2) = ur - vr; im(s + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi; ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        s += len
      }
      len <<= 1
    }
  }

  /** Bluestein chirp-z: DFT of arbitrary n as one circular convolution. */
  private def bluestein(xr: Array[Double], xi: Array[Double], invert: Boolean)
      : (Array[Double], Array[Double]) = {
    val n = xr.length
    val sign = if (invert) 1.0 else -1.0
    // chirp w_j = e^{sign·iπ j²/n}; reduce j² mod 2n first — at large j the
    // raw product loses the angle's low bits to double rounding
    val wr = new Array[Double](n); val wi = new Array[Double](n)
    var j = 0
    while (j < n) {
      val a = sign * math.Pi * ((j.toLong * j) % (2L * n)).toDouble / n
      wr(j) = math.cos(a); wi(j) = math.sin(a)
      j += 1
    }
    var m = 1
    while (m < 2 * n - 1) m <<= 1
    val ar = new Array[Double](m); val ai = new Array[Double](m)
    val br = new Array[Double](m); val bi = new Array[Double](m)
    j = 0
    while (j < n) {
      // a_j = x_j · w_j ; b_j = conj(w_j), mirrored circularly
      ar(j) = xr(j) * wr(j) - xi(j) * wi(j)
      ai(j) = xr(j) * wi(j) + xi(j) * wr(j)
      br(j) = wr(j); bi(j) = -wi(j)
      if (j > 0) { br(m - j) = wr(j); bi(m - j) = -wi(j) }
      j += 1
    }
    radix2(ar, ai, invert = false)
    radix2(br, bi, invert = false)
    j = 0
    while (j < m) {
      val r = ar(j) * br(j) - ai(j) * bi(j)
      ai(j) = ar(j) * bi(j) + ai(j) * br(j)
      ar(j) = r
      j += 1
    }
    radix2(ar, ai, invert = true)
    val outR = new Array[Double](n); val outI = new Array[Double](n)
    j = 0
    while (j < n) {
      val cr = ar(j) / m; val ci = ai(j) / m
      outR(j) = cr * wr(j) - ci * wi(j)
      outI(j) = cr * wi(j) + ci * wr(j)
      j += 1
    }
    (outR, outI)
  }

  /** DFT (or inverse when `invert`) of any length; inverse divides by n. */
  def transform(xr0: Array[Double], xi0: Array[Double], invert: Boolean)
      : (Array[Double], Array[Double]) = {
    val n = xr0.length
    if (n == 0) return (xr0, xi0)
    val (re, im) =
      if ((n & (n - 1)) == 0) {
        val r = xr0.clone(); val i = xi0.clone()
        radix2(r, i, invert)
        (r, i)
      } else bluestein(xr0, xi0, invert)
    if (invert) {
      var j = 0
      while (j < n) { re(j) /= n; im(j) /= n; j += 1 }
    }
    (re, im)
  }
}

/** Shared machinery of `series_fft(x_real [, x_imag])` and `series_ifft`.
  * Returns `[re_series, im_series]` — an array<array<double>> pair indexed
  * `[0]`/`[1]` (ADX's tuple assignment `(yr, yi) = series_fft(x)` has no
  * Spark analog; the indexed pair is the documented divergence). Null on
  * null input or mismatched real/imag lengths.
  */
abstract class SeriesFftBase extends Expression with CodegenFallback {
  def children: Seq[Expression]
  def invert: Boolean

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def numArr(t: DataType): Boolean = t match {
      case ArrayType(e, _) => e.isInstanceOf[NumericType]
      case _               => false
    }
    if (children.size < 1 || children.size > 2)
      TypeCheckResult.TypeCheckFailure(s"$prettyName takes (x_real [, x_imag])")
    else if (!children.forall(c => numArr(c.dataType)))
      TypeCheckResult.TypeCheckFailure(s"$prettyName arguments must be numeric arrays")
    else TypeCheckResult.TypeCheckSuccess
  }

  // Null on an element null (matching SeriesFitPoly): a gap in a binned
  // series must surface as a null spectrum, not silently become a zero
  // sample — callers wanting 0-fill should series_fill first.
  private def toDoubles(a: ArrayData, t: DataType): Array[Double] = {
    val et  = t.asInstanceOf[ArrayType].elementType
    val n   = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = a.get(i, et)
      v match {
        case null                                      => return null
        case d: org.apache.spark.sql.types.Decimal     => out(i) = d.toDouble
        case x: Number                                 => out(i) = x.doubleValue()
      }
      i += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val r0 = children.head.eval(input)
    if (r0 == null) return null
    val xr = toDoubles(r0.asInstanceOf[ArrayData], children.head.dataType)
    if (xr == null) return null
    val xi = if (children.size == 2) {
      val i0 = children(1).eval(input)
      if (i0 == null) return null
      toDoubles(i0.asInstanceOf[ArrayData], children(1).dataType)
    } else new Array[Double](xr.length)
    if (xi == null || xi.length != xr.length) return null
    val (re, im) = Fft.transform(xr, xi, invert)
    new GenericArrayData(Array[Any](
      new GenericArrayData(re.map(v => v: Any)),
      new GenericArrayData(im.map(v => v: Any))))
  }
}

case class SeriesFft(children: Seq[Expression]) extends SeriesFftBase {
  override def invert: Boolean = false
  override def prettyName: String = "series_fft"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SeriesFft = copy(children = newChildren)
}

case class SeriesIfft(children: Seq[Expression]) extends SeriesFftBase {
  override def invert: Boolean = true
  override def prettyName: String = "series_ifft"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SeriesIfft = copy(children = newChildren)
}