package graft.functions

import graft.SparkSuite
import graft.functions.expressions.Fft

/** Pins the DFT machinery behind series_fft/series_ifft: agreement with the
  * O(n²) textbook DFT on both the radix-2 and the Bluestein path, the
  * inverse round-trip, and the numpy-checked fixed vector the SQL oracle
  * also pins (q_series_fft).
  */
class FftSpec extends SparkSuite {

  private def dftDirect(xr: Array[Double], xi: Array[Double], invert: Boolean)
      : (Array[Double], Array[Double]) = {
    val n = xr.length
    val sign = if (invert) 2.0 else -2.0
    val re = new Array[Double](n); val im = new Array[Double](n)
    for (k <- 0 until n; j <- 0 until n) {
      val a = sign * math.Pi * j * k / n
      re(k) += xr(j) * math.cos(a) - xi(j) * math.sin(a)
      im(k) += xr(j) * math.sin(a) + xi(j) * math.cos(a)
    }
    if (invert) for (k <- 0 until n) { re(k) /= n; im(k) /= n }
    (re, im)
  }

  test("matches the direct DFT on radix-2 and Bluestein lengths") {
    val rnd = new scala.util.Random(3)
    for (n <- Seq(1, 2, 8, 16, 6, 12, 17, 31, 100)) {
      val xr = Array.fill(n)(rnd.nextDouble() * 4 - 2)
      val xi = Array.fill(n)(rnd.nextDouble() * 4 - 2)
      for (inv <- Seq(false, true)) {
        val (gr, gi) = Fft.transform(xr, xi, inv)
        val (dr, di) = dftDirect(xr, xi, inv)
        for (k <- 0 until n) {
          assert(math.abs(gr(k) - dr(k)) < 1e-9, s"re n=$n inv=$inv k=$k")
          assert(math.abs(gi(k) - di(k)) < 1e-9, s"im n=$n inv=$inv k=$k")
        }
      }
    }
  }

  test("ifft ∘ fft is identity (both paths)") {
    val rnd = new scala.util.Random(9)
    for (n <- Seq(8, 12, 33)) {
      val xr = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      val xi = new Array[Double](n)
      val (fr, fi) = Fft.transform(xr, xi, invert = false)
      val (rr, ri) = Fft.transform(fr, fi, invert = true)
      for (k <- 0 until n) {
        assert(math.abs(rr(k) - xr(k)) < 1e-9)
        assert(math.abs(ri(k)) < 1e-9)
      }
    }
  }

  test("numpy-checked fixed vector (the SQL oracle's pin)") {
    val (re, im) = Fft.transform(
      Array(1.0, 2.0, 3.0, 4.0, 0.0, -1.0, -2.0, 1.0), new Array[Double](8), invert = false)
    val wantRe = Array(8.0, 1.0, 0.0, 1.0, -4.0, 1.0, 0.0, 1.0)
    val wantIm = Array(0.0, -9.242641, 4.0, 0.757359, 0.0, -0.757359, -4.0, 9.242641)
    for (k <- 0 until 8) {
      assert(math.abs(re(k) - wantRe(k)) < 1e-6, s"re k=$k: ${re(k)}")
      assert(math.abs(im(k) - wantIm(k)) < 1e-6, s"im k=$k: ${im(k)}")
    }
  }
}