package graft.functions.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Geometric contract for the spherical offset-curve buffers
  * (GeoBuffer.scala). The oracle-gated in-plan pins live in
  * q_kql_geo_buffer; this spec checks the LAWS directly on the pure
  * construction: Steiner-formula area on straight/convex inputs,
  * distance-contract containment probes on both join kinds (convex arc,
  * concave chord crossing), ring orientation, and the null guards.
  */
class GeoBufferSpec extends AnyFunSuite {

  private val R = 6371008.8
  // degrees subtended by m meters along a great circle
  private def deg(m: Double): Double = m / R * 180.0 / math.Pi

  private def ringArea(pts: Array[(Double, Double)]): Double =
    GeoClip.areaM2(pts.map { case (lo, la) => GeoClip.xyz(lo, la) })

  private def inside(pts: Array[(Double, Double)], lng: Double, lat: Double): Boolean = {
    val ring = pts.map { case (lo, la) => GeoClip.xyz(lo, la) }
    // pointInRing expects a CCW ring; the builder emits CCW
    GeoClip.pointInRing(GeoClip.xyz(lng, lat), ring)
  }

  private val r = 50000.0

  test("straight equator segment: Steiner area 2rL + pi r^2, probes on the distance contract") {
    val b = GeoBuffer.lineBuffer(Array(10.0, 12.0), Array(0.0, 0.0), r, r / 200).get
    val L = math.toRadians(2.0) * R
    val expected = 2 * r * L + math.Pi * r * r
    val a = ringArea(b)
    assert(math.abs(a - expected) < 0.01 * expected,
      s"area $a vs Steiner $expected")
    // CCW by construction
    assert(GeoClip.signedOmega(b.map { case (lo, la) => GeoClip.xyz(lo, la) }) > 0)
    // the line itself and near-side probes are inside
    assert(inside(b, 10.0, 0.0) && inside(b, 12.0, 0.0) && inside(b, 11.0, 0.0))
    assert(inside(b, 11.0, deg(0.8 * r)), "0.8r north of the midpoint")
    assert(!inside(b, 11.0, deg(1.3 * r)), "1.3r north of the midpoint")
    // end-cap probes east of the far endpoint
    assert(inside(b, 12.0 + deg(0.7 * r), 0.0))
    assert(!inside(b, 12.0 + deg(1.3 * r), 0.0))
  }

  test("L-shaped polyline: convex arc and concave crossing joins both honor distance r") {
    val b = GeoBuffer.lineBuffer(Array(10.0, 12.0, 12.0), Array(0.0, 0.0, 2.0), r, r / 200).get
    for ((lo, la) <- Seq((10.0, 0.0), (12.0, 0.0), (12.0, 2.0)))
      assert(inside(b, lo, la), s"input vertex ($lo,$la)")
    // inner (concave) side: a point 0.3r into the corner is within r of both legs
    assert(inside(b, 12.0 - deg(0.3 * r), deg(0.3 * r)))
    // outer (convex) side: the diagonal point at r*sqrt(2) from the corner is out
    assert(!inside(b, 12.0 + deg(r), -deg(r)))
    // but the diagonal point at 0.6r (distance ~0.85r to the corner vertex) is in
    assert(inside(b, 12.0 + deg(0.6 * r), -deg(0.6 * r)))
    // area sits strictly between one sausage and the sum of both (they overlap)
    val l1 = math.toRadians(2.0) * R
    val one = 2 * r * l1 + math.Pi * r * r
    assert(ringArea(b) > one && ringArea(b) < 2 * one)
  }

  test("convex polygon buffer: Steiner area A + Pr + pi r^2; original vertices strictly inside") {
    val lngs = Array(10.0, 12.0, 12.0, 10.0)
    val lats = Array(-1.0, -1.0, 1.0, 1.0)
    val b = GeoBuffer.polygonBuffer(lngs, lats, r, r / 200).get
    val a0 = ringArea((lngs zip lats))
    // perimeter of the lat/lng-aligned square on the sphere
    val p0 = 2 * math.toRadians(2.0) * R * math.cos(math.toRadians(1.0)) +
      2 * math.toRadians(2.0) * R
    val expected = a0 + p0 * r + math.Pi * r * r
    assert(math.abs(ringArea(b) - expected) < 0.02 * expected,
      s"area ${ringArea(b)} vs Steiner $expected")
    for (i <- lngs.indices) assert(inside(b, lngs(i), lats(i)))
    assert(GeoClip.signedOmega(b.map { case (lo, la) => GeoClip.xyz(lo, la) }) > 0)
  }

  test("concave polygon buffer: reflex vertex keeps the distance contract") {
    // L-shaped hexagon with a reflex vertex at (11, 0)
    val lngs = Array(10.0, 11.0, 11.0, 12.0, 12.0, 10.0)
    val lats = Array(-1.0, -1.0, 0.0, 0.0, 1.0, 1.0)
    val b = GeoBuffer.polygonBuffer(lngs, lats, r, r / 200).get
    assert(ringArea(b) > ringArea((lngs zip lats)))
    for (i <- lngs.indices) assert(inside(b, lngs(i), lats(i)), s"vertex $i")
    // just outside the reflex corner but within r of the boundary -> inside
    assert(inside(b, 11.0 + deg(0.5 * r), -deg(0.5 * r)))
    // CW input normalises to the same ring (orientation-free contract)
    val bcw = GeoBuffer.polygonBuffer(lngs.reverse, lats.reverse, r, r / 200).get
    assert(math.abs(ringArea(bcw) - ringArea(b)) < 1e-6 * ringArea(b))
  }

  test("null guards: degenerate shapes, radius and tolerance domains") {
    assert(GeoBuffer.lineBuffer(Array(1.0), Array(1.0), r, 10).isEmpty)
    assert(GeoBuffer.lineBuffer(Array(1.0, 1.0), Array(1.0, 1.0), r, 10).isEmpty,
      "all-duplicate points collapse below 2")
    assert(GeoBuffer.lineBuffer(Array(1.0, 2.0), Array(0.0, 0.0), 0.0, 10).isEmpty)
    assert(GeoBuffer.lineBuffer(Array(1.0, 2.0), Array(0.0, 0.0), -5.0, 10).isEmpty)
    assert(GeoBuffer.lineBuffer(Array(1.0, 2.0), Array(0.0, 0.0), r, 0.0).isEmpty)
    assert(GeoBuffer.lineBuffer(Array(1.0, 200.0), Array(0.0, 0.0), r, 10).isEmpty)
    assert(GeoBuffer.lineBuffer(Array(1.0, 2.0), Array(0.0, Double.NaN), r, 10).isEmpty)
    assert(GeoBuffer.lineBuffer(Array(1.0, 2.0), Array(0.0, 0.0), math.Pi * R, 10).isEmpty)
    assert(GeoBuffer.polygonBuffer(Array(1.0, 2.0), Array(0.0, 0.0), r, 10).isEmpty)
    assert(GeoBuffer.polygonBuffer(Array(1.0, 2.0, 3.0), Array(0.0, 1.0, 0.0), r, -1).isEmpty)
  }

  test("closed-ring input form accepted; collinear run joins cleanly") {
    val open = GeoBuffer.polygonBuffer(
      Array(10.0, 12.0, 12.0, 10.0), Array(-1.0, -1.0, 1.0, 1.0), r, r / 200).get
    val closed = GeoBuffer.polygonBuffer(
      Array(10.0, 12.0, 12.0, 10.0, 10.0), Array(-1.0, -1.0, 1.0, 1.0, -1.0), r, r / 200).get
    assert(math.abs(ringArea(open) - ringArea(closed)) < 1e-9 * ringArea(open))
    // a collinear midpoint on the equator leg must not disturb the area
    val withMid = GeoBuffer.lineBuffer(Array(10.0, 11.0, 12.0), Array(0.0, 0.0, 0.0), r, r / 200).get
    val straight = GeoBuffer.lineBuffer(Array(10.0, 12.0), Array(0.0, 0.0), r, r / 200).get
    assert(math.abs(ringArea(withMid) - ringArea(straight)) < 0.002 * ringArea(straight))
  }
}
