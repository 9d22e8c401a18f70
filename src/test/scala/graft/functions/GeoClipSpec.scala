package graft.functions.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic contract for the spherical Greiner-Hormann clipper
  * (GeoClip.scala). The oracle-gated literal pins live in
  * q_kql_geo_intersection; this spec checks the LAWS on a grid of
  * polygon pairs, including high-latitude rings where a planar clipper
  * diverges from the geodesic one.
  */
class GeoClipSpec extends AnyFunSuite {

  import GeoJsonTestUtil.{areaOf, quad, rings}

  private def ring(pts: (Double, Double)*): (Array[Double], Array[Double]) =
    (pts.map(_._1).toArray, pts.map(_._2).toArray)

  private def ringArea(lngs: Array[Double], lats: Array[Double]): Double =
    GeoClip.areaM2(lngs.indices.map(i => GeoClip.xyz(lngs(i), lats(i))).toArray)

  test("inclusion-exclusion: area(I) + area(U) == area(A) + area(B) across latitudes") {
    val cases = Seq(
      (quad(0, 0, 3, 2), quad(2, 1.5, 3, 2)),
      (quad(10, 60, 4, 2), quad(13, 61, 4, 2)),   // high latitude
      // NB edges must not be collinear-overlapping (e.g. a shared meridian
      // edge): same-great-circle overlap is the documented divergence
      (quad(-170, -45, 6, 3), quad(-167, -43, 4, 4)),
      (quad(30, 20, 5, 5), quad(30, 20, 2, 9))    // cross shape: 8-vertex I
    )
    for (((alg, alt), (blg, blt)) <- cases) {
      val i = GeoClip.clipPolygons(alg, alt, blg, blt, intersectionOp = true)
      val u = GeoClip.clipPolygons(alg, alt, blg, blt, intersectionOp = false)
      val lhs = areaOf(i) + areaOf(u)
      val rhs = ringArea(alg, alt) + ringArea(blg, blt)
      assert(math.abs(lhs - rhs) < 1e-6 * rhs, s"incl-excl: $lhs vs $rhs")
    }
  }

  test("commutativity and orientation invariance (area-level)") {
    val (alg, alt) = quad(5, 40, 4, 3)
    val (blg, blt) = quad(8, 42, 3, 4)
    val ab = areaOf(GeoClip.clipPolygons(alg, alt, blg, blt, intersectionOp = true))
    val ba = areaOf(GeoClip.clipPolygons(blg, blt, alg, alt, intersectionOp = true))
    assert(math.abs(ab - ba) < 1e-6 * ab)
    // feed A clockwise: result must be identical (CCW normalisation)
    val cw = areaOf(GeoClip.clipPolygons(alg.reverse, alt.reverse, blg, blt,
      intersectionOp = true))
    assert(math.abs(ab - cw) < 1e-9 * ab)
  }

  test("containment, disjoint, and the empty encoding") {
    val (alg, alt) = quad(0, 0, 10, 10)
    val (clg, clt) = quad(1, 1, 2, 2)
    val i = GeoClip.clipPolygons(alg, alt, clg, clt, intersectionOp = true)
    assert(math.abs(areaOf(i) - ringArea(clg, clt)) < 1e-9 * areaOf(i), "A∩C == C when C⊂A")
    val u = GeoClip.clipPolygons(alg, alt, clg, clt, intersectionOp = false)
    assert(math.abs(areaOf(u) - ringArea(alg, alt)) < 1e-9 * areaOf(u), "A∪C == A when C⊂A")
    val (dlg, dlt) = quad(60, 0, 2, 2)
    assert(GeoClip.clipPolygons(alg, alt, dlg, dlt, intersectionOp = true)
      .contains("GeometryCollection"), "disjoint intersection empty")
    val du = GeoClip.clipPolygons(alg, alt, dlg, dlt, intersectionOp = false)
    assert(du.contains("MultiPolygon") && rings(du).size == 2, "disjoint union keeps both")
  }

  test("crossed rectangles: center-square intersection, plus-shaped union") {
    val (alg, alt) = quad(0, 0, 6, 2)
    val (blg, blt) = quad(0, 0, 2, 6)
    val i = GeoClip.clipPolygons(alg, alt, blg, blt, intersectionOp = true)
    val rs = rings(i)
    // 4 crossings: B's meridian edges x A's (poleward-bowed) lat edges --
    // the center square, with corners slightly beyond lat +-2
    assert(rs.size == 1 && rs.head.length == 5, s"got ${rs.map(_.length)}")
    assert(rs.head.forall { case (x, y) =>
      math.abs(math.abs(x) - 2.0) < 1e-9 && math.abs(y) > 2.0 && math.abs(y) < 2.02 })
    val sq = ringArea(quad(0, 0, 2, 2)._1, quad(0, 0, 2, 2)._2)
    assert(math.abs(areaOf(i) - sq) < 1e-2 * sq, "close to the 4x4-degree quad")
    val u = GeoClip.clipPolygons(alg, alt, blg, blt, intersectionOp = false)
    assert(rings(u).head.length == 13, "union of the cross is a 12-gon")
  }

  test("hole-forming union: U-shape + closing bar emit the void as an interior ring") {
    // A is a U (notch open to the north), B is a bar closing the notch
    // from above: their union encloses a void, which the GH traversal
    // traces as a CW loop. The emitter must attach it as an interior
    // ring (RFC 7946), not an island — an island would inflate the area
    // by 2x the hole and break inclusion-exclusion.
    val (alg, alt) = ring((-4.0, -4.0), (4.0, -4.0), (4.0, 4.0), (2.0, 4.0),
      (2.0, -2.0), (-2.0, -2.0), (-2.0, 4.0), (-4.0, 4.0))
    val (blg, blt) = ring((-5.0, 1.0), (5.0, 1.0), (5.0, 5.0), (-5.0, 5.0))
    val u = GeoClip.clipPolygons(alg, alt, blg, blt, intersectionOp = false)
    assert(u.contains("\"Polygon\"") && !u.contains("MultiPolygon"),
      s"one outer with a hole, got $u")
    val ur = rings(u)
    assert(ur.size == 2, s"outer + hole, got ${ur.size} rings")
    def signed(r: Array[(Double, Double)]): Double =
      GeoClip.signedAreaM2(r.dropRight(1).map { case (lo, la) => GeoClip.xyz(lo, la) })
    assert(signed(ur(0)) > 0, "outer ring CCW")
    assert(signed(ur(1)) < 0, "hole ring CW (RFC 7946)")
    // the void's center must be inside the hole ring
    val hole = ur(1).dropRight(1).map { case (lo, la) => GeoClip.xyz(lo, la) }
    assert(GeoClip.pointInRing(GeoClip.xyz(0.0, 0.0), hole), "void center in hole")
    // intersection is the two arm overlaps — and inclusion-exclusion must
    // hold with the hole SUBTRACTED (areaOf folds signed ring areas)
    val i = GeoClip.clipPolygons(alg, alt, blg, blt, intersectionOp = true)
    assert(rings(i).size == 2, "two disjoint arm overlaps")
    val lhs = areaOf(i) + areaOf(u)
    val rhs = ringArea(alg, alt) + ringArea(blg, blt)
    assert(math.abs(lhs - rhs) < 1e-6 * rhs, s"incl-excl with hole: $lhs vs $rhs")
  }

  test("line clipped to ring: length conserved, inside/outside degenerate cases") {
    val (alg, alt) = quad(0, 0, 4, 4)
    val clipped = GeoClip.clipLineWithPolygon(
      Array(-10.0, 10.0), Array(0.0, 0.0), alg, alt)
    assert(clipped.contains("LineString"))
    val inside = GeoClip.clipLineWithPolygon(
      Array(-1.0, 1.0), Array(0.5, -0.5), alg, alt)
    assert(inside.contains("[-1.0,0.5]") && inside.contains("[1.0,-0.5]"),
      "fully-inside line returned whole")
    val outside = GeoClip.clipLineWithPolygon(
      Array(20.0, 30.0), Array(0.0, 0.0), alg, alt)
    assert(outside.contains("GeometryCollection"))
  }

  test("line/line crossings and null guards") {
    // equator segment x meridian segment -> the single point (0,0)
    val p = GeoClip.intersectLines(Array(-5.0, 5.0), Array(0.0, 0.0),
      Array(0.0, 0.0), Array(-5.0, 5.0))
    assert(p.contains("\"Point\""))
    // two crossings -> MultiPoint
    val zig = GeoClip.intersectLines(
      Array(-5.0, 5.0, 5.0, -5.0), Array(-1.0, -1.0, 1.0, 1.0),
      Array(0.0, 0.0), Array(-5.0, 5.0))
    assert(zig.contains("MultiPoint"))
    assert(GeoClip.clipPolygons(Array(0.0, 1.0), Array(0.0, 1.0),
      Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0), intersectionOp = true) == null,
      "2-vertex ring -> null")
    assert(GeoClip.intersectLines(Array(0.0), Array(0.0),
      Array(0.0, 1.0), Array(0.0, 1.0)) == null, "1-point line -> null")
  }
}
