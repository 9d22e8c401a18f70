package graft.functions.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic contract for the polygon-array union/simplify cores
  * (GeoClip.unionPolygonsArray / simplifyPolygonsArray). The oracle-gated
  * literal pins live in q_kql_geo_poly_arrays; this spec checks the LAWS:
  * disjoint additivity, pair-clip equivalence, swallow, idempotence,
  * chain merging, and the per-ring simplify correspondence.
  */
class GeoPolyArraysSpec extends AnyFunSuite {

  import GeoJsonTestUtil.{areaOf, quad, rings}

  private def ringArea(s: (Array[Double], Array[Double])): Double =
    GeoClip.areaM2(s._1.indices.map(i => GeoClip.xyz(s._1(i), s._2(i))).toArray)

  test("disjoint rings: union area is additive, every ring survives") {
    val shapes = Seq(quad(0, 0, 2, 2), quad(20, 5, 3, 2), quad(-30, -10, 1, 4))
    val u = GeoClip.unionPolygonsArray(shapes)
    assert(rings(u).size == 3)
    val expected = shapes.map(ringArea).sum
    assert(math.abs(areaOf(u) - expected) < 1e-6 * expected)
  }

  test("crossing pair: array union equals the pair clip") {
    val a = quad(0, 0, 4, 3)
    val b = quad(3, 2, 4, 3)
    val viaArray = GeoClip.unionPolygonsArray(Seq(a, b))
    val viaPair  = GeoClip.clipPolygons(a._1, a._2, b._1, b._2, intersectionOp = false)
    assert(math.abs(areaOf(viaArray) - areaOf(viaPair)) < 1e-9 * areaOf(viaPair))
  }

  test("containment swallows; duplicate rings are idempotent") {
    val a = quad(0, 0, 5, 5)
    val c = quad(1, 1, 1, 1)
    val u = GeoClip.unionPolygonsArray(Seq(a, c))
    assert(rings(u).size == 1)
    assert(math.abs(areaOf(u) - ringArea(a)) < 1e-9 * ringArea(a))
    // reversed order: the big ring swallows an already-accumulated small one
    val u2 = GeoClip.unionPolygonsArray(Seq(c, a))
    assert(math.abs(areaOf(u2) - ringArea(a)) < 1e-9 * ringArea(a))
    val dup = GeoClip.unionPolygonsArray(Seq(a, a))
    assert(rings(dup).size == 1)
    assert(math.abs(areaOf(dup) - ringArea(a)) < 1e-9 * ringArea(a))
  }

  test("chain merge: C crosses B crosses A collapses to one ring, restart scan covers A") {
    // A and C are disjoint; B crosses both — whatever the input order, the
    // fold must end with ONE ring whose area matches the pairwise builds
    val a = quad(0, 0, 3, 3)
    val b = quad(5, 0, 3, 3)
    val c = quad(10, 0, 3, 3)
    val abc1 = GeoClip.unionPolygonsArray(Seq(a, c, b)) // merge arrives last
    val abc2 = GeoClip.unionPolygonsArray(Seq(a, b, c))
    assert(rings(abc1).size == 1, s"expected one merged ring:\n$abc1")
    assert(rings(abc2).size == 1)
    assert(math.abs(areaOf(abc1) - areaOf(abc2)) < 1e-9 * areaOf(abc1))
    val ab = GeoClip.clipPolygons(a._1, a._2, b._1, b._2, intersectionOp = false)
    assert(areaOf(abc1) > areaOf(ab))
  }

  test("empty input and malformed rings") {
    assert(GeoClip.unionPolygonsArray(Seq.empty).contains("GeometryCollection"))
    assert(GeoClip.unionPolygonsArray(Seq((Array(0.0, 1.0), Array(0.0, 0.0)))) == null)
    assert(GeoClip.simplifyPolygonsArray(
      Seq((Array(0.0, 1.0), Array(0.0, 0.0))), 10.0) == null)
  }

  test("single-polygon simplify emits depth-3 Polygon coordinates (the r11 review bug)") {
    val sq  = quad(20, 0, 3, 3)
    val out = GeoClip.simplifyPolygonsArray(Seq(sq), 100.0)
    assert(out.contains("\"type\":\"Polygon\""))
    // the parsed ring must carry the square's vertices — a depth-2
    // emission parses as zero rings (or one garbage "ring" of scalars)
    val rs = rings(out)
    assert(rs.size == 1 && rs(0).length == 5, s"bad coordinates nesting:\n$out")
    assert(math.abs(areaOf(out) - ringArea(sq)) < 1e-9 * ringArea(sq))
  }

  test("pair clip on IDENTICAL rings: A∩A = A∪A = A (boundary-vertex probe guard)") {
    val a = quad(0, 0, 4, 3)
    for (op <- Seq(true, false)) {
      val out = GeoClip.clipPolygons(a._1, a._2, a._1, a._2, intersectionOp = op)
      assert(rings(out).size == 1, s"op=$op produced:\n$out")
      assert(math.abs(areaOf(out) - ringArea(a)) < 1e-9 * ringArea(a), s"op=$op")
    }
    // rotation of the vertex list is the same ring — still a duplicate
    val rot = (Array(4.0, 4.0, -4.0, -4.0), Array(-3.0, 3.0, 3.0, -3.0))
    val out = GeoClip.clipPolygons(a._1, a._2, rot._1, rot._2, intersectionOp = false)
    assert(rings(out).size == 1 && math.abs(areaOf(out) - ringArea(a)) < 1e-9 * ringArea(a))
  }

  test("simplify array matches the per-ring simplifier") {
    val zig = (Array(0.0, 2.0, 4.0, 6.0, 6.0, 0.0),
               Array(0.0, 0.001, -0.001, 0.0, 5.0, 5.0))
    val sq  = quad(20, 0, 3, 3)
    val out = GeoClip.simplifyPolygonsArray(Seq(zig, sq), 2000.0)
    val rs  = rings(out)
    assert(rs.size == 2)
    val solo = GeoSimplify.simplify(zig._1, zig._2, 2000.0, close = true).get
    assert(rs(0).length == solo.length,
      s"array form kept ${rs(0).length} vertices, per-ring kept ${solo.length}")
    // the 2 km tolerance must have dropped the ~100 m zig vertices
    assert(solo.length < zig._1.length + 1)
  }
}
