package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Geometry-valued spherical clipping: `geo_intersection_2polygons`,
  * `geo_union_2polygons`, `geo_intersection_2lines`,
  * `geo_intersection_line_with_polygon` (reference surface:
  * mirror-lake-kusto's ADX query layer exposes the geo_intersection_*
  * family; the predicates geo_intersects_* are the KqlCompat expansions).
  *
  * All arithmetic is on the unit sphere (radius 6371008.8 m for areas),
  * with the SAME unit-vector edge primitives as the geo_intersects_*
  * expansions: an edge is the minor great-circle arc between consecutive
  * vertices, crossings come from the plane-plane line n1 x n2, and
  * containment is a tangent-plane winding sum. Polygon/polygon clipping is
  * Greiner-Hormann (Computer Graphics 1998, public algorithm): both rings
  * normalised CCW, crossing nodes cross-linked, entry/exit classified by
  * the sign of dot(nOther, edgeStart), then traversal walks A while inside
  * B and B while inside A (intersection) or the outside complements
  * (union). No-crossing cases degrade to containment tests.
  *
  * Divergences (documented): collinear-overlap edges and vertex-touching
  * crossings are not split exactly (measure-zero configurations; ADX uses
  * planar WGS-84 clipping); empty results are
  * `{"type":"GeometryCollection","geometries":[]}`. The PAIR clip emits
  * hole-forming traversal rings (negative winding, e.g. two horseshoes
  * union-closing an annulus) as interior rings per RFC 7946; the n-ary
  * array fold (`unionRings`) keeps its documented no-holes posture.
  * Null on malformed shapes (ring < 3 vertices, line < 2, NaN or
  * out-of-range coordinates), matching the rest of the geo surface.
  */
object GeoClip {
  private val R = 6371008.8

  private[expressions] def xyz(lng: Double, lat: Double): Array[Double] = {
    val rl = math.toRadians(lng); val rt = math.toRadians(lat)
    Array(math.cos(rt) * math.cos(rl), math.cos(rt) * math.sin(rl), math.sin(rt))
  }

  private def lngLat(v: Array[Double]): (Double, Double) = {
    val lat = math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, v(2)))))
    val lng = math.toDegrees(math.atan2(v(1), v(0)))
    (lng, lat)
  }

  private def cross(a: Array[Double], b: Array[Double]): Array[Double] =
    Array(a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a(0) * b(0) + a(1) * b(1) + a(2) * b(2)

  private def norm(a: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(a, a))
    if (n == 0) a else Array(a(0) / n, a(1) / n, a(2) / n)
  }

  /** Signed solid angle of triangle (a,b,c) via Van Oosterom-Strackee. */
  private def triOmega(a: Array[Double], b: Array[Double], c: Array[Double]): Double = {
    val num = dot(a, cross(b, c))
    val den = 1.0 + dot(a, b) + dot(b, c) + dot(c, a)
    2.0 * math.atan2(num, den)
  }

  /** Signed spherical area (steradians) of an OPEN ring, fan from its
    * normalised vertex centroid; positive = CCW (interior on the left). */
  private[expressions] def signedOmega(ring: Array[Array[Double]]): Double = {
    val c = norm(Array(ring.map(_(0)).sum, ring.map(_(1)).sum, ring.map(_(2)).sum))
    var s = 0.0
    var i = 0
    while (i < ring.length) {
      s += triOmega(c, ring(i), ring((i + 1) % ring.length))
      i += 1
    }
    s
  }

  def areaM2(ring: Array[Array[Double]]): Double = math.abs(signedOmega(ring)) * R * R

  /** Signed spherical area (m²): positive CCW, negative CW — lets a
    * hole-aware caller fold Polygon rings with plain addition. */
  def signedAreaM2(ring: Array[Array[Double]]): Double = signedOmega(ring) * R * R

  /** Tangent-plane winding test: total azimuth winding of the ring seen
    * from p is +-2pi inside, ~0 outside. Robust away from the boundary. */
  private[expressions] def pointInRing(p: Array[Double], ring: Array[Array[Double]]): Boolean = {
    // tangent basis at p (any orthonormal pair)
    val ref = if (math.abs(p(2)) < 0.9) Array(0.0, 0.0, 1.0) else Array(1.0, 0.0, 0.0)
    val e   = norm(cross(ref, p))
    val nb  = cross(p, e)
    def az(v: Array[Double]): Double = {
      val t = Array(v(0) - dot(v, p) * p(0), v(1) - dot(v, p) * p(1), v(2) - dot(v, p) * p(2))
      math.atan2(dot(t, e), dot(t, nb))
    }
    var w = 0.0
    var i = 0
    while (i < ring.length) {
      var d = az(ring((i + 1) % ring.length)) - az(ring(i))
      while (d > math.Pi) d -= 2 * math.Pi
      while (d < -math.Pi) d += 2 * math.Pi
      w += d
      i += 1
    }
    math.abs(w) > math.Pi
  }

  /** q strictly within the minor arc a1->a2 whose plane normal is n. */
  private def withinArc(a1: Array[Double], a2: Array[Double], n: Array[Double],
      q: Array[Double]): Boolean =
    dot(cross(a1, q), n) > 1e-15 && dot(cross(q, a2), n) > 1e-15

  /** Arc-length parameter of q along a1->a2 (for ordering crossings). */
  private def arcT(a1: Array[Double], q: Array[Double]): Double =
    math.acos(math.max(-1.0, math.min(1.0, dot(a1, q))))

  /** Crossing point of minor arcs (a1,a2) and (b1,b2), if any. */
  private[expressions] def segCross(a1: Array[Double], a2: Array[Double],
      b1: Array[Double], b2: Array[Double]): Option[Array[Double]] = {
    val n1 = cross(a1, a2)
    val n2 = cross(b1, b2)
    val t  = cross(n1, n2)
    val tn = math.sqrt(dot(t, t))
    if (tn < 1e-18) return None // same great circle: overlap handled as no-cross
    val q1 = Array(t(0) / tn, t(1) / tn, t(2) / tn)
    val q2 = Array(-q1(0), -q1(1), -q1(2))
    if (withinArc(a1, a2, n1, q1) && withinArc(b1, b2, n2, q1)) Some(q1)
    else if (withinArc(a1, a2, n1, q2) && withinArc(b1, b2, n2, q2)) Some(q2)
    else None
  }

  // ---- Greiner-Hormann structure -----------------------------------------

  private final class Node(val p: Array[Double], val isInter: Boolean) {
    var next: Node     = _
    var twin: Node     = _
    var entering       = false // for A-nodes: A entering B; for B-nodes: B entering A
    var visited        = false
  }

  private def buildList(ring: Array[Array[Double]],
      inters: Array[scala.collection.mutable.ArrayBuffer[(Double, Node)]]): Node = {
    var head: Node = null
    var last: Node = null
    def append(n: Node): Unit = {
      if (head == null) head = n else last.next = n
      last = n
    }
    var i = 0
    while (i < ring.length) {
      append(new Node(ring(i), false))
      inters(i).sortBy(_._1).foreach { case (_, n) => append(n) }
      i += 1
    }
    last.next = head
    head
  }

  /** Clip two OPEN CCW rings. op: true = intersection, false = union.
    * Returns None when there are no crossings (caller falls back to
    * containment logic), Some(rings) otherwise. */
  private def clipCrossings(a: Array[Array[Double]], b: Array[Array[Double]],
      intersectionOp: Boolean): Option[Array[Array[Array[Double]]]] = {
    val na = a.length; val nb = b.length
    val interA = Array.fill(na)(scala.collection.mutable.ArrayBuffer.empty[(Double, Node)])
    val interB = Array.fill(nb)(scala.collection.mutable.ArrayBuffer.empty[(Double, Node)])
    var found  = 0
    var i = 0
    while (i < na) {
      val a1 = a(i); val a2 = a((i + 1) % na)
      var j = 0
      while (j < nb) {
        val b1 = b(j); val b2 = b((j + 1) % nb)
        segCross(a1, a2, b1, b2).foreach { q =>
          val nB   = cross(b1, b2)
          val nodA = new Node(q, true)
          val nodB = new Node(q, true)
          nodA.twin = nodB; nodB.twin = nodA
          // A entering B: A-edge start on the outside (negative side) of
          // B's CCW edge plane. B entering A symmetrically.
          nodA.entering = dot(nB, a1) < 0
          val nA = cross(a1, a2)
          nodB.entering = dot(nA, b1) < 0
          interA(i) += ((arcT(a1, q), nodA))
          interB(j) += ((arcT(b1, q), nodB))
          found += 1
        }
        j += 1
      }
      i += 1
    }
    if (found == 0) return None
    val headA = buildList(a, interA)
    buildList(b, interB)
    // traversal
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Array[Double]]]
    // collect unvisited A-side intersection starts
    val starts = scala.collection.mutable.ArrayBuffer.empty[Node]
    var cur = headA
    do {
      if (cur.isInter) starts += cur
      cur = cur.next
    } while (cur ne headA)
    // intersection: start where A enters B (walk A while inside B);
    // union: start where A exits B (walk A while outside B).
    for (s <- starts if !s.visited && s.entering == intersectionOp) {
      val ring = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      var n = s
      var guard = 0
      val cap = 4 * (na + nb + found)
      do {
        n.visited = true; n.twin.visited = true
        ring += n.p
        n = n.next
        while (!n.isInter && guard < cap) { ring += n.p; n = n.next; guard += 1 }
        n = n.twin
        guard += 1
      } while ((n ne s) && (n.twin ne s) && guard < cap)
      if (ring.size >= 3 && guard < cap) out += ring.toArray
    }
    Some(out.toArray)
  }

  /** Parse + validate an open ring; normalise to CCW. None on malformed. */
  private def ringOf(lngs: Array[Double], lats: Array[Double]): Option[Array[Array[Double]]] = {
    var n = lngs.length
    if (n >= 3 && lngs(0) == lngs(n - 1) && lats(0) == lats(n - 1)) n -= 1 // accept closed form
    if (n < 3) return None
    var i = 0
    while (i < n) {
      if (lngs(i).isNaN || lats(i).isNaN || lngs(i) < -180 || lngs(i) > 180 ||
          lats(i) < -90 || lats(i) > 90) return None
      i += 1
    }
    val pts = (0 until n).map(k => xyz(lngs(k), lats(k))).toArray
    if (signedOmega(pts) < 0) Some(pts.reverse) else Some(pts)
  }

  private def lineOf(lngs: Array[Double], lats: Array[Double]): Option[Array[Array[Double]]] = {
    val n = lngs.length
    if (n < 2) return None
    var i = 0
    while (i < n) {
      if (lngs(i).isNaN || lats(i).isNaN || lngs(i) < -180 || lngs(i) > 180 ||
          lats(i) < -90 || lats(i) > 90) return None
      i += 1
    }
    Some((0 until n).map(k => xyz(lngs(k), lats(k))).toArray)
  }

  private val emptyGeo = """{"type":"GeometryCollection","geometries":[]}"""

  private def ringJson(r: Array[Array[Double]]): String = {
    val pts = (r :+ r(0)).map { v =>
      val (lo, la) = lngLat(v); s"[$lo,$la]"
    }
    s"[${pts.mkString(",")}]"
  }

  private def polysJson(rings: Array[Array[Array[Double]]]): String =
    polysJsonHoled(rings.map(r => (r, Array.empty[Array[Array[Double]]])))

  /** Polygon/MultiPolygon with interior rings: each entry is
    * (outer, holes). RFC 7946 orientation is preserved as passed in
    * (outers CCW, holes CW — the GH traversal already traces holes CW). */
  private def polysJsonHoled(
      polys: Array[(Array[Array[Double]], Array[Array[Array[Double]]])]): String =
    if (polys.isEmpty) emptyGeo
    else if (polys.length == 1) {
      val body = (polys(0)._1 +: polys(0)._2).map(r => ringJson(r)).mkString(",")
      s"""{"type":"Polygon","coordinates":[$body]}"""
    } else {
      val body = polys
        .map { case (o, hs) => s"[${(o +: hs).map(r => ringJson(r)).mkString(",")}]" }
        .mkString(",")
      s"""{"type":"MultiPolygon","coordinates":[$body]}"""
    }

  /** Classify GH traversal rings by winding: positive signedOmega rings
    * are boundaries, negative ones are HOLES (the traversal legitimately
    * produces the hole loop when a union closes around a void — e.g. two
    * horseshoes forming an annulus). Each hole is attached as an interior
    * ring of the outer that contains it; a hole contained by no outer
    * (not constructible from a two-ring clip) is dropped rather than
    * inflating the result as an island. */
  private def holedJson(rings: Array[Array[Array[Double]]]): String = {
    val (outers, holes) = rings.partition(r => signedOmega(r) >= 0)
    polysJsonHoled(outers.map(o => (o, holes.filter(h => pointInRing(h(0), o)))))
  }

  /** Polygon/polygon clip -> GeoJSON, or null on malformed input. */
  def clipPolygons(aLngs: Array[Double], aLats: Array[Double],
      bLngs: Array[Double], bLats: Array[Double], intersectionOp: Boolean): String = {
    val (ra, rb) = (ringOf(aLngs, aLats), ringOf(bLngs, bLats)) match {
      case (Some(x), Some(y)) => (x, y)
      case _                  => return null
    }
    // identical rings first (same guard as unionRings): every edge pair
    // shares a great circle so no transversal crossing exists, and the
    // containment fallback would probe a BOUNDARY vertex whose winding
    // sits exactly on the ±π decision line — FP noise would decide.
    // A∩A = A∪A = A by definition.
    val dup = ra.length == rb.length && ra.forall(v =>
      rb.exists(w => math.abs(v(0) - w(0)) < 1e-12 &&
        math.abs(v(1) - w(1)) < 1e-12 && math.abs(v(2) - w(2)) < 1e-12))
    if (dup) return polysJson(Array(ra))
    clipCrossings(ra, rb, intersectionOp) match {
      case Some(rings) => holedJson(rings)
      case None        =>
        val aInB = pointInRing(ra(0), rb)
        val bInA = pointInRing(rb(0), ra)
        if (intersectionOp) {
          if (aInB) polysJson(Array(ra))
          else if (bInA) polysJson(Array(rb))
          else emptyGeo
        } else {
          if (aInB) polysJson(Array(rb))
          else if (bInA) polysJson(Array(ra))
          else polysJson(Array(ra, rb))
        }
    }
  }

  /** Line/line crossings -> GeoJSON Point/MultiPoint, empty collection. */
  def intersectLines(aLngs: Array[Double], aLats: Array[Double],
      bLngs: Array[Double], bLats: Array[Double]): String = {
    val (la, lb) = (lineOf(aLngs, aLats), lineOf(bLngs, bLats)) match {
      case (Some(x), Some(y)) => (x, y)
      case _                  => return null
    }
    val pts = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < la.length - 1) {
      var j = 0
      while (j < lb.length - 1) {
        segCross(la(i), la(i + 1), lb(j), lb(j + 1)).foreach { q =>
          val (lo, lt) = lngLat(q)
          if (!pts.exists { case (x, y) => math.abs(x - lo) < 1e-12 && math.abs(y - lt) < 1e-12 })
            pts += ((lo, lt))
        }
        j += 1
      }
      i += 1
    }
    if (pts.isEmpty) emptyGeo
    else if (pts.size == 1) s"""{"type":"Point","coordinates":[${pts(0)._1},${pts(0)._2}]}"""
    else {
      val body = pts.map { case (x, y) => s"[$x,$y]" }.mkString(",")
      s"""{"type":"MultiPoint","coordinates":[$body]}"""
    }
  }

  /** Polyline clipped to a ring -> LineString/MultiLineString. Splits each
    * segment at ring crossings and keeps the inside pieces; insideness is
    * tracked from the line start and toggled at every crossing. */
  def clipLineWithPolygon(lLngs: Array[Double], lLats: Array[Double],
      rLngs: Array[Double], rLats: Array[Double]): String = {
    val (ln, rg) = (lineOf(lLngs, lLats), ringOf(rLngs, rLats)) match {
      case (Some(x), Some(y)) => (x, y)
      case _                  => return null
    }
    var inside = pointInRing(ln(0), rg)
    val parts  = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[(Double, Double)]]
    var curPart =
      if (inside) { val b = scala.collection.mutable.ArrayBuffer(lngLat(ln(0))); parts += b; b }
      else null
    var i = 0
    while (i < ln.length - 1) {
      val s = ln(i); val e = ln(i + 1)
      // all ring crossings of this segment, ordered along it
      val xs = scala.collection.mutable.ArrayBuffer.empty[(Double, Array[Double])]
      var j = 0
      while (j < rg.length) {
        segCross(s, e, rg(j), rg((j + 1) % rg.length)).foreach(q => xs += ((arcT(s, q), q)))
        j += 1
      }
      xs.sortBy(_._1).foreach { case (_, q) =>
        if (inside) { curPart += lngLat(q); curPart = null }
        else { curPart = scala.collection.mutable.ArrayBuffer(lngLat(q)); parts += curPart }
        inside = !inside
      }
      if (inside) curPart += lngLat(e)
      i += 1
    }
    val keep = parts.filter(_.size >= 2)
    if (keep.isEmpty) emptyGeo
    else if (keep.size == 1) {
      val body = keep(0).map { case (x, y) => s"[$x,$y]" }.mkString(",")
      s"""{"type":"LineString","coordinates":[$body]}"""
    } else {
      val body = keep.map(p => s"[${p.map { case (x, y) => s"[$x,$y]" }.mkString(",")}]").mkString(",")
      s"""{"type":"MultiLineString","coordinates":[$body]}"""
    }
  }

  /** N-ary union by pairwise folding: each incoming ring merges with every
    * accumulated ring it crosses (keeping the LARGEST traversal ring as
    * the merged outer boundary — interior holes are dropped, same no-holes
    * posture as the pair clip), swallows accumulated rings it contains,
    * and is itself swallowed by a containing ring. A merge restarts the
    * scan because the merged boundary can newly cross earlier rings.
    * O(n²) ring-pair probes — shapes are per-row scalars here, never
    * corpora. None only on the loud non-convergence guard.
    */
  private def unionRings(
      input: Seq[Array[Array[Double]]]): Option[Array[Array[Array[Double]]]] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[Array[Array[Double]]]
    var guard = 0
    for (r0 <- input) {
      var cur: Array[Array[Double]] = r0
      var i = 0
      while (cur != null && i < acc.length) {
        guard += 1
        if (guard > 100000) return None
        val a = acc(i)
        clipCrossings(a, cur, intersectionOp = false) match {
          case Some(rings) if rings.nonEmpty =>
            acc.remove(i)
            cur = rings.maxBy(r => math.abs(signedOmega(r)))
            i = 0
          case Some(_) => i += 1 // degenerate traversal: keep both
          case None =>
            // exact duplicates first: identical rings share every great
            // circle, so no transversal crossing exists and the interior
            // probe would test a BOUNDARY vertex (undefined winding) —
            // vertex-multiset equality keeps union idempotent instead
            val dup = a.length == cur.length && a.forall(v =>
              cur.exists(w => math.abs(v(0) - w(0)) < 1e-12 &&
                math.abs(v(1) - w(1)) < 1e-12 && math.abs(v(2) - w(2)) < 1e-12))
            if (dup) acc.remove(i)                      // keep cur, drop a
            else if (pointInRing(a(0), cur)) acc.remove(i)   // a swallowed
            else if (pointInRing(cur(0), a)) cur = null      // cur swallowed
            else i += 1
        }
      }
      if (cur != null) acc += cur
    }
    Some(acc.toArray)
  }

  /** `geo_union_lines_array` core: validated polylines in →
    * LineString/MultiLineString (empty array → empty GeometryCollection)
    * GeoJSON out; null on any malformed line (the family's null
    * contract). The 1-D union of polylines IS the collection — lines have
    * no interior to merge — so coordinates pass through verbatim.
    */
  def unionLinesArray(shapes: Seq[(Array[Double], Array[Double])]): String = {
    if (shapes.isEmpty) return emptyGeo
    if (shapes.exists { case (lo, la) => lineOf(lo, la).isEmpty }) return null
    // vertex-identical duplicates collapse (union idempotence — the same
    // guard class as the polygon clip's dup-ring check); PARTIAL overlaps
    // are NOT dissolved — the same measure-zero collinear-overlap
    // divergence the polygon clipper documents, stated here too
    val coords = shapes.map { case (lo, la) =>
      lo.indices.map(i => s"[${lo(i)},${la(i)}]").mkString("[", ",", "]")
    }.distinct
    if (coords.size == 1) s"""{"type":"LineString","coordinates":${coords.head}}"""
    else s"""{"type":"MultiLineString","coordinates":[${coords.mkString(",")}]}"""
  }

  /** `geo_union_polygons_array` core: rings in, Polygon/MultiPolygon (or
    * empty GeometryCollection) GeoJSON out; null on any malformed ring.
    */
  def unionPolygonsArray(shapes: Seq[(Array[Double], Array[Double])]): String = {
    if (shapes.isEmpty) return emptyGeo
    val rings = shapes.map { case (lo, la) => ringOf(lo, la) }
    if (rings.exists(_.isEmpty)) return null
    unionRings(rings.map(_.get)) match {
      case Some(rs) => polysJson(rs)
      case None     => null
    }
  }

  /** `geo_simplify_polygons_array` core: per-ring spherical Douglas–Peucker
    * (GeoSimplify.simplify, close=true) over every polygon; null if ANY
    * ring is malformed or collapses below a triangle. Rings simplify
    * INDEPENDENTLY — the ADX joint shared-border constraint is a
    * documented divergence (same per-shape posture as the rest of the
    * family).
    */
  def simplifyPolygonsArray(shapes: Seq[(Array[Double], Array[Double])],
      tolM: Double): String = {
    if (shapes.isEmpty) return emptyGeo
    val outs = shapes.map { case (lo, la) => GeoSimplify.simplify(lo, la, tolM, close = true) }
    if (outs.exists(_.isEmpty)) return null
    val ringsTxt = outs.map { o =>
      // simplify(close=true) re-appends the start vertex — already closed.
      // Each entry is "[[ring]]" — one polygon's array-of-rings — which is
      // EXACTLY a Polygon's coordinates value (depth 3), so the single-
      // polygon branch emits it verbatim
      s"[[${o.get.map { case (x, y) => s"[$x,$y]" }.mkString(",")}]]"
    }
    if (ringsTxt.size == 1)
      s"""{"type":"Polygon","coordinates":${ringsTxt.head}}"""
    else
      s"""{"type":"MultiPolygon","coordinates":[${ringsTxt.mkString(",")}]}"""
  }
}

/** Shared shape-pair expression plumbing: two array<array<numeric>> args. */
abstract class GeoClipBase extends Expression with CodegenFallback {
  def children: Seq[Expression]
  protected def fnName: String
  protected def run(aLngs: Array[Double], aLats: Array[Double],
      bLngs: Array[Double], bLats: Array[Double]): String

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def shapeOk(t: DataType): Boolean = t match {
      case ArrayType(ArrayType(e, _), _) => e.isInstanceOf[NumericType]
      case _                             => false
    }
    if (children.size != 2)
      TypeCheckResult.TypeCheckFailure(s"$fnName takes (shape1, shape2)")
    else if (!children.forall(c => shapeOk(c.dataType)))
      TypeCheckResult.TypeCheckFailure(s"$fnName shapes must be arrays of [lng, lat] arrays")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val va = children(0).eval(input)
    val vb = children(1).eval(input)
    if (va == null || vb == null) return null
    val ca = ShapeArg.coords(children(0).dataType.asInstanceOf[ArrayType], va)
    val cb = ShapeArg.coords(children(1).dataType.asInstanceOf[ArrayType], vb)
    if (ca == null || cb == null) return null
    val out = run(ca._1, ca._2, cb._1, cb._2)
    if (out == null) null else UTF8String.fromString(out)
  }
}

case class GeoIntersection2Polygons(children: Seq[Expression]) extends GeoClipBase {
  override protected def fnName = "geo_intersection_2polygons"
  override protected def run(a1: Array[Double], a2: Array[Double],
      b1: Array[Double], b2: Array[Double]): String =
    GeoClip.clipPolygons(a1, a2, b1, b2, intersectionOp = true)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoIntersection2Polygons = copy(children = newChildren)
  override def prettyName: String = "geo_intersection_2polygons"
}

case class GeoUnion2Polygons(children: Seq[Expression]) extends GeoClipBase {
  override protected def fnName = "geo_union_2polygons"
  override protected def run(a1: Array[Double], a2: Array[Double],
      b1: Array[Double], b2: Array[Double]): String =
    GeoClip.clipPolygons(a1, a2, b1, b2, intersectionOp = false)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoUnion2Polygons = copy(children = newChildren)
  override def prettyName: String = "geo_union_2polygons"
}

case class GeoIntersection2Lines(children: Seq[Expression]) extends GeoClipBase {
  override protected def fnName = "geo_intersection_2lines"
  override protected def run(a1: Array[Double], a2: Array[Double],
      b1: Array[Double], b2: Array[Double]): String =
    GeoClip.intersectLines(a1, a2, b1, b2)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoIntersection2Lines = copy(children = newChildren)
  override def prettyName: String = "geo_intersection_2lines"
}

case class GeoIntersectionLineWithPolygon(children: Seq[Expression]) extends GeoClipBase {
  override protected def fnName = "geo_intersection_line_with_polygon"
  override protected def run(a1: Array[Double], a2: Array[Double],
      b1: Array[Double], b2: Array[Double]): String =
    GeoClip.clipLineWithPolygon(a1, a2, b1, b2)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoIntersectionLineWithPolygon =
    copy(children = newChildren)
  override def prettyName: String = "geo_intersection_line_with_polygon"
}
