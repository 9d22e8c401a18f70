package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geo_line_buffer(line, radius_m [, tolerance_m])` /
  * `geo_polygon_buffer(polygon, radius_m [, tolerance_m])` — the GeoJSON
  * Polygon at geodesic distance ≤ radius of a polyline / the outward
  * enlargement of a polygon (reference surface: the ADX geo buffer pair;
  * same public spherical model as the rest of the geo family).
  *
  * Construction is a direct OFFSET CURVE, not a boolean union of per-piece
  * sausages: per segment the two offset geodesic chords (spherical direct
  * formula at bearing ± π/2), per convex vertex a sagitta-bounded arc of
  * the vertex circle, per concave vertex the crossing point of the two
  * adjacent offset chords (exact, via the clipper's segment-crossing
  * primitive) with the radial mid-azimuth point as the short-segment
  * fallback. A union-based construction would feed the Greiner–Hormann
  * clipper tangent shapes BY CONSTRUCTION (every vertex disc touches its
  * sausage edges exactly) — the documented collinear/tangency degeneracy —
  * so the offset walk is both cheaper and more robust here.
  *
  * Contract bounds (documented divergence from ADX's exact union): the
  * output ring is the simple offset boundary, exact for polylines/rings
  * whose opposite sides stay ≥ 2·radius apart (no hairpin self-overlap);
  * the concave fallback point sits at distance radius from the VERTEX
  * (inside the true offset by at most r·(1−sin(θ/2)) for turn angle θ)
  * and is only used when the adjacent offset chords are too short to
  * cross. Null on malformed shapes, radius ≤ 0, radius ≥ quarter
  * circumference, tolerance ≤ 0, or > 10240 output vertices.
  */
object GeoBuffer {
  private val R = 6371008.8
  private val TwoPi = 2 * math.Pi

  private def direct(lng: Double, lat: Double, az: Double, distM: Double): (Double, Double) = {
    val la1 = math.toRadians(lat); val lo1 = math.toRadians(lng)
    val dR  = distM / R
    val la2 = math.asin(math.sin(la1) * math.cos(dR) +
      math.cos(la1) * math.sin(dR) * math.cos(az))
    val lo2 = lo1 + math.atan2(math.sin(az) * math.sin(dR) * math.cos(la1),
      math.cos(dR) - math.sin(la1) * math.sin(la2))
    var lngD = math.toDegrees(lo2)
    if (lngD > 180) lngD -= 360 else if (lngD < -180) lngD += 360
    (lngD, math.toDegrees(la2))
  }

  /** Initial bearing (radians from north, clockwise) from 1 toward 2. */
  private def azimuth(lo1: Double, la1: Double, lo2: Double, la2: Double): Double = {
    val f1 = math.toRadians(la1); val f2 = math.toRadians(la2)
    val dl = math.toRadians(lo2 - lo1)
    math.atan2(math.sin(dl) * math.cos(f2),
      math.cos(f1) * math.sin(f2) - math.sin(f1) * math.cos(f2) * math.cos(dl))
  }

  private def wrapPi(x: Double): Double = {
    var a = x % TwoPi
    if (a <= -math.Pi) a += TwoPi else if (a > math.Pi) a -= TwoPi
    a
  }

  private def norm2Pi(x: Double): Double = {
    val a = x % TwoPi
    if (a < 0) a + TwoPi else a
  }

  /** One polyline/ring buffer side: per-segment forward/arrival bearings
    * and the two offset chord endpoints on side `s` (+1 right, −1 left).
    */
  private final class Seg(
      val aLng: Double, val aLat: Double, val bLng: Double, val bLat: Double) {
    val fwd: Double = azimuth(aLng, aLat, bLng, bLat)
    // forward bearing on ARRIVAL at b: back-azimuth from b to a, reversed
    val arr: Double = wrapPi(azimuth(bLng, bLat, aLng, aLat) + math.Pi)
    def offStart(s: Int, r: Double): (Double, Double) =
      direct(aLng, aLat, fwd + s * math.Pi / 2, r)
    def offEnd(s: Int, r: Double): (Double, Double) =
      direct(bLng, bLat, arr + s * math.Pi / 2, r)
  }

  /** Intermediate arc vertices around (lng,lat) from azFrom to azTo, in
    * the clockwise (increasing azimuth) direction when cw, else
    * counterclockwise; endpoints excluded (emitted by the caller).
    */
  private def arc(out: scala.collection.mutable.ArrayBuffer[(Double, Double)],
      lng: Double, lat: Double, azFrom: Double, azTo: Double,
      cw: Boolean, r: Double, step: Double): Unit = {
    val sweep = if (cw) norm2Pi(azTo - azFrom) else norm2Pi(azFrom - azTo)
    val k = math.min(1024L, math.max(1L, math.ceil(sweep / step).toLong))
    var j = 1L
    while (j < k) {
      val az = if (cw) azFrom + sweep * j / k else azFrom - sweep * j / k
      out += direct(lng, lat, az, r)
      j += 1
    }
  }

  /** The join emission at the vertex between `in` and `outSeg` on side
    * `s`: convex → incoming offset end, vertex arc, outgoing offset
    * start; concave → the crossing of the two offset chords (radial
    * mid-azimuth fallback); straight → the shared endpoint once.
    */
  private def emitJoin(out: scala.collection.mutable.ArrayBuffer[(Double, Double)],
      in: Seg, outSeg: Seg, s: Int, r: Double, step: Double): Unit = {
    val delta = wrapPi(outSeg.fwd - in.arr)
    if (s * delta < -1e-12) { // convex on this side
      val e = in.offEnd(s, r)
      out += e
      arc(out, in.bLng, in.bLat, in.arr + s * math.Pi / 2,
        outSeg.fwd + s * math.Pi / 2, cw = s < 0, r, step)
      out += outSeg.offStart(s, r)
    } else if (s * delta > 1e-12) { // concave: offset chords cross
      val (e1, e2) = (in.offStart(s, r), in.offEnd(s, r))
      val (f1, f2) = (outSeg.offStart(s, r), outSeg.offEnd(s, r))
      val q = GeoClip.segCross(
        GeoClip.xyz(e1._1, e1._2), GeoClip.xyz(e2._1, e2._2),
        GeoClip.xyz(f1._1, f1._2), GeoClip.xyz(f2._1, f2._2))
      q match {
        case Some(p) =>
          val lo = math.toDegrees(math.atan2(p(1), p(0)))
          val la = math.toDegrees(math.atan2(p(2),
            math.sqrt(p(0) * p(0) + p(1) * p(1))))
          out += ((lo, la))
        case None =>
          out += direct(in.bLng, in.bLat, in.arr + delta / 2 + s * math.Pi / 2, r)
      }
    } else { // collinear continuation
      out += in.offEnd(s, r)
    }
  }

  private def dedupe(lngs: Array[Double], lats: Array[Double]): (Array[Double], Array[Double]) = {
    val lo = scala.collection.mutable.ArrayBuffer.empty[Double]
    val la = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < lngs.length) {
      if (i == 0 || math.abs(lngs(i) - lo.last) > 1e-12 || math.abs(lats(i) - la.last) > 1e-12) {
        lo += lngs(i); la += lats(i)
      }
      i += 1
    }
    (lo.toArray, la.toArray)
  }

  private def validCoords(lngs: Array[Double], lats: Array[Double]): Boolean =
    lngs.indices.forall { i =>
      !lngs(i).isNaN && !lats(i).isNaN &&
        lngs(i) >= -180 && lngs(i) <= 180 && lats(i) >= -90 && lats(i) <= 90
    }

  private def stepOf(r: Double, tol: Double): Double = {
    val frac = 1.0 - tol / r
    if (frac <= 0) math.Pi / 4 else 2 * math.acos(frac)
  }

  /** Buffer ring of an open polyline, or None on malformed input. */
  def lineBuffer(lngs0: Array[Double], lats0: Array[Double], r: Double,
      tol: Double): Option[Array[(Double, Double)]] = {
    if (r <= 0 || r.isNaN || tol <= 0 || tol.isNaN || r >= math.Pi * R / 2) return None
    if (!validCoords(lngs0, lats0)) return None
    val (lngs, lats) = dedupe(lngs0, lats0)
    val n = lngs.length
    if (n < 2) return None
    val segs = (0 until n - 1).map(i => new Seg(lngs(i), lats(i), lngs(i + 1), lats(i + 1)))
    val step = stepOf(r, tol)
    val out  = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    // right side, forward
    out += segs.head.offStart(1, r)
    for (v <- 1 until n - 1) emitJoin(out, segs(v - 1), segs(v), 1, r, step)
    out += segs.last.offEnd(1, r)
    // far cap: right → left around the far side (counterclockwise)
    arc(out, lngs(n - 1), lats(n - 1), segs.last.arr + math.Pi / 2,
      segs.last.arr - math.Pi / 2, cw = false, r, step)
    // left side, walked backward (the chain is built forward, reversed in)
    val left = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    left += segs.head.offStart(-1, r)
    for (v <- 1 until n - 1) emitJoin(left, segs(v - 1), segs(v), -1, r, step)
    left += segs.last.offEnd(-1, r)
    out ++= left.reverse
    // near cap: left → right around the back (counterclockwise)
    arc(out, lngs(0), lats(0), segs.head.fwd - math.Pi / 2,
      segs.head.fwd + math.Pi / 2, cw = false, r, step)
    if (out.size > 10240) None else Some(out.toArray)
  }

  /** Outward buffer ring of a polygon (ring normalised CCW), or None. */
  def polygonBuffer(lngs0: Array[Double], lats0: Array[Double], r: Double,
      tol: Double): Option[Array[(Double, Double)]] = {
    if (r <= 0 || r.isNaN || tol <= 0 || tol.isNaN || r >= math.Pi * R / 2) return None
    if (!validCoords(lngs0, lats0)) return None
    var (lngs, lats) = dedupe(lngs0, lats0)
    // accept the closed form, like the clipper's ring parser
    if (lngs.length >= 3 && lngs(0) == lngs.last && lats(0) == lats.last) {
      lngs = lngs.dropRight(1); lats = lats.dropRight(1)
    }
    val n = lngs.length
    if (n < 3) return None
    // normalise to CCW so the outward side is always the RIGHT side
    val xyzs = (0 until n).map(i => GeoClip.xyz(lngs(i), lats(i))).toArray
    if (GeoClip.signedOmega(xyzs) < 0) { lngs = lngs.reverse; lats = lats.reverse }
    val segs = (0 until n).map(i =>
      new Seg(lngs(i), lats(i), lngs((i + 1) % n), lats((i + 1) % n)))
    val step = stepOf(r, tol)
    val out  = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (j <- 0 until n) // join at vertex j between edge j-1 and edge j
      emitJoin(out, segs((j + n - 1) % n), segs(j), 1, r, step)
    if (out.size > 10240 || out.size < 3) None else Some(out.toArray)
  }

  def json(pts: Array[(Double, Double)]): UTF8String = {
    val coords = (pts :+ pts.head).map { case (lo, la) => s"[$lo,$la]" }.mkString(",")
    UTF8String.fromString(s"""{"type":"Polygon","coordinates":[[$coords]]}""")
  }
}

abstract class GeoBufferBase extends Expression with CodegenFallback {
  def children: Seq[Expression]
  protected def fnName: String
  protected def run(lngs: Array[Double], lats: Array[Double], r: Double,
      tol: Double): Option[Array[(Double, Double)]]

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def shapeOk(t: DataType): Boolean = t match {
      case ArrayType(ArrayType(e, _), _) => e.isInstanceOf[NumericType]
      case _                             => false
    }
    if (children.size < 2 || children.size > 3)
      TypeCheckResult.TypeCheckFailure(s"$fnName takes (shape, radius_m [, tolerance_m])")
    else if (!shapeOk(children.head.dataType))
      TypeCheckResult.TypeCheckFailure(s"$fnName shape must be an array of [lng, lat] arrays")
    else if (!children.tail.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure(s"$fnName radius/tolerance must be numeric")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val p = children.head.eval(input)
    if (p == null) return null
    val rv = children(1).eval(input)
    if (rv == null) return null
    val r = ShapeArg.num(rv)
    val tol = if (children.size == 3) {
      val t = children(2).eval(input)
      if (t == null) return null
      ShapeArg.num(t)
    } else r / 100.0
    val c = ShapeArg.coords(children.head.dataType.asInstanceOf[ArrayType], p)
    if (c == null) return null
    run(c._1, c._2, r, tol) match {
      case None      => null
      case Some(pts) => GeoBuffer.json(pts)
    }
  }
}

case class GeoLineBuffer(children: Seq[Expression]) extends GeoBufferBase {
  override protected def fnName = "geo_line_buffer"
  override protected def run(lngs: Array[Double], lats: Array[Double],
      r: Double, tol: Double): Option[Array[(Double, Double)]] =
    GeoBuffer.lineBuffer(lngs, lats, r, tol)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoLineBuffer = copy(children = newChildren)
  override def prettyName: String = "geo_line_buffer"
}

case class GeoPolygonBuffer(children: Seq[Expression]) extends GeoBufferBase {
  override protected def fnName = "geo_polygon_buffer"
  override protected def run(lngs: Array[Double], lats: Array[Double],
      r: Double, tol: Double): Option[Array[(Double, Double)]] =
    GeoBuffer.polygonBuffer(lngs, lats, r, tol)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoPolygonBuffer = copy(children = newChildren)
  override def prettyName: String = "geo_polygon_buffer"
}
