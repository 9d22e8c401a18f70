package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geo_line_densify(line [, tolerance_m])` / `geo_polygon_densify(ring
  * [, tolerance_m])` — insert great-circle interpolated points so no two
  * consecutive points are farther apart than the tolerance (default
  * 10 km). Spacing-based densification (ADX bounds the planar-vs-geodesic
  * deviation instead — documented divergence; spacing ≤ t bounds that
  * deviation by t²/8R, far tighter). Inserted points lie ON each segment's
  * great circle, so the densified length telescopes to the original —
  * the in-plan equality gate. Output is the GeoJSON LineString / Polygon
  * (closed ring). Null on degenerate input, bad tolerance, or > 10240
  * points.
  */
object GeoDensify {
  private val R = 6371008.8

  /** Densified (lng, lat) chain, or null. `close` appends the first point
    * (polygon rings densify the closing edge too).
    */
  def densify(lngs: Array[Double], lats: Array[Double], tolM: Double,
      close: Boolean): Option[Array[(Double, Double)]] = {
    val n = lngs.length
    if (n < (if (close) 3 else 2) || tolM <= 0 || tolM.isNaN) return None
    if (lngs.exists(l => l < -180 || l > 180 || l.isNaN) ||
        lats.exists(l => l < -90 || l > 90 || l.isNaN)) return None
    val tolRad = tolM / R
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val m = if (close) n else n - 1
    var e = 0
    while (e < m) {
      val (lo1, la1) = (lngs(e), lats(e))
      val (lo2, la2) = (lngs((e + 1) % n), lats((e + 1) % n))
      val a = xyz(lo1, la1); val b = xyz(lo2, la2)
      val d = math.max(-1.0, math.min(1.0, a._1 * b._1 + a._2 * b._2 + a._3 * b._3))
      val theta = math.acos(d)
      val steps = math.max(1L, math.ceil(theta / tolRad).toLong)
      if (out.size + steps > 10240) return None
      var s = 0L
      while (s < steps) {
        if (s == 0) out += ((lo1, la1))
        else {
          // slerp: exact great-circle interpolation
          val f  = s.toDouble / steps
          val st = math.sin(theta)
          val (w1, w2) =
            if (st == 0) (1 - f, f)
            else (math.sin((1 - f) * theta) / st, math.sin(f * theta) / st)
          val x = w1 * a._1 + w2 * b._1
          val y = w1 * a._2 + w2 * b._2
          val z = w1 * a._3 + w2 * b._3
          out += ((math.toDegrees(math.atan2(y, x)),
            math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))))
        }
        s += 1
      }
      e += 1
    }
    // final vertex: last input point (open line) or the ring start (closed)
    out += ((lngs(if (close) 0 else n - 1), lats(if (close) 0 else n - 1)))
    Some(out.toArray)
  }

  private def xyz(lng: Double, lat: Double): (Double, Double, Double) = {
    val rl = math.toRadians(lng); val rt = math.toRadians(lat)
    (math.cos(rt) * math.cos(rl), math.cos(rt) * math.sin(rl), math.sin(rt))
  }

  def json(kind: String, pts: Array[(Double, Double)], ringWrap: Boolean): UTF8String = {
    val coords = pts.map { case (lo, la) => s"[$lo,$la]" }.mkString(",")
    val body   = if (ringWrap) s"[[$coords]]" else s"[$coords]"
    UTF8String.fromString(s"""{"type":"$kind","coordinates":$body}""")
  }
}

abstract class GeoDensifyBase extends Expression with CodegenFallback {
  def children: Seq[Expression]
  protected def fnName: String
  protected def close: Boolean

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def lineOk(t: DataType): Boolean = t match {
      case ArrayType(ArrayType(e, _), _) => e.isInstanceOf[NumericType]
      case _                             => false
    }
    if (children.size < 1 || children.size > 2)
      TypeCheckResult.TypeCheckFailure(s"$fnName takes (shape [, tolerance_m])")
    else if (!lineOk(children.head.dataType))
      TypeCheckResult.TypeCheckFailure(s"$fnName shape must be an array of [lng, lat] arrays")
    else if (children.size == 2 && !children(1).dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(s"$fnName tolerance must be numeric")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }

  override def eval(input: InternalRow): Any = {
    val p = children.head.eval(input)
    if (p == null) return null
    val tol = if (children.size == 2) {
      val t = children(1).eval(input)
      if (t == null) return null
      num(t)
    } else 10000.0
    val arr   = p.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val inner = children.head.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[ArrayType]
    val n    = arr.numElements()
    val lngs = new Array[Double](n)
    val lats = new Array[Double](n)
    var k = 0
    while (k < n) {
      val row = arr.get(k, inner)
      if (row == null) return null
      val pt = row.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (pt.numElements() < 2) return null
      lngs(k) = num(pt.get(0, inner.elementType))
      lats(k) = num(pt.get(1, inner.elementType))
      k += 1
    }
    GeoDensify.densify(lngs, lats, tol, close) match {
      case None      => null
      case Some(pts) =>
        GeoDensify.json(if (close) "Polygon" else "LineString", pts, ringWrap = close)
    }
  }
}

case class GeoLineDensify(children: Seq[Expression]) extends GeoDensifyBase {
  override protected def fnName = "geo_line_densify"
  override protected def close  = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoLineDensify = copy(children = newChildren)
  override def prettyName: String = "geo_line_densify"
}

case class GeoPolygonDensify(children: Seq[Expression]) extends GeoDensifyBase {
  override protected def fnName = "geo_polygon_densify"
  override protected def close  = true
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoPolygonDensify = copy(children = newChildren)
  override def prettyName: String = "geo_polygon_densify"
}

/** `geo_point_buffer(lng, lat, radius_m [, tolerance_m])` — the GeoJSON
  * Polygon of the geodesic circle around the point: n vertices on the
  * exact radius (spherical direct formula), n chosen so the chord sagitta
  * stays under the tolerance (default radius/100, min 8 vertices, cap
  * 4096). Gates ride the inverse formulas: every vertex is at haversine
  * distance exactly r (mutually-inverse closed forms, double noise only)
  * and the enclosed spherical area approaches the spherical-cap area
  * 2πR²(1−cos(r/R)) from below at the sagitta rate.
  */
case class GeoPointBuffer(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 3 || children.size > 4)
      TypeCheckResult.TypeCheckFailure("geo_point_buffer takes (lng, lat, radius [, tolerance])")
    else if (!children.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure("geo_point_buffer arguments must be numeric")
    else TypeCheckResult.TypeCheckSuccess

  private def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val lng = num(vs(0)); val lat = num(vs(1)); val r = num(vs(2))
    val R   = 6371008.8
    val tol = if (children.size == 4) num(vs(3)) else r / 100.0
    if (lng < -180 || lng > 180 || lat < -90 || lat > 90 ||
        lng.isNaN || lat.isNaN || r <= 0 || r.isNaN || tol <= 0 || tol.isNaN ||
        r >= math.Pi * R / 2) return null // cap at the quarter-circumference
    // sagitta of a chord over angle 2π/n on the r-circle: r(1 − cos(π/n)) ≤ tol
    val frac = 1.0 - tol / r
    val n = math.min(4096L, math.max(8L,
      if (frac <= 0) 8L else math.ceil(math.Pi / math.acos(frac)).toLong)).toInt
    val la1 = math.toRadians(lat); val lo1 = math.toRadians(lng)
    val dR  = r / R
    val pts = (0 until n).map { k =>
      // CCW from north: the spherical direct (destination-point) formula
      val th  = -2.0 * math.Pi * k / n
      val la2 = math.asin(math.sin(la1) * math.cos(dR) +
        math.cos(la1) * math.sin(dR) * math.cos(th))
      val lo2 = lo1 + math.atan2(
        math.sin(th) * math.sin(dR) * math.cos(la1),
        math.cos(dR) - math.sin(la1) * math.sin(la2))
      var lngD = math.toDegrees(lo2)
      if (lngD > 180) lngD -= 360 else if (lngD < -180) lngD += 360
      s"[$lngD,${math.toDegrees(la2)}]"
    }
    UTF8String.fromString(
      s"""{"type":"Polygon","coordinates":[[${pts.mkString(",")},${pts.head}]]}""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoPointBuffer =
    copy(children = newChildren)

  override def prettyName: String = "geo_point_buffer"
}
