package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geo_line_simplify(line [, tolerance_m])` / `geo_polygon_simplify(ring
  * [, tolerance_m])` — Douglas–Peucker on the sphere with the SAME
  * unit-vector cross-track/endpoint distance as the
  * geo_distance_point_to_line expansion, so simplify∘densify is the exact
  * identity on the original vertices (densify's inserted points lie ON
  * the great circle → cross-track ≈ 0 → dropped; real turns survive) —
  * the in-plan round-trip gate. Ring simplification anchors at vertex 0
  * with a zero-length root chord (the first split lands on the farthest
  * vertex from v0 — the standard closed-ring adaptation). Default
  * tolerance 10 m. Null on degenerate input or a ring collapsing below
  * 3 vertices.
  */
object GeoSimplify {

  private def xyz(lng: Double, lat: Double): Array[Double] = {
    val rl = math.toRadians(lng); val rt = math.toRadians(lat)
    Array(math.cos(rt) * math.cos(rl), math.cos(rt) * math.sin(rl), math.sin(rt))
  }

  /** Great-circle segment distance in radians (segmentDistanceSql form). */
  private def segDist(a: Array[Double], b: Array[Double], p: Array[Double]): Double = {
    val nx = a(1) * b(2) - a(2) * b(1)
    val ny = a(2) * b(0) - a(0) * b(2)
    val nz = a(0) * b(1) - a(1) * b(0)
    val nn = nx * nx + ny * ny + nz * nz
    def chord(q: Array[Double]): Double = {
      val dx = p(0) - q(0); val dy = p(1) - q(1); val dz = p(2) - q(2)
      2 * math.asin(math.min(1.0, math.sqrt(dx * dx + dy * dy + dz * dz) / 2))
    }
    if (nn == 0) return math.min(chord(a), chord(b))
    val c1x = ny * a(2) - nz * a(1); val c1y = nz * a(0) - nx * a(2); val c1z = nx * a(1) - ny * a(0)
    val c2x = b(1) * nz - b(2) * ny; val c2y = b(2) * nx - b(0) * nz; val c2z = b(0) * ny - b(1) * nx
    val within = (c1x * p(0) + c1y * p(1) + c1z * p(2)) >= 0 &&
      (c2x * p(0) + c2y * p(1) + c2z * p(2)) >= 0
    if (within) {
      val pn = p(0) * nx + p(1) * ny + p(2) * nz
      math.asin(math.min(1.0, math.abs(pn) / math.sqrt(nn)))
    } else math.min(chord(a), chord(b))
  }

  /** Indices kept by Douglas–Peucker at `tolRad`; endpoints always kept. */
  private def dp(v: Array[Array[Double]], tolRad: Double): Array[Boolean] = {
    val n    = v.length
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    val stack = scala.collection.mutable.Stack[(Int, Int)]((0, n - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      if (hi - lo > 1) {
        var best = -1; var bestD = tolRad
        var i = lo + 1
        while (i < hi) {
          val d = segDist(v(lo), v(hi), v(i))
          if (d > bestD) { bestD = d; best = i }
          i += 1
        }
        if (best >= 0) {
          keep(best) = true
          stack.push((lo, best)); stack.push((best, hi))
        }
      }
    }
    keep
  }

  def simplify(lngs: Array[Double], lats: Array[Double], tolM: Double,
      close: Boolean): Option[Array[(Double, Double)]] = {
    val n = lngs.length
    if (n < (if (close) 3 else 2) || tolM < 0 || tolM.isNaN) return None
    if (lngs.exists(l => l < -180 || l > 180 || l.isNaN) ||
        lats.exists(l => l < -90 || l > 90 || l.isNaN)) return None
    val tolRad = tolM / 6371008.8
    val pts =
      if (close) (0 until n).map(i => xyz(lngs(i), lats(i))).toArray :+ xyz(lngs(0), lats(0))
      else (0 until n).map(i => xyz(lngs(i), lats(i))).toArray
    val keep = dp(pts, tolRad)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    val m = if (close) n else n // closed: drop the duplicated last before re-closing
    while (i < m) {
      if (keep(i)) kept += ((lngs(i), lats(i)))
      i += 1
    }
    if (close) {
      if (kept.size < 3) return None
      kept += ((lngs(0), lats(0)))
    } else if (kept.size < 2) return None
    Some(kept.toArray)
  }
}

abstract class GeoSimplifyBase extends Expression with CodegenFallback {
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
    } else 10.0
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
    GeoSimplify.simplify(lngs, lats, tol, close) match {
      case None      => null
      case Some(pts) =>
        GeoDensify.json(if (close) "Polygon" else "LineString", pts, ringWrap = close)
    }
  }
}

case class GeoLineSimplify(children: Seq[Expression]) extends GeoSimplifyBase {
  override protected def fnName = "geo_line_simplify"
  override protected def close  = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoLineSimplify = copy(children = newChildren)
  override def prettyName: String = "geo_line_simplify"
}

case class GeoPolygonSimplify(children: Seq[Expression]) extends GeoSimplifyBase {
  override protected def fnName = "geo_polygon_simplify"
  override protected def close  = true
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoPolygonSimplify = copy(children = newChildren)
  override def prettyName: String = "geo_polygon_simplify"
}
