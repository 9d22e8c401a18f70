package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Geohash scalars — ADX `geo_point_to_geohash(lng, lat [, accuracy])` and
  * `geo_geohash_to_central_point(hash)` (the latter returns the GeoJSON
  * Point bag ADX uses: `{"type":"Point","coordinates":[lng,lat]}`).
  *
  * Standard public geohash algorithm: alternate longitude/latitude range
  * bisection, 5 bits per base-32 character (alphabet without a/i/l/o).
  * Null on out-of-range coordinates, a bad accuracy (1..12), or a
  * malformed hash — the scalar-surface try-null convention.
  */
case class GeoPointToGeohash(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 3)
      TypeCheckResult.TypeCheckFailure("geo_point_to_geohash takes (lng, lat [, accuracy])")
    else if (!children.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure("geo_point_to_geohash arguments must be numeric")
    else TypeCheckResult.TypeCheckSuccess

  private def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }

  override def eval(input: InternalRow): Any = {
    val lng = children(0).eval(input)
    val lat = children(1).eval(input)
    if (lng == null || lat == null) return null
    val acc = if (children.size == 3) {
      val a = children(2).eval(input)
      if (a == null) return null
      num(a).toInt
    } else 5
    Geohash.encode(num(lng), num(lat), acc)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoPointToGeohash =
    copy(children = newChildren)

  override def prettyName: String = "geo_point_to_geohash"
}

case class GeohashCentralPoint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "geo_geohash_to_central_point takes a geohash string")

  override def nullSafeEval(input: Any): Any =
    Geohash.centralPoint(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): GeohashCentralPoint =
    copy(child = newChild)

  override def prettyName: String = "geo_geohash_to_central_point"
}

object Geohash {

  private val B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val B32Idx: Array[Int] = {
    val a = Array.fill(128)(-1)
    B32.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def encode(lng: Double, lat: Double, accuracy: Int): UTF8String = {
    if (accuracy < 1 || accuracy > 12) return null
    if (lng < -180.0 || lng > 180.0 || lat < -90.0 || lat > 90.0) return null
    if (lng.isNaN || lat.isNaN) return null
    var lngLo = -180.0; var lngHi = 180.0
    var latLo = -90.0;  var latHi = 90.0
    val sb   = new java.lang.StringBuilder(accuracy)
    var even = true
    var bit  = 0
    var ch   = 0
    var produced = 0
    while (produced < accuracy) {
      if (even) {
        val mid = (lngLo + lngHi) / 2
        if (lng >= mid) { ch = (ch << 1) | 1; lngLo = mid }
        else            { ch = ch << 1;       lngHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else            { ch = ch << 1;       latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(B32.charAt(ch)); produced += 1; bit = 0; ch = 0 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Cell bounds (lngLo, lngHi, latLo, latHi), or null on a malformed
    * hash — the decode loop shared by centralPoint and neighbors.
    */
  def bounds(h: String): Array[Double] = {
    if (h.isEmpty || h.length > 12) return null
    var lngLo = -180.0; var lngHi = 180.0
    var latLo = -90.0;  var latHi = 90.0
    var even = true
    var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      val v = if (c < 128) B32Idx(c.toInt) else -1
      if (v < 0) return null
      var b = 4
      while (b >= 0) {
        val on = ((v >> b) & 1) == 1
        if (even) {
          val mid = (lngLo + lngHi) / 2
          if (on) lngLo = mid else lngHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (on) latLo = mid else latHi = mid
        }
        even = !even
        b -= 1
      }
      i += 1
    }
    Array(lngLo, lngHi, latLo, latHi)
  }

  /** The (up to 8) adjacent cells at the same accuracy — east/west wrap
    * across the antimeridian; steps past a pole are dropped (polar cells
    * have fewer than 8). Distinct, self excluded, or null on a malformed
    * hash.
    */
  def neighbors(hash: UTF8String): Seq[UTF8String] = {
    if (hash == null) return null
    val h = hash.toString.toLowerCase
    val b = bounds(h)
    if (b == null) return null
    val w = b(1) - b(0); val ht = b(3) - b(2)
    val clng = (b(0) + b(1)) / 2; val clat = (b(2) + b(3)) / 2
    val out = for {
      di <- -1 to 1; dj <- -1 to 1; if di != 0 || dj != 0
      lat = clat + dj * ht; if lat > -90.0 && lat < 90.0
    } yield {
      var lng = clng + di * w
      if (lng > 180.0) lng -= 360.0 else if (lng < -180.0) lng += 360.0
      encode(lng, lat, h.length)
    }
    out.filter(_ != null).distinct.filterNot(_.toString == h)
  }

  /** GeoJSON Point at the cell center, or null on a malformed hash. */
  def centralPoint(hash: UTF8String): UTF8String = {
    if (hash == null) return null
    val h = hash.toString.toLowerCase
    if (h.isEmpty || h.length > 12) return null
    var lngLo = -180.0; var lngHi = 180.0
    var latLo = -90.0;  var latHi = 90.0
    var even = true
    var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      val v = if (c < 128) B32Idx(c.toInt) else -1
      if (v < 0) return null
      var b = 4
      while (b >= 0) {
        val on = ((v >> b) & 1) == 1
        if (even) {
          val mid = (lngLo + lngHi) / 2
          if (on) lngLo = mid else lngHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (on) latLo = mid else latHi = mid
        }
        even = !even
        b -= 1
      }
      i += 1
    }
    val lng = (lngLo + lngHi) / 2
    val lat = (latLo + latHi) / 2
    UTF8String.fromString(s"""{"type":"Point","coordinates":[$lng,$lat]}""")
  }

  private[expressions] def b32IdxOf(c: Char): Int = B32Idx(c.toInt)

  /** GeoJSON Polygon of the cell rectangle, or null on a malformed hash. */
  def cellPolygon(hash: UTF8String): UTF8String = {
    val b = GeohashBounds.boundsOf(hash)
    if (b == null) return null
    val (w, e, s, n) = (b(0), b(1), b(2), b(3))
    UTF8String.fromString(
      s"""{"type":"Polygon","coordinates":[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]}""")
  }
}

/** `geo_geohash_neighbors(hash)` — the up-to-8 same-accuracy adjacent
  * cells (east/west antimeridian wrap; polar rows have fewer), sorted for
  * determinism. Null on a malformed hash.
  */
case class GeohashNeighbors(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("geo_geohash_neighbors argument must be a string")

  override protected def nullSafeEval(input: Any): Any = {
    val ns = Geohash.neighbors(input.asInstanceOf[UTF8String])
    if (ns == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ns.sortBy(_.toString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): GeohashNeighbors =
    copy(child = newChild)

  override def prettyName: String = "geo_geohash_neighbors"
}

/** `geo_geohash_to_polygon(hash)` — the GeoJSON Polygon of the cell
  * rectangle (closed ring, counter-clockwise from the south-west corner:
  * the same ring convention as `geo_s2cell_to_polygon`). The bounds come
  * from the identical range-bisection walk as `centralPoint`; null on a
  * malformed hash.
  */
case class GeohashToPolygon(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("geo_geohash_to_polygon argument must be a string")

  override protected def nullSafeEval(input: Any): Any =
    Geohash.cellPolygon(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): GeohashToPolygon =
    copy(child = newChild)

  override def prettyName: String = "geo_geohash_to_polygon"
}

object GeohashBounds {
  /** (lngLo, lngHi, latLo, latHi) of the cell, or null on malformed. */
  def boundsOf(hash: UTF8String): Array[Double] = {
    if (hash == null) return null
    val h = hash.toString.toLowerCase
    if (h.isEmpty || h.length > 12) return null
    var lngLo = -180.0; var lngHi = 180.0
    var latLo = -90.0;  var latHi = 90.0
    var even = true
    var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      val v = if (c < 128) Geohash.b32IdxOf(c) else -1
      if (v < 0) return null
      var b = 4
      while (b >= 0) {
        val on = ((v >> b) & 1) == 1
        if (even) {
          val mid = (lngLo + lngHi) / 2
          if (on) lngLo = mid else lngHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (on) latLo = mid else latHi = mid
        }
        even = !even
        b -= 1
      }
      i += 1
    }
    Array(lngLo, lngHi, latLo, latHi)
  }
}
