package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geo_union_polygons_array(polygons)` / `geo_simplify_polygons_array(
  * polygons [, tolerance_m])` — the array forms of the clip/simplify
  * family (reference surface: the ADX polygon-array pair). Input is an
  * array of RINGS in the family's coordinate convention
  * (array<array<array<double>>>, each ring an array of [lng, lat]);
  * output Polygon/MultiPolygon GeoJSON (empty array → empty
  * GeometryCollection), null on any malformed ring. Union folds the
  * spherical Greiner–Hormann pair clip (GeoClip.unionRings — merged
  * boundaries keep the largest traversal ring, the family's no-holes
  * posture); simplify runs the spherical Douglas–Peucker per ring
  * (independent rings — ADX's joint shared-border constraint is a
  * documented divergence).
  */
abstract class GeoPolyArrayBase extends Expression with CodegenFallback {
  def children: Seq[Expression]
  protected def fnName: String
  protected def maxArgs: Int
  protected def run(shapes: Seq[(Array[Double], Array[Double])], tol: Double): String

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def shapesOk(t: DataType): Boolean = t match {
      case ArrayType(ArrayType(ArrayType(e, _), _), _) => e.isInstanceOf[NumericType]
      case _                                           => false
    }
    if (children.isEmpty || children.size > maxArgs)
      TypeCheckResult.TypeCheckFailure(s"$fnName: wrong argument count")
    else if (!shapesOk(children.head.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$fnName polygons must be an array of rings (array of [lng, lat] arrays)")
    else if (children.size == 2 && !children(1).dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(s"$fnName tolerance must be numeric")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val p = children.head.eval(input)
    if (p == null) return null
    val tol = if (children.size == 2) {
      val t = children(1).eval(input)
      if (t == null) return null
      ShapeArg.num(t)
    } else 0.0
    val outer = p.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ringT = children.head.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[ArrayType]
    val shapes = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Array[Double])]
    var i = 0
    while (i < outer.numElements()) {
      val ringRaw = outer.get(i, ringT)
      if (ringRaw == null) return null
      val c = ShapeArg.coords(ringT, ringRaw)
      if (c == null) return null
      shapes += c
      i += 1
    }
    val out = run(shapes.toSeq, tol)
    if (out == null) null else UTF8String.fromString(out)
  }
}

case class GeoUnionPolygonsArray(children: Seq[Expression]) extends GeoPolyArrayBase {
  override protected def fnName   = "geo_union_polygons_array"
  override protected def maxArgs  = 1
  override protected def run(shapes: Seq[(Array[Double], Array[Double])], tol: Double): String =
    GeoClip.unionPolygonsArray(shapes)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoUnionPolygonsArray = copy(children = newChildren)
  override def prettyName: String = "geo_union_polygons_array"
}

case class GeoSimplifyPolygonsArray(children: Seq[Expression]) extends GeoPolyArrayBase {
  override protected def fnName   = "geo_simplify_polygons_array"
  override protected def maxArgs  = 2
  override protected def run(shapes: Seq[(Array[Double], Array[Double])], tol: Double): String = {
    // ADX defaults the tolerance to 10 m; tol < 0 and NaN null inside
    // GeoSimplify.simplify
    val t = if (children.size == 2) tol else 10.0
    GeoClip.simplifyPolygonsArray(shapes, t)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoSimplifyPolygonsArray = copy(children = newChildren)
  override def prettyName: String = "geo_simplify_polygons_array"
}

/** `geo_union_lines_array(lines)` — the polyline twin of the array union:
  * input array<array<[lng,lat]>>, output LineString/MultiLineString
  * GeoJSON (GeoClip.unionLinesArray — a 1-D union is the validated
  * collection itself), null on any malformed line.
  */
case class GeoUnionLinesArray(children: Seq[Expression]) extends GeoPolyArrayBase {
  override protected def fnName   = "geo_union_lines_array"
  override protected def maxArgs  = 1
  override protected def run(shapes: Seq[(Array[Double], Array[Double])], tol: Double): String =
    GeoClip.unionLinesArray(shapes)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoUnionLinesArray = copy(children = newChildren)
  override def prettyName: String = "geo_union_lines_array"
}
