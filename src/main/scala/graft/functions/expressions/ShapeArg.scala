package graft.functions.expressions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.ArrayType

/** Shared argument plumbing for the geo shape expressions: ONE copy of the
  * array<array<numeric>> → (lngs, lats) extraction and the Decimal/Number
  * widening, so the family's null contract (null row or a point shorter
  * than [lng, lat] → null result) lives in a single place.
  */
private[expressions] object ShapeArg {

  def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }

  /** (lngs, lats) of a shape value typed `shapeType` =
    * array<array<numeric>>, or null when any row is null or has fewer than
    * two coordinates.
    */
  def coords(shapeType: ArrayType, v: Any): (Array[Double], Array[Double]) = {
    val arr   = v.asInstanceOf[ArrayData]
    val inner = shapeType.elementType.asInstanceOf[ArrayType]
    val n     = arr.numElements()
    val lngs  = new Array[Double](n)
    val lats  = new Array[Double](n)
    var k = 0
    while (k < n) {
      val row = arr.get(k, inner)
      if (row == null) return null
      val pt = row.asInstanceOf[ArrayData]
      if (pt.numElements() < 2) return null
      lngs(k) = num(pt.get(0, inner.elementType))
      lats(k) = num(pt.get(1, inner.elementType))
      k += 1
    }
    (lngs, lats)
  }
}
