package graft.functions.expressions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `treepath(dynamic)` — every path expression identifying a node or leaf
  * of the JSON document, in ADX's bracket spelling: an object field
  * appends `['name']`, an array node appends `[]` ONCE (elements share
  * the path — the ADX convention), depth-first document order,
  * de-duplicated (array elements with the same object keys contribute one
  * path). Input is this engine's dynamic currency (a JSON string); null
  * on null or malformed JSON, and on a scalar root (no tree to walk —
  * ADX returns an empty array there; we match that, not null).
  */
case class TreePath(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("treepath takes a dynamic (JSON string)")

  @transient private lazy val mapper = new ObjectMapper()

  override protected def nullSafeEval(input: Any): Any = {
    val node =
      try mapper.readTree(input.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => null }
    if (node == null) return null
    val out = new java.util.LinkedHashSet[String]()
    walk(node, "", out)
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator(); var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  private def walk(n: JsonNode, path: String, out: java.util.LinkedHashSet[String]): Unit =
    if (n.isObject) {
      val fields = n.fields()
      while (fields.hasNext) {
        val e = fields.next()
        val p = s"$path['${e.getKey}']"
        out.add(p)
        walk(e.getValue, p, out)
      }
    } else if (n.isArray) {
      val p = s"$path[]"
      out.add(p)
      val els = n.elements()
      while (els.hasNext) walk(els.next(), p, out)
    }

  override protected def withNewChildInternal(newChild: Expression): TreePath =
    copy(child = newChild)

  override def prettyName: String = "treepath"
}
