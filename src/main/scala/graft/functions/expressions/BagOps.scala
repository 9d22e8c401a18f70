package graft.functions.expressions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Property-bag algebra over the engine's bag currency (JSON-object text,
  * the `bag_pack`/`pack_all` output shape — KQL `dynamic` bags).
  *
  * ADX surface (reference queries carry bags as the ingestion-mapping /
  * lineage property currency, e.g. the mapping column built in
  * ExtentsTable.cs-style payloads): `bag_merge(b1, b2, …)` — union of keys,
  * EARLIER argument wins on conflict; `bag_remove_keys(bag, keys)` — drop
  * the listed top-level keys.
  *
  * Divergence (documented): output keys are serialized in SORTED order.
  * ADX leaves bag key order unspecified; sorting makes results
  * deterministic under any row/partition order — required for the
  * hash-compared oracle and the right call for a distributed engine, where
  * "insertion order" is not reproducible. Values (including nested
  * objects/arrays) pass through untouched.
  *
  * Native Catalyst expressions with `CodegenFallback` (the Jackson walk
  * doesn't benefit from generated Java, and bag algebra is metadata-plane,
  * not the per-row hot path). Jackson is a Spark-provided dependency
  * (`com.fasterxml.jackson.databind`, shipped in /opt/spark/jars).
  */
case class BagMerge(children: Seq[Expression]) extends Expression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true
  override def foldable: Boolean  = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure("bag_merge takes at least two bags")
    else if (children.exists(_.dataType != StringType))
      TypeCheckResult.TypeCheckFailure("bag_merge arguments must be JSON-bag strings")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[UTF8String](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[UTF8String]
      i += 1
    }
    BagOps.merge(vals)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BagMerge = copy(children = newChildren)

  override def prettyName: String = "bag_merge"
}

/** `bag_remove_keys(bag, keys)` — drop the listed top-level keys; output
  * keys sorted (same determinism contract as [[BagMerge]]).
  */
case class BagRemoveKeys(left: Expression, right: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bag_remove_keys takes (bag_string, array<string> keys)")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = left.eval(input)
    val k = right.eval(input)
    if (b == null || k == null) null
    else BagOps.removeKeys(b.asInstanceOf[UTF8String], k.asInstanceOf[ArrayData])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BagRemoveKeys =
    copy(left = newChildren(0), right = newChildren(1))

  override def prettyName: String = "bag_remove_keys"
}

object BagOps {

  private val mapper = new ObjectMapper()

  // Strict reader for dynamic_to_json: without FAIL_ON_TRAILING_TOKENS a
  // non-JSON string with a valid JSON prefix ('123abc') would parse as the
  // prefix token and silently drop the tail; ADX treats it as a string
  // value ('"123abc"').
  private val strictReader = mapper.reader()
    .`with`(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  /** Merge JSON-object texts, earlier argument wins; sorted-key output.
    * Null result on any non-object argument.
    */
  def merge(bags: Array[UTF8String]): UTF8String = {
    val out = mapper.createObjectNode()
    val seen = new java.util.TreeMap[String, com.fasterxml.jackson.databind.JsonNode]()
    var i = 0
    while (i < bags.length) {
      val node = try mapper.readTree(bags(i).toString) catch { case _: Exception => null }
      if (node == null || !node.isObject) return null
      val it = node.asInstanceOf[ObjectNode].fields()
      while (it.hasNext) {
        val e = it.next()
        if (!seen.containsKey(e.getKey)) seen.put(e.getKey, e.getValue)
      }
      i += 1
    }
    val it = seen.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue) }
    UTF8String.fromString(mapper.writeValueAsString(out))
  }

  /** Drop listed top-level keys; sorted-key output. Null on non-object. */
  def removeKeys(bag: UTF8String, keys: ArrayData): UTF8String = {
    val node = try mapper.readTree(bag.toString) catch { case _: Exception => null }
    if (node == null || !node.isObject) return null
    val obj = node.asInstanceOf[ObjectNode]
    var i = 0
    while (i < keys.numElements()) {
      val k = keys.getUTF8String(i)
      if (k != null) obj.remove(k.toString): Unit
      i += 1
    }
    val sorted = new java.util.TreeMap[String, com.fasterxml.jackson.databind.JsonNode]()
    val it = obj.fields()
    while (it.hasNext) { val e = it.next(); sorted.put(e.getKey, e.getValue): Unit }
    val out = mapper.createObjectNode()
    val it2 = sorted.entrySet().iterator()
    while (it2.hasNext) { val e = it2.next(); out.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue) }
    UTF8String.fromString(mapper.writeValueAsString(out))
  }

  /** RECURSIVELY canonicalize a JSON node: object keys sort at every
    * depth, array order is preserved, scalars pass through — the
    * dynamic_to_json normal form.
    */
  private def canonical(
      node: com.fasterxml.jackson.databind.JsonNode): com.fasterxml.jackson.databind.JsonNode =
    node match {
      case obj: ObjectNode =>
        val sorted = new java.util.TreeMap[String, com.fasterxml.jackson.databind.JsonNode]()
        val it = obj.fields()
        while (it.hasNext) { val e = it.next(); sorted.put(e.getKey, canonical(e.getValue)): Unit }
        val out = mapper.createObjectNode()
        val it2 = sorted.entrySet().iterator()
        while (it2.hasNext) {
          val e = it2.next()
          out.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue)
        }
        out
      case arr: com.fasterxml.jackson.databind.node.ArrayNode =>
        val out = mapper.createArrayNode()
        val it = arr.elements()
        while (it.hasNext) out.add(canonical(it.next())): Unit
        out
      case other => other
    }

  /** dynamic_to_json: canonical JSON text (recursive sorted keys). A
    * non-JSON input string is treated as a string VALUE and JSON-quoted —
    * the ADX behavior for scalar dynamics.
    */
  def dynamicToJson(x: UTF8String): UTF8String = {
    val node = try strictReader.readTree(x.toString) catch { case _: Exception => null }
    if (node == null)
      UTF8String.fromString(mapper.writeValueAsString(
        mapper.getNodeFactory.textNode(x.toString)))
    else UTF8String.fromString(mapper.writeValueAsString(canonical(node)))
  }
}

/** `dynamic_to_json(x)` — canonical JSON text with keys sorted at every
  * nesting depth (ADX's normalization scalar; bag_merge/bag_remove_keys
  * sort only the top level they rebuild).
  */
case class DynamicToJson(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "dynamic_to_json takes a dynamic (JSON text) argument")

  override def nullSafeEval(v: Any): Any =
    BagOps.dynamicToJson(v.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): DynamicToJson =
    copy(child = newChild)

  override def prettyName: String = "dynamic_to_json"
}
