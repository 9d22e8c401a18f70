package graft.functions.expressions

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `buildschema(dynCol)` — the minimal schema admitting every dynamic
  * value in the group, ADX's schema-induction aggregate. Per value the
  * JSON type tree is derived (scalars → `long`/`real`/`string`/`bool`/
  * `null`, objects → nested dictionaries, arrays → the ADX
  * `{"`indexer`": <element schema>}` spelling with all elements unified),
  * and trees MERGE commutatively: same-path alternatives collect into a
  * sorted JSON array of options (so results are deterministic under any
  * partitioning — the mergeability contract every graft sketch follows).
  * Malformed JSON rows contribute `string` (they are strings); null rows
  * contribute nothing.
  *
  * Buffer = the merged [[SchemaTree]]; serialize round-trips through the
  * same normal form the final JSON uses, so two-level rollups (partial →
  * final) are exact.
  */
object SchemaTree {
  /** scalars: sorted option names; fields: object fields; elem: array
    * element tree (ADX `indexer`). */
  final class Node {
    val scalars = mutable.SortedSet.empty[String]
    val fields  = mutable.LinkedHashMap.empty[String, Node]
    var elem: Node = null
    var hasObj     = false
    var hasArr     = false
  }

  private[expressions] val M = new ObjectMapper()

  def fromJson(n: JsonNode, into: Node): Unit =
    if (n.isObject) {
      into.hasObj = true
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        fromJson(e.getValue, into.fields.getOrElseUpdate(e.getKey, new Node))
      }
    } else if (n.isArray) {
      into.hasArr = true
      if (into.elem == null) into.elem = new Node
      val it = n.elements()
      while (it.hasNext) fromJson(it.next(), into.elem)
    } else if (n.isNull) into.scalars += "null"
    else if (n.isTextual) into.scalars += "string"
    else if (n.isBoolean) into.scalars += "bool"
    else if (n.isIntegralNumber) into.scalars += "long"
    else if (n.isNumber) into.scalars += "real"
    else into.scalars += "string"

  def merge(into: Node, from: Node): Node = {
    into.scalars ++= from.scalars
    into.hasObj ||= from.hasObj
    into.hasArr ||= from.hasArr
    from.fields.foreach { case (k, v) =>
      into.fields.get(k) match {
        case Some(t) => merge(t, v)
        case None    => into.fields.update(k, v)
      }
    }
    if (from.elem != null) {
      if (into.elem == null) into.elem = from.elem else merge(into.elem, from.elem)
    }
    into
  }

  /** ADX spelling: single option inline, several as a sorted JSON array;
    * arrays are dictionaries with the backquoted `indexer` key. */
  def toJson(n: Node): JsonNode = {
    val opts = mutable.ArrayBuffer.empty[JsonNode]
    n.scalars.foreach(s => opts += M.getNodeFactory.textNode(s))
    if (n.hasObj) {
      val o = M.createObjectNode()
      n.fields.toSeq.sortBy(_._1).foreach { case (k, v) => o.set[JsonNode](k, toJson(v)) }
      opts += o
    }
    if (n.hasArr) {
      val a = M.createObjectNode()
      a.set[JsonNode]("`indexer`", if (n.elem == null) M.getNodeFactory.textNode("null") else toJson(n.elem))
      opts += a
    }
    if (opts.isEmpty) M.getNodeFactory.textNode("null")
    else if (opts.size == 1) opts.head
    else {
      val arr = M.createArrayNode()
      opts.foreach(arr.add)
      arr
    }
  }

  def parse(s: String): JsonNode =
    try M.readTree(s)
    catch { case _: Exception => null }
}

case class BuildSchemaAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SchemaTree.Node] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"buildschema requires a dynamic (JSON string) argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): SchemaTree.Node = new SchemaTree.Node

  override def update(b: SchemaTree.Node, row: InternalRow): SchemaTree.Node = {
    val v = child.eval(row)
    if (v != null) {
      val parsed = SchemaTree.parse(v.asInstanceOf[UTF8String].toString)
      if (parsed == null) b.scalars += "string"
      else SchemaTree.fromJson(parsed, b)
    }
    b
  }

  override def merge(b: SchemaTree.Node, o: SchemaTree.Node): SchemaTree.Node =
    SchemaTree.merge(b, o)

  override def eval(b: SchemaTree.Node): Any =
    UTF8String.fromString(SchemaTree.toJson(b).toString)

  // serialize = the internal normal form: nested JSON with the option
  // STRUCTURE preserved ({"__s":[...], "__f":{...}, "__a":<node|null>}),
  // so deserialize(serialize(x)) merges exactly like x itself
  private def ser(n: SchemaTree.Node): JsonNode = {
    // the shared mapper — serialize() runs per partial-buffer flush, and a
    // fresh ObjectMapper per NODE would be Jackson's heaviest allocation
    // on a high-cardinality groupBy
    val M = SchemaTree.M
    val o = M.createObjectNode()
    val s = M.createArrayNode()
    n.scalars.foreach(s.add)
    o.set[JsonNode]("__s", s)
    if (n.hasObj) {
      val f = M.createObjectNode()
      n.fields.foreach { case (k, v) => f.set[JsonNode](k, ser(v)) }
      o.set[JsonNode]("__f", f)
    }
    if (n.hasArr)
      o.set[JsonNode]("__a", if (n.elem == null) M.createObjectNode() else ser(n.elem))
    o
  }

  private def deser(j: JsonNode): SchemaTree.Node = {
    val n = new SchemaTree.Node
    val it = j.get("__s").elements()
    while (it.hasNext) n.scalars += it.next().asText()
    val f = j.get("__f")
    if (f != null) {
      n.hasObj = true
      val fit = f.fields()
      while (fit.hasNext) {
        val e = fit.next()
        n.fields.update(e.getKey, deser(e.getValue))
      }
    }
    val a = j.get("__a")
    if (a != null) {
      n.hasArr = true
      if (a.has("__s")) n.elem = deser(a)
    }
    n
  }

  override def serialize(b: SchemaTree.Node): Array[Byte] =
    ser(b).toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  override def deserialize(bytes: Array[Byte]): SchemaTree.Node =
    deser(SchemaTree.parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))

  override def dataType: DataType = StringType
  override def nullable: Boolean  = false

  override def withNewMutableAggBufferOffset(n: Int): BuildSchemaAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BuildSchemaAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BuildSchemaAgg =
    copy(child = newChild)
  override def prettyName: String = "buildschema"
}
