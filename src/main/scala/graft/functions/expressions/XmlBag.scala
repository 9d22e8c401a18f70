package graft.functions.expressions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.w3c.dom.{Element, Node}

/** `parse_xml(text)` — XML → the JSON-bag currency, with the xmltodict-style
  * mapping ADX documents:
  *   - element → object keyed by tag, in document order
  *   - attributes → `@name` keys
  *   - text-only element → its text string
  *   - repeated sibling tags → array
  *   - text alongside children/attributes → `#text` key
  *   - empty element → null
  * Null on malformed XML (the scalar-surface try-null convention). JDK DOM
  * end to end — no new dependencies; external entities and DTDs are
  * disabled (no XXE: the parser is configured before any byte is read).
  */
case class ParseXml(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("parse_xml takes an XML string")

  override def nullSafeEval(input: Any): Any =
    XmlBag.parse(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): ParseXml =
    copy(child = newChild)

  override def prettyName: String = "parse_xml"
}

object XmlBag {

  private val mapper = new ObjectMapper()

  def parse(xml: UTF8String): UTF8String = {
    if (xml == null) return null
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      // hard-disable DTDs/external entities — parse_xml must never touch
      // the network or filesystem however hostile the document
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.setXIncludeAware(false)
      f.setExpandEntityReferences(false)
      val builder = f.newDocumentBuilder()
      // default handler prints "[Fatal Error] …" to stderr before the
      // throw — malformed input is an expected null here, keep it silent
      builder.setErrorHandler(new org.xml.sax.helpers.DefaultHandler())
      val doc = builder
        .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml.toString)))
      val root = doc.getDocumentElement
      val out  = mapper.createObjectNode()
      out.set[JsonNode](root.getTagName, elementNode(root))
      UTF8String.fromString(mapper.writeValueAsString(out))
    } catch { case _: Exception => null }
  }

  /** Element → JsonNode under the xmltodict conventions. */
  private def elementNode(el: Element): JsonNode = {
    val attrs = el.getAttributes
    val kids  = el.getChildNodes
    // gather child elements (by tag, in order) and accumulated text
    val childEls = Seq.newBuilder[Element]
    val text     = new StringBuilder
    var i = 0
    while (i < kids.getLength) {
      kids.item(i) match {
        case e: Element => childEls += e
        case t if t.getNodeType == Node.TEXT_NODE ||
                  t.getNodeType == Node.CDATA_SECTION_NODE =>
          text.append(t.getNodeValue)
        case _ =>
      }
      i += 1
    }
    val els  = childEls.result()
    val txt  = text.toString.trim
    if (attrs.getLength == 0 && els.isEmpty) {
      if (txt.isEmpty) mapper.getNodeFactory.nullNode()
      else mapper.getNodeFactory.textNode(txt)
    } else {
      val obj = mapper.createObjectNode()
      var a = 0
      while (a < attrs.getLength) {
        val at = attrs.item(a)
        obj.put("@" + at.getNodeName, at.getNodeValue)
        a += 1
      }
      // repeated sibling tags fold into an array at first repeat
      els.foreach { e =>
        val tag = e.getTagName
        val node = elementNode(e)
        obj.get(tag) match {
          case null => obj.set[JsonNode](tag, node)
          case arr: ArrayNode => arr.add(node)
          case prev =>
            val arr = mapper.createArrayNode()
            arr.add(prev); arr.add(node)
            obj.set[JsonNode](tag, arr)
        }
      }
      if (txt.nonEmpty) obj.put("#text", txt)
      obj
    }
  }
}

/** Punycode domain pair — `punycode_domain_from_string` (Unicode → ASCII
  * xn-- form) and `punycode_domain_to_string` (back), JDK `java.net.IDN`.
  * Null on labels IDN rejects.
  */
case class PunycodeDomainFrom(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("punycode_domain_from_string takes a string")
  override def nullSafeEval(input: Any): Any =
    try UTF8String.fromString(java.net.IDN.toASCII(input.toString))
    catch { case _: Exception => null }
  override protected def withNewChildInternal(newChild: Expression): PunycodeDomainFrom =
    copy(child = newChild)
  override def prettyName: String = "punycode_domain_from_string"
}

case class PunycodeDomainTo(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("punycode_domain_to_string takes a string")
  override def nullSafeEval(input: Any): Any =
    try UTF8String.fromString(java.net.IDN.toUnicode(input.toString))
    catch { case _: Exception => null }
  override protected def withNewChildInternal(newChild: Expression): PunycodeDomainTo =
    copy(child = newChild)
  override def prettyName: String = "punycode_domain_to_string"
}
