package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical IPv6 normalization — ADX `parse_ipv6` semantics: full
  * lowercase 8×4-hex-digit colon-separated form ("::1" →
  * "0000:0000:0000:0000:0000:0000:0000:0001"), accepting "::" compression,
  * an embedded dotted-IPv4 tail, and plain IPv4 (mapped to ::ffff:a.b.c.d);
  * null on anything malformed (zone ids and prefixes included).
  *
  * A native Catalyst `Expression`: the generated Java calls the static
  * parser directly inside whole-stage codegen (the StaticInvoke shape —
  * no boxing, no UDF serialization). The canonical fixed-width output makes
  * the rest of the ADX IPv6 surface PLAIN SQL: ipv6_compare is a string
  * compare and ipv6_is_match a nibble-prefix compare, both codegen'd.
  */
case class Ipv6Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ipv6_norm requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Ipv6Norm.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.expressions.Ipv6Norm.normalize($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Ipv6Norm =
    copy(child = newChild)

  override def prettyName: String = "ipv6_norm"
}

object Ipv6Norm {

  /** Entry point shared by interpreted eval and the generated Java. */
  def normalize(s: UTF8String): UTF8String = {
    if (s == null) return null
    val bytes = parse(s.toString.trim)
    if (bytes == null) null else UTF8String.fromString(canonical(bytes))
  }

  /** 16 address bytes, or null when malformed. */
  private[expressions] def parse(s: String): Array[Byte] = {
    if (s.isEmpty || s.contains('%') || s.contains('/')) return null
    if (!s.contains(':')) { // plain IPv4 → IPv4-mapped ::ffff:a.b.c.d
      val v4 = parseV4(s)
      if (v4 == null) return null
      val out = new Array[Byte](16)
      out(10) = -1; out(11) = -1
      System.arraycopy(v4, 0, out, 12, 4)
      return out
    }
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return null // one "::" max
    def split(part: String): Array[String] =
      if (part.isEmpty) Array.empty[String] else part.split(":", -1)
    var head = if (dc >= 0) split(s.substring(0, dc)) else s.split(":", -1)
    var tail = if (dc >= 0) split(s.substring(dc + 2)) else Array.empty[String]
    if (head.exists(_.isEmpty) || tail.exists(_.isEmpty)) return null
    // embedded dotted-IPv4 allowed only as the very last group
    val lastList = if (tail.nonEmpty) tail else head
    var v4: Array[Byte] = null
    if (lastList.nonEmpty && lastList.last.contains('.')) {
      v4 = parseV4(lastList.last)
      if (v4 == null) return null
      if (tail.nonEmpty) tail = tail.dropRight(1) else head = head.dropRight(1)
    }
    if (head.exists(_.contains('.')) || tail.exists(_.contains('.'))) return null
    val need = 8 - (if (v4 != null) 2 else 0)
    val have = head.length + tail.length
    // "::" must stand for at least one zero group; without it counts must agree
    if (dc >= 0) { if (have >= need) return null }
    else if (have != need) return null
    val out = new Array[Byte](16)
    var pos = 0
    def put(g: String): Boolean = {
      if (g.isEmpty || g.length > 4 || !g.forall(isHex)) return false
      val v = Integer.parseInt(g, 16)
      out(pos) = (v >> 8).toByte; out(pos + 1) = v.toByte; pos += 2
      true
    }
    if (!head.forall(put)) return null
    pos = 2 * (head.length + (need - have)) // zeros the "::" stands for
    if (!tail.forall(put)) return null
    if (v4 != null) System.arraycopy(v4, 0, out, 12, 4)
    out
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def parseV4(s: String): Array[Byte] = {
    val p = s.split("\\.", -1)
    if (p.length != 4) return null
    val out = new Array[Byte](4)
    var i = 0
    while (i < 4) {
      val t = p(i)
      if (t.isEmpty || t.length > 3 || !t.forall(c => c >= '0' && c <= '9')) return null
      val v = t.toInt
      if (v > 255 || (t.length > 1 && t.charAt(0) == '0')) return null
      out(i) = v.toByte
      i += 1
    }
    out
  }

  private def canonical(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(39)
    var g = 0
    while (g < 8) {
      if (g > 0) sb.append(':')
      val v = ((b(2 * g) & 0xff) << 8) | (b(2 * g + 1) & 0xff)
      val h = Integer.toHexString(v)
      var pad = 4 - h.length
      while (pad > 0) { sb.append('0'); pad -= 1 }
      sb.append(h)
      g += 1
    }
    sb.toString
  }

  /** Column API (session must have [[graft.GraftSessionExtensions]] loaded). */
  def ipv6Norm(c: Column): Column = call_function("ipv6_norm", c)
}
