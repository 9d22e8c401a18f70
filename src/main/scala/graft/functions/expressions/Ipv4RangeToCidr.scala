package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ADX `ipv4_range_to_cidr_list(start, end)` — the minimal ordered list of
  * CIDR blocks exactly covering the inclusive address range (the classic
  * greedy largest-aligned-block walk, identical to RFC-style range
  * summarization). Null on unparsable addresses or start > end.
  */
case class Ipv4RangeToCidr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("ipv4_range_to_cidr_list takes (startIp, endIp) strings")

  private def parse(s: String): Long = {
    val parts = s.trim.split("\\.", -1)
    if (parts.length != 4) return -1L
    var v = 0L
    parts.foreach { p =>
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return -1L
      val o = p.toInt
      if (o > 255) return -1L
      v = (v << 8) | o
    }
    v
  }

  private def fmt(v: Long): String =
    s"${(v >> 24) & 0xFF}.${(v >> 16) & 0xFF}.${(v >> 8) & 0xFF}.${v & 0xFF}"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var start = parse(a.asInstanceOf[UTF8String].toString)
    val end   = parse(b.asInstanceOf[UTF8String].toString)
    if (start < 0 || end < 0 || start > end) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    while (start <= end) {
      // largest block: aligned at `start` AND not running past `end`
      val alignBits = if (start == 0) 32 else java.lang.Long.numberOfTrailingZeros(start)
      var size = math.min(alignBits, 32)
      while (size > 0 && start + (1L << size) - 1 > end) size -= 1
      out += UTF8String.fromString(s"${fmt(start)}/${32 - size}")
      start += 1L << size
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Ipv4RangeToCidr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "ipv4_range_to_cidr_list"
}
