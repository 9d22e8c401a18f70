package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `parse_command_line(cmd, 'windows')` — ADX's command-line tokenizer
  * (mirror-lake-kusto never shells out, so this is pure query surface).
  * Windows/MSVCRT argv rules, the only parser type ADX accepts:
  *   - unquoted whitespace (space/tab) separates arguments;
  *   - `"` toggles in-quote mode (whitespace kept verbatim inside);
  *   - 2n backslashes before a quote emit n backslashes, quote toggles;
  *   - 2n+1 backslashes before a quote emit n backslashes + literal `"`;
  *   - backslashes NOT followed by a quote are literal.
  * Null/blank input or a parser type other than 'windows' → NULL.
  */
case class ParseCommandLine(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "parse_command_line takes (command_line string, parser_type string)")

  override def nullSafeEval(cmdAny: Any, kindAny: Any): Any = {
    if (kindAny.asInstanceOf[UTF8String].toString.toLowerCase != "windows") return null
    val s = cmdAny.asInstanceOf[UTF8String].toString
    if (s.trim.isEmpty) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val cur = new java.lang.StringBuilder
    var inQuote  = false
    var started  = false
    var i        = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') {
        // count the backslash run, then look at what follows
        var n = 0
        while (i < s.length && s.charAt(i) == '\\') { n += 1; i += 1 }
        if (i < s.length && s.charAt(i) == '"') {
          var k = 0
          while (k < n / 2) { cur.append('\\'); k += 1 }
          if (n % 2 == 1) { cur.append('"'); i += 1 } // escaped literal quote
          // even run: the quote is a real delimiter, handled next loop pass
          started = true
        } else {
          var k = 0
          while (k < n) { cur.append('\\'); k += 1 }
          started = true
        }
      } else if (c == '"') {
        inQuote = !inQuote
        started = true
        i += 1
      } else if (!inQuote && (c == ' ' || c == '\t')) {
        if (started) { out += UTF8String.fromString(cur.toString); cur.setLength(0); started = false }
        i += 1
      } else {
        cur.append(c)
        started = true
        i += 1
      }
    }
    if (started) out += UTF8String.fromString(cur.toString)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ParseCommandLine =
    copy(left = l, right = r)
  override def prettyName: String = "parse_command_line"
}

/** `base64_decode_toarray(s)` — base64 text → dynamic array of byte values
  * (0–255 longs, ADX's wire shape). NULL on malformed input. The inverse,
  * `base64_encode_fromarray(arr)`, rejects any element outside 0–255 with
  * NULL instead of silently truncating.
  */
case class Base64DecodeToArray(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("base64_decode_toarray takes a string")

  override protected def nullSafeEval(input: Any): Any =
    try {
      val bytes = java.util.Base64.getDecoder.decode(input.asInstanceOf[UTF8String].toString)
      new GenericArrayData(bytes.map(b => java.lang.Long.valueOf(b & 0xffL): Any))
    } catch { case _: IllegalArgumentException => null }

  override protected def withNewChildInternal(newChild: Expression): Base64DecodeToArray =
    copy(child = newChild)
  override def prettyName: String = "base64_decode_toarray"
}

case class Base64EncodeFromArray(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "base64_encode_fromarray takes an array of byte values")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val et  = child.dataType.asInstanceOf[ArrayType].elementType
    val n   = arr.numElements()
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.get(i, et) match {
        case l: java.lang.Long    => l.longValue()
        case x: java.lang.Integer => x.longValue()
        case x: java.lang.Short   => x.longValue()
        case x: java.lang.Byte    => x.longValue()
        case d: org.apache.spark.sql.types.Decimal => d.toLong
        case d: java.lang.Double  =>
          if (d.doubleValue() != d.doubleValue().floor) return null else d.longValue()
        case f: java.lang.Float   =>
          if (f.floatValue() != f.floatValue().floor) return null else f.longValue()
        case other => other.asInstanceOf[Number].longValue()
      }
      if (v < 0L || v > 255L) return null
      bytes(i) = v.toByte
      i += 1
    }
    UTF8String.fromString(java.util.Base64.getEncoder.encodeToString(bytes))
  }

  override protected def withNewChildInternal(newChild: Expression): Base64EncodeFromArray =
    copy(child = newChild)
  override def prettyName: String = "base64_encode_fromarray"
}
