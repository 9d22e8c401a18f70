package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3492 Punycode, the ADX `punycode_from_string` /
  * `punycode_to_string` pair (the reference exposes them for IDN log
  * fields). Pure bootstring algorithm over Unicode code points — no IDNA
  * ToASCII pre-processing (no case folding, no `xn--` prefix), exactly the
  * raw ADX scalar contract. Malformed input decodes to NULL (ADX returns
  * empty; NULL is this engine's uniform failure currency — documented).
  *
  * Metadata-plane scalar: CodegenFallback (a per-row encoder loop gains
  * nothing from generated Java).
  */
object Punycode {
  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Long, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    // value bounded by k + 35 — the Long division result always fits Int
    (k + ((Base - TMin + 1) * delta) / (delta + Skew)).toInt
  }

  private def encodeDigit(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def decodeDigit(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0' + 26
    else if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else -1

  /** Encode to punycode text; null input -> null. */
  def encode(s: String): String = {
    val cps = s.codePoints().toArray
    val sb  = new StringBuilder
    cps.foreach(c => if (c < InitialN) sb.append(c.toChar))
    val basicLen = sb.length
    if (basicLen > 0) sb.append('-')
    var n     = InitialN
    // delta/q run in Long: (m-n)*(h+1) reaches ~2^52 in the worst case
    // (0x10FFFF step times a 2^31-length prefix) — an Int here silently
    // wraps on large ASCII-then-astral inputs (RFC 3492 §6.4 requires
    // encoders to handle overflow; Long headroom makes it unreachable for
    // any JVM String)
    var delta = 0L
    var bias  = InitialBias
    var h     = basicLen
    while (h < cps.length) {
      var m = Int.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c)
      delta += (m - n).toLong * (h + 1)
      n = m
      cps.foreach { c =>
        if (c < n) delta += 1
        else if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              sb.append(encodeDigit((t + (q - t) % (Base - t)).toInt))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          sb.append(encodeDigit(q.toInt))
          bias = adapt(delta, h + 1, h == basicLen)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    sb.toString
  }

  /** Decode punycode text; malformed input -> null. */
  def decode(s: String): String = {
    val pos   = s.lastIndexOf('-')
    val out   = new java.lang.StringBuilder
    val basic = if (pos > 0) s.substring(0, pos) else ""
    if (basic.exists(_ >= 128)) return null
    out.append(basic)
    val tail = if (pos >= 0) s.substring(pos + 1) else s
    // code points as a growable buffer (inserts by CODE POINT index)
    val cps = new java.util.ArrayList[Integer]()
    basic.foreach(c => cps.add(c.toInt): Unit)
    var n    = InitialN.toLong
    var i    = 0L
    var bias = InitialBias
    var j    = 0
    while (j < tail.length) {
      val oldi = i
      var w    = 1L
      var k    = Base
      var done = false
      while (!done) {
        if (j >= tail.length) return null
        val d = decodeDigit(tail.charAt(j))
        j += 1
        if (d < 0) return null
        // Long accumulators, matching the encoder's headroom: a long
        // ASCII prefix before an astral code point legitimately pushes
        // delta past Int range (the round-10 encoder fix must round-trip);
        // guard the LONG bound and reject rather than wrap
        if (d > (Long.MaxValue - i) / w) return null
        i += d * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (d < t) done = true
        else {
          if (w > Long.MaxValue / (Base - t)) return null
          w *= Base - t
          k += Base
        }
      }
      bias = adapt(i - oldi, cps.size + 1, oldi == 0)
      n += i / (cps.size + 1)
      if (n > 0x10FFFF) return null
      i %= cps.size + 1
      cps.add(i.toInt, n.toInt)
      i += 1
    }
    val sb = new java.lang.StringBuilder
    cps.forEach(cp => sb.appendCodePoint(cp): Unit)
    sb.toString
  }
}

/** `punycode_from_string(s)` — RFC 3492 encode. */
case class PunycodeEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("punycode_from_string takes a string")
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Punycode.encode(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): PunycodeEncode =
    copy(child = newChild)
}

/** `punycode_to_string(s)` — RFC 3492 decode; NULL on malformed input. */
case class PunycodeDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("punycode_to_string takes a string")
  override def nullSafeEval(v: Any): Any = {
    val r = Punycode.decode(v.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def withNewChildInternal(newChild: Expression): PunycodeDecode =
    copy(child = newChild)
}
