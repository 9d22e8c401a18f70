package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `term_has(text, 'needle'): boolean` — ADX `has`: case-insensitive
  * WHOLE-TERM match, as one allocation-free byte scan.
  *
  * The composed spelling — `array_contains(split(lower(s), '[^0-9a-z]+'),
  * needle)` — lowercases the string, runs a regex, and materializes a term
  * array per row. This native Catalyst expression scans UTF-8 bytes in
  * place: ASCII uppercase folds by +32 during comparison, term boundaries
  * are non-ASCII-alphanumeric bytes (multi-byte UTF-8 units are ≥ 0x80, so
  * non-ASCII text separates terms exactly like the regex's `[^0-9a-z]`
  * class). Bit-compatible with the composed form for ASCII-alphanumeric
  * needles — the only needles the rewrite sends here (others keep the array
  * path, preserving the documented never-matches contract).
  *
  * One caveat vs the composed form: locale-expanding lowercase mappings
  * (e.g. U+0130 'İ' → "i̇") tokenize differently; both treat every non-ASCII
  * character as a separator otherwise. Registered through
  * [[graft.GraftSessionExtensions]].
  */
case class TermHas(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"term_has needs (string, string), got (${left.dataType.catalogString}, " +
          s"${right.dataType.catalogString})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("term_has needs a FOLDABLE (literal) needle")
    else {
      val n = right.eval(null)
      if (n == null || !TermHas.isAsciiAlnum(n.asInstanceOf[UTF8String].toString))
        TypeCheckResult.TypeCheckFailure(
          "term_has needs a non-empty ASCII-alphanumeric needle " +
            "(use the array spelling for anything else)")
      else TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val needleBytes: Array[Byte] =
    right.eval(null).asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).getBytes("UTF-8")

  override def nullSafeEval(s: Any, n: Any): Any =
    TermHas.termContains(s.asInstanceOf[UTF8String].getBytes, needleBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNeedle", needleBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, (s, _) => {
      val sb = ctx.freshName("thBytes")
      val i  = ctx.freshName("thI")
      val j  = ctx.freshName("thJ")
      val ok = ctx.freshName("thOk")
      val c  = ctx.freshName("thC")
      val b0 = ctx.freshName("thB")
      val b1 = ctx.freshName("thA")
      // same loop as TermHas.termContains — keep the two in lock-step
      s"""
         |byte[] $sb = $s.getBytes();
         |${ev.value} = false;
         |for (int $i = 0; $i + $ref.length <= $sb.length && !${ev.value}; $i++) {
         |  boolean $ok = true;
         |  for (int $j = 0; $j < $ref.length; $j++) {
         |    byte $c = $sb[$i + $j];
         |    if ($c >= 'A' && $c <= 'Z') $c += 32;
         |    if ($c != $ref[$j]) { $ok = false; break; }
         |  }
         |  if ($ok) {
         |    byte $b0 = $i == 0 ? (byte) ' ' : $sb[$i - 1];
         |    byte $b1 = $i + $ref.length == $sb.length ? (byte) ' ' : $sb[$i + $ref.length];
         |    if (!(($b0 >= '0' && $b0 <= '9') || ($b0 >= 'a' && $b0 <= 'z') || ($b0 >= 'A' && $b0 <= 'Z')) &&
         |        !(($b1 >= '0' && $b1 <= '9') || ($b1 >= 'a' && $b1 <= 'z') || ($b1 >= 'A' && $b1 <= 'Z')))
         |      ${ev.value} = true;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TermHas =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "term_has"
}

object TermHas {

  def isAsciiAlnum(s: String): Boolean =
    s.nonEmpty && s.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))

  private def alnum(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  /** Reference implementation — MUST stay in lock-step with the generated
    * Java in `doGenCode` (interpreted fallback + tests compare the two).
    */
  def termContains(sb: Array[Byte], needle: Array[Byte]): Boolean = {
    val n = sb.length
    val m = needle.length
    var i = 0
    while (i + m <= n) {
      var ok = true
      var j  = 0
      while (ok && j < m) {
        var c = sb(i + j)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
        if (c != needle(j)) ok = false
        j += 1
      }
      if (ok &&
          (i == 0 || !alnum(sb(i - 1))) &&
          (i + m == n || !alnum(sb(i + m)))) return true
      i += 1
    }
    false
  }

  /** Column API (session must have [[graft.GraftSessionExtensions]] loaded). */
  def termHas(text: Column, needle: Column): Column =
    call_function("term_has", text, needle)
}
