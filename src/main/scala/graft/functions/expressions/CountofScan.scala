package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `countof_scan(text, needle): long` — ADX plain-text `countof`: the
  * number of start offsets where the needle matches, which per the ADX
  * docs MAY OVERLAP (`countof('aaa','aa') = 2`).
  *
  * The composed spelling KqlCompat previously fell back to —
  * `size(filter(sequence(1, length(x)), i -> substring(...) = n))` —
  * materializes a length(x)-element array plus one substring per offset,
  * ~KB/row of allocation against real document columns (round-16 ADVICE
  * item). This native Catalyst expression counts matches in one
  * allocation-free byte scan: a byte-level match of a valid UTF-8 needle
  * can only start on a character boundary (lead and continuation bytes
  * occupy disjoint ranges), so byte-offset counting equals the
  * character-offset count. Empty needle counts 0, matching KqlCompat's
  * plainCountof guard and the fuzz twin. Registered through
  * [[graft.GraftSessionExtensions]].
  */
case class CountofScan(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"countof_scan needs (string, string), got (${left.dataType.catalogString}, " +
        s"${right.dataType.catalogString})")

  override def nullSafeEval(t: Any, n: Any): Any =
    CountofScan.countOverlapping(
      t.asInstanceOf[UTF8String].getBytes, n.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => {
      val tb = ctx.freshName("coText")
      val nb = ctx.freshName("coNeedle")
      val i  = ctx.freshName("coI")
      val j  = ctx.freshName("coJ")
      val ok = ctx.freshName("coOk")
      // same loop as CountofScan.countOverlapping — keep the two in lock-step
      s"""
         |byte[] $tb = $t.getBytes();
         |byte[] $nb = $n.getBytes();
         |${ev.value} = 0L;
         |if ($nb.length > 0) {
         |  for (int $i = 0; $i + $nb.length <= $tb.length; $i++) {
         |    boolean $ok = true;
         |    for (int $j = 0; $j < $nb.length; $j++) {
         |      if ($tb[$i + $j] != $nb[$j]) { $ok = false; break; }
         |    }
         |    if ($ok) ${ev.value}++;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountofScan =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "countof_scan"
}

object CountofScan {

  /** Reference implementation — MUST stay in lock-step with the generated
    * Java in `doGenCode` (interpreted fallback + tests compare the two).
    */
  def countOverlapping(tb: Array[Byte], nb: Array[Byte]): Long = {
    val m = nb.length
    if (m == 0) return 0L
    var count = 0L
    var i     = 0
    while (i + m <= tb.length) {
      var ok = true
      var j  = 0
      while (ok && j < m) {
        if (tb(i + j) != nb(j)) ok = false
        j += 1
      }
      if (ok) count += 1
      i += 1
    }
    count
  }

  /** Column API (session must have [[graft.GraftSessionExtensions]] loaded). */
  def countofScan(text: Column, needle: Column): Column =
    call_function("countof_scan", text, needle)
}
