package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `gram_hashes(text, k): array<long>` — the polynomial hash of EVERY
  * k-character window of `text`, in one O(n) sliding pass.
  *
  * The character-shingle primitive behind exact substring-duplication
  * detection (the Lee-et-al.-style signal: dedup_substring_spans). The
  * naive spelling — `xxhash64(substring(text, pos, k))` per position —
  * re-reads every character k times: O(n·k) work per document, and at k=50
  * that 50× tax IS the pipeline's hot loop at corpus scale. This
  * expression decodes UTF-8 once and slides a Karp–Rabin window over CODE
  * POINTS (h ← h·B + cpIn − cpOut·B^k, natural 64-bit wrap), so equal
  * k-char substrings — by character, matching SQL `substring` semantics on
  * any UTF-8 text — get equal hashes at O(1) per position.
  *
  * Collision posture: 64-bit polynomial equality, same contract as the
  * xxhash64 spelling it replaces (a false candidate pair only perturbs the
  * candidate set; verification or oracle equality catches it). Returns an
  * empty array when the text has fewer than k characters. Registered
  * through [[graft.GraftSessionExtensions]].
  */
case class GramHashes(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"gram_hashes needs (string, int), got (${left.dataType.catalogString}, " +
          s"${right.dataType.catalogString})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("gram_hashes needs a FOLDABLE (literal) window size")
    else {
      val k = right.eval(null)
      if (k == null || k.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure("gram_hashes window size must be >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val k: Int = right.eval(null).asInstanceOf[Int]

  override def nullSafeEval(s: Any, kAny: Any): Any =
    ArrayData.toArrayData(GramHashes.compute(s.asInstanceOf[UTF8String].getBytes, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, _) => {
      val cls = GramHashes.getClass.getName.stripSuffix("$") // the object's static forwarder
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $cls.compute($s.getBytes(), $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHashes =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "gram_hashes"
}

object GramHashes {
  val Base = 257L

  /** All k-code-point window hashes of the UTF-8 bytes, O(n). Shared by the
    * interpreted path and the generated code — one implementation, no
    * lock-step risk.
    */
  def compute(bytes: Array[Byte], k: Int): Array[Long] = {
    // decode pass: code points (UTF-8 is self-synchronizing; invalid bytes
    // decode as their unsigned value, deterministic either way)
    val n = bytes.length
    var nChars = 0
    var i = 0
    while (i < n) { // count code points (skip continuation bytes 10xxxxxx)
      if ((bytes(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    if (nChars < k) return Array.emptyLongArray
    val out  = new Array[Long](nChars - k + 1)
    val ring = new Array[Int](k) // last k code points
    // B^k with natural wrap, for O(1) removal of the outgoing code point
    var bk = 1L
    i = 0
    while (i < k) { bk *= Base; i += 1 }
    var h = 0L
    var ci = 0      // code-point index
    var bi = 0      // byte index
    while (bi < n) {
      val b0 = bytes(bi) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0) { len = 2; cp = b0 & 0x1F }
      else if ((b0 & 0xF0) == 0xE0) { len = 3; cp = b0 & 0x0F }
      else if ((b0 & 0xF8) == 0xF0) { len = 4; cp = b0 & 0x07 }
      else cp = b0 // stray continuation byte: treat as its own symbol
      var j = 1
      while (j < len && bi + j < n) { cp = (cp << 6) | (bytes(bi + j) & 0x3F); j += 1 }
      bi += len
      h = h * Base + cp
      if (ci >= k) h -= bk * ring(ci % k)
      ring(ci % k) = cp
      ci += 1
      if (ci >= k) out(ci - k) = h
    }
    out
  }

  /** Column API (session must have [[graft.GraftSessionExtensions]] loaded). */
  def gramHashes(text: Column, k: Int): Column =
    call_function("gram_hashes", text, org.apache.spark.sql.functions.lit(k))
}
