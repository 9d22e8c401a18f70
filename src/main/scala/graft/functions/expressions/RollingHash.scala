package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin polynomial rolling hash of a string column — the document
  * fingerprinting primitive (64-bit, base 257, natural overflow wrap).
  *
  * A native Catalyst `Expression` WITH `doGenCode`, not a Scala UDF: the
  * generated Java inlines into whole-stage codegen (no boxing, no
  * serialization round-trip), so fingerprinting stays on the codegen'd hot
  * path at corpus scale — the preference order of SURVEY §7 ("a native
  * Catalyst Expression beats a Scala UDF beats anything else"). Registered
  * through [[graft.GraftSessionExtensions]]
  * (`spark.sql.extensions=graft.GraftSessionExtensions`).
  *
  * The hash walks UTF-8 bytes directly (no decode) and is
  * endianness/platform-stable, so fingerprints are portable across clusters.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("rhBytes")
      val i     = ctx.freshName("rhI")
      s"""
         |byte[] $bytes = $c.getBytes();
         |${ev.value} = ${RollingHash.Seed}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value} = ${ev.value} * ${RollingHash.Base}L + (long)($bytes[$i] & 0xff);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  val Base = 257L
  val Seed = 1125899906842597L

  /** Reference implementation — MUST stay in lock-step with the generated
    * Java in `doGenCode` (interpreted fallback + tests compare the two).
    */
  def hashBytes(bytes: Array[Byte]): Long = {
    var acc = Seed
    var i   = 0
    while (i < bytes.length) {
      acc = acc * Base + (bytes(i) & 0xff)
      i += 1
    }
    acc
  }

  /** Column API (session must have [[graft.GraftSessionExtensions]] loaded). */
  def rollingHash(c: Column): Column = call_function("rolling_hash", c)
}
