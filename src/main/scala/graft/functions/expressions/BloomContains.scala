package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_contains(bloom: binary, v: long): boolean` — membership probe
  * against a serialized `org.apache.spark.util.sketch.BloomFilter` (the
  * format `DataFrameStatFunctions.bloomFilter` emits; long values are hashed
  * with `putLong`/`mightContainLong`, matching how `stat.bloomFilter` over a
  * long column inserts).
  *
  * The decontamination prefilter's probe (Surface `curate_contamination`):
  * the tiny benchmark side's gram hashes fold into a bloom that rides the
  * plan as a literal, and the corpus-side explode output is pre-filtered to
  * ~FPR of its volume BEFORE the shuffle join — the standard trick for
  * one-sided-small joins at 100 TB. False positives are harmless (the exact
  * join still runs after); false negatives cannot occur, so results are
  * bit-identical with and without the prefilter.
  *
  * The bloom child must be FOLDABLE (a literal): the filter deserializes
  * once per executor into a `@transient lazy val` and codegen references it
  * via `addReferenceObj` — the per-row work is one `mightContainLong`, no
  * per-row deserialization, inlined into whole-stage codegen.
  */
case class BloomContains(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains needs a binary bloom, got ${left.dataType.catalogString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_contains needs a FOLDABLE (literal) bloom argument")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains probes long values, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bloomBytes: Any, v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (bloom == null) {
      // a NULL bloom literal: the probe is NULL for every row
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;""")
    } else {
      val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.mightContainLong($v);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_contains"
}

object BloomContains {
  /** Column API (session must have [[graft.GraftSessionExtensions]] loaded). */
  def bloomContains(bloomBytes: Column, v: Column): Column =
    call_function("bloom_contains", bloomBytes, v)

  /** Serialize a built filter for embedding as a plan literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}

/** Broadcast-backed variant of the probe for LARGE blooms: the serialized
  * filter rides a Spark broadcast (one torrent ship per executor, O(1)
  * driver refs) instead of a plan literal. A multi-MB literal is hashed
  * and equality-compared BY CONTENT in every Catalyst canonicalization
  * pass — at the 100x dedup corpus the ~10 MB gram bloom made analysis a
  * measurable part of dedup_substring_spans' wall time; the broadcast
  * handle hashes in O(1). Same conservative-probe contract: callers keep
  * the exact join after it. Constructed programmatically (Column wrapper
  * below), never registered in SQL — a broadcast cannot be spelled in
  * text.
  */
case class BloomContainsBc(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    bloomBc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_bc probes long values, got ${child.dataType.catalogString}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBc.value))

  override def nullSafeEval(v: Any): Any = bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // deserialize ONCE per task-instance into a mutable slot; per-row work
    // is a single primitive-long probe inside whole-stage codegen
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloomBc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val bfClass = classOf[BloomFilter].getName
    // readFrom declares `throws IOException` — the generated init MUST catch
    // it or janino rejects the whole class and Spark silently falls back to
    // an INTERPRETED filter for the entire stage (the dedup_substring_spans
    // 100× warm-up-curve variance, round-15 verdict #1: walls 31-70 s with
    // codegen disabled vs a compiled stage)
    val bfVar = ctx.addMutableState(bfClass, "graftBloomBcFilter",
      v => s"""try {
         |  $v = $bfClass.readFrom(
         |    new java.io.ByteArrayInputStream((byte[]) $bcRef.value()));
         |} catch (java.io.IOException e) {
         |  throw new RuntimeException(e);
         |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $bfVar.mightContainLong($v);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BloomContainsBc =
    copy(child = newChild)

  override def prettyName: String = "bloom_contains_bc"
}
