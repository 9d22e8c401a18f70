package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric array columns (`array<float>` /
  * `array<double>`, mixed allowed) — the inner loop of every similarity
  * operator (cosine top-k, LSH bucketing, near-dup verify, IVF cells).
  *
  * A native Catalyst `Expression` WITH `doGenCode` instead of
  * `aggregate(zip_with(...))`: the higher-order-function form allocates an
  * intermediate array and boxes a lambda call per element PER PAIR, which
  * dominates runtime when candidate pairs reach the millions. The generated
  * Java is a primitive `for` loop over the two `ArrayData`s — no allocation,
  * no boxing, inlined into whole-stage codegen (SURVEY §7 preference order:
  * native Expression beats UDF beats everything else).
  *
  * Semantics match the HOF form it replaces: summation is sequential
  * left-to-right (bit-reproducible), and a length mismatch yields NULL (the
  * zip_with null-pad behavior) rather than an error.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL on length mismatch even when both inputs are non-null
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vector_dot requires two array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val n  = ad.numElements()
    if (n != bd.numElements()) null
    else {
      val leftDouble  = elemType(left) == DoubleType
      val rightDouble = elemType(right) == DoubleType
      var acc = 0.0
      var i   = 0
      while (i < n) {
        // a null element nulls the whole product-sum — zip_with/aggregate
        // parity (reading the slot raw would silently treat it as 0/garbage)
        if (ad.isNullAt(i) || bd.isNullAt(i)) return null
        val x = if (leftDouble) ad.getDouble(i) else ad.getFloat(i).toDouble
        val y = if (rightDouble) bd.getDouble(i) else bd.getFloat(i).toDouble
        acc += x * y
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("vdN")
      val i   = ctx.freshName("vdI")
      val acc = ctx.freshName("vdAcc")
      val getA = if (elemType(left) == DoubleType) s"$a.getDouble($i)"
                 else s"(double) $a.getFloat($i)"
      val getB = if (elemType(right) == DoubleType) s"$b.getDouble($i)"
                 else s"(double) $b.getFloat($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $getA * $getB;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

object VectorDot {
  /** Column API (session must have [[graft.GraftSessionExtensions]] loaded). */
  def vectorDot(a: Column, b: Column): Column = call_function("vector_dot", a, b)
}
