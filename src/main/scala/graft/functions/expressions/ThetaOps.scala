package graft.functions.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches — distinct-count SET ALGEBRA beyond HLL's
  * inclusion-exclusion: `theta(x)` / `theta_merge(sketch)` aggregates and
  * the `theta_intersect(a, b)` / `theta_diff(a, b)` / `theta_estimate(s)`
  * scalars. Intersections and differences are first-class sketch
  * operations (HLL I-E degrades with each extra set; theta composes to
  * any set expression with bounded error), and below the 4096-entry
  * default the sketch is in its EXACT regime — estimates are true counts.
  * Mergeable two-level shape, same contract as the HLL/t-digest/freq
  * families. DataSketches theta, a Spark-provided jar.
  *
  * The aggregation buffer is a theta `Union`: updatable, merges both raw
  * values and serialized compact sketches, and round-trips through its
  * compact result losslessly (union semantics are closed over compaction)
  * — exactly what TypedImperativeAggregate's serialize/deserialize needs.
  */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def merge(b: Union, o: Union): Union = { b.union(o.getResult); b }

  override def eval(b: Union): Any = b.getResult.toByteArray
  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean  = false
}

case class ThetaAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta requires a string argument, got ${child.dataType.catalogString}")

  override def update(b: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) b.update(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaAgg =
    copy(child = newChild)
  override def prettyName: String = "theta"
}

case class ThetaMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_merge requires a theta sketch column, got ${child.dataType.catalogString}")

  override def update(b: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) b.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "theta_merge"
}

/** `theta_estimate(sketch)` — the distinct estimate (exact below 4096). */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("theta_estimate takes a theta sketch")
  override def nullSafeEval(input: Any): Any =
    Sketches.wrapSketch(Memory.wrap(input.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
  override def prettyName: String = "theta_estimate"
}

abstract class ThetaBinaryOp extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName takes two theta sketches")
    }
  protected def wrap(v: Any) =
    Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
}

/** `theta_intersect(a, b)` — sketch of A ∩ B. */
case class ThetaIntersect(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildIntersection()
    op.intersect(wrap(a)); op.intersect(wrap(b))
    op.getResult.toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "theta_intersect"
}

/** `theta_diff(a, b)` — sketch of A \ B. */
case class ThetaDiff(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.setA(wrap(a)); op.notB(wrap(b))
    op.getResult(true)
  }.toByteArray
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaDiff =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "theta_diff"
}
