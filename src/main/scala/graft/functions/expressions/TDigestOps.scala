package graft.functions.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tdigest.TDigestDouble

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** t-digest percentile sketches — the ADX `tdigest()` / `tdigest_merge()` /
  * `percentile_tdigest()` two-level surface (the same pre-aggregated
  * dashboard shape as the HLL family: sketch per fine group, merge when
  * rolling up, read with a scalar). ADX's own `percentile()` is
  * t-digest-backed, so this IS the reference estimator; DataSketches
  * `TDigestDouble` (a Spark-provided jar) supplies the k=200 MergingDigest.
  *
  * Mergeability is the 100 TB contract: constant memory per group,
  * map-side partials, associative merge — never a sort or a full
  * materialization of the column. Estimates are rank-accurate to ~1% at
  * k=200; oracle queries assert tolerance booleans against the exact
  * answer, the approximate-operator convention (see q_sketch_*).
  */
case class TDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestDouble] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tdigest requires a double argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): TDigestDouble =
    new TDigestDouble(TDigestDouble.DEFAULT_K)

  override def update(b: TDigestDouble, row: InternalRow): TDigestDouble = {
    val v = child.eval(row)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }

  override def merge(b: TDigestDouble, o: TDigestDouble): TDigestDouble = {
    b.merge(o); b
  }

  override def eval(b: TDigestDouble): Any = b.toByteArray()
  override def serialize(b: TDigestDouble): Array[Byte] = b.toByteArray()
  override def deserialize(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean  = false

  override def withNewMutableAggBufferOffset(n: Int): TDigestAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): TDigestAgg =
    copy(child = newChild)

  override def prettyName: String = "tdigest"
}

/** Roll-up of already-sketched groups: merge serialized t-digests. */
case class TDigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestDouble] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tdigest_merge requires a tdigest sketch column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): TDigestDouble =
    new TDigestDouble(TDigestDouble.DEFAULT_K)

  override def update(b: TDigestDouble, row: InternalRow): TDigestDouble = {
    val v = child.eval(row)
    if (v != null)
      b.merge(TDigestDouble.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: TDigestDouble, o: TDigestDouble): TDigestDouble = {
    b.merge(o); b
  }

  override def eval(b: TDigestDouble): Any = b.toByteArray()
  override def serialize(b: TDigestDouble): Array[Byte] = b.toByteArray()
  override def deserialize(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean  = false

  override def withNewMutableAggBufferOffset(n: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): TDigestMergeAgg =
    copy(child = newChild)

  override def prettyName: String = "tdigest_merge"
}

/** `percentile_tdigest(sketch, p)` — read a percentile (p in 0..100, the
  * KQL convention) out of a serialized t-digest; null on an empty sketch.
  */
case class PercentileTDigest(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, _: org.apache.spark.sql.types.NumericType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "percentile_tdigest takes (tdigest sketch, numeric percentile)")
    }

  override def nullSafeEval(sk: Any, p: Any): Any = {
    val td = TDigestDouble.heapify(Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    val pd = p match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number                             => n.doubleValue()
    }
    if (td.isEmpty) null else td.getQuantile(pd / 100.0)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PercentileTDigest =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "percentile_tdigest"
}

/** `rank_tdigest(sketch, value)` — the inverse read of the pair: the
  * estimated PERCENTAGE of sketched values ≤ `value` (ADX returns the
  * rank scaled to 0..100, the percentile_tdigest dual). Null on an empty
  * sketch, like the quantile read.
  */
case class RankTDigest(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, _: org.apache.spark.sql.types.NumericType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "rank_tdigest takes (tdigest sketch, numeric value)")
    }

  override def nullSafeEval(sk: Any, v: Any): Any = {
    val td = TDigestDouble.heapify(Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    val vd = v match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number                             => n.doubleValue()
    }
    if (td.isEmpty) null else td.getRank(vd) * 100.0
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RankTDigest =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "rank_tdigest"
}
