package graft.functions.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitter) sketch columns — the batch twin of the
  * streaming space-saving counters, same two-level shape as the HLL and
  * t-digest families: `freq(x)` per fine group, `freq_merge(sketch)` when
  * rolling up, `freq_topk(sketch, k)` to read the result. DataSketches
  * `ItemsSketch[String]` with maxMapSize 512: until ~342 distinct keys
  * per sketch no evictions occur and counts are EXACT; past that the
  * (lower, upper) bounds carry the error — the read emits both so a gate
  * can assert tightness. Mergeable and insert-order independent at the
  * exact regime — the 100 TB top-k contract.
  */
case class FreqAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq requires a string argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](FreqOps.MaxMapSize)

  override def update(b: ItemsSketch[String], row: InternalRow): ItemsSketch[String] = {
    val v = child.eval(row)
    if (v != null) b.update(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: ItemsSketch[String], o: ItemsSketch[String]): ItemsSketch[String] = {
    b.merge(o); b
  }

  override def eval(b: ItemsSketch[String]): Any = FreqOps.toBytes(b)
  override def serialize(b: ItemsSketch[String]): Array[Byte] = FreqOps.toBytes(b)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] = FreqOps.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean  = false

  override def withNewMutableAggBufferOffset(n: Int): FreqAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqAgg =
    copy(child = newChild)

  override def prettyName: String = "freq"
}

/** Roll-up of serialized frequent-items sketches. */
case class FreqMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_merge requires a freq sketch column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](FreqOps.MaxMapSize)

  override def update(b: ItemsSketch[String], row: InternalRow): ItemsSketch[String] = {
    val v = child.eval(row)
    if (v != null) b.merge(FreqOps.fromBytes(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: ItemsSketch[String], o: ItemsSketch[String]): ItemsSketch[String] = {
    b.merge(o); b
  }

  override def eval(b: ItemsSketch[String]): Any = FreqOps.toBytes(b)
  override def serialize(b: ItemsSketch[String]): Array[Byte] = FreqOps.toBytes(b)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] = FreqOps.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean  = false

  override def withNewMutableAggBufferOffset(n: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)

  override def prettyName: String = "freq_merge"
}

/** `freq_topk(sketch, k)` — JSON array of the k heaviest items, each
  * `{"item":…,"est":…,"lb":…,"ub":…}`, heaviest first (ties by item for a
  * deterministic text). NO_FALSE_POSITIVES: every emitted item's true
  * count exceeds the eviction error bound.
  */
case class FreqTopK(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, org.apache.spark.sql.types.IntegerType |
                        org.apache.spark.sql.types.LongType |
                        org.apache.spark.sql.types.ShortType |
                        org.apache.spark.sql.types.ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "freq_topk takes (freq sketch, integer k)")
    }

  override def nullSafeEval(sk: Any, kv: Any): Any = {
    val k = kv.asInstanceOf[Number].intValue()
    if (k <= 0) return null
    val sketch = FreqOps.fromBytes(sk.asInstanceOf[Array[Byte]])
    val rows = sketch.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
    val top = rows.sortBy(r => (-r.getEstimate, r.getItem)).take(k)
    val sb = new java.lang.StringBuilder("[")
    var i = 0
    while (i < top.length) {
      val r = top(i)
      if (i > 0) sb.append(',')
      sb.append("{\"item\":\"").append(r.getItem.replace("\\", "\\\\").replace("\"", "\\\""))
        .append("\",\"est\":").append(r.getEstimate)
        .append(",\"lb\":").append(r.getLowerBound)
        .append(",\"ub\":").append(r.getUpperBound).append('}')
      i += 1
    }
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqTopK =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "freq_topk"
}

object FreqOps {

  /** Power of two; exact counts until maxMapSize × 0.75 − ε distinct keys. */
  val MaxMapSize = 512

  private val serde = new ArrayOfStringsSerDe()

  def toBytes(s: ItemsSketch[String]): Array[Byte] = s.toByteArray(serde)

  def fromBytes(b: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(b), serde)
}
