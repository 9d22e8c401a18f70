package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, ShortType, ByteType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k sampling sketch — the uniform-distinct-sample member of the
  * mergeable sketch suite (HLL = distinct count, t-digest = quantiles,
  * theta = set algebra, freq = heavy hitters, bottom-k = "give me k
  * representative distinct values"). Keeps the k distinct values whose
  * md5 is smallest: a deterministic, insert-order-independent uniform
  * sample of the distinct domain that merges associatively (union the
  * candidate sets, re-trim to k) — the two-level pre-aggregation shape
  * at 100 TB, and because md5 is a fixed public function the EXACT same
  * sample is computable by any other engine (the DuckDB oracle re-derives
  * it with `ORDER BY md5(v) LIMIT k` and the JSON read hash-matches bit
  * for bit). `sample_bottomk(x, k)` per fine group,
  * `sample_bottomk_merge(sk)` to roll up, `bottomk_values(sk)` to read.
  */
object BottomKOps {

  /** hash-hex → value, bounded to the k smallest hashes. */
  final class BkBuf(var k: Int) {
    val m = new java.util.TreeMap[String, String]()
    def insert(hash: String, value: String): Unit = {
      if (k > 0 && (m.size < k || hash < m.lastKey)) {
        m.put(hash, value)
        while (m.size > k) m.remove(m.lastKey)
      }
    }
    def mergeFrom(o: BkBuf): Unit = {
      if (k == 0) k = o.k
      else if (o.k != 0) require(k == o.k,
        s"sample_bottomk_merge: mixed sketch sizes k=$k vs k=${o.k}")
      val it = o.m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); insert(e.getKey, e.getValue) }
    }
  }

  def md5Hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  def toBytes(b: BkBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.m.size)
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e  = it.next()
      val hb = e.getKey.getBytes(StandardCharsets.UTF_8)
      val vb = e.getValue.getBytes(StandardCharsets.UTF_8)
      out.writeInt(hb.length); out.write(hb)
      out.writeInt(vb.length); out.write(vb)
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): BkBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b  = new BkBuf(in.readInt())
    val n  = in.readInt()
    var i  = 0
    while (i < n) {
      val hb = new Array[Byte](in.readInt()); in.readFully(hb)
      val vb = new Array[Byte](in.readInt()); in.readFully(vb)
      b.m.put(new String(hb, StandardCharsets.UTF_8), new String(vb, StandardCharsets.UTF_8))
      i += 1
    }
    b
  }

  def litK(e: Expression, name: String): Int = {
    require(e.foldable, s"$name: k must be a literal integer")
    val v = e.eval(null)
    require(v != null, s"$name: k must not be null")
    val k = v.asInstanceOf[Number].intValue()
    require(k > 0 && k <= 65536, s"$name: k must be in [1, 65536], got $k")
    k
  }
}

/** `sample_bottomk(value, k)` — build a bottom-k distinct sample per group. */
case class SampleBottomKAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKOps.BkBuf] with BinaryLike[Expression] {

  private lazy val k = BottomKOps.litK(right, "sample_bottomk")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType | LongType | ShortType | ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sample_bottomk takes (string value, integer k)")
    }

  override def createAggregationBuffer(): BottomKOps.BkBuf = new BottomKOps.BkBuf(k)

  override def update(b: BottomKOps.BkBuf, row: InternalRow): BottomKOps.BkBuf = {
    val v = left.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      b.insert(BottomKOps.md5Hex(s), s)
    }
    b
  }

  override def merge(b: BottomKOps.BkBuf, o: BottomKOps.BkBuf): BottomKOps.BkBuf = {
    b.mergeFrom(o); b
  }

  override def eval(b: BottomKOps.BkBuf): Any = BottomKOps.toBytes(b)
  override def serialize(b: BottomKOps.BkBuf): Array[Byte] = BottomKOps.toBytes(b)
  override def deserialize(bytes: Array[Byte]): BottomKOps.BkBuf = BottomKOps.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean  = false

  override def withNewMutableAggBufferOffset(n: Int): SampleBottomKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SampleBottomKAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SampleBottomKAgg =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sample_bottomk"
}

/** `sample_bottomk_merge(sketch)` — roll up serialized bottom-k sketches. */
case class SampleBottomKMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKOps.BkBuf] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sample_bottomk_merge requires a bottom-k sketch column, got ${child.dataType.catalogString}")

  // k = 0 means "adopt the first sketch's k" — the merge side cannot know
  // the build side's k until it sees a sketch
  override def createAggregationBuffer(): BottomKOps.BkBuf = new BottomKOps.BkBuf(0)

  override def update(b: BottomKOps.BkBuf, row: InternalRow): BottomKOps.BkBuf = {
    val v = child.eval(row)
    if (v != null) b.mergeFrom(BottomKOps.fromBytes(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: BottomKOps.BkBuf, o: BottomKOps.BkBuf): BottomKOps.BkBuf = {
    b.mergeFrom(o); b
  }

  override def eval(b: BottomKOps.BkBuf): Any = BottomKOps.toBytes(b)
  override def serialize(b: BottomKOps.BkBuf): Array[Byte] = BottomKOps.toBytes(b)
  override def deserialize(bytes: Array[Byte]): BottomKOps.BkBuf = BottomKOps.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean  = false

  override def withNewMutableAggBufferOffset(n: Int): SampleBottomKMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SampleBottomKMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): SampleBottomKMergeAgg =
    copy(child = newChild)

  override def prettyName: String = "sample_bottomk_merge"
}

/** `bottomk_values(sketch)` — JSON array of the sampled values, hash order
  * (i.e. uniformly shuffled but deterministic), escaped like freq_topk.
  */
case class BottomKValues(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottomk_values requires a bottom-k sketch column, got ${child.dataType.catalogString}")

  override def nullSafeEval(sk: Any): Any = {
    val b  = BottomKOps.fromBytes(sk.asInstanceOf[Array[Byte]])
    val sb = new java.lang.StringBuilder("[")
    val it = b.m.entrySet().iterator()
    var first = true
    while (it.hasNext) {
      val e = it.next()
      if (!first) sb.append(',')
      first = false
      sb.append('"').append(e.getValue.replace("\\", "\\\\").replace("\"", "\\\"")).append('"')
    }
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): BottomKValues =
    copy(child = newChild)

  override def prettyName: String = "bottomk_values"
}
