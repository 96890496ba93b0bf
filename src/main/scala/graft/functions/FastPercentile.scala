package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Minimal primitive long->long open-addressing count map (Spark's
  * specialized OpenHashMap is private[spark]); power-of-two capacity,
  * linear probing, 0.5 max load. Zero boxing on update/merge.
  */
final class LongCountMap(initialCapacity: Int = 64) extends Serializable {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  private def idxOf(k: Long): Int = {
    var i = (java.lang.Long.hashCode(k) * 0x9E3779B9) & (cap - 1)
    while (used(i) && keys(i) != k) i = (i + 1) & (cap - 1)
    i
  }

  def add(k: Long, c: Long): Unit = {
    val i = idxOf(k)
    if (used(i)) vals(i) += c
    else {
      used(i) = true; keys(i) = k; vals(i) = c; n += 1
      if (n * 2 > cap) grow()
    }
  }

  def get(k: Long): Long = { val i = idxOf(k); if (used(i)) vals(i) else 0L }

  def foreachPair(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) { if (used(i)) f(keys(i), vals(i)); i += 1 }
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used; val ocap = cap
    cap = cap * 2
    keys = new Array[Long](cap); vals = new Array[Long](cap)
    used = new Array[Boolean](cap); n = 0
    var i = 0
    while (i < ocap) { if (ou(i)) add(ok(i), ov(i)); i += 1 }
  }
}

/** Exact interpolating percentile over DOUBLE inputs with a
  * primitive-key buffer (optimization round 18).
  *
  * Bitwise-identical drop-in for Spark's [[org.apache.spark.sql.
  * catalyst.expressions.aggregate.Percentile]] in its dominant shape —
  * double child, unit frequency, non-reverse, foldable percentage —
  * substituted by [[graft.sql.MergePercentiles]]. Spark's buffer is an
  * `OpenHashMap[AnyRef, Long]`: every update boxes the double, hashes a
  * boxed key, and eval sorts boxed tuples through `Seq.sortBy`. This
  * buffer keys the map by `doubleToLongBits` (primitive-specialized
  * OpenHashMap — no boxing, and the bits preserve exactly the
  * distinctions the boxed path makes: `-0.0` and `0.0` stay separate
  * keys, all NaNs collapse to one, matching `java.lang.Double.equals`),
  * and eval sorts a primitive double[] (`Arrays.sort` total order =
  * Spark's `PhysicalDataType.ordering` for doubles: -0.0 < 0.0, NaN
  * last).
  *
  * The rank arithmetic replicates `PercentileBase.getPercentile`
  * operation-for-operation (verified against the 4.1.2 bytecode):
  * `position = (N-1).toDouble * p`; lower/higher = floor/ceil; keys at
  * accumulated-count ranks via the same `Arrays.binarySearch` insertion
  * -point fold; equal-key short-circuit via bits equality (boxed
  * `Double.equals` semantics); interpolation
  * `(higher - position) * lowerKey + (position - lower) * higherKey`.
  */
case class FastPercentileDouble(
    child: Expression,
    percentageExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongCountMap] {

  override def children: Seq[Expression] = Seq(child, percentageExpression)

  private lazy val returnArray: Boolean =
    percentageExpression.dataType.isInstanceOf[ArrayType]

  private lazy val percentages: Array[Double] =
    percentageExpression.eval() match {
      case d: java.lang.Double => Array(d.doubleValue())
      case arr: ArrayData => arr.toDoubleArray()
      case other => throw new IllegalStateException(
        s"fast_percentile percentage must be a foldable double or " +
          s"array<double>, got $other")
    }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a DOUBLE child, got " +
          child.dataType.simpleString)
    else if (!percentageExpression.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable percentage")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false)
    else DoubleType

  override def nullable: Boolean = true
  override def prettyName: String = "fast_percentile"

  override def createAggregationBuffer(): LongCountMap = new LongCountMap()

  override def update(buffer: LongCountMap,
                      input: InternalRow): LongCountMap = {
    val v = child.eval(input)
    if (v != null) {
      // doubleToLongBits canonicalizes every NaN to one pattern and
      // keeps -0.0 distinct from 0.0 — Double.equals key semantics
      buffer.add(java.lang.Double.doubleToLongBits(
        v.asInstanceOf[java.lang.Double].doubleValue()), 1L)
    }
    buffer
  }

  override def merge(buffer: LongCountMap,
                     other: LongCountMap): LongCountMap = {
    other.foreachPair((k, c) => buffer.add(k, c))
    buffer
  }

  private def binarySearchCount(accum: Array[Long], v: Long): Int = {
    val r = java.util.Arrays.binarySearch(accum, 0, accum.length, v)
    if (r < 0) -(r + 1) else r
  }

  override def eval(buffer: LongCountMap): Any = {
    val m = buffer.size
    if (m == 0) return null
    val keys = new Array[Double](m)
    var i = 0
    buffer.foreachPair { (k, _) =>
      keys(i) = java.lang.Double.longBitsToDouble(k); i += 1
    }
    java.util.Arrays.sort(keys)
    val accum = new Array[Long](m)
    var total = 0L
    i = 0
    while (i < m) {
      total += buffer.get(java.lang.Double.doubleToLongBits(keys(i)))
      accum(i) = total
      i += 1
    }
    def one(p: Double): Double = {
      val position = (total - 1).toDouble * p
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      val lowerIndex = binarySearchCount(accum, lower + 1)
      val lowerKey = keys(lowerIndex)
      if (higher == lower) return lowerKey
      val higherIndex = binarySearchCount(accum, higher + 1)
      val higherKey = keys(higherIndex)
      if (java.lang.Double.doubleToLongBits(higherKey) ==
          java.lang.Double.doubleToLongBits(lowerKey)) return lowerKey
      (higher - position) * lowerKey + (position - lower) * higherKey
    }
    val out = percentages.map(one)
    if (returnArray) new GenericArrayData(out) else out(0)
  }

  override def serialize(buffer: LongCountMap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    buffer.foreachPair { (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongCountMap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val map = new LongCountMap(n)
    var i = 0
    while (i < n) {
      val k = bb.getLong; val c = bb.getLong
      map.add(k, c)
      i += 1
    }
    map
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): FastPercentileDouble =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): FastPercentileDouble =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FastPercentileDouble =
    copy(child = newChildren(0), percentageExpression = newChildren(1))
}
