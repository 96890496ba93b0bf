package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `sum_distinct_exact(x)` / `avg_distinct_exact(x)` — the window
  * AGGREGATE behind `sum/avg(DISTINCT x) OVER spec` (w22). The DISTINCT
  * set lives in the aggregation buffer and the order-free exact fold
  * runs ONCE at eval — so Spark's UnboundedWindowFunctionFrame pays
  * O(partition) total for a whole-partition spec where the previous
  * lowering (`array_sum_exact(collect_set(x) OVER spec)`) folded an
  * identical per-partition array once PER ROW: O(rows × distinct), the
  * round-18 bench caught it at 8.3 s for one column over 21 k rows
  * whose partitions held ~7 k distinct decimals. Bounded frames
  * re-accumulate per row exactly like collect_set does (no retraction
  * path for typed buffers) — equal cost, minus the per-row fold.
  *
  * Semantics mirror [[ArrayFoldExact]] (the EXCLUDE collect-split
  * paths still ride that fold): null inputs skip, an empty/all-null
  * frame yields NULL, integral sums accumulate in Long with loud
  * overflow (Math.addExact), decimal sums in BigDecimal re-checked
  * into DECIMAL(38, s), avg is the exact sum cast to double once and
  * divided once. Float inputs refuse at analysis time — a float
  * re-fold is not reproducibly ordered. Integer/decimal addition is
  * associative-commutative EXACT, so the set's iteration order cannot
  * change the answer.
  */
case class SumDistinctExact(
    child: Expression,
    isAvg: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashSet[Any]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName supports integral and decimal inputs, got " +
        s"${other.simpleString} — a float DISTINCT re-fold is not " +
        "reproducibly ordered; cast the argument to DECIMAL explicitly " +
        "if one rounding is acceptable")
  }

  override def dataType: DataType =
    if (isAvg) DoubleType
    else child.dataType match {
      // the widened exact accumulator types (Spark's Sum discipline)
      case d: DecimalType => DecimalType(38, d.scale)
      case _ => LongType
    }

  override def nullable: Boolean = true
  override def prettyName: String =
    if (isAvg) "avg_distinct_exact" else "sum_distinct_exact"

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty[Any]

  override def update(buffer: mutable.HashSet[Any],
                      input: InternalRow): mutable.HashSet[Any] = {
    val v = child.eval(input)
    if (v != null) buffer += v
    buffer
  }

  override def merge(buffer: mutable.HashSet[Any],
                     other: mutable.HashSet[Any]): mutable.HashSet[Any] =
    buffer ++= other

  private lazy val outScale: Int = child.dataType match {
    case d: DecimalType => d.scale
    case _ => 0
  }

  override def eval(buffer: mutable.HashSet[Any]): Any = {
    if (buffer.isEmpty) return null
    child.dataType match {
      case _: DecimalType =>
        var acc = java.math.BigDecimal.ZERO
        buffer.foreach { v =>
          acc = acc.add(v.asInstanceOf[Decimal].toJavaBigDecimal)
        }
        if (isAvg) acc.doubleValue() / buffer.size
        else {
          val d = Decimal(acc)
          if (!d.changePrecision(38, outScale)) throw new ArithmeticException(
            s"$prettyName overflowed DECIMAL(38, $outScale)")
          d
        }
      case _ =>
        var acc = 0L
        buffer.foreach { v =>
          val l = v match {
            case b: java.lang.Byte => b.longValue()
            case s: java.lang.Short => s.longValue()
            case i: java.lang.Integer => i.longValue()
            case l: java.lang.Long => l.longValue()
          }
          acc = Math.addExact(acc, l)
        }
        if (isAvg) acc.toDouble / buffer.size else acc
    }
  }

  // only exercised on a partial-aggregation shuffle (never by window
  // evaluation, which holds buffers in memory) — plain Java
  // serialization of the boxed Long/Decimal elements is sufficient
  override def serialize(buffer: mutable.HashSet[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(buffer.toArray)
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val arr = ois.readObject().asInstanceOf[Array[Any]]
    ois.close()
    mutable.HashSet(arr.toIndexedSeq: _*)
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): SumDistinctExact =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): SumDistinctExact =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SumDistinctExact =
    copy(child = newChildren.head)
}
