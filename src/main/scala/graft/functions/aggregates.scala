package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: binary min-heap of (score, id) capped at k.
  * Worst element at the head; a candidate enters iff it beats the head.
  * Ties on score break toward the SMALLER id (deterministic results
  * regardless of partitioning / merge order).
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true if (s1,id1) is worse (ranks lower) than (s2,id2) */
  @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 < s2 || (s1 == s2 && id1 > id2)

  def add(s: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      var i = size - 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown()
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  /** (score, id) pairs best-first; ties by ascending id. */
  def sortedDesc: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
}

/** Top-k by score as a typed imperative aggregate.
  *
  * `topk_by(score, id, k)` keeps only k (score,id) pairs in the partial
  * and final aggregation buffers, so a top-k over N scored candidates
  * shuffles O(k × partitions) values instead of N — the difference between
  * a workable and an impossible ANN/top-k at the 100 TB design point
  * (a window `row_number() <= k` shuffles every scored row).
  *
  * Output: array<struct<sim double, id bigint>> best-first, ties broken by
  * ascending id so results are independent of partitioning.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sim", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buf.add(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKHeap(k)
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_by"
}


/** Element-wise vector sum buffer: dimension fixed by the first vector
  * seen; nulls skipped; dimension mismatches rejected (a corpus with
  * ragged embeddings is a data bug worth failing loudly on). Long and
  * double accumulators are separate so the long tier stays EXACT
  * integer arithmetic (order-independent) instead of losing bits to a
  * double accumulator.
  */
final class VecSumBuf(var dsums: Array[Double], var lsums: Array[Long]) {
  def addD(xs: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
    val n = xs.numElements()
    if (dsums == null) dsums = new Array[Double](n)
    require(dsums.length == n,
      s"vec_sum: dimension mismatch (${dsums.length} vs $n)")
    var i = 0
    while (i < n) { dsums(i) += xs.getDouble(i); i += 1 }
  }
  def addL(xs: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
    val n = xs.numElements()
    if (lsums == null) lsums = new Array[Long](n)
    require(lsums.length == n,
      s"vec_sum_long: dimension mismatch (${lsums.length} vs $n)")
    var i = 0
    while (i < n) { lsums(i) = Math.addExact(lsums(i), xs.getLong(i)); i += 1 }
  }
  def mergeFrom(o: VecSumBuf): Unit = {
    if (o.dsums != null) {
      if (dsums == null) dsums = o.dsums.clone()
      else {
        require(dsums.length == o.dsums.length, "vec_sum: dimension mismatch on merge")
        var i = 0
        while (i < dsums.length) { dsums(i) += o.dsums(i); i += 1 }
      }
    }
    if (o.lsums != null) {
      if (lsums == null) lsums = o.lsums.clone()
      else {
        require(lsums.length == o.lsums.length, "vec_sum_long: dimension mismatch on merge")
        var i = 0
        while (i < lsums.length) { lsums(i) = Math.addExact(lsums(i), o.lsums(i)); i += 1 }
      }
    }
  }
}

/** Element-wise vector sum as a typed imperative aggregate — the k-means
  * update step (and any centroid/mean-embedding computation) as ONE
  * aggregation: `vec_sum(embedding)` per group shuffles a single
  * dims-length array per (group, partition) thanks to partial
  * aggregation, where the posexplode-and-regroup formulation shuffles
  * dims x rows exploded rows — the difference between a map-side-combined
  * agg and a corpus-sized shuffle at the 100 TB design point.
  *
  * `isLong = true`: array<long> in, array<long> out (fixed-point-scaled
  * vectors) — integer addition is exact and overflow-checked, so the
  * result is independent of partitioning / merge order: the determinism
  * tier for oracle-checked centroids. `isLong = false`: array<double> in
  * and out (the production path for float embeddings; float-sum order
  * sensitivity is inherent). Empty/all-null input -> null.
  */
case class VecSumAgg(
    child: Expression,
    isLong: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(if (isLong) LongType else DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf(null, null)

  override def update(buf: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (isLong) buf.addL(arr) else buf.addD(arr)
    }
    buf
  }

  override def merge(buf: VecSumBuf, other: VecSumBuf): VecSumBuf = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: VecSumBuf): Any =
    if (isLong) { if (buf.lsums == null) null else new GenericArrayData(buf.lsums) }
    else { if (buf.dsums == null) null else new GenericArrayData(buf.dsums) }

  override def serialize(buf: VecSumBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (isLong) {
      val n = if (buf.lsums == null) -1 else buf.lsums.length
      out.writeInt(n)
      var i = 0
      while (i < (if (n < 0) 0 else n)) { out.writeLong(buf.lsums(i)); i += 1 }
    } else {
      val n = if (buf.dsums == null) -1 else buf.dsums.length
      out.writeInt(n)
      var i = 0
      while (i < (if (n < 0) 0 else n)) { out.writeDouble(buf.dsums(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n < 0) new VecSumBuf(null, null)
    else if (isLong) {
      val a = new Array[Long](n)
      var i = 0
      while (i < n) { a(i) = in.readLong(); i += 1 }
      new VecSumBuf(null, a)
    } else {
      val a = new Array[Double](n)
      var i = 0
      while (i < n) { a(i) = in.readDouble(); i += 1 }
      new VecSumBuf(a, null)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = if (isLong) "vec_sum_long" else "vec_sum"
}
