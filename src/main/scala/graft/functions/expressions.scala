package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, QuaternaryExpression, UnaryExpression
}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit mixer (SplitMix64, public-domain algorithm from
  * Steele et al., "Fast Splittable Pseudorandom Number Generators").
  * Used to derive per-hash-function / per-hyperplane pseudo-random streams
  * without any runtime RNG state, so every operator is reproducible across
  * executors and runs.
  *
  * All expressions here implement `doGenCode` as a static call into
  * [[Kernels]]: the whole-stage codegen span stays unbroken (no
  * CodegenFallback boxing per row), while the per-element loops run as
  * ordinary compiled JVM code shared with the interpreted path.
  */
object Mix64 {
  final val Gamma = 0x9e3779b97f4a7c15L

  @inline def mix(z0: Long): Long = {
    var z = z0 + Gamma
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** Cosine similarity between two double vectors: dot / (|a| * |b|).
  *
  * Accumulates left-to-right in double precision — bit-for-bit equal to
  * DuckDB's `list_cosine_similarity` over `DOUBLE[]`, which the correctness
  * oracle relies on. A native expression (vs composing `zip_with` +
  * `aggregate`) avoids materializing intermediate arrays per row, which
  * matters when scoring billions of candidate pairs.
  *
  * Capability parity target: similarity search over embedding columns
  * (engine-extension surface; the reference has no vector ops).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers must pass array<double>; Registry builders insert the casts
  override def dataType: DataType = DoubleType
  // null for zero-norm vectors even when inputs are non-nullable;
  // NaN-valued DATA yields a NaN VALUE, not null (see Kernels.cosineOrNull)
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any =
    Kernels.cosineOrNull(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_raw = graft.functions.Kernels.cosineOrNull($a, $b);
         |if (${ev.value}_raw == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_raw.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature over a set of element hashes (array<long> -> array<long>).
  *
  * For each of `numHashes` hash functions i, the signature entry is
  * min over elements x of mix64(x ^ stream_i). One pass over the input per
  * row, O(|elements| * numHashes); no per-row allocation beyond the
  * signature itself. Empty input -> null (a document with no shingles has
  * no signature).
  *
  * Feed it `transform(shingles, s -> xxhash64(s))` so string hashing stays
  * in codegen'd built-ins.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null for empty input even when the input is non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(in: Any): Any = {
    val xs = in.asInstanceOf[ArrayData]
    if (xs.numElements() == 0) null
    else Kernels.minhashSig(xs, numHashes, seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |if ($in.numElements() == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.Kernels.minhashSig($in, $numHashes, ${seed}L); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling window hashes over element hashes (array<long> -> array<long>):
  * entry i is a mix of elements [i, i+k). The numeric equivalent of string
  * k-shingling — same set semantics for MinHash, but no per-shingle string
  * materialization (the dominant cost of shingling at scale).
  * Inputs shorter than k yield one hash over all elements; empty -> null.
  */
case class WindowHashes(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(in: Any): Any = {
    val xs = in.asInstanceOf[ArrayData]
    if (xs.numElements() == 0) null
    else Kernels.windowHashes(xs, k, seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |if ($in.numElements() == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.Kernels.windowHashes($in, $k, ${seed}L); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over element hashes (array<long> -> long).
  *
  * Classic Charikar construction: each element votes +1/-1 per bit of its
  * mixed hash; the fingerprint takes the sign of each bit's tally. Near
  * duplicates land within a small Hamming distance, checked downstream with
  * the built-in `bit_count(a ^ b)`.
  */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  // null for empty input even when the input is non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(in: Any): Any = {
    val xs = in.asInstanceOf[ArrayData]
    if (xs.numElements() == 0) null
    else Kernels.simhash64(xs, seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |if ($in.numElements() == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.Kernels.simhash64($in, ${seed}L); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane sign bits for a double vector (array<double> -> long).
  *
  * Bit b of the result is the sign of the projection of the vector onto a
  * deterministic Rademacher (+1/-1 per dimension) hyperplane derived from
  * (seed, b, dim). Equal buckets => likely-high cosine similarity, the
  * standard SimHash-for-vectors LSH family. Used to shard ANN search and
  * embedding near-dup detection so candidate generation is an equi-join on
  * the bucket key (shuffle on a long, no cross join) at any scale.
  */
case class SignBits(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {

  require(bits > 0 && bits <= 63, "bits must be in 1..63")

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits"

  override def nullSafeEval(in: Any): Any =
    Kernels.signBits(in.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.Kernels.signBits($in, $bits, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) of a string column.
  *
  * Spark ships no normalization builtin; text pipelines need one before
  * any hash-based dedup — the same visible text in composed vs decomposed
  * form hashes differently, so un-normalized corpora leak duplicates past
  * exact and MinHash dedup alike. Backed by java.text.Normalizer (the
  * JDK's Unicode-standard implementation) with a pure-ASCII fast path in
  * [[Kernels.unicodeNormalize]].
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val jform = java.text.Normalizer.Form.valueOf(form.toUpperCase)

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(in: Any): Any =
    Kernels.unicodeNormalize(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], jform)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.Kernels.unicodeNormalize($in, " +
        s"java.text.Normalizer.Form.${jform.name})")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunking (string -> array<string>): Rabin rolling-hash
  * chunk boundaries, the shift-robust dedup unit — see
  * [[Kernels.cdcChunks]] for the boundary rule and the exact-integer /
  * SQL-re-derivability contract. Map-only, codegen'd; the d21 pipeline
  * explodes the result and groups chunk digests.
  */
case class CdcChunks(child: Expression, w: Int, base: Long, div: Long,
                     rem: Long) extends UnaryExpression {

  require(w > 0, "window must be positive")
  require(div > 0 && rem >= 0 && rem < div, "need 0 <= rem < div")
  require(BigInt(0xFFFF) * BigInt(base).pow(w - 1) * w < BigInt(Long.MaxValue),
    s"window sum could overflow a long for (w=$w, base=$base)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(in: Any): Any =
    Kernels.cdcChunks(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      w, base, div, rem)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.Kernels.cdcChunks($in, $w, ${base}L, ${div}L, ${rem}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Point query against a serialized `count_min_sketch` aggregate result:
  * `cms_estimate(sketch BINARY, item BIGINT) -> BIGINT`.
  *
  * Completes the sketch family (HLL++ distinct counts, approximate
  * quantiles, now frequency estimation): build one CMS over the corpus
  * with the built-in merge-order-invariant aggregate — counter addition
  * commutes exactly, so results are deterministic under any partitioning
  * — then probe it in-plan via this expression. CMS guarantees
  * est >= true always and est <= true + eps·N with the aggregate's eps,
  * which ap03 turns into a strict-oracled gate.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sk: Any, item: Any): Any =
    Kernels.cmsEstimate(sk.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, item) =>
      s"graft.functions.Kernels.cmsEstimate($sk, $item)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaro–Winkler string similarity — `jaro_winkler(a, b) -> DOUBLE`,
  * DuckDB-`jaro_winkler_similarity`-exact (see [[Kernels.jaroWinkler]]
  * for the locked algorithm constants). Codegen'd so blocked
  * entity-resolution candidate scoring stays inside the whole-stage
  * span — the kernel is a static call over the operand UTF8Strings.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Kernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact Jaccard over sorted distinct arrays —
  * `jaccard_sorted(a, b) -> DOUBLE` backed by the allocation-free merge
  * scans in [[Kernels]]. The dedup verify stages call this per candidate
  * pair; see the kernels' scaladoc for the preconditions (sorted
  * ascending, distinct, no null elements). String arrays compare by
  * binary UTF8 order; BIGINT arrays (the hashGrams verify tier — no
  * per-gram string ever materializes) by signed long order — both the
  * order `sort_array` produces.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  private def longElems: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (longElems)
      Kernels.jaccardSortedLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      Kernels.jaccardSorted(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (longElems) "jaccardSortedLong" else "jaccardSorted"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Kernels.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** IEEE-754 `copysign`: |a| with the SIGN BIT of b — numpy semantics,
  * where a negative-zero or sign-bit-set-NaN second operand makes the
  * result negative. A predicate like `b >= 0` cannot see the sign bit
  * (`-0.0 >= 0` is true), so this delegates to `java.lang.Math.copySign`,
  * which reads the raw bit. Registry wraps both children in
  * `Cast(_, DoubleType)`; output is always double (numpy promotes
  * copysign to float64).
  */
case class NpCopySign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "np_copysign"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Math.copySign(a.asInstanceOf[Double], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.copySign($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** numpy `floor_divide`: floors the quotient (−7//2 = −4 where SQL `div`
  * truncates to −3) and follows numpy's output-type rule — long when BOTH
  * operands are integral, double when either is floating/decimal. The
  * type rule needs the RESOLVED child types, which a Registry builder
  * never sees (it runs on unresolved attributes), so the branch lives in
  * `dataType` here. Division by zero is null (SQL semantics, documented
  * divergence from numpy's warn-and-inf). Non-numeric operands are
  * rejected at analysis time.
  */
case class NpFloorDivide(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.GraftNumericBinaryCoercion {
  // the mixin supplies the numeric type check AND the coercions Spark
  // arithmetic gets for free: NULL-typed literals (np.floor_divide(NULL,
  // 2)) become typed nulls and numeric strings cast to double, instead
  // of failing analysis (ADVICE r10)

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def dataType: DataType =
    if (integral(left.dataType) && integral(right.dataType)) LongType
    else DoubleType

  // null on division by zero even for non-nullable inputs
  override def nullable: Boolean = true
  override def prettyName: String = "np_floor_divide"

  private def toD(v: Any): Double = v match {
    case b: Byte => b.toDouble
    case s: Short => s.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case f: Float => f.toDouble
    case d: Double => d
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
  }

  // integral path only (dataType == LongType guarantees both children
  // integral), so this is always a widening, never a rounding
  private def toL(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (dataType == LongType) Kernels.floorDivLong(toL(a), toL(b))
    else Kernels.floorDivDouble(toD(a), toD(b))

  private def toDoubleJava(dt: DataType, v: String): String = dt match {
    case _: DecimalType => s"$v.toDouble()"
    case _ => s"(double)($v)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (box, call, unbox) =
        if (dataType == LongType)
          ("java.lang.Long",
            // exact long path — (long) on an integral operand widens
            s"graft.functions.Kernels.floorDivLong((long)($a), (long)($b))",
            "longValue")
        else
          ("java.lang.Double",
            s"graft.functions.Kernels.floorDivDouble(" +
              s"${toDoubleJava(left.dataType, a)}, " +
              s"${toDoubleJava(right.dataType, b)})",
            "doubleValue")
      s"""
         |$box ${ev.value}_raw = $call;
         |if (${ev.value}_raw == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_raw.$unbox(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `point_in_polygon(px, py, xs, ys)` — exact integer ray casting
  * (geo06): is the point inside the polygon whose vertices are the
  * parallel coordinate arrays? Crossing parity with the half-open edge
  * rule and cross-multiplied integer intersections — no float anywhere,
  * so any engine re-derives identical verdicts from the same arithmetic
  * (see [[Kernels.pointInPolygon]] for the boundary contract). Codegen'd
  * via a static kernel call; the polygon usually arrives as a broadcast
  * literal/column, so evaluation is map-only.
  */
case class PointInPolygon(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"

  override def nullSafeEval(px: Any, py: Any, xs: Any, ys: Any): Any =
    Kernels.pointInPolygon(px.asInstanceOf[Long], py.asInstanceOf[Long],
      xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (px, py, xs, ys) =>
      s"graft.functions.Kernels.pointInPolygon($px, $py, $xs, $ys)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** `array_sum_exact(arr)` / `array_avg_exact(arr)` — the order-free
  * exact fold behind `sum/avg(DISTINCT x) OVER spec` (w22): the dialect
  * lowers the DISTINCT window aggregate onto this fold over
  * `collect_set(x) OVER spec`, and because integer/decimal addition is
  * associative-commutative EXACT, the set's nondeterministic element
  * order cannot change the answer. Float element types REFUSE at
  * analysis time (checkInputDataTypes) — a float re-fold is not
  * reproducibly ordered against a native engine's sum, exactly the
  * reason the w18 refusal documented. Semantics mirror SQL aggregates:
  * null elements skip, an empty/all-null array yields NULL. Sum
  * overflow is loud (Math.addExact / Decimal precision check); avg is
  * the exact sum cast to double once, divided once — a single IEEE
  * rounding against DuckDB's double accumulation, identical while the
  * sum is double-exact (< 2^53, the fixture discipline).
  */
case class ArrayFoldExact(child: Expression, isAvg: Boolean)
    extends UnaryExpression {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: ByteType | _: ShortType | _: IntegerType |
                   _: LongType | _: DecimalType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} supports integral and decimal element types, got " +
        s"${other.simpleString} — a float DISTINCT re-fold is not " +
        "reproducibly ordered; cast the argument to DECIMAL explicitly " +
        "if one rounding is acceptable")
  }

  override def dataType: DataType =
    if (isAvg) DoubleType
    else elementType match {
      // the widened exact accumulator types (Spark's Sum discipline)
      case d: DecimalType => DecimalType(38, d.scale)
      case _ => LongType
    }

  // empty / all-null input folds to NULL (SQL aggregate semantics)
  override def nullable: Boolean = true
  override def prettyName: String =
    if (isAvg) "array_avg_exact" else "array_sum_exact"

  /** 0 = byte, 1 = short, 2 = int, 3 = long, 4 = decimal. */
  private lazy val kind: Int = elementType match {
    case _: ByteType => 0
    case _: ShortType => 1
    case _: IntegerType => 2
    case _: LongType => 3
    case _: DecimalType => 4
  }

  private lazy val (decP, decS) = elementType match {
    case d: DecimalType => (d.precision, d.scale)
    case _ => (0, 0)
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (isAvg) Kernels.arrayAvgExact(arr, kind, decP, decS)
    else if (kind == 4) Kernels.arraySumExactDecimal(arr, decP, decS)
    else Kernels.arraySumExactLong(arr, kind)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (call, box, unbox) =
        if (isAvg)
          (s"graft.functions.Kernels.arrayAvgExact($a, $kind, $decP, $decS)",
            "java.lang.Double", "doubleValue")
        else if (kind == 4)
          (s"graft.functions.Kernels.arraySumExactDecimal($a, $decP, $decS)",
            "org.apache.spark.sql.types.Decimal", "")
        else
          (s"graft.functions.Kernels.arraySumExactLong($a, $kind)",
            "java.lang.Long", "longValue")
      val assign =
        if (unbox.isEmpty) s"${ev.value} = ${ev.value}_raw;"
        else s"${ev.value} = ${ev.value}_raw.$unbox();"
      s"""
         |$box ${ev.value}_raw = $call;
         |if (${ev.value}_raw == null) { ${ev.isNull} = true; }
         |else { $assign }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DuckDB's polymorphic `len()` (q71): element count for arrays/maps,
  * string/binary length otherwise — Spark's builtin `len` is a pure
  * `length` alias and refuses arrays, but DuckDB list comprehensions
  * make `len([...])` a natural spelling. RuntimeReplaceable: the
  * analyzer swaps in Size/Length after the child resolves, so codegen
  * and evaluation are exactly the native expressions'.
  */
case class LenPoly(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[
      org.apache.spark.sql.catalyst.expressions.Expression] {
  import org.apache.spark.sql.catalyst.expressions.{Length, Size}

  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
    case _ => Length(child)
  }
  override def prettyName: String = "len"
  override protected def withNewChildInternal(
      newChild: Expression): LenPoly = copy(child = newChild)
}
