package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Shared evaluation kernels for the custom expressions — called both
  * from the interpreted `nullSafeEval` paths and from generated code
  * (`doGenCode` emits a static call here), so whole-stage codegen spans
  * stay unbroken while the per-element loops run as ordinary compiled
  * JVM code. Scala object methods get static forwarders, so generated
  * Java can call `graft.functions.Kernels.cosineOrNull(...)` directly.
  */
object Kernels {

  /** Cosine similarity; null (boxed) encodes the zero-norm case only.
    * NaN values in the INPUT propagate to a NaN RESULT, and the NaN check
    * runs FIRST: a NaN in either vector wins over the other side's
    * zero-norm null sentinel, so "vector has no direction" and "vector
    * contains NaN data" stay distinguishable downstream even when both
    * conditions occur in one pair. The box is allocated once per
    * non-null row and is escape-analysis-friendly.
    */
  def cosineOrNull(l: ArrayData, r: ArrayData): java.lang.Double = {
    val a = l.toDoubleArray()
    val b = r.toDoubleArray()
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i)
      na += a(i) * a(i)
      nb += b(i) * b(i)
      i += 1
    }
    if (na != na || nb != nb) java.lang.Double.valueOf(Double.NaN)
    else if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** MinHash signature; caller must handle the empty-input null case. */
  def minhashSig(in: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val xs = in.toLongArray()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < xs.length) {
      val x = xs(j)
      var i = 0
      while (i < numHashes) {
        val v = Mix64.mix(x ^ (seed + Mix64.Gamma * (i + 1)))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Rolling window hashes; caller must handle the empty-input null case. */
  def windowHashes(in: ArrayData, k: Int, seed: Long): ArrayData = {
    val xs = in.toLongArray()
    val kk = math.min(k, xs.length)
    val n = xs.length - kk + 1
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = seed
      var j = 0
      while (j < kk) {
        h = Mix64.mix(h ^ xs(i + j))
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash; caller must handle the empty-input null case. */
  def simhash64(in: ArrayData, seed: Long): Long = {
    val xs = in.toLongArray()
    val tally = new Array[Int](64)
    var j = 0
    while (j < xs.length) {
      val h = Mix64.mix(xs(j) ^ seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Random-hyperplane sign bits. */
  def signBits(in: ArrayData, bits: Int, seed: Long): Long = {
    val v = in.toDoubleArray()
    var out = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      var j = 0
      while (j < v.length) {
        // lowest bit of the mixed stream selects +1 / -1 for this coordinate
        val sign = if ((Mix64.mix(seed + b.toLong * 1048573L + j) & 1L) == 1L) 1.0 else -1.0
        s += sign * v(j)
        j += 1
      }
      if (s > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Unicode normalization with an ASCII fast path: every normal form is
    * the identity on pure-ASCII bytes, so mostly-ASCII corpora skip the
    * UTF8String -> String -> normalize -> UTF8String round-trip entirely
    * (a byte scan per row instead of two allocations).
    */
  def unicodeNormalize(s: org.apache.spark.unsafe.types.UTF8String,
                       form: java.text.Normalizer.Form)
      : org.apache.spark.unsafe.types.UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { ascii = s.getByte(i) >= 0; i += 1 }
    if (ascii) s
    else {
      // second fast path for non-ASCII but already-normalized rows: the
      // UAX #15 quick-check skips the normalize + re-encode allocations
      val j = s.toString
      if (java.text.Normalizer.isNormalized(j, form)) s
      else org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize(j, form))
    }
  }

  /** Exact Jaccard over two SORTED, DISTINCT, null-free string arrays:
    * one linear merge scan counting the intersection, union derived as
    * na + nb − inter. Replaces the array_intersect + array_union
    * formulation in the dedup verify stages — those build a hash set of
    * UTF8Strings per PAIR, and the verify constant multiplies candidate
    * volume; the merge scan is allocation-free binary comparisons.
    * Preconditions are the callers' contract (array_distinct +
    * sort_array, which orders by the same UTF8String binary comparison
    * used here). Both-empty input returns NaN, matching 0/0 double
    * division in the old formulation.
    */
  /** [[jaccardSorted]] over sorted distinct BIGINT arrays (the hashGrams
    * verify tier): identical merge scan with primitive long compares —
    * no UTF8String indirection per element.
    */
  def jaccardSortedLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) Double.NaN else inter.toDouble / union
  }

  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) Double.NaN else inter.toDouble / union
  }

  /** Jaro–Winkler similarity over UTF-8 BYTES, matching DuckDB's
    * `jaro_winkler_similarity` bit-for-bit (validated against 7000
    * random pairs, zero double-bit mismatches): match window
    * max(l1,l2)/2 − 1, greedy left-to-right matching, transpositions
    * halved with integer division, jaro = (m/l1 + m/l2 + (m−t)/m)/3 in
    * exactly that association, and the Winkler prefix boost (≤4 chars,
    * scale 0.1) applied only when jaro exceeds 0.7. Either side empty →
    * 0.0 (DuckDB's convention; the textbook 1.0 for both-empty is NOT
    * used). Byte-level comparison means multi-byte code points count
    * per byte — callers feed ASCII identifiers/names (the entity-
    * resolution use), where bytes and characters coincide.
    *
    * Allocation: two boolean flag arrays sized to the inputs; no boxing.
    * O(l1·window) — for blocked candidate pairs (short names) this is
    * tens of comparisons per pair, safely inside a codegen span.
    */
  def jaroWinkler(a: org.apache.spark.unsafe.types.UTF8String,
                  b: org.apache.spark.unsafe.types.UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val lim = math.min(4, math.min(l1, l2))
      while (l < lim && s1(l) == s2(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Point query against a serialized Spark `CountMinSketch` (the binary
    * produced by the built-in `count_min_sketch` aggregate). The sketch
    * deserializes per call — callers probe a handful of keys against one
    * broadcast sketch row, so the parse cost is per-probe, not per-corpus
    * (the corpus-side work happened inside the aggregate). Long-keyed:
    * the aggregate hashes integral types by their long value.
    */
  def cmsEstimate(sketch: Array[Byte], item: Long): Long =
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketch))
      .estimateCount(java.lang.Long.valueOf(item))

  /** numpy floor division, integer out (`int // int` in numpy) — EXACT
    * long arithmetic (`Math.floorDiv`), never through double: a double
    * round-trip is off by one for |operands| >= 2^53, and 64-bit
    * hash/id columns live up there. Division by zero yields null — SQL
    * semantics, matching Spark's non-ANSI `Divide` (numpy raises/warns
    * here; null is the engine's documented divergence for all division
    * operators).
    */
  def floorDivLong(a: Long, b: Long): java.lang.Long =
    if (b == 0L) null
    else java.lang.Long.valueOf(Math.floorDiv(a, b))

  /** numpy floor division, float out (any float operand in numpy). */
  def floorDivDouble(a: Double, b: Double): java.lang.Double =
    if (b == 0.0) null
    else java.lang.Double.valueOf(math.floor(a / b))

  /** Content-defined chunk split (d21): Rabin-style rolling window hash —
    * a boundary falls AFTER position i (1-based end) when
    * `Σ_{j=0..w-1} code(s[i−j]) · base^j  ≡  rem (mod div)`, and the
    * chunks are the substrings between consecutive boundaries plus the
    * tail. The window sees the raw text regardless of earlier
    * boundaries, so an insertion re-synchronizes within w characters —
    * the shift-robustness that makes CDC the right dedup unit where
    * line/offset segmentation (d06) breaks.
    *
    * Exactness contract: NO modulus inside the chain — the window sum
    * is bounded by 0xFFFF · base^(w−1) · w (< 2^63 for the shipped
    * w=8, base=31), and the rolling update (drop · base^(w−1), shift,
    * add) stays inside the same bound, so the longs are exact and the
    * SQL oracle re-derives identical boundaries from the same integer
    * chain per position. Indexing is by UTF-16 unit here vs code point
    * in SQL engines — identical off the astral planes (and bytewise on
    * ASCII corpora). Text shorter than the window is one whole-text
    * chunk; empty text is an empty array.
    */
  def cdcChunks(s: org.apache.spark.unsafe.types.UTF8String,
                w: Int, base: Long, div: Long, rem: Long): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n >= w) {
      var topPow = 1L
      var j = 1
      while (j < w) { topPow *= base; j += 1 }
      var h = 0L
      j = 0
      while (j < w) { h = h * base + str.charAt(j).toLong; j += 1 }
      var st = 0
      var i = w - 1
      while (i < n) {
        if (h % div == rem) {
          out += org.apache.spark.unsafe.types.UTF8String
            .fromString(str.substring(st, i + 1))
          st = i + 1
        }
        if (i + 1 < n)
          h = (h - str.charAt(i - w + 1).toLong * topPow) * base +
            str.charAt(i + 1).toLong
        i += 1
      }
      if (st < n)
        out += org.apache.spark.unsafe.types.UTF8String
          .fromString(str.substring(st, n))
    } else if (n > 0) out += s
    new GenericArrayData(out.toArray)
  }

  /** Ray-casting point-in-polygon over INTEGER coordinates (geo06).
    * Counts rightward-ray crossings with the half-open edge rule
    * (`y1 <= py < y2` or `y2 <= py < y1`), comparing px against the
    * exact rational intersection via cross-multiplication — all-integer
    * arithmetic, so the verdict is bitwise-reproducible in any engine
    * (no float crossings). Deterministic boundary behavior follows from
    * the rule (spec-pinned): a point on a bottom/left boundary is
    * inside, on a top/right boundary outside. Coordinates must stay
    * below 2^30 in magnitude: the cross-multiplication multiplies two
    * coordinate DIFFERENCES (each up to 2× the max coordinate), so
    * 2^30 keeps every product under 2^62 — at 2^31 a product can reach
    * ~2^64 and silently wrap, flipping a verdict. The bound is ENFORCED
    * (throws, never wraps): the probe point at entry, each vertex as the
    * crossing loop touches it — a couple of compares beside the loop's
    * own multiplies, and only the out-of-contract path pays the throw.
    * Vertex order may be clockwise or counter-clockwise; the closing
    * edge (last vertex back to first) is implied.
    */
  private final val PipCoordLimit = 1L << 30

  private def pipBoundCheck(v: Long, what: String): Unit =
    if (v >= PipCoordLimit || v <= -PipCoordLimit)
      throw new IllegalArgumentException(
        s"point_in_polygon $what coordinate $v exceeds the exact-integer " +
          "bound |coord| < 2^30 (cross-multiplied products would wrap " +
          "silently and flip verdicts) — rescale to a coarser grid first")

  def pointInPolygon(px: Long, py: Long, xsArr: ArrayData,
                     ysArr: ArrayData): Boolean = {
    pipBoundCheck(px, "point"); pipBoundCheck(py, "point")
    val xs = xsArr.toLongArray()
    val ys = ysArr.toLongArray()
    val n = math.min(xs.length, ys.length)
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val x1 = xs(j); val y1 = ys(j)
      val x2 = xs(i); val y2 = ys(i)
      pipBoundCheck(x1, "vertex"); pipBoundCheck(y1, "vertex")
      if ((y1 > py) != (y2 > py)) {
        val dy = y2 - y1
        val lhs = (px - x1) * dy
        val rhs = (py - y1) * (x2 - x1)
        if (if (dy > 0) lhs < rhs else lhs > rhs) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Exact integral array sum for [[graft.functions.ArrayFoldExact]]
    * (w22): accumulates in Long with loud overflow (Math.addExact — the
    * ANSI discipline), skips null elements, returns boxed null for an
    * empty/all-null array (SQL aggregate semantics). `kind` selects the
    * element getter: 0 byte, 1 short, 2 int, 3 long.
    */
  def arraySumExactLong(a: ArrayData, kind: Int): java.lang.Long = {
    var acc = 0L
    var any = false
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        any = true
        val v = kind match {
          case 0 => a.getByte(i).toLong
          case 1 => a.getShort(i).toLong
          case 2 => a.getInt(i).toLong
          case _ => a.getLong(i)
        }
        acc = Math.addExact(acc, v)
      }
      i += 1
    }
    if (any) java.lang.Long.valueOf(acc) else null
  }

  /** Exact decimal array sum: java.math.BigDecimal accumulation (exact
    * at any magnitude), result re-checked into DECIMAL(38, s) — loud on
    * precision overflow, boxed null on empty/all-null.
    */
  def arraySumExactDecimal(a: ArrayData, p: Int,
                           s: Int): org.apache.spark.sql.types.Decimal = {
    var acc = java.math.BigDecimal.ZERO
    var any = false
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        any = true
        acc = acc.add(a.getDecimal(i, p, s).toJavaBigDecimal)
      }
      i += 1
    }
    if (!any) return null
    val d = org.apache.spark.sql.types.Decimal(acc)
    if (!d.changePrecision(38, s)) throw new ArithmeticException(
      s"array_sum_exact overflowed DECIMAL(38, $s)")
    d
  }

  /** Exact-sum average: the integral/decimal sum above cast to double
    * ONCE, divided ONCE — a single IEEE rounding point. Boxed null on
    * empty/all-null (SQL avg semantics).
    */
  def arrayAvgExact(a: ArrayData, kind: Int, p: Int,
                    s: Int): java.lang.Double = {
    var cnt = 0L
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) cnt += 1
      i += 1
    }
    if (cnt == 0) return null
    val sumD: Double =
      if (kind == 4) arraySumExactDecimal(a, p, s).toDouble
      else arraySumExactLong(a, kind).longValue().toDouble
    java.lang.Double.valueOf(sumD / cnt)
  }

}
