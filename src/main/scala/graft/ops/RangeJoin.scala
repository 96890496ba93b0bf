package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-safe range join. Spark plans a plain
  * `point BETWEEN lo AND hi` join as a broadcast-nested-loop (or worse,
  * a cartesian) — O(|points| × |intervals|) compute that no cluster
  * size survives. The standard fix, packaged as an operator: quantize
  * the range dimension into width-`W` buckets, explode each interval to
  * the buckets it covers, equi-join points (which live in exactly one
  * bucket) to interval-buckets, and re-check the exact range predicate
  * on the matches.
  *
  * Correctness: an interval covers a point iff the point's bucket is
  * among the interval's covered buckets, so the equi-join loses nothing;
  * the residual predicate removes same-bucket near-misses; and because a
  * point has exactly ONE bucket, no pair can match twice — no distinct
  * needed.
  *
  * Scale shape (100 TB): one hash shuffle on the bucket key each side.
  * Interval explosion is ceil(len/W)+1 rows per interval — pick W near
  * the typical interval length so explosion is ~2x and buckets stay
  * selective; hot buckets (many co-located points/intervals) are split
  * by AQE skew handling like any equi-join. The residual runs codegen'd
  * inside the join.
  */
object RangeJoin {

  /** Exact floor-division of a numeric column by a positive width, in
    * LONG arithmetic throughout. `floor(col / width)` would promote to
    * DOUBLE, and for |values| >= 2^53 the explode-side and point-side
    * bucket computations could round differently and silently drop pairs
    * (r8 ADVICE); `l - pmod(l, w)` is an exact multiple of `w`, so the
    * integral divide is exact and truncation equals floor even for
    * negative values.
    */
  private def floorDiv(c: Column, width: Long): Column = {
    val l = c.cast("long")
    call_function("div", l - pmod(l, lit(width)), lit(width))
  }

  private def reserve(df: DataFrame, side: String): Unit =
    require(!df.columns.contains("__rb"),
      s"column name '__rb' is reserved by RangeJoin ($side input has it)")

  /** Inner-join `points` to `intervals` where
    * `points(pointCol) BETWEEN intervals(loCol) AND intervals(hiCol)`.
    * All three columns must be integral-valued numerics (cast dates to
    * day numbers with `datediff`); rows with null bounds/points drop
    * (SQL BETWEEN semantics). Output: all columns of both inputs. The
    * name `__rb` is reserved (rejected if either input carries it).
    */
  def bucketedRangeJoin(points: DataFrame, pointCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    reserve(points, "points"); reserve(intervals, "intervals")
    val pb = points.withColumn("__rb", floorDiv(col(pointCol), width))
    val ib = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__rb",
        explode(sequence(floorDiv(col(loCol), width),
          floorDiv(col(hiCol), width))))
    pb.join(ib, Seq("__rb"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__rb")
  }

  /** Inner-join two INTERVAL relations on overlap:
    * `left.[lLo,lHi] ∩ right.[rLo,rHi] ≠ ∅` (closed bounds, numeric
    * columns, invalid lo>hi rows drop). Same bucket-quantize shape as
    * [[bucketedRangeJoin]], but both sides explode — so a pair sharing
    * several buckets would match repeatedly. Instead of a distinct
    * (a second shuffle over the full match volume), each pair is kept
    * only in the bucket containing its overlap START
    * (`floor(max(lLo,rLo)/W)`): that bucket is covered by both
    * intervals by definition, so exactly one copy survives — dedup for
    * free inside the codegen'd residual filter.
    *
    * Column names must be disjoint across the two inputs (same contract
    * as a plain join), and `__rb` is reserved (rejected on either side).
    */
  def bucketedOverlapJoin(left: DataFrame, lLo: String, lHi: String,
                          right: DataFrame, rLo: String, rHi: String,
                          width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    reserve(left, "left"); reserve(right, "right")
    val lb = left
      .filter(col(lLo) <= col(lHi))
      .withColumn("__rb",
        explode(sequence(floorDiv(col(lLo), width),
          floorDiv(col(lHi), width))))
    val rb = right
      .filter(col(rLo) <= col(rHi))
      .withColumn("__rb",
        explode(sequence(floorDiv(col(rLo), width),
          floorDiv(col(rHi), width))))
    lb.join(rb, Seq("__rb"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__rb") === floorDiv(greatest(col(lLo), col(rLo)), width))
      .drop("__rb")
  }
}
