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

  /** Inner-join `points` to `intervals` where
    * `points(pointCol) BETWEEN intervals(loCol) AND intervals(hiCol)`.
    * All three columns must be numeric (cast dates to day numbers with
    * `datediff`); rows with null bounds/points drop (SQL BETWEEN
    * semantics). Output: all columns of both inputs.
    */
  def bucketedRangeJoin(points: DataFrame, pointCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val pb = points.withColumn("__rb", floor(col(pointCol) / width))
    val ib = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__rb",
        explode(sequence(floor(col(loCol) / width), floor(col(hiCol) / width))))
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
    * as a plain join).
    */
  def bucketedOverlapJoin(left: DataFrame, lLo: String, lHi: String,
                          right: DataFrame, rLo: String, rHi: String,
                          width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val lb = left
      .filter(col(lLo) <= col(lHi))
      .withColumn("__rb",
        explode(sequence(floor(col(lLo) / width), floor(col(lHi) / width))))
    val rb = right
      .filter(col(rLo) <= col(rHi))
      .withColumn("__rb",
        explode(sequence(floor(col(rLo) / width), floor(col(rHi) / width))))
    lb.join(rb, Seq("__rb"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__rb") === floor(greatest(col(lLo), col(rLo)) / width))
      .drop("__rb")
  }
}
