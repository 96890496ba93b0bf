package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Skew and data-layout tools for cluster-scale joins.
  *
  * AQE's skew-join splitting handles most hot keys automatically; these
  * are the explicit tools for the cases it can't see (pre-AQE stages,
  * deliberately co-located storage).
  */
object Skew {

  /** Salted equi-join for heavily skewed keys: the skewed (big) side gets
    * a deterministic salt derived from row content, the small side is
    * replicated `salt` times, and the join key becomes (key, salt). Same
    * result as a plain inner join, but a hot key's rows spread over
    * `salt` reducers instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a DataFrame as a bucketed+sorted table so equi-joins and
    * aggregations on the bucket key need NO shuffle at read time —
    * co-located storage, the cluster-scale answer to repeated joins on
    * the same key.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a previous session may have left the managed location on storage
    // while this session's (in-memory) catalog has no such table — clear
    // it, or saveAsTable fails with LOCATION_ALREADY_EXISTS. Goes through
    // the Hadoop FileSystem for the warehouse's actual scheme (HDFS, S3,
    // local), not java.io.File.
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Clamp a numeric column into a 0..2^bits−1 bucket id over the fixed
    * range [lo, hi) — the quantization step feeding [[zorder2]]. Integer
    * DIV throughout (exact; (hi−lo)·2^bits must stay under 2^63).
    */
  def rangeBucket(c: org.apache.spark.sql.Column, lo: Long, hi: Long,
                  bits: Int): org.apache.spark.sql.Column = {
    require(hi > lo, "hi must exceed lo")
    require(bits > 0 && bits <= 16, "bits must be in 1..16")
    val d = hi - lo
    val scaled = (c.cast("long") - lit(lo)) * lit(1L << bits)
    // floor-div via pmod subtraction: the double division is exact (the
    // numerator is an exact multiple of d and stays under 2^53)
    val q = ((scaled - pmod(scaled, lit(d))) / lit(d)).cast("long")
    least(greatest(q, lit(0L)), lit((1L << bits) - 1))
  }

  /** Morton / Z-order interleave of two 16-bit bucket ids: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Sorting by the z-value
    * clusters rows that are close in BOTH dimensions, so parquet
    * row-group min/max stats stay tight on each dimension simultaneously
    * — a rectangle predicate prunes row groups on either column, where a
    * single-column sort only serves one. Pure codegen'd bit arithmetic
    * (the classic mask-spread ladder), no UDF, no shuffle.
    */
  def zorder2(a: org.apache.spark.sql.Column,
              b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def spread(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val x0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
      val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
      x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }
}
