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
}
