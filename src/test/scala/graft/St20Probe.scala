package graft

import org.apache.spark.sql.functions._

/** Timing probe for st20's cost: batch vs streaming, catalog build. */
object St20Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](what: String)(f: => T): T = {
      val t0 = System.currentTimeMillis()
      val r = f
      println(s"$what: ${(System.currentTimeMillis() - t0) / 1000.0}s")
      r
    }
    // warmup
    spark.read.parquet(s"$dir/events.parquet").count()
    val sixt = lit(0.0625)
    def sup = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey"),
        (((col("s_suppkey") * 11) % 320).cast("double") * sixt).as("slat"),
        (((col("s_suppkey") * 13) % 320).cast("double") * sixt).as("slon"))
    val catalog = time("catalog build+cache") {
      val c = graft.ops.Geo.siteCatalog(sup, "s_suppkey", "slat", "slon", 2.0)
      c.count(); c
    }
    val evB = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"),
        ((col("user_id") % 320).cast("double") * sixt).as("plat"),
        (((col("user_id") * 7) % 320).cast("double") * sixt).as("plon"))
    time("batch nearestByCatalog + agg") {
      graft.ops.Geo.nearestByCatalog(evB, "plat", "plon", catalog,
          2.0, "site", "d2", graft.ops.Geo.planarSq)
        .groupBy(col("site")).agg(count(lit(1)))
        .write.mode("overwrite").format("noop").save()
    }
    time("full st20 query fn (streaming)") {
      SparkEntry.queries("st20_stream_geo_enrich")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    time("st05 for comparison (streaming)") {
      SparkEntry.queries("st05_stream_static")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
