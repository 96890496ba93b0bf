package graft

import org.apache.spark.sql.functions._

/** Probe: does an append-mode watermarked window aggregation emit its
  * closed windows under AvailableNow single-file replay? (Append emits a
  * window only once the watermark passes its end; the no-data final
  * micro-batch must run for the last watermark update to flush.)
  */
object St04Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    val dir = "/root/testdata/sf0.001"
    val events = graft.streaming.Events.readStream(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.end").as("h_end"), col("event_type"), col("n"))
    val sink = "st04probe_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = events.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val got = spark.table(sink)
    println(s"append rows emitted: ${got.count()}")

    // batch truth: all windows whose end <= max(ts) - 30 min
    val b = graft.streaming.Events.read(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val maxTs = b.agg(max(col("ts"))).first.getTimestamp(0)
    val wm = new java.sql.Timestamp(maxTs.getTime - 30 * 60 * 1000L)
    val batch = b.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.end").as("h_end"), col("event_type"), col("n"))
      .filter(col("h_end") <= lit(wm))
    println(s"batch closed-window rows: ${batch.count()}")
    val diff = got.exceptAll(batch).count() + batch.exceptAll(got).count()
    println(s"symmetric diff: $diff")
    spark.stop()
  }
}
