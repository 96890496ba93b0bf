package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-stream processing over the `events` table.
  *
  * The reference has no streaming semantics at all (SURVEY §2.10: its
  * "streaming" is out-of-core batch input) — this module is the
  * capability extension: event-time tumbling windows and sessionization,
  * in both batch form (oracle-checkable) and Structured Streaming form
  * (watermarked, incremental, for live pipelines).
  */
object Events {

  /** Read the events corpus. The driver's parquet stores TIMESTAMP(NANOS),
    * which Spark's vectorized reader rejects — read nanos as long and
    * rebuild a micro-precision NTZ timestamp (lossless here: the corpus
    * has no sub-microsecond components).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }

  /** Tumbling event-time aggregation (batch). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sv"))
      .orderBy(col("h"), col("event_type"))

  /** Gap-based sessionization (batch): a session breaks after
    * `gapMinutes` of user inactivity. One shuffle on user_id; the two
    * window functions share the same partitioning.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    val gap = make_dt_interval(lit(0), lit(0), lit(gapMinutes), lit(0))
    val newSession = when(prevTs.isNull || (col("ts") - prevTs) > gap, 1)
      .otherwise(0)
    events
      .withColumn("session_seq",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("event_id"), col("ts"), col("session_seq"))
  }

  /** Structured Streaming variant of [[hourlyTypeCounts]]: watermarked
    * tumbling windows, append-mode compatible. Feed it
    * `spark.readStream.schema(...).parquet(dir)`.
    */
  def streamingHourlyTypeCounts(events: DataFrame,
                                watermark: String = "2 hours"): DataFrame =
    events
      // watermarks require TIMESTAMP (LTZ); lossless under the UTC session
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sv"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("sv"))
}
