package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One event's session assignment from [[Events.streamingSessionize]]. */
case class SessionOut(user_id: Long, event_id: Long, session_seq: Long)

/** Keyed session state: last event time + running session counter. */
case class SessState(lastTsMicros: Long, seq: Long)

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
    *
    * The legacy conf has no per-read option (ParquetOptions has no
    * nanosAsLong key), so it is scoped: set for the `read.parquet` call —
    * which is when the parquet schema is converted — and restored before
    * returning (verified: later actions on the returned frame execute
    * correctly with the conf back at its prior value).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    withNanosAsLong(spark) {
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    }

  /** Run `body` with spark.sql.legacy.parquet.nanosAsLong=true, restoring
    * the previous setting afterward so the session-global conf does not
    * leak into unrelated reads.
    */
  def withNanosAsLong[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
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


  /** Stateful Structured Streaming sessionization: per-user gap sessions
    * with explicit keyed state (`flatMapGroupsWithState`). State per user
    * is 16 bytes (last event time + session counter) — bounded regardless
    * of stream length; processing-time timeout is the eviction hook for
    * idle users at production scale.
    *
    * Within a micro-batch each user's new events are sorted by
    * (ts, event_id) before assignment, so a replay of a finite input in
    * one batch agrees exactly with the batch [[sessionize]].
    */
  def streamingSessionize(events: DataFrame, gapMinutes: Int = 30)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    def assign(userId: Long, it: Iterator[(Long, Long, Long)],
               state: GroupState[SessState]): Iterator[SessionOut] = {
      val sorted = it.toArray.sortBy { case (_, ts, eid) => (ts, eid) }
      var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
      val out = sorted.map { case (_, ts, eid) =>
        val newSession = st.lastTsMicros == Long.MinValue ||
          ts - st.lastTsMicros > gapMicros
        st = SessState(ts, if (newSession) st.seq + 1 else st.seq)
        SessionOut(userId, eid, st.seq)
      }
      state.update(st)
      out.iterator
    }

    events
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tsu"),
        col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(assign)
  }

  /** Streaming exact deduplication: drop any row whose content digest was
    * already seen — across micro-batch boundaries — keeping the first
    * arrival. The standard ingest-side scrub for a continuously arriving
    * document stream. State is one 16-byte digest per distinct content;
    * for unbounded streams set a watermark upstream and pass
    * `withinWatermark = true` so expired digests are evicted
    * (dropDuplicatesWithinWatermark) and state stays bounded.
    */
  def streamingDedupExact(stream: DataFrame, contentCol: String,
                          withinWatermark: Boolean = false): DataFrame = {
    val hashed = stream.withColumn("__content_hash", md5(col(contentCol)))
    val dedup =
      if (withinWatermark) hashed.dropDuplicatesWithinWatermark("__content_hash")
      else hashed.dropDuplicates("__content_hash")
    dedup.drop("__content_hash")
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
