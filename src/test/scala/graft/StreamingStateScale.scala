package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Measures the streaming state-store footprint of the two stateful
  * dedup families (st02 transformWithState owner map, st13
  * dropDuplicatesWithinWatermark) at sf0.1 and at the derived sf1
  * (10x rows, 10x distinct keys — built by [[ScaleStress.buildScaled]]).
  *
  * The 100 TB claim under test: RocksDB state grows with DISTINCT KEYS,
  * not with event volume — replaying each corpus with a 3x duplicate
  * amplification must leave state rows (and SST bytes) at the key count,
  * while input rows are 3x larger. Evidence comes from
  * `StreamingQueryProgress.stateOperators` (numRowsTotal, RocksDB
  * customMetrics) — the same numbers a production monitor scrapes.
  *
  * Run: `sbt -batch "Test/runMain graft.StreamingStateScale"`; emits one
  * markdown table (for SCALE.md) plus a JSONL dump.
  */
object StreamingStateScale {

  private val Sf01 = "/root/testdata/sf0.1"
  private val Sf1 = "target/sf1_derived"

  private case class Meas(query: String, sf: String, inputRows: Long,
                          batches: Int, maxBatchRows: Long,
                          distinctKeys: Long, stateRows: Long,
                          rocksdbSstBytes: Long, rocksdbMemBytes: Long)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Registry.registerAll(spark)
    ScaleStress.buildScaled(spark, 10, Sf1)

    val out = new StringBuilder
    val rows = Seq(
      measureOwners(spark, "st02_owner_map", "sf0.1", Sf01),
      measureOwners(spark, "st02_owner_map", "sf1", Sf1),
      measureWatermarkDedup(spark, "st13_wm_dedup", "sf0.1", Sf01),
      measureWatermarkDedup(spark, "st13_wm_dedup", "sf1", Sf1),
      measureIntervalJoin(spark, "st18_interval_join", "sf0.1", Sf01),
      measureIntervalJoin(spark, "st18_interval_join", "sf1", Sf1))

    out ++= "| query | sf | input rows | batches | max rows/batch | distinct keys | state rows | RocksDB SST | RocksDB mem |\n"
    out ++= "|---|---|---|---|---|---|---|---|---|\n"
    rows.foreach { m =>
      out ++= f"| ${m.query} | ${m.sf} | ${m.inputRows}%,d | ${m.batches} | ${m.maxBatchRows}%,d | ${m.distinctKeys}%,d | ${m.stateRows}%,d | ${mb(m.rocksdbSstBytes)} | ${mb(m.rocksdbMemBytes)} |\n"
    }
    println(out.toString)
    rows.foreach { m =>
      println(s"""{"query":"${m.query}","sf":"${m.sf}","input_rows":${m.inputRows},""" +
        s""""batches":${m.batches},"max_batch_rows":${m.maxBatchRows},""" +
        s""""distinct_keys":${m.distinctKeys},"state_rows":${m.stateRows},""" +
        s""""rocksdb_sst_bytes":${m.rocksdbSstBytes},"rocksdb_mem_bytes":${m.rocksdbMemBytes}}""")
    }
    // the claims, asserted: dedup-family state rows == distinct keys at
    // BOTH scales despite the 3x duplicate amplification; the symmetric
    // join's state == TOTAL buffered rows (both sides, delay covers the
    // replay — its worst case, and why the delay is the sizing knob)
    rows.foreach { m =>
      require(m.stateRows == m.distinctKeys,
        s"${m.query}@${m.sf}: state rows ${m.stateRows} != expected ${m.distinctKeys}")
      if (!m.query.startsWith("st18"))
        require(m.inputRows >= 3 * m.distinctKeys,
          s"${m.query}@${m.sf}: amplification missing (${m.inputRows} input rows)")
    }
    println("STATE-SCALE OK")
    spark.stop()
  }

  private def mb(b: Long): String = f"${b / 1048576.0}%.1f MiB"

  /** st02 shape: transformWithState first-owner map over document text
    * digests, RocksDB provider, each doc delivered 3x. State keys =
    * distinct md5(text) digests.
    */
  private def measureOwners(outer: SparkSession, q: String, sf: String,
                            dir: String): Meas = {
    val s = outer.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 8)
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val src = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val feed = s"target/tmp/state_scale_${q}_$sf"
    // 3x amplification: the SAME (id, text) redelivered with shifted ids
    // (same text -> same state key). Range-split into 4 files so the
    // replay yields multiple micro-batches.
    src.unionByName(src.withColumn("doc_id", col("doc_id") + 20000000L))
      .unionByName(src.withColumn("doc_id", col("doc_id") + 40000000L))
      .repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(feed)
    val schema = s.read.parquet(feed).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
    val outDs = graft.streaming.Events.streamingDedupOwners(stream, "doc_id", "text")
    val sink = "state_scale_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val query = outDs.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try query.awaitTermination() finally query.stop()
    val distinctKeys = src.select(md5(col("text"))).distinct().count()
    harvest(q, sf, query.recentProgress.toSeq, distinctKeys)
  }

  /** st13 shape: dropDuplicatesWithinWatermark on event_id, each event
    * delivered 3x with jittered ts. State keys = distinct event ids
    * (nothing ages out under AvailableNow: the 31-day delay covers the
    * corpus span, which is the worst case for state size — exactly what
    * we want to measure).
    */
  private def measureWatermarkDedup(outer: SparkSession, q: String,
                                    sf: String, dir: String): Meas = {
    val s = outer.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 8)
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val MpM = graft.streaming.Events.MicrosPerMinute
    // readRaw normalizes ts to long microseconds (the raw parquet column
    // is TIMESTAMP_NTZ), matching the st13 driver query's feed shape
    val ev = graft.streaming.Events.readRaw(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val feed = s"target/tmp/state_scale_${q}_$sf"
    ev.unionByName(ev.withColumn("ts", col("ts") + lit(5L * MpM)))
      .unionByName(ev.withColumn("ts", col("ts") + lit(9L * MpM)))
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(feed)
    val schema = "event_id LONG, ts LONG, event_type STRING, value DOUBLE"
    val sink = "state_scale_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val query = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
      .withColumn("tst", expr("timestamp_micros(ts)"))
      .withWatermark("tst", "31 days")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try query.awaitTermination() finally query.stop()
    val distinctKeys = ev.select(col("event_id")).distinct().count()
    harvest(q, sf, query.recentProgress.toSeq, distinctKeys,
      opNameContains = Some("dedupe"))
  }

  /** st18 shape: symmetric-hash stream-stream interval join (views x
    * purchases, 30-min window) with a delay covering the whole replay —
    * the WORST case for join state: every row of both sides stays
    * buffered until the end, so state rows must equal views + purchases
    * exactly. The production sizing knob is the delay; this measures
    * the ceiling it bounds.
    */
  private def measureIntervalJoin(outer: SparkSession, q: String,
                                  sf: String, dir: String): Meas = {
    val s = outer.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 8)
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ev = graft.streaming.Events.readRaw(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val feed = s"target/tmp/state_scale_${q}_$sf"
    ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        expr("timestamp_micros(ts)").as("view_ts"))
      .repartitionByRange(4, col("view_ts"))
      .write.mode("overwrite").parquet(s"$feed/v")
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"),
        expr("timestamp_micros(ts)").as("p_ts"))
      .repartitionByRange(4, col("p_ts"))
      .write.mode("overwrite").parquet(s"$feed/b")
    val vS = s.readStream.schema(s.read.parquet(s"$feed/v").schema)
      .option("maxFilesPerTrigger", 2).parquet(s"$feed/v")
    val bS = s.readStream.schema(s.read.parquet(s"$feed/b").schema)
      .option("maxFilesPerTrigger", 2).parquet(s"$feed/b")
    val out = graft.streaming.Events.streamingIntervalJoin(
      vS, bS, "user_id", "p_user_id", "view_ts", "p_ts",
      windowSeconds = 1800L, watermark = "62 days")
    val sink = "state_scale_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val query = out.select(col("view_id"), col("purchase_id"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try query.awaitTermination() finally query.stop()
    val buffered = s.read.parquet(s"$feed/v").count() +
      s.read.parquet(s"$feed/b").count()
    harvest(q, sf, query.recentProgress.toSeq, buffered,
      opNameContains = Some("join"))
  }

  /** Fold a progress sequence into totals. `opNameContains` picks the
    * dedup operator by name when the query has several stateful
    * operators (st13 also carries the complete-mode agg's state).
    */
  private def harvest(q: String, sf: String,
                      progress: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress],
                      distinctKeys: Long,
                      opNameContains: Option[String] = None): Meas = {
    val withInput = progress.filter(_.numInputRows > 0)
    val inputRows = withInput.map(_.numInputRows).sum
    val maxBatch = if (withInput.isEmpty) 0L else withInput.map(_.numInputRows).max
    val lastState = progress.reverse
      .find(_.stateOperators.nonEmpty)
      .map { p =>
        val ops = p.stateOperators.toSeq
        opNameContains match {
          case Some(frag) =>
            val hit = ops.filter(o =>
              Option(o.operatorName).exists(_.toLowerCase.contains(frag)))
            require(hit.nonEmpty,
              s"no state operator matching '$frag' in ${ops.map(_.operatorName).mkString(",")}")
            hit
          case None => ops
        }
      }
      .getOrElse(Seq.empty)
    def metric(name: String): Long =
      lastState.map { o =>
        val m = o.customMetrics
        if (m != null && m.containsKey(name)) m.get(name).longValue() else 0L
      }.sum
    Meas(q, sf, inputRows, withInput.size, maxBatch, distinctKeys,
      lastState.map(_.numRowsTotal).sum,
      metric("rocksdbSstFileSize"), metric("rocksdbTotalMemoryUsage"))
  }
}
