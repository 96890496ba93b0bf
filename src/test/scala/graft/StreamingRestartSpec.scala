package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Failure-path coverage for the stateful streaming family: kill a
  * stateful query between micro-batch runs and restart it from its
  * checkpoint. st01–st16 all replay the happy path in one process run;
  * this spec proves the two guarantees a restart must keep:
  *
  *  1. STATE RESTORATION — a duplicate arriving AFTER the restart must
  *     be attributed to its owner seen BEFORE the restart, which is only
  *     possible if the RocksDB state snapshot (content-digest → first
  *     owner) was recovered from the checkpoint, not rebuilt empty.
  *  2. EXACTLY-ONCE OUTPUT — the restarted query must neither re-emit
  *     pre-restart rows (file-source progress is checkpointed) nor drop
  *     post-restart ones; the file sink's commit log dedups output even
  *     if a batch is replayed.
  */
class StreamingRestartSpec extends GraftSuite {

  test("watermarked window state survives kill + restart (hourly closed aggregation)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 4)
    val work = Files.createTempDirectory("graft_restart_w_").toString
    val srcDir = s"$work/src"
    Files.createDirectories(Paths.get(srcDir))

    val ev = s.read.parquet("/root/testdata/sf0.01/events.parquet")
    // ts may be NTZ in the fixture; all arithmetic below runs on epoch
    // micros of the UTC-interpreted instant (session TZ is UTC)
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    val split = ev.select(percentile_approx(tsUs, lit(0.5), lit(100000))
      .cast("long")).head.getLong(0)
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$work/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.move(Paths.get(part), Paths.get(s"$srcDir/$name.parquet"))
    }
    // split by EVENT TIME so phase 2 carries no late data for windows
    // already emitted in phase 1
    addFile(ev.filter(tsUs < split), "phase1")

    def runOnce(): Unit = {
      val in = s.readStream.schema(ev.schema).parquet(srcDir)
      val out = graft.streaming.Events.streamingHourlyClosed(in)
      val q = out.writeStream.format("parquet")
        .option("path", s"$work/sink")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }

    runOnce() // phase 1, then killed
    val afterP1 = s.read.parquet(s"$work/sink").count()
    addFile(ev.filter(tsUs >= split), "phase2")
    runOnce() // restart from checkpoint

    val sink = s.read.parquet(s"$work/sink")
      .select(col("h_end"), col("event_type"), col("n"),
        col("sv").cast("double").as("sv"))
    assert(sink.count() > afterP1, "restart emitted no new windows")
    assert(sink.groupBy("h_end", "event_type").count()
      .filter(col("count") > 1).isEmpty, "restart re-emitted windows")

    // batch oracle over ALL events: closed w.r.t. the final watermark
    val maxUs = ev.agg(max(tsUs)).head.getLong(0)
    val oracle = ev
      .groupBy(window(col("ts").cast("timestamp"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sv"))
      .select(col("window.end").as("h_end"), col("event_type"), col("n"),
        col("sv").cast("double").as("sv"))
      .filter(unix_micros(col("h_end")) <= maxUs - 30L * 60 * 1000000)
    assert(sink.except(oracle).isEmpty && oracle.except(sink).isEmpty,
      "restarted stream diverged from the batch closed-window oracle")

    // the boundary hour (containing the split instant) must combine
    // phase-1 and phase-2 events — only possible if the partial window
    // state was restored from the checkpoint
    val hourUs = 3600L * 1000000
    val hourStart = (split / hourUs) * hourUs
    val boundaryTotal = ev.filter(
      tsUs >= hourStart && tsUs < hourStart + hourUs).count()
    val boundaryEmitted = sink.filter(
      unix_micros(col("h_end")) === hourStart + hourUs)
      .agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
    assert(boundaryTotal > 0 && boundaryEmitted == boundaryTotal,
      s"boundary window lost pre-restart state: $boundaryEmitted != $boundaryTotal")
  }

  test("streaming dedup owners survives kill + restart from checkpoint") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 4)
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val work = Files.createTempDirectory("graft_restart_").toString
    val srcDir = s"$work/src"
    val sinkDir = s"$work/sink"
    val ckpt = s"$work/ckpt"
    Files.createDirectories(Paths.get(srcDir))

    val docs = s.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))

    // phase-1 file: docs 0..249 — establishes state (first owners)
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$work/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.move(Paths.get(part), Paths.get(s"$srcDir/$name.parquet"))
    }
    addFile(docs.filter(col("doc_id") < 250), "phase1")

    def runOnce(): Unit = {
      val schema = docs.schema
      val in = s.readStream.schema(schema).parquet(srcDir)
      val out = graft.streaming.Events
        .streamingDedupOwners(in, "doc_id", "text").toDF()
      val q = out.writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop() // stop() == the "kill"
    }

    runOnce() // processes phase1, then the query is stopped

    val afterPhase1 = s.read.parquet(sinkDir).count()
    assert(afterPhase1 == 250L, s"phase 1 emitted $afterPhase1 rows")

    // phase-2 file arrives while the query is DOWN: docs 250..499 plus
    // exact duplicates of phase-1 content under new ids — their owners
    // live only in the checkpointed state
    addFile(docs.filter(col("doc_id") >= 250).unionByName(
      docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))),
      "phase2")

    runOnce() // restart from the same checkpoint

    val sink = s.read.parquet(sinkDir)
    // exactly-once: 250 + 250 + 50 verdicts, one per arrival, no replays
    assert(sink.count() == 550L, s"expected 550 rows, got ${sink.count()}")
    assert(sink.groupBy(col("doc_id")).count().filter(col("count") > 1).isEmpty,
      "a restart re-emitted rows for some doc_id")

    // state restoration: every planted post-restart duplicate must point
    // at its PRE-restart owner (content first seen in phase 1)
    val planted = sink.filter(col("doc_id") >= 100000L)
    assert(planted.count() == 50L)
    assert(planted.filter(!col("is_dup") ||
      col("owner_id") =!= col("doc_id") - 100000L).isEmpty,
      "post-restart duplicates were not matched to pre-restart owners")

    // full-relation check against the batch oracle: owner = min(doc_id)
    // per content group over ALL arrivals
    val all = docs.unionByName(docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    val oracle = all.withColumn("owner_id",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("text"))))
      .select(col("doc_id"), col("owner_id"),
        (col("doc_id") =!= col("owner_id")).as("is_dup"))
    assert(sink.select("doc_id", "owner_id", "is_dup")
      .except(oracle).isEmpty && oracle.except(
        sink.select("doc_id", "owner_id", "is_dup")).isEmpty,
      "restarted stream diverged from the batch oracle")
  }

  test("stream-stream interval join buffers survive kill + restart (st18 family)") {
    // a purchase arriving AFTER the restart must still attribute to a
    // view ingested BEFORE it — only possible if the join's buffered
    // left-side state was recovered from the checkpoint, not rebuilt
    // empty. And the restarted query must not re-emit phase-1 pairs.
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 4)
    val work = Files.createTempDirectory("graft_restart_j_").toString
    val vDir = s"$work/views"
    val bDir = s"$work/buys"
    Files.createDirectories(Paths.get(vDir))
    Files.createDirectories(Paths.get(bDir))
    import s.implicits._
    val h = 3600L * 1000000L
    val base = 1000L * h // never sit at epoch 0 (== the initial watermark)
    def tsCol = expr("timestamp_micros(tus)")
    val views = Seq((1L, 100L, base + 0L), (2L, 101L, base + h))
      .toDF("user_id", "view_id", "tus")
      .select(col("user_id"), col("view_id"), tsCol.as("view_ts"))
    val buys1 = Seq((1L, 200L, base + 600L * 1000000L)) // +10 min: phase 1
      .toDF("p_user_id", "purchase_id", "tus")
      .select(col("p_user_id"), col("purchase_id"), tsCol.as("p_ts"))
    val buys2 = Seq(
      (1L, 201L, base + 1800L * 1000000L), // +30 min: needs phase-1 VIEW state
      (2L, 202L, base + h + 900L * 1000000L) // matches phase-1 view 101
    ).toDF("p_user_id", "purchase_id", "tus")
      .select(col("p_user_id"), col("purchase_id"), tsCol.as("p_ts"))

    def addFile(df: org.apache.spark.sql.DataFrame, dir: String, name: String): Unit = {
      val tmp = s"$work/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.move(Paths.get(part), Paths.get(s"$dir/$name.parquet"))
    }
    addFile(views, vDir, "v1")
    addFile(buys1, bDir, "b1")

    def runOnce(): Unit = {
      val vS = s.readStream.schema(views.schema).parquet(vDir)
      val bS = s.readStream.schema(buys1.schema).parquet(bDir)
      val out = graft.streaming.Events.streamingIntervalJoin(
        vS, bS, "user_id", "p_user_id", "view_ts", "p_ts",
        windowSeconds = 3600L, watermark = "1 day")
      val q = out.select(col("view_id"), col("purchase_id"))
        .writeStream.format("parquet")
        .option("path", s"$work/sink")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }

    runOnce() // phase 1, then killed
    val p1 = s.read.parquet(s"$work/sink").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == Set((100L, 200L)), s"phase 1 emitted $p1")

    addFile(buys2, bDir, "b2")
    runOnce() // restart from checkpoint
    val all = s.read.parquet(s"$work/sink").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length == all.toSet.size, "restart re-emitted pairs")
    assert(all.toSet == Set((100L, 200L), (100L, 201L), (101L, 202L)),
      s"post-restart pairs wrong: ${all.toSet} — buffered view state " +
        "was not recovered from the checkpoint")
  }

  test("streaming ASOF enrich survives kill + restart (st21: join AND agg state)") {
    // two chained stateful operators must BOTH recover: a phase-2
    // purchase attributes to a phase-1 view (join buffers), and a window
    // left OPEN at the kill emits after the restart with its phase-1
    // max(struct) contribution intact (agg state). Phase 1 also emits
    // one row, which the restarted query must not re-emit.
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 4)
    val work = Files.createTempDirectory("graft_restart_asof_").toString
    val vDir = s"$work/views"; val bDir = s"$work/buys"
    Files.createDirectories(Paths.get(vDir))
    Files.createDirectories(Paths.get(bDir))
    import s.implicits._
    val mn = 60L * 1000000L
    val h = 60L * mn
    val base = 1000L * h
    def tsCol = expr("timestamp_micros(tus)")

    // phase 1 --------------------------------------------------------
    // wm after phase 1 = min(base+3h55m, base+4h) - 2h = base+1h55m;
    // agg boundary = wm - 30m = base+1h25m -> only 200's window ([0,1h))
    // emits; 301/300's windows stay OPEN with buffered state
    val views1 = Seq(
      (1L, 100L, base),
      (1L, 101L, base + 10L * mn),   // latest prior for 200
      (2L, 102L, base + 110L * mn),  // phase-2 purchase attributes here
      (8L, 800L, base + 235L * mn)   // prior for 300/301
    ).toDF("user_id", "view_id", "tus")
      .select(col("user_id"), col("view_id"), tsCol.as("view_ts"))
    val buys1 = Seq(
      (1L, 200L, base + 20L * mn),   // emits IN PHASE 1
      (8L, 301L, base + 238L * mn),  // window [3h,4h) open at the kill
      (8L, 300L, base + 240L * mn)   // window [4h,5h) open at the kill
    ).toDF("p_user_id", "purchase_id", "tus")
      .select(col("p_user_id"), col("purchase_id"), tsCol.as("p_ts"))

    // phase 2 --------------------------------------------------------
    // 201 arrives ABOVE the recovered watermark (base+2h05m > base+1h55m)
    // and matches phase-1 view 102 — only possible if the join buffer
    // was recovered; 901/400 push the final watermark to base+8h so
    // every open window closes (boundary base+7h30m)
    val views2 = Seq((9L, 901L, base + 10L * h))
      .toDF("user_id", "view_id", "tus")
      .select(col("user_id"), col("view_id"), tsCol.as("view_ts"))
    val buys2 = Seq(
      (2L, 201L, base + 125L * mn),
      (9L, 400L, base + 10L * h) // no prior view: never emits (inner)
    ).toDF("p_user_id", "purchase_id", "tus")
      .select(col("p_user_id"), col("purchase_id"), tsCol.as("p_ts"))

    def addFile(df: org.apache.spark.sql.DataFrame, dir: String, name: String): Unit = {
      val tmp = s"$work/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.move(Paths.get(part), Paths.get(s"$dir/$name.parquet"))
    }
    addFile(views1, vDir, "v1")
    addFile(buys1, bDir, "b1")

    def runOnce(): Unit = {
      val vS = s.readStream.schema(views1.schema).parquet(vDir)
      val bS = s.readStream.schema(buys1.schema).parquet(bDir)
      val out = graft.streaming.Events.streamingAsOfEnrich(
        vS, bS, "user_id", "p_user_id", "view_ts", "p_ts",
        probeIdCol = "purchase_id", quotePayload = Seq("view_id"),
        horizonSeconds = 1800L, windowDuration = "1 hour",
        watermark = "2 hours")
      val q = out.select(col("purchase_id"), col("view_id"))
        .writeStream.format("parquet")
        .option("path", s"$work/sink")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }

    runOnce() // phase 1, then killed
    val p1 = s.read.parquet(s"$work/sink").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == Set((200L, 101L)), s"phase 1 emitted $p1")

    addFile(views2, vDir, "v2")
    addFile(buys2, bDir, "b2")
    runOnce() // restart from checkpoint
    val all = s.read.parquet(s"$work/sink").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length == all.toSet.size, "restart re-emitted rows")
    assert(all.toSet == Set((200L, 101L), (201L, 102L),
      (301L, 800L), (300L, 800L)),
      s"post-restart rows wrong: ${all.toSet} — join buffers or open " +
        "window state were not recovered from the checkpoint")
  }
}
