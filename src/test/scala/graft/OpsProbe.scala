package graft

import org.apache.spark.sql.functions._

import graft.ops._

/** Runtime probes for the pipeline operators (evidence capture). */
object OpsProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // A: minhash estimate vs exact jaccard on the same candidate pairs
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", 64, 16, 5, 0.2)
    val exact = Dedup.ngramJaccard(docs, mh.select("id_a", "id_b"), "doc_id", "text", 5)
    val cmp = mh.join(exact, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("est_jaccard"), col("jaccard"),
        abs(col("est_jaccard") - col("jaccard")).as("err"))
    println("PROBE_A pairs=" + cmp.count() + " max_est_err=" +
      cmp.agg(max("err")).collect()(0).getDouble(0))

    // B: real codec decode through the typed mapPartitions plumbing
    val dec = Multimodal.decodeMedia(
      Multimodal.withBmpPayload(docs, "doc_id", "text"), "doc_id", "payload")
    val d0 = dec.filter(col("doc_id") === 0).collect()(0)
    println(s"PROBE_B rows=${dec.count()} doc0=$d0")

    // C: structured streaming hourly counts == batch hourly counts
    val ev = graft.streaming.Events.read(spark, dir)
    val stage = "target/tmp/events_stream_in"
    ev.write.mode("overwrite").parquet(stage)
    val q = graft.streaming.Events.streamingHourlyTypeCounts(
        spark.readStream.schema(ev.schema).parquet(stage), "10000 hours")
      .writeStream.outputMode("complete").format("memory").queryName("hr").start()
    q.processAllAvailable(); q.stop()
    val batch = graft.streaming.Events.hourlyTypeCounts(ev)
    val diffN = spark.table("hr").select("h", "event_type", "n", "sv")
      .exceptAll(batch.select("h", "event_type", "n", "sv")).count()
    println(s"PROBE_C stream_groups=${spark.table("hr").count()} " +
      s"batch_groups=${batch.count()} content_diff=$diffN")

    // D: topk_by with k larger than the candidate set
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val big = Similarity.bruteForceTopK(
      e.limit(3), e.filter(col("vec_id") === 0), "vec_id", "embedding", 10)
    println("PROBE_D k_gt_corpus_rows=" + big.count())

    spark.stop()
    println("OPS PROBE OK")
  }
}
