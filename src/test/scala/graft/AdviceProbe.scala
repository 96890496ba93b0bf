package graft

import org.apache.spark.sql.functions._

/** Runtime probe for the round-5 ADVICE closures: null-text segment
  * dedup parity, leak-free lazy nearDupJaccard, and (band,bhash)-keyed
  * streaming near-dup state.
  */
object AdviceProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("=== [1] dedupSegments: null-text doc comes back as '' ===")
    val docs = Seq((1L, Some("a b c")), (2L, None), (3L, Some("b d")))
      .toDF("doc_id", "text")
    graft.ops.Dedup.dedupSegments(docs, "doc_id", "text", delim = " ")
      .orderBy("doc_id").show(truncate = false)

    println("=== [2] nearDupJaccard(eager=false): no cache left behind ===")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    graft.functions.Registry.registerAll(spark)
    val lazyDf = graft.ops.Dedup.nearDupJaccard(
      corpus, "doc_id", "text", numHashes = 64, bands = 16, shingleK = 3,
      threshold = 0.6, eager = false)
    val n = lazyDf.count()
    println(s"lazy pairs: $n")
    println(s"cacheManager empty after lazy path: " +
      spark.sharedState.cacheManager.isEmpty)

    println("=== [3] streamingNearDupFlags replay == batch candidates ===")
    val sample = corpus.orderBy("doc_id").limit(60).select("doc_id", "text")
    val dir = "target/tmp/advice_probe_stream"
    sample.coalesce(1).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.Events.streamingNearDupFlags(
        spark.readStream.schema("doc_id LONG, text STRING").parquet(dir),
        "doc_id", "text", numHashes = 64, bands = 16, shingleK = 3)
      .writeStream.format("memory").queryName("adviceprobe")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("adviceprobe")
      .filter(col("doc_id") =!= col("dup_of"))
      .select(col("dup_of").as("id_a"), col("doc_id").as("id_b"))
      .distinct().as[(Long, Long)].collect().toSet
    val batch = graft.ops.Dedup.minhashCandidates(
      sample, "doc_id", "text", numHashes = 64, bands = 16,
      shingleK = 3).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    println(s"streamed candidate pairs: ${streamed.size}, batch: ${batch.size}, " +
      s"equal: ${streamed == batch}")

    spark.stop()
  }
}
