package graft

/** Runtime drive of the transformWithState dedup surface against the
  * sf0.001 corpus (RocksDB state store, two micro-batches).
  */
object TwsProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val dir = "target/tmp/tws_probe_in"
    docs.limit(40).coalesce(1).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.Events.streamingDedupOwners(
        spark.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(dir), "doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName("twsp").start()
    q.processAllAvailable()
    // second batch: same text under NEW ids -> must be flagged as dups
    // of the batch-1 owners held in RocksDB state
    docs.limit(40).selectExpr("doc_id + 1000 AS doc_id", "text")
      .limit(10).coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()
    val t = spark.table("twsp")
    println(s"verdict rows: ${t.count()}, dups flagged: " +
      t.filter(org.apache.spark.sql.functions.col("is_dup")).count())
    t.orderBy("doc_id").show(8, truncate = false)
    spark.stop()
  }
}
