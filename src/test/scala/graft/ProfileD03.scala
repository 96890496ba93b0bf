package graft

import org.apache.spark.sql.functions._

/** Phase-level timing probe for d03_simhash_pairs (optimization-round
  * measurement: which phase owns the wall time — fingerprints, candidate
  * join, or the exact n-gram verify).
  *
  * Usage: Test/runMain graft.ProfileD03 [sfdir]
  */
object ProfileD03 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d03] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val fp = timed("fingerprints (tokenize+simhash, checkpoint)") {
        graft.ops.Dedup.simhashFingerprints(docs, "doc_id", "text")
          .localCheckpoint(true)
      }
      val cand = graft.ops.Dedup.fingerprintPairs(fp, maxHamming = 7, chunks = 8)
        .select(col("id_a"), col("id_b"))
      val candCp = timed("candidate pairs (chunk join + verify + distinct)") {
        cand.localCheckpoint(true)
      }
      println(s"[d03] candidates: ${candCp.count()}")
      val ids = candCp.select(explode(array(col("id_a"), col("id_b"))).as("id"))
        .distinct()
      println(s"[d03] distinct candidate ids: ${ids.count()}")
      val sets = timed("shingle sets for candidate docs (checkpoint)") {
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").as("id"), col("text").as("__t"))
          .join(ids, Seq("id"), "left_semi")
          .select(col("id"), array_distinct(
            graft.ops.TextOps.shingles(col("__t"), 5)).as("sh"))
          .localCheckpoint(true)
      }
      val sorted = graft.api.FrameStats.broadcastIfSmall(sets)
        .select(col("id"), sort_array(col("sh")).as("sh"))
      timed("pair attach joins + jaccard + filter + sort (noop)") {
        candCp
          .join(sorted.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sorted.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            call_function("jaccard_sorted", col("sh_a"), col("sh_b")).as("jaccard"))
          .filter(col("jaccard") >= 0.9)
          .orderBy(col("id_a"), col("id_b"))
          .write.mode("overwrite").format("noop").save()
      }
      timed("exact n-gram jaccard verify + sort (noop)") {
        graft.ops.Dedup.ngramJaccard(docs, candCp, "doc_id", "text", shingleK = 5)
          .filter(col("jaccard") >= 0.9)
          .orderBy(col("id_a"), col("id_b"))
          .write.mode("overwrite").format("noop").save()
      }
      timed("full declared query (noop)") {
        SparkEntry.queries("d03_simhash_pairs")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
