package graft
import org.apache.spark.sql.functions._
/** Measurement probe: d03 candidate volume and verify-stage cost at sf0.1. */
object D03Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cand = graft.ops.Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 7, chunks = 8)
    time("candidates")(println("PROBE npairs=" + cand.count()))
    val ids = cand.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    time("ids")(println("PROBE nids=" + ids.count()))
    val v = graft.ops.Dedup.ngramJaccard(docs, cand.select("id_a", "id_b"),
      "doc_id", "text", 5).filter(col("jaccard") >= 0.9)
    time("verify-e2e")(println("PROBE verified=" + v.count()))
    spark.stop()
  }
}
