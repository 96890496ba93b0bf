package graft
import org.apache.spark.sql.functions._
/** Measurement probe: minhashPairs recompute vs carry strategies at sf0.1. */
object D02Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(carry: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.ops.Dedup.minhashPairs(docs, "doc_id", "text",
          numHashes = 64, bands = 16, shingleK = 5, threshold = 0.2,
          carrySignatures = carry)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(carry = false) // warmup
    val recompute = (1 to 3).map(_ => time(false)).sorted.apply(1)
    val carry = (1 to 3).map(_ => time(true)).sorted.apply(1)
    // results must be identical
    val a = graft.ops.Dedup.minhashPairs(docs, "doc_id", "text", 64, 16, 5, 0.2)
      .select("id_a","id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = graft.ops.Dedup.minhashPairs(docs, "doc_id", "text", 64, 16, 5, 0.2,
      carrySignatures = true)
      .select("id_a","id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"PROBE recompute=$recompute%.2fs carry=$carry%.2fs identical=${a == b} pairs=${a.size}")
    spark.stop()
  }
}
