package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Symmetric int8 scalar quantization of embedding columns — the storage/
  * bandwidth compression step of a large-scale vector pipeline (4x
  * smaller than float32, 8x smaller than the double arrays Spark
  * shuffles; reconstruction error bounded by scale/2 per element).
  *
  * Convention: `scale = max|v| / 127`, `q_i = round(v_i / scale)` in
  * [-127, 127], dequantized as `q_i * scale`. Everything is a pure
  * expression tree — map-only, codegen'd, no shuffle, no UDF — so
  * quantization composes freely with scans and writes at any scale.
  */
object Quantize {

  /** Appends `q_scale` (double) and `q` (array<long> in [-127, 127]) for
    * `vecCol`. Zero vectors get q_scale = 0 and an all-zero q (guarded —
    * the unguarded division would produce NaN).
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val mx = array_max(transform(v, x => abs(x)))
    df.withColumn("q_scale", (mx / lit(127.0)))
      .withColumn("q",
        when(col("q_scale") === 0.0, transform(v, _ => lit(0L)))
          .otherwise(transform(v, x => round(x / col("q_scale")).cast("long"))))
  }

  /** Reconstructed double vector from a quantized column pair. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Cosine similarity of two quantized vectors: the dot product and the
    * two squared norms are EXACT integer arithmetic (the whole scan side
    * of a quantized ANN runs on int8 payloads); only the final
    * normalization touches floating point. The per-vector scales cancel
    * out of cosine entirely.
    */
  def cosineQuantized(qa: Column, qb: Column): Column = {
    val dot = aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (a, x) => a + x)
    val na = aggregate(transform(qa, x => x * x), lit(0L), (a, x) => a + x)
    val nb = aggregate(transform(qb, x => x * x), lit(0L), (a, x) => a + x)
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
  }

  /** Brute-force top-k neighbors over int8-quantized vectors — the
    * compressed-corpus variant of [[Similarity.bruteForceTopK]]: 8x less
    * data broadcast/scanned, ranking by [[cosineQuantized]]. Same output
    * shape (probe_id, rank, vec_id, sim).
    */
  def bruteForceTopKQuantized(emb: DataFrame, probes: DataFrame,
                              idCol: String, vecCol: String, k: Int): DataFrame = {
    val qe = quantizeInt8(emb, vecCol)
      .select(col(idCol).as("cand_id"), col("q").as("cand_q"))
    val qp = quantizeInt8(probes, vecCol)
      .select(col(idCol).as("probe_id"), col("q").as("probe_q"))
    val scored = qe.crossJoin(broadcast(qp))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        cosineQuantized(col("probe_q"), col("cand_q")).as("sim"))
    scored.groupBy("probe_id")
      .agg(call_function("topk_by", col("sim"), col("cand_id"), lit(k)).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("rank0", "hit")))
      .select(col("probe_id"), (col("rank0") + 1).cast("long").as("rank"),
        col("hit.id").as("vec_id"), col("hit.sim").as("sim"))
  }
}
