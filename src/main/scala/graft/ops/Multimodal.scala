package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns next to typed metadata, the standard shape for image/audio at
  * 100 TB (parquet binary + pushdown-able metadata columns; the payload
  * bytes never pass through a shuffle unless explicitly selected).
  *
  * The container ships no image/audio codecs, so the *decode kernel* here
  * is a clearly-marked deterministic STUB — but the Spark-side plumbing
  * (schema, binary columns, batched partition-wise decode, feature
  * struct) is real and tested.
  */
object Multimodal {

  /** Decoded-media feature row (what a real codec would emit). */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      mean_byte: Double)

  /** Attach a binary payload column (here: utf-8 bytes of a text column,
    * standing in for image bytes).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, col(srcCol).cast("binary"))

  /** Expression-only metadata "decode": cheap header-ish facts derivable
    * without a codec (payload size + synthetic dimensions). Map-only and
    * oracle-checkable.
    */
  def metaDecode(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(binCol)).as("n_bytes"),
      (octet_length(col(binCol)) % 512 + 1).as("width"),
      (octet_length(col(binCol)) * 7 % 384 + 1).as("height"),
      lit(3).as("channels"))

  /** Batched partition-wise decode. STUB: a real implementation would call
    * an image codec here (per-partition, reusing a decoder instance, the
    * same shape a JNI/FFI codec binding needs). The fake is deterministic
    * in the payload bytes so tests can assert on it.
    */
  def decodeStub(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec instance would be created once per partition here
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          var sum = 0L
          var i = 0
          val m = math.min(n, 64)
          while (i < m) { sum += bytes(i) & 0xff; i += 1 }
          MediaFeatures(
            doc_id = id,
            n_bytes = n,
            width = n % 512 + 1,
            height = n * 7 % 384 + 1,
            channels = 3,
            mean_byte = if (m == 0) 0.0 else sum.toDouble / m)
        }
      }
  }
}
