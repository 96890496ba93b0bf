package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.Registry

/** Similarity search over embedding columns.
  *
  * Exact path: broadcast the (small) probe set against the partitioned
  * embedding corpus and aggregate with the bounded-heap `topk_by`
  * aggregate — partial aggregation keeps k rows per partition, so the
  * shuffle is O(k × partitions), not O(corpus × probes). This is the
  * brute-force baseline that stays correct at any corpus size.
  *
  * Approximate path: random-hyperplane LSH bucket equi-join (optionally
  * multi-probe: flip each bucket bit once to lift recall) — candidate
  * generation never leaves an equi-join, the 100 TB-safe shape.
  */
object Similarity {

  /** Cosine similarity column (double vectors). */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Exact top-k neighbors per probe. Output:
    * (probe_id, rank, vec_id, sim) with rank 1..k, ties by ascending id.
    */
  def bruteForceTopK(emb: DataFrame, probes: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val e = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"))
    val scored = e.crossJoin(broadcast(p))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        cosine(col("probe_vec"), col("cand_vec")).as("sim"))
    explodeTopK(
      scored.groupBy("probe_id")
        .agg(call_function("topk_by", col("sim"), col("cand_id"), lit(k)).as("top")))
  }

  /** Approximate top-k via sign-bit LSH buckets. `multiProbe` flips each
    * of the probe's bucket bits once (bits+1 buckets per probe), trading
    * compute for recall. Output schema matches [[bruteForceTopK]]; rows
    * may be missing for probes whose buckets are sparse — the standard
    * ANN recall trade-off.
    */
  def lshTopK(emb: DataFrame, probes: DataFrame,
              idCol: String, vecCol: String, k: Int,
              bits: Int = 16, multiProbe: Boolean = true,
              seed: Long = Registry.DefaultSeed): DataFrame = {
    val e = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"),
      call_function("sign_bits", col(vecCol), lit(bits), lit(seed)).as("bucket"))
    val pb = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      call_function("sign_bits", col(vecCol), lit(bits), lit(seed)).as("bucket0"))
    val p =
      if (!multiProbe) pb.select(col("probe_id"), col("probe_vec"), col("bucket0").as("bucket"))
      else pb.select(col("probe_id"), col("probe_vec"),
        explode(array_union(
          array(col("bucket0")),
          array((0 until bits).map(b =>
            col("bucket0").bitwiseXOR(lit(1L << b))): _*))).as("bucket"))
    val scored = e.join(p, "bucket")
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        cosine(col("probe_vec"), col("cand_vec")).as("sim"))
    explodeTopK(
      scored.groupBy("probe_id")
        .agg(call_function("topk_by", col("sim"), col("cand_id"), lit(k)).as("top")))
  }

  /** Exact rerank of an ANN candidate list — the refine stage of the
    * production retrieve-then-rerank pattern (IVF×PQ ADC shortlists k′
    * candidates cheaply; the final top-k is decided by TRUE cosine on
    * the original vectors, fixing ADC's quantization error). Cost: one
    * equi-join of the shortlist (|probes| × k′ rows) against the corpus
    * — at 1e11 rows the shortlist is the tiny side and broadcasts; the
    * probes side is bounded by construction. Ranking reuses the
    * bounded-heap `topk_by` (never a rank window).
    *
    * @param candidates (probe_id, vec_id) shortlist, e.g.
    *                   [[graft.ops.Pq.ivfpqTopK]] output
    */
  def rerankExact(candidates: DataFrame, emb: DataFrame, probes: DataFrame,
                  idCol: String, vecCol: String, k: Int): DataFrame = {
    val e = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val scored = candidates.select(col("probe_id"), col("vec_id").as("cand_id"))
      .join(e, "cand_id")
      .join(broadcast(p), "probe_id")
      .select(col("probe_id"), col("cand_id"),
        cosine(col("probe_vec"), col("cand_vec")).as("sim"))
    explodeTopK(
      scored.groupBy("probe_id")
        .agg(call_function("topk_by", col("sim"), col("cand_id"), lit(k)).as("top")))
  }

  private def explodeTopK(grouped: DataFrame): DataFrame =
    grouped
      .select(col("probe_id"), posexplode(col("top")).as(Seq("rank0", "hit")))
      .select(col("probe_id"), (col("rank0") + 1).as("rank"),
        col("hit.id").as("vec_id"), col("hit.sim").as("sim"))
}
