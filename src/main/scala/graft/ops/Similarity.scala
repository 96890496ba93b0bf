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

  /** Random-projection embedding compression (s21) — the cheap tier
    * below PQ: the Achlioptas/JL ±1 sign projection
    * `y_j = Σ_i s_ij · x_i`, with signs derived deterministically from
    * md5 over `(seed, j, i)` (first digest byte's low bit) — the same
    * derivation is expressible in any engine carrying md5, so a
    * verifier can rebuild the exact matrix from the three integers
    * alone; no RNG state anywhere.
    *
    * Scale shape (100 TB discipline): the sign matrix is PRECOMPUTED
    * driver-side (outDim × inDim doubles — kilobytes, a broadcast
    * literal inside the plan), so the encode is pure map-side
    * arithmetic per row (`zip_with` + `aggregate`, whole-stage
    * codegen'd): zero shuffles, zero lookups, compression ratio
    * inDim/outDim (e.g. 64 → 16 floats). Cosine in the compressed
    * space approximates the original (JL lemma); callers gate recall
    * against the in-plan exact top-k — the s02/s03 contract.
    *
    * Output: (idCol, rp_vec array<double> of length outDim).
    */
  def randomProjection(emb: DataFrame, idCol: String, vecCol: String,
                       inDim: Int, outDim: Int,
                       seed: Long = Registry.DefaultSeed): DataFrame = {
    require(inDim > 0 && outDim > 0 && outDim <= inDim,
      s"randomProjection needs 0 < outDim <= inDim, got $outDim/$inDim")
    def sign(j: Int, i: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${seed}_${j}_$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
    val comps: Seq[Column] = (0 until outDim).map { j =>
      val signs = (0 until inDim).map(i => sign(j, i)).toArray
      aggregate(
        zip_with(col(vecCol), typedLit(signs),
          (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
    }
    emb.select(col(idCol), array(comps: _*).as("rp_vec"))
  }

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

  /** Semi-hard negative mining for contrastive training (the
    * FaceNet/SBERT band): for each (anchor, positive) pair, the top-k
    * corpus vectors — excluding the anchor and its positive — whose
    * anchor-similarity falls in the semi-hard band
    * [pos_sim − margin, pos_sim): harder than random, easier than the
    * positive, i.e. the negatives that actually move a
    * triplet/contrastive loss. Output: (anchor_id, pos_id, rank,
    * neg_id, sim, pos_sim), rank 1..k per PAIR by sim DESC with
    * ascending-id ties — two pairs sharing an anchor each get their
    * own band.
    *
    * Scale shape (100 TB discipline): the pair set is the bounded probe
    * side — its anchor/positive vectors bind through two joins where
    * the PAIRS side broadcasts (the corpus side stays map-side, never
    * shuffles), candidates score in one broadcast pass over the corpus,
    * the band filter runs before any aggregation, and the only exchange
    * is the k-bounded `topk_by` heap aggregation per anchor. No rank
    * window over the corpus, no CartesianProduct.
    */
  def hardNegatives(emb: DataFrame, pairs: DataFrame, idCol: String,
                    vecCol: String, anchorCol: String, posCol: String,
                    k: Int, margin: Double): DataFrame = {
    val pSel = pairs.select(col(anchorCol).as("anchor_id"),
      col(posCol).as("pos_id"))
    val av = emb.select(col(idCol).as("__aid"), col(vecCol).as("anchor_vec"))
    val pv = emb.select(col(idCol).as("__pid"), col(vecCol).as("pos_vec"))
    // bind the pair vectors: broadcast the PAIR side — the corpus scans
    // map-side; each join's output is pair-sized
    val pr = av.join(broadcast(pSel), col("anchor_id") === col("__aid"))
      .select(col("anchor_id"), col("pos_id"), col("anchor_vec"))
    val prFull = pv.join(broadcast(pr), col("pos_id") === col("__pid"))
      .select(col("anchor_id"), col("pos_id"), col("anchor_vec"),
        cosine(col("anchor_vec"), col("pos_vec")).as("pos_sim"))
    val e = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"))
    val scored = e.crossJoin(broadcast(prFull))
      .filter(col("cand_id") =!= col("anchor_id") &&
        col("cand_id") =!= col("pos_id"))
      .select(col("anchor_id"), col("pos_id"), col("pos_sim"),
        col("cand_id"),
        cosine(col("anchor_vec"), col("cand_vec")).as("sim"))
      .filter(col("sim") < col("pos_sim") &&
        col("sim") >= col("pos_sim") - lit(margin))
    // group by the PAIR, not just the anchor — two pairs sharing an
    // anchor (even with equal pos_sim) each get their own top-k band;
    // pos_id rides through the output so pairs stay distinguishable
    scored.groupBy("anchor_id", "pos_id", "pos_sim")
      .agg(call_function("topk_by", col("sim"), col("cand_id"), lit(k))
        .as("top"))
      .select(col("anchor_id"), col("pos_id"), col("pos_sim"),
        posexplode(col("top")).as(Seq("rank0", "hit")))
      .select(col("anchor_id"), col("pos_id"),
        (col("rank0") + 1).cast("long").as("rank"),
        col("hit.id").as("neg_id"), col("hit.sim").as("sim"),
        col("pos_sim"))
  }
}
