package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Product quantization (PQ) for billion-scale vector search — the
  * compression tier above int8 scalar quantization ([[Quantize]]) and the
  * partition tier of IVF ([[Ivf]]): each vector is split into `m`
  * subvectors, each subvector replaced by the id of its nearest codebook
  * centroid, so a d-dim float vector stores as m small codes
  * (64 dims × 4 B → 4 B at m=4/k≤256, a 64× compression), and query
  * scoring reduces to m table lookups per candidate (ADC — asymmetric
  * distance computation).
  *
  * Determinism/verifiability contract (same discipline as s04/s06/s07):
  * distances enter integer domain as FIXED-POINT round(d²·1e6) longs at
  * the per-(subvector, centroid) grain, so code assignment (argmin) and
  * ADC sums (integer additions) are bit-reproducible on any IEEE engine,
  * immune to partition summation order. The codebook here is seeded
  * deterministically from the first `k` corpus vectors; production would
  * refine it with per-subspace Lloyd steps ([[Ivf.lloydStep]] on the
  * subvector frame) — refinement changes recall, not any of the plan
  * shapes or the determinism contract.
  *
  * Scale shape: codebook is m×k rows (broadcast); encoding is one
  * broadcast join + keyed argmin per (vector, subspace) — shuffle carries
  * (id, s, 8-byte fp distances), never raw vectors twice; ADC is a
  * broadcast join of the m×k probe distance table against the code
  * frame + an integer-sum aggregation on (probe, vector).
  */
object Pq {

  /** Split each vector into `m` subvectors: (idCol, s, sv). Map-only. */
  def subvectors(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                 m: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    df.select(col(idCol), explode(transform(sequence(lit(0), lit(m - 1)),
        s => struct(s.as("s"),
          slice(col(vecCol).cast("array<double>"), s * sub + 1, lit(sub)).as("sv"))))
        .as("__x"))
      .select(col(idCol), col("__x.s").as("s"), col("__x.sv").as("sv"))
  }

  /** Fixed-point squared L2 distance between two equal-length arrays:
    * round(Σ(a-b)²·1e6) as long. The fold is sequential left-to-right —
    * the same element order any SQL engine's list fold uses.
    */
  private def d2fp(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x) * 1e6).cast("long")

  /** Deterministic seeded codebook: the subvectors of the vectors with
    * id < k (ids must be numeric; the corpus convention is contiguous
    * ids from 0). (s, cid, cvec) — m×k rows, map-only to build,
    * broadcastable everywhere it is consumed.
    */
  def seededCodebook(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int, k: Int): DataFrame =
    subvectors(df.filter(col(idCol) < k), idCol, vecCol, dim, m)
      .select(col("s"), col(idCol).cast("long").as("cid"),
        col("sv").as("cvec"))

  /** PQ-encode every vector: (idCol, s, code) — the id of the nearest
    * codebook centroid per subspace, ties to the lowest centroid id.
    */
  def encode(df: DataFrame, codebook: DataFrame, idCol: String,
             vecCol: String, dim: Int, m: Int): DataFrame = {
    val sv = subvectors(df, idCol, vecCol, dim, m)
    val scored = sv.join(broadcast(codebook), "s")
      .select(col(idCol), col("s"),
        struct(d2fp(col("sv"), col("cvec")).as("d"), col("cid")).as("__dc"))
    scored.groupBy(col(idCol), col("s"))
      .agg(min(col("__dc")).as("__best"))
      .select(col(idCol), col("s"), col("__best.cid").as("code"))
  }

  /** Deterministic seeded coarse quantizer for IVF×PQ: the full vectors
    * with id < nlist as cell centroids. (cell_cid, cell_cvec) —
    * broadcastable. Production swaps in [[Ivf.lloydStep]]-refined
    * centroids; shapes and determinism are unchanged.
    */
  def seededCoarseCentroids(df: DataFrame, idCol: String, vecCol: String,
                            nlist: Int): DataFrame =
    df.filter(col(idCol) < nlist)
      .select(col(idCol).cast("long").as("cell_cid"),
        col(vecCol).cast("array<double>").as("cell_cvec"))

  /** Rank every (row, cell) pair by fixed-point distance and keep the
    * `take` nearest cells per row — `take`=1 assigns vectors to cells,
    * `take`=nprobe selects a probe's search cells. The centroid frame
    * broadcasts (nlist rows); ties break to the lowest cell id.
    */
  def nearestCells(df: DataFrame, coarse: DataFrame, idCol: String,
                   vecCol: String, take: Int): DataFrame = {
    val scored = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(broadcast(coarse))
      .select(col(idCol), col("cell_cid"),
        d2fp(col("__v"), col("cell_cvec")).as("__d"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__d"), col("cell_cid"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= take)
      .select(col(idCol), col("cell_cid").as("cell"))
  }

  /** IVF×PQ search — the production billion-scale ANN stack: a coarse
    * quantizer restricts each probe to its `nprobe` nearest cells, then
    * ADC ranks only the candidates living there. Candidate volume is
    * corpus × nprobe/nlist instead of the full corpus; every stage stays
    * in the fixed-point integer domain, so the entire two-level pipeline
    * is re-derivable by an external engine (s09's oracle does).
    * Output: (probe_id, rank, idCol, adist_fp).
    */
  def ivfpqTopK(codes: DataFrame, codebook: DataFrame, cells: DataFrame,
                coarse: DataFrame, probes: DataFrame, idCol: String,
                vecCol: String, dim: Int, m: Int, nprobe: Int,
                k: Int): DataFrame = {
    val probeCells = nearestCells(probes, coarse, idCol, vecCol, nprobe)
      .withColumnRenamed(idCol, "probe_id")
    val cand = cells.join(probeCells, "cell")
      .filter(col(idCol) =!= col("probe_id"))
      .select(col("probe_id"), col(idCol))
    val dtable = subvectors(probes, idCol, vecCol, dim, m)
      .withColumnRenamed(idCol, "probe_id")
      .join(broadcast(codebook), "s")
      .select(col("probe_id"), col("s"), col("cid"),
        d2fp(col("sv"), col("cvec")).as("pd"))
    val withCodes = cand.join(codes, idCol)
    val scored = withCodes.join(broadcast(dtable),
        withCodes("probe_id") === dtable("probe_id") &&
          withCodes("s") === dtable("s") &&
          withCodes("code") === dtable("cid"))
      .groupBy(withCodes("probe_id"), withCodes(idCol))
      .agg(sum(col("pd")).as("adist_fp"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist_fp"), col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col(idCol), col("adist_fp"))
  }

  /** ADC top-k: for each probe, the `k` vectors with the smallest sum of
    * per-subspace fixed-point distances probe→centroid(code). Integer
    * sums — order-independent; ties rank by ascending vector id.
    * Output: (probe_id, rank, idCol, adist_fp).
    */
  def adcTopK(codes: DataFrame, codebook: DataFrame, probes: DataFrame,
              idCol: String, vecCol: String, dim: Int, m: Int,
              k: Int): DataFrame = {
    val dtable = subvectors(probes, idCol, vecCol, dim, m)
      .withColumnRenamed(idCol, "probe_id")
      .join(broadcast(codebook), "s")
      .select(col("probe_id"), col("s"), col("cid"),
        d2fp(col("sv"), col("cvec")).as("pd"))
    val scored = codes.join(broadcast(dtable),
        codes("s") === dtable("s") && codes("code") === dtable("cid"))
      .filter(col(idCol) =!= col("probe_id"))
      .groupBy(col("probe_id"), col(idCol))
      .agg(sum(col("pd")).as("adist_fp"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist_fp"), col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col(idCol), col("adist_fp"))
  }
}
