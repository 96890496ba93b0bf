package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.functions.Registry

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

  /** Require ids 0..n-1 all present below n — the seeded-quantizer
    * contract. A non-contiguous (or non-numeric) corpus would silently
    * yield a skewed, undersized codebook; fail loudly instead. One
    * pushed-down count-distinct over id < n — cheap (predicate reaches
    * the scan) and run once at build time, not per search.
    */
  private def requireSeedIds(df: DataFrame, idCol: String, n: Int,
                             what: String): Unit = {
    val found = df.filter(col(idCol) < n)
      .select(count_distinct(col(idCol))).first().getLong(0)
    require(found == n,
      s"$what expects contiguous numeric ids 0..${n - 1}; " +
        s"found $found distinct ids < $n")
  }

  /** Deterministic seeded codebook: the subvectors of the vectors with
    * id < k (ids must be numeric and contiguous from 0 — enforced).
    * (s, cid, cvec) — m×k rows, map-only to build, broadcastable
    * everywhere it is consumed. Production refines this seed with
    * [[refineCodebook]]; the seed stays the strict-oracle tier.
    */
  def seededCodebook(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int, k: Int): DataFrame = {
    requireSeedIds(df, idCol, k, "seededCodebook")
    subvectors(df.filter(col(idCol) < k), idCol, vecCol, dim, m)
      .select(col("s"), col(idCol).cast("long").as("cid"),
        col("sv").as("cvec"))
  }

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

  /** Lloyd-refined PQ codebook — the production recall path above the
    * seeded strict-oracle tier. Each iteration assigns every corpus
    * subvector to its nearest current centroid (broadcast join + the
    * map-side-combined `min(struct(d, cid))` argmin, carrying the
    * subvector through with `first` — all rows in a (vector, subspace)
    * group share it), then recomputes each (subspace, centroid) mean with
    * the `vec_sum` aggregate: one dims-length array per (cell, partition)
    * shuffles, never an exploded corpus (the [[Ivf.lloydStep]] shape).
    * The m×k codebook collects to the driver each iteration (a few KB) so
    * lineage stays flat over iterations; empty cells keep their previous
    * centroid. Deterministic for fixed data; refinement changes recall,
    * not plan shapes.
    */
  def refineCodebook(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int, k: Int, iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    Registry.registerAll(spark)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cvec", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = false), nullable = false)))
    def toDf(cb: Seq[((Int, Long), Seq[Double])]): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(cb.map { case ((s, cid), v) =>
          org.apache.spark.sql.Row(s, cid, v) }: _*), schema)
    var cb: Seq[((Int, Long), Seq[Double])] =
      seededCodebook(df, idCol, vecCol, dim, m, k).collect().toSeq
        .map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2)))
    var it = 0
    while (it < iters) {
      val assigned = subvectors(df, idCol, vecCol, dim, m)
        .join(broadcast(toDf(cb)), "s")
        .select(col(idCol), col("s"), col("sv"),
          struct(d2fp(col("sv"), col("cvec")).as("d"), col("cid")).as("__dc"))
        .groupBy(col(idCol), col("s"))
        .agg(min(col("__dc")).as("__best"), first(col("sv")).as("sv"))
      val refined = assigned
        .groupBy(col("s"), col("__best.cid").as("cid"))
        .agg(call_function("vec_sum", col("sv")).as("vs"), count(lit(1)).as("n"))
        .select(col("s"), col("cid"),
          transform(col("vs"), x => x / col("n")).as("cvec"))
        .collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2))).toMap
      cb = cb.map { case (key, old) => (key, refined.getOrElse(key, old)) }
      it += 1
    }
    toDf(cb)
  }

  /** Deterministic seeded coarse quantizer for IVF×PQ: the full vectors
    * with id < nlist as cell centroids (ids contiguous from 0 —
    * enforced). (cell_cid, cell_cvec) — broadcastable. Production swaps
    * in [[Ivf.lloydStep]]-refined centroids; shapes and determinism are
    * unchanged.
    */
  def seededCoarseCentroids(df: DataFrame, idCol: String, vecCol: String,
                            nlist: Int): DataFrame = {
    requireSeedIds(df, idCol, nlist, "seededCoarseCentroids")
    df.filter(col(idCol) < nlist)
      .select(col(idCol).cast("long").as("cell_cid"),
        col(vecCol).cast("array<double>").as("cell_cvec"))
  }

  /** The `take` nearest cells per row by fixed-point distance — `take`=1
    * assigns the corpus to cells via a map-side-combined argmin aggregate
    * (the same `min(struct(d, cid))` idiom as [[encode]]); `take`=nprobe
    * selects a probe's search cells via the bounded-heap `topk_by`
    * aggregate. Never a rank window: a row_number() formulation would
    * shuffle every scored (row, cell) pair into a single partition per
    * row — the feasible-vs-not difference at 1e11 rows (SCALE.md). The
    * centroid frame broadcasts (nlist rows); ties break to the lowest
    * cell id.
    */
  def nearestCells(df: DataFrame, coarse: DataFrame, idCol: String,
                   vecCol: String, take: Int): DataFrame = {
    Registry.registerAll(df.sparkSession)
    val scored = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(broadcast(coarse))
      .select(col(idCol), col("cell_cid"),
        d2fp(col("__v"), col("cell_cvec")).as("__d"))
    if (take == 1)
      scored.groupBy(col(idCol))
        .agg(min(struct(col("__d"), col("cell_cid"))).as("__best"))
        .select(col(idCol), col("__best.cell_cid").as("cell"))
    else
      scored.groupBy(col(idCol))
        .agg(call_function("topk_by", -col("__d").cast("double"),
          col("cell_cid"), lit(take)).as("top"))
        .select(col(idCol), explode(col("top")).as("hit"))
        .select(col(idCol), col("hit.id").as("cell"))
  }

  /** A persisted IVF×PQ index, loaded by [[loadIndex]]: the four frames
    * [[ivfpqTopK]] consumes. codes and cells come back from bucketed
    * tables (bucketed+sorted on the vector id), codebook and coarse from
    * plain tables (m×k / nlist rows — broadcast wherever consumed).
    */
  final case class PqIndex(codes: DataFrame, cells: DataFrame,
                           codebook: DataFrame, coarse: DataFrame)

  private def indexTables(prefix: String): (String, String, String, String) = {
    val p = prefix.replaceAll("[^A-Za-z0-9_]", "_")
    (s"${p}_codes", s"${p}_cells", s"${p}_codebook", s"${p}_coarse")
  }

  /** Build the full IVF×PQ index (seeded codebook + coarse quantizer, PQ
    * codes, cell assignment) and persist it as catalog tables so the
    * index is a real ARTIFACT: searches read codes/cells back from
    * storage instead of re-encoding the corpus per query — at the 100 TB
    * design point encoding is the expensive pass (a full corpus scan +
    * argmin per subvector) and must be paid once, not per probe batch.
    * codes and cells are bucketed+sorted on the id ([[Skew.writeBucketed]]
    * layout), so the search-side candidate⋈codes equi-join can co-locate
    * without shuffling the stored side.
    */
  def writeIndex(df: DataFrame, idCol: String, vecCol: String,
                 dim: Int, m: Int, k: Int, nlist: Int, prefix: String,
                 buckets: Int = 8): Unit = {
    val (tCodes, tCells, tCodebook, tCoarse) = indexTables(prefix)
    val spark = df.sparkSession
    val cb = seededCodebook(df, idCol, vecCol, dim, m, k)
    val coarse = seededCoarseCentroids(df, idCol, vecCol, nlist)
    cb.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .saveAsTable(dropFirst(spark, tCodebook))
    coarse.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .saveAsTable(dropFirst(spark, tCoarse))
    // re-read the tiny frames so encoding/assignment below runs against
    // the persisted artifacts, not the in-memory lineage
    Skew.writeBucketed(encode(df, spark.table(tCodebook), idCol, vecCol, dim, m),
      tCodes, idCol, buckets)
    Skew.writeBucketed(nearestCells(df, spark.table(tCoarse), idCol, vecCol, take = 1),
      tCells, idCol, buckets)
  }

  private def dropFirst(spark: org.apache.spark.sql.SparkSession,
                        table: String): String = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    table
  }

  /** Load a persisted index written by [[writeIndex]]. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                prefix: String): PqIndex = {
    val (tCodes, tCells, tCodebook, tCoarse) = indexTables(prefix)
    PqIndex(spark.table(tCodes), spark.table(tCells),
      spark.table(tCodebook), spark.table(tCoarse))
  }

  /** Incrementally add vectors to a persisted index: encode and
    * cell-assign ONLY the delta against the STORED codebook/coarse
    * quantizer (held fixed — the standard IVF/PQ maintenance contract),
    * append to the bucketed codes/cells tables. Because per-vector
    * encoding is independent and the quantizers are fixed, the appended
    * index is bit-identical to a from-scratch build over base ∪ delta —
    * which is exactly what s12's oracle proves. Cost is proportional to
    * the DELTA (one scan + broadcast argmin), never the base corpus: the
    * property that makes a 100 TB index maintainable at all.
    */
  def appendIndex(delta: DataFrame, idCol: String, vecCol: String,
                  dim: Int, m: Int, prefix: String, buckets: Int = 8): Unit = {
    val (tCodes, tCells, tCodebook, tCoarse) = indexTables(prefix)
    val spark = delta.sparkSession
    encode(delta, spark.table(tCodebook), idCol, vecCol, dim, m)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(buckets, idCol).sortBy(idCol)
      .format("parquet").saveAsTable(tCodes)
    nearestCells(delta, spark.table(tCoarse), idCol, vecCol, take = 1)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(buckets, idCol).sortBy(idCol)
      .format("parquet").saveAsTable(tCells)
  }

  /** Index DELETE — the other half of maintenance next to
    * [[appendIndex]]: physically remove a set of ids from the persisted
    * index by rewriting the two bucketed DATA tables minus the delete
    * set (broadcast anti-join; the quantizer tables stay frozen, same
    * contract as append). Rewriting — rather than tombstoning —
    * preserves the bucketed layout the search path relies on and keeps
    * reads paying zero filter cost. Cost ∝ index size: at 100 TB run
    * this as the periodic compaction and serve interim deletes from a
    * tombstone side table anti-joined at search time. localCheckpoint
    * materializes the kept rows first so the table can be overwritten
    * while being its own source.
    */
  def deleteFromIndex(ids: DataFrame, idCol: String, prefix: String,
                      buckets: Int = 8): Unit = {
    val spark = ids.sparkSession
    val (tCodes, tCells, _, _) = indexTables(prefix)
    val del = org.apache.spark.sql.functions.broadcast(ids.select(col(idCol)))
    Seq(tCodes, tCells).foreach { t =>
      val kept = spark.table(t).join(del, Seq(idCol), "left_anti")
        .localCheckpoint(true)
      kept.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .bucketBy(buckets, idCol).sortBy(idCol)
        .format("parquet").saveAsTable(t)
    }
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
    adcRank(scored, idCol, k)
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
    adcRank(scored, idCol, k)
  }

  /** Bounded-heap top-k over ADC-scored (probe_id, id, adist_fp) rows:
    * `topk_by` keeps k pairs per partial buffer, so the per-probe shuffle
    * is O(k × partitions), never the full candidate set — the rank-window
    * formulation SCALE.md condemns would shuffle every scored row into
    * one partition per probe. Fixed-point distances enter the heap
    * negated as doubles — exact below 2^53, which round(d²·1e6) is by
    * construction for any realistic embedding magnitude. Ties at equal
    * distance rank by ascending id (the heap's tie rule on the negated
    * score), matching the previous window ORDER BY (adist_fp, id).
    */
  private def adcRank(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    Registry.registerAll(scored.sparkSession)
    scored
      .groupBy(col("probe_id"))
      .agg(call_function("topk_by", -col("adist_fp").cast("double"),
        col(idCol).cast("long"), lit(k)).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("rank0", "hit")))
      .select(col("probe_id"), (col("rank0") + 1).cast("long").as("rank"),
        col("hit.id").as(idCol), (-col("hit.sim")).cast("long").as("adist_fp"))
  }
}
