package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer routes each vector to one of `nlist` centroid cells; a query
  * scans only its `nprobe` closest cells.
  *
  * Scale shape: training runs Lloyd's iterations on a deterministic,
  * bounded sample collected to the driver (standard IVF practice — at
  * 100 TB you sample ~100k vectors, the centroid matrix is a few MB and
  * broadcasts back inside expression literals). Cell assignment is a
  * map-only expression; search is an equi-join on cell id followed by the
  * bounded-heap `topk_by` aggregate. No stage ever shuffles more than
  * (candidates within probed cells) rows.
  *
  * Everything is seeded/deterministic: same data → same centroids → same
  * results, regardless of partitioning.
  */
object Ivf {

  /** Lloyd's k-means on a driver-collected sample. Init: the sample sorted
    * by id, strided to k evenly-spaced picks (deterministic).
    */
  def trainCentroids(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iters: Int = 8,
      maxSample: Int = 20000): Array[Array[Double]] = {
    // Deterministic bounded sample in ONE job — no separate count() scan
    // and no density/numeric assumption on ids: take the maxSample lowest
    // (xxhash64(id), id) rows. TakeOrderedAndProject keeps a bounded heap
    // per partition, so nothing global materializes. The subset is then
    // re-sorted by id so Lloyd's strided init is independent of the hash
    // order — and identical to the full corpus ordered by id whenever
    // n <= maxSample.
    val sample = emb
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(maxSample)
      .orderBy(col(idCol))
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    val dim = sample.head.length
    var centroids = Array.tabulate(nlist)(i => sample((i.toLong * sample.length / nlist).toInt).clone())

    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < nlist) {
        var d = 0.0; var j = 0
        while (j < dim) { val t = v(j) - centroids(c)(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    var it = 0
    while (it < iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        val c = nearest(v)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(nlist) { c =>
        if (counts(c) == 0) centroids(c) // keep empty cells stable
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    centroids
  }

  /** Literal array<struct<cid,cv>> of the centroid matrix. */
  /** One DISTRIBUTED Lloyd iteration over the FULL corpus: assign every
    * vector to its nearest current centroid (map-only expression), then
    * recompute each cell's mean with the `vec_sum` aggregate — one
    * map-side-combined shuffle of nlist × dims doubles per partition,
    * never an exploded corpus. Use after [[trainCentroids]] when the
    * driver-sample quantizer should be refined against all data: the
    * sample bounds the driver memory, the refinement touches every
    * vector but only ever aggregates.
    *
    * Empty cells keep their previous centroid (same stability rule as
    * the in-driver loop).
    */
  def lloydStep(emb: DataFrame, vecCol: String,
                centroids: Array[Array[Double]]): Array[Array[Double]] = {
    graft.functions.Registry.registerAll(emb.sparkSession)
    val refined = emb
      .select(cellOf(col(vecCol), centroids).as("cid"),
        col(vecCol).cast("array<double>").as("v"))
      .groupBy(col("cid"))
      .agg(call_function("vec_sum", col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("cid"),
        transform(col("s"), x => x / col("n")).as("c"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    Array.tabulate(centroids.length)(c => refined.getOrElse(c, centroids(c)))
  }

  private def centroidLiteral(centroids: Array[Array[Double]]): Column =
    array(centroids.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), array(c.map(lit(_)): _*).as("cv"))
    }: _*)

  /** Cell id of the closest centroid (max cosine; ties -> lowest cid). */
  def cellOf(vec: Column, centroids: Array[Array[Double]]): Column =
    aggregate(
      centroidLiteral(centroids),
      struct(lit(-1).as("cid"), lit(Double.NegativeInfinity).as("s")),
      (acc, c) => {
        val s = call_function("cosine_sim", vec.cast("array<double>"), c.getField("cv"))
        when(s > acc.getField("s"),
          struct(c.getField("cid").as("cid"), s.as("s"))).otherwise(acc)
      }).getField("cid")

  /** The `nprobe` closest cell ids for a query vector (ascending score
    * tie-break by cid — deterministic).
    */
  private def probeCells(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val scored = transform(centroidLiteral(centroids), c =>
      struct((lit(0.0) - call_function("cosine_sim", vec.cast("array<double>"), c.getField("cv"))).as("negs"),
        c.getField("cid").as("cid")))
    transform(slice(array_sort(scored), 1, nprobe), x => x.getField("cid"))
  }

  /** IVF top-k search. Output: (probe_id, rank, vec_id, sim), rank 1..k.
    * Recall is governed by nprobe/nlist (cells scanned).
    */
  def topK(
      emb: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Array[Array[Double]],
      nprobe: Int = 4): DataFrame = {
    val e = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"),
      cellOf(col(vecCol), centroids).as("cell"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      explode(probeCells(col(vecCol), centroids, nprobe)).as("cell"))
    val scored = e.join(p, "cell")
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        Similarity.cosine(col("probe_vec").cast("array<double>"),
          col("cand_vec").cast("array<double>")).as("sim"))
    scored.groupBy("probe_id")
      .agg(call_function("topk_by", col("sim"), col("cand_id"), lit(k)).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("rank0", "hit")))
      .select(col("probe_id"), (col("rank0") + 1).cast("long").as("rank"),
        col("hit.id").as("vec_id"), col("hit.sim").as("sim"))
  }
}
