package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-duplicate PAIRS (the output of
  * [[Dedup.nearDupJaccard]], [[Dedup.embeddingPairs]], …) into connected
  * components so a pipeline can keep exactly one canonical document per
  * duplicate cluster. Pair detection alone is not a dedup policy — if
  * A~B and B~C, dropping "the second of each pair" can drop B twice or
  * keep A and C which were never compared; components make the keep
  * decision well-defined (cluster id = min member id, canonical = the
  * member equal to it).
  */
object Clustering {

  /** Connected components over an undirected pair list.
    *
    * Algorithm: min-label propagation with path doubling (pointer
    * jumping) — the simpler cousin of the alternating small-star /
    * large-star family (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC 2014; public algorithm), chosen
    * because each round maps to two plain equi-joins + one aggregate
    * that Catalyst plans with map-side partial min. Each round
    * every node takes the minimum label among itself and its neighbors
    * (one shuffle: edges ⋈ labels, groupBy node), then shortcuts
    * label := label(label) (one self-join), which squares the distance
    * labels travel per round — convergence in O(log diameter) rounds
    * rather than O(diameter) for plain propagation. Each round ends in
    * a localCheckpoint: lineage stays constant-depth instead of growing
    * per iteration (the classic iterative-Spark plan explosion), at the
    * documented cost of re-running the job on executor loss.
    *
    * Scale shape (100 TB): the iteration runs ONLY over nodes that
    * appear in some pair — duplicate-graph size, not corpus size; the
    * full corpus is touched exactly once by the final left join that
    * fills in singleton clusters. Every per-round shuffle keys on node
    * id (naturally spread); hot nodes (a label shared by a huge cluster)
    * cost one groupBy with map-side partial min, never a window sort.
    * Convergence needs one count() action per round — inherent to
    * fixpoint graph algorithms; rounds are logarithmic and each is a
    * bounded number of shuffles.
    *
    * @param vertices every corpus row (singletons come back as their own
    *                 cluster); only `idCol` is read
    * @param pairs    undirected duplicate pairs with columns id_a, id_b
    * @return (idCol, cluster, is_canonical) — cluster = min id of the
    *         component, is_canonical marks the representative member
    */
  def connectedComponents(vertices: DataFrame, idCol: String,
                          pairs: DataFrame, maxRounds: Int = 40): DataFrame = {
    // materialize the edge list ONCE: the pair frame is typically the
    // output of an expensive candidate/verify pipeline, and every round
    // references edges — without this the whole upstream plan re-executes
    // per round (measured 15x slowdown on d08's O(n²) pair input)
    val edges = pairs.select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .union(pairs.select(col("id_b").cast("long").as("u"), col("id_a").cast("long").as("v")))
      .localCheckpoint(true)
    var labels = edges.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
      .localCheckpoint(true)
    // per-node labels only ever decrease, so the label total is strictly
    // monotone until the fixpoint: an unchanged sum IS convergence. One
    // cheap aggregate per round instead of a diff join; decimal(38,0)
    // cannot overflow for any realistic (count, id) range.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lab").cast("decimal(38,0)")).as("s")).head.getDecimal(0)
    var round = 0
    var converged = labels.isEmpty
    var curSum = if (converged) null else labelSum(labels)
    while (!converged && round < maxRounds) {
      val nbrMin = edges.join(labels, edges("v") === labels("id"))
        .groupBy(col("u")).agg(min(col("lab")).as("nlab"))
      val prop = labels.join(nbrMin, labels("id") === nbrMin("u"), "left")
        .select(labels("id").as("id"),
          least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"))
      // path doubling: adopt the label's own current label
      val next = prop.as("a")
        .join(prop.as("b"), col("a.lab") === col("b.id"), "left")
        .select(col("a.id").as("id"),
          coalesce(col("b.lab"), col("a.lab")).as("lab"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(curSum) == 0
      curSum = nextSum
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    vertices.select(col(idCol))
      .join(labels.withColumnRenamed("id", "__cid"),
        col(idCol).cast("long") === col("__cid"), "left")
      .select(col(idCol),
        coalesce(col("lab"), col(idCol).cast("long")).as("cluster"),
        (coalesce(col("lab"), col(idCol).cast("long")) === col(idCol).cast("long"))
          .as("is_canonical"))
  }

  /** The keep-side of cluster dedup: one canonical row per duplicate
    * cluster (the min-id member), singletons included. Equivalent to
    * `connectedComponents(...).filter(is_canonical)` joined back to the
    * full rows — a left-semi join so no payload columns shuffle.
    */
  def keepCanonical(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val canon = connectedComponents(df, idCol, pairs)
      .filter(col("is_canonical")).select(col(idCol))
    df.join(canon, Seq(idCol), "left_semi")
  }
}
