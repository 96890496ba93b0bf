package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling / splitting operators for training-data
  * pipelines.
  *
  * Everything here is a pure function of the row's id — no RNG state, no
  * partition dependence — so splits are reproducible across runs,
  * engines, and cluster sizes, and a document keeps its split when the
  * corpus around it changes (the property that keeps eval sets
  * uncontaminated as data grows). The hash is the first 16 bits of
  * md5(id-as-string): md5 hex is identical in Spark and standard SQL
  * engines, so assignments are verifiable externally.
  *
  * Scale shape: split tagging and hash sampling are map-only expressions;
  * per-group quota is one shuffle on the group key (window row_number) —
  * all safe at any corpus size.
  */
object Sampling {

  private val Buckets = 65536 // 16 bits of md5 -> 4 hex chars

  /** Fixed-width lowercase-hex bucket of a row id in [0, 65536), as a
    * string whose lexicographic order equals numeric order.
    */
  def hashBucket(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 4)

  /** Numeric bucket threshold in [0, Buckets]; Buckets means "keep all". */
  private def bucketThreshold(cum: Double): Long =
    math.min(Buckets.toLong, math.max(0L, math.floor(cum * Buckets).toLong))

  /** `hash < threshold` as a Column. A threshold at/above Buckets would
    * render as the 5-char hex "10000", which sorts BELOW buckets starting
    * with a-f and silently kept ~6.3% of rows — so the full range is
    * short-circuited to a constant true predicate instead.
    */
  private def belowThreshold(h: Column, thr: Long): Column =
    if (thr >= Buckets) lit(true) else h < lit(f"$thr%04x")

  /** Neyman-optimal sampling allocation (Neyman 1934; the standard
    * survey-sampling result): under a total budget of `budget` labeled
    * rows, stratum h gets n_h ∝ N_h·σ_h — large AND internally diverse
    * strata earn more of the budget. The per-stratum weight is computed
    * EXACTLY in integers via the identity
    *
    *   N_h·σ_h = sqrt(N_h·Σx² − (Σx)²)       (σ = population std dev)
    *
    * so the only non-integer step is one floor(sqrt(integer)) — safe
    * cross-engine because a correctly-rounded double sqrt of an integer
    * below 2^50 can only land ON an integer when the input is a perfect
    * square. The final allocation is truncating-integer
    * `budget·w_h / Σw` (matching SQL integer division in both engines).
    * One grouped aggregation + one broadcast total — allocation cost is
    * O(strata), independent of row count.
    *
    * Output per stratum: `n_rows`, `w_fp` (the integer Neyman weight),
    * `alloc` (rows of the budget). Sum of allocations can fall short of
    * the budget by up to (strata − 1) rows from truncation — callers
    * wanting exhaustion give the remainder to the largest stratum.
    */
  def neymanAllocation(df: DataFrame, strataCol: String, valueCol: String,
                       budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    // rows with a null value carry no variance information and are
    // excluded from BOTH the count and the sums — mixing count(*) with
    // null-skipping sums would silently inflate null-heavy strata.
    // Rows with a NULL STRATUM are excluded too: [[neymanSample]]'s
    // equi-join gate can never match them (NULL != NULL), so reserving
    // budget for a null stratum here would silently strand it — the
    // allocation and the gate must agree on the population
    val x = col(valueCol).cast("long")
    // the radicand N·Σx² − (Σx)² is quadratic in the data: sums go
    // through DECIMAL(38,0) (exact, the §2 sum-overflow discipline) so
    // a large stratum widens instead of wrapping a long negative
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    // widen BEFORE multiplying: x*x in LONG wraps for |x| >= ~3.04e9
    // (epoch-micros, large byte counts) and the cast can't undo it —
    // decimal operands keep the product itself exact (d38×d38 → 38,0)
    val xd = x.cast(d)
    val g = df.filter(x.isNotNull && col(strataCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(xd).as("__s1"), sum(xd * xd).as("__s2"))
      .withColumn("w_fp",
        floor(sqrt((col("n_rows").cast(d) * col("__s2") -
          col("__s1") * col("__s1")).cast("double"))).cast("long"))
      .drop("__s1", "__s2")
    val tot = g.agg(sum(col("w_fp")).as("__wsum"))
    g.join(broadcast(tot))
      .withColumn("alloc",
        when(col("__wsum") > 0,
          expr(s"$budget * w_fp DIV __wsum")).otherwise(lit(0L)))
      .drop("__wsum")
  }

  /** Execute a [[neymanAllocation]]: keep a deterministic md5-bucket
    * subset of each stratum at rate `alloc / n_rows`, floored onto the
    * 65536-bucket grid — the same gate discipline as
    * [[deterministicSplit]], so the kept set is reproducible across
    * engines, runs, and partitionings, and kept counts track the
    * allocation to within bucket granularity. One broadcast of the
    * O(strata) allocation table, then a map-only gate — rows never
    * shuffle.
    */
  def neymanSample(df: DataFrame, strataCol: String, valueCol: String,
                   idCol: String, budget: Long): DataFrame =
    neymanSample(df, strataCol, valueCol, idCol,
      neymanAllocation(df, strataCol, valueCol, budget))

  /** [[neymanSample]] against a PRECOMPUTED [[neymanAllocation]] frame —
    * callers that also report the allocation reuse one rollup (identical
    * aggregation subtrees additionally dedupe via exchange reuse).
    */
  def neymanSample(df: DataFrame, strataCol: String, valueCol: String,
                   idCol: String, allocation: DataFrame): DataFrame = {
    // rows with a null value are excluded from the GATE as well as the
    // allocation (they carried no weight, so keeping them would
    // overshoot the budget on null-heavy strata); rows with a null
    // stratum drop here too — by the equi-join, matching the
    // allocation-side exclusion, so no budget is ever stranded
    val thr = allocation.select(col(strataCol),
      expr(s"alloc * $Buckets DIV n_rows").as("__thr"))
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(thr), Seq(strataCol))
      .filter(conv(hashBucket(col(idCol)), 16, 10).cast("long") < col("__thr"))
      .drop("__thr")
  }

  /** Split tag ("train" / "val" / "test" / ...) from cumulative hash
    * thresholds. `fractions` are (name, fraction) in declaration order;
    * they must sum to <= 1.0 and any remainder falls into the LAST split.
    */
  def splitTag(idCol: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "need at least one split")
    val total = fractions.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"fractions sum to $total > 1")
    val h = hashBucket(idCol)
    var cum = 0.0
    val cases = fractions.init.map { case (name, f) =>
      cum += f
      (bucketThreshold(cum), name)
    }
    cases.foldRight(lit(fractions.last._1): Column) {
      case ((thr, name), el) => when(belowThreshold(h, thr), name).otherwise(el)
    }
  }

  /** Deterministic train/val/test split: adds `splitCol` to the frame. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         fractions: Seq[(String, Double)],
                         splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol, splitTag(col(idCol), fractions))

  /** Keep a deterministic `fraction` of rows (hash-filtered on id). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0 + 1e-9, s"bad fraction $fraction")
    df.filter(belowThreshold(hashBucket(col(idCol)), bucketThreshold(fraction)))
  }

  /** Mix corpora at deterministic per-part weights — the standard
    * up/down-weighting step when composing a training mixture. A weight
    * w ≤ 1 keeps a hash-sampled fraction w of the part; w > 1 repeats
    * the part floor(w) times (distinguished by a `mix_epoch` column,
    * since training pipelines treat repeats as distinct examples) plus a
    * hash-sampled fractional remainder (the lowest-hash slice of the
    * part, consistent with [[hashSample]] nesting). Fully deterministic
    * in ids, map-only throughout.
    */
  def weightedMix(parts: Seq[(DataFrame, Double)], idCol: String,
                  epochCol: String = "mix_epoch"): DataFrame = {
    require(parts.nonEmpty, "need at least one part")
    parts.foreach { case (_, w) => require(w > 0.0, s"weight must be positive, got $w") }
    val frames = parts.flatMap { case (df, w) =>
      val whole = math.floor(w).toInt
      val frac = w - whole
      val fullEpochs = (0 until whole).map(e => df.withColumn(epochCol, lit(e)))
      val remainder =
        if (frac < 1e-12) Nil
        else Seq(hashSample(df, idCol, frac).withColumn(epochCol, lit(whole)))
      fullEpochs ++ remainder
    }
    frames.reduce(_ unionByName _)
  }

  /** Temperature-based source re-balancing (the mC4/mT5 mixing rule):
    * down-sample each source so expected kept counts are proportional to
    * n_s^alpha — alpha < 1 flattens the source distribution toward
    * uniform without up-sampling (the smallest source is kept whole, so
    * keep rates are rate_s = (n_min/n_s)^(1-alpha), all ≤ 1).
    *
    * alpha is restricted to 0.5 so the rate is a single correctly-rounded
    * sqrt over a correctly-rounded division — bit-identical in any IEEE
    * engine, which keeps the derived md5-bucket thresholds externally
    * verifiable (a general pow() is not correctly rounded and could
    * disagree across libm implementations at a floor() boundary).
    *
    * Scale shape: one tiny aggregation to learn per-source counts (rows =
    * distinct sources), thresholds derived IN the plan and broadcast-
    * joined back onto the corpus — no driver collect, no per-source
    * expression tree (a 10k-source corpus is one broadcast frame, not a
    * 10k-deep `when` chain), and the big side stays map-only. Threshold
    * math (`floor(sqrt(n_min / n) * 65536)`) is the same correctly-
    * rounded IEEE sequence [[bucketThreshold]] computes, so the kept set
    * is identical to the previous driver-side formulation.
    */
  def temperatureSample(df: DataFrame, idCol: String,
                        sourceCol: String): DataFrame = {
    val counts = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__nmin"))
    val thr = counts.crossJoin(broadcast(nMin))
      .select(col("__src"),
        floor(sqrt(col("__nmin").cast("double") / col("__n").cast("double"))
          * lit(Buckets)).cast("long").as("__thr"))
    val h = hashBucket(col(idCol))
    // __thr == Buckets (the kept-whole smallest source) would render as
    // the 5-char hex "10000" which sorts below "a..." buckets — the same
    // edge belowThreshold short-circuits — so it gets an explicit OR arm
    df.join(broadcast(thr), col(sourceCol) === col("__src"))
      .filter(col("__thr") >= lit(Buckets.toLong) ||
        h < format_string("%04x", col("__thr")))
      .drop("__src", "__thr")
  }

  /** Cap each group at `quota` rows, keeping the first `quota` in
    * (orderCol, idCol) order — e.g. limit any single source/domain's
    * contribution to the corpus. One shuffle on the group key.
    */
  def perGroupQuota(df: DataFrame, groupCol: String, orderCol: String,
                    idCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Cap each group at a TOKEN budget instead of a row quota — the
    * data-mixing primitive an LLM corpus recipe actually specifies
    * ("20 B tokens of web, 5 B of code"): keep a group's docs in
    * deterministic id order while the cumulative token count BEFORE the
    * doc is under `budget` (so the doc that crosses the line is kept —
    * budgets are floors, matching [[Packing.packSequences]]'s
    * doc-may-straddle semantics). One shuffle on the group key; the
    * token expression stays map-side.
    */
  def tokenBudget(df: DataFrame, groupCol: String, idCol: String,
                  tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val before = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("__off", coalesce(sum(col("n_tokens")).over(before), lit(0L)))
      .filter(col("__off") < budget)
      .drop("__off")
  }

  /** Stratified split: within every stratum, tag the first `pct`% of
    * rows (floor semantics, ALL-INTEGER arithmetic — no float fraction
    * ever touches a row count) in md5-of-id order as `heldOutTag`, the
    * rest as `restTag`. Hash order makes the held-out set id-stable as
    * the corpus grows within a stratum boundary; per-stratum
    * proportionality is exact by construction. One shuffle on the
    * stratum key; the two windows share it.
    */
  def stratifiedSplit(df: DataFrame, stratumCol: String, idCol: String,
                      pct: Int, heldOutTag: String = "test",
                      restTag: String = "train",
                      splitCol: String = "split"): DataFrame = {
    require(pct > 0 && pct < 100, "pct must be in (0, 100)")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val n = Window.partitionBy(col(stratumCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn(splitCol,
        when(col("__rn") * 100 <= col("__n") * pct, lit(heldOutTag))
          .otherwise(lit(restTag)))
      .drop("__rn", "__n")
  }

  /** Temporal split with an EMBARGO gap — the leakage guard for
    * time-correlated data: train strictly before `trainEndDay`, an
    * `embargoDays`-wide quarantine band (rows near the boundary leak
    * target information in both directions — they are tagged for
    * DROPPING, not for either split), eval strictly after the band.
    * Pure per-row comparison on an integral day column: map-only,
    * reproducible, id- and order-independent.
    */
  def temporalSplit(df: DataFrame, dayCol: Column, trainEndDay: Long,
                    embargoDays: Int, splitCol: String = "split"): DataFrame = {
    require(embargoDays >= 0, "embargoDays must be >= 0")
    df.withColumn(splitCol,
      when(dayCol < trainEndDay, "train")
        .when(dayCol < trainEndDay + embargoDays, "embargo")
        .otherwise("eval"))
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023, public
    * method): score every document by how much more likely its hashed
    * n-gram features are under a TARGET distribution than under the raw
    * corpus distribution,
    *
    *   w(d) = sum over bigram instances g of
    *            ln p_target(bucket(g)) - ln p_raw(bucket(g)),
    *
    * with add-one smoothing over B = 256 buckets. Buckets are the first
    * two hex chars of md5(bigram) — a cross-engine-reproducible hash
    * (both Spark and DuckDB md5 the same UTF-8 bytes to the same lowercase
    * hex), which is what makes the driver oracle able to re-derive the
    * exact bucket distribution. Per-bucket log-ratios land in 1e6 fixed
    * point before the order-free integer sum (t09 discipline).
    *
    * Scale shape: the bucket tables are B rows — broadcast; the corpus
    * side is one tokenize+explode pass and one per-doc sum. `isTarget`
    * is any row-level predicate (a language flag, a quality gate, a
    * domain label); weights feed Gumbel-top-k or threshold resampling.
    *
    * Output: (idCol, n_grams, weight_fp); docs with no bigrams keep (0, 0).
    */
  def dsirLogWeights(df: DataFrame, idCol: String, textCol: String,
                     isTarget: Column): DataFrame = {
    val B = 256.0
    val toks = df.select(col(idCol), isTarget.as("__t"),
      filter(split(lower(coalesce(col(textCol), lit(""))), "\\W+"),
        x => x =!= "").as("__toks"))
    // materialized ONCE (the containmentPairs discipline): four
    // consumers (raw counts, target counts, totals, the per-doc sum)
    // reference this frame, and as a lazy plan each would re-run the
    // tokenize+md5 pass; rows are (id, bool, 2-char bucket) — slim
    val feats = toks.select(col(idCol), col("__t"),
        explode(expr(
          """transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),
             (t, i) -> substring(md5(concat(t, ' ', __toks[i + 1])), 1, 2))"""))
          .as("b"))
      .localCheckpoint(true)
    val rawC = feats.groupBy(col("b")).agg(count(lit(1)).cast("double").as("cr"))
    val tgtC = feats.filter(col("__t")).groupBy(col("b"))
      .agg(count(lit(1)).cast("double").as("ct"))
    val totals = feats.agg(count(lit(1)).cast("double").as("nr"),
      sum(when(col("__t"), 1L).otherwise(0L)).cast("double").as("nt"))
    val ratio = rawC.join(tgtC, Seq("b"), "left").crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((coalesce(col("ct"), lit(0.0)) + 1.0) / (col("nt") + B))
          - log((col("cr") + 1.0) / (col("nr") + B))) * 1e6)
          .cast("long").as("fp"))
    val perDoc = feats.join(broadcast(ratio), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("fp")).as("weight_fp"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("weight_fp"), lit(0L)).as("weight_fp"))
  }

  /** Gumbel-top-k importance RESAMPLING — the selection step that turns
    * [[dsirLogWeights]] (or any log-weight column) into a sampled-
    * without-replacement subset: perturb each log-weight with a Gumbel
    * draw and keep the k largest keys, which is distributionally
    * equivalent to weighted sampling without replacement (Vieira 2014,
    * public result). The "randomness" is a deterministic md5-derived
    * uniform per id — reproducible across engines, runs, and partitions,
    * the same discipline as every sampler in this file:
    *
    *   u      = (first-8-hex-chars of md5(id as string) + 0.5) / 2^32
    *   key    = w / temperature + (-ln(-ln(u)))
    *
    * The selection is the bounded-heap `topk_by` aggregate (the s01 ANN
    * machinery), NOT a global rank window: per-partition heaps of size k
    * merge map-side, so selecting 50 of 10^11 documents never sorts or
    * single-partitions the corpus. Ties break (key desc, id asc), same
    * as a `row_number` over (key DESC, id).
    * Output: (idCol, key, rank) for the k kept rows, rank 1-based.
    */
  def gumbelTopK(weights: DataFrame, idCol: String, weightCol: String,
                 k: Int, temperature: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val u = (expr(s"cast(conv(substring(md5(cast($idCol as string)), 1, 8), 16, 10) as double)")
      + 0.5) / 4294967296.0
    val key = (col(weightCol).cast("double") / temperature) + (-log(-log(u)))
    weights.select(col(idCol).cast("long").as("__id"), key.as("key"))
      .agg(call_function("topk_by", col("key"), col("__id"), lit(k)).as("top"))
      .select(posexplode(col("top")).as(Seq("rank0", "hit")))
      .select(col("hit.id").as(idCol), col("hit.sim").as("key"),
        (col("rank0") + 1).cast("long").as("rank"))
  }
}
