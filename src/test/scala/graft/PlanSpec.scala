package graft

/** Hard assertions on physical plan shapes — the properties that make the
  * operators scale-safe must be visible in the plan, not just intended.
  * Runs the real driver queries at sf0.001.
  */
class PlanSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("d04 near-dup: banded candidates only — no cartesian/nested-loop join") {
    val p = planOf("d04_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), "cartesian product in d04 plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop join in d04 plan")
  }

  test("u12 ON CONFLICT: keyed joins only — no cartesian/nested-loop") {
    val p = planOf("u12_insert_on_conflict")
    assert(!p.contains("CartesianProduct"), "cartesian in u12 plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop in u12 plan")
  }

  test("j12 positional join: one equi-join on the position key") {
    val p = planOf("j12_positional_join")
    assert(!p.contains("CartesianProduct"), "cartesian in j12 plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop in j12 plan")
  }

  test("u13 correlated DML: equi-anchored joins only — no " +
    "cartesian/nested-loop (the theta term rides the equi join)") {
    val p = planOf("u13_correlated_dml")
    assert(!p.contains("CartesianProduct"), "cartesian in u13 plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop in u13 plan")
  }

  test("u16 CTE-headed DML: keyed joins only — no cartesian/nested-loop") {
    val p = planOf("u16_cte_dml")
    assert(!p.contains("CartesianProduct"), "cartesian in u16 plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop in u16 plan")
  }

  test("w16 GROUPS-split EXCLUDE: all four windows share ONE exchange " +
    "(partition-local algebra, no extra shuffle)") {
    val p = planOf("w16_minmax_exclude_group")
    // one shuffle for the window partitioning (+ possibly one for the
    // final ORDER BY range partitioning) — the before/after GROUPS
    // split must NOT add exchanges of its own
    val ex = "Exchange".r.findAllIn(p).length
    assert(ex <= 3, s"w16 plan grew to $ex exchanges")
    assert(!p.contains("CartesianProduct"), "cartesian in w16 plan")
  }

  test("s20 hard negatives: pairs broadcast everywhere, corpus never " +
    "shuffles, no cartesian") {
    val p = planOf("s20_hard_negatives")
    assert(!p.contains("CartesianProduct"), "cartesian in s20 plan")
    // the corpus side must not hash-shuffle for any join: every join is
    // a broadcast of the pair side (BNLJ for the scoring cross is the
    // s01-pinned broadcast shape)
    assert(!p.contains("SortMergeJoin"), "corpus shuffle join in s20 plan")
    assert("BroadcastExchange".r.findAllIn(p).length >= 3,
      "s20 pair side should broadcast at each of its three joins")
  }

  test("w18 count-distinct windows: the collect lowering adds no " +
    "exchange beyond the shared window partitioning") {
    val p = planOf("w18_count_distinct_window")
    // three distinct (partition, order) pairs + the final ORDER BY — the
    // collect_list split must reuse the window exchanges, not add more
    val ex = "Exchange".r.findAllIn(p).length
    assert(ex <= 5, s"w18 plan grew to $ex exchanges")
    assert(!p.contains("CartesianProduct"), "cartesian in w18 plan")
  }

  test("w19 GROUPS-frame EXCLUDE: every window shares one exchange") {
    val p = planOf("w19_groups_exclude")
    val ex = "Exchange".r.findAllIn(p).length
    assert(ex <= 3, s"w19 plan grew to $ex exchanges")
    assert(!p.contains("CartesianProduct"), "cartesian in w19 plan")
  }

  test("ap01 approx aggregates: single-distinct planning, no Expand") {
    // ap01's r9 oracle promotion added ONE exact count_distinct next to
    // the sketches it gates; Spark's single-distinct rewrite plans that
    // as two-phase aggregation WITHOUT an Expand (row multiplication
    // only appears with multiple distinct groups). Pin it so a future
    // edit that adds a second distinct column — and silently 2x-es the
    // aggregation input — fails here instead of in the bench.
    val p = planOf("ap01_approx")
    assert(!p.contains("Expand"), "Expand (multi-distinct rewrite) in ap01 plan")
  }

  test("e10 rolling actives: dedup-then-explode, no cartesian, bounded exchanges") {
    val p = planOf("e10_rolling_active")
    assert(!p.contains("CartesianProduct"), "cartesian in e10 plan")
    assert(p.contains("Generate"), "the x7 explode should appear as Generate")
    // the 1-row span bound may ride a broadcast nested loop; anything
    // bigger joining that way would be a scale bug
    val ex = "Exchange".r.findAllIn(p).length
    assert(ex <= 14, s"e10 plan grew to $ex exchanges (incl. AQE reuse)")
  }

  test("g13 sketch union: single-distinct per grain, no Expand, broadcast gates") {
    val p = planOf("g13_sketch_union")
    assert(!p.contains("Expand"), "multi-distinct Expand in g13 plan")
    assert(!p.contains("CartesianProduct"), "cartesian in g13 plan")
  }

  test("u05 maintenance: adjustment join is delta-driven, no cartesian") {
    val p = planOf("u05_agg_maintenance")
    assert(!p.contains("CartesianProduct"), "cartesian in u05 plan")
  }

  test("j09: fact scan carries a runtime dynamic-partition-pruning filter") {
    val p = planOf("j09_dynamic_pruning")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "day-partitioned fact scan should be DPP-filtered by the dim side")
  }

  test("j01 star join: both dims broadcast, fact side never re-shuffles for them") {
    val p = planOf("j01_join_bcast")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, plan had $broadcasts")
  }

  test("q01 projection prunes the parquet scan to the selected columns") {
    val p = planOf("q01_scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_comment") && !read.contains("l_shipmode"),
      s"scan not pruned: $read")
  }

  test("m02 codec decode is map-only: no shuffle exchange before the sort") {
    val p = planOf("m02_codec_decode")
    // exactly the one exchange required by the final global ORDER BY
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"decode pipeline should not shuffle payloads (got $exchanges exchanges):\n$p")
  }

  test("d06 segment dedup: equi-joins only, partial aggregation on the segment key") {
    val p = planOf("d06_dedup_segments")
    assert(!p.contains("CartesianProduct"), "cartesian product in d06 plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop join in d06 plan")
    // the winners-per-segment agg must map-side combine (partial_min)
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"no partial aggregation for the segment winners:\n$p")
  }

  test("t06 repetition signals are map-only up to the final order-by") {
    val p = planOf("t06_repetition")
    // one exchange pair at most: the global ORDER BY (range partitioning)
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"repetition signals should not shuffle (got $exchanges):\n$p")
    assert(!p.contains("Join"), "no join belongs in t06")
  }

  test("a01 as-of join: single shuffle on the key, no join operator at all") {
    val p = planOf("a01_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin")
      && !p.contains("BroadcastHashJoin"),
      "as-of should be union + keyed window, not a join")
  }

  test("d09 reference dedup: codegen'd bloom probe gates the verify join") {
    val p = planOf("d09_dedup_against_ref")
    assert(p.contains("might_contain"),
      s"bloom probe missing from the plan:\n$p")
    // the probe is an expression filter, not a UDF invocation
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      "bloom probe must not be a UDF")
  }

  test("p02 packing: one shard-keyed window, no global single-partition sort") {
    val p = planOf("p02_pack_sequences")
    assert(!p.contains("SinglePartition"),
      s"packing must partition by shard, never collapse to one partition:\n$p")
    assert(p.contains("Window"), "expected a window operator in p02")
  }

  test("j06 range join: equi-join on buckets, never a nested loop") {
    val p = planOf("j06_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must not plan a nested loop:\n$p")
  }

  test("d08 clustering output: equi-joins only in the final assembly") {
    // executedPlan of the RETURNED frame (post-iteration); the singleton
    // fill must be an equi join on the id, never a nested loop
    val p = planOf("d08_dup_clusters")
    assert(!p.contains("CartesianProduct"), "cartesian in d08 assembly")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested loop in d08 assembly")
  }

  test("banded embedding pairs: equi-joins only, never a nested loop") {
    // the pair generator feeding d08/p04's connected components (its plan
    // hides behind the CC localCheckpoint, so pin the generator directly)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = graft.ops.Dedup.embeddingPairsBanded(
        emb, "vec_id", "embedding", rowBits = 12, bands = 48, threshold = 0.9)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in banded pair plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested loop in banded pair plan:\n$p")
  }

  test("hot map-only queries run inside whole-stage codegen") {
    // the expression-tree operator families must not fall out of codegen
    // (a non-codegen expression in the hot path would fragment the
    // spans). AQE materializes the final plan only at execution, so run
    // the query first and inspect the finalized adaptive plan.
    Seq("q03_arithmetic", "t06_repetition", "t03_tokens", "s06_quantize_int8")
      .foreach { q =>
        val df = SparkEntry.queries(q)(spark, dir)
        df.collect() // finalizes THIS QueryExecution's adaptive plan
        val p = df.queryExecution.executedPlan.toString
        // codegen'd operators print with the "*(stageId)" prefix
        assert(p.linesIterator.exists(_.trim.matches("""(\+-|:-)?\s*\*\(\d+\).*""")),
          s"no whole-stage-codegen'd operator in $q's final plan:\n${p.take(800)}")
      }
  }

  test("io03 partitioned read-back: the lang filter reaches PartitionFilters") {
    val p = planOf("io03_parquet_partitioned")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"lang filter not in PartitionFilters:\n$p")
  }

  test("io05 sorted layout: the key-range filter is pushed to the parquet scan") {
    val p = planOf("io05_sorted_layout")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(o_orderkey") &&
      pushed.contains("LessThanOrEqual(o_orderkey"),
      s"o_orderkey range not in PushedFilters:\n$p")
  }

  test("t09 LM scoring: bigram probability lookups are equi-joins, vocab is broadcast") {
    val p = planOf("t09_lm_score")
    assert(!p.contains("CartesianProduct"), s"cartesian in t09 plan:\n${p.take(800)}")
    // the only nested-loop join allowed is the 1-row vocab scalar broadcast
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"$bnlj nested-loop joins in t09 plan (expected <=1 scalar):\n${p.take(800)}")
  }

  test("u01 upsert: one keyed window resolves versions, no nested loop") {
    val p = planOf("u01_upsert")
    assert(p.contains("Window"), s"no window in u01 plan:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in u01 plan:\n${p.take(800)}")
  }

  test("s08 PQ: codebook and distance table join broadcast, corpus never nested-loops") {
    val p = planOf("s08_ann_pq")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in s08 plan:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in s08 plan:\n${p.take(800)}")
    // ranking is the bounded-heap aggregate, never a rank window: a
    // row_number() over (probe) would shuffle every scored candidate into
    // one partition per probe (SCALE.md's feasible-vs-not line at 1e11)
    assert(!p.contains("Window"), s"rank window in s08 plan:\n${p.take(900)}")
    assert(p.contains("topk_by"), s"no topk_by heap in s08 plan:\n${p.take(900)}")
  }

  test("s09 IVF×PQ: no rank window anywhere — argmin agg assigns cells, topk_by ranks") {
    val p = planOf("s09_ann_ivfpq")
    assert(!p.contains("Window"), s"rank window in s09 plan:\n${p.take(900)}")
    assert(p.contains("topk_by"), s"no topk_by heap in s09 plan:\n${p.take(900)}")
    assert(!p.contains("CartesianProduct"), s"cartesian in s09 plan:\n${p.take(900)}")
    // the only nested-loop joins allowed are the broadcast of the tiny
    // nlist-row centroid frame into the corpus/probe cell scoring
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"$bnlj nested-loop joins in s09 plan (want <=2 centroid broadcasts)")
  }

  test("s11 persisted IVF×PQ: search reads the index tables, never re-encodes the corpus") {
    val p = planOf("s11_ann_ivfpq_persisted")
    // codes/cells come back from the bucketed catalog tables
    assert(p.contains("_codes") && p.contains("Bucketed: true"),
      s"search does not scan the persisted bucketed code table:\n${p.take(900)}")
    // the raw embedding corpus appears ONLY as the probe side: every
    // scan of it must carry the pushed probe-id filter. An unfiltered
    // embeddings scan would mean the corpus is being re-encoded per query.
    val rawScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("embeddings.parquet")).toSeq
    assert(rawScans.nonEmpty && rawScans.forall(_.contains("LessThan(vec_id,5)")),
      s"corpus re-encoded at query time (unfiltered embeddings scan):\n${rawScans.mkString("\n")}")
    assert(!p.contains("Window"), s"rank window in s11 plan:\n${p.take(900)}")
    assert(p.contains("topk_by"), s"no topk_by heap in s11 plan:\n${p.take(900)}")
  }

  test("s12 appended index: search scans persisted tables, probe-only corpus reads") {
    val p = planOf("s12_ann_index_append")
    assert(p.contains("_codes") && p.contains("Bucketed: true"),
      s"search does not scan the persisted bucketed code table:\n${p.take(900)}")
    val rawScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("embeddings.parquet")).toSeq
    assert(rawScans.nonEmpty && rawScans.forall(_.contains("LessThan(vec_id,5)")),
      s"corpus re-encoded at query time:\n${rawScans.mkString("\n")}")
    assert(!p.contains("Window"), s"rank window in s12 plan:\n${p.take(900)}")
  }

  test("m07 phash pairs: pigeonhole equi-joins only, never a nested loop") {
    val p = planOf("m07_image_phash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"image pair generation must stay an equi-join:\n${p.take(900)}")
  }

  test("sp06 token budget: one source-keyed exchange serves cumsum and rollup, no join") {
    val p = planOf("sp06_token_budget_mix")
    assert(!p.contains("Join"), s"join in sp06 plan:\n${p.take(800)}")
    val keyed = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 1, s"$keyed keyed exchanges in sp06 plan (want 1):\n${p.take(900)}")
  }

  test("p09 pack materialize: keyed equi-join + grouped concat, no cartesian") {
    val p = planOf("p09_pack_materialize")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in p09 plan:\n${p.take(900)}")
  }

  test("sp04 temperature mix: thresholds arrive via ONE broadcast hash join, no shuffle join") {
    // round 11 moved the per-source thresholds from a when-chain (O(#sources)
    // expression depth) into a broadcast join against the tiny threshold
    // table; the contract is now: exactly one BroadcastHashJoin, no
    // SortMergeJoin/ShuffledHashJoin, and no CaseWhen gate over sources.
    val p = planOf("sp04_temperature_mix")
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj == 1, s"$bhj broadcast hash joins in sp04 plan (want 1):\n${p.take(900)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"shuffle join in sp04 plan (thresholds must broadcast):\n${p.take(900)}")
  }

  test("e20 RFM cutpoints: no window, one broadcast join carries the cutpoints") {
    // e20 exists to kill e16's three global ntile windows (each a
    // one-partition sort of every user). The scale contract: the ONLY
    // join is the broadcast of the 1-row cutpoint frame, and no Window
    // operator anywhere.
    val p = planOf("e20_rfm_cutpoints")
    assert(!p.contains("Window"), s"window in e20 plan:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"shuffle join in e20 plan (cutpoints must broadcast):\n${p.take(900)}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"no broadcast join in e20 plan:\n${p.take(900)}")
  }

  test("e23 Theil–Sen: pairwise slopes come from array HOFs — no join at all") {
    val p = planOf("e23_theil_sen")
    assert(!p.contains("Join"),
      s"e23 must generate the O(days²) pair set map-side, not via a " +
        s"self-join:\n${p.take(800)}")
  }

  test("t22 corpus novelty: min-agg first-seen map, no window, no gram-keyed join") {
    val p = planOf("t22_corpus_novelty")
    assert(!p.contains("Window"), s"window in t22 plan (first-seen must be an agg):\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in t22 plan:\n${p.take(900)}")
    // gram strings never leave the map stage (the posting materializes
    // as xxhash64 longs); the only join is the id-keyed assembly of two
    // doc-sized count frames. A reintroduced posting join-back would
    // key a join on the gram column `g` and double the gram shuffle —
    // ban it by key name.
    val gramJoins = p.linesIterator.filter(_.contains("Join"))
      .filter(l => "\\bg#\\d".r.findFirstIn(l).isDefined).toSeq
    assert(gramJoins.isEmpty,
      s"join keyed on the gram column in t22 plan:\n${gramJoins.mkString("\n")}")
  }

  test("geo05 kNN: bounded-heap topk_by aggregate, no rank window, cell equi-join") {
    val p = planOf("geo05_knn_sites")
    assert(!p.contains("Window"),
      s"rank window in geo05 plan (top-k must be the bounded-heap agg):\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in geo05 plan:\n${p.take(900)}")
    assert(p.contains("topk_by"),
      s"topk_by aggregate missing from geo05 plan:\n${p.take(600)}")
  }

  test("s18 phrase search: hash equi-joins on (doc, pos) only — no nested loop") {
    val p = planOf("s18_phrase_search")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in s18 plan:\n${p.take(900)}")
    assert(!p.contains("Window"), s"window in s18 plan:\n${p.take(600)}")
  }

  test("io16 bucketed join: ZERO Exchange and ZERO Sort in the whole plan " +
      "(bucketBy+sortBy co-location carries join, agg, and TopK)") {
    val p = planOf("io16_bucketed_join")
    assert(p.contains("SortMergeJoin"),
      s"bucketed join must plan as merge join:\n${p.take(900)}")
    assert(!p.contains("Exchange"),
      s"Exchange in io16 plan — bucketing failed to co-locate:\n${p.take(1200)}")
    // match the Sort OPERATOR only ("Sort ["), not SortMergeJoin /
    // SortAggregate — those REUSE the bucketed order, which is the point
    assert(!p.contains("Sort ["),
      s"Sort in io16 plan — sortBy metadata not used:\n${p.take(1200)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"output TopK should be TakeOrderedAndProject:\n${p.take(600)}")
  }

  test("d22 exact-substring: anchor-hash equi-joins only — no nested loop, " +
      "window_hashes posting (no gram strings)") {
    val p = planOf("d22_exact_substr")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in d22 plan:\n${p.take(900)}")
    assert(p.contains("window_hashes"),
      s"numeric-shingling anchor missing from d22 plan:\n${p.take(600)}")
  }

  test("geo06 point-in-polygon: broadcast polygon catalog, codegen'd " +
      "crossing expression — probe side map-only") {
    val p = planOf("geo06_point_in_polygon")
    assert(p.contains("point_in_polygon"),
      s"codegen'd crossing expression missing:\n${p.take(600)}")
    assert(p.contains("Broadcast"),
      s"polygon catalog must broadcast:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in geo06 plan:\n${p.take(900)}")
  }

  test("d21 CDC chunk dedup: map-only chunking into one digest rollup, no join") {
    val p = planOf("d21_cdc_chunk_dedup")
    assert(!p.contains("Join"),
      s"join in d21 plan (chunk dedup is explode + one agg):\n${p.take(800)}")
    assert(p.contains("Generate"),
      s"chunk explode should appear as Generate:\n${p.take(600)}")
    assert(p.contains("cdc_chunks"),
      s"codegen'd cdc_chunks expression missing from d21 plan:\n${p.take(600)}")
  }

  test("p12 pack segments: one shard-keyed window + map-side explode, no join") {
    val p = planOf("p12_pack_segments")
    assert(!p.contains("Join"), s"join in p12 plan:\n${p.take(800)}")
    val windows = p.linesIterator.count(_.trim.matches(""".*\bWindow\b.*"""))
    assert(windows >= 1, s"no window in p12 plan:\n${p.take(600)}")
    assert(p.contains("Generate"), "the span explode should appear as Generate")
    // exactly ONE keyed exchange (the shard window); the other exchange
    // is the final global ORDER BY's range partitioning
    val keyed = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 1, s"$keyed keyed exchanges in p12 plan (want 1):\n${p.take(900)}")
  }

  test("u07 snapshot diff: one keyed equi-join, no window, no cartesian") {
    val p = planOf("u07_snapshot_diff")
    assert(!p.contains("Window"), s"window in u07 plan:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in u07 plan:\n${p.take(900)}")
  }

  test("w04 rolling range frame: one customer-keyed shuffle feeds the window") {
    val p = planOf("w04_rolling_range")
    assert(p.contains("Window"), s"no window in w04 plan:\n${p.take(600)}")
    val keyed = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(keyed == 1, s"$keyed keyed exchanges in w04 plan (want 1):\n${p.take(900)}")
  }

  test("e04 funnel: stacked stage windows reuse the session sort, no nested loop") {
    val p = planOf("e04_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in e04 plan:\n${p.take(800)}")
    // ONE user-keyed exchange serves everything: hashpartitioning(user_id)
    // already clusters (user_id, session_seq), so the session numbering
    // window, all three stage windows, and the per-session agg share it
    val keyed = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 1, s"$keyed keyed exchanges in e04 plan (want 1):\n${p.take(900)}")
  }

  test("g03 pivot: two-stage aggregation (pre-agg then pivotfirst), no Expand, no join") {
    val p = planOf("g03_pivot")
    // Spark plans pivot as: agg on (group, pivot) — shrinking the data to
    // one row per combination — then pivotfirst on the group key. Both
    // stages map-side combine; value DISCOVERY never happens because the
    // pivot values are explicit.
    assert(p.contains("pivotfirst"), s"no pivotfirst stage in g03 plan:\n${p.take(800)}")
    assert(!p.contains("Join"), "pivot must not join")
    assert(!p.contains("Expand"), "no Expand belongs in an explicit-values pivot")
    val keyed = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 2, s"$keyed keyed exchanges in g03 plan (want the 2-stage pivot shape)")
  }

  test("sub04 EXISTS/NOT EXISTS decorrelate to semi and anti hash joins") {
    val p = planOf("sub04_exists")
    assert(p.contains("LeftSemi"), s"no left-semi join in sub04 plan:\n${p.take(800)}")
    assert(p.contains("LeftAnti"), s"no left-anti join in sub04 plan:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "EXISTS must not plan as a nested loop")
  }

  test("sub05 lateral top-n decorrelates to a ranked window, not per-row re-execution") {
    val p = planOf("sub05_lateral")
    assert(p.contains("Window"), s"no window in sub05 plan:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"lateral planned as nested loop:\n${p.take(800)}")
  }

  test("t10 html strip is map-only up to the final order-by") {
    val p = planOf("t10_html_strip")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"html strip should not shuffle (got $exchanges)")
    assert(!p.contains("Join"), "no join belongs in t10")
  }

  test("e07 resample: grid join is keyed, no cartesian calendar expansion") {
    val p = planOf("e07_resample_ffill")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"resample grid must join on (key, bin), not expand a calendar:\n${p.take(900)}")
    assert(p.contains("Generate"), "sequence/explode grid missing") // explode
  }

  test("e08 native session_window: one user-keyed exchange feeds the session agg") {
    val p = planOf("e08_session_window")
    assert(p.contains("session_window") || p.contains("SessionWindow"),
      s"no session window operator in e08 plan:\n${p.take(600)}")
    assert(!p.contains("Join"), "no join belongs in e08")
  }

  test("d12 edit-distance pairs: block equi-joins only, never a nested loop") {
    val p = planOf("d12_editdist_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must block+verify, not nested-loop:\n${p.take(900)}")
  }

  test("g07 argmax: single aggregation pass, no rank window, no self-join") {
    val p = planOf("g07_argmax")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"argmax must be one struct-extrema agg:\n${p.take(700)}")
    val keyed = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed <= 1, s"$keyed keyed exchanges in g07 plan (want <=1)")
  }

  test("s10 filtered ANN: the label predicate reaches the corpus parquet scan") {
    val p = planOf("s10_ann_filtered")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("LessThan(label"),
      s"label filter not pushed to the scan:\n$pushed")
  }

  test("d10 decontamination: eval grams broadcast, corpus side never shuffles on grams") {
    val p = planOf("d10_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast gram join in d10 plan:\n$p")
    // the only sort-merge/shuffled-hash joins allowed are the final
    // doc_id left join — the gram join must not shuffle the corpus
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in d10 plan:\n$p")
  }

  test("suite-wide: no query plans a CartesianProduct except the exhaustive anchors") {
    // deliberate all-pairs stages, each documented at its definition:
    // d07 is the oracled exactness anchor for d05's LSH path; d03/d04's
    // oracles are exhaustive but their ENGINE plans must stay banded
    val allowed = Set("d07_embed_pairs_exact")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if allowed(name) => None
      case (name, fn) =>
        val p = fn(spark, dir).queryExecution.sparkPlan.toString
        if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected cartesian products in: ${offenders.mkString(", ")}")
  }

  test("d13 semantic dedup: centroids broadcast, argmin map-side combined, prune join equi-keyed") {
    val p = planOf("d13_semantic_dedup")
    // the ONLY nested-loop allowed is the bounded broadcast of the k
    // centroids; the corpus must never be the build side of one
    assert(!p.contains("CartesianProduct"), s"cartesian in d13 plan:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"centroids not broadcast in d13 plan:\n$p")
    // the argmin reduces k rows per id BEFORE the shuffle
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"no map-side combine for the centroid argmin:\n$p")
    // intra-cell pruning is an equi-join on cell, not an all-pairs scan
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      "BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      s"prune stage not an equi-join:\n$p")
  }

  test("io09 z-order layout: both rectangle predicates pushed to the read-back scan") {
    // the plan's toString truncates the PushedFilters list — read the
    // scan node's metadata, which carries the full string
    val plan = SparkEntry.queries("io09_zorder_layout")(spark, dir)
      .queryExecution.sparkPlan
    val pushed = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(l_partkey") &&
      pushed.contains("GreaterThanOrEqual(l_suppkey") &&
      pushed.contains("LessThanOrEqual(l_suppkey"),
      s"rectangle predicates not pushed to the z-ordered scan:\n$pushed")
  }

  test("s13 rerank: shortlist ranked by the bounded heap, never a rank window") {
    val p = planOf("s13_ann_rerank")
    assert(!p.contains("Window"), s"rank window in s13 plan:\n${p.take(900)}")
    assert(!p.contains("CartesianProduct"), s"cartesian in s13 plan:\n${p.take(900)}")
  }

  test("p10 length batching: the only exchanges are the (shard, bucket) window and output sort") {
    val p = planOf("p10_length_batches")
    assert(!p.contains("Join"), s"no join belongs in p10:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"p10 should shuffle once for the window + once for the sort (got $exchanges):\n$p")
  }

  test("pr04 PSI: histogram aggregation map-side combines on (group, bucket)") {
    val p = planOf("pr04_drift_psi")
    assert(p.contains("partial_sum") || p.contains("partial sum"),
      s"histogram not map-side combined:\n$p")
    assert(!p.contains("Join"), s"no join belongs in pr04:\n$p")
  }

  test("q40 division: counting plan — no correlated anti-join cascade") {
    val p = planOf("q40_division")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"the universe count should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"division-by-counting must not shuffle-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("j11 grid radius join: equi-join on the cell key, never a nested loop") {
    val p = planOf("j11_spatial_grid")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"grid join must be an equi-join on cell:\n$p")
  }

  test("q39 QUALIFY: rank filter collapses into WindowGroupLimit, one key shuffle") {
    val p = planOf("q39_qualify")
    assert(p.contains("WindowGroupLimit"),
      s"the rn <= 2 predicate should push a per-group limit under the window:\n$p")
    assert(!p.contains("Join"), s"the QUALIFY rewrite must not add joins:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"q39 should shuffle once on o_custkey + once for the final sort (got $exchanges):\n$p")
  }

  test("s15 bm25: no cartesian on the corpus side; stats/df are broadcast") {
    val p = planOf("s15_bm25")
    assert(!p.contains("CartesianProduct"), "cartesian in s15 plan")
    // the doc-frequency and corpus-stat joins must arrive as broadcasts —
    // a corpus-side shuffle for a 3-row table would be a scale defect
    assert(p.contains("BroadcastExchange"), "query-sized tables not broadcast")
  }

  test("sp12 gumbel top-k: bounded-heap selection, no rank window, no global sort of the corpus") {
    val p = planOf("sp12_gumbel_topk")
    assert(!p.contains("Window"), "rank window in sp12 plan — bounded heap expected")
    assert(!p.contains("CartesianProduct"), "cartesian in sp12 plan")
  }

  test("gr05 k-core: equi-joins only in the peel and final assembly") {
    val p = planOf("gr05_kcore")
    assert(!p.contains("CartesianProduct"), "cartesian in gr05 plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested loop in gr05 plan")
  }

  test("sp11 dsir: bucket ratio table is broadcast back to the corpus side") {
    val p = planOf("sp11_dsir_weights")
    assert(!p.contains("CartesianProduct"), "cartesian in sp11 plan")
    assert(p.contains("BroadcastExchange"), "256-bucket ratio table not broadcast")
  }

  test("t28 quality classifier: the model joins as BROADCAST, the probe " +
      "side is map-only up to the per-doc aggregation") {
    val p = planOf("t28_quality_classifier")
    assert(p.contains("BroadcastHashJoin"),
      s"weights model must broadcast-join:\n${p.take(900)}")
    // the one BroadcastNestedLoopJoin is the TRAINING side's 1-row
    // scalar-totals crossJoin(broadcast(…)) — the suite's accepted
    // pattern; what must never appear is an unbroadcast cartesian
    assert(!p.contains("CartesianProduct"),
      s"cartesian in t28 plan:\n${p.take(900)}")
  }
}
