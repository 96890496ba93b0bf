package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor stress evidence for SCALE.md: run the most expensive
  * driver queries at sf0.1 and at a derived sf1 (10x rows) and measure
  * per-query wall time and SHUFFLE BYTES via the Spark UI REST API
  * (/api/v1/applications/{app}/stages), attributing stages to a query by
  * submission time. The claim under test: shuffle volume scales with the
  * CANDIDATE/ROW volume (~linear in corpus size for the banded/bucketed
  * dedup family), not quadratically — i.e. the plan shapes SCALE.md
  * argues survive a 10x scale-up with ~10x cost.
  *
  * The sf1 corpus is sf0.1 replicated 10x with id-space offsets and a
  * per-copy text perturbation. The perturbation matters: verbatim copies
  * would plant 10-member duplicate CLUSTERS in every dedup query and
  * inflate pair counts quadratically — a different workload, not a
  * scale-up. Appending one copy-tag token keeps every document distinct
  * while its shingle/signature volume stays the same.
  *
  * Usage: sbt "Test/runMain graft.ScaleStress [outFile]"
  */
object ScaleStress {

  private[graft] val Sf01 = "/root/testdata/sf0.1"
  private[graft] val Sf1 = "target/sf1_derived"
  private val Sf3 = "target/sf3_derived"

  private val Queries = Seq(
    "ap01_approx", "d02_minhash_pairs", "d03_simhash_pairs",
    "d10_decontaminate", "d17_containment_pairs", "q14_math",
    "j04_join_shuffle", "e02_sessionize", "s08_ann_pq", "t06_repetition",
    // round 12: the struct-carry as-of rewrite, the snapshot-diff
    // full-outer join, the segment explode, and the gram-shuffle
    // novelty score — all must scale ~linearly in rows
    "a01_asof_join", "u07_snapshot_diff", "p12_pack_segments",
    "t22_corpus_novelty",
    // round 12b: the cell-bucketed spatial argmin and the iterative
    // relaxation loop — both must scale ~linearly in rows
    "geo01_nearest_site", "gr06_shortest_path",
    // round 12c: the order-keyed basket self-join (pair volume must
    // track orders, not brands²) and the statistics-only cardinality
    // profile (shuffle ∝ distinct keys)
    "q54_market_basket", "pr17_join_cardinality",
    // round 13: native recursive-CTE reachability (frontier joins must
    // track rows, not blow up with path count), the CDC chunk digest
    // rollup (map-only chunking, digest shuffle ∝ chunks), and the
    // hashed-gram novelty posting (long shuffle ∝ grams)
    "gr07_recursive_sql", "d21_cdc_chunk_dedup",
    // round 13b: phrase-token posting joins (fan-in ∝ occurrences) and
    // the bounded-heap kNN (shuffle ∝ k·probes, not candidates)
    "s18_phrase_search", "geo05_knn_sites",
    // round 14: exact-substring runs (anchor join ∝ posting, islands ∝
    // shared content — must track rows, not pairs²), the removal
    // action on top of them, and the RAKE vocabulary rollup (corpus
    // pass collapses to distinct phrases before any reuse)
    "d22_exact_substr", "d23_remove_shared_runs", "t26_rake_keywords",
    // round 15: the MERGE full-outer lowering (one keyed join — must
    // track rows), UNION-distinct reachability (rounds ∝ diameter,
    // per-round work ∝ frontier, NOT path count), the classifier gate
    // (broadcast model, map-only probe into one keyed agg), the
    // unigram trainer (E-step map-only over the distinct-word vocab),
    // the same-text EXCLUDE algebra (window pass ∝ rows), and PIVOT
    // (one hash agg into a bounded-wide projection)
    "u09_merge_into", "gr09_recursive_distinct", "t28_quality_classifier",
    "t29_unigram_lm", "w12_window_exclude", "q61_pivot",
    // round 15b: winnowing (map pass + per-doc window; the pair join is
    // df-capped so fan-in stays bounded), corpus tokenization (corpus
    // explode + vocab-sized segmentation — must track rows), and the
    // LATERAL top-N (one correlated join)
    "d25_winnowing_pairs", "t30_unigram_tokenize", "q63_lateral",
    // round 16: WordPiece training (two keyed aggs per round over the
    // distinct-word vocab + model-sized collects — must track rows),
    // corpus tokenization with the trained vocabulary (corpus explode +
    // vocab-sized greedy segmentation), and multi-CTE recursion
    // (helpers bind once; per-round work ∝ frontier)
    "t31_wordpiece", "t32_wordpiece_tokenize", "gr10_recursive_helpers",
    // round 17: correlated UPDATE (one left join + the checkpointed
    // single-execution guard — shuffle must track rows), sequential
    // multi-recursion (one frontier loop at a time), the GROUPS-split
    // min/max EXCLUDE (three windows, ONE exchange), and the COPY
    // round-trip chain (terminal writes + pruned re-scans)
    "u13_correlated_dml", "gr11_multi_recursion",
    "w16_minmax_exclude_group", "io22_copy_from",
    // round 17b: hard-negative mining (pairs broadcast, corpus map-side,
    // shuffle ∝ k·pairs), DISTINCT-count windows (per-row collect ∝
    // frame — bounded frames stay O(frame)), the bits-per-byte rollup
    // (t27's vocabulary-shaped aggs + one group rollup), and the
    // partitioned export (terminal exchange-free write, pruned re-scan)
    "s20_hard_negatives", "w18_count_distinct_window",
    "t33_bits_per_byte", "io23_copy_partitioned",
    // round 18
    "gr12_mutual_recursion", "t34_token_windows", "s21_random_projection",
    "w22_sum_distinct_window", "w23_ignore_nulls")

  def main(args: Array[String]): Unit = {
    // UI ON (overriding the engine default) — the REST stage endpoint is
    // the measurement instrument here; must be the first session in the
    // JVM for the static conf to take effect
    val spark = GraftSession.builder("local[32]")
      .config("spark.ui.enabled", "true").getOrCreate()
    graft.functions.Registry.registerAll(spark)
    spark.sparkContext.setLogLevel("ERROR")
    require(spark.sparkContext.uiWebUrl.isDefined, "UI did not come up")
    buildSf1(spark)
    // optional third scaling point (30x) for the scale-sensitive dedup
    // families — three points pin the scaling exponent, two only bound it
    val sf3 = args.contains("--sf3")
    if (sf3) buildScaled(spark, 30, Sf3)

    val out = new StringBuilder
    val scaleSensitive = Set("d02_minhash_pairs", "d03_simhash_pairs",
      "d17_containment_pairs", "e02_sessionize", "q14_math",
      "t22_corpus_novelty")
    val runs = Seq("sf0.1" -> Sf01, "sf1" -> Sf1) ++
      (if (sf3) Seq("sf3" -> Sf3) else Nil)
    // optional subset (comma-separated names) — a new round's additions
    // can stress alone without re-running the whole accumulated list
    val only = sys.env.get("SPARK_GRAFT_STRESS_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    for (q <- Queries.filter(n => only.forall(_.contains(n)));
         (sfName, dir) <- runs
         if sfName != "sf3" || scaleSensitive(q)) {
      val t0 = System.currentTimeMillis()
      // construction INSIDE the timing (matches graft.Bench): builders
      // with eager checkpoints (d17's posting materialization) must be
      // charged to the query, not silently excluded. noop sink so the
      // FULL plan executes (count() would let the optimizer prune
      // windows/sorts and undercount shuffles).
      val df = SparkEntry.queries(q)(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.currentTimeMillis() - t0) / 1000.0
      Thread.sleep(1000) // let the status store absorb the final stages
      val (sw, sr) = shuffleBytesSince(spark, t0)
      val rows = df.count() // AFTER attribution: excluded from both
      val line = f"""{"q":"$q","sf":"$sfName","rows":$rows,""" +
        f""""sec":$sec%.2f,"shuffle_write_mb":${sw / 1e6}%.2f,""" +
        f""""shuffle_read_mb":${sr / 1e6}%.2f}"""
      println("STRESS " + line)
      out.append(line).append('\n')
    }
    val positional = args.filterNot(_.startsWith("--"))
    val target =
      if (positional.nonEmpty) positional(0) else "target/scale_stress.jsonl"
    java.nio.file.Files.write(java.nio.file.Paths.get(target),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"STRESS DONE -> $target")
    spark.stop()
  }

  /** Sum shuffle write/read bytes over stages submitted since `sinceMs`,
    * from the UI REST endpoint (the same numbers the Spark UI shows).
    */
  private def shuffleBytesSince(spark: SparkSession, sinceMs: Long): (Long, Long) = {
    val ui = spark.sparkContext.uiWebUrl.getOrElse(
      sys.error("Spark UI disabled; shuffle attribution needs spark.ui.enabled"))
    val app = spark.sparkContext.applicationId
    val url = new java.net.URI(s"$ui/api/v1/applications/$app/stages?status=complete").toURL
    val body = {
      val in = url.openStream()
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val stages = JsonMethods.parse(body).asInstanceOf[JArray].arr
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd'T'HH:mm:ss.SSS'GMT'")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("GMT"))
    var sw = 0L
    var sr = 0L
    for (st <- stages) {
      val sub = st \ "submissionTime" match {
        case JString(s) => try fmt.parse(s).getTime catch { case _: Exception => 0L }
        case _ => 0L
      }
      if (sub >= sinceMs) {
        st \ "shuffleWriteBytes" match { case JInt(b) => sw += b.toLong; case _ => }
        st \ "shuffleReadBytes" match { case JInt(b) => sr += b.toLong; case _ => }
      }
    }
    (sw, sr)
  }

  private[graft] def buildSf1(spark: SparkSession): Unit =
    buildScaled(spark, 10, Sf1)

  /** Derive a copies-x corpus (idempotent: skipped when already on disk). */
  /** Bump whenever the derivation below changes: the marker content is
    * checked, not just its existence, so a corpus built by an older
    * derivation is rebuilt instead of silently served stale (e.g. the
    * v2 switch to contiguous doc_id offsets changed gr06's graph from a
    * dead-frontier one to a real 10x scale-up).
    */
  private val CorpusVersion = "v2-contiguous-docids-scaled-customer"

  private def deleteRec(f: java.io.File): Unit = if (f.exists()) {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete()
  }

  private[graft] def buildScaled(spark: SparkSession, copies: Int,
                          outDir: String): Unit = {
    val marker = java.nio.file.Paths.get(s"$outDir/_DONE")
    if (java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8) == CorpusVersion) return
    deleteRec(new java.io.File(outDir))
    println(s"STRESS building derived corpus (${copies}x sf0.1) -> $outDir ...")
    def write(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val src = spark.read.parquet(s"$Sf01/$t.parquet")
      (0 until copies).map(i => f(src, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    write("lineitem")((d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
    write("orders")((d, i) => // same key offset as lineitem: join fan-out stays linear
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
    // per-copy character substitution, not an appended tag: near-dup
    // detection exists to see through small edits, so a one-token tag
    // leaves copies ~0.95-Jaccard similar and plants copy-count-member
    // near-dup CLUSTERS (pair volume grows quadratically — a different
    // workload). TWO rotated alphabets (vowel-ish by i mod 10,
    // consonant-ish by i div 10) give every copy < 100 a distinct
    // substitution, so every shingle differs across copies while doc
    // lengths and within-copy duplicate structure are preserved —
    // candidates scale linearly, as a real bigger corpus would.
    val alpha = "aeiounstrl"
    val beta = "bcdfghjkmp"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    // CONTIGUOUS doc_id offsets (i * count), not sparse i*1e7 blocks:
    // gr06 derives graph edges as (doc_id*7+1) % count, and a sparse id
    // space would point most edges at non-existent vertices — the
    // frontier would die after one hop and the "scaled" graph would be
    // a different (and much smaller) workload, not a 10x one.
    val nDocs = spark.read.parquet(s"$Sf01/documents.parquet").count()
    write("documents")((d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * nDocs))
        .withColumn("text",
          if (i == 0) col("text")
          else translate(translate(col("text"), alpha, rot(alpha, i % 10)),
            beta, rot(beta, i / 10))))
    write("events")((d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * 100000000L))
        .withColumn("user_id", col("user_id") + lit(i * 1000000L)))
    write("embeddings")((d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
    // customer scales (geo01 probes grow with the corpus); supplier
    // stays fixed — a site catalog is a bounded dimension, and keeping
    // it constant is what makes spatial candidate volume scale with the
    // probe count instead of probe x site density. The +1 in the offset
    // keeps per-copy derived coordinates off the 320-cycle so copies
    // don't stack onto identical grid points.
    write("customer")((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * 1000001L)))
    for (t <- Seq("region", "nation", "supplier", "part"))
      spark.read.parquet(s"$Sf01/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/_DONE"),
      CorpusVersion.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"STRESS corpus ready: $outDir")
  }
}
