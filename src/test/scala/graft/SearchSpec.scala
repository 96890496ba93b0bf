package graft

import org.apache.spark.sql.functions._

/** [[graft.ops.Search]] (BM25 + RRF) and the gr05 k-core oracle-unroll
  * assumption.
  */
class SearchSpec extends GraftSuite {

  import spark.implicits._

  test("bm25 matches the hand-computed Okapi formula on a tiny corpus") {
    val docs = Seq(
      (1L, "data model data"), // tf(data)=2, dl=3
      (2L, "model train"),     // no query term... 'train' not queried
      (3L, "data"),            // tf(data)=1, dl=1
      (4L, "other words here") // no hit, dl=3
    ).toDF("doc_id", "text")
    val out = graft.ops.Search.bm25(docs, "doc_id", "text", Seq("data"))
      .orderBy("doc_id").collect()
    // N=4, df(data)=2, avgdl=(3+2+1+3)/4=2.25
    val idf = math.log(((4.0 - 2.0 + 0.5) / (2.0 + 0.5)) + 1.0)
    def score(tf: Double, dl: Double): Long =
      math.round(((idf * (tf * (1.25 + 1.0))) /
        (tf + ((dl / 2.25) * 0.75 + (1.0 - 0.75)) * 1.25)) * 1e6)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, score(2.0, 3.0)), (2L, 0L, 0L),
        (3L, 1L, score(1.0, 1.0)), (4L, 0L, 0L)))
  }

  test("phraseSearch: consecutive tokens only, overlap counting, case/punct-insensitive") {
    val docs = Seq(
      (1L, "Slow, HASH batch! then slow hash batch again"), // 2 matches
      (2L, "slow batch hash"),                              // reordered: no
      (3L, "slow hash and batch"),                          // gap: no
      (4L, "prefix slow hash batch"),                       // 1 match at pos 1
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = graft.ops.Search.phraseSearch(docs, "doc_id", "text",
        "slow hash batch")
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L), (4L, 1L, 1L)))
    // self-overlapping phrase: "a a" in "a a a" matches at 0 AND 1
    val ov = graft.ops.Search.phraseSearch(
        Seq((9L, "a a a")).toDF("doc_id", "text"), "doc_id", "text", "a a")
      .as[(Long, Long, Long)].collect().toSeq
    assert(ov == Seq((9L, 2L, 0L)))
    // single-token phrase degenerates to token occurrence counting
    val one = graft.ops.Search.phraseSearch(docs, "doc_id", "text", "slow")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(one == Seq((1L, 2L, 0L), (2L, 1L, 0L), (3L, 1L, 0L), (4L, 1L, 1L)))
  }

  test("phraseSearch maxTokenDocFreq: high-frequency token fails loudly, " +
      "selective phrase passes under the same cap") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the lazy dog"),
      (3L, "the cat"), (4L, "the bird"), (5L, "quick feet")
    ).toDF("doc_id", "text")
    // 'the' appears in 4 docs > cap 2 — rejected, naming token and df
    val e = intercept[IllegalArgumentException] {
      graft.ops.Search.phraseSearch(docs, "doc_id", "text", "the quick",
        maxTokenDocFreq = Some(2L))
    }
    assert(e.getMessage.contains("'the' (df=4)"))
    assert(e.getMessage.contains("maxTokenDocFreq=2"))
    // a selective phrase under the same cap still answers exactly
    val ok = graft.ops.Search.phraseSearch(docs, "doc_id", "text",
        "quick brown", maxTokenDocFreq = Some(2L))
      .as[(Long, Long, Long)].collect().toSeq
    assert(ok == Seq((1L, 1L, 1L)))
  }

  test("proximitySearch: min covering window over occurrence combos; " +
      "docs missing a term drop; frequency cap refuses") {
    val docs = Seq(
      (1L, "a x b y c z"),     // x@1, z@5 -> span 4
      (2L, "z q x q z"),       // x@2, z@{0,4} -> spans 2,2 -> min 2
      (3L, "x only here")      // no z -> absent
    ).toDF("doc_id", "text")
    val got = graft.ops.Search.proximitySearch(docs, "doc_id", "text",
        Seq("x", "z"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 1L), (2L, 2L, 2L)))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Search.proximitySearch(docs, "doc_id", "text",
        Seq("x", "z"), maxTokenDocFreq = Some(1L))
    }
    assert(e.getMessage.contains("maxTokenDocFreq=1"))
  }

  test("rakeKeywords: hand-computed degree/frequency scores, stopword " +
      "phrase splitting, deterministic ties") {
    val docs = Seq(
      "Deep learning of deep models!",
      "deep learning is fast"
    ).toDF("text")
    // phrases: 'deep learning' x2, 'deep models', 'fast'
    // deg/freq: deep 6/3=2, learning 4/2=2, models 2/1=2, fast 1/1=1
    val got = graft.ops.TextAnalysis.rakeKeywords(docs, "text", topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("deep learning", 2L, 4000000L, 2L),
      ("deep models", 2L, 4000000L, 1L),
      ("fast", 1L, 1000000L, 1L)))
    // punctuation DELIMITS phrases (the classic RAKE rule): a sentence
    // boundary must never fuse two phrases into one long one
    val punct = Seq("neural networks. neural networks").toDF("text")
    val gotP = graft.ops.TextAnalysis.rakeKeywords(punct, "text", topK = 5)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(gotP == Seq(("neural networks", 2L, 4000000L, 2L)))
  }

  test("kAnonymity: nulls form their own group; summary arithmetic") {
    val df = Seq(
      (Some("a"), "x"), (Some("a"), "x"), (Some("a"), "x"),
      (Some("b"), "x"), (Some("b"), "x"),
      (None, "x")
    ).toDF("q1", "q2")
    val r = graft.ops.Profile.kAnonymity(df, Seq("q1", "q2"), k = 3L)
      .collect().head
    assert(r.getLong(0) == 3L)           // k_threshold
    assert(r.getLong(1) == 1L)           // k_actual: the null group of 1
    assert(r.getLong(2) == 3L)           // n_groups (null group counted)
    assert(r.getLong(3) == 2L)           // violating: (b,x)=2 and (null,x)=1
    assert(r.getLong(4) == 3L)           // rows_at_risk
    assert(r.getDouble(5) == 0.5)        // 3 of 6
  }

  test("hardNegatives: band boundaries, anchor/positive exclusion, " +
    "k cap, empty band drops the anchor") {
    // 1-d unit "embeddings" don't discriminate (cosine = ±1), so use 2-d
    // vectors with hand-computable cosines against anchor (1, 0):
    // cand sim = x / |v|. pos = (1, 1) -> pos_sim = 1/sqrt(2) ~ 0.7071
    val emb = Seq(
      (0L, Seq(1f, 0f)),      // anchor
      (1L, Seq(1f, 1f)),      // positive: pos_sim ~ 0.7071
      (2L, Seq(2f, 1f)),      // sim ~ 0.8944 — ABOVE pos_sim, excluded
      (3L, Seq(1f, 2f)),      // sim ~ 0.4472 — below band, excluded
      (4L, Seq(3f, 2f)),      // sim ~ 0.8321 — above pos_sim, excluded
      (5L, Seq(2f, 2f)),      // sim ~ 0.7071 — equals pos_sim: sim <
                              // pos_sim is FALSE (strict), excluded
      (6L, Seq(3f, 3.2f))     // sim ~ 0.6839 — inside the band
    ).toDF("vec_id", "embedding")
    val pairs = Seq((0L, 1L)).toDF("a_id", "p_id")
    val got = graft.ops.Similarity.hardNegatives(
      emb, pairs, "vec_id", "embedding", "a_id", "p_id",
      k = 10, margin = 0.1)
      .orderBy("anchor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq((0L, 1L, 1L, 6L))) // (anchor, pos, rank, neg)
    // a zero margin empties the band — the anchor emits no rows (the
    // topk_by group never forms), not a zero-row placeholder
    assert(graft.ops.Similarity.hardNegatives(
      emb, pairs, "vec_id", "embedding", "a_id", "p_id",
      k = 10, margin = 0.0).count() == 0)
    // k caps the band: margin wide enough for 3+ negatives, k = 2
    val capped = graft.ops.Similarity.hardNegatives(
      emb, pairs, "vec_id", "embedding", "a_id", "p_id",
      k = 2, margin = 0.7)
      .orderBy("rank").collect().map(_.getLong(3)).toSeq
    assert(capped == Seq(6L, 3L)) // sim desc, anchor/pos never appear
    // two pairs sharing an anchor (same pos_sim by symmetry) each get
    // their OWN band keyed by (anchor_id, pos_id) — no merged groups,
    // no duplicated candidates inside one group
    val twoPairs = Seq((0L, 1L), (0L, 5L)).toDF("a_id", "p_id")
    val perPair = graft.ops.Similarity.hardNegatives(
      emb, twoPairs, "vec_id", "embedding", "a_id", "p_id",
      k = 10, margin = 0.1)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toSeq
    // pos_sim is ~0.7071 for BOTH pairs (vec 1 and vec 5 are parallel);
    // pair (0,1): band holds 6 only (5 == pos_sim excluded strictly);
    // pair (0,5): candidate 1 now sits AT pos_sim (excluded), 6 in band
    val grouped = perPair.groupBy(_._1).map { case (k2, v) =>
      (k2, v.map(_._2).sorted) }
    assert(grouped((0L, 1L)) == Seq(6L))
    assert(grouped((0L, 5L)) == Seq(6L))
  }

  test("randomProjection (s21): deterministic md5 signs, exact map-side " +
    "arithmetic, outDim shape") {
    def sign(seed: Long, j: Int, i: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${seed}_${j}_$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
    val seed = graft.functions.Registry.DefaultSeed
    val emb = Seq((1L, (1 to 8).map(_.toFloat)),
      (2L, (1 to 8).map(i => (9 - i).toFloat)))
      .toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.randomProjection(
        emb, "vec_id", "embedding", inDim = 8, outDim = 3)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(got.forall(_._2.length == 3))
    // hand-recompute y_j = sum_i s_ij * x_i with the same derivation
    val expected1 = (0 until 3).map(j =>
      (0 until 8).map(i => sign(seed, j, i) * (i + 1).toDouble).sum)
    assert(got(0)._2 == expected1)
    // deterministic across invocations
    val again = graft.ops.Similarity.randomProjection(
        emb, "vec_id", "embedding", inDim = 8, outDim = 3)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    assert(got.map(_._2).toSeq == again.toSeq)
    // shape refusal
    assert(intercept[IllegalArgumentException](
      graft.ops.Similarity.randomProjection(
        emb, "vec_id", "embedding", inDim = 8, outDim = 9))
      .getMessage.contains("outDim"))
  }

  test("rrfFuse: full-outer semantics, absent rank contributes zero") {
    val lex = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    val vec = Seq((20L, 1L), (30L, 2L)).toDF("id", "rank")
    val out = graft.ops.Search.rrfFuse(lex, vec, "id")
      .orderBy("id").collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    assert(byId(10L) == ((Some(1L), None, 1.0 / 61.0)))
    assert(byId(20L)._3 == 1.0 / 62.0 + 1.0 / 61.0)
    assert(byId(30L) == ((None, Some(2L), 1.0 / 62.0)))
  }

  test("gr05 oracle-unroll pin: k=4 peel reaches fixpoint within 5 rounds at EVERY shipped SF") {
    // the driver oracle unrolls 5 peel rounds; this pin fails loudly if a
    // testdata change ever pushes convergence past the unroll depth. The
    // correctness gate runs at sf0.01, the bench at sf0.1 — pin all
    // shipped corpora so a scale switch cannot silently break the unroll
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val ids = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(col("doc_id")).as[Long].collect()
      val de = ids.flatMap(i => Seq((i, (i * 7 + 1) % 97),
        (i, (i * 13 + 3) % 97), (i, (i * 29 + 7) % 97))).filter(p => p._1 != p._2)
      val adj = (de ++ de.map(_.swap)).distinct
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      var active = adj.keySet
      var rounds = 0
      var stable = false
      while (!stable && rounds < 5) {
        val next = active.filter(u => (adj(u) & active).size >= 4)
        rounds += 1
        stable = next == active
        active = next
      }
      assert(stable, s"$sf: k-core did not stabilize within the oracle's 5-round unroll")
      if (sf == "sf0.01")
        assert(active.size == 96, s"unexpected 4-core size ${active.size}")
    }
  }
}
