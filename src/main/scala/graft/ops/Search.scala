package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical and hybrid retrieval over a document corpus — the search-side
  * capability a training-data pipeline needs for eval-set mining, data
  * curation queries, and RAG corpus preparation (engine extension; the
  * reference has no retrieval surface).
  *
  * Scale shape: the query is a handful of terms, so everything
  * query-sized (term doc-frequencies, corpus stats) is broadcast; the
  * corpus side is one tokenize pass with a term-membership filter pushed
  * before the explode's shuffle, then a per-(doc, term) count. No join
  * ever keys on raw text, and nothing is driver-side.
  */
object Search {

  /** Okapi BM25 scores against a bag-of-terms query.
    *
    * Per matched (doc, term):
    *   idf = ln((N - df + 0.5) / (df + 0.5) + 1)        (Lucene form)
    *   s   = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    * summed per doc in 1e6 fixed point (the t09 discipline: per-term
    * doubles are rounded to integers BEFORE the order-free integer sum,
    * so the result is bit-reproducible across engines and partitionings).
    * Defaults k1 = 1.25, b = 0.75 are chosen binary-exact so every
    * constant folds to the same double in any engine.
    *
    * Output: one row per input doc — (idCol, n_terms, score_fp); docs
    * matching no term keep (0, 0).
    */
  /** Exact PHRASE search over positional postings (s18): documents where
    * `phrase`'s tokens occur consecutively, with match counts and the
    * first match position. Complements [[bm25]]'s bag-of-words ranking
    * with the exactness a corpus query ("find the documents containing
    * this sentence") needs — the inverted-index-with-positions eval,
    * run relationally.
    *
    * Scale shape: the posting explode filters to the PHRASE'S OWN
    * tokens before anything shuffles (selectivity ≈ phrase vocabulary /
    * corpus vocabulary, pushed into the scan stage), then one hash
    * equi-join per additional token keyed on (doc, pos + i) — join
    * inputs are already phrase-token-only postings, so the fan-in is
    * occurrence counts, never corpus size. Tokenization is
    * [[TextOps.tokens]] (lowercase, `\W+` split, empties dropped) on
    * BOTH the corpus and the phrase, so "Slow, HASH batch!" matches the
    * phrase "slow hash batch". Output: (idCol, n_matches, first_pos)
    * for matching documents only (0-based token position).
    *
    * MEMORY CONTRACT: the materialized posting holds one row per
    * occurrence of each phrase token, so a phrase built from stop words
    * ("of the") pins a posting proportional to the corpus — exact phrase
    * search over ubiquitous tokens has no sublinear candidate set, and a
    * token cannot be dropped from the phrase without changing semantics.
    * Pass `maxTokenDocFreq` to make that explicit: any phrase token
    * appearing in more documents FAILS LOUDLY (naming the token and its
    * document frequency) instead of silently materializing a
    * corpus-sized posting; the check is one extra aggregation over the
    * same filtered posting pass, paid only when the cap is set.
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
                   phrase: String,
                   maxTokenDocFreq: Option[Long] = None): DataFrame = {
    val toks = phrase.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
    require(toks.nonEmpty, "phrase must contain at least one word token")
    // materialize the phrase-token posting ONCE (the d17/bm25
    // discipline): it feeds the anchor plus one join arm per extra
    // token, and Spark has no cross-branch CSE — a lazy plan would
    // re-scan and re-tokenize the whole corpus per phrase token. After
    // the isin filter it is tiny (phrase-token occurrences only).
    val postLazy = df.select(col(idCol).as("__id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("__pos", "__tok")))
      .filter(col("__tok").isin(toks.distinct: _*))
    maxTokenDocFreq.foreach { cap =>
      require(cap > 0, "maxTokenDocFreq must be positive")
      // document frequency per phrase token BEFORE pinning the posting:
      // the guard collects one tiny row per distinct phrase token
      val hot = postLazy.groupBy(col("__tok"))
        .agg(count_distinct(col("__id")).as("__df"))
        .filter(col("__df") > cap)
        .collect()
      if (hot.nonEmpty) {
        val worst = hot.map(r => s"'${r.getString(0)}' (df=${r.getLong(1)})")
          .mkString(", ")
        throw new IllegalArgumentException(
          s"phraseSearch: phrase token(s) $worst exceed maxTokenDocFreq=" +
            s"$cap — the posting for this phrase is corpus-sized; raise " +
            "the cap (accepting the memory cost) or search a more " +
            "selective phrase")
      }
    }
    val post = postLazy.localCheckpoint(true)
    val anchor = post.filter(col("__tok") === toks.head)
      .select(col("__id"), col("__pos"))
    val matched = toks.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        val p = post.filter(col("__tok") === t)
          .select(col("__id").as(s"__id$i"), col("__pos").as(s"__p$i"))
        acc.join(p, col("__id") === col(s"__id$i") &&
            col(s"__p$i") === col("__pos") + i)
          .drop(s"__id$i", s"__p$i")
    }
    matched.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("__pos")).cast("long").as("first_pos"))
      .select(col("__id").as(idCol), col("n_matches"), col("first_pos"))
  }

  /** Proximity search (s19): documents containing ALL query terms, with
    * the MINIMUM token window covering one occurrence of each —
    * `min_span` = min over occurrence choices of (max pos − min pos) —
    * plus the combination count. The "terms near each other" relevance
    * signal between [[bm25]]'s bag-of-words and [[phraseSearch]]'s
    * exactness.
    *
    * Scale shape: the positional posting filters to the query's own
    * terms BEFORE any shuffle and materializes once (the phraseSearch
    * discipline), then one doc-keyed equi-join per additional term
    * enumerates occurrence combinations — per-doc cost is the PRODUCT
    * of the terms' within-doc occurrence counts, so this is for
    * SELECTIVE terms; `maxTokenDocFreq` refuses loudly on
    * corpus-frequency terms (the phraseSearch cap contract).
    * Output: (idCol, min_span, n_combos) for matching documents only.
    */
  def proximitySearch(df: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String],
                      maxTokenDocFreq: Option[Long] = None): DataFrame = {
    val toks = terms.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    require(toks.size >= 2,
      s"proximitySearch needs at least 2 distinct terms, got $toks")
    val postLazy = df.select(col(idCol).as("__id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("__pos", "__tok")))
      .filter(col("__tok").isin(toks: _*))
    maxTokenDocFreq.foreach { cap =>
      require(cap > 0, "maxTokenDocFreq must be positive")
      val hot = postLazy.groupBy(col("__tok"))
        .agg(count_distinct(col("__id")).as("__df"))
        .filter(col("__df") > cap).collect()
      if (hot.nonEmpty) throw new IllegalArgumentException(
        s"proximitySearch: term(s) ${hot.map(r => s"'${r.getString(0)}' " +
          s"(df=${r.getLong(1)})").mkString(", ")} exceed " +
          s"maxTokenDocFreq=$cap — the occurrence-combination join is " +
          "multiplicative; search more selective terms or raise the cap")
    }
    val post = postLazy.localCheckpoint(true)
    val anchor = post.filter(col("__tok") === toks.head)
      .select(col("__id"), col("__pos").as("__p0"))
    val combos = toks.tail.zipWithIndex.foldLeft(anchor) {
      case (acc, (t, i)) =>
        acc.join(post.filter(col("__tok") === t)
          .select(col("__id"), col("__pos").as(s"__p${i + 1}")), Seq("__id"))
    }
    val ps = toks.indices.map(i => col(s"__p$i"))
    combos
      .groupBy(col("__id"))
      .agg(min(greatest(ps: _*) - least(ps: _*)).cast("long").as("min_span"),
        count(lit(1)).as("n_combos"))
      .select(col("__id").as(idCol), col("min_span"), col("n_combos"))
  }

  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String],
           k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    val toks = df.select(col(idCol),
      filter(split(lower(coalesce(col(textCol), lit(""))), "\\W+"),
        x => x =!= "").as("__toks"))
    // materialize the tokenize pass ONCE (the containmentPairs
    // discipline): the corpus-stats aggregate and the term-hit explode
    // both consume it, and as a lazy plan each would re-tokenize
    val withLen = toks.select(col(idCol),
      col("__toks"), size(col("__toks")).cast("double").as("dl"))
      .localCheckpoint(true)
    // integer-valued doubles: the sum is exact below 2^53, so avg is one
    // correctly-rounded division — deterministic across engines
    val stats = withLen.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val hits = withLen
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = hits.groupBy(col(idCol), col("term"))
      .agg(first(col("dl")).as("dl"), count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    // association mirrors the oracle SQL exactly; commutations (constant
    // moved right of the column) are IEEE-safe, reassociations are not
    val idf = log(((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
      + 1.0)
    val lenNorm = ((col("dl") / col("avgdl")) * b + (1.0 - b)) * k1
    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        round(((idf * (col("tf") * (k1 + 1.0))) / (col("tf") + lenNorm))
          * 1e6).cast("long").as("fp"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("fp")).as("score_fp"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"))
  }

  /** Reciprocal-rank fusion of two rankings (Cormack et al., SIGIR'09):
    * rrf(d) = Σ 1/(k + rank_i(d)), the standard score-free way to merge
    * a lexical and a vector ranking. Inputs are (id, rank) frames with
    * rank 1-based; an id absent from one ranking contributes nothing for
    * it (full-outer semantics). k = 60 is the published default.
    *
    * Determinism: each term is one correctly-rounded division and the
    * two-term sum has a fixed order, so the double is reproducible.
    * Ties in rrf are possible (symmetric rank swaps) — downstream
    * ordering must include the id as tiebreak.
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame, idCol: String,
              k: Int = 60): DataFrame = {
    val a = lex.select(col(idCol), col("rank").cast("long").as("r_lex"))
    val b = vec.select(col(idCol), col("rank").cast("long").as("r_vec"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol), col("r_lex"), col("r_vec"),
        (coalesce(lit(1.0) / (lit(k).cast("double") + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k).cast("double") + col("r_vec")), lit(0.0)))
          .as("rrf"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998,
    * public method) — diversify a retrieval pool: greedily pick
    *
    *   step 1:  argmax sim(q, c)
    *   step i:  argmax lambda*sim(q, c) - (1-lambda)*max_{s in S} sim(c, s)
    *
    * ties broken by ascending id at every step. The candidate POOL is
    * retrieval-sized (an ANN top-N), so the pairwise sim matrix is
    * computed in-plan (bounded N^2 rows through the same codegen'd
    * cosine kernel as the retrieval itself) and the k-step greedy —
    * pure argmax control flow over ~N scores — runs on the driver, the
    * same bounded-collect pattern as the IVF centroid pull. Determinism:
    * `lambda*s - (1-lambda)*m` is two correctly-rounded multiplies and a
    * subtract in fixed association, so an unrolled SQL oracle reproduces
    * the selection exactly.
    *
    * Output: (rank, idCol, mmr) for the k selections, rank 1-based;
    * step 1's mmr is lambda*sim (no diversity term yet).
    */
  def mmr(emb: DataFrame, probe: DataFrame, idCol: String, vecCol: String,
          poolSize: Int, k: Int, lambda: Double = 0.5): DataFrame = {
    require(poolSize >= k && k >= 1, s"need poolSize >= k >= 1, got $poolSize/$k")
    // limit(2) bounds the validation scan: the count can stop after two
    // rows instead of running a full job over the probe frame
    require(probe.limit(2).count() == 1, "mmr re-ranks one probe's pool at a time")
    val spark = emb.sparkSession
    // bruteForceTopK names its candidate id column "vec_id" regardless
    // of idCol — select by that contract, not by the caller's name
    val pool = Similarity.bruteForceTopK(emb, probe, idCol, vecCol, poolSize)
      .select(col("vec_id").cast("long").as("cid"), col("sim"))
    val vecs = emb.select(col(idCol).cast("long").as("cid"),
      col(vecCol).cast("array<double>").as("v"))
    val pv = pool.join(vecs, Seq("cid"))
    val cands = pv.select(col("cid"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val registry = graft.functions.Registry
    registry.registerAll(spark)
    val pairRows = pv.as("a").crossJoin(pv.as("b"))
      .filter(col("a.cid") < col("b.cid"))
      .select(col("a.cid"), col("b.cid"),
        call_function("cosine_sim", col("a.v"), col("b.v")).as("s"))
      .collect()
    val pairSim = scala.collection.mutable.Map.empty[(Long, Long), Double]
    pairRows.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      pairSim((x, y)) = r.getDouble(2); pairSim((y, x)) = r.getDouble(2)
    }
    val remaining = scala.collection.mutable.LinkedHashMap(
      cands.sortBy(_._1): _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (rank <- 1 to k) {
      // argmax of the mmr score, ties -> smallest id (iteration is
      // id-ascending and strict > keeps the first maximum)
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      for ((cid, sim) <- remaining) {
        val score =
          if (selected.isEmpty) lambda * sim
          else (lambda * sim) -
            ((1.0 - lambda) * selected.map(s => pairSim((cid, s))).max)
        if (score > bestScore) { bestScore = score; bestId = cid }
      }
      // all-NaN scores (e.g. a zero probe vector NaNs every cosine) would
      // otherwise select -1 and blow up in the next round's pairSim lookup
      require(bestId >= 0L,
        s"mmr step $rank found no finite candidate score " +
          "(all-NaN similarities — check the probe vector)")
      out += ((rank.toLong, bestId, bestScore))
      selected += bestId
      remaining.remove(bestId)
    }
    import spark.implicits._
    out.toSeq.toDF("rank", idCol, "mmr")
  }
}
