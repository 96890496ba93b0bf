package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * All pure Catalyst expression trees (regexp/length arithmetic) —
  * map-only, codegen'd, trivially distributed; and every formula is
  * mirrorable in ANSI SQL so the DuckDB oracle can check it exactly.
  */
object TextAnalysis {

  /** Stopword alternations per language (n-gram heuristic language ID:
    * count closed-class word hits and take the argmax).
    */
  val StopwordRe: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|it|for|was)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|mit|auf|zu)\\b",
    "fr" -> "\\b(le|la|les|et|est|dans|que|pour|une|pas)\\b",
    "es" -> "\\b(el|los|las|de|que|y|en|un|por|con)\\b")

  def stopCount(c: Column, re: String): Column =
    regexp_count(lower(c), lit(re))

  /** Predicted language code, 'und' when no stopword hits at all.
    * Deterministic argmax: earlier language wins ties.
    */
  def langId(c: Column): Column = {
    val counts = StopwordRe.map { case (lang, re) => lang -> stopCount(c, re) }
    val best = greatest(counts.map(_._2): _*)
    counts.foldRight(lit("und")) { case ((lang, cnt), els) =>
      when(cnt > 0 && cnt === best, lit(lang)).otherwise(els)
    }
  }

  /** Whitespace/word-boundary token count. */
  def tokenCount(c: Column): Column = regexp_count(c, lit("\\w+"))

  /** Flesch reading-ease + Flesch-Kincaid grade (Flesch 1948 / Kincaid
    * et al. 1975, the standard readability gate in text curation) from
    * regex count heuristics: words = `\w+` runs, sentences = `[.!?]+`
    * runs, syllables ≈ vowel-groups `[aeiouy]+` in the lowercased text.
    * Counts are exact integers and the two formulas are single
    * correctly-rounded double chains, so an external engine reproduces
    * every value bit-for-bit. Map-only, codegen'd regex work; zero
    * shuffles.
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val w = regexp_count(t, lit("\\w+")).cast("long")
    val s = regexp_count(t, lit("[.!?]+")).cast("long")
    val y = regexp_count(lower(t), lit("[aeiouy]+")).cast("long")
    val wps = w.cast("double") / greatest(s, lit(1L))
    val ypw = y.cast("double") / greatest(w, lit(1L))
    df.select(col(idCol), w.as("n_words"), s.as("n_sentences"),
      y.as("n_syllables"),
      (lit(206.835) - lit(1.015) * wps - lit(84.6) * ypw).as("flesch_ease"),
      (lit(0.39) * wps + lit(11.8) * ypw - lit(15.59)).as("fk_grade"))
  }

  /** BPE token count under a fixed merges table ([[graft.functions.Bpe]])
    * — the budget unit a training pipeline actually pays in, where
    * [[tokenCount]] counts regex words. Map-only, codegen'd; merges ride
    * as a plan-time literal.
    */
  def bpeTokenCount(c: Column,
                    merges: Seq[(String, String)] =
                      graft.functions.Bpe.EnglishMerges): Column =
    call_function("bpe_token_count", c,
      lit(merges.map { case (l, r) => s"$l $r" }.toArray))

  /** The BPE token sequence itself (array of strings). */
  def bpeTokens(c: Column,
                merges: Seq[(String, String)] =
                  graft.functions.Bpe.EnglishMerges): Column =
    call_function("bpe_tokens", c,
      lit(merges.map { case (l, r) => s"$l $r" }.toArray))

  /** Distributed BPE merge TRAINING (t25): learn the top-`numMerges`
    * byte-pair merges from a corpus — the real tokenizer-training loop
    * (Sennrich et al. 2016) whose one-round candidate scan t19 computes
    * and whose OUTPUT [[bpeTokens]] consumes. Output: one row per
    * learned merge, (rank, lhs, rhs, pair_count), rank 0 first.
    *
    * Scale shape: the corpus collapses to the DISTINCT-word vocabulary
    * once (one shuffle on word; at 100 TB the vocab is millions of rows
    * while the corpus is trillions of tokens), then every training round
    * is ONE keyed aggregation over vocab-adjacent symbol pairs + a
    * 1-ROW argmax collect (TakeOrdered — no full sort) + a map-only
    * merge application broadcast into the next round as a plan literal.
    * Rounds run on [[Iterate.loop]] so plan depth and recovery cost stay
    * O(one round). Nothing corpus-sized ever reaches the driver.
    *
    * Determinism: pre-tokenization mirrors [[graft.functions.Bpe]]
    * (lowercase `[a-z0-9]+` runs); pair counts weight by word frequency
    * and count overlapping occurrences (the classic get_stats); argmax
    * tie-breaks on (count desc, lhs asc, rhs asc); merge application is
    * the greedy leftmost non-overlapping fold — which a repeated
    * `replace`-to-fixpoint re-derives exactly (the oracle's recursive
    * CTE), and which matches [[graft.functions.BpeVocab]]'s scan because
    * a merge's product can never equal its own left constituent. The
    * fold runs as an array aggregate over the VOCAB (not the corpus), so
    * the interpreted-lambda cost is vocab × word-length per round.
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = df.sparkSession
    val vocab0 = df.select(explode(split(lower(coalesce(col(textCol),
        lit(""))), "[^a-z0-9]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .select(col("wn"), transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("syms"))
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var drained = false // once empty, remaining rounds skip their agg
    Iterate.loop(vocab0, numMerges) { (vocab, _) =>
      if (drained) vocab else {
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("wn"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          i => struct(col("syms")(i).as("l"),
            col("syms")(i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wn")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) {
        drained = true // vocabulary fully merged — remaining rounds no-op
        vocab
      } else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        learned += ((learned.size, l, r, top.head.getLong(2)))
        // greedy leftmost non-overlapping application of (l, r): fold
        // each word's symbols; a just-merged product (l+r != l) never
        // re-merges, so the fold IS the single left-to-right scan
        vocab.withColumn("syms", aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, s) => when(size(acc) > 0 &&
              element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(s)))))
      }
      }
    }
    spark.createDataFrame(learned.toSeq)
      .toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** Unigram-LM (SentencePiece-style) tokenizer TRAINING (t29) — the
    * other public tokenizer-training algorithm beside [[bpeTrain]]'s
    * BPE (Kudo 2018, "Subword Regularization"): hold a piece table with
    * log-probabilities, alternate
    *
    *   E-step: per word, the VITERBI-best segmentation under current
    *           piece scores (hard-EM — the standard deterministic
    *           simplification of the paper's full E-step);
    *   M-step: piece count = Σ over words of wn · uses-in-best-path,
    *           score_fp(p) = round(ln((c+1)/(T+V)) · 1e6) — add-one
    *           smoothing in 1e6 fixed point (the t09 discipline);
    *   prune:  top-`budget` pieces by (count desc, piece asc) plus ALL
    *           single characters (segmentability guarantee), the
    *           paper's prune-to-budget per round.
    *
    * Seeding follows SentencePiece's make_seed_sentence_pieces: the
    * most frequent substrings (length ≤ maxPieceLen) of the distinct-
    * word vocabulary. Fully deterministic: fixed-point scores, total
    * tie-orders everywhere, and Viterbi ties break toward the LONGEST
    * last piece (the first-maximum rule both engines express as
    * array_position of the max).
    *
    * Scale shape: the corpus collapses to the distinct-word vocab ONCE
    * (one pass, like [[bpeTrain]]); every E-step is a MAP-ONLY fold
    * over the vocab with the piece table inlined as a literal map (the
    * model is ≤ budget+chars rows — the t28 broadcast-model analog;
    * enforced ≤ 512) followed by one keyed count aggregation; the
    * driver holds only the model between rounds. Words longer than
    * `maxWordLen` are excluded from TRAINING (documented — the
    * long-tail cut every seed-vocab implementation applies; inference
    * via [[unigramSegment]] has no such cap... it shares maxWordLen's
    * fold bound, so keep them consistent).
    *
    * Output: (piece, c, score_fp) — final counts and scores, one row
    * per kept piece.
    */
  def unigramLmTrain(df: DataFrame, textCol: String, budget: Int = 40,
                     rounds: Int = 2, maxWordLen: Int = 8,
                     maxPieceLen: Int = 3): DataFrame = {
    require(budget >= 1 && budget <= 476,
      s"budget must be in [1, 476] (model + chars stays under the " +
        s"512-entry literal-map bound), got $budget")
    require(rounds >= 1 && rounds <= 8, s"rounds must be in [1, 8]")
    require(maxWordLen >= 2 && maxWordLen <= 16 &&
      maxPieceLen >= 2 && maxPieceLen <= maxWordLen,
      s"bad maxWordLen=$maxWordLen / maxPieceLen=$maxPieceLen")
    val spark = df.sparkSession
    // ONE corpus pass to the distinct-word vocabulary; pinned — it is
    // re-segmented every round (K consumers)
    val words = df.select(explode(split(lower(coalesce(col(textCol),
        lit(""))), "[^a-z0-9]+")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .localCheckpoint(true)
    val singles = words.selectExpr(
      "explode(transform(sequence(1, length(w)), i -> substring(w, i, 1))) AS p")
      .distinct()
    // prune: top-budget by (c desc, p) — a total order — plus every
    // single char (count 0 when unused), dedup'd (same p ⇒ same c).
    // The counts frame is referenced twice below and its plan carries
    // the round's Viterbi expressions — pin the (piece-domain-sized)
    // rows once instead of re-running the E-step per reference
    def prune(counts0: DataFrame): Seq[(String, Long)] = {
      val counts = counts0.localCheckpoint(true)
      val top = counts.orderBy(col("c").desc, col("p")).limit(budget)
      val kept = top.unionByName(
        singles.join(counts, Seq("p"), "left")
          .select(col("p"), coalesce(col("c"), lit(0L)).as("c")))
        .distinct().orderBy(col("p")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      require(kept.size <= 512,
        s"piece table ${kept.size} exceeds the 512-entry model bound — " +
          "lower the budget or restrict the alphabet")
      kept
    }
    val seed = words.selectExpr("wn",
      s"""explode(flatten(transform(sequence(1, length(w)),
          i -> transform(sequence(1, least($maxPieceLen, length(w) - i + 1)),
          l -> substring(w, i, l))))) AS p""")
      .groupBy(col("p")).agg(sum(col("wn")).as("c"))
    var table = prune(seed)
    (1 to rounds).foreach { _ =>
      val counts = words
        .withColumn("__best", expr(viterbiBest("w", scoresOf(table),
          maxPieceLen)))
        .withColumn("__ps", expr(viterbiBacktrack("w", "__best")))
        .select(col("wn"), explode(col("__ps")).as("p"))
        .groupBy(col("p")).agg(sum(col("wn")).as("c"))
      table = prune(counts)
    }
    val scored = scoresOf(table)
    spark.createDataFrame(table.zip(scored).map { case ((p, c), (_, s)) =>
      (p, c, s)
    }).toDF("piece", "c", "score_fp")
  }

  /** Fixed-point add-one log-prob scores of a (piece, count) table:
    * round(ln((c+1)/(T+V)) · 1e6). java.lang.Math.log is the same
    * double the engines' ln computes — the dsir/t09 mirror rule.
    */
  private def scoresOf(table: Seq[(String, Long)]): Seq[(String, Long)] = {
    val t = table.map(_._2).sum
    val v = table.size
    table.map { case (p, c) =>
      p -> Math.round(Math.log((c + 1.0) / (t + v).toDouble) * 1e6)
    }
  }

  private val ViterbiNeg = "-1000000000000000"

  /** Literal score map: pieces are [a-z0-9]+ by construction (word
    * split), so no escaping is needed — enforced.
    */
  private def scoreMapLit(scores: Seq[(String, Long)]): String = {
    require(scores.nonEmpty && scores.forall(_._1.matches("[a-z0-9]+")),
      "pieces must be non-empty [a-z0-9]+ strings")
    scores.map { case (p, s) => s"'$p', ${s}L" }
      .mkString("map(", ", ", ")")
  }

  /** Forward Viterbi DP as ONE fold over word positions: best(i) =
    * max over j ∈ [i−L, i) of best(j) + score(word[j+1..i]), missing
    * pieces at −10^15 (unreachable — single chars are always present).
    * The appended struct carries (score, backpointer); the FIRST
    * maximum (array_position) is the smallest j = the LONGEST last
    * piece, the deterministic tie rule both engines share.
    */
  private def viterbiBest(wordCol: String, scores: Seq[(String, Long)],
                          maxPieceLen: Int): String = {
    val m = scoreMapLit(scores)
    val cands = s"""transform(sequence(greatest(i - $maxPieceLen, 0), i - 1),
       j -> element_at(acc, j + 1).s +
            coalesce(element_at($m, substring($wordCol, j + 1, i - j)),
                     CAST($ViterbiNeg AS BIGINT)))"""
    s"""aggregate(sequence(1, length($wordCol)),
        array(struct(CAST(0 AS BIGINT) AS s, 0 AS bp)),
        (acc, i) -> concat(acc, array(struct(
          array_max($cands) AS s,
          CAST(greatest(i - $maxPieceLen, 0) +
               array_position($cands, array_max($cands)) - 1 AS INT) AS bp))))"""
  }

  /** Backtrack fold: walk backpointers from the end, prepending each
    * piece — at most length(word) steps, no-op once position 0 is
    * reached. Returns the piece array in word order.
    */
  private def viterbiBacktrack(wordCol: String, bestCol: String): String =
    s"""aggregate(sequence(1, length($wordCol)),
        struct(length($wordCol) AS pos, CAST(array() AS ARRAY<STRING>) AS ps),
        (acc, z) -> IF(acc.pos > 0,
          struct(element_at($bestCol, acc.pos + 1).bp AS pos,
            concat(array(substring($wordCol,
              element_at($bestCol, acc.pos + 1).bp + 1,
              acc.pos - element_at($bestCol, acc.pos + 1).bp)), acc.ps) AS ps),
          acc)).ps"""

  /** Segment words with a TRAINED piece table (the t29 round-trip):
    * adds a `pieces` array column — Viterbi under the table's
    * `score_fp`, map-only (the model inlines as a literal map, bounded
    * 512 like training). Words longer than `maxWordLen` refuse loudly
    * (the fold bound must match training's contract).
    */
  def unigramSegment(words: DataFrame, wordCol: String, pieces: DataFrame,
                     maxWordLen: Int = 8, maxPieceLen: Int = 3): DataFrame = {
    val model = pieces.select(col("piece"), col("score_fp"))
      .orderBy(col("piece")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    require(model.nonEmpty && model.size <= 512,
      s"piece table must hold 1..512 rows, got ${model.size}")
    val over = words.filter(length(col(wordCol)) > maxWordLen ||
      length(col(wordCol)) === 0).limit(1).count()
    require(over == 0,
      s"unigramSegment: words longer than maxWordLen=$maxWordLen (or " +
        "empty) present — segment only what the model was trained for")
    // materialize the (vocab-sized) segmentation before handing it to
    // callers: the Viterbi fold + backtrack is a LARGE expression tree,
    // and a downstream explode/join/aggregate re-planning over it
    // re-evaluates and re-compiles it pathologically (measured: a
    // 31-word segmentation cost 0.5 s alone but 93 s once an explode +
    // join consumed the lazy plan) — the checkpoint pins rows instead
    words
      .withColumn("__best", expr(viterbiBest(wordCol, model, maxPieceLen)))
      .withColumn("pieces", expr(viterbiBacktrack(wordCol, "__best")))
      .drop("__best")
      .localCheckpoint(true)
  }

  /** WordPiece tokenizer TRAINING (t31 — Schuster & Nakajima 2012, the
    * BERT-family trainer; Wu et al. 2016 §4.1 for the likelihood rule) —
    * completing the public subword triad beside [[bpeTrain]]'s
    * frequency argmax and [[unigramLmTrain]]'s EM: symbols start as
    * characters under the `##` continuation convention (first char
    * bare, every later char ##-prefixed), and each round merges the
    * adjacent symbol pair with the highest LIKELIHOOD score
    * count(l,r) / (count(l) · count(r)) — the pair whose merge most
    * improves a unigram LM over the symbol stream, WordPiece's defining
    * difference from BPE's raw-frequency rule. Ties break on
    * (lhs, rhs) ascending; the score is one exact-integer division
    * both engines compute to the identical IEEE double. The merged
    * product is `lhs ++ strip##(rhs)` (a right symbol is always a
    * continuation, so the product inherits the left's prefix).
    *
    * Scale shape: the corpus collapses to the DISTINCT-word vocabulary
    * once (one shuffle on word — the [[bpeTrain]] discipline); every
    * round is TWO keyed aggregations over the vocab (symbol counts,
    * adjacent-pair counts), a broadcast-sized join of pair→symbol
    * counts, one 1-ROW argmax collect (TakeOrdered), and a map-only
    * greedy merge fold into the next round. Rounds ride
    * [[Iterate.loop]] (lineage cut per round); nothing corpus-sized
    * reaches the driver. Merge application is the greedy leftmost
    * non-overlapping fold, which repeated replace-to-fixpoint
    * re-derives exactly (the oracle's recursive CTE) — a product can
    * never equal its own left constituent (strip##(rhs) is non-empty).
    *
    * Output: one row per learned merge —
    * (rank, lhs, rhs, pair_count, lhs_count, rhs_count, score_fp)
    * with score_fp = round(10⁹ · cnt / (cl · cr)) (the t09 fixed-point
    * discipline), rank 0 first.
    */
  def wordPieceTrain(df: DataFrame, textCol: String,
                     numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = df.sparkSession
    val vocab0 = df.select(explode(split(lower(coalesce(col(textCol),
        lit(""))), "[^a-z0-9]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .select(col("wn"), expr(
        """transform(sequence(1, length(w)),
           i -> IF(i = 1, substring(w, 1, 1),
                   concat('##', substring(w, i, 1))))""").as("syms"))
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long, Long, Long)]
    var drained = false // once empty, remaining rounds skip their aggs
    Iterate.loop(vocab0, numMerges) { (vocab, _) =>
      if (drained) vocab else {
      val syms = vocab.select(col("wn"), explode(col("syms")).as("s"))
        .groupBy(col("s")).agg(sum(col("wn")).as("c"))
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("wn"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          i => struct(col("syms")(i).as("l"),
            col("syms")(i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wn")).as("cnt"))
        // the symbol-count side is alphabet+merges-sized (≤ a few
        // hundred rows) but its estimate is an aggregate over the
        // checkpointed vocab, which the planner can size above the
        // broadcast threshold — hint it so neither likelihood join
        // shuffles the pair counts (guide §3.1)
        .join(broadcast(syms.select(col("s").as("l"), col("c").as("cl"))),
          Seq("l"))
        .join(broadcast(syms.select(col("s").as("r"), col("c").as("cr"))),
          Seq("r"))
        .select(col("l"), col("r"), col("cnt"), col("cl"), col("cr"),
          (col("cnt").cast("double") /
            (col("cl").cast("double") * col("cr").cast("double")))
            .as("score"))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) {
        drained = true // vocabulary fully merged — remaining rounds no-op
        vocab
      } else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        require(r.startsWith("##") && r.length > 2,
          s"internal: WordPiece right symbol must be a continuation, got $r")
        val merged = l + r.substring(2)
        learned += ((learned.size, l, r, top.head.getLong(2),
          top.head.getLong(3), top.head.getLong(4),
          Math.round(top.head.getDouble(5) * 1e9)))
        vocab.withColumn("syms", aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, s) => when(size(acc) > 0 &&
              element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
            .otherwise(concat(acc, array(s)))))
      }
      }
    }
    spark.createDataFrame(learned.toSeq)
      .toDF("rank", "lhs", "rhs", "pair_count", "lhs_count", "rhs_count",
        "score_fp")
  }

  /** The WordPiece VOCABULARY a trained merge table induces: the
    * corpus's initial symbol alphabet (first chars bare, continuation
    * chars ##-prefixed) plus every merge product, distinct — what
    * [[wordPieceSegment]] matches against. One corpus-collapse +
    * one distinct; output is alphabet+merges-sized.
    */
  def wordPieceVocab(df: DataFrame, textCol: String,
                     merges: DataFrame): DataFrame = {
    val alpha = df.select(explode(split(lower(coalesce(col(textCol),
        lit(""))), "[^a-z0-9]+")).as("w"))
      .filter(col("w") =!= "")
      .select(explode(expr(
        """transform(sequence(1, length(w)),
           i -> IF(i = 1, substring(w, 1, 1),
                   concat('##', substring(w, i, 1))))""")).as("piece"))
      .distinct()
    alpha.unionByName(merges.select(
        concat(col("lhs"), expr("substring(rhs, 3)")).as("piece")))
      .distinct()
  }

  /** Segment words with a trained WordPiece vocabulary (the t31
    * round-trip): greedy LONGEST-MATCH-FIRST — the standard WordPiece
    * inference rule (BERT's WordpieceTokenizer; distinct from
    * training's likelihood argmax) — consuming the longest vocab prefix
    * at each position (##-prefixed lookups after the first), emitting
    * `unk` for the WHOLE word when no prefix matches. Map-only: the
    * vocabulary inlines as a literal map (bounded 512, the t28/t29
    * broadcast-model analog); the walk is one fold of at most
    * length(word) steps, each consuming ≥ 1 character. Adds a `pieces`
    * array column.
    */
  def wordPieceSegment(words: DataFrame, wordCol: String, vocab: DataFrame,
                       unk: String = "[UNK]"): DataFrame = {
    val pieces = vocab.select(col("piece")).orderBy(col("piece"))
      .collect().map(_.getString(0)).toSeq
    require(pieces.nonEmpty && pieces.size <= 512,
      s"WordPiece vocabulary must hold 1..512 pieces, got ${pieces.size}")
    require(pieces.forall(_.matches("(##)?[a-z0-9]+")),
      "WordPiece pieces must be (##)?[a-z0-9]+ — no escaping supported")
    require(unk.matches("[A-Za-z0-9\\[\\]_]+"),
      s"unk token must be quote-free, got '$unk'")
    val maxLen = pieces.map(p =>
      p.length - (if (p.startsWith("##")) 2 else 0)).max
    val m = pieces.map(p => s"'$p', 1").mkString("map(", ", ", ")")
    val w = wordCol
    // the longest matching prefix length at acc.pos (NULL when none):
    // candidate lengths filter through the vocab map, array_max picks
    // the longest — greedy longest-match-first
    val best =
      s"""array_max(filter(transform(
            sequence(1, least($maxLen, length($w) - acc.pos)),
            l -> IF(element_at($m, IF(acc.pos = 0, substring($w, 1, l),
                   concat('##', substring($w, acc.pos + 1, l))))
                 IS NOT NULL, l, CAST(NULL AS INT))),
          x -> x IS NOT NULL))"""
    val piece =
      s"""IF(acc.pos = 0, substring($w, 1, $best),
            concat('##', substring($w, acc.pos + 1, $best)))"""
    // materialize the (vocab-sized) segmentation before handing it to
    // callers — the unigramSegment lesson: the greedy-walk fold is a
    // LARGE expression tree, and a downstream explode/join/aggregate
    // re-planning over it re-evaluates and re-compiles it
    // pathologically; the checkpoint pins rows instead
    words.withColumn("pieces", expr(
      s"""aggregate(sequence(1, length($w)),
          struct(0 AS pos, CAST(array() AS ARRAY<STRING>) AS ps,
                 false AS bad),
          (acc, z) -> IF(acc.bad OR acc.pos >= length($w), acc,
            IF($best IS NULL,
               struct(length($w) AS pos,
                      array('$unk') AS ps, true AS bad),
               struct(CAST(acc.pos + $best AS INT) AS pos,
                      concat(acc.ps, array($piece)) AS ps,
                      false AS bad))),
          acc -> acc.ps)"""))
      .localCheckpoint(true)
  }

  /** The stopword list RAKE splits candidate phrases on — the English
    * closed-class set [[StopwordRe]] uses for language ID, kept tiny
    * and fixed so both engines split identically.
    */
  val RakeStopwords: Seq[String] = Seq(
    "the", "and", "of", "to", "in", "is", "that", "it", "for", "was")

  /** RAKE keyword extraction (Rose et al. 2010, t26): candidate phrases
    * are maximal token runs between stopwords/punctuation; each word
    * scores degree/frequency (degree = total length of phrase
    * occurrences containing it, frequency = its occurrence count) and a
    * phrase scores the sum over its words — the classic corpus-keyword
    * signal, fully deterministic here: per-word ratios round to 1e6
    * fixed-point BEFORE the order-free integer sum (t09 discipline) and
    * ties break on the phrase text.
    *
    * Scale shape: phrase derivation is one map-only regex chain
    * (punctuation becomes a phrase delimiter — the classic RAKE rule —
    * then whitespace collapses, then stopwords become delimiters), and
    * the corpus immediately rolls up to DISTINCT phrases with counts —
    * ONE corpus pass, after which everything (word stats, scores,
    * occurrence counts) runs over the VOCABULARY-sized frame,
    * materialized once (three consumers, no cross-branch CSE; the
    * corpus itself is never pinned — the sharedRuns discipline).
    * Output: top-`topK` (phrase, n_words, score_fp, n_occurrences),
    * best first.
    */
  def rakeKeywords(df: DataFrame, textCol: String, topK: Int = 20,
                   stopwords: Seq[String] = RakeStopwords): DataFrame = {
    require(topK > 0, "topK must be positive")
    require(stopwords.nonEmpty && stopwords.forall(_.matches("[a-z0-9]+")),
      "stopwords must be non-empty lowercase word tokens")
    val sw = stopwords.mkString("\\b(", "|", ")\\b")
    // punctuation (incl. hyphens — Rose et al.) delimits BEFORE
    // whitespace collapses: "neural networks. deep" must yield two
    // phrases, never one 4-word phrase (review-caught)
    val phrases = filter(transform(split(regexp_replace(regexp_replace(
      regexp_replace(lower(coalesce(col(textCol), lit(""))),
        "[^a-z0-9\\s]+", "|"), "\\s+", " "),
      sw, "|"), "\\|"), p => trim(p)), p => p =!= "")
    // ONE corpus pass: roll up to distinct phrases + counts, then pin
    // only that vocabulary-sized frame for the three consumers below
    val pc = df.select(explode(phrases).as("phrase"))
      .groupBy(col("phrase")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val ws = pc.select(col("n"),
        explode(split(col("phrase"), " ")).as("word"),
        size(split(col("phrase"), " ")).as("plen"))
      .groupBy(col("word"))
      .agg(sum(col("n")).as("freq"), sum(col("n") * col("plen")).as("deg"))
    val sc = pc.select(col("phrase"),
        explode(split(col("phrase"), " ")).as("word"))
      .join(ws, Seq("word"))
      .groupBy(col("phrase"))
      .agg(sum(round(lit(1e6) * col("deg") / col("freq")).cast("long"))
        .as("score_fp"))
    pc.join(sc, Seq("phrase"))
      .select(col("phrase"),
        size(split(col("phrase"), " ")).cast("long").as("n_words"),
        col("score_fp"), col("n").as("n_occurrences"))
      .orderBy(col("score_fp").desc, col("phrase")).limit(topK)
  }

  /** PII-style redaction patterns, applied in order (emails before
    * phone-number spans so an address is not half-eaten by the digit
    * rule). Plain RE2-compatible regexes — no lookaround/backrefs — so
    * external SQL engines apply the identical semantics.
    */
  val RedactionRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+"                                -> "<URL>",
    "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"                  -> "<IP>",
    "\\+?\\d[\\d().-]{7,}\\d"                         -> "<PHONE>")

  /** Redact emails, URLs, IPv4 addresses and phone-number spans — the
    * standard scrub pass before text enters a training corpus. Map-only
    * expression chain.
    */
  def redact(c: Column): Column =
    RedactionRules.foldLeft(c) { case (acc, (re, repl)) =>
      regexp_replace(acc, re, repl)
    }

  /** Cheap BPE-ish token estimate: alphanumeric runs contribute
    * ceil(len/4) subword units, every other non-space character one.
    */
  def bpeTokenEstimate(c: Column): Column = {
    val alnumChars = length(regexp_replace(c, "[^A-Za-z0-9]", ""))
    val other = length(regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    (ceil(alnumChars.cast("double") / 4) + other).cast("bigint")
  }

  /** Quality features + a bounded [0,1] score. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTokens = tokenCount(t)
    val nAlpha = length(regexp_replace(t, "[^A-Za-z]", ""))
    val nPunct = length(regexp_replace(t, "[^.,;:!?]", ""))
    val nStop = stopCount(t, StopwordRe.head._2)
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("alpha_ratio", nAlpha.cast("double") / greatest(nChars, lit(1)))
      .withColumn("punct_ratio", nPunct.cast("double") / greatest(nChars, lit(1)))
      .withColumn("stopword_ratio", nStop.cast("double") / greatest(nTokens, lit(1)))
      .withColumn("avg_token_len", nAlpha.cast("double") / greatest(nTokens, lit(1)))
      .withColumn("quality_score",
        least(lit(1.0), greatest(lit(0.0),
          lit(0.5) * least(nTokens.cast("double") / 64, lit(1.0))
            + lit(0.3) * (nAlpha.cast("double") / greatest(nChars, lit(1)))
            + lit(0.2) * least(lit(10.0) * nStop.cast("double") / greatest(nTokens, lit(1)), lit(1.0)))))
  }

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446 Table A1): high duplicate-word / duplicate-n-gram /
    * top-word fractions mark low-quality repetitive documents that should
    * leave a training corpus. All signals are pure lambda-expression
    * trees over one tokenization — map-only, codegen'd, no shuffle —
    * and every formula mirrors 1:1 into list-lambda SQL so an external
    * oracle can check it exactly.
    *
    *  - n_words            token count ("\w+" runs)
    *  - dup_word_frac      1 − distinct/total words (0 for empty docs)
    *  - top_word_frac      share of the most frequent word
    *  - dup_2gram_frac     1 − distinct/total word 2-grams (0 when <2 words)
    *  - symbol_word_ratio  '#'/'...' symbols per word
    *
    * top_word_frac counts per-distinct-word occurrences with a nested
    * array lambda — O(distinct·total) per document, which stays cheap at
    * document scale (≤ a few k tokens) and keeps the operator shuffle-free;
    * corpora with megabyte documents should explode+aggregate instead.
    */
  def repetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    val withT = df.withColumn("__toks",
      regexp_extract_all(col(textCol), lit("\\w+"), lit(0)))
    val toks = col("__toks")
    val n = size(toks)
    val nd = size(array_distinct(toks))
    val grams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val ng = size(grams)
    val ngd = size(array_distinct(grams))
    // max multiplicity = longest equal run of the SORTED tokens — one
    // O(n log n) sort + linear fold. The previous form counted every
    // distinct token with its own filter scan (O(distinct × n) string
    // compares per document; measured as t06's whole cost at sf0.1).
    // Same value by construction: equal tokens are adjacent once sorted.
    val topCnt = expr(
      """aggregate(array_sort(__toks),
          struct(CAST(NULL AS STRING) AS prev, 0 AS run, 0 AS best),
          (acc, x) -> struct(x AS prev,
            IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1) AS run,
            greatest(acc.best,
              IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1))
              AS best),
          acc -> acc.best)""")
    withT
      .withColumn("n_words", n.cast("long"))
      .withColumn("dup_word_frac",
        when(n > 0, lit(1.0) - nd.cast("double") / n).otherwise(lit(0.0)))
      .withColumn("top_word_frac",
        when(n > 0, topCnt.cast("double") / n).otherwise(lit(0.0)))
      .withColumn("dup_2gram_frac",
        when(ng > 0, lit(1.0) - ngd.cast("double") / ng).otherwise(lit(0.0)))
      .withColumn("symbol_word_ratio",
        regexp_count(col(textCol), lit("#|\\.\\.\\.")).cast("double")
          / greatest(n, lit(1)))
      .drop("__toks")
  }

  /** OpenRefine-style collision fingerprint: md5 of the sorted distinct
    * token set — robust to word order and duplication.
    */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(TextOps.tokens(c))), " "))

  /** Winnowing-style minimum rolling fingerprint over token-hash windows
    * of width w: stable under small edits, usable as a near-dup key.
    */
  def minRollingFingerprint(c: Column, w: Int = 8): Column = {
    val hs = TextOps.tokenHashes(c)
    when(size(hs) < w, xxhash64(array_join(TextOps.tokens(c), " ")))
      .otherwise(array_min(transform(
        sequence(lit(0), size(hs) - w),
        i => xxhash64(slice(hs, i + lit(1), lit(w))))))
  }

  /** Top-k characteristic terms per document by TF-IDF
    * (tf × ln(N / df)). Three equi-keyed shuffles, all skew-proof:
    * (doc, term) counts map-side combine, the term document-frequency
    * agg collapses hot terms ("the") to one row per task before the
    * network, and the per-doc ranking window partitions on doc id
    * (bounded by a document's distinct terms, never the corpus). The
    * corpus size joins in as a broadcast scalar. Deterministic: ties
    * rank by ascending term.
    *
    * Output: (idCol, rank 1..k, term, score) with the raw double score
    * (tf·ln(N/df)); consumers that hash-compare across engines should
    * project a fixed-point integer (e.g. round(score·1e6) as long, as
    * the t08 driver query does) rather than a rounded double, whose
    * half-ulp boundaries are brittle.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 5): DataFrame = {
    val toks = df.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "\\W+"), x => x =!= "")).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("N"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        (col("tf") * log(col("N").cast("double") / col("df"))).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
  }

  /** Corpus-trained bigram language-model scoring — the CCNet/KenLM-style
    * perplexity quality gate, self-trained on the corpus being scored
    * (documents whose bigrams are improbable under the corpus LM are
    * boilerplate/garbled candidates). Add-one smoothing:
    * p(b|a) = (c2(a,b)+1) / (c1(a)+V); a document's score is the sum of
    * its bigram log-probs. Scores are FIXED-POINT longs
    * (round(ln(p)·1e6)) summed as integers, so the result is independent
    * of Spark's partition-summation order and hash-comparable across
    * engines (same discipline as the t08 tfidf gate).
    *
    * Scale shape: bigram extraction is map-only (array transform);
    * counting and probability lookup are shuffles keyed on the bigram /
    * unigram (never the corpus); V joins in as one broadcast scalar.
    * Documents with fewer than two tokens score 0 over 0 bigrams but stay
    * represented (left join back to the id spine).
    *
    * Output: (idCol, n_bigrams, score_fp), one row per input document.
    */
  /** The lowercased `\W+` token-array frame the LM scorers share:
    * (idCol, __toks).
    */
  private def lmTokens(df: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    df.select(col(idCol),
      filter(split(lower(coalesce(col(textCol), lit(""))), "\\W+"),
        x => x =!= "").as("__toks"))

  /** Per-document DISTINCT bigrams with multiplicity — (idCol, a, b, m)
    * — the frame both LM scorers aggregate and score over: a sum of m
    * identical fixed-point terms equals m·fp exactly, so scoring the
    * distinct frame is bit-identical to scoring every occurrence while
    * shrinking the materialized volume from corpus-token to
    * doc-distinct-bigram size.
    */
  private def docBigrams(toks: DataFrame, idCol: String): DataFrame =
    toks.select(col(idCol),
        explode(expr(
          """transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),
             (t, i) -> struct(t AS a, __toks[i + 1] AS b))""")).as("__bg"))
      .select(col(idCol), col("__bg.a").as("a"), col("__bg.b").as("b"))
      .groupBy(col(idCol), col("a"), col("b")).agg(count(lit(1)).as("m"))

  /** Shared scorer tail: per-doc occurrence count and fixed-point sum
    * over the (idCol, m, fp) frame, with the id spine keeping <2-token
    * docs at (0, 0).
    */
  private def perDocFpSum(df: DataFrame, scored: DataFrame, idCol: String,
                          scoreName: String): DataFrame = {
    val perDoc = scored.groupBy(col(idCol))
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * col("fp")).as(scoreName))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col(scoreName), lit(0L)).as(scoreName))
  }

  /** Trained-quality-classifier INFERENCE gate (t28) — the
    * fastText-style linear filter every public LLM pipeline runs
    * (CCNet / DCLM / FineWeb): score each document against a broadcast
    * linear model over hashed token features,
    *
    *   z(d)      = bias + (Σ over token instances t of w[bucket(t)]) / n_tokens(d)
    *   quality(d) = σ(z) = 1 / (1 + e^(−z)),
    *
    * the bag-of-hashed-words mean that fastText computes before its
    * output layer. Buckets are the first k hex chars of md5(token)
    * (k = log16 nBuckets — the fe01/DSIR cross-engine hash, so an
    * external engine re-derives identical features); weights ride in
    * 1e6 fixed point and the per-doc sum is an exact integer, with ONE
    * mirrored double chain (sum/(n·1e6) + bias/1e6) before rounding —
    * the q14 float discipline.
    *
    * The weights frame (`b` hex-bucket, `w_fp` fixed-point weight) is
    * the MODEL: it must cover the bucket domain EXACTLY — row count,
    * distinct count, and prefix width are checked in one bounded
    * aggregate and refused loudly on any mismatch (a silently absent
    * bucket would zero features instead of scoring them).
    *
    * Scale shape: tokenize + bucket is map-only; the weight lookup is a
    * BROADCAST join (the model is nBuckets rows); the only shuffle is
    * the per-doc aggregation — plan-pinned in PlanSpec. Output:
    * (idCol, n_tokens, logit6, quality6); token-less docs keep
    * (0, null, null).
    */
  def linearQualityScore(df: DataFrame, idCol: String, textCol: String,
                         weights: DataFrame, nBuckets: Int,
                         biasFp: Long = 0L): DataFrame = {
    val width = nBuckets match {
      case 16 => 1
      case 256 => 2
      case 4096 => 3
      case _ => throw new IllegalArgumentException(
        s"nBuckets must be a hex-prefix domain (16, 256 or 4096), got " +
          s"$nBuckets")
    }
    val chk = weights.agg(count(lit(1)).as("n"),
      count_distinct(col("b")).as("nd"),
      min(length(col("b"))).as("wmin"),
      max(length(col("b"))).as("wmax")).collect().head
    require(chk.getLong(0) == nBuckets && chk.getLong(1) == nBuckets &&
      !chk.isNullAt(2) && chk.getInt(2) == width && chk.getInt(3) == width,
      s"weights must cover the $nBuckets-bucket domain exactly: got " +
        s"${chk.getLong(0)} rows, ${chk.getLong(1)} distinct buckets, " +
        s"prefix widths ${chk.get(2)}..${chk.get(3)} (want $width) — a " +
        "mis-sized model would silently zero or mis-hash features")
    val feats = lmTokens(df, idCol, textCol)
      .select(col(idCol), explode(col("__toks")).as("__t"))
      .select(col(idCol), substring(md5(col("__t")), 1, width).as("b"))
    val perDoc = feats.join(broadcast(weights), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_fp")).as("__sum_fp"))
    val z = col("__sum_fp").cast("double") /
      (col("n_tokens").cast("double") * 1e6) +
      lit(biasFp).cast("double") / 1e6
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(z, 6).as("logit6"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("quality6"))
  }

  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = lmTokens(df, idCol, textCol)
    // score per-OCCURRENCE, map-side: summing an identical fp once per
    // occurrence is bit-equal to m·fp over the distinct frame, and the
    // occurrence stream needs NO per-doc distinct pre-aggregation — that
    // extra keyed agg (the r14 shared-scaffold refactor) cost t09 ~0.5 s
    // at sf0.1, confirmed on a quiet host (r15). [[knBigramScore]] keeps
    // [[docBigrams]] because its CHECKPOINT must pin a vocabulary-shaped
    // frame, a constraint this uncheckpointed scorer does not have.
    val bg = toks.select(col(idCol),
        explode(expr(
          """transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),
             (t, i) -> struct(t AS a, __toks[i + 1] AS b))""")).as("__bg"))
      .select(col(idCol), col("__bg.a").as("a"), col("__bg.b").as("b"))
    val uni = toks.select(explode(col("__toks")).as("t"))
    val c1 = uni.groupBy(col("t")).agg(count(lit(1)).as("c1"))
    val c2 = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c2"))
    val vocab = uni.agg(countDistinct(col("t")).as("v"))
    val scored = bg.join(c2, Seq("a", "b")).join(c1, col("a") === col("t"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        round(log((col("c2") + 1).cast("double") /
          (col("c1") + col("v")).cast("double")) * 1e6).cast("long").as("fp"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("fp")).as("score_fp"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"))
  }

  /** Interpolated Kneser–Ney bigram LM score per document (t27) — the
    * standard n-gram smoothing a real LM-filtering pass uses where
    * [[bigramLmScore]] is the add-one baseline: with discount D = 0.75,
    *
    *   P(b|a) = max(c(ab) − D, 0)/c(a)
    *          + (D · N1+(a·)/c(a)) · (N1+(·b) / N1+(··))
    *
    * (N1+ = distinct-continuation counts — the "how many contexts"
    * novelty signal that makes KN the empirical standard). Every input
    * is an exact integer count; each scored bigram's probability runs
    * through ONE mirrored double chain and rounds to 1e6 fixed point
    * BEFORE the order-free per-doc sum (t09 discipline), so the oracle
    * re-derives identical bits. Corpus-trained = corpus-scored (every
    * bigram is seen, so the discounted term stays positive).
    *
    * Scale shape: one bigram derivation pass, three count aggregations
    * (c(ab), c(a)+N1+(a·) fused in one, N1+(·b)), one broadcast scalar
    * (N1+(··)), equi-joins back on the bigram stream. Output:
    * (idCol, n_bigrams, kn_score_fp); docs with < 2 tokens keep (0, 0).
    */
  def knBigramScore(df: DataFrame, idCol: String, textCol: String,
                    discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0, 1)")
    // pre-aggregated to doc-distinct bigrams BEFORE the checkpoint
    // (review-caught): the pinned frame is vocabulary-shaped, not
    // corpus-token-shaped; two consumers (count chain + scoring join)
    val bgm = docBigrams(lmTokens(df, idCol, textCol), idCol)
      .localCheckpoint(true)
    val c2 = bgm.groupBy(col("a"), col("b")).agg(sum(col("m")).as("c2"))
    // c(a) and N1+(a·) fuse into one pass over the distinct-bigram frame
    // joined with totals: c(a) = Σ_b c(ab), N1+(a·) = count distinct b
    val ctx = c2.groupBy(col("a"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val cont = c2.groupBy(col("b")).agg(count(lit(1)).as("n1b"))
    val nbi = c2.agg(count(lit(1)).as("nbi"))
    def d(c: Column): Column = c.cast("double")
    val p = greatest(d(col("c2")) - discount, lit(0.0)) / d(col("c1")) +
      lit(discount) * d(col("n1f")) / d(col("c1")) *
        (d(col("n1b")) / d(col("nbi")))
    val scored = bgm.join(c2, Seq("a", "b")).join(ctx, Seq("a"))
      .join(cont, Seq("b")).crossJoin(broadcast(nbi))
      .select(col(idCol), col("m"),
        round(log(p) * 1e6).cast("long").as("fp"))
    perDocFpSum(df, scored, idCol, "kn_score_fp")
  }

  /** ln 2 as an exact double LITERAL, mirrored verbatim in every oracle
    * text — Math.log(2.0) is not guaranteed correctly rounded, a
    * shared literal is bit-identical by construction.
    */
  val Ln2 = 0.6931471805599453

  /** Corpus bits-per-byte under the Kneser–Ney bigram LM (t33) — the
    * compression-style eval every LM-data paper reports: per group
    * (e.g. source),
    *
    *   bpb = (−Σ log P) / ln 2 / Σ bytes
    *
    * where Σ log P is the EXACT fixed-point corpus sum of the
    * [[knBigramScore]] per-doc scores (order-free integer addition) and
    * bytes = octet_length of the raw text. The only float work is ONE
    * double chain per output group — negate, un-fix, divide by the
    * [[Ln2]] literal, divide by bytes, round to 6 — mirrored verbatim
    * by the oracle. Lower bpb = the corpus the LM compresses best
    * (in-domain / repetitive); the per-source ranking is the mixing
    * signal.
    *
    * Scale shape: the scorer's aggregations (vocabulary-shaped) + one
    * doc-keyed equi-join + ONE tiny group-keyed rollup; nothing
    * corpus-sized reaches the driver. Output: (groupCol, n_docs,
    * n_bigrams, neg_logprob_fp, n_bytes, bpb).
    */
  def bitsPerByte(df: DataFrame, idCol: String, textCol: String,
                  groupCol: String): DataFrame = {
    val scored = knBigramScore(df, idCol, textCol)
    val meta = df.select(col(idCol), col(groupCol),
      octet_length(coalesce(col(textCol), lit(""))).cast("long")
        .as("__bytes"))
    meta.join(scored, Seq(idCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        (-sum(col("kn_score_fp"))).as("neg_logprob_fp"),
        sum(col("__bytes")).as("n_bytes"))
      .select(col(groupCol), col("n_docs"), col("n_bigrams"),
        col("neg_logprob_fp"), col("n_bytes"),
        when(col("n_bytes") === 0, lit(null))
          .otherwise(round(
            col("neg_logprob_fp").cast("double") / 1e6 / lit(Ln2) /
              col("n_bytes").cast("double"), 6)).as("bpb"))
  }

  /** Sliding-window token chunking (RAG/pretraining shape): tokenize,
    * then emit one chunk per `stride` starting offset, `size` tokens
    * long (the final chunks truncate at the document end; overlap =
    * size - stride). Map-only — tokenization, offset generation and
    * slicing are all expression trees over the row, no shuffle and no
    * state, so chunking parallelizes perfectly at any corpus size.
    * Empty and null documents produce one empty chunk ('' at start 1),
    * keeping every input doc represented (null text is treated as
    * having no tokens — pinned here rather than left to the engines,
    * whose null propagation through split/size/concat differs).
    *
    * Output: (idCol, start — 1-based token offset, chunk string).
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  size: Int = 20, stride: Int = 15): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    df.select(col(idCol),
        filter(split(lower(coalesce(col(textCol), lit(""))), "\\W+"),
          x => x =!= "").as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(1),
          greatest(org.apache.spark.sql.functions.size(col("__toks")), lit(1)),
          lit(stride))).as("__start"))
      .select(col(idCol), col("__start").cast("long").as("start"),
        concat_ws(" ", slice(col("__toks"), col("__start"), lit(size))).as("chunk"))
  }

  /** Escape the three HTML-special characters (`&` first, so entity
    * prefixes never double-encode). Expression tree, map-only.
    */
  def htmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  /** HTML boilerplate removal: drop tags, decode the five core entities
    * (`&amp;` LAST so decoded ampersands never re-trigger), collapse
    * ASCII whitespace runs and trim — the markup-cleanup step of a web
    * corpus pipeline. Pure expression tree: map-only, codegen'd, and
    * every regex is ASCII-explicit so the Java and RE2 engines agree.
    */
  def stripHtml(c: Column): Column = {
    val noTags = regexp_replace(c, lit("<[^>]+>"), lit(""))
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
        lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
        lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, lit("[ \\t\\n\\r]+"), lit(" ")))
  }

  /** Corpus NOVELTY score — per document, the fraction of its distinct
    * word `shingleK`-grams seen for the FIRST time at this document
    * (first = smallest id, the deterministic corpus order). The
    * data-curation signal behind "process in order, keep what adds new
    * content": near-copies of earlier documents score ~0, genuinely new
    * text ~1, boilerplate-heavy pages in between — a cheaper, rank-free
    * complement to pairwise near-dup detection.
    *
    * Scale shape (the d17 hashGrams contract): grams travel as xxhash64
    * LONGS, so the posting is 16 B/row instead of gram strings — exact
    * absent 64-bit collisions (zero on the shipped corpora; the
    * driver's strict STRING-gram oracle re-checks that every round, the
    * d14 mold). Gram identities come from the NUMERIC shingling path
    * (`window_hashes` over token hashes — the d02/minhash machinery):
    * no per-shingle string is ever materialized, which was the dominant
    * map cost of the string formulation (measured 5.5 s → ~1.5 s at
    * sf0.1 when ap04 made the same switch; distinct window-hashes ≡
    * distinct string k-grams absent collisions, including the
    * whole-document gram for sub-k-token texts).
    * The hashed posting is materialized ONCE (localCheckpoint):
    * it has TWO consumers (per-doc totals, per-gram first-seen min) and
    * Spark has no cross-branch CSE, so a lazy plan re-tokenizes the
    * corpus per consumer — measured at 5× this shape's cost when tried
    * (round 13); with long grams the pinned intermediate is now ~16
    * bytes/gram, an order smaller than the string posting the round-12
    * advice flagged. Gram strings themselves never leave the map stage.
    * Both downstream aggregations partial-aggregate before their
    * shuffle (doc-sized and distinct-gram-sized exchanges); no window,
    * no sort, no gram join-back — novel counts roll up from the
    * first-seen frame by winner id, longs only. The final assembly is
    * an id-keyed join of two doc-sized count frames.
    */
  def corpusNovelty(df: DataFrame, idCol: String, textCol: String,
                    shingleK: Int = 3): DataFrame = {
    graft.functions.Registry.registerAll(df.sparkSession)
    val g = df.select(col(idCol).cast("long").as("id"),
        explode(array_distinct(call_function("window_hashes",
          TextOps.tokenHashes(col(textCol)), lit(shingleK)))).as("g"))
      .localCheckpoint(true)
    val counts = g.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
    val novel = g.groupBy(col("g")).agg(min(col("id")).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_novel"))
    counts.join(novel, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double")
          / col("n_grams"), 6).as("novelty"))
  }
  /** Token-window chunking (t34): fixed-size token windows with a
    * stride (overlap = window − stride tokens) — the context-window
    * shape every training/RAG pipeline needs between documents and a
    * model's input budget. Whitespace tokens, chunk `k` covering token
    * indices [k·stride, k·stride + window); the final windows clamp at
    * the document end (a tail shorter than `window` is still a chunk —
    * discarding it would silently drop corpus text). Empty/NULL
    * documents produce NO chunks.
    *
    * Scale shape: MAP-ONLY — split + one `sequence`/`explode` per doc
    * + a slice per chunk; no shuffle, no state, output rows ∝
    * tokens / stride. At 100 TB the operator is embarrassingly
    * parallel and the only knob is output partition sizing (chunks
    * are ~window/stride × input bytes). Every formula mirrors in
    * DuckDB SQL (1-based inclusive slices) for the exact oracle.
    */
  def tokenWindows(docs: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    docs
      .where(length(coalesce(col(textCol), lit(""))) > 0)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .withColumn("__nt", size(col("__toks")))
      .withColumn("__start",
        explode(sequence(lit(0), greatest(col("__nt") - 1, lit(0)),
          lit(stride))))
      .select(col(idCol),
        (col("__start") / stride).cast("long").as("chunk_ix"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(window)),
          " ").as("chunk"),
        least(col("__nt") - col("__start"), lit(window)).cast("long")
          .as("n_tokens"))
  }
}
