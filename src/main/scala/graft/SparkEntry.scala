package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.api.Table
import graft.functions.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator/capability from the SURVEY §2
  * inventory (or a scale-extension beyond it); [[oracleSql]] carries the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Where Spark SQL and DuckDB agree on syntax and semantics the two
  * strings are identical; where they diverge (xor spelling, ln/log naming,
  * trunc-on-cast, list vs array functions) the oracle is written to express
  * the same semantics in DuckDB's dialect.
  *
  * Determinism rules used throughout (so a value-hash compare is stable):
  *   - every query ends in ORDER BY over a unique key set;
  *   - double aggregations go through DECIMAL casts (exact in both
  *     engines) or are single IEEE operations on identical operands;
  *   - transcendental function outputs are round()ed to 6 digits.
  */
object SparkEntry {

  type QFn = (SparkSession, String) => DataFrame

  private def tbl(s: SparkSession, dir: String, name: String): Table =
    Table.fromParquet(s, s"$dir/$name.parquet")

  /** Query whose Spark SQL text parses and means the same in DuckDB. */
  private def same(table: String, sql: String): (QFn, Option[String]) =
    ((s: SparkSession, dir: String) => tbl(s, dir, table).sql(sql).toDF, Some(sql))

  /** Query with distinct Spark SQL and DuckDB oracle texts. */
  private def diff(table: String, sparkSql: String, oracle: String): (QFn, Option[String]) =
    ((s: SparkSession, dir: String) => tbl(s, dir, table).sql(sparkSql).toDF, Some(oracle))

  /** DataFrame-API query with a DuckDB oracle. */
  private def api(fn: QFn, oracle: String): (QFn, Option[String]) = (fn, Some(oracle))

  /** Library operator with no SQL-expressible oracle (rows-only check). */
  private def noOracle(fn: QFn): (QFn, Option[String]) = (fn, None)

  /** Multi-table SQL through [[Table.sessionSql]] (the dialect-aware
    * session entry point — ASOF JOIN translation, np.*, nulls-last),
    * same text for Spark and DuckDB.
    */
  private def multiSession(tables: Seq[String], sql: String): (QFn, Option[String]) =
    ((s: SparkSession, dir: String) => {
      tables.foreach { t =>
        s.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
      }
      Table.sessionSql(s, sql).toDF
    }, Some(sql))

  /** Multi-table SQL query, same text for Spark and DuckDB (join hints ride
    * in comments, which DuckDB ignores).
    */
  private def multi(tables: Seq[String], sql: String): (QFn, Option[String]) =
    ((s: SparkSession, dir: String) => {
      Registry.registerAll(s)
      tables.foreach { t =>
        s.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
      }
      s.sql(sql)
    }, Some(sql))

  /** Dyadic-grid coordinate derivations shared by geo01/geo04: integer
    * keys mapped onto a 1/16-degree grid spanning [0, 20) degrees, so
    * every coordinate (and every downstream difference/square/sum) is
    * IEEE-exact. The oracle CTEs mirror these expressions verbatim.
    */
  private def geoGridCustomers(s: SparkSession, dir: String): DataFrame = {
    val sixt = lit(0.0625)
    s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"),
        ((col("c_custkey") % 320).cast("double") * sixt).as("plat"),
        (((col("c_custkey") * 7) % 320).cast("double") * sixt).as("plon"))
  }

  private def geoGridSuppliers(s: SparkSession, dir: String): DataFrame = {
    val sixt = lit(0.0625)
    s.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey"),
        (((col("s_suppkey") * 11) % 320).cast("double") * sixt).as("slat"),
        (((col("s_suppkey") * 13) % 320).cast("double") * sixt).as("slon"))
  }

  /** Daily event-count series shared by the time-series diagnostics
    * (e21/e22/e23): ONE keyed rollup of the canonical micros timestamps
    * to (day, x = count). This is the heavy distributed step — every
    * consumer's window/pair work afterwards is O(days), and the
    * day-bucketing rule lives in exactly one place.
    */
  private def dailyCounts(s: SparkSession, dir: String): DataFrame = {
    val E = graft.streaming.Events
    E.readRaw(s, dir)
      .select(expr(s"ts div ${E.MicrosPerDay}").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
  }

  /** Per-user (recency, frequency, monetary) rollup shared by e16 (ntile
    * buckets) and e20 (quantile-cutpoint buckets): one keyed aggregation
    * of the event stream to users, recency anchored at the corpus-max
    * day via a broadcast 1-row frame.
    */
  private[graft] def rfmRollup(s: SparkSession, dir: String): DataFrame = {
    val MpD = graft.streaming.Events.MicrosPerDay
    val u = graft.streaming.Events.readRaw(s, dir)
      .select(col("user_id"), expr(s"ts div $MpD").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("f"),
        sum(col("cents")).as("m"))
    val g = u.agg(max(col("last_day")).as("__today"))
    u.join(broadcast(g))
      .select(col("user_id"), (col("__today") - col("last_day")).as("r"),
        col("f"), col("m"))
  }

  /** Deterministic planar rotation by angle acos(c): rotates each
    * (odd, even) coordinate pair, so cos(v, rot(v)) == c exactly (a
    * rotation preserves the norm and the paired inner products sum to
    * c·|v|²). Used by d08/p04 to plant near-duplicate chains in-query —
    * the same construction runs on the DuckDB oracle side — because the
    * synthetic embedding corpus has no natural high-cosine pairs (max
    * pairwise cosine ≈ 0.66 at sf0.1). With c = 0.94, adjacent chain
    * links sit at cosine 0.94 (> the 0.9 dedup threshold) while
    * link-skipping pairs sit at 2c²−1 ≈ 0.767 (< threshold), so
    * clustering must rely on transitive closure, not direct edges.
    */
  private def rotVec(v: Column, c: Double): Column = {
    val s = math.sqrt(1.0 - c * c)
    transform(v, (x, j) =>
      when(j % 2 === 0 && j < size(v) - 1,
        lit(c) * x - lit(s) * element_at(v, j + lit(2)))
        .when(j % 2 === 1, lit(s) * element_at(v, j) + lit(c) * x)
        .otherwise(x))
  }

  /** The DuckDB spelling of [[rotVec]] over a DOUBLE[] column named `col`
    * (1-based list indexing; identical IEEE operation order, so planted
    * cosines agree across engines to the last ulp).
    */
  private def rotSql(colName: String): String =
    s"""list_transform(generate_series(1, len($colName)), i ->
          CASE WHEN i % 2 = 1 AND i < len($colName)
                 THEN 0.94*$colName[i] - sqrt(1 - 0.94*0.94)*$colName[i+1]
               WHEN i % 2 = 0
                 THEN sqrt(1 - 0.94*0.94)*$colName[i-1] + 0.94*$colName[i]
               ELSE $colName[i] END)"""

  /** Shared DuckDB CTE: per-document distinct word-k-gram shingle sets,
    * mirroring the Spark side's tokenization (lowercase, `\W+` split,
    * empties dropped; documents shorter than k tokens yield one whole-doc
    * shingle — TextOps.shingles / window_hashes semantics).
    */
  private def gramSets(k: Int, dropEmptyDocs: Boolean = false): String =
    s"""WITH s AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(toks) < $k THEN [array_to_string(toks, ' ')]
                       ELSE list_distinct(list_transform(generate_series(1, len(toks)-${k - 1}),
                                          i -> array_to_string(toks[i:i+${k - 1}], ' '))) END AS shset
           FROM s${if (dropEmptyDocs) " WHERE len(toks) > 0" else ""})"""

  private val fiveGramSets: String = gramSets(5)

  /** Exact cosine top-10 for probes vec_id < 5 — the oracle for both the
    * brute-force baseline (s01) and full-probe IVF (s05), which must
    * agree bit-for-bit.
    */
  /** Shared oracle CTE chain re-deriving per-doc BPE token counts with a
    * recursive CTE over the corpus's DISTINCT words (tokens as a
    * '|'-separated string; one lowest-rank merge per step — converges to
    * the all-at-once tokenization because every merge's constituents come
    * from lower ranks). Ends with pc(doc_id, n). Used by t11/p08/sp06/p09;
    * the VALUES list mirrors graft.functions.Bpe.EnglishMerges.
    * Compose as s\"\"\"WITH RECURSIVE $bpeCountCtes ...\"\"\".
    */
  /** Exact DuckDB oracle for the SUMMARIZE dialect form (q59): one
    * UNION ALL block per column in table order (ordinal-ordered, then
    * projected away), mirroring [[graft.ops.Profile.summarizeFull]]'s
    * exact formulas — HUGEINT sums ≡ the Spark side's Decimal(38,0)
    * widen-before-multiply, one pinned double chain for mean/std,
    * quantile_cont ≡ exact percentile. SUPPORTS ONLY BIGINT and
    * VARCHAR columns (enforced): summarizeFull's FLOAT/DOUBLE/DECIMAL
    * branch uses streaming avg/stddev, which this oracle does not
    * re-derive — extending the gated table past BIGINT/VARCHAR needs
    * that branch mirrored first, not NULLs that would falsely RED.
    */
  private def summarizeOracle(cols: Seq[(String, String)],
                              table: String): String = {
    require(cols.forall { case (_, t) => t == "BIGINT" || t == "VARCHAR" },
      s"summarizeOracle mirrors only BIGINT/VARCHAR stats, got $cols")
    val blocks = cols.zipWithIndex.map { case ((c, t), i) =>
      val stats =
        if (t == "BIGINT") {
          val s1 = s"CAST(sum(CAST($c AS HUGEINT)) AS DOUBLE)"
          val s2 = s"CAST(sum(CAST($c AS HUGEINT) * CAST($c AS HUGEINT))" +
            " AS DOUBLE)"
          val cn = s"CAST(count($c) AS DOUBLE)"
          s"""$s1 / $cn AS avg,
             sqrt(($s2 - $s1 * $s1 / $cn) / ($cn - 1)) AS std,
             quantile_cont($c, 0.25) AS q25,
             quantile_cont($c, 0.5) AS q50,
             quantile_cont($c, 0.75) AS q75"""
        } else
          """CAST(NULL AS DOUBLE) AS avg, CAST(NULL AS DOUBLE) AS std,
             CAST(NULL AS DOUBLE) AS q25, CAST(NULL AS DOUBLE) AS q50,
             CAST(NULL AS DOUBLE) AS q75"""
      s"""SELECT $i AS ord, '$c' AS column_name, '$t' AS column_type,
                 CAST(min($c) AS VARCHAR) AS "min",
                 CAST(max($c) AS VARCHAR) AS "max",
                 CAST(count(DISTINCT $c) AS BIGINT) AS approx_unique,
                 $stats,
                 CAST(count(*) AS BIGINT) AS "count",
                 round(CAST(count(*) - count($c) AS DOUBLE) * 100
                       / CAST(count(*) AS DOUBLE), 2) AS null_percentage
          FROM $table"""
    }.mkString(" UNION ALL ")
    s"""SELECT column_name, column_type, "min", "max", approx_unique,
               avg, std, q25, q50, q75, "count", null_percentage
        FROM ($blocks) ORDER BY ord"""
  }

  /** The d22/d23 corpus: documents plus planted mid-document verbatim
    * excerpts (tokens 11-50 of every 25th doc wrapped in fresh context)
    * — the overlap shape segment and chunk dedup both miss.
    */
  private def exactSubstrCorpus(s: SparkSession, dir: String) = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val excerpts = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("planted excerpt prefix marker "),
          array_join(slice(graft.ops.TextOps.tokens(col("text")),
            11, 40), " "),
          lit(" planted excerpt suffix marker")).as("text"))
    docs.select(col("doc_id"), col("text")).unionByName(excerpts)
  }

  /** Shared DuckDB CTE chain for the exact-substring family (d22/d23):
    * the [[exactSubstrCorpus]] union, tokenization, 15-gram postings
    * from raw gram STRINGS, pair matches, diagonal gap-and-islands, and
    * the maximal-run rollup `runs(ia, ib, sa, sb, rl)`.
    */
  private val exactSubstrCtes: String =
    """WITH u AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 2000000,
                  -- coalesce: DuckDB's out-of-bounds list slice is NULL
                  -- where Spark's is [] (a <11-token source doc)
                  'planted excerpt prefix marker ' ||
                  coalesce(array_to_string(list_filter(string_split_regex(
                    lower(text), '\W+'), x -> x <> '')[11:50], ' '), '') ||
                  ' planted excerpt suffix marker'
           FROM documents WHERE doc_id % 25 = 0),
         s AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\W+'),
                   x -> x <> '') AS toks FROM u),
         g AS (SELECT doc_id, i - 1 AS pos,
                      array_to_string(toks[i:i+14], ' ') AS gram
               FROM s, unnest(generate_series(1, len(toks) - 14)) u2(i)
               WHERE len(toks) >= 15),
         m AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                      a.pos AS pa, b.pos AS pb
               FROM g a JOIN g b ON a.gram = b.gram
                                AND a.doc_id < b.doc_id),
         r AS (SELECT ia, ib, pa, pb, pa - pb AS diag,
                      pa - row_number() OVER (PARTITION BY ia, ib, pa - pb
                                              ORDER BY pa) AS grp
               FROM m),
         runs AS (SELECT ia, ib,
                         CAST(min(pa) AS BIGINT) AS sa,
                         CAST(min(pb) AS BIGINT) AS sb,
                         CAST(max(pa) - min(pa) + 15 AS BIGINT) AS rl
                  FROM r GROUP BY ia, ib, diag, grp)"""

  /** K-unrolled DuckDB oracle for BPE merge TRAINING (t25): each round
    * re-derives pair counts from the '|'-delimited symbol state, takes
    * the same (count desc, lhs, rhs) argmax, and applies the merge with
    * a RECURSIVE replace-to-fixpoint — `replace` consumes the shared
    * delimiter between adjacent occurrences, so one pass can miss
    * every other occurrence of a run; iterating to fixpoint converges
    * to the Spark side's greedy leftmost fold (a merge's product can
    * never equal its own left constituent, so the occurrence set only
    * shrinks).
    */
  private def bpeTrainOracle(k: Int): String = {
    val rep = "replace(a.st, '|' || m.l || '|' || m.r || '|', " +
      "'|' || m.l || m.r || '|')"
    val blocks = (0 until k).map { i =>
      s"""
         p$i AS (SELECT s[g] AS l, s[g+1] AS r, sum(wn) AS cnt
                FROM (SELECT wn, list_filter(string_split(st, '|'),
                        x -> x <> '') AS s FROM v$i),
                     unnest(generate_series(1, len(s) - 1)) u(g)
                GROUP BY 1, 2),
         m$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         a${i + 1}(w, wn, st, step) AS (
           SELECT w, wn, st, 0 FROM v$i
           UNION ALL
           SELECT a.w, a.wn, $rep, a.step + 1
           FROM a${i + 1} a, m$i m WHERE $rep <> a.st),
         v${i + 1} AS (SELECT w, wn, st FROM (
           SELECT w, wn, st,
                  row_number() OVER (PARTITION BY w ORDER BY step DESC) AS rn
           FROM a${i + 1}) WHERE rn = 1)"""
    }.mkString(",")
    val rows = (0 until k).map(i =>
      s"""SELECT CAST($i AS INTEGER) AS rank, l AS lhs, r AS rhs,
                 CAST(cnt AS BIGINT) AS pair_count FROM m$i""")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE
         wc AS (SELECT w, count(*) AS wn
                FROM (SELECT unnest(string_split_regex(
                        lower(coalesce(text, '')), '[^a-z0-9]+')) AS w
                      FROM documents)
                WHERE w <> '' GROUP BY w),
         v0 AS (SELECT w, wn,
                       '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS st
                FROM wc),$blocks
         $rows ORDER BY rank"""
  }

  /** The t31 K-unrolled WordPiece training + greedy-segmentation oracle
    * (the t25/t29 mold): per merge round, symbol counts and adjacent
    * pair counts roll up from the '|'-delimited symbol string, the
    * likelihood argmax (cnt/(cl·cr) DESC, l, r) picks the merge, and a
    * recursive replace-to-fixpoint applies it (product = l ‖ strip##(r));
    * then the induced vocabulary (initial alphabet ∪ merge products)
    * greedy-longest-match segments the top-`nSeg` corpus words via a
    * recursive walk that consumes the longest vocab prefix per step —
    * exactly [[graft.ops.TextAnalysis.wordPieceTrain]] /
    * [[graft.ops.TextAnalysis.wordPieceSegment]].
    */
  private def wordPieceOracle(k: Int, nSeg: Int): String = {
    val mergeRows = (0 until k).map(i =>
      s"""SELECT 'merge' AS kind, l || '|' || r AS k,
                 CAST($i AS BIGINT) AS rank, CAST(cnt AS BIGINT) AS n,
                 CAST(cl AS BIGINT) AS cl, CAST(cr AS BIGINT) AS cr,
                 CAST(round(score * 1e9) AS BIGINT) AS score_fp,
                 l || substr(r, 3) AS s FROM m$i""")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE
         ${wordPieceCtes(k)},
         segwords AS MATERIALIZED (
           SELECT w, wn FROM (SELECT w, wn, row_number()
               OVER (ORDER BY wn DESC, w) AS rn FROM wc)
           WHERE rn <= $nSeg),
         ${wordPieceWalk("segwords")}
       SELECT kind, k, rank, n, cl, cr, score_fp, s FROM (
         $mergeRows
         UNION ALL
         SELECT 'seg', w, CAST(NULL AS BIGINT), wn,
                CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                CAST(NULL AS BIGINT), list_aggr(ps, 'string_agg', '.')
         FROM wp WHERE pos = len(w)
       ) ORDER BY kind, k"""
  }

  /** The t32 tokenize-the-corpus oracle (the t30 mold on the WordPiece
    * chain): same K-unrolled training, then the induced vocabulary
    * greedy-segments EVERY distinct word, pieces rank into ids
    * (ORDER BY piece — the deterministic vocab-id rule; [UNK] maps to
    * id 0), and per-document stats roll up through the doc→word stream.
    */
  private def wordPieceTokenizeOracle(k: Int): String =
    s"""WITH RECURSIVE
         ${wordPieceCtes(k)},
         ids AS MATERIALIZED (
           SELECT p, row_number() OVER (ORDER BY p) AS pid FROM vocab),
         ${wordPieceWalk("wc")},
         wstats AS MATERIALIZED (
           SELECT w, CAST(count(*) AS BIGINT) AS n_pieces,
                  CAST(sum(coalesce(ids.pid, 0)) AS BIGINT) AS id_sum,
                  CAST(max(CASE WHEN u.p = '[UNK]' THEN 1 ELSE 0 END)
                       AS BIGINT) AS is_unk
           FROM (SELECT w, unnest(ps) AS p
                 FROM wp WHERE pos = len(w)) u
           LEFT JOIN ids ON ids.p = u.p GROUP BY w),
         dw AS (SELECT doc_id,
                  unnest(list_filter(string_split_regex(
                    lower(coalesce(text, '')), '[^a-z0-9]+'),
                    x -> x <> '')) AS w
                FROM documents),
         agg AS (SELECT dw.doc_id,
                   CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(ws.is_unk) AS BIGINT) AS n_unk,
                   CAST(sum(ws.n_pieces) AS BIGINT) AS n_pieces,
                   CAST(sum(ws.id_sum) AS BIGINT) AS id_sum
                 FROM dw LEFT JOIN wstats ws ON ws.w = dw.w
                 GROUP BY dw.doc_id)
       SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
              coalesce(a.n_unk, 0) AS n_unk,
              coalesce(a.n_pieces, 0) AS n_pieces,
              coalesce(a.id_sum, 0) AS id_sum
       FROM documents d LEFT JOIN agg a USING (doc_id)
       ORDER BY d.doc_id"""

  /** Shared K-unrolled WordPiece training CTE chain (t31/t32): distinct
    * words, '|'-delimited ##-marked symbol strings, per-round symbol/
    * pair counts → likelihood argmax → replace-to-fixpoint application,
    * plus the induced vocabulary (alphabet ∪ products) and its
    * one-row map/maxlen frame `vm`.
    */
  private def wordPieceCtes(k: Int): String = {
    val rep = "replace(a.st, '|' || m.l || '|' || m.r || '|', " +
      "'|' || m.l || substr(m.r, 3) || '|')"
    // every multiply-referenced CTE is MATERIALIZED: v$i feeds s/p/a,
    // m$i feeds a/prods/rows — inlined, DuckDB would re-execute the
    // whole prior chain per reference, 3^k-fold (measured: > 300 s at
    // sf0.001 without, seconds with)
    val blocks = (0 until k).map { i =>
      s"""
         s$i AS MATERIALIZED (SELECT sym, sum(wn) AS c FROM (
                  SELECT wn, unnest(list_filter(string_split(st, '|'),
                           x -> x <> '')) AS sym FROM v$i)
                GROUP BY sym),
         p$i AS MATERIALIZED (SELECT s[g] AS l, s[g+1] AS r, sum(wn) AS cnt
                FROM (SELECT wn, list_filter(string_split(st, '|'),
                        x -> x <> '') AS s FROM v$i),
                     unnest(generate_series(1, len(s) - 1)) u(g)
                GROUP BY 1, 2),
         m$i AS MATERIALIZED (SELECT p.l, p.r, p.cnt, sl.c AS cl,
                        sr.c AS cr,
                        CAST(p.cnt AS DOUBLE) /
                          (CAST(sl.c AS DOUBLE) * CAST(sr.c AS DOUBLE))
                          AS score
                 FROM p$i p JOIN s$i sl ON sl.sym = p.l
                            JOIN s$i sr ON sr.sym = p.r
                 ORDER BY score DESC, p.l, p.r LIMIT 1),
         a${i + 1}(w, wn, st, step) AS (
           SELECT w, wn, st, 0 FROM v$i
           UNION ALL
           SELECT a.w, a.wn, $rep, a.step + 1
           FROM a${i + 1} a, m$i m WHERE $rep <> a.st),
         v${i + 1} AS MATERIALIZED (SELECT w, wn, st FROM (
           SELECT w, wn, st,
                  row_number() OVER (PARTITION BY w ORDER BY step DESC) AS rn
           FROM a${i + 1}) WHERE rn = 1)"""
    }.mkString(",")
    val prods = (0 until k)
      .map(i => s"SELECT l || substr(r, 3) AS p FROM m$i")
      .mkString(" UNION ALL ")
    s"""wc AS MATERIALIZED (SELECT w, count(*) AS wn
                FROM (SELECT unnest(string_split_regex(
                        lower(coalesce(text, '')), '[^a-z0-9]+')) AS w
                      FROM documents)
                WHERE w <> '' GROUP BY w),
         v0 AS MATERIALIZED (SELECT w, wn,
                       '|' || substr(w, 1, 1) || '|' ||
                       regexp_replace(substr(w, 2), '(.)', '##\\1|', 'g')
                         AS st
                FROM wc),$blocks,
         alpha AS (SELECT DISTINCT unnest(list_filter(string_split(st, '|'),
                     x -> x <> '')) AS p FROM v0),
         vocab AS MATERIALIZED (SELECT p FROM alpha UNION $prods),
         vm AS MATERIALIZED (
           SELECT map(list(p ORDER BY p), list(1 ORDER BY p)) AS m,
                  max(len(p) - CASE WHEN p LIKE '##%' THEN 2 ELSE 0 END)
                    AS ml
           FROM vocab)"""
  }

  /** The greedy longest-match walk as a recursive CTE `wp` over
    * `wordsCte` (columns w, wn), consuming the longest `vm`-vocab
    * prefix per step, [UNK] on a dead end.
    */
  private def wordPieceWalk(wordsCte: String): String = {
    val best =
      """list_max(list_filter(list_transform(
           generate_series(1, least(vm.ml, len(w) - pos)),
           l -> CASE WHEN map_extract(vm.m,
                  CASE WHEN pos = 0 THEN substr(w, 1, l)
                       ELSE '##' || substr(w, pos + 1, l) END)[1]
                IS NOT NULL THEN l END),
           x -> x IS NOT NULL))"""
    s"""wp(w, wn, pos, ps, bad) AS (
           SELECT w, wn, 0, CAST([] AS VARCHAR[]), false FROM $wordsCte
           UNION ALL
           SELECT w, wn,
             CASE WHEN $best IS NULL THEN len(w) ELSE pos + $best END,
             CASE WHEN $best IS NULL THEN ['[UNK]']
                  ELSE list_append(ps,
                    CASE WHEN pos = 0 THEN substr(w, 1, $best)
                         ELSE '##' || substr(w, pos + 1, $best) END) END,
             $best IS NULL
           FROM wp, vm WHERE pos < len(w) AND NOT bad)"""
  }

  /** The t29 K-unrolled unigram-LM training oracle: per EM round, a
    * recursive CTE carries the Viterbi DP array (one list of
    * (score, backpointer) structs per word, extended one position per
    * recursion step) and a second recursive CTE walks the backpointers
    * to the piece list; counts, add-one fixed-point scores, and the
    * prune-to-budget all mirror [[graft.ops.TextAnalysis.unigramLmTrain]]
    * exactly — same first-maximum (longest-piece) tie rule via
    * list_position of list_max, same (count desc, piece) prune order,
    * same maxWordLen=8 / maxPieceLen=3 contract.
    */
  private def unigramLmOracle(budget: Int, rounds: Int, nSeg: Int): String = {
    val (ctes, cur, f) = unigramTrainingCtes(budget, rounds)
    s"""WITH RECURSIVE
       ${ctes.mkString(",\n")},
       segwords AS MATERIALIZED (
           SELECT w, wn FROM (SELECT w, wn, row_number()
               OVER (ORDER BY wn DESC, w) AS rn FROM words)
           WHERE rn <= $nSeg),
       ${unigramVitCtes(f, "segwords", s"pm_sc$f")}
       SELECT kind, k, n, v, s FROM (
         SELECT 'piece' AS kind, t.p AS k, t.c AS n, sc.s AS v,
                CAST(NULL AS VARCHAR) AS s
         FROM $cur t JOIN sc$f sc ON sc.p = t.p
         UNION ALL
         SELECT 'seg', w, wn, CAST(NULL AS BIGINT),
                list_aggr(ps, 'string_agg', '.')
         FROM bt$f WHERE pos = 0
       ) ORDER BY kind, k"""
  }

  /** The t30 tokenize-the-corpus oracle: the same K-unrolled training
    * chain, then the FINAL model segments the whole distinct-word vocab
    * once, pieces map to ids (rank by score desc, piece — the vocab-id
    * rule), and per-document stats roll up through the doc→word stream
    * (words over the trained length cap count as OOV, never segment).
    */
  private def unigramTokenizeOracle(budget: Int, rounds: Int): String = {
    val (ctes, _, f) = unigramTrainingCtes(budget, rounds)
    s"""WITH RECURSIVE
       ${ctes.mkString(",\n")},
       ids AS MATERIALIZED (
         SELECT p, row_number() OVER (ORDER BY s DESC, p) AS pid
         FROM sc$f),
       ${unigramVitCtes(f, "words", s"pm_sc$f")},
       wstats AS MATERIALIZED (
         SELECT w, CAST(count(*) AS BIGINT) AS n_pieces,
                CAST(sum(ids.pid) AS BIGINT) AS id_sum
         FROM (SELECT w, unnest(ps) AS p FROM bt$f WHERE pos = 0) u
         JOIN ids ON ids.p = u.p GROUP BY w),
       dw AS (SELECT doc_id,
                unnest(list_filter(string_split_regex(
                  lower(coalesce(text, '')), '[^a-z0-9]+'),
                  x -> x <> '')) AS w
              FROM documents),
       agg AS (SELECT dw.doc_id,
                 CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(CASE WHEN len(dw.w) > 8 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_oov,
                 CAST(coalesce(sum(ws.n_pieces), 0) AS BIGINT) AS n_pieces,
                 CAST(coalesce(sum(ws.id_sum), 0) AS BIGINT) AS id_sum
               FROM dw LEFT JOIN wstats ws ON ws.w = dw.w
               GROUP BY dw.doc_id)
       SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
              coalesce(a.n_oov, 0) AS n_oov,
              coalesce(a.n_pieces, 0) AS n_pieces,
              coalesce(a.id_sum, 0) AS id_sum
       FROM documents d LEFT JOIN agg a USING (doc_id)
       ORDER BY d.doc_id"""
  }

  /** Shared K-unrolled unigram-LM training CTE chain (t29/t30): returns
    * (CTE texts, final piece-table name, final-scores round index).
    */
  private def unigramTrainingCtes(budget: Int,
                                  rounds: Int): (Seq[String], String, Int) = {
    val L = UnigramPieceLen
    def scores(name: String, src: String): String =
      s"""$name AS MATERIALIZED (
           SELECT p, CAST(round(ln((c + 1.0) / CAST(t + v AS DOUBLE)) * 1e6)
                     AS BIGINT) AS s
           FROM $src, (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS v
                       FROM $src)),
         pm_$name AS MATERIALIZED (
           SELECT map(list(p ORDER BY p), list(s ORDER BY p)) AS m FROM $name)"""
    def prune(name: String, counts: String): String =
      s"""$name AS MATERIALIZED (
           SELECT DISTINCT p, c FROM (
             SELECT p, c FROM (SELECT p, c, row_number()
                 OVER (ORDER BY c DESC, p) AS rn FROM $counts)
             WHERE rn <= $budget
             UNION ALL
             SELECT s.p, coalesce($counts.c, 0) FROM singles s
             LEFT JOIN $counts ON $counts.p = s.p))"""
    val parts = scala.collection.mutable.ArrayBuffer(
      s"""words AS MATERIALIZED (
           SELECT w, CAST(count(*) AS BIGINT) AS wn FROM (
             SELECT unnest(list_filter(string_split_regex(
                      lower(coalesce(text, '')), '[^a-z0-9]+'),
                    x -> x <> '' AND len(x) <= 8)) AS w
             FROM documents) GROUP BY w)""",
      """singles AS MATERIALIZED (
           SELECT DISTINCT substr(w, i, 1) AS p
           FROM words, unnest(generate_series(1, len(w))) AS a(i))""",
      s"""c0 AS MATERIALIZED (
           SELECT p, CAST(sum(wn) AS BIGINT) AS c FROM (
             SELECT wn, substr(w, i, l) AS p
             FROM words,
                  unnest(generate_series(1, len(w))) AS a(i),
                  unnest(generate_series(1, least($L, len(w) - i + 1))) AS b(l))
           GROUP BY p)""",
      prune("tab0", "c0"))
    var cur = "tab0"
    (1 to rounds).foreach { r =>
      parts += scores(s"sc$r", cur)
      parts += unigramVitCtes(r, "words", s"pm_sc$r")
      parts += s"""cnt$r AS MATERIALIZED (
           SELECT p, CAST(sum(wn) AS BIGINT) AS c FROM (
             SELECT wn, unnest(ps) AS p FROM bt$r WHERE pos = 0)
           GROUP BY p)"""
      parts += prune(s"tab$r", s"cnt$r")
      cur = s"tab$r"
    }
    val f = rounds + 1
    parts += scores(s"sc$f", cur)
    (parts.toSeq, cur, f)
  }

  /** One Viterbi-DP + backtrack recursive-CTE pair (round index `r`)
    * over `wordsCte` with the `pm` score map.
    */
  /** The one maxPieceLen both unigram oracle builders must share — the
    * DP candidate span and the seed-substring lengths desynchronize
    * silently otherwise.
    */
  private val UnigramPieceLen = 3

  private def unigramVitCtes(r: Int, wordsCte: String, pm: String): String = {
    val L = UnigramPieceLen
    val Neg = "-1000000000000000"
    val cands =
      s"""list_transform(generate_series(greatest(i + 1 - $L, 0), i),
          j -> struct_extract(arr[j + 1], 's') +
               coalesce(map_extract($pm.m, substr(w, j + 1, i + 1 - j))[1],
                        CAST($Neg AS BIGINT)))"""
    s"""vr$r(w, wn, i, arr) AS (
         SELECT w, wn, 0, [{'s': CAST(0 AS BIGINT), 'bp': 0}] FROM $wordsCte
         UNION ALL
         SELECT w, wn, i + 1,
           list_append(arr, {'s': list_max($cands),
             'bp': CAST(greatest(i + 1 - $L, 0) +
                        list_position($cands, list_max($cands)) - 1 AS INT)})
         FROM vr$r, $pm WHERE i < len(w)),
       vf$r AS MATERIALIZED (SELECT w, wn, arr FROM vr$r WHERE i = len(w)),
       bt$r(w, wn, pos, ps) AS (
         SELECT w, wn, len(w), CAST([] AS VARCHAR[]) FROM vf$r
         UNION ALL
         SELECT b.w, b.wn, struct_extract(v.arr[b.pos + 1], 'bp'),
                list_prepend(substr(b.w,
                  struct_extract(v.arr[b.pos + 1], 'bp') + 1,
                  b.pos - struct_extract(v.arr[b.pos + 1], 'bp')), b.ps)
         FROM bt$r b JOIN vf$r v ON v.w = b.w WHERE b.pos > 0)"""
  }

  private val bpeCountCtes: String =
    """mg(rank, l, r) AS (SELECT * FROM (VALUES
           (0,'t','h'),(1,'th','e'),(2,'i','n'),(3,'a','n'),(4,'an','d'),
           (5,'e','r'),(6,'o','n'),(7,'r','e'),(8,'o','u'),(9,'e','n'),
           (10,'a','t'),(11,'e','s'),(12,'o','r'),(13,'in','g'),(14,'a','r'),
           (15,'a','l')) v(rank, l, r)),
         w0 AS (SELECT DISTINCT unnest(list_filter(
                  string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
                FROM documents),
         bpe(w, st) AS (
           SELECT w, '|' || regexp_replace(w, '(.)', '\1|', 'g') FROM w0
           UNION ALL
           SELECT b.w, replace(b.st, '|' || mm.l || '|' || mm.r || '|',
                               '|' || mm.l || mm.r || '|')
           FROM bpe b JOIN mg mm ON mm.rank = (
             SELECT min(m2.rank) FROM mg m2
             WHERE contains(b.st, '|' || m2.l || '|' || m2.r || '|'))),
         cnt AS (SELECT w, min(length(st) - length(replace(st, '|', ''))) - 1 AS n
                 FROM bpe GROUP BY w),
         dw AS (SELECT doc_id, unnest(list_filter(
                  string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
                FROM documents),
         pc AS (SELECT dw.doc_id, sum(c.n) AS n
                FROM dw JOIN cnt c USING (w) GROUP BY dw.doc_id)"""

  /** Exact two-level IVF×PQ re-derivation over the full corpus — the
    * shared oracle of s09 (in-memory build), s11 (persisted index) and
    * s12 (incrementally appended index): all three must produce the
    * bit-identical search result, which for s12 doubles as the proof that
    * append-against-fixed-quantizers equals a from-scratch build.
    */
  /** The shared CTE prefix of [[ivfpqOracle]] and the rerank oracle —
    * everything up to the ADC ranking `r`.
    */
  private val ivfpqCtes: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         sub AS (SELECT vec_id, u.s AS s, emb[u.s*16+1 : u.s*16+16] AS sv
                 FROM e, unnest([0, 1, 2, 3]) AS u(s)),
         cb AS (SELECT s, vec_id AS cid, sv AS cvec FROM sub WHERE vec_id < 16),
         enc0 AS (SELECT v.vec_id, v.s, cb.cid,
                         CAST(round(list_sum(list_transform(generate_series(1, 16),
                              i -> (v.sv[i] - cb.cvec[i]) * (v.sv[i] - cb.cvec[i]))) * 1e6) AS BIGINT) AS d
                  FROM sub v JOIN cb USING (s)),
         codes AS (SELECT vec_id, s, cid AS code FROM (
                     SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                                  ORDER BY d, cid) AS rn
                     FROM enc0) t
                   WHERE rn = 1),
         co AS (SELECT vec_id AS ccid, emb AS cvec FROM e WHERE vec_id < 8),
         ca AS (SELECT v.vec_id, co.ccid,
                       CAST(round(list_sum(list_transform(generate_series(1, 64),
                            i -> (v.emb[i] - co.cvec[i]) * (v.emb[i] - co.cvec[i]))) * 1e6) AS BIGINT) AS d
                FROM e v CROSS JOIN co),
         cells AS (SELECT vec_id, ccid AS cell FROM (
                     SELECT *, row_number() OVER (PARTITION BY vec_id
                                                  ORDER BY d, ccid) AS rn FROM ca) t
                   WHERE rn = 1),
         pc AS (SELECT vec_id AS probe_id, ccid AS cell FROM (
                  SELECT *, row_number() OVER (PARTITION BY vec_id
                                               ORDER BY d, ccid) AS rn
                  FROM ca WHERE vec_id < 5) t
                WHERE rn <= 2),
         cand AS (SELECT pc.probe_id, cells.vec_id
                  FROM cells JOIN pc USING (cell)
                  WHERE cells.vec_id <> pc.probe_id),
         dt AS (SELECT p.vec_id AS probe_id, p.s, cb.cid,
                       CAST(round(list_sum(list_transform(generate_series(1, 16),
                            i -> (p.sv[i] - cb.cvec[i]) * (p.sv[i] - cb.cvec[i]))) * 1e6) AS BIGINT) AS pd
                FROM sub p JOIN cb USING (s) WHERE p.vec_id < 5),
         sc AS (SELECT cand.probe_id, cand.vec_id, sum(dt.pd) AS adist_fp
                FROM cand
                JOIN codes c ON c.vec_id = cand.vec_id
                JOIN dt ON dt.probe_id = cand.probe_id
                       AND dt.s = c.s AND dt.cid = c.code
                GROUP BY cand.probe_id, cand.vec_id),
         r AS (SELECT probe_id, vec_id, adist_fp,
                      CAST(row_number() OVER (PARTITION BY probe_id
                                              ORDER BY adist_fp, vec_id) AS BIGINT) AS rank
               FROM sc)"""

  private val ivfpqOracle: String =
    s"""$ivfpqCtes
         SELECT probe_id, rank, vec_id, CAST(adist_fp AS BIGINT) AS adist_fp
         FROM r WHERE rank <= 10 ORDER BY probe_id, rank"""

  /** Shared CTE body (no WITH keyword — m09 needs WITH RECURSIVE) that
    * re-derives every aHash bit from the BMP payload bytes and
    * enumerates pairwise hammings: the oracle backbone of m07 (pairs)
    * and m09 (clusters).
    */
  private val phashCtes: String =
    """d AS (SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
                  octet_length(encode(coalesce(text, ''))) AS len
           FROM documents),
         dims AS (SELECT doc_id, hx, len, greatest(len // 48, 1) AS height FROM d),
         px AS (
           SELECT dims.doc_id, u.y, v.x,
                  3*(((u.y*dims.height)//8)*16 + v.x*2) AS base, dims.hx, dims.len
           FROM dims, unnest(generate_series(0,7)) u(y),
                      unnest(generate_series(0,7)) v(x)),
         gr AS (
           SELECT doc_id, y, x,
                  ((CASE WHEN base < len
                         THEN CAST('0x'||substr(hx,2*base+1,2) AS INTEGER) ELSE 0 END)
                 + (CASE WHEN base+1 < len
                         THEN CAST('0x'||substr(hx,2*(base+1)+1,2) AS INTEGER) ELSE 0 END)
                 + (CASE WHEN base+2 < len
                         THEN CAST('0x'||substr(hx,2*(base+2)+1,2) AS INTEGER) ELSE 0 END)) // 3 AS gray
           FROM px),
         mh AS (SELECT doc_id, sum(gray) // 64 AS mean FROM gr GROUP BY doc_id),
         bits AS (SELECT gr.doc_id,
                         string_agg(CASE WHEN gr.gray > mh.mean THEN '1' ELSE '0' END,
                                    '' ORDER BY gr.y*8 + gr.x) AS pb
                  FROM gr JOIN mh USING (doc_id) GROUP BY gr.doc_id),
         hm AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(len(list_filter(generate_series(1,64),
                                            i -> a.pb[i] <> b.pb[i])) AS BIGINT) AS hamming
                FROM bits a JOIN bits b ON a.doc_id < b.doc_id)"""

  /** Retrieve-then-rerank oracle: the IVF×PQ ADC shortlist (rank ≤ 10)
    * re-scored by TRUE cosine on the original vectors, top-5 kept —
    * shares every CTE with [[ivfpqOracle]], so a green hash proves the
    * shortlist AND the exact refine agree across engines.
    */
  private val rerankOracle: String =
    s"""$ivfpqCtes,
         rr AS (SELECT probe_id, vec_id FROM r WHERE rank <= 10),
         ex AS (SELECT rr.probe_id, rr.vec_id,
                       list_cosine_similarity(p.emb, c.emb) AS sim
                FROM rr
                JOIN e p ON p.vec_id = rr.probe_id
                JOIN e c ON c.vec_id = rr.vec_id)
         SELECT probe_id, rank, vec_id, sim FROM (
           SELECT probe_id, vec_id, sim,
                  CAST(row_number() OVER (PARTITION BY probe_id
                                          ORDER BY sim DESC, vec_id) AS BIGINT)
                    AS rank
           FROM ex) t
         WHERE rank <= 5 ORDER BY probe_id, rank"""

  /** DSIR hashed-bigram weight derivation (sp11's full chain), shared by
    * the sp11 weights oracle and the sp12 Gumbel-resampling oracle.
    * `pd` ends with (doc_id, n_grams, weight_fp).
    */
  private val dsirWeightCtes: String =
    """s AS (SELECT doc_id, lang = 'en' AS t,
              list_filter(string_split_regex(lower(coalesce(text, '')), '\W+'),
                          x -> x <> '') AS toks
            FROM documents),
         f AS (SELECT doc_id, t,
                      substring(md5(toks[i] || ' ' || toks[i+1]), 1, 2) AS b
               FROM s, unnest(generate_series(1, len(toks)-1)) AS u(i)),
         rawc AS (SELECT b, CAST(count(*) AS DOUBLE) AS cr FROM f GROUP BY b),
         tgtc AS (SELECT b, CAST(count(*) AS DOUBLE) AS ct
                  FROM f WHERE t GROUP BY b),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS nr,
                        CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS DOUBLE) AS nt
                 FROM f),
         ratio AS (SELECT rawc.b,
                     CAST(round((ln((coalesce(tgtc.ct, 0.0) + 1.0)
                                    / (tot.nt + 256.0))
                       - ln((rawc.cr + 1.0) / (tot.nr + 256.0))) * 1e6)
                       AS BIGINT) AS fp
                   FROM rawc LEFT JOIN tgtc USING (b) CROSS JOIN tot),
         pd AS (SELECT f.doc_id, count(*) AS n_grams, sum(ratio.fp) AS weight_fp
                FROM f JOIN ratio USING (b) GROUP BY f.doc_id)"""

  private val exactTopKOracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
         scored AS (
           SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
                  list_cosine_similarity(p.emb, c.emb) AS sim
           FROM e p, e c WHERE p.vec_id < 5 AND c.vec_id <> p.vec_id)
         SELECT probe_id, rank, vec_id, sim FROM (
           SELECT probe_id, vec_id, sim,
                  CAST(row_number() OVER (PARTITION BY probe_id
                                          ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
           FROM scored) t
         WHERE rank <= 10 ORDER BY probe_id, rank"""

  /** Hourly (event_type) event rollup — the oracle for both the batch
    * form (e01) and its streaming Complete-mode replay (st03).
    */
  private val hourlyOracle: String =
    """SELECT epoch_us(date_trunc('hour', ts)) AS h, event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
       FROM events GROUP BY date_trunc('hour', ts), event_type
       ORDER BY h, event_type"""

  /** 30-minute-gap session numbering per user — the oracle for both the
    * batch sessionize (e02) and its streaming replay (st01), which must
    * agree exactly.
    */
  private val sessionizeOracle: String =
    """WITH x AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS ns
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, event_id,
                CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         FROM x ORDER BY user_id, event_id"""

  // ----------------------------------------------------------------------
  // Reference-parity surface (SURVEY §2) — q…
  //
  // Id numbering note: t15, io08 and pr12 were never assigned (numbering
  // gaps from development, not deleted queries); every id that ever
  // shipped in a CORRECTNESS_r*.json still exists here. g13 is the
  // sketch-union query; the former duplicate g13_heavy_hitters was
  // renamed g14_heavy_hitters in round 10.
  // ----------------------------------------------------------------------
  private lazy val defs: Seq[(String, (QFn, Option[String]))] = Seq(

    // S4 scan + P1 projection, column pruning reaches the parquet scan
    "q01_scan_project" -> same("lineitem",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"""),

    // P2 filter + logical predicates (AND/OR, comparisons)
    "q02_filter_where" -> same("lineitem",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
         FROM lineitem
         WHERE (l_returnflag = 'R' AND l_quantity > 30.0)
            OR (l_linestatus = 'O' AND l_discount < 0.02)
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"""),

    // P3 scalar arithmetic incl. unary minus, %, bitwise, and pg `#` xor
    // (dialect rewrite; DuckDB spells xor as a function)
    "q03_arithmetic" -> diff("lineitem",
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1 - l_discount) AS revenue,
                l_quantity + 1.0 AS qplus, -l_quantity AS qneg,
                l_extendedprice / l_quantity AS unit_price,
                CAST(l_orderkey % 7 AS BIGINT) AS m7,
                CAST(l_orderkey & 255 AS BIGINT) AS band,
                CAST(l_orderkey | 1 AS BIGINT) AS bor,
                CAST(l_orderkey # 42 AS BIGINT) AS bxor
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax""",
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1 - l_discount) AS revenue,
                l_quantity + 1.0 AS qplus, -l_quantity AS qneg,
                l_extendedprice / l_quantity AS unit_price,
                CAST(l_orderkey % 7 AS BIGINT) AS m7,
                CAST(l_orderkey & 255 AS BIGINT) AS band,
                CAST(l_orderkey | 1 AS BIGINT) AS bor,
                CAST(xor(l_orderkey, 42) AS BIGINT) AS bxor
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"""),

    // IN / BETWEEN / LIKE / IS NOT NULL predicate family
    "q04_in_between_like" -> same("lineitem",
      """SELECT l_orderkey, l_linenumber, l_returnflag
         FROM lineitem
         WHERE l_returnflag IN ('A', 'R')
           AND l_quantity BETWEEN 10 AND 20
           AND l_linestatus NOT LIKE 'O%'
           AND l_shipdate IS NOT NULL
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"""),

    // NULL handling: IS NULL, nullif/coalesce
    "q05_null_handling" -> same("orders",
      """SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st,
                coalesce(nullif(o_orderstatus, 'O'), 'open') AS st2,
                (nullif(o_orderstatus, 'O') IS NULL) AS is_open
         FROM orders ORDER BY o_orderkey"""),

    // A1 global aggregate: count(*)/count(col)/min/max/sum/avg, string min/max
    // (decimal-safe sum + exact-sum-over-count avg per SURVEY §7 semantics).
    // Output policy (round-1 lesson): the decimal math stays internal, the
    // gated output is DOUBLE — the driver hash rejects ANY decimal column
    // (even width-matched ones), and decimal->double is correctly rounded
    // in both engines (verified over 40k random values).
    "q06_agg_global" -> same("lineitem",
      """SELECT count(*) AS n_rows, count(l_quantity) AS n_q,
                min(l_quantity) AS min_q, max(l_quantity) AS max_q,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_q,
                min(l_returnflag) AS min_rf, max(l_linestatus) AS max_ls
         FROM lineitem"""),

    // A2-A5 hash aggregate, the flagship TPC-H-Q1-shaped query
    "q07_agg_group" -> same("lineitem",
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""),

    // multi-key group (numeric + string), A3/A4 kernels in the reference
    "q08_agg_multikey" -> same("lineitem",
      """SELECT l_linenumber, l_returnflag, count(*) AS n,
                min(l_extendedprice) AS min_p, max(l_extendedprice) AS max_p
         FROM lineitem GROUP BY l_linenumber, l_returnflag
         ORDER BY l_linenumber, l_returnflag"""),

    // HAVING after aggregation (planner.py:471-476 in the reference)
    "q09_having" -> same("lineitem",
      """SELECT l_partkey, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq
         FROM lineitem GROUP BY l_partkey HAVING count(*) >= 4
         ORDER BY l_partkey"""),

    // SELECT DISTINCT (compiled as group-by in the reference, planner.py:380-382)
    "q10_distinct" -> same("lineitem",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus"""),

    // O1+O2 sort + limit → top-k (TakeOrderedAndProject in Spark)
    "q11_topk" -> same("orders",
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),

    // O2 LIMIT/OFFSET slice
    "q12_limit_offset" -> same("orders",
      """SELECT o_orderkey, o_custkey FROM orders
         ORDER BY o_orderkey LIMIT 50 OFFSET 25"""),

    // O1 sort by computed expression with nulls-last (reference golden
    // semantics, test_query_results.py:1253-1269)
    "q13_sort_nulls" -> same("orders",
      """SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS pri
         FROM orders ORDER BY pri ASC NULLS LAST, o_orderkey LIMIT 500"""),

    // §2.8 math library (ln naming shared via Spark's `ln` alias).
    // `abs(-x) + 0.0`: DuckDB's double abs() returns -0.0 for -0.0 input
    // (bitwise hash-fail vs Spark's +0.0); adding 0.0 normalizes the sign
    // of zero in both engines without changing any other value.
    "q14_math" -> same("lineitem",
      """SELECT l_orderkey, l_linenumber,
                round(sqrt(l_quantity), 6) AS r_sqrt,
                round(ln(l_extendedprice), 6) AS r_ln,
                round(log10(l_extendedprice), 6) AS r_log10,
                round(log2(l_quantity), 6) AS r_log2,
                round(power(l_discount, 2), 6) AS r_pow,
                abs(-l_tax) + 0.0 AS r_abs,
                round(sin(l_quantity), 6) AS r_sin,
                round(cos(l_quantity), 6) AS r_cos
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"""),

    // §2.8 datetime library: parts, casts, busday, interval arithmetic,
    // epoch construction (graft functions on the Spark side)
    "q15_datetime" -> diff("orders",
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
                CAST(month(o_orderdate) AS BIGINT) AS m,
                CAST(day(o_orderdate) AS BIGINT) AS d,
                CAST(date(o_orderdate) AS DATE) AS od,
                is_busday(o_orderdate) AS busday,
                o_orderdate + timedelta(3, 'D') AS plus3,
                CAST(from_timestamp(1500000000) AS TIMESTAMP_NTZ) AS ft
         FROM orders ORDER BY o_orderkey""",
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
                day(o_orderdate) AS d,
                CAST(o_orderdate AS DATE) AS od,
                (isodow(o_orderdate) <= 5) AS busday,
                o_orderdate + INTERVAL 3 DAY AS plus3,
                make_timestamp(1500000000000000) AS ft
         FROM orders ORDER BY o_orderkey"""),

    // §2.8 string library: upper/lower/concat/||/substring/length
    "q16_string" -> same("orders",
      """SELECT o_orderkey, upper(o_orderstatus) AS u, lower(o_orderpriority) AS lo,
                concat(o_orderstatus, '-', CAST(o_orderkey AS STRING)) AS tag,
                o_orderpriority || '!' AS bang,
                substring(o_orderpriority, 1, 3) AS sub3,
                CAST(length(o_orderpriority) AS BIGINT) AS len
         FROM orders ORDER BY o_orderkey"""),

    // §2.8 cast functions (numpy astype semantics: float→int truncates;
    // DuckDB cast rounds, so the oracle spells out trunc)
    "q17_casts" -> diff("lineitem",
      """SELECT l_orderkey, l_linenumber,
                to_int('42') AS i1, to_int(l_quantity) AS i2,
                to_float(l_linenumber) AS f1, to_str(l_orderkey) AS s1,
                to_bool(l_linenumber % 2) AS b1
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax""",
      """SELECT l_orderkey, l_linenumber,
                CAST(42 AS BIGINT) AS i1, CAST(trunc(l_quantity) AS BIGINT) AS i2,
                CAST(l_linenumber AS DOUBLE) AS f1, CAST(l_orderkey AS VARCHAR) AS s1,
                CAST(l_linenumber % 2 AS BOOLEAN) AS b1
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"""),

    // §2.8/§2.9 np.* namespace through the dialect pre-pass
    "q18_np_namespace" -> diff("lineitem",
      """SELECT l_orderkey, l_linenumber,
                round(np.log(l_extendedprice), 6) AS nplog,
                round(np.square(l_discount), 6) AS npsq,
                np.abs(-l_quantity) AS npabs,
                round(np.power(l_quantity, 1.5), 6) AS nppow,
                np.maximum(l_tax, l_discount) AS npmax
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax""",
      """SELECT l_orderkey, l_linenumber,
                round(ln(l_extendedprice), 6) AS nplog,
                round(power(l_discount, 2), 6) AS npsq,
                abs(-l_quantity) AS npabs,
                round(power(l_quantity, 1.5), 6) AS nppow,
                greatest(l_tax, l_discount) AS npmax
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"""),

    // §2.9 user-registered scalar function (register_python parity)
    "q19_udf" -> ((
      (s: SparkSession, dir: String) => {
        s.udf.register("disc_bucket", (d: Double) => (d * 100).toInt)
        tbl(s, dir, "lineitem").sql(
          """SELECT l_orderkey, l_linenumber, disc_bucket(l_discount) AS bucket
             FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax""").toDF
      },
      Some(
        """SELECT l_orderkey, l_linenumber,
                  CAST(trunc(l_discount * 100) AS INTEGER) AS bucket
           FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"""))
      : (QFn, Option[String])),

    // §2.4 overflow-safe sum: Decimal(38,0) accumulation (the reference's
    // hugeint promotion, agg_funcs.h:319-435, with a statically fixed type)
    // (output as exact digit string: Decimal(38,0) accumulation inside,
    // and the full >2^53 value survives the compare byte-for-byte)
    "q20_sum_big" -> diff("orders",
      """SELECT CAST(sum_big(o_orderkey * 1000000000) AS STRING) AS big_sum FROM orders""",
      """SELECT CAST(sum(CAST(o_orderkey * 1000000000 AS DECIMAL(38,0))) AS VARCHAR) AS big_sum FROM orders"""),

    // np.* namespace used as aggregates (reference aliases np.min/max/sum
    // to the aggregate kernels, vinum/core/functions.py:402-406)
    "q21_np_agg" -> diff("lineitem",
      """SELECT l_returnflag,
                CAST(np.sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
                np.min(l_quantity) AS mn, np.max(l_quantity) AS mx,
                round(np.mean(l_discount), 6) AS avg_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
      """SELECT l_returnflag,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
                min(l_quantity) AS mn, max(l_quantity) AS mx,
                round(avg(l_discount), 6) AS avg_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
      ),

    // S1 read_csv: round-trip through a real CSV file (header + schema
    // inference + compression-capable reader), then aggregate — the
    // oracle runs the same aggregate over the source parquet, so the
    // whole read path (write, infer, parse) must be value-exact.
    // Doubles round-trip via shortest-repr text; ints are re-widened
    // explicitly (inference may pick INT where parquet had BIGINT).
    "io01_csv_roundtrip" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val tmp = s"target/tmp/io01_csv_${new java.io.File(dir).getName}"
        s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_returnflag"))
          .write.mode("overwrite").option("header", "true").csv(tmp)
        Table.fromCsv(s, tmp).sql(
          """SELECT l_returnflag, count(*) AS n,
                    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
                    CAST(sum(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS sk
             FROM t GROUP BY l_returnflag ORDER BY l_returnflag""").toDF
      },
      """SELECT l_returnflag, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
                CAST(sum(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS sk
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // S3 read_json: NDJSON round-trip through the line-delimited reader
    "io02_json_roundtrip" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val tmp = s"target/tmp/io02_json_${new java.io.File(dir).getName}"
        s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .write.mode("overwrite").json(tmp)
        Table.fromJson(s, tmp).sql(
          """SELECT o_orderstatus, count(*) AS n,
                    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
                    CAST(max(o_orderkey) AS BIGINT) AS mx
             FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""").toDF
      },
      """SELECT o_orderstatus, count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
                CAST(max(o_orderkey) AS BIGINT) AS mx
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    // hive-partitioned parquet write + pruned read-back: the 100 TB
    // storage layout (partition on a low-cardinality routing column; a
    // filter on it prunes whole directories — PlanSpec pins the
    // PartitionFilters in the scan)
    "io03_parquet_partitioned" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val tmp = scratchDir(s"io03_part_${new java.io.File(dir).getName}")
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .write.mode("overwrite").partitionBy("lang").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("lang").isin("en", "de"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars").cast("bigint")).as("sc"),
            min(col("doc_id")).as("mn"))
          .orderBy(col("lang"))
      },
      """SELECT lang, count(*) AS n,
                CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sc,
                CAST(min(doc_id) AS BIGINT) AS mn
         FROM documents WHERE lang IN ('en', 'de')
         GROUP BY lang ORDER BY lang"""),

    // compressed CSV round-trip (S1 codec support: gzip written and
    // auto-detected on read by extension)
    "io04_csv_gzip" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val tmp = scratchDir(s"io04_gz_${new java.io.File(dir).getName}")
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").option("header", "true")
          .option("compression", "gzip").csv(tmp)
        Table.fromCsv(s, tmp).sql(
          """SELECT lang, count(*) AS n,
                    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sc,
                    CAST(min(doc_id) AS BIGINT) AS mn
             FROM t GROUP BY lang ORDER BY lang""").toDF
      },
      """SELECT lang, count(*) AS n,
                CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sc,
                CAST(min(doc_id) AS BIGINT) AS mn
         FROM documents GROUP BY lang ORDER BY lang"""),

    // salted skew join: deterministic content salt on the big side,
    // small side replicated saltx — result must equal the PLAIN inner
    // join (the oracle computes exactly that), proving the salt spreads
    // hot keys without changing semantics
    "j07_salted_join" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val big = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_custkey").as("custkey"), col("o_totalprice"))
        val small = s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
        graft.ops.Skew.saltedJoin(big, small, "custkey", salt = 8)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sp"))
          .orderBy(col("c_mktsegment"))
      },
      """SELECT c_mktsegment, count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sp
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment"""),

    // datetime(value, unit) truncation semantics: string/temporal input
    // parses then truncates to the unit; numeric input is epoch-in-unit;
    // unit 'D' yields DATE (reference: vinum/core/functions.py:34-120)
    "q22_datetime_unit" -> diff("orders",
      """SELECT o_orderkey,
                datetime(CAST(o_orderdate AS STRING), 'D') AS od,
                CAST(datetime(CAST(o_orderdate AS STRING), 's') AS TIMESTAMP_NTZ) AS ots,
                datetime(o_orderkey, 'D') AS dk,
                CAST(datetime(o_orderkey * 1000, 'ms') AS TIMESTAMP_NTZ) AS tk
         FROM orders ORDER BY o_orderkey""",
      """SELECT o_orderkey,
                CAST(o_orderdate AS DATE) AS od,
                CAST(date_trunc('second', o_orderdate) AS TIMESTAMP) AS ots,
                CAST(DATE '1970-01-01' + to_days(CAST(o_orderkey AS INT)) AS DATE) AS dk,
                epoch_ms(o_orderkey * 1000) AS tk
         FROM orders ORDER BY o_orderkey"""),

    // §2.9 register_numpy analog: whole-column UDF registered as a Column
    // builder (Registry.registerColumnFn); global stats become unbounded
    // window aggregates. Min-max normalization here because its window
    // min/max are order-independent IEEE-exact (a z-score's double
    // avg/stddev depend on summation order across partitions — fine for
    // users, not for an exact-hash oracle; the z-score port itself is
    // FunctionsSpec-tested).
    "q24_column_udf" -> ((
      (s: SparkSession, dir: String) => {
        Registry.registerAll(s)
        Registry.registerColumnFn(s, "minmax_norm", { case Seq(x) =>
          (x - Registry.wholeColumn(min(x))) /
            (Registry.wholeColumn(max(x)) - Registry.wholeColumn(min(x)))
        })
        tbl(s, dir, "orders").sql(
          """SELECT o_orderkey, minmax_norm(o_totalprice) AS norm_price
             FROM orders ORDER BY o_orderkey""").toDF
      },
      Some(
        """SELECT o_orderkey,
                  (o_totalprice - min(o_totalprice) OVER ())
                    / (max(o_totalprice) OVER () - min(o_totalprice) OVER ()) AS norm_price
           FROM orders ORDER BY o_orderkey"""))
      : (QFn, Option[String])),

    // S8 FROM-less SELECT (reference: vinum/core/algebra.py:282-287,
    // planner.py:357-363 — `select 2+2` on an empty one-row relation),
    // plus unary `~`, pi()/e() constants. DuckDB spells e() as exp(1.0)
    // — bit-identical to Math.E.
    "q23_fromless" -> ((
      (s: SparkSession, dir: String) => {
        Registry.registerAll(s)
        s.sql(
          """SELECT CAST(2 + 2 AS BIGINT) AS four,
                    CAST(~5 AS BIGINT) AS bnot,
                    CAST(~CAST(0 AS BIGINT) AS BIGINT) AS bnot0,
                    pi() AS pi_v, e() AS e_v,
                    'x' || '-' || 'y' AS cc""")
      },
      Some(
        """SELECT CAST(2 + 2 AS BIGINT) AS four,
                  CAST(~5 AS BIGINT) AS bnot,
                  CAST(~CAST(0 AS BIGINT) AS BIGINT) AS bnot0,
                  pi() AS pi_v, exp(1.0) AS e_v,
                  'x' || '-' || 'y' AS cc"""))
      : (QFn, Option[String])),

    // select-list alias referenced in WHERE — the reference binder
    // substitutes select aliases into WHERE (vinum/planner/binder.py:
    // 100-132); Spark resolves aliases in GROUP BY/HAVING/ORDER BY but
    // not WHERE, so Dialect.aliasesIntoWhere inlines the expression.
    // DuckDB supports lateral aliases in WHERE natively: same text runs
    // on both engines.
    "q25_alias_where" -> same("lineitem",
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1 - l_discount) AS revenue
         FROM lineitem
         WHERE revenue > 90000.0 AND l_orderkey % 2 = 1
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"""),

    // ------------------------------------------------------------------
    // Capability extensions beyond the reference (SURVEY §2.3/2.5/2.7:
    // joins, windows, set ops, subqueries are absent in vinum; Spark-first
    // design gets them natively). Broadcast hints: dims are tiny, the big
    // fact side must never shuffle for them.
    // ------------------------------------------------------------------

    // multi-way join, star-schema: broadcast dims, single shuffle for agg
    "j01_join_bcast" -> multi(Seq("lineitem", "orders", "customer", "nation"),
      """SELECT /*+ BROADCAST(customer), BROADCAST(nation) */ n_name,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name"""),

    // anti join (NOT EXISTS → LeftAnti)
    "j02_anti_join" -> multi(Seq("customer", "orders"),
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 450000)
         ORDER BY c_custkey"""),

    // semi join (EXISTS → LeftSemi)
    "j03_semi_join" -> multi(Seq("customer", "orders"),
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey"""),

    // big-big equi-join: shuffle join on the key, partial aggregation after
    "j04_join_shuffle" -> multi(Seq("lineitem", "orders"),
      """SELECT o_orderpriority, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // outer join preserving unmatched build-side rows
    "j05_outer_join" -> multi(Seq("part", "lineitem"),
      """SELECT p_partkey, count(l_orderkey) AS n_li
         FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
         GROUP BY p_partkey ORDER BY p_partkey"""),

    // window: row_number + running sum per partition (SURVEY §2.5)
    "w01_window_running" -> multi(Seq("orders"),
      """SELECT o_custkey, o_orderkey,
                CAST(row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
         FROM orders ORDER BY o_custkey, rn"""),

    // window top-n per group
    "w02_rank_topn" -> multi(Seq("orders"),
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  CAST(row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
           FROM orders) ranked
         WHERE rk <= 3 ORDER BY o_custkey, rk"""),

    // window lag/lead
    "w03_lag_lead" -> multi(Seq("orders"),
      """SELECT o_custkey, o_orderkey,
                lag(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS prev_ok,
                lead(o_orderkey) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS next_ok
         FROM orders ORDER BY o_custkey, o_orderkey"""),

    // set operations (SURVEY §2.7 — absent in reference)
    "set01_union" -> multi(Seq("lineitem", "orders"),
      """SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'A'
         UNION
         SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
         ORDER BY k"""),

    "set02_intersect_except" -> multi(Seq("lineitem", "orders"),
      """SELECT k, 'both' AS tag FROM (
           SELECT l_orderkey AS k FROM lineitem
           INTERSECT
           SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') a
         UNION ALL
         SELECT k, 'only_li' AS tag FROM (
           SELECT l_orderkey AS k FROM lineitem
           EXCEPT
           SELECT o_orderkey FROM orders) b
         ORDER BY tag, k"""),

    // Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    // multiplicity-aware versions of set02 — a key appearing 3x on the
    // left and 1x on the right survives EXCEPT ALL twice, which the
    // DISTINCT forms cannot express. Same text on both engines; Spark
    // plans these as aggregate+generate (count-min replication), no
    // nested loop.
    "set04_bag_setops" -> multi(Seq("lineitem", "orders"),
      """SELECT k, 'inter_all' AS tag, count(*) AS n FROM (
           SELECT l_orderkey AS k FROM lineitem
           INTERSECT ALL
           SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') a
         GROUP BY k
         UNION ALL
         SELECT k, 'except_all' AS tag, count(*) AS n FROM (
           SELECT l_orderkey AS k FROM lineitem
           EXCEPT ALL
           SELECT o_orderkey FROM orders) b
         GROUP BY k
         ORDER BY tag, k"""),

    // Inline VALUES table constructor joined against a fact — the
    // pattern for tiny literal dimensions (static bucket maps, code
    // tables) that should broadcast rather than live in storage. Same
    // text on both engines.
    "q43_values" -> multi(Seq("orders"),
      """SELECT v.region_name, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents
         FROM orders o
         JOIN (VALUES (0, 'AMERICA'), (1, 'ASIA'), (2, 'EUROPE'),
                      (3, 'AFRICA'), (4, 'MIDEAST')) AS v(k, region_name)
           ON o.o_custkey % 5 = v.k
         GROUP BY v.region_name ORDER BY region_name"""),

    // scalar subquery (threshold computed exactly → engine-stable compare)
    "sub01_scalar_subquery" -> multi(Seq("orders"),
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                            / count(*) FROM orders)
         ORDER BY o_orderkey"""),

    // correlated scalar subquery
    "sub02_correlated" -> multi(Seq("orders", "customer"),
      """SELECT o.o_orderkey, o.o_custkey FROM orders o
         WHERE o.o_totalprice >
               (SELECT 20 * CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                FROM customer c WHERE c.c_custkey = o.o_custkey)
         ORDER BY o.o_orderkey"""),

    // IN subquery (→ LeftSemi)
    "sub03_in_subquery" -> multi(Seq("part", "lineitem"),
      """SELECT p_partkey, p_name FROM part
         WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
         ORDER BY p_partkey"""),

    // grouping sets via CUBE
    "r02_cube" -> multi(Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus, count(*) AS n
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST"""),

    // approximate aggregates, strict-oracled via the error-gate contract
    // (promoted out of no_oracle per r8 VERDICT #5): raw sketch values
    // are implementation-specific, so the gated outputs are per-group
    // error BOUNDS that equal their contract constants iff the measured
    // relative error stays inside them (sketches are deterministic for
    // fixed input, so the gate is exact, not flaky). Distinct surface
    // from ap02: custom-rsd HLL (0.02 vs default) and the multi-quantile
    // ARRAY percentile_approx form (p25/p75/p90, accuracy 2000) with
    // elements extracted to scalars for the driver comparator.
    "ap01_approx" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        def relerr(a: Column, e: Column): Column = abs(a - e).cast("double") / e
        def gate(err: Column, bound: Double): Column =
          when(err <= bound, lit(bound)).otherwise(err)
        val li = s.read.parquet(s"$dir/lineitem.parquet")
        // the exact COUNT(DISTINCT) runs as its OWN aggregation and
        // joins back on the 3-value group key: fused into one agg,
        // Spark's distinct rewrite keys the partial aggregate on
        // (l_returnflag, l_partkey) and builds an HLL sketch + BOTH
        // percentile buffers PER (flag, partkey) GROUP — ~200k heavy
        // buffers where 3 suffice (plan in plans/r18/ap01_approx_*;
        // measured 5.3 s → the split's two lean passes). Same rows,
        // same values: the join key is the group key, one row per side.
        val sketch = li
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey"), rsd = 0.02).as("__acd"),
            percentile_approx(col("l_extendedprice"),
              array(lit(0.25), lit(0.75), lit(0.9)), lit(2000)).as("__pa"),
            expr("percentile(l_extendedprice, array(0.25D, 0.75D, 0.9D))")
              .as("__pe"))
        val exact = li.groupBy(col("l_returnflag"))
          .agg(count_distinct(col("l_partkey")).as("n_parts"))
        sketch.join(exact, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n_parts"),
            gate(relerr(col("__acd"), col("n_parts")), 0.05).as("cd_err_bound"),
            gate(relerr(col("__pa")(0), col("__pe")(0)), 0.01).as("p25_err_bound"),
            gate(relerr(col("__pa")(1), col("__pe")(1)), 0.01).as("p75_err_bound"),
            gate(relerr(col("__pa")(2), col("__pe")(2)), 0.01).as("p90_err_bound"))
          .orderBy(col("l_returnflag"))
      },
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
                CAST(0.05 AS DOUBLE) AS cd_err_bound,
                CAST(0.01 AS DOUBLE) AS p25_err_bound,
                CAST(0.01 AS DOUBLE) AS p75_err_bound,
                CAST(0.01 AS DOUBLE) AS p90_err_bound
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // sketch-tier CORPUS OVERLAP (ap04): how much distinct content two
    // corpora share, estimated by HLL inclusion–exclusion
    // (|A| + |B| − |A∪B|) over 3-gram hashes — the O(1)-memory way to
    // size a decontamination problem BEFORE paying d10's exact gram
    // join. The posting rolls up to DISTINCT grams first (one map-side-
    // combined shuffle of longs carrying two presence flags) and both
    // the exact counts and the sketches read that distinct frame: HLL
    // is duplicate-insensitive, so sketching the distinct items gives
    // the identical estimate, and the exact side becomes flag sums — no
    // multi-distinct Expand (a conditional-count_distinct formulation
    // measured 15 s at sf0.1 from the 4-way Expand; this shape is one
    // gram shuffle). Grams travel as xxhash64 longs (the d14
    // hash≡string mold); the gate is the ap01 error-bound discipline
    // (sketches are deterministic for fixed input, so the gate is
    // exact — measured 0.0262 vs the 0.05 contract at sf0.01).
    "ap04_overlap_sketch" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        def relerr(a: Column, e: Column): Column =
          abs(a - e).cast("double") / e
        def gate(err: Column, bound: Double): Column =
          when(err <= bound, lit(bound)).otherwise(err)
        // numeric shingling (the d02 path): window_hashes over token
        // hashes — no per-shingle string materialization, the dominant
        // cost of the string formulation (measured 6.8 s vs 1.5 s here
        // at sf0.1); distinct window-hashes ≡ distinct string 3-grams
        // absent collisions, which the strict oracle re-checks
        val dg = s.read.parquet(s"$dir/documents.parquet")
          .select((col("doc_id") % 2 === 0).as("in_a"),
            explode(call_function("window_hashes",
              graft.ops.TextOps.tokenHashes(col("text")), lit(3))).as("g"))
          .groupBy(col("g"))
          .agg(max(when(col("in_a"), 1L).otherwise(0L)).as("has_a"),
            max(when(!col("in_a"), 1L).otherwise(0L)).as("has_b"))
        val ovl = col("n_a") + col("n_b") - col("n_union")
        dg.agg(
            sum(col("has_a")).as("n_a"),
            sum(col("has_b")).as("n_b"),
            count(lit(1)).as("n_union"),
            approx_count_distinct(when(col("has_a") === 1L, col("g")),
              rsd = 0.01).as("__ea"),
            approx_count_distinct(when(col("has_b") === 1L, col("g")),
              rsd = 0.01).as("__eb"),
            approx_count_distinct(col("g"), rsd = 0.01).as("__eu"))
          .select(col("n_a"), col("n_b"), col("n_union"),
            ovl.as("n_overlap"),
            // guard the relerr DENOMINATOR only: disjoint corpora make
            // ovl = 0 and a bare abs/ovl would emit NULL where the
            // oracle pins the 0.05 contract constant; greatest(ovl, 1)
            // degrades to absolute error there (still leaks loudly if
            // the sketch invents overlap on truly disjoint halves)
            gate(abs(col("__ea") + col("__eb") - col("__eu") - ovl)
              .cast("double") / greatest(ovl, lit(1L)),
              0.05).as("overlap_err_bound"))
      },
      """WITH s AS (SELECT doc_id % 2 = 0 AS in_a,
                  list_filter(string_split_regex(lower(text), '\W+'),
                              x -> x <> '') AS t
           FROM documents),
         g AS (SELECT in_a, array_to_string(t[i:i+2], ' ') AS g
               FROM s, unnest(generate_series(1, greatest(len(t) - 2, 1)))
                 AS u(i)
               WHERE len(t) > 0)
         SELECT CAST(count(DISTINCT CASE WHEN in_a THEN g END) AS BIGINT)
                  AS n_a,
                CAST(count(DISTINCT CASE WHEN NOT in_a THEN g END) AS BIGINT)
                  AS n_b,
                CAST(count(DISTINCT g) AS BIGINT) AS n_union,
                CAST(count(DISTINCT CASE WHEN in_a THEN g END)
                     + count(DISTINCT CASE WHEN NOT in_a THEN g END)
                     - count(DISTINCT g) AS BIGINT) AS n_overlap,
                CAST(0.05 AS DOUBLE) AS overlap_err_bound
         FROM g"""),

    // approximation CONTRACTS for the ap01 sketches, strict-oracled: the
    // same HLL++ and quantile sketches re-run next to their exact
    // counterparts, emitting per-group error-bound gates (the s02/s03
    // recall-gate mechanics): each bound column equals its contract
    // constant iff the sketch's relative error stays inside it (measured
    // at sf0.01: HLL 0.0265 vs 0.05 bound; p50 0.0016 vs 0.01 bound —
    // sketches are deterministic for fixed input, so the gate is exact).
    // Lives NEXT TO ap01 rather than replacing it: ap01 pins the
    // sketch-only plan (no Expand), this query deliberately pays the
    // exact-distinct pass to measure the error (its own aggregation,
    // joined back on the group key — see the ap01 split note).
    "ap02_approx_bounds" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val relerrCd = abs(col("__acd") - col("n_parts")).cast("double") / col("n_parts")
        val relerrP50 = abs(col("__p50a") - col("__p50e")) / col("__p50e")
        val li = s.read.parquet(s"$dir/lineitem.parquet")
        // split like ap01: fused with count(DISTINCT), the partial agg
        // keys on (l_returnflag, l_partkey) and builds the quantile
        // sketch + exact-percentile buffer once per (flag, partkey)
        // group; two lean passes joined on the 3-value key compute the
        // identical error gates
        val sketch = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey")).as("__acd"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("__p50a"),
            expr("percentile(l_extendedprice, 0.5)").as("__p50e"))
        val exact = li.groupBy(col("l_returnflag"))
          .agg(count_distinct(col("l_partkey")).as("n_parts"))
        sketch.join(exact, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n_parts"),
            when(relerrCd <= 0.05, lit(0.05)).otherwise(relerrCd).as("cd_err_bound"),
            when(relerrP50 <= 0.01, lit(0.01)).otherwise(relerrP50).as("p50_err_bound"))
          .orderBy(col("l_returnflag"))
      },
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
                CAST(0.05 AS DOUBLE) AS cd_err_bound, CAST(0.01 AS DOUBLE) AS p50_err_bound
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // grouping sets via ROLLUP
    "r01_rollup" -> multi(Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST"""),

    // exact count-distinct per group
    "cd01_count_distinct" -> multi(Seq("lineitem"),
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
                count(DISTINCT l_partkey) AS n_part
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // group by computed expressions
    "g01_groupby_expr" -> multi(Seq("orders"),
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                CAST(month(o_orderdate) AS BIGINT) AS m, count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sp
         FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
         ORDER BY y, m"""),

    // event-time tumbling-window aggregation (batch form; the streaming
    // variant lives in graft.streaming.Events). Events.readRaw yields
    // unit-normalized epoch-MICROS longs whatever the fixture's parquet
    // logical type; truncate to the hour in epoch-micros space. The
    // bucket is compared as BIGINT epoch micros (a timestamp column
    // would round-trip as a different parquet unit than DuckDB emits, a
    // representation gap the hash would reject).
    "e01_events_window" -> ((
      (s: SparkSession, dir: String) => {
        Registry.registerAll(s)
        graft.streaming.Events.readRaw(s, dir).createOrReplaceTempView("events")
        s.sql(
          s"""SELECT h, event_type, count(*) AS n,
                    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
             FROM (SELECT ts - ts % ${graft.streaming.Events.MicrosPerHour} AS h,
                          event_type, value
                   FROM events) e
             GROUP BY h, event_type ORDER BY h, event_type""")
      },
      Some(hourlyOracle)): (QFn, Option[String])),

    // watermarked tumbling-window aggregation under the driver oracle:
    // the events corpus replayed through readStream -> window(1 hour)
    // groupBy -> COMPLETE output mode -> memory sink. Complete mode
    // re-emits the full aggregate state each batch, so the final table
    // equals the batch hourly rollup without the append-mode tail
    // problem (the last open windows never cross the watermark on a
    // finite replay and append would drop them). Shares e01's oracle.
    "st03_stream_hourly" -> api(
      (outer, dir) => {
        val s = outer.newSession()   // state partitions sized to key count
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val out = graft.streaming.Events.streamingHourlyTypeCounts(
          graft.streaming.Events.readStream(s, dir))
        val sink = "st03_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .select(unix_micros(col("h")).as("h"), col("event_type"),
            col("n"), col("sv").cast("double").as("sv"))
          .orderBy(col("h"), col("event_type"))
      },
      hourlyOracle),

    // Streaming top-k: the hottest 3 event types per hourly window over
    // a watermarked streaming aggregation. The per-window rank runs in
    // the SINK rollup (here: on the memory-sink table; in production,
    // the same 3-line rollup inside foreachBatch per trigger) — ranking
    // inside the streaming agg itself is impossible in append mode
    // because a window's ranks are unstable until the watermark closes
    // it. State is the windowed counts only (windows × types), the
    // rank never shuffles more than the closed-window rollup.
    "st14_stream_topk" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val out = graft.streaming.Events.streamingHourlyTypeCounts(
          graft.streaming.Events.readStream(s, dir))
        val sink = "st14_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("h")).orderBy(col("n").desc, col("event_type"))
        s.table(sink)
          .select(unix_micros(col("h")).as("h"), col("event_type"), col("n"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .orderBy(col("h"), col("rn"))
      },
      """WITH h AS (SELECT epoch_us(date_trunc('hour', ts)) AS h,
                           event_type, count(*) AS n
                    FROM events GROUP BY 1, 2),
         r AS (SELECT h, event_type, n,
                 CAST(row_number() OVER (PARTITION BY h
                   ORDER BY n DESC, event_type) AS BIGINT) AS rn FROM h)
         SELECT h, event_type, n, rn FROM r WHERE rn <= 3
         ORDER BY h, rn"""),

    // Streaming EXACT distinct users per hour: Spark forbids chained
    // streaming aggregations, so the distinct goes through the
    // stateful dropDuplicates operator (state = one (hour, user) key
    // per active pair) feeding ONE windowless keyed count — the
    // dedup→agg chain Structured Streaming does support. For unbounded
    // production streams swap in dropDuplicatesWithinWatermark so the
    // pair state ages out with the watermark (st13 demonstrates that
    // operator); the replay harness runs the exact forever-state form.
    "st15_stream_hourly_users" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val agg = graft.streaming.Events.readStream(s, dir)
          .withColumn("h", date_trunc("hour", col("ts").cast("timestamp")))
          .select(col("h"), col("user_id"))
          .dropDuplicates("h", "user_id")
          .groupBy(col("h")).agg(count(lit(1)).as("nu"))
        val sink = "st15_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = agg.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .select(unix_micros(col("h")).as("h"), col("nu"))
          .orderBy(col("h"))
      },
      """SELECT epoch_us(date_trunc('hour', ts)) AS h,
                CAST(count(DISTINCT user_id) AS BIGINT) AS nu
         FROM events GROUP BY 1 ORDER BY h"""),

    // Streaming conversion funnel (view → click → purchase) with
    // strictly-increasing stage times in per-user keyed state — the
    // live-marketing view of e04's batch session funnel. Three longs of
    // state per user; the oracle derives the same stage times as a
    // chained min(ts > prev) per user.
    // NOTE: batch-oracle equivalence relies on the replay harness
    // delivering files in event-time order. The processor's state is
    // forward-only: a stage-1 event arriving in a LATER micro-batch
    // than a timestamp-later stage-2 event would miss the conversion
    // the batch oracle counts. The single-file AvailableNow replay
    // used here is event-time monotonic per user by construction; a
    // production deployment with out-of-order arrivals would buffer
    // one watermark interval of unmatched earlier-stage events.
    "st16_stream_funnel" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val out = graft.streaming.Events.streamingFunnel(
          graft.streaming.Events.readStream(s, dir),
          Seq("view", "click", "purchase"))
        val sink = "st16_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink).orderBy(col("user_id"))
      },
      """WITH t1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
                     WHERE event_type = 'view' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
                FROM events e JOIN t1 ON t1.user_id = e.user_id
                WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
                GROUP BY 1),
         t3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
                FROM events e JOIN t2 ON t2.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
                GROUP BY 1)
         SELECT u.user_id,
                CAST(CASE WHEN t1.t1 IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS reached_1,
                CAST(CASE WHEN t2.t2 IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS reached_2,
                CAST(CASE WHEN t3.t3 IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS reached_3
         FROM (SELECT DISTINCT user_id FROM events) u
         LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
         LEFT JOIN t3 USING (user_id)
         ORDER BY user_id"""),

    // semi-structured JSON processing over the events props column
    "e03_events_json" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.streaming.Events.read(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sk"),
            min(col("k")).as("mn"), max(col("k")).as("mx"))
          .orderBy(col("event_type"))
      },
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sk,
                min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS mn,
                max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS mx
         FROM events GROUP BY event_type ORDER BY event_type"""),

    // gap-based sessionization (batch form; streaming variant in
    // graft.streaming.Events)
    "e02_sessionize" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.streaming.Events.sessionize(graft.streaming.Events.read(s, dir), 30)
          .select(col("user_id"), col("event_id"), col("session_seq"))
          .orderBy(col("user_id"), col("event_id"))
      },
      sessionizeOracle),

    // REAL Structured Streaming in the driver surface: the events corpus
    // replayed through readStream (parquet file source) -> the stateful
    // flatMapGroupsWithState sessionizer -> AvailableNow trigger ->
    // memory sink. A finite input replayed this way agrees exactly with
    // the batch sessionize (within-batch (ts, event_id) sort + carried
    // keyed state), so the query shares e02's strict oracle — the
    // streaming family's end-to-end correctness row. Cross-micro-batch
    // state continuity needs controllable batch boundaries and stays
    // spec-tested (StreamingSpec batch-replay equivalence).
    "st01_stream_sessionize" -> api(
      (outer, dir) => {
        val s = outer.newSession()   // state partitions sized to key count
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val out = graft.streaming.Events.streamingSessionize(
          graft.streaming.Events.readStream(s, dir), 30)
        val sink = "st01_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .select(col("user_id"), col("event_id"), col("session_seq"))
          .orderBy(col("user_id"), col("event_id"))
      },
      sessionizeOracle),

    // NATIVE session windows on the stream (st25): session_window() —
    // the dynamic-gap window whose state MERGES adjacent sessions as
    // events arrive, the third streaming-session machinery beside st01's
    // explicit flatMapGroupsWithState and e02's batch gap-and-islands.
    // Append mode emits each (user, session) exactly once, CLOSED —
    // watermark past session end (last event + gap) — so the oracle is
    // the batch gap-sessionization with the same strict boundary.
    "st25_session_window" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val ev = graft.streaming.Events.readStream(s, dir)
          .withColumn("ts", col("ts").cast("timestamp"))
        val out = ev.withWatermark("ts", "1 day")
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("ws"),
            unix_micros(col("session_window.end")).as("we"), col("n"))
        val sink = "st25_sink_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink).orderBy(col("user_id"), col("ws"))
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
         o AS (SELECT user_id, tus,
                      lag(tus) OVER (PARTITION BY user_id ORDER BY tus)
                        AS prev
               FROM e),
         s1 AS (SELECT user_id, tus,
                       CASE WHEN prev IS NULL OR tus - prev > 1800000000
                            THEN 1 ELSE 0 END AS brk
                FROM o),
         s2 AS (SELECT user_id, tus,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM s1),
         g AS (SELECT user_id, sid, min(tus) AS ws,
                      max(tus) + 1800000000 AS we, count(*) AS n
               FROM s2 GROUP BY 1, 2),
         mx AS (SELECT max(tus) AS t1 FROM e)
         SELECT user_id, ws, we, CAST(n AS BIGINT) AS n
         FROM g, mx WHERE we < t1 - 86400000000
         ORDER BY user_id, ws"""),

    // transformWithState + RocksDB state store in the driver surface:
    // streaming exact-dedup verdicts over a replayed document stream
    // with exact duplicates planted in-stream (docs 0-49 re-arrive as
    // ids +100000). Within-batch the processor awards ownership to the
    // LOWEST doc id per content digest (arrival-order independent), so
    // the verdict relation is SQL-expressible: owner = min(doc_id) over
    // the content group — a strict oracle for the v2 arbitrary-state
    // path. State store conf is set/restored around the run.
    "st02_stream_dedup_owners" -> api(
      (outer, dir) => {
        // child session: RocksDB provider + right-sized state partitions
        // stay scoped to this query, nothing to save/restore
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        Registry.registerAll(s)
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        val docs = s.readStream.schema(schema)
          .parquet(graft.streaming.Replay.linkDir(s"$dir/documents.parquet"))
          .select(col("doc_id"), col("text"))
        val planted = docs.unionByName(
          docs.filter(col("doc_id") < 50)
            .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
        val out = graft.streaming.Events.streamingDedupOwners(planted, "doc_id", "text")
        val sink = "st02_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .select(col("doc_id"), col("owner_id"), col("is_dup"))
          .orderBy(col("doc_id"))
      },
      """WITH u AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000 AS doc_id, text FROM documents
           WHERE doc_id < 50)
         SELECT doc_id,
                min(doc_id) OVER (PARTITION BY text) AS owner_id,
                doc_id <> min(doc_id) OVER (PARTITION BY text) AS is_dup
         FROM u ORDER BY doc_id"""),

    // as-of join (reference has no joins at all; this is the classic
    // "operator Spark lacks" composed scale-correctly as union + one
    // keyed window — graft.ops.AsOf). Oracle: DuckDB's native ASOF JOIN.
    "a01_asof_join" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val ev = graft.streaming.Events.read(s, dir)
        graft.ops.AsOf.join(ev, ev, keyCol = "user_id",
            leftTimeCol = "ts", rightTimeCol = "ts",
            valueCols = Seq("event_id", "value"), rightIdCol = "event_id",
            strict = true)
          .select(col("event_id"), col("user_id"),
            col("asof_event_id"), col("asof_value"))
          .orderBy(col("event_id"))
      },
      """SELECT e.event_id, e.user_id,
                e2.event_id AS asof_event_id, e2.value AS asof_value
         FROM events e ASOF LEFT JOIN events e2
           ON e.user_id = e2.user_id AND e.ts > e2.ts
         ORDER BY e.event_id"""),

    // nearest-direction as-of join (merge_asof direction='nearest'):
    // closest other event of the same user in EITHER direction within
    // 45 minutes, ties to the earlier match. Two keyed window passes
    // (AsOf.nearestJoin — backward payload rides through the forward
    // union), vs the oracle's two ASOF joins + CASE choose. Right-side
    // times are unique per user (st11's probed invariant), so both
    // engines pick identical candidates.
    "a04_asof_nearest" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val ev = graft.streaming.Events.read(s, dir)
        graft.ops.AsOf.nearestJoin(ev, ev, keyCol = "user_id",
            leftTimeCol = "ts", rightTimeCol = "ts",
            valueCols = Seq("event_id", "value"), rightIdCol = "event_id",
            strict = true, tolerance = Some(expr("INTERVAL '45' MINUTE")))
          .select(col("event_id"), col("user_id"),
            col("asof_event_id"), col("asof_value"))
          .orderBy(col("event_id"))
      },
      """WITH b AS (SELECT e.event_id, e2.ts AS bt, e2.event_id AS bid,
                           e2.value AS bv
                    FROM events e ASOF LEFT JOIN events e2
                      ON e.user_id = e2.user_id AND e.ts > e2.ts),
         f AS (SELECT e.event_id, e2.ts AS ft, e2.event_id AS fid,
                      e2.value AS fv
               FROM events e ASOF LEFT JOIN events e2
                 ON e.user_id = e2.user_id AND e.ts < e2.ts),
         j AS (SELECT e.event_id, e.user_id,
                      bt, bid, bv, ft, fid, fv,
                      (bt IS NOT NULL
                       AND e.ts - bt <= INTERVAL 45 MINUTE) AS b_ok,
                      (ft IS NOT NULL
                       AND ft - e.ts <= INTERVAL 45 MINUTE) AS f_ok,
                      e.ts AS lts
               FROM events e
               JOIN b ON b.event_id = e.event_id
               JOIN f ON f.event_id = e.event_id)
         SELECT event_id, user_id,
                CASE WHEN b_ok AND (NOT f_ok OR lts - bt <= ft - lts)
                     THEN bid WHEN f_ok THEN fid END AS asof_event_id,
                CASE WHEN b_ok AND (NOT f_ok OR lts - bt <= ft - lts)
                     THEN bv WHEN f_ok THEN fv END AS asof_value
         FROM j ORDER BY event_id"""),

    // forward as-of join with a match tolerance (pandas merge_asof
    // semantics: nearest later event within 30 minutes, else null) —
    // same union + keyed-window formulation, timeline walked descending
    "a02_asof_forward" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val ev = graft.streaming.Events.read(s, dir)
        graft.ops.AsOf.join(ev, ev, keyCol = "user_id",
            leftTimeCol = "ts", rightTimeCol = "ts",
            valueCols = Seq("event_id", "value"), rightIdCol = "event_id",
            strict = true, direction = "forward",
            tolerance = Some(expr("INTERVAL '30' MINUTE")))
          .select(col("event_id"), col("user_id"),
            col("asof_event_id"), col("asof_value"))
          .orderBy(col("event_id"))
      },
      """SELECT e.event_id, e.user_id,
                CASE WHEN e2.ts - e.ts <= INTERVAL 30 MINUTE THEN e2.event_id END AS asof_event_id,
                CASE WHEN e2.ts - e.ts <= INTERVAL 30 MINUTE THEN e2.value END AS asof_value
         FROM events e ASOF LEFT JOIN events e2
           ON e.user_id = e2.user_id AND e.ts < e2.ts
         ORDER BY e.event_id"""),

    // ASOF JOIN at the SQL surface (graft.sql.AsOfSql): the statement
    // text below IS the oracle — DuckDB parses ASOF natively, our
    // dialect translates it onto the AsOf union + keyed-window plan
    // (rank-free, pinned in PlanSpec/AsOfSqlSpec). Backward strict,
    // LEFT: each event's previous event of the same user.
    "a05_asof_sql" -> same("events",
      """SELECT e.event_id, e.user_id,
                e2.event_id AS prev_event_id, e2.value AS prev_value
         FROM events e ASOF LEFT JOIN events e2
           ON e.user_id = e2.user_id AND e.ts > e2.ts
         ORDER BY e.event_id"""),

    // distinct-table SQL as-of (events ⋈ orders on user/custkey),
    // default INNER join type, non-strict >=. Orders tie on (custkey,
    // orderdate) in this corpus, so the select list carries only the
    // tie-invariant matched TIME — both engines agree regardless of
    // which tied row they pick (probed invariant, AsOfSqlSpec).
    "a06_asof_sql_tables" -> multiSession(Seq("events", "orders"),
      """SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
         FROM events e ASOF JOIN orders o
           ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
         ORDER BY e.event_id"""),

    // composite-key SQL as-of (user_id AND event_type), forward strict:
    // the next event of the same user AND type. The translator packs the
    // two equality conjuncts into one struct shuffle key.
    "a07_asof_sql_multikey" -> same("events",
      """SELECT e.event_id, e.user_id, e.event_type,
                e2.event_id AS next_same_type
         FROM events e ASOF LEFT JOIN events e2
           ON e.user_id = e2.user_id AND e.event_type = e2.event_type
              AND e.ts < e2.ts
         ORDER BY e.event_id"""),

    // derived-table SQL as-of: the right operand is a parenthesized
    // SELECT (high-value orders only), resolved through the translator's
    // subquery path and lowered onto the SAME union + keyed-window plan.
    // Ties on (custkey, orderdate) are tie-invariant in the select list
    // (matched time only), as in a06.
    "a08_asof_sql_derived" -> multiSession(Seq("events", "orders"),
      """SELECT e.event_id, e.user_id, o.o_orderdate AS last_big_order
         FROM events e ASOF LEFT JOIN
           (SELECT o_custkey, o_orderdate FROM orders
            WHERE o_totalprice > 150000) o
           ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
         ORDER BY e.event_id"""),

    // snapshot diff (Cdc.diff): the insert/update/delete changelog
    // between two keyed snapshots — ONE full-outer key join + map-side
    // null-safe struct compare; output tracks change volume, not table
    // size. after = before minus %17 keys, +10 cents on %5 keys, plus
    // re-keyed inserts from %50 keys.
    "u07_snapshot_diff" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val base = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"),
            col("o_orderstatus"))
        val after = base.filter(col("o_orderkey") % 17 =!= 0)
          .withColumn("cents", when(col("o_orderkey") % 5 === 0,
            col("cents") + 10L).otherwise(col("cents")))
          .unionByName(base.filter(col("o_orderkey") % 50 === 0)
            .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
              col("cents"), col("o_orderstatus")))
        graft.ops.Cdc.diff(base, after, Seq("o_orderkey"),
            Seq("cents", "o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      """WITH b AS (SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  o_orderstatus FROM orders),
         a AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 5 = 0 THEN cents + 10
                           ELSE cents END AS cents,
                      o_orderstatus
               FROM b WHERE o_orderkey % 17 <> 0
               UNION ALL
               SELECT o_orderkey + 10000000, cents, o_orderstatus
               FROM b WHERE o_orderkey % 50 = 0)
         SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
                CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                     WHEN a.o_orderkey IS NULL THEN 'delete'
                     ELSE 'update' END AS op,
                a.cents, a.o_orderstatus
         FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey
         WHERE b.o_orderkey IS NULL OR a.o_orderkey IS NULL
            OR b.cents <> a.cents OR b.o_orderstatus <> a.o_orderstatus
         ORDER BY o_orderkey"""),

    // STREAM-STREAM interval join (attribution: purchases within 30 min
    // of a view, per user). Both sides watermarked; the range condition
    // lets Spark evict buffered state once the other side's watermark
    // passes — the only join shape that runs unboundedly. Inner rows
    // emit as both sides arrive; the batch join is the exact oracle.
    "st18_stream_interval_join" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val ev = graft.streaming.Events.readStream(s, dir)
          .withColumn("ts", col("ts").cast("timestamp"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user_id"),
            col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        val out = graft.streaming.Events.streamingIntervalJoin(
          views, buys, "user_id", "p_user_id", "view_ts", "p_ts",
          windowSeconds = 1800L)
        val sink = "st18_sink_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.select(col("view_id"), col("purchase_id"), col("user_id"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink).orderBy(col("view_id"), col("purchase_id"))
      },
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id
         FROM events v JOIN events p
           ON v.user_id = p.user_id
          AND v.event_type = 'view' AND p.event_type = 'purchase'
          AND epoch_us(p.ts) >= epoch_us(v.ts)
          AND epoch_us(p.ts) <= epoch_us(v.ts) + 1800000000
         ORDER BY view_id, purchase_id"""),

    // ASOF JOIN with DuckDB's USING shorthand — (user_id, ts) desugars
    // to user_id equality + ts >= ordering — against a derived purchase
    // table: the most recent purchase at-or-before each event. A
    // purchase event matches itself (>= includes the same instant), as
    // in DuckDB.
    "a09_asof_sql_using" -> multiSession(Seq("events"),
      """SELECT e.event_id, e.user_id, p.event_id AS last_purchase_id
         FROM events e ASOF LEFT JOIN
           (SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'purchase') p
           USING (user_id, ts)
         ORDER BY e.event_id"""),

    // streaming geo enrichment with ZERO per-probe state: the site
    // catalog (per-cell candidate arrays from the 3x3 announcement) is
    // a broadcast static side; each event's nearest site resolves
    // MAP-SIDE via a codegen'd higher-order argmin over its cell's
    // array — no stream-stream join, no per-event state, the only
    // stateful operator is the final site-keyed count whose key space
    // is the (bounded) site catalog. Semantics match geo01 exactly;
    // the oracle replays the batch assignment + rollup.
    "st20_stream_geo_enrich" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val sixt = lit(0.0625)
        val catalog = graft.ops.Geo.siteCatalog(
          geoGridSuppliers(s, dir), "s_suppkey", "slat", "slon",
          boxDeg = 0.5)
        val ev = graft.streaming.Events.readStream(s, dir)
          .select(col("event_id"),
            ((col("user_id") % 320).cast("double") * sixt).as("plat"),
            (((col("user_id") * 7) % 320).cast("double") * sixt).as("plon"))
        val out = graft.ops.Geo.nearestByCatalog(
            ev, "plat", "plon", catalog, boxDeg = 0.5,
            keyOut = "site", distCol = "d2",
            metric = graft.ops.Geo.planarSq)
          .groupBy(col("site"))
          .agg(count(lit(1)).as("n"))
        val sink = "st20_sink_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink).orderBy(col("site"))
      },
      """WITH e AS (SELECT event_id,
                  (user_id % 320) * CAST(0.0625 AS DOUBLE) AS plat,
                  ((user_id * 7) % 320) * CAST(0.0625 AS DOUBLE) AS plon
           FROM events),
         s AS (SELECT s_suppkey,
                  ((s_suppkey * 11) % 320) * CAST(0.0625 AS DOUBLE) AS slat,
                  ((s_suppkey * 13) % 320) * CAST(0.0625 AS DOUBLE) AS slon
           FROM supplier),
         j AS (SELECT e.event_id, s.s_suppkey,
                  row_number() OVER (PARTITION BY e.event_id ORDER BY
                    (e.plat - s.slat) * (e.plat - s.slat)
                      + (e.plon - s.slon) * (e.plon - s.slon),
                    s.s_suppkey) AS rn
           FROM e JOIN s
             ON abs(e.plat - s.slat) < 0.5 AND abs(e.plon - s.slon) < 0.5)
         SELECT s_suppkey AS site, count(*) AS n
         FROM j WHERE rn = 1 GROUP BY 1 ORDER BY site"""),

    // LEFT-OUTER stream-stream interval join: views with no purchase in
    // the window surface with nulls — but only once the watermark PROVES
    // no match can still arrive (view_ts + window below the global
    // watermark = min(max view ts, max purchase ts) − delay); newer
    // unmatched views never emit on a finite replay. The oracle encodes
    // that emission boundary exactly (the st04 discipline). Single-file
    // feed → one batch → the 2h delay needs no disorder headroom.
    "st19_stream_left_outer_join" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val ev = graft.streaming.Events.readStream(s, dir)
          .withColumn("ts", col("ts").cast("timestamp"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user_id"),
            col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        val out = graft.streaming.Events.streamingIntervalJoin(
          views, buys, "user_id", "p_user_id", "view_ts", "p_ts",
          windowSeconds = 1800L, watermark = "2 hours",
          joinType = "left_outer")
        val sink = "st19_sink_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.select(col("view_id"), col("user_id"), col("purchase_id"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .orderBy(col("view_id"), col("purchase_id").asc_nulls_last)
      },
      """WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS vts
                    FROM events WHERE event_type = 'view'),
         p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
               FROM events WHERE event_type = 'purchase'),
         m AS (SELECT v.view_id, v.user_id, p.purchase_id
               FROM v JOIN p ON v.user_id = p.user_id
                AND p.pts >= v.vts AND p.pts <= v.vts + 1800000000),
         wm AS (SELECT least((SELECT max(vts) FROM v),
                             (SELECT max(pts) FROM p))
                       - 7200000000 AS w)
         SELECT view_id, user_id, purchase_id FROM m
         UNION ALL
         SELECT v.view_id, v.user_id, NULL AS purchase_id
         FROM v, wm
         WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.view_id = v.view_id)
           AND v.vts + 1800000000 < wm.w
         ORDER BY view_id, purchase_id NULLS LAST"""),

    // STREAMING ASOF enrichment (Events.streamingAsOfEnrich): last-touch
    // attribution — each purchase picks the LATEST view of the same user
    // within the prior 30 minutes, as two live streams. st18's interval
    // join chained into a windowed max(struct) argmax (two stateful
    // operators); an enriched purchase EMITS once the global watermark
    // MINUS THE HORIZON strictly passes its 1h tumbling window end: the
    // interval join's time-range condition delays the event-time column
    // the downstream agg sees by horizonSeconds, so the effective
    // boundary is wm − 1800s, not wm (review-caught; empirically pinned
    // at exact equality by StreamingAsOfSpec)
    // — the oracle encodes that boundary exactly (st19 discipline).
    // Purchases with no prior view never enter the inner join (strict
    // ASOF). Single-file feed → one batch → no disorder headroom needed.
    "st21_stream_asof_enrich" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val ev = graft.streaming.Events.readStream(s, dir)
          .withColumn("ts", col("ts").cast("timestamp"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user_id"),
            col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        val out = graft.streaming.Events.streamingAsOfEnrich(
          views, buys, "user_id", "p_user_id", "view_ts", "p_ts",
          probeIdCol = "purchase_id", quotePayload = Seq("view_id"),
          horizonSeconds = 1800L, windowDuration = "1 hour",
          watermark = "2 hours")
        val sink = "st21_sink_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.select(col("purchase_id"),
            col("p_user_id").as("user_id"),
            col("view_id").as("last_view_id"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink).orderBy(col("purchase_id"))
      },
      """WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS vts
                    FROM events WHERE event_type = 'view'),
         p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
               FROM events WHERE event_type = 'purchase'),
         m AS (SELECT p.purchase_id, p.user_id, p.pts, v.view_id,
                      row_number() OVER (PARTITION BY p.purchase_id
                        ORDER BY v.vts DESC, v.view_id DESC) AS rn
               FROM p JOIN v ON v.user_id = p.user_id
                AND v.vts <= p.pts AND v.vts + 1800000000 >= p.pts),
         wm AS (SELECT least((SELECT max(vts) FROM v),
                             (SELECT max(pts) FROM p))
                       - 7200000000 AS w)
         SELECT purchase_id, user_id, view_id AS last_view_id
         FROM m, wm
         WHERE rn = 1
           AND (pts // 3600000000 + 1) * 3600000000
                 < wm.w - 1800000000
         ORDER BY purchase_id"""),

    // STREAMING drift monitor (Events.streamingDriftPsi, st22): per
    // 3-day tumbling window, the PSI of live `value` traffic against the
    // first week's histogram (the "training slice", 8 fixed-width
    // buckets collected batch-side — the bounded centroids discipline).
    // ONE windowed agg with the histogram as conditional sums, so state
    // is one row per OPEN window; PSI folds map-side against the
    // broadcast-literal reference with Profile.psi's ε-clamped chain.
    // Emission strictly below the final watermark (st21 boundary); the
    // oracle replays windows, reference and chain verbatim.
    "st22_stream_drift_psi" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val E = graft.streaming.Events
        val batch = E.readRaw(s, dir).select(col("ts"), col("value"))
          .filter(col("value").isNotNull)
        val t0 = batch.agg(min(col("ts"))).head.getLong(0)
        val bucket = least(greatest(
          floor(col("value") / 25.0).cast("long"), lit(0L)), lit(7L))
        val refRows = batch
          .filter(col("ts") < t0 + 7L * 86400000000L)
          .groupBy(bucket.as("b")).agg(count(lit(1)).as("c"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val ref = (0 until 8).map(i => refRows.getOrElse(i.toLong, 0L))
        val ev = E.readStream(s, dir)
          .withColumn("ts", col("ts").cast("timestamp"))
        val out = E.streamingDriftPsi(ev, "value", "ts", ref,
          lo = 0.0, width = 25.0, windowDuration = "3 days",
          watermark = "1 day")
        val sink = "st22_sink_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.select(unix_micros(col("window_start")).as("ws"),
            col("n_cur"), col("psi"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink).orderBy(col("ws"))
      },
      """WITH e AS (SELECT epoch_us(ts) AS tus, value FROM events
                    WHERE value IS NOT NULL),
         mn AS (SELECT min(tus) AS t0, max(tus) AS t1 FROM e),
         b AS (SELECT tus,
                 least(greatest(CAST(floor(value / 25.0) AS BIGINT), 0), 7)
                   AS b
               FROM e),
         ref AS (SELECT b.b, count(*) AS c FROM b, mn
                 WHERE tus < mn.t0 + 7 * 86400000000 GROUP BY b.b),
         rt AS (SELECT sum(c) AS tot FROM ref),
         rp AS (SELECT i.i AS b,
                  greatest(CAST(coalesce(r.c, 0) AS DOUBLE)
                           / (SELECT tot FROM rt), 1e-6) AS pa
                FROM unnest(generate_series(0, 7)) AS i(i)
                LEFT JOIN ref r ON r.b = i.i),
         h AS (SELECT (tus // 259200000000) * 259200000000 AS ws,
                 count(*) AS n_cur,
                 sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS c0,
                 sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS c1,
                 sum(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS c2,
                 sum(CASE WHEN b = 3 THEN 1 ELSE 0 END) AS c3,
                 sum(CASE WHEN b = 4 THEN 1 ELSE 0 END) AS c4,
                 sum(CASE WHEN b = 5 THEN 1 ELSE 0 END) AS c5,
                 sum(CASE WHEN b = 6 THEN 1 ELSE 0 END) AS c6,
                 sum(CASE WHEN b = 7 THEN 1 ELSE 0 END) AS c7
               FROM b GROUP BY 1),
         p AS (SELECT ws, n_cur,
                 (SELECT pa FROM rp WHERE b = 0) AS a0,
                 (SELECT pa FROM rp WHERE b = 1) AS a1,
                 (SELECT pa FROM rp WHERE b = 2) AS a2,
                 (SELECT pa FROM rp WHERE b = 3) AS a3,
                 (SELECT pa FROM rp WHERE b = 4) AS a4,
                 (SELECT pa FROM rp WHERE b = 5) AS a5,
                 (SELECT pa FROM rp WHERE b = 6) AS a6,
                 (SELECT pa FROM rp WHERE b = 7) AS a7,
                 greatest(CAST(c0 AS DOUBLE) / n_cur, 1e-6) AS b0,
                 greatest(CAST(c1 AS DOUBLE) / n_cur, 1e-6) AS b1,
                 greatest(CAST(c2 AS DOUBLE) / n_cur, 1e-6) AS b2,
                 greatest(CAST(c3 AS DOUBLE) / n_cur, 1e-6) AS b3,
                 greatest(CAST(c4 AS DOUBLE) / n_cur, 1e-6) AS b4,
                 greatest(CAST(c5 AS DOUBLE) / n_cur, 1e-6) AS b5,
                 greatest(CAST(c6 AS DOUBLE) / n_cur, 1e-6) AS b6,
                 greatest(CAST(c7 AS DOUBLE) / n_cur, 1e-6) AS b7
               FROM h)
         SELECT ws, n_cur,
                round((((((((
                  (a0 - b0) * ln(a0 / b0)
                  + (a1 - b1) * ln(a1 / b1))
                  + (a2 - b2) * ln(a2 / b2))
                  + (a3 - b3) * ln(a3 / b3))
                  + (a4 - b4) * ln(a4 / b4))
                  + (a5 - b5) * ln(a5 / b5))
                  + (a6 - b6) * ln(a6 / b6))
                  + (a7 - b7) * ln(a7 / b7)), 6) AS psi
         FROM p, mn
         WHERE ws + 259200000000 < mn.t1 - 86400000000
         ORDER BY ws"""),

    // streaming k-anonymity monitor (Events.streamingQuasiIdSizes,
    // st23): per CLOSED weekly window, the privacy card over
    // quasi-identifier (event_type, user_id bucket) group sizes —
    // k_actual, groups under the k=40 threshold, rows at risk. Append
    // emission means release gates only ever see FINAL group sizes;
    // state is one row per (open window, combo) — cardinality × open
    // windows, independent of event volume (st22's plateau one
    // dimension wider). The card itself is a batch rollup over the
    // sink's closed windows (pr21 arithmetic); oracle re-derives the
    // same windows under the strict end < maxTs − delay boundary.
    "st23_stream_k_anon" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val E = graft.streaming.Events
        val ev = E.readStream(s, dir)
          .withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ub", coalesce(col("user_id") % 10, lit(-1L)))
        val sizes = E.streamingQuasiIdSizes(ev, "ts",
          Seq("event_type", "ub"), "7 days", "1 day")
        val sink = "st23_sink_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        val q = sizes
          .select(unix_micros(col("window_start")).as("ws"),
            col("event_type"), col("ub"), col("n"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .groupBy(col("ws"))
          .agg(count(lit(1)).as("n_groups"),
            min(col("n")).as("k_actual"),
            sum(when(col("n") < 40, 1L).otherwise(0L)).as("n_violating"),
            sum(when(col("n") < 40, col("n")).otherwise(0L))
              .as("rows_at_risk"))
          .orderBy(col("ws"))
      },
      """WITH e AS (SELECT epoch_us(ts) AS tus, event_type,
                           coalesce(user_id % 10, -1) AS ub FROM events),
         mn AS (SELECT max(tus) AS t1 FROM e),
         g AS (SELECT (tus // 604800000000) * 604800000000 AS ws,
                      event_type, ub, count(*) AS n
               FROM e GROUP BY 1, 2, 3)
         SELECT ws, count(*) AS n_groups,
                CAST(min(n) AS BIGINT) AS k_actual,
                CAST(sum(CASE WHEN n < 40 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_violating,
                CAST(sum(CASE WHEN n < 40 THEN n ELSE 0 END) AS BIGINT)
                  AS rows_at_risk
         FROM g, mn
         WHERE ws + 604800000000 < mn.t1 - 86400000000
         GROUP BY ws, mn.t1 ORDER BY ws"""),

    // Streaming quality gate (Events.streamingQualityGate, st24): the
    // t28 classifier filter ON THE STREAM — per-event fastText-style
    // scoring over hashed-unigram buckets with the 256-bucket model
    // inlined as a literal map (map-only, zero scoring state), then per
    // CLOSED weekly window the doc/survivor counts and exact kept score
    // sums (append mode — the st23 contract: a release gate never sees
    // a partial window). Weights here are a fixed mixed-sign formula of
    // the bucket hex (ascii arithmetic), so the oracle re-derives them
    // INLINE per token; the kept test is the exact integer comparison
    // sum_fp > thr·n — no division anywhere.
    "st24_stream_quality_gate" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val E = graft.streaming.Events
        val ev = E.readStream(s, dir)
          .withColumn("ts", col("ts").cast("timestamp"))
        val gated = E.streamingQualityGate(ev, "ts", "props",
          E.demoQualityWeights,
          thresholdLogitFp = 0L, windowDuration = "7 days",
          watermark = "1 day")
        val sink = "st24_sink_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        val q = gated
          .select(unix_micros(col("window_start")).as("ws"),
            col("n_docs"), col("n_kept"), col("sum_fp_kept"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink).orderBy(col("ws"))
      },
      """WITH e AS (SELECT epoch_us(ts) AS tus,
                  list_filter(string_split_regex(lower(coalesce(props, '')), '\W+'),
                              x -> x <> '') AS toks
           FROM events),
         sc AS (SELECT tus, CAST(len(toks) AS BIGINT) AS n_toks,
                  CAST(coalesce(list_sum(list_transform(toks,
                    t -> (ascii(substr(md5(t), 1, 1)) * 256
                          + ascii(substr(md5(t), 2, 1)) - 19275) * 997)), 0)
                    AS BIGINT) AS sum_fp
                FROM e),
         k AS (SELECT (tus // 604800000000) * 604800000000 AS ws,
                      CASE WHEN n_toks > 0 AND sum_fp > 0
                           THEN 1 ELSE 0 END AS kept, sum_fp
               FROM sc),
         mn AS (SELECT max(tus) AS t1 FROM e)
         SELECT ws, count(*) AS n_docs, CAST(sum(kept) AS BIGINT) AS n_kept,
                CAST(sum(CASE WHEN kept = 1 THEN sum_fp ELSE 0 END)
                     AS BIGINT) AS sum_fp_kept
         FROM k, mn WHERE ws + 604800000000 < mn.t1 - 86400000000
         GROUP BY ws, mn.t1 ORDER BY ws"""),

    // ------------------------------------------------------------------
    // Training-data-pipeline operators (dedup / similarity / text /
    // multimodal) — graft.ops; first-class per the build brief.
    // ------------------------------------------------------------------

    // Winnowing fingerprint candidate pairs (d25 — the MOSS algorithm,
    // Schleimer et al. 2003): per-document rightmost-min-of-window gram
    // fingerprints (Dedup.winnowingFingerprints; the argmin tiebreak
    // rides ONE window pass via the hash||lpad(1e9-pos) key both
    // engines compare identically), over-common fingerprints dropped
    // (the paper's boilerplate rule, df-cap 64), then candidate pairs =
    // documents sharing >= 5 fingerprints. The w+k-1 shared-run
    // detection guarantee makes this the deterministic middle ground
    // between d01's exact hash and d02's probabilistic minhash.
    "d25_winnowing_pairs" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val fp = graft.ops.Dedup.winnowingFingerprints(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          k = 3, w = 4, maxDocFreq = Some(64))
        val sets = fp.select(col("doc_id"), col("h")).distinct()
        sets.as("a").join(sets.as("b"),
            col("a.h") === col("b.h") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 5)
          .orderBy(col("id_a"), col("id_b"))
      },
      """WITH s AS (SELECT doc_id,
                  list_filter(string_split_regex(lower(coalesce(text, '')), '\W+'),
                              x -> x <> '') AS toks
           FROM documents),
         g AS (SELECT doc_id, i AS pos,
                      CAST(('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')),
                                           1, 10)) AS BIGINT)
                        % 549755813888 AS h
               FROM s, unnest(generate_series(1, len(toks) - 2)) AS u(i)
               WHERE len(toks) >= 3),
         k1 AS (SELECT doc_id,
                  min(h * 16777216 + (16777216 - pos))
                    OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS key
                FROM g),
         fp0 AS (SELECT DISTINCT doc_id, key // 16777216 AS h FROM k1),
         hot AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS dfq
                                FROM fp0 GROUP BY h) WHERE dfq > 64),
         fp AS (SELECT doc_id, h FROM fp0
                WHERE h NOT IN (SELECT h FROM hot)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      count(*) AS shared
               FROM fp a JOIN fp b
                 ON a.h = b.h AND a.doc_id < b.doc_id
               GROUP BY 1, 2 HAVING count(*) >= 5)
         SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared
         FROM p ORDER BY id_a, id_b"""),

    // exact dedup groups: one hash shuffle on the content digest
    "d01_dedup_exact" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.exactGroups(
            s.read.parquet(s"$dir/documents.parquet"), "text", "doc_id")
          .orderBy(col("keep_id"))
      },
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
                count(*) AS n_dups
         FROM documents GROUP BY md5(text) ORDER BY keep_id"""),

    // MinHash+LSH near-dup pairs, strictly oracled on the PAIR SET. The
    // corpus similarity distribution is bimodal — planted near-dups at
    // 5-gram jaccard >= 0.875, every other pair <= 0.016 — so the
    // signature-estimate threshold 0.5 sits mid-gap: the banding
    // (64 hashes / 16 bands of 4) gives a j=0.875 pair candidate
    // probability 1 - 8e-7, the 64-hash estimate concentrates within
    // ±0.15 of true jaccard (binomial sd 0.04), and no sub-0.02 pair can
    // estimate anywhere near 0.5. The emitted pair set therefore equals
    // the oracle's exhaustive exact-jaccard enumeration — the green hash
    // IS the recall proof (d04 playbook). Estimate VALUES stay un-gated
    // (engine-specific); d04 gates exact jaccard values.
    "d02_minhash_pairs" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.minhashPairs(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            numHashes = 64, bands = 16, shingleK = 5, threshold = 0.5)
          .select(col("id_a"), col("id_b"))
          .orderBy(col("id_a"), col("id_b"))
      },
      s"""$fiveGramSets
         SELECT id_a, id_b FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
                    / len(list_distinct(a.shset || b.shset)) AS jaccard
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
         WHERE jaccard >= 0.5 ORDER BY id_a, id_b"""),

    // SimHash candidates (chunks=8 pigeonhole, hamming<=7) verified with
    // EXACT 5-gram jaccard at 0.9 — strictly oracled against the
    // exhaustive enumeration, so a green hash proves every true j>=0.9
    // pair had a simhash chunk collision (recall 1 at the gate
    // threshold). Thresholds are MEASURED, not assumed: the planted
    // pairs with j>=0.9 sit at hamming 0-7 (inside the guarantee) and
    // the one j=0.875 pair at hamming 8 falls below the 0.9 verify on
    // both engines, so it cannot diverge. The tempting chunks=16 (h<=12)
    // widening is a scale trap on this template-generated corpus —
    // 4-bit chunk keys bucket ~n/16 docs and unrelated docs crowd into
    // hamming 9-12, so candidates explode ~60x at sf0.1 (measured 66 s
    // vs 2 s). Hamming VALUES stay un-gated (fingerprints are
    // engine-specific); the pigeonhole contract is require()-enforced
    // and spec-tested. The 100 TB setting is chunks=4 (16-bit keys,
    // h<=3).
    "d03_simhash_pairs" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        // fingerprints materialize once (16 bytes/doc): both sides of the
        // chunk self-join read the checkpoint instead of re-running
        // tokenize+simhash over the corpus
        val fp = graft.ops.Dedup.simhashFingerprints(docs, "doc_id", "text")
          .localCheckpoint(true)
        val cand = graft.ops.Dedup.fingerprintPairs(fp, maxHamming = 7, chunks = 8)
          .select(col("id_a"), col("id_b"))
        // hashGrams: the verify tier compares WindowHashes longs instead
        // of 5-gram strings (jaccard identical modulo 64-bit collisions
        // — zero on this corpus, and the string-gram oracle re-checks
        // every value bitwise; the d14 hash≡string discipline)
        graft.ops.Dedup.ngramJaccard(docs, cand, "doc_id", "text",
            shingleK = 5, hashGrams = true)
          .filter(col("jaccard") >= 0.9)
          .orderBy(col("id_a"), col("id_b"))
      },
      s"""$fiveGramSets
         SELECT id_a, id_b, jaccard FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
                    / len(list_distinct(a.shset || b.shset)) AS jaccard
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
         WHERE jaccard >= 0.9 ORDER BY id_a, id_b"""),

    // exact n-gram Jaccard near-dup pairs at scale: LSH-banded candidates
    // -> exact verify (no within-block cartesian anywhere in the plan).
    // The oracle enumerates ALL pairs above the threshold exhaustively —
    // the banding (128 hashes / 32 bands) gives a j>=0.6 pair >=98.8%
    // candidate probability and the planted corpus near-dups sit at
    // j>=0.9 (hit probability 1 - 4e-16), so Spark's banded result must
    // equal the exhaustive set exactly.
    "d04_ngram_jaccard" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.nearDupJaccard(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            numHashes = 128, bands = 32, shingleK = 3, threshold = 0.6,
            hashGrams = true)
          .orderBy(col("id_a"), col("id_b"))
      },
      """WITH s AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                       ELSE list_distinct(list_transform(generate_series(1, len(toks)-2),
                                          i -> array_to_string(toks[i:i+2], ' '))) END AS shset
           FROM s)
         SELECT id_a, id_b, jaccard FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
                    / len(list_distinct(a.shset || b.shset)) AS jaccard
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
         WHERE jaccard >= 0.6 ORDER BY id_a, id_b"""),

    // embedding near-dup pairs via sign-bit LSH buckets + cosine verify,
    // strict-oracled through its RECALL contract vs the exhaustive d07
    // machinery run in the same plan (the s02 gate mechanics; promoted
    // out of no_oracle per r8 VERDICT #5): recall_floor equals the
    // contract constant iff |LSH pairs ∩ exact pairs| / |exact pairs|
    // >= floor, else the raw recall leaks out and hash-fails red. The
    // single 6-bit bucket is the cheap low-recall tier by design
    // (p(0.3)^6 ~ 0.05 per-pair); the floor pins that measured tier so a
    // silent recall regression (bucketing bug, seed drift) turns the row
    // red. embeddingPairsBanded/d08 is the recall~1 scale path.
    "d05_embed_neardup" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val lsh = graft.ops.Dedup.embeddingPairs(emb, "vec_id", "embedding",
            bits = 6, threshold = 0.3)
          .select(col("id_a"), col("id_b"), lit(1L).as("__hit"))
        val exact = graft.ops.Dedup.embeddingPairsExact(emb, "vec_id", "embedding",
            threshold = 0.3)
          .select(col("id_a"), col("id_b"))
        exact.join(lsh, Seq("id_a", "id_b"), "left")
          .agg(count(lit(1)).as("n_exact"),
            (sum(coalesce(col("__hit"), lit(0L))).cast("double")
              / count(lit(1))).as("__r"))
          .select(col("n_exact"),
            when(col("__r") >= 0.02, lit(0.02)).otherwise(col("__r"))
              .as("recall_floor"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings)
         SELECT CAST(count(*) AS BIGINT) AS n_exact,
                CAST(0.02 AS DOUBLE) AS recall_floor
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3"""),

    // global first-occurrence segment dedup (C4-style line dedup,
    // delimiter-generalized). The synthetic corpus is single-line, so the
    // driver query segments on ' ' — same machinery, non-degenerate input.
    // Full oracle including the every-segment-deduped -> '' documents.
    "d06_dedup_segments" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.dedupSegments(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            delim = " ")
          .orderBy(col("doc_id"))
      },
      """WITH seg AS (
           SELECT doc_id,
                  unnest(string_split(text, ' ')) AS seg,
                  generate_subscripts(string_split(text, ' '), 1) AS pos
           FROM documents),
         keep AS (
           SELECT doc_id, seg, pos,
                  row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
           FROM seg),
         agg AS (
           SELECT doc_id,
                  string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE rn = 1) AS text
           FROM keep GROUP BY doc_id)
         -- join back to documents so null-text docs (zero segments after
         -- unnest) surface as '' exactly like the Spark side's left join
         SELECT d.doc_id, coalesce(a.text, '') AS text
         FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""),

    // exact-substring dedup (Dedup.sharedRuns, d22): every MAXIMAL token
    // run of >= 15 tokens shared by two documents — the ExactSubstr
    // dedup family (verbatim copied passages regardless of context),
    // run relationally: length-15 window-hash anchors (numeric
    // shingling, 8-byte longs through the shuffle) -> one anchor-hash
    // equi-join -> gap-and-islands per (pair, diagonal) -> exact
    // token-slice verify confined to candidates (d03 discipline; a hash
    // collision drops its run and fails the strict oracle loudly). The
    // corpus adds mid-document verbatim excerpts (tokens 11-50 of every
    // 25th doc wrapped in fresh context) — the overlap shape d06's
    // segments and d21's chunks both miss, spec-pinned. The oracle
    // re-derives maximal runs from raw gram STRINGS with the same
    // diagonal construction, so hash-vs-string equivalence is
    // driver-checked (the d14 mold).
    "d22_exact_substr" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.sharedRuns(
            exactSubstrCorpus(s, dir), "doc_id", "text", minRun = 15)
          .orderBy(col("id_a"), col("id_b"), col("start_a"), col("start_b"))
      },
      s"""$exactSubstrCtes
         SELECT ia AS id_a, ib AS id_b, sa AS start_a, sb AS start_b,
                rl AS run_len
         FROM runs ORDER BY id_a, id_b, start_a, start_b"""),

    // exact-substring dedup ACTION (Dedup.removeSharedRuns, d23): cut
    // every d22 run from all but its lowest-id occurrence — the
    // ExactSubstr FIX step (train on each passage once). Overlapping
    // removal intervals per doc merge first (gaps-and-islands on a
    // running interval-end max), then one (id, pos) membership filter
    // against the doc's own tiny merged-interval list rebuilds the
    // token text; exact duplicates of an earlier doc empty out to ''.
    // Everything scales with SHARED content, never corpus²; the oracle
    // re-runs the identical interval algebra over the d22 CTE chain.
    "d23_remove_shared_runs" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.removeSharedRuns(
            exactSubstrCorpus(s, dir), "doc_id", "text", minRun = 15)
          .orderBy(col("doc_id"))
      },
      s"""$exactSubstrCtes,
         iv AS (SELECT DISTINCT ib AS id, sb AS st, sb + rl AS en
                FROM runs),
         isl0 AS (SELECT id, st, en,
                   coalesce(max(en) OVER (PARTITION BY id ORDER BY st, en
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), -1) AS pmax
                  FROM iv),
         isl AS (SELECT id, st, en,
                  sum(CASE WHEN st > pmax THEN 1 ELSE 0 END)
                    OVER (PARTITION BY id ORDER BY st, en
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS grp2
                 FROM isl0),
         mg AS (SELECT id, min(st) AS st, max(en) AS en
                FROM isl GROUP BY id, grp2),
         tok AS (SELECT doc_id, unnest(toks) AS tok,
                        generate_subscripts(toks, 1) AS i FROM s),
         keep AS (SELECT t.doc_id, t.tok, t.i FROM tok t
                  WHERE NOT EXISTS (SELECT 1 FROM mg
                                    WHERE mg.id = t.doc_id
                                      AND t.i - 1 >= mg.st
                                      AND t.i - 1 < mg.en)),
         reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text
                 FROM keep GROUP BY doc_id),
         rem AS (SELECT id, sum(en - st) AS nr FROM mg GROUP BY id)
         SELECT s.doc_id, coalesce(reb.text, '') AS text,
                CAST(coalesce(rem.nr, 0) AS BIGINT) AS n_removed
         FROM s LEFT JOIN reb USING (doc_id)
                LEFT JOIN rem ON rem.id = s.doc_id
         ORDER BY s.doc_id"""),

    // content-defined chunk dedup (Dedup.cdcChunkGroups): Rabin
    // rolling-hash boundaries (8-char window, base 31, hash % 64 == 63)
    // make the chunk grid shift-robust — an insertion re-syncs within 8
    // chars, where d06's delimiter segments all shift. Chunking is one
    // map-only codegen'd expression; only (md5, id) pairs shuffle, into
    // a single digest-keyed agg. The oracle re-derives the SAME
    // boundaries from the same exact integer chain per position
    // (explicit 31^j terms — no modulus inside the chain, so both
    // engines' longs are identical), then mirrors the rollup.
    "d21_cdc_chunk_dedup" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.cdcChunkGroups(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            div = 64L, minLen = 32)
          .orderBy(col("chunk_hash"))
      },
      """WITH d AS (SELECT doc_id, coalesce(text, '') AS s FROM documents),
         c AS (SELECT doc_id, s, length(s) AS n FROM d WHERE length(s) > 0),
         h AS (SELECT doc_id, i.i AS i,
                   CAST(ascii(substr(s, i.i,     1)) AS BIGINT)
                 + ascii(substr(s, i.i - 1, 1)) * CAST(31 AS BIGINT)
                 + ascii(substr(s, i.i - 2, 1)) * CAST(961 AS BIGINT)
                 + ascii(substr(s, i.i - 3, 1)) * CAST(29791 AS BIGINT)
                 + ascii(substr(s, i.i - 4, 1)) * CAST(923521 AS BIGINT)
                 + ascii(substr(s, i.i - 5, 1)) * CAST(28629151 AS BIGINT)
                 + ascii(substr(s, i.i - 6, 1)) * CAST(887503681 AS BIGINT)
                 + ascii(substr(s, i.i - 7, 1)) * 27512614111 AS hh
               FROM c, unnest(generate_series(8, n)) AS i(i)),
         b AS (SELECT doc_id, i FROM h WHERE hh % 64 = 63),
         ends AS (SELECT doc_id, i AS e FROM b
                  UNION SELECT doc_id, n FROM c),
         seg AS (SELECT doc_id,
                   substr(s, coalesce(lag(e) OVER (PARTITION BY doc_id
                       ORDER BY e), 0) + 1,
                     e - coalesce(lag(e) OVER (PARTITION BY doc_id
                       ORDER BY e), 0)) AS chunk
                 FROM ends JOIN c USING (doc_id)),
         ch AS (SELECT doc_id, md5(chunk) AS chunk_hash
                FROM seg WHERE length(chunk) >= 32)
         SELECT chunk_hash,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                CAST(count(*) AS BIGINT) AS n_occurrences,
                min(doc_id) AS first_doc
         FROM ch GROUP BY chunk_hash
         HAVING count(DISTINCT doc_id) > 1
         ORDER BY chunk_hash"""),

    // exhaustive embedding near-dup pairs — the oracled exactness anchor
    // for d05's LSH-bucketed scale path (cosine verified bit-identical,
    // same as s01)
    "d07_embed_pairs_exact" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.embeddingPairsExact(
            s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
            threshold = 0.35)
          .orderBy(col("id_a"), col("id_b"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                list_cosine_similarity(a.emb, b.emb) AS cosine
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35
         ORDER BY id_a, id_b"""),

    // duplicate-cluster resolution at the 100 TB shape: banded sign-bit
    // LSH candidates (equi-join, never a cross join) + exact cosine
    // verify -> connected components (min-label propagation + path
    // doubling on the Spark side; recursive-CTE min-reachable-id on the
    // oracle side). The corpus has no natural near-dups (max pairwise
    // cosine ~0.66), so both engines plant 3-node rotation CHAINS for
    // every vec_id % 10 == 0: v -- rot(v) -- rot(rot(v)) with adjacent
    // cosine 0.94 and endpoint cosine 2*0.94^2-1 ~ 0.767 < 0.9, so the
    // cluster only closes through transitive propagation. The banding
    // (12 bits x 48 bands) gives a 0.94-cosine edge miss probability
    // 1.5e-6; the oracle enumerates pairs exhaustively, so a green hash
    // IS the recall=1 proof. d07 stays the exhaustive-anchor query.
    "d08_dup_clusters" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val base = s.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val r1 = base.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            rotVec(col("v"), 0.94).as("v"))
        val r2 = r1.select((col("vec_id") + 1000000L).as("vec_id"),
          rotVec(col("v"), 0.94).as("v"))
        val u = base.unionByName(r1).unionByName(r2)
        val pairs = graft.ops.Dedup.embeddingPairsBanded(
          u, "vec_id", "v", rowBits = 12, bands = 48, threshold = 0.9)
        graft.ops.Clustering.connectedComponents(u, "vec_id", pairs)
          .orderBy(col("vec_id"))
      },
      s"""WITH RECURSIVE base AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         r1 AS (
           SELECT vec_id + 1000000 AS vec_id, ${rotSql("v")} AS v
           FROM base WHERE vec_id % 10 = 0),
         r2 AS (
           SELECT vec_id + 1000000 AS vec_id, ${rotSql("v")} AS v
           FROM r1),
         u AS (SELECT * FROM base UNION ALL SELECT * FROM r1
               UNION ALL SELECT * FROM r2),
         pairs AS (
           SELECT a.vec_id AS pu, b.vec_id AS pv
           FROM u a JOIN u b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.v, b.v) >= 0.9),
         edges AS (SELECT pu AS eu, pv AS ev FROM pairs
                   UNION ALL SELECT pv, pu FROM pairs),
         reach(id, lab) AS (
           SELECT vec_id, vec_id FROM u
           UNION
           SELECT g.ev, r.lab FROM reach r JOIN edges g ON g.eu = r.id),
         comp AS (SELECT id AS vec_id, min(lab) AS cluster
                  FROM reach GROUP BY id)
         SELECT vec_id, cluster, (vec_id = cluster) AS is_canonical
         FROM comp ORDER BY vec_id"""),

    // per-label embedding centroids via the vec_sum_long aggregate over
    // fixed-point-scaled vectors: integer sums are exact and therefore
    // order-independent — fully oracled against a DuckDB unnest+regroup
    // computation. The k-means update step as ONE map-side-combined agg
    // (one dims-length array per group per partition shuffles, vs
    // dims x rows for the explode-and-regroup formulation). Gated output
    // is posexploded to scalar (label, n, dim, value) rows: the driver
    // comparator sorts/hashes scalar columns only (no array types).
    "s04_centroids" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/embeddings.parquet")
          .select(col("label").cast("long").as("label"),
            transform(col("embedding").cast("array<double>"),
              x => round(x * lit(1.0e9)).cast("long")).as("q"))
          .groupBy(col("label"))
          .agg(call_function("vec_sum_long", col("q")).as("sq"),
            count(lit(1)).as("n"))
          .select(col("label"), col("n"), posexplode(col("sq")))
          .select(col("label"), col("n"),
            (col("pos") + lit(1)).cast("long").as("dim"),
            (col("col").cast("double") / (col("n") * lit(1.0e9))).as("value"))
          .orderBy(col("label"), col("dim"))
      },
      """WITH e AS (SELECT label, embedding::DOUBLE[] emb FROM embeddings),
         x AS (SELECT label,
                      CAST(round(unnest(emb) * 1e9) AS BIGINT) AS q,
                      generate_subscripts(emb, 1) AS i
               FROM e),
         s AS (SELECT label, i, CAST(sum(q) AS BIGINT) AS sq
               FROM x GROUP BY label, i),
         n AS (SELECT label, count(*) AS n FROM e GROUP BY label)
         SELECT CAST(s.label AS BIGINT) AS label, n.n AS n,
                CAST(s.i AS BIGINT) AS dim,
                CAST(s.sq AS DOUBLE) / (n.n * 1e9) AS value
         FROM s JOIN n USING (label)
         ORDER BY label, dim"""),

    // exact ANN baseline: brute-force cosine top-k with the bounded-heap
    // topk_by aggregate — full oracle (cosine verified bit-identical)
    "s01_ann_brute" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        graft.ops.Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .select(col("probe_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("sim"))
          .orderBy(col("probe_id"), col("rank"))
      },
      exactTopKOracle),

    // Semi-hard negative mining for contrastive training (s20,
    // [[graft.ops.Similarity.hardNegatives]] — the FaceNet/SBERT band):
    // per (anchor, positive) pair, the top-10 corpus vectors inside
    // [pos_sim − 0.1, pos_sim), anchor and positive excluded. The pair
    // set here is anchors vec_id < 5 with positive vec_id + 1. Scale
    // shape: pairs broadcast at every join, corpus never shuffles, band
    // filter precedes the k-bounded topk_by heap — no rank window over
    // the corpus, no CartesianProduct (PlanSpec pins it). The oracle
    // re-derives the band + ranking with DuckDB's native
    // list_cosine_similarity (bitwise-identical doubles, the s01
    // fixed-order cosine discipline).
    "s20_hard_negatives" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val pairs = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("a_id"),
            (col("vec_id") + 1).as("p_id"))
        graft.ops.Similarity.hardNegatives(
            emb, pairs, "vec_id", "embedding", "a_id", "p_id",
            k = 10, margin = 0.1)
          .orderBy(col("anchor_id"), col("rank"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
           pr AS (SELECT a.vec_id AS anchor_id, p.vec_id AS pos_id,
                         a.emb AS avec,
                         list_cosine_similarity(a.emb, p.emb) AS pos_sim
                  FROM e a JOIN e p ON p.vec_id = a.vec_id + 1
                  WHERE a.vec_id < 5),
           scored AS (SELECT pr.anchor_id, pr.pos_id, pr.pos_sim,
                             c.vec_id AS neg_id,
                             list_cosine_similarity(pr.avec, c.emb) AS sim
                      FROM pr, e c
                      WHERE c.vec_id <> pr.anchor_id
                        AND c.vec_id <> pr.pos_id),
           band AS (SELECT * FROM scored
                    WHERE sim < pos_sim AND sim >= pos_sim - 0.1),
           r AS (SELECT anchor_id, pos_id, neg_id, sim, pos_sim,
                        CAST(row_number() OVER (
                          PARTITION BY anchor_id, pos_id, pos_sim
                          ORDER BY sim DESC, neg_id) AS BIGINT) AS rank
                 FROM band)
         SELECT anchor_id, pos_id, rank, neg_id, sim, pos_sim FROM r
         WHERE rank <= 10 ORDER BY anchor_id, rank"""),

    // Random-projection embedding compression (s21,
    // [[graft.ops.Similarity.randomProjection]] — the cheap tier below
    // PQ): Achlioptas ±1 sign projection 64 → 16 dims with md5-derived
    // deterministic signs (rebuildable from (seed, j, i) in any engine
    // carrying md5). The sign matrix is a driver-precomputed broadcast
    // literal, so the encode is pure map-side zip_with/aggregate
    // arithmetic — zero shuffles, 4× compression. The query gates
    // recall@10 of compressed-space cosine against the IN-PLAN exact
    // top-k (the s02 recall-contract discipline): the oracle pins the
    // exact-set size and the floor constant, so a recall below the
    // floor hash-mismatches.
    "s21_random_projection" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val rp = graft.ops.Similarity.randomProjection(
          emb, "vec_id", "embedding", inDim = 64, outDim = 16)
        val approx = graft.ops.Similarity.bruteForceTopK(
            rp, rp.filter(col("vec_id") < 5), "vec_id", "rp_vec", k = 10)
          .select(col("probe_id"), col("vec_id"), lit(1L).as("__hit"))
        val exact = graft.ops.Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            k = 10)
          .select(col("probe_id"), col("vec_id"))
        exact.join(approx, Seq("probe_id", "vec_id"), "left")
          .agg(count(lit(1)).as("n_exact"),
            (sum(coalesce(col("__hit"), lit(0L))).cast("double")
              / count(lit(1))).as("__r"))
          .select(col("n_exact"),
            when(col("__r") >= 0.1, lit(0.1)).otherwise(col("__r"))
              .as("recall_floor"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
         scored AS (
           SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
                  list_cosine_similarity(p.emb, c.emb) AS sim
           FROM e p, e c WHERE p.vec_id < 5 AND c.vec_id <> p.vec_id),
         topk AS (SELECT probe_id, vec_id FROM (
             SELECT probe_id, vec_id,
                    row_number() OVER (PARTITION BY probe_id
                                       ORDER BY sim DESC, vec_id) AS rank
             FROM scored) t WHERE rank <= 10)
         SELECT CAST(count(*) AS BIGINT) AS n_exact,
                CAST(0.1 AS DOUBLE) AS recall_floor
         FROM topk"""),

    // Okapi BM25 lexical scoring (graft.ops.Search.bm25) — search-side
    // retrieval over the corpus with a broadcast bag-of-terms query.
    // k1 = 1.25 / b = 0.75 are binary-exact constants; per-(doc,term)
    // scores land in 1e6 fixed point before the order-free integer sum
    // (t09's cross-engine float discipline), so the oracle re-derives
    // the full Lucene-form formula bit-for-bit.
    "s15_bm25" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Search.bm25(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            Seq("data", "query", "vector"))
          .orderBy(col("doc_id"))
      },
      """WITH s AS (SELECT doc_id,
              list_filter(string_split_regex(lower(coalesce(text, '')), '\W+'),
                          x -> x <> '') AS toks
            FROM documents),
         wl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM s),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
                FROM wl),
         h AS (SELECT doc_id, dl, unnest(toks) AS term FROM wl),
         hh AS (SELECT * FROM h WHERE term IN ('data', 'query', 'vector')),
         tf AS (SELECT doc_id, term, any_value(dl) AS dl,
                       CAST(count(*) AS DOUBLE) AS tf
                FROM hh GROUP BY doc_id, term),
         dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
                 FROM tf GROUP BY term),
         sc AS (SELECT tf.doc_id,
                  CAST(round(((ln((((st.n_docs - dfq.df) + 0.5)
                                   / (dfq.df + 0.5)) + 1.0)
                    * (tf.tf * (1.25 + 1.0)))
                    / (tf.tf + (1.25 * ((1.0 - 0.75)
                                        + (0.75 * (tf.dl / st.avgdl))))))
                    * 1e6) AS BIGINT) AS fp
                FROM tf JOIN dfq USING (term) CROSS JOIN st),
         pd AS (SELECT doc_id, count(*) AS n_terms, sum(fp) AS score_fp
                FROM sc GROUP BY doc_id)
         SELECT d.doc_id, CAST(coalesce(pd.n_terms, 0) AS BIGINT) AS n_terms,
                CAST(coalesce(pd.score_fp, 0) AS BIGINT) AS score_fp
         FROM documents d LEFT JOIN pd USING (doc_id)
         ORDER BY d.doc_id"""),

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    // ranking with the exact cosine ranking against probe vector 0
    // (graft.ops.Search.rrfFuse, k = 60). Rankings use explicit id
    // tiebreaks, so both engines fuse identical rank columns; the rrf
    // double is two correctly-rounded divisions summed in fixed order.
    "s16_hybrid_rrf" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        // lexical TOP-100 through the bounded-heap aggregate, not a
        // global rank window — RRF fuses retrieval LISTS, and a
        // single-partition sort of the full corpus would be the one
        // shape the engine's scale discipline forbids (sp12 PlanSpec
        // mechanics; heap ties = (score desc, id asc) ≡ row_number)
        val lex = graft.ops.Search.bm25(docs, "doc_id", "text",
            Seq("data", "query", "vector"))
          .agg(call_function("topk_by", col("score_fp").cast("double"),
            col("doc_id").cast("long"), lit(100)).as("top"))
          .select(posexplode(col("top")).as(Seq("r0", "hit")))
          .select(col("hit.id").as("doc_id"),
            (col("r0") + 1).cast("long").as("rank"))
        val vec = graft.ops.Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
            k = 100)
          .select(col("vec_id").as("doc_id"), col("rank"))
        graft.ops.Search.rrfFuse(lex, vec, "doc_id")
          .orderBy(col("rrf").desc, col("doc_id")).limit(20)
      },
      """WITH s AS (SELECT doc_id,
              list_filter(string_split_regex(lower(coalesce(text, '')), '\W+'),
                          x -> x <> '') AS toks
            FROM documents),
         wl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM s),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
                FROM wl),
         h AS (SELECT doc_id, dl, unnest(toks) AS term FROM wl),
         hh AS (SELECT * FROM h WHERE term IN ('data', 'query', 'vector')),
         tf AS (SELECT doc_id, term, any_value(dl) AS dl,
                       CAST(count(*) AS DOUBLE) AS tf
                FROM hh GROUP BY doc_id, term),
         dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
                 FROM tf GROUP BY term),
         sc AS (SELECT tf.doc_id,
                  CAST(round(((ln((((st.n_docs - dfq.df) + 0.5)
                                   / (dfq.df + 0.5)) + 1.0)
                    * (tf.tf * (1.25 + 1.0)))
                    / (tf.tf + (1.25 * ((1.0 - 0.75)
                                        + (0.75 * (tf.dl / st.avgdl))))))
                    * 1e6) AS BIGINT) AS fp
                FROM tf JOIN dfq USING (term) CROSS JOIN st),
         bm AS (SELECT d.doc_id, coalesce(pd.score_fp, 0) AS score_fp
                FROM documents d LEFT JOIN
                  (SELECT doc_id, sum(fp) AS score_fp FROM sc GROUP BY doc_id) pd
                  USING (doc_id)),
         lex AS (SELECT doc_id, r_lex FROM (
                   SELECT doc_id, CAST(row_number() OVER
                     (ORDER BY score_fp DESC, doc_id) AS BIGINT) AS r_lex
                   FROM bm) t WHERE r_lex <= 100),
         e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
         vec AS (SELECT vec_id AS doc_id, rank AS r_vec FROM (
                   SELECT c.vec_id,
                          CAST(row_number() OVER (ORDER BY
                            list_cosine_similarity(p.emb, c.emb) DESC,
                            c.vec_id) AS BIGINT) AS rank
                   FROM e p, e c
                   WHERE p.vec_id = 0 AND c.vec_id <> 0) WHERE rank <= 100)
         SELECT doc_id, r_lex, r_vec,
                (coalesce(1.0 / (CAST(60 AS DOUBLE) + r_lex), 0.0)
                 + coalesce(1.0 / (CAST(60 AS DOUBLE) + r_vec), 0.0)) AS rrf
         FROM lex FULL OUTER JOIN vec USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 20"""),

    // k-core decomposition (k = 4) over the gr04 synthetic link graph —
    // iterative peeling on Iterate.loopUntil with data-dependent
    // termination (remove active vertices of within-subgraph degree < k
    // until stable; converges in 3 rounds on this graph at every SF).
    // The oracle unrolls 5 peel rounds — rounds past the fixpoint are
    // no-ops, so the unroll is safe as long as it is >= the convergence
    // depth, which OpsSpec pins.
    // 5-TRUSS decomposition (gr08): iteratively prune edges whose
    // triangle support < k−2 = 3 until stable — the cohesive-subgraph
    // mining standard one step denser than gr05's k-core (edges must sit
    // in triangles, not just have degree). Per round: ONE wedge
    // equi-join + ONE semi-join closes triangles + ONE edge-keyed
    // support count + a semi-join prune, on Iterate.loop (bounded
    // lineage). Fixture: a K6 clique (support 4 per edge — survives)
    // welded to a band tail x→{x+1,x+2,x+3} whose support cascade dies
    // in waves; 4 fixed rounds, fixpoint reached by round 2 at every SF
    // (rounds are part of the semantics, so the K-unrolled oracle is
    // exact by construction even if a future corpus hasn't converged).
    "gr08_ktruss" -> api(
      (s, dir) => {
        import s.implicits._
        val v = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").as("x")).filter(col("x") < 97).distinct()
        val band = v.filter(col("x") >= 5)
          .select(col("x").as("s"), explode(array(col("x") + 1,
            col("x") + 2, col("x") + 3)).as("d"))
          .join(v.select(col("x").as("d")), Seq("d"), "left_semi")
          .select(least(col("s"), col("d")).as("a"),
            greatest(col("s"), col("d")).as("b"))
        val clique = (for { i <- 0 to 5; j <- (i + 1) to 5 }
          yield (i.toLong, j.toLong)).toDF("a", "b")
        val e0 = band.unionByName(clique).distinct()
        graft.ops.Iterate.loop(e0, 4) { (cur, _) =>
          val wedge = cur.as("e1")
            .join(cur.select(col("a").as("b"), col("b").as("c")), Seq("b"))
            .select(col("a"), col("b"), col("c"))
          val tri = wedge.join(
            cur.select(col("a"), col("b").as("c")), Seq("a", "c"),
            "left_semi")
          val keep = tri.select(explode(array(
              struct(col("a").as("ea"), col("b").as("eb")),
              struct(col("b").as("ea"), col("c").as("eb")),
              struct(col("a").as("ea"), col("c").as("eb")))).as("p"))
            .groupBy(col("p.ea").as("a"), col("p.eb").as("b"))
            .agg(count(lit(1)).as("__sup"))
            .filter(col("__sup") >= 3)
            .select(col("a"), col("b"))
          cur.join(keep, Seq("a", "b"), "left_semi")
        }.orderBy(col("a"), col("b"))
      },
      s"""WITH v AS (SELECT DISTINCT doc_id AS x FROM documents
                     WHERE doc_id < 97),
         de AS (SELECT least(s.x, d) AS a, greatest(s.x, d) AS b
                FROM (SELECT x, unnest([x+1, x+2, x+3]) AS d
                      FROM v WHERE x >= 5) s
                WHERE d IN (SELECT x FROM v)
                UNION ALL
                SELECT ca.i, cb.i FROM range(6) ca(i), range(6) cb(i)
                WHERE ca.i < cb.i),
         e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM de)${
           (0 until 4).map { i =>
             s""",
         t$i AS MATERIALIZED (
           SELECT w.a, w.b, w.c FROM (SELECT e1.a, e1.b, e2.b AS c
             FROM e$i e1 JOIN e$i e2 ON e2.a = e1.b) w
           WHERE EXISTS (SELECT 1 FROM e$i x
                         WHERE x.a = w.a AND x.b = w.c)),
         sup$i AS (SELECT ea, eb, count(*) AS sup FROM (
                   SELECT a AS ea, b AS eb FROM t$i
                   UNION ALL SELECT b, c FROM t$i
                   UNION ALL SELECT a, c FROM t$i) GROUP BY ea, eb),
         e${i + 1} AS MATERIALIZED (
           SELECT e.a, e.b FROM e$i e
           JOIN sup$i s ON s.ea = e.a AND s.eb = e.b WHERE s.sup >= 3)"""
           }.mkString}
         SELECT a, b FROM e4 ORDER BY a, b"""),

    "gr05_kcore" -> api(
      (s, dir) => {
        val v = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").as("id"))
        val de = v.select(col("id").as("s"),
            explode(array((col("id") * 7 + 1) % 97,
              (col("id") * 13 + 3) % 97,
              (col("id") * 29 + 7) % 97)).as("d"))
          .filter(col("s") =!= col("d"))
        val e = de.select(col("s"), col("d"))
          .union(de.select(col("d").as("s"), col("s").as("d")))
          .distinct().localCheckpoint(true)
        val core = graft.ops.Iterate.loopUntil(v, maxIter = 40) { (act, _) =>
          e.join(act.select(col("id").as("s")), Seq("s"))
            .join(act.select(col("id").as("d")), Seq("d"))
            .groupBy(col("s").as("id")).agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= 4).select(col("id"))
        } { (prev, next) => next.count() == prev.count() }
        e.join(core.select(col("id").as("s")), Seq("s"))
          .join(core.select(col("id").as("d")), Seq("d"))
          .groupBy(col("s").as("id")).agg(count(lit(1)).as("core_deg"))
          .orderBy(col("id"))
      },
      """WITH v AS (SELECT doc_id AS id FROM documents),
         de AS (SELECT id AS s, (id*7+1) % 97 AS d FROM v
                UNION ALL SELECT id, (id*13+3) % 97 FROM v
                UNION ALL SELECT id, (id*29+7) % 97 FROM v),
         e AS (SELECT DISTINCT s, d FROM (
                 SELECT s, d FROM de WHERE s <> d
                 UNION ALL SELECT d, s FROM de WHERE s <> d)),
         a0 AS (SELECT DISTINCT id FROM v),
         a1 AS (SELECT e.s AS id FROM e
                JOIN a0 x ON x.id = e.s JOIN a0 y ON y.id = e.d
                GROUP BY e.s HAVING count(*) >= 4),
         a2 AS (SELECT e.s AS id FROM e
                JOIN a1 x ON x.id = e.s JOIN a1 y ON y.id = e.d
                GROUP BY e.s HAVING count(*) >= 4),
         a3 AS (SELECT e.s AS id FROM e
                JOIN a2 x ON x.id = e.s JOIN a2 y ON y.id = e.d
                GROUP BY e.s HAVING count(*) >= 4),
         a4 AS (SELECT e.s AS id FROM e
                JOIN a3 x ON x.id = e.s JOIN a3 y ON y.id = e.d
                GROUP BY e.s HAVING count(*) >= 4),
         a5 AS (SELECT e.s AS id FROM e
                JOIN a4 x ON x.id = e.s JOIN a4 y ON y.id = e.d
                GROUP BY e.s HAVING count(*) >= 4)
         SELECT e.s AS id, count(*) AS core_deg FROM e
         JOIN a5 x ON x.id = e.s JOIN a5 y ON y.id = e.d
         GROUP BY e.s ORDER BY id"""),

    // IVF at nprobe = nlist scans every cell, so the quantizer + cell
    // equi-join + bounded-heap rank pipeline must reproduce the exact
    // brute-force top-k bit-for-bit — the strict end-to-end correctness
    // anchor for the IVF machinery (s03 stays the nprobe<nlist recall
    // demo, whose output is approximation-specific by design).
    "s05_ann_ivf_full" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val coarse = graft.ops.Ivf.trainCentroids(emb, "vec_id", "embedding", nlist = 16)
        val cents = graft.ops.Ivf.lloydStep(emb, "embedding", coarse)
        graft.ops.Ivf.topK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            k = 10, cents, nprobe = 16)
          .select(col("probe_id"), col("rank"), col("vec_id"), col("sim"))
          .orderBy(col("probe_id"), col("rank"))
      },
      exactTopKOracle),

    // int8 embedding quantization, gated WITHOUT rounding any double:
    // mx = max|v_i| is a stored parquet double passed through abs/max
    // (exact, bitwise-comparable) and the quantized vector is gated via
    // its exact integer sum and sum-of-squares — if a single q_i
    // differed between engines the integer aggregates would diverge.
    "s06_quantize_int8" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val q = graft.ops.Quantize.quantizeInt8(
          s.read.parquet(s"$dir/embeddings.parquet")
            .select(col("vec_id"), col("embedding")), "embedding")
        // mx recomputed directly (abs/max of stored doubles is exact);
        // q_scale*127 would NOT round-trip bitwise through the division
        q.select(col("vec_id"),
            array_max(transform(col("embedding").cast("array<double>"),
              x => abs(x))).as("mx"),
            aggregate(col("q"), lit(0L), (a, x) => a + x).as("qsum"),
            aggregate(transform(col("q"), x => x * x), lit(0L),
              (a, x) => a + x).as("qnorm"))
          .orderBy(col("vec_id"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         m AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) AS mx
               FROM e),
         q AS (SELECT vec_id, mx,
                      list_transform(v, x ->
                        CAST(round(x / (mx/127.0)) AS BIGINT)) AS qv
               FROM m)
         SELECT vec_id, mx,
                CAST(list_sum(qv) AS BIGINT) AS qsum,
                CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS qnorm
         FROM q ORDER BY vec_id"""),

    // brute-force ANN over the int8-QUANTIZED corpus: dot products and
    // norms are exact integer arithmetic (scales cancel out of cosine),
    // so the full ranking is strictly oracled — DuckDB re-derives the
    // same quantized vectors and ranks by the same integer-exact cosine.
    // The compressed-search shape: 8x less data scanned than s01.
    "s07_ann_quantized" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        graft.ops.Quantize.bruteForceTopKQuantized(
            emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .orderBy(col("probe_id"), col("rank"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         m AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) AS mx
               FROM e),
         q AS (SELECT vec_id,
                      list_transform(v, x ->
                        CAST(round(x / (mx/127.0)) AS BIGINT)) AS qv
               FROM m),
         scored AS (
           SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
                  CAST(list_inner_product(p.qv, c.qv) AS DOUBLE)
                    / (sqrt(CAST(list_inner_product(p.qv, p.qv) AS DOUBLE))
                       * sqrt(CAST(list_inner_product(c.qv, c.qv) AS DOUBLE))) AS sim
           FROM q p, q c WHERE p.vec_id < 5 AND c.vec_id <> p.vec_id)
         SELECT probe_id, rank, vec_id, sim FROM (
           SELECT probe_id, vec_id, sim,
                  CAST(row_number() OVER (PARTITION BY probe_id
                                          ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
           FROM scored) t
         WHERE rank <= 10 ORDER BY probe_id, rank"""),

    // approximate ANN: IVF (k-means coarse quantizer, deterministic
    // training on a driver sample + one DISTRIBUTED Lloyd pass — the
    // 100 TB refinement shape), STRICT-ORACLED via its recall contract
    // (same gate mechanics as s02): recall_floor equals the 0.5 contract
    // constant iff the nprobe=4/nlist=16 search recovers at least half of
    // the exact top-k; measured 0.68 at sf0.01, with the margin covering
    // the float-sum noise a distributed Lloyd pass can carry into cell
    // boundaries. The exact denominator re-derives from data.
    "s03_ann_ivf" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val probes = emb.filter(col("vec_id") < 5)
        val coarse = graft.ops.Ivf.trainCentroids(emb, "vec_id", "embedding", nlist = 16)
        val cents = graft.ops.Ivf.lloydStep(emb, "embedding", coarse)
        val ivf = graft.ops.Ivf.topK(emb, probes, "vec_id", "embedding",
            k = 10, cents, nprobe = 4)
          .select(col("probe_id"), col("vec_id"), lit(1L).as("__hit"))
        val exact = graft.ops.Similarity.bruteForceTopK(emb, probes,
            "vec_id", "embedding", k = 10)
          .select(col("probe_id"), col("vec_id"))
        exact.join(ivf, Seq("probe_id", "vec_id"), "left")
          .agg(count(lit(1)).as("n_exact"),
            (sum(coalesce(col("__hit"), lit(0L))).cast("double")
              / count(lit(1))).as("__r"))
          .select(col("n_exact"),
            when(col("__r") >= 0.5, lit(0.5)).otherwise(col("__r"))
              .as("recall_floor"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
         scored AS (
           SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
                  list_cosine_similarity(p.emb, c.emb) AS sim
           FROM e p, e c WHERE p.vec_id < 5 AND c.vec_id <> p.vec_id),
         topk AS (SELECT probe_id, vec_id FROM (
             SELECT probe_id, vec_id,
                    row_number() OVER (PARTITION BY probe_id
                                       ORDER BY sim DESC, vec_id) AS rank
             FROM scored) t WHERE rank <= 10)
         SELECT CAST(count(*) AS BIGINT) AS n_exact, CAST(0.5 AS DOUBLE) AS recall_floor
         FROM topk"""),

    // bucketed range join: lineitems shipped within 7 days of their
    // window-order's date — an equi-join on quantized day buckets +
    // residual BETWEEN, where naive Spark would nested-loop. Oracled
    // against DuckDB's native range join.
    "j06_range_join" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val epoch = lit("1970-01-01")
        val points = s.read.parquet(s"$dir/lineitem.parquet")
          .select(datediff(col("l_shipdate"), epoch).cast("long").as("t"),
            col("l_quantity"))
        val intervals = s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_totalprice") > 497000)
          .select(col("o_orderkey"),
            datediff(col("o_orderdate"), epoch).cast("long").as("lo"))
          .withColumn("hi", col("lo") + 7)
        graft.ops.RangeJoin.bucketedRangeJoin(points, "t", intervals, "lo", "hi",
            width = 8)
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_shipped"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sq"),
            min(col("t")).as("first_day"))
          .orderBy(col("o_orderkey"))
      },
      """WITH l AS (SELECT CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS t,
                         l_quantity
                  FROM lineitem),
         o AS (SELECT o_orderkey,
                      CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS lo
               FROM orders WHERE o_totalprice > 497000)
         SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped,
                CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
                CAST(min(l.t) AS BIGINT) AS first_day
         FROM l JOIN o ON l.t BETWEEN o.lo AND o.lo + 7
         GROUP BY o.o_orderkey ORDER BY o.o_orderkey"""),

    // approximate ANN: multi-probe sign-bit LSH, STRICT-ORACLED via its
    // recall contract. The query runs the full LSH search, joins it
    // against the exact brute-force top-k (computed in the same plan),
    // and emits (n_exact, recall_floor): recall_floor equals the 0.1
    // contract constant iff measured recall >= 0.1, else the raw recall —
    // which hash-mismatches the oracle's constant and turns the row red.
    // The oracle re-derives the exact top-k denominator from data. The
    // floor is sized to the corpus: these synthetic embeddings have NO
    // neighbor structure (max pairwise cosine 0.51), so sign-bit buckets
    // at bits=8 measure 0.12 recall at sf0.01 — deterministic (seeded
    // hashing), so the gate is exact, not flaky.
    "s02_ann_lsh" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val probes = emb.filter(col("vec_id") < 5)
        val lsh = graft.ops.Similarity.lshTopK(emb, probes, "vec_id", "embedding",
            k = 10, bits = 8, multiProbe = true)
          .select(col("probe_id"), col("vec_id"), lit(1L).as("__hit"))
        val exact = graft.ops.Similarity.bruteForceTopK(emb, probes,
            "vec_id", "embedding", k = 10)
          .select(col("probe_id"), col("vec_id"))
        exact.join(lsh, Seq("probe_id", "vec_id"), "left")
          .agg(count(lit(1)).as("n_exact"),
            (sum(coalesce(col("__hit"), lit(0L))).cast("double")
              / count(lit(1))).as("__r"))
          .select(col("n_exact"),
            when(col("__r") >= 0.1, lit(0.1)).otherwise(col("__r"))
              .as("recall_floor"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
         scored AS (
           SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
                  list_cosine_similarity(p.emb, c.emb) AS sim
           FROM e p, e c WHERE p.vec_id < 5 AND c.vec_id <> p.vec_id),
         topk AS (SELECT probe_id, vec_id FROM (
             SELECT probe_id, vec_id,
                    row_number() OVER (PARTITION BY probe_id
                                       ORDER BY sim DESC, vec_id) AS rank
             FROM scored) t WHERE rank <= 10)
         SELECT CAST(count(*) AS BIGINT) AS n_exact, CAST(0.1 AS DOUBLE) AS recall_floor
         FROM topk"""),

    // language ID by stopword argmax — full oracle
    "t01_langid" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"),
            graft.ops.TextAnalysis.langId(col("text")).as("pred_lang"))
          .orderBy(col("doc_id"))
      },
      """WITH c AS (
           SELECT doc_id, lang,
                  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|for|was)\b')) AS c_en,
                  len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|mit|auf|zu)\b')) AS c_de,
                  len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|dans|que|pour|une|pas)\b')) AS c_fr,
                  len(regexp_extract_all(lower(text), '\b(el|los|las|de|que|y|en|un|por|con)\b')) AS c_es
           FROM documents)
         SELECT doc_id, lang,
                CASE WHEN c_en > 0 AND c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
                     WHEN c_de > 0 AND c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
                     WHEN c_fr > 0 AND c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
                     WHEN c_es > 0 AND c_es = greatest(c_en, c_de, c_fr, c_es) THEN 'es'
                     ELSE 'und' END AS pred_lang
         FROM c ORDER BY doc_id"""),

    // quality features + bounded score — full oracle
    "t02_quality" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.TextAnalysis.qualityFeatures(
            s.read.parquet(s"$dir/documents.parquet"), "text")
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            col("n_tokens").cast("long").as("n_tokens"),
            col("alpha_ratio"), col("punct_ratio"), col("stopword_ratio"),
            col("avg_token_len"), col("quality_score"))
          .orderBy(col("doc_id"))
      },
      """WITH f AS (
           SELECT doc_id, length(text) AS n_chars,
                  len(regexp_extract_all(text, '\w+')) AS n_tokens,
                  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
                  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|for|was)\b')) AS n_stop
           FROM documents)
         SELECT doc_id, n_chars, n_tokens,
                CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1) AS alpha_ratio,
                CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
                CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio,
                CAST(n_alpha AS DOUBLE) / greatest(n_tokens, 1) AS avg_token_len,
                least(1.0, greatest(0.0,
                  0.5 * least(CAST(n_tokens AS DOUBLE) / 64, 1.0)
                    + 0.3 * (CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1))
                    + 0.2 * least(10.0 * CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 1.0))) AS quality_score
         FROM f ORDER BY doc_id"""),

    // token counting: word-regex count + BPE-ish estimate — full oracle
    "t03_tokens" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val t = graft.ops.TextAnalysis
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), length(col("text")).as("len_chars"),
            t.tokenCount(col("text")).cast("long").as("n_tokens"),
            t.bpeTokenEstimate(col("text")).as("bpe_est"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS len_chars,
                CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_tokens,
                CAST(ceil(CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE) / 4)
                     + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS bpe_est
         FROM documents ORDER BY doc_id"""),

    // Flesch reading-ease + Flesch-Kincaid grade
    // (TextAnalysis.readability): the classic readability quality gate
    // from exact regex counts (words/sentences/vowel-group syllables)
    // through mirrored correctly-rounded chains — map-only
    "t24_readability" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.TextAnalysis.readability(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      """WITH f AS (SELECT doc_id,
                  len(regexp_extract_all(text, '\w+')) AS w,
                  len(regexp_extract_all(text, '[.!?]+')) AS s,
                  len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
           FROM documents)
         SELECT doc_id, CAST(w AS BIGINT) AS n_words,
                CAST(s AS BIGINT) AS n_sentences,
                CAST(y AS BIGINT) AS n_syllables,
                206.835 - 1.015 * (CAST(w AS DOUBLE) / greatest(s, 1))
                        - 84.6 * (CAST(y AS DOUBLE) / greatest(w, 1))
                  AS flesch_ease,
                0.39 * (CAST(w AS DOUBLE) / greatest(s, 1))
                  + 11.8 * (CAST(y AS DOUBLE) / greatest(w, 1)) - 15.59
                  AS fk_grade
         FROM f ORDER BY doc_id"""),

    // collision fingerprint (sorted distinct token set) — full oracle
    "t04_fingerprint" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
                md5(array_to_string(list_sort(list_distinct(
                  list_filter(string_split_regex(lower(text), '\W+'), x -> x <> ''))), ' ')) AS fp
         FROM documents ORDER BY doc_id"""),

    // incremental-ingest dedup: drop new docs whose exact text already
    // exists in a reference corpus — bloom prefilter (no false negatives)
    // + exact anti-join verify, so the result equals the plain anti join
    // (which is exactly what the oracle computes). The ref slice overlaps
    // docs 400-449 of the new batch so both the definitely-new path and
    // the verify path carry rows.
    "d09_dedup_against_ref" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val ref = docs.filter(col("doc_id") < 250 || col("doc_id").between(400, 449))
        val fresh = docs.filter(col("doc_id") >= 250)
        graft.ops.Dedup.dedupAgainstReference(fresh, ref, "text",
            expectedItems = 300, fpp = 0.01)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      """SELECT n.doc_id, n.source FROM documents n
         WHERE n.doc_id >= 250
           AND NOT EXISTS (SELECT 1 FROM documents r
                           WHERE (r.doc_id < 250 OR r.doc_id BETWEEN 400 AND 449)
                             AND r.text = n.text)
         ORDER BY n.doc_id"""),

    // benchmark decontamination: flag training docs sharing any word
    // 8-gram with an evaluation corpus (docs 450-459 stand in as the
    // benchmark set; their planted near-dup partners are the true
    // contamination). Broadcast eval-gram join, corpus side map-only —
    // fully oracled against DuckDB's exhaustive gram intersection.
    //
    // Round 19: switched to the hashed-gram tier (VERDICT r18 #3 — the
    // d14/d03 discipline): grams join as WindowHashes longs, no per-gram
    // string ever materializes (the string build owned ~5.7 of d10's
    // 6.3 s at sf0.1). The UNCHANGED string-gram oracle stays a strict
    // check of the hashed path: the tiers diverge only on zero-token
    // docs (string tier emits a whole-doc '' gram; hashed emits none) or
    // 64-bit collisions — the corpus has zero zero-token docs at every
    // SF (probed via DuckDB r19) and d14's green hash pins collisions at
    // zero, so flags AND distinct-gram hit counts are value-identical.
    "d10_decontaminate" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        graft.ops.Dedup.contaminationFlags(
            docs, "doc_id", "text",
            docs.filter(col("doc_id").between(450, 459)), "text", n = 8,
            hashGrams = true)
          .orderBy(col("doc_id"))
      },
      s"""${gramSets(8)},
         evg AS (
           SELECT DISTINCT unnest(shset) AS g FROM sh
           WHERE doc_id BETWEEN 450 AND 459),
         dg AS (SELECT doc_id, unnest(shset) AS g FROM sh),
         hits AS (
           SELECT dg.doc_id, count(*) AS n
           FROM dg JOIN evg USING (g) GROUP BY dg.doc_id)
         SELECT d.doc_id,
                coalesce(h.n, 0) AS n_contaminated,
                h.n IS NOT NULL AS flagged
         FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
         ORDER BY d.doc_id"""),

    // d10's PRODUCTION tier under the same strict oracle: grams join as
    // xxhash64 longs (8-byte broadcast + probe instead of gram strings).
    // Flags are equivalent to the string tier modulo 64-bit collisions —
    // zero on this corpus — so the STRING-gram SQL is a legitimate
    // strict oracle for the hashed path, which turns the spec-level
    // "hash ≡ string" equivalence claim into a driver-checked one.
    "d14_decontaminate_hashed" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        graft.ops.Dedup.contaminationFlags(
            docs, "doc_id", "text",
            docs.filter(col("doc_id").between(450, 459)), "text", n = 8,
            hashGrams = true)
          .orderBy(col("doc_id"))
      },
      // dropEmptyDocs: the hashed tier derives grams from window_hashes
      // over token hashes, where a ZERO-token doc has no gram — the
      // string-tier whole-doc '' shingle must not appear in this oracle
      // (it would RED on a corpus containing an empty document)
      s"""${gramSets(8, dropEmptyDocs = true)},
         evg AS (
           SELECT DISTINCT unnest(shset) AS g FROM sh
           WHERE doc_id BETWEEN 450 AND 459),
         dg AS (SELECT doc_id, unnest(shset) AS g FROM sh),
         hits AS (
           SELECT dg.doc_id, count(*) AS n
           FROM dg JOIN evg USING (g) GROUP BY dg.doc_id)
         SELECT d.doc_id,
                coalesce(h.n, 0) AS n_contaminated,
                h.n IS NOT NULL AS flagged
         FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
         ORDER BY d.doc_id"""),

    // per-source DATA CARD — the datasheet a training corpus ships with:
    // volume (docs/chars/regex tokens), language spread (distinct langs,
    // English share), length distribution (exact interpolated median)
    // and exact-dup rate (distinct md5 of text vs rows), all in ONE
    // aggregation pass per source. Everything cross-engine exact:
    // percentile ≡ quantile_cont (p05 precedent), md5 ≡ md5.
    "pr03_data_card" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/documents.parquet")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars"),
            sum(graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")).as("tokens"),
            count_distinct(col("lang")).as("n_langs"),
            sum((col("lang") === "en").cast("long")).as("n_en"),
            expr("percentile(n_chars, 0.5)").as("p50_chars"),
            count_distinct(md5(col("text"))).as("n_uniq"))
          .orderBy(col("source"))
      },
      """SELECT source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS chars,
                CAST(sum(len(regexp_extract_all(text, '\w+'))) AS BIGINT) AS tokens,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                quantile_cont(n_chars, 0.5) AS p50_chars,
                CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_uniq
         FROM documents GROUP BY source ORDER BY source"""),

    // column-level data profiling (corpus QA): null + exact-distinct
    // counts for every column in ONE aggregation pass, unpivoted to one
    // row per column. Full oracle via per-column UNION ALL.
    "pr01_profile" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Profile.summarize(
            graft.streaming.Events.readRaw(s, dir),
            Seq("event_type", "user_id", "value", "props"))
          .orderBy(col("column"))
      },
      """SELECT 'event_type' AS "column", count(*) AS n,
                CAST(count(*) - count(event_type) AS BIGINT) AS n_null,
                CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct
         FROM events
         UNION ALL
         SELECT 'user_id', count(*),
                CAST(count(*) - count(user_id) AS BIGINT),
                CAST(count(DISTINCT user_id) AS BIGINT) FROM events
         UNION ALL
         SELECT 'value', count(*),
                CAST(count(*) - count(value) AS BIGINT),
                CAST(count(DISTINCT value) AS BIGINT) FROM events
         UNION ALL
         SELECT 'props', count(*),
                CAST(count(*) - count(props) AS BIGINT),
                CAST(count(DISTINCT props) AS BIGINT) FROM events
         ORDER BY "column""""),

    // token-budget sequence packing (concat-and-chunk, per source shard):
    // window cumsum -> sequence id / offset / span count, fully oracled
    "p02_pack_sequences" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        graft.ops.Packing.packSequences(
            docs, "doc_id", "source",
            graft.ops.TextAnalysis.tokenCount(col("text")), budget = 2048)
          .orderBy(col("source"), col("doc_id"))
      },
      """WITH t AS (
           SELECT source, doc_id,
                  CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_tokens
           FROM documents),
         o AS (
           SELECT source, doc_id, n_tokens,
                  coalesce(CAST(sum(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                    0) AS off
           FROM t)
         SELECT source, doc_id, n_tokens,
                off // 2048 AS seq_id,
                off % 2048 AS seq_offset,
                CAST(CASE WHEN n_tokens = 0 THEN 0
                          ELSE (off + n_tokens - 1) // 2048 - off // 2048 + 1
                     END AS BIGINT) AS spans
         FROM o ORDER BY source, doc_id"""),

    // corpus novelty (TextAnalysis.corpusNovelty): per doc, the fraction
    // of its distinct 3-grams first seen AT this doc (first = min id) —
    // the "does this add new content" curation signal. One gram-keyed
    // min() aggregation + join-back + one id-keyed rollup; no window.
    "t22_corpus_novelty" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.TextAnalysis.corpusNovelty(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            shingleK = 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      """WITH s AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\W+'),
                              x -> x <> '') AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                       ELSE list_distinct(list_transform(
                              generate_series(1, len(toks) - 2),
                              i -> array_to_string(toks[i:i+2], ' '))) END
                    AS shset
           FROM s
           WHERE len(toks) > 0),
         g AS (SELECT doc_id, u.g FROM sh, unnest(shset) AS u(g)),
         f AS (SELECT g, min(doc_id) AS first_id FROM g GROUP BY g)
         SELECT g.doc_id,
                CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_novel,
                round(CAST(sum(CASE WHEN f.first_id = g.doc_id THEN 1
                                    ELSE 0 END) AS DOUBLE) / count(*), 6)
                  AS novelty
         FROM g JOIN f USING (g)
         GROUP BY g.doc_id ORDER BY g.doc_id"""),

    // packed-sequence SEGMENT table (Packing.packSegments): one row per
    // (sequence, document) contact with the in-sequence token span —
    // the cross-document attention/loss-mask metadata for packed
    // training sequences. Same single shard-keyed window as p02 plus a
    // map-side explode over each doc's spanned range; all-integer.
    "p12_pack_segments" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        graft.ops.Packing.packSegments(
            docs, "doc_id", "source",
            graft.ops.TextAnalysis.tokenCount(col("text")), budget = 2048)
          .orderBy(col("source"), col("seq_id"), col("seg_start"))
      },
      """WITH t AS (
           SELECT source, doc_id,
                  CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n
           FROM documents),
         o AS (
           SELECT source, doc_id, n,
                  coalesce(CAST(sum(n) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                    0) AS off
           FROM t WHERE n > 0),
         e AS (
           SELECT source, doc_id, n, off, u.s AS seq
           FROM o, unnest(generate_series(off // 2048,
                                          (off + n - 1) // 2048)) AS u(s))
         SELECT source, CAST(seq AS BIGINT) AS seq_id, doc_id,
                CAST(greatest(off, seq * 2048) - seq * 2048 AS BIGINT)
                  AS seg_start,
                CAST(least(off + n, (seq + 1) * 2048) - seq * 2048 AS BIGINT)
                  AS seg_end
         FROM e ORDER BY source, seq_id, seg_start"""),

    // BPE tokenization under a fixed merges table: per-doc subword token
    // counts (vs the regex word count) — the budget unit a training
    // pipeline actually pays in. Map-only codegen'd expression; the
    // oracle re-derives standard BPE in DuckDB with a recursive CTE over
    // the corpus's DISTINCT words (token boundaries as separators; one
    // lowest-rank merge application per step converges to the all-at-once
    // tokenization because merge constituents always come from lower
    // ranks — the real-vocabulary invariant).
    "t11_bpe_tokens" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            graft.ops.TextAnalysis.bpeTokenCount(col("text")).as("bpe_tokens"),
            graft.ops.TextAnalysis.tokenCount(col("text")).cast("long").as("re_tokens"))
          .orderBy(col("doc_id"))
      },
      s"""WITH RECURSIVE $bpeCountCtes
         SELECT d.doc_id, CAST(coalesce(pc.n, 0) AS BIGINT) AS bpe_tokens,
                CAST(len(regexp_extract_all(d.text, '\\w+')) AS BIGINT) AS re_tokens
         FROM documents d LEFT JOIN pc USING (doc_id)
         ORDER BY doc_id"""),

    // sequence packing under the BPE budget — p02's concat-and-chunk
    // with the budget counted in subword tokens instead of regex words,
    // so cut points line up with what the model consumes.
    "p08_pack_bpe" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Packing.packSequences(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "source",
            graft.ops.TextAnalysis.bpeTokenCount(col("text")), budget = 1024)
          .orderBy(col("source"), col("doc_id"))
      },
      s"""WITH RECURSIVE $bpeCountCtes,
         t AS (SELECT d.source, d.doc_id, CAST(coalesce(pc.n, 0) AS BIGINT) AS n_tokens
               FROM documents d LEFT JOIN pc USING (doc_id)),
         o AS (
           SELECT source, doc_id, n_tokens,
                  coalesce(CAST(sum(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                    0) AS off
           FROM t)
         SELECT source, doc_id, n_tokens,
                off // 1024 AS seq_id,
                off % 1024 AS seq_offset,
                CAST(CASE WHEN n_tokens = 0 THEN 0
                          ELSE (off + n_tokens - 1) // 1024 - off // 1024 + 1
                     END AS BIGINT) AS spans
         FROM o ORDER BY source, doc_id"""),

    // token-budget data mixing: cap each source's contribution at a BPE
    // token budget (the unit corpus recipes are specified in), docs kept
    // in deterministic id order while the cumulative count BEFORE the doc
    // is under budget (floors — the crossing doc is kept, matching
    // packing's straddle semantics). One shuffle on the source key.
    "sp06_token_budget_mix" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Sampling.tokenBudget(
            s.read.parquet(s"$dir/documents.parquet"), "source", "doc_id",
            graft.ops.TextAnalysis.bpeTokenCount(col("text")), budget = 5000)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("tokens_kept"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("source"))
      },
      s"""WITH RECURSIVE $bpeCountCtes,
         t AS (SELECT d.source, d.doc_id, CAST(coalesce(pc.n, 0) AS BIGINT) AS n_tokens
               FROM documents d LEFT JOIN pc USING (doc_id)),
         o AS (SELECT source, doc_id, n_tokens,
                      coalesce(CAST(sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                        0) AS off
               FROM t)
         SELECT source, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
                CAST(max(doc_id) AS BIGINT) AS last_doc
         FROM o WHERE off < 5000 GROUP BY source ORDER BY source"""),

    // packed-sequence MATERIALIZATION: the training artifact itself —
    // documents grouped by their starting (shard, sequence), concatenated
    // in deterministic doc order. Gated by the md5 of each concatenation
    // (scalar per the gate policy) so a single out-of-order or missing
    // doc flips the hash.
    "p09_pack_materialize" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .withColumn("text", coalesce(col("text"), lit("")))
        val packed = graft.ops.Packing.packSequences(docs, "doc_id", "source",
          graft.ops.TextAnalysis.bpeTokenCount(col("text")), budget = 1024)
        packed.join(docs.select(col("doc_id"), col("text")), "doc_id")
          .groupBy(col("source"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            md5(array_join(transform(
              array_sort(collect_list(struct(col("doc_id"), col("text")))),
              x => x.getField("text")), "\n")).as("seq_md5"))
          .orderBy(col("source"), col("seq_id"))
      },
      s"""WITH RECURSIVE $bpeCountCtes,
         t AS (SELECT d.source, d.doc_id, coalesce(d.text, '') AS text,
                      CAST(coalesce(pc.n, 0) AS BIGINT) AS n_tokens
               FROM documents d LEFT JOIN pc USING (doc_id)),
         o AS (SELECT source, doc_id, text, n_tokens,
                      coalesce(CAST(sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                        0) AS off
               FROM t)
         SELECT source, off // 1024 AS seq_id, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                md5(string_agg(text, chr(10) ORDER BY doc_id)) AS seq_md5
         FROM o GROUP BY source, off // 1024 ORDER BY source, seq_id"""),

    // end-to-end composed pipeline: exact dedup → quality features →
    // quality gate → join embeddings → per-language aggregate. The shape
    // of a real training-data curation job, fully oracle-checked.
    "p01_pipeline_e2e" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val kept = graft.ops.Dedup.exactDedup(docs, "text", "doc_id")
        val scored = graft.ops.TextAnalysis.qualityFeatures(kept, "text")
          .filter(col("n_tokens") >= 30)
        scored.join(emb, scored("doc_id") === emb("vec_id"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("quality_score").cast("decimal(18,6)")).cast("double").as("sq"),
            sum(col("label").cast("bigint")).as("sl"))
          .orderBy(col("lang"))
      },
      """WITH kept AS (
           SELECT doc_id, lang, text FROM (
             SELECT doc_id, lang, text,
                    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             FROM documents) t WHERE rn = 1),
         f AS (
           SELECT doc_id, lang,
                  len(regexp_extract_all(text, '\w+')) AS n_tokens,
                  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                  length(text) AS n_chars,
                  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|for|was)\b')) AS n_stop
           FROM kept),
         s AS (
           SELECT doc_id, lang, n_tokens,
                  least(1.0, greatest(0.0,
                    0.5 * least(CAST(n_tokens AS DOUBLE) / 64, 1.0)
                      + 0.3 * (CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1))
                      + 0.2 * least(10.0 * CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 1.0))) AS quality_score
           FROM f)
         SELECT s.lang, count(*) AS n,
                CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) AS sq,
                CAST(sum(CAST(e.label AS BIGINT)) AS BIGINT) AS sl
         FROM s JOIN embeddings e ON s.doc_id = e.vec_id
         WHERE s.n_tokens >= 30
         GROUP BY s.lang ORDER BY s.lang"""),

    // PII-style redaction (emails, URLs, IPs, phone spans) — the scrub
    // pass before text enters a corpus. PII is planted deterministically
    // from doc_id so the rules demonstrably bind; patterns are plain
    // RE2-compatible regexes applied in the same order by both engines.
    "t05_redact" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            graft.ops.TextAnalysis.redact(concat(
              substring(col("text"), 1, 40),
              lit(" mail user"), col("doc_id").cast("string"),
              lit("@ex.com visit http://t.co/x"), col("doc_id").cast("string"),
              lit(" call +1(415)555-01"), col("doc_id").cast("string"),
              lit(" ip 10.0.0.1 done"))).as("red"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  concat(substring(text, 1, 40),
                         ' mail user', CAST(doc_id AS VARCHAR),
                         '@ex.com visit http://t.co/x', CAST(doc_id AS VARCHAR),
                         ' call +1(415)555-01', CAST(doc_id AS VARCHAR),
                         ' ip 10.0.0.1 done'),
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  'https?://[^\s]+', '<URL>', 'g'),
                  '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                  '\+?\d[\d().-]{7,}\d', '<PHONE>', 'g') AS red
         FROM documents ORDER BY doc_id"""),

    // Gopher-style repetition signals (dup-word / top-word / dup-2gram
    // fractions, symbol ratio) — map-only lambda expressions, full oracle
    "t06_repetition" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.TextAnalysis.repetitionSignals(
            s.read.parquet(s"$dir/documents.parquet"), "text")
          .select(col("doc_id"), col("n_words"), col("dup_word_frac"),
            col("top_word_frac"), col("dup_2gram_frac"),
            col("symbol_word_ratio"))
          .orderBy(col("doc_id"))
      },
      """WITH t AS (
           SELECT doc_id, text, regexp_extract_all(text, '\w+') AS toks
           FROM documents),
         f AS (
           SELECT doc_id, text, toks, len(toks) AS n,
                  len(list_distinct(toks)) AS nd,
                  CASE WHEN len(toks) >= 2
                       THEN list_transform(generate_series(1, len(toks)-1),
                                           i -> toks[i] || ' ' || toks[i+1])
                       ELSE []::VARCHAR[] END AS grams
           FROM t)
         SELECT doc_id, CAST(n AS BIGINT) AS n_words,
                CASE WHEN n > 0 THEN 1.0 - CAST(nd AS DOUBLE) / n
                     ELSE 0.0 END AS dup_word_frac,
                CASE WHEN n > 0 THEN
                  CAST(list_max(list_transform(list_distinct(toks),
                    w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE) / n
                  ELSE 0.0 END AS top_word_frac,
                CASE WHEN len(grams) > 0 THEN
                  1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
                  ELSE 0.0 END AS dup_2gram_frac,
                CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
                  / greatest(n, 1) AS symbol_word_ratio
         FROM f ORDER BY doc_id"""),

    // unicode normalization (custom codegen expression over
    // java.text.Normalizer): decomposed combining sequences are prefixed
    // onto real corpus text so NFC actually rewrites something; oracled
    // char-for-char against DuckDB's nfc_normalize
    "t07_normalize" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val raw = concat(lit("cafe\u0301 nai\u0308ve "), substring(col("text"), 1, 30))
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            call_function("unicode_normalize", raw).as("nfc"),
            length(raw).cast("long").as("raw_len"),
            length(call_function("unicode_normalize", raw)).cast("long").as("nfc_len"))
          .orderBy(col("doc_id"))
      },
      """WITH t AS (
           SELECT doc_id,
                  'cafe' || chr(769) || ' nai' || chr(776) || 've ' ||
                    substr(text, 1, 30) AS raw
           FROM documents)
         SELECT doc_id, nfc_normalize(raw) AS nfc,
                CAST(length(raw) AS BIGINT) AS raw_len,
                CAST(length(nfc_normalize(raw)) AS BIGINT) AS nfc_len
         FROM t ORDER BY doc_id"""),

    // composed cluster-curation pipeline: banded LSH near-dup pairs ->
    // connected components -> keep one canonical doc per cluster ->
    // normalize + token-count the survivors -> per-source rollup.
    // Round-5/6 operators chained end-to-end under ONE oracle. Unlike
    // d08 (which unions synthetic ids), the plant here REPLACES the
    // embedding of every vec_id % 10 == 1 with a rotation of its
    // predecessor's vector, so the near-dup pairs land on REAL doc ids
    // and keepCanonical genuinely drops documents from the rollup.
    "p04_curate_clusters" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val prev = emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1L).as("vec_id"),
            rotVec(col("v"), 0.94).as("pv"))
        val planted = emb.join(prev, Seq("vec_id"), "left")
          .select(col("vec_id"),
            when(col("vec_id") % 10 === 1 && col("pv").isNotNull, col("pv"))
              .otherwise(col("v")).as("v"))
        val pairs = graft.ops.Dedup.embeddingPairsBanded(
          planted, "vec_id", "v", rowBits = 12, bands = 48, threshold = 0.9)
        val kept = graft.ops.Clustering.keepCanonical(docs, "doc_id", pairs)
        kept.select(col("source"),
            graft.ops.TextAnalysis.tokenCount(
              call_function("unicode_normalize", col("text"))).as("nt"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).cast("bigint").as("sum_tokens"))
          .orderBy(col("source"))
      },
      s"""WITH RECURSIVE base AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         prev AS (
           SELECT vec_id + 1 AS vec_id, ${rotSql("v")} AS pv
           FROM base WHERE vec_id % 10 = 0),
         planted AS (
           SELECT b.vec_id,
                  CASE WHEN b.vec_id % 10 = 1 AND prev.pv IS NOT NULL
                       THEN prev.pv ELSE b.v END AS v
           FROM base b LEFT JOIN prev USING (vec_id)),
         pr AS (
           SELECT a.vec_id AS cu, b.vec_id AS cv
           FROM planted a JOIN planted b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.v, b.v) >= 0.9),
         ed AS (SELECT cu, cv FROM pr UNION ALL SELECT cv, cu FROM pr),
         reach(id, lab) AS (
           SELECT vec_id, vec_id FROM embeddings
           UNION
           SELECT g.cv, r.lab FROM reach r JOIN ed g ON g.cu = r.id),
         comp AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id),
         -- drop ONLY non-canonical cluster members; docs without an
         -- embedding cannot be near-dup-checked and are kept (same
         -- semantics as keepCanonical's singleton fill)
         dropids AS (SELECT id FROM comp WHERE id <> cluster)
         SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(regexp_extract_all(nfc_normalize(d.text), '\\w+')))
                     AS BIGINT) AS sum_tokens
         FROM documents d
         WHERE NOT EXISTS (SELECT 1 FROM dropids x WHERE x.id = d.doc_id)
         GROUP BY d.source ORDER BY d.source"""),

    // per-group quantile quality gate: keep docs at/above their
    // language's median length — exact interpolated percentile
    // (Spark `percentile` ≡ DuckDB `quantile_cont`, verified
    // bit-identical including interpolated halves), thresholds join
    // back as a broadcast (one row per language)
    "p05_quantile_gate" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val med = docs.groupBy(col("lang"))
          .agg(expr("percentile(n_chars, 0.5)").as("med"))
        docs.join(broadcast(med), "lang")
          .filter(col("n_chars") >= col("med"))
          .groupBy(col("lang"), col("med"))
          .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("mn"))
          .orderBy(col("lang"))
      },
      """WITH m AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med
                    FROM documents GROUP BY lang)
         SELECT d.lang, m.med, CAST(count(*) AS BIGINT) AS n_kept,
                CAST(min(d.doc_id) AS BIGINT) AS mn
         FROM documents d JOIN m USING (lang)
         WHERE d.n_chars >= m.med
         GROUP BY d.lang, m.med ORDER BY d.lang"""),

    // TF-IDF characteristic terms per doc: three skew-proof equi-keyed
    // shuffles + broadcast scalar N; deterministic tie-break by term
    "t08_tfidf" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        // gated score is FIXED-POINT (round(score*1e6) as long): a
        // rounded-double output would be half-ulp boundary-brittle
        // across engines (repo determinism rules)
        graft.ops.TextAnalysis.tfidfTopTerms(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", k = 5)
          .select(col("doc_id"), col("rank"), col("term"),
            round(col("score") * lit(1.0e6)).cast("long").as("score_fp"))
          .orderBy(col("doc_id"), col("rank"))
      },
      """WITH toks AS (
           SELECT doc_id,
                  unnest(list_filter(string_split_regex(lower(text), '\W+'),
                                     x -> x <> '')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf
                FROM toks GROUP BY doc_id, term),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.term,
                  tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df) AS score
           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         ranked AS (
           SELECT doc_id, term, score,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, term) AS rank
           FROM scored)
         SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
                CAST(round(score * 1e6) AS BIGINT) AS score_fp
         FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank"""),

    // sliding-window token chunking (RAG shape): map-only expression
    // trees, one row per (doc, chunk start); overlap = size - stride
    "p03_chunk_overlap" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.TextAnalysis.chunkTokens(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            size = 20, stride = 15)
          .orderBy(col("doc_id"), col("start"))
      },
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(coalesce(text, '')), '\W+'),
                              x -> x <> '') AS toks
           FROM documents),
         s AS (SELECT doc_id, toks,
                      unnest(generate_series(1, greatest(len(toks), 1), 15)) AS start
               FROM t)
         SELECT doc_id, CAST(start AS BIGINT) AS start,
                array_to_string(toks[start:least(start + 19, len(toks))], ' ') AS chunk
         FROM s ORDER BY doc_id, start"""),

    // deterministic train/val/test split: pure function of md5(doc_id),
    // reproducible across engines/runs/cluster sizes — the oracle
    // recomputes the same md5-prefix thresholds (0.8/0.1/0.1 -> hex
    // cccc/e666)
    "sp01_det_split" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Sampling.deterministicSplit(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).cast("long").as("sc"),
            min(col("doc_id")).as("mn"))
          .orderBy(col("split"))
      },
      """SELECT split, count(*) AS n,
                CAST(sum(n_chars) AS BIGINT) AS sc, min(doc_id) AS mn
         FROM (SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                           ELSE 'test' END AS split, n_chars, doc_id
               FROM documents) t
         GROUP BY split ORDER BY split"""),

    // GROUP-AWARE split — the user-leakage guard row-hash splits lack:
    // the split key is the USER, so every event of a user lands in one
    // split and eval can never see a training user's behavior. The
    // no_leak gate proves disjointness in-plan (Σ per-split distinct
    // users == global distinct users — an equality that breaks the
    // moment any user straddles splits). Same md5-bucket determinism as
    // sp01 (floor(0.8*65536) = 0xcccc).
    // Deterministic k-fold assignment (k=5) via an integer Knuth
    // multiplicative hash of the row key — fully map-side, no shuffle
    // until the per-fold report rollup, and reproducible across engines
    // because the fold is pure int64 arithmetic (no float, no engine
    // RNG). The report self-audits the folds: n_test + n_train == N by
    // construction (the window sum runs over the k-row rollup only) and
    // langs_covered shows every fold sees the full label surface.
    // Class balancing by deterministic downsample: every language is cut
    // to the SMALLEST class's count, members chosen by md5-rank within
    // class (reproducible across runs/engines, no RNG). One window per
    // class partition + a broadcast of the single min-count row; the
    // output rollup audits the balance (all n equal) and pins WHICH
    // rows survived via id_sum/mn. The md5 rank also makes the cut
    // unbiased w.r.t. any natural ordering of the corpus.
    // DSIR importance weights (Sampling.dsirLogWeights): hashed-bigram
    // log-likelihood ratio of the English-target distribution vs the raw
    // corpus, md5-prefix buckets (B = 256) so both engines derive the
    // SAME bucket histogram, per-bucket log-ratios in 1e6 fixed point.
    "sp11_dsir_weights" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Sampling.dsirLogWeights(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            col("lang") === "en")
          .orderBy(col("doc_id"))
      },
      s"""WITH $dsirWeightCtes
         SELECT d.doc_id, CAST(coalesce(pd.n_grams, 0) AS BIGINT) AS n_grams,
                CAST(coalesce(pd.weight_fp, 0) AS BIGINT) AS weight_fp
         FROM documents d LEFT JOIN pd USING (doc_id)
         ORDER BY d.doc_id"""),

    // Neyman-optimal labeling-budget allocation
    // (Sampling.neymanAllocation): stratum h of the 1000-row budget
    // gets n_h ∝ N_h·σ_h, computed EXACTLY as floor(sqrt(N·Σx² −
    // (Σx)²)) — one grouped agg + one broadcast total, O(strata)
    // output. Truncating integer division matches DuckDB's //.
    "sp13_neyman_allocation" -> api(
      (s, dir) => {
        graft.ops.Sampling.neymanAllocation(
            s.read.parquet(s"$dir/documents.parquet"),
            "source", "n_chars", budget = 1000L)
          .orderBy(col("source"))
      },
      """WITH g AS (SELECT source, count(*) AS n_rows,
                  sum(n_chars) AS s1, sum(n_chars * n_chars) AS s2
           FROM documents
           WHERE n_chars IS NOT NULL AND source IS NOT NULL
           GROUP BY source),
         w AS (SELECT source, n_rows,
                  CAST(floor(sqrt(CAST(n_rows * s2 - s1 * s1 AS DOUBLE)))
                       AS BIGINT) AS w_fp
           FROM g),
         t AS (SELECT sum(w_fp) AS wsum FROM w)
         SELECT w.source, w.n_rows, w.w_fp,
                CAST(CASE WHEN t.wsum > 0 THEN 1000 * w.w_fp // t.wsum
                          ELSE 0 END AS BIGINT) AS alloc
         FROM w, t ORDER BY w.source"""),

    // ...and the allocation EXECUTED (Sampling.neymanSample): each
    // stratum gated at rate alloc/n_rows on the deterministic md5
    // bucket grid — map-only after one broadcast, kept counts tracking
    // the allocation to bucket granularity, reproducible cross-engine
    "sp14_neyman_sample" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        // budget 100 over ~25-doc strata puts every threshold strictly
        // inside the bucket grid, so the oracle genuinely discriminates
        // on the md5 gate (a saturating budget would keep 100% of rows
        // and verify nothing about the gate); the ONE allocation frame
        // feeds both the gate and the report columns
        val alloc = graft.ops.Sampling.neymanAllocation(
          docs, "source", "n_chars", budget = 100L)
        val kept = graft.ops.Sampling.neymanSample(
            docs, "source", "n_chars", "doc_id", alloc)
          .groupBy(col("source")).agg(count(lit(1)).as("n_sampled"))
        alloc.join(kept, Seq("source"), "left")
          .select(col("source"), col("n_rows"), col("alloc"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
          .orderBy(col("source"))
      },
      """WITH g AS (SELECT source, count(*) AS n_rows,
                  sum(n_chars) AS s1, sum(n_chars * n_chars) AS s2
           FROM documents
           WHERE n_chars IS NOT NULL AND source IS NOT NULL
           GROUP BY source),
         w AS (SELECT source, n_rows,
                  CAST(floor(sqrt(CAST(n_rows * s2 - s1 * s1 AS DOUBLE)))
                       AS BIGINT) AS w_fp
           FROM g),
         t AS (SELECT sum(w_fp) AS wsum FROM w),
         a AS (SELECT w.source, w.n_rows,
                  CAST(CASE WHEN t.wsum > 0 THEN 100 * w.w_fp // t.wsum
                            ELSE 0 END AS BIGINT) AS alloc
           FROM w CROSS JOIN t),
         thr AS (SELECT source, n_rows, alloc,
                  alloc * 65536 // n_rows AS thr FROM a),
         k AS (SELECT d.source, count(*) AS n_sampled
           FROM documents d JOIN thr ON d.source = thr.source
           WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                      AS INTEGER) < thr.thr
           GROUP BY d.source)
         SELECT thr.source, thr.n_rows, thr.alloc,
                CAST(coalesce(k.n_sampled, 0) AS BIGINT) AS n_sampled
         FROM thr LEFT JOIN k USING (source) ORDER BY source"""),

    // Gumbel-top-k importance RESAMPLING over the sp11 weights
    // (Sampling.gumbelTopK): perturb each log-weight with a Gumbel draw
    // from a deterministic md5-derived uniform and keep the 50 largest
    // keys — weighted sampling without replacement, reproducible across
    // engines (u is exact: integer-valued double + 0.5 over a power of
    // two; the ln/ln pair lands in 1e6 fixed point for the output).
    "sp12_gumbel_topk" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val w = graft.ops.Sampling.dsirLogWeights(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            col("lang") === "en")
          .select(col("doc_id"),
            (col("weight_fp").cast("double") / 1e6).as("w"))
        graft.ops.Sampling.gumbelTopK(w, "doc_id", "w", k = 50)
          .select(col("doc_id"), col("rank"),
            round(col("key") * 1e6).cast("long").as("key_fp"))
          .orderBy(col("rank"))
      },
      s"""WITH $dsirWeightCtes,
         w2 AS (SELECT d.doc_id,
                       CAST(coalesce(pd.weight_fp, 0) AS DOUBLE) / 1e6 AS w
                FROM documents d LEFT JOIN pd USING (doc_id)),
         g AS (SELECT doc_id,
                 ((w / 1.0) + (-ln(-ln(
                   (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         AS BIGINT) + 0.5) / 4294967296.0)))) AS key
               FROM w2),
         r AS (SELECT doc_id, key,
                      CAST(row_number() OVER (ORDER BY key DESC, doc_id)
                           AS BIGINT) AS rank
               FROM g)
         SELECT doc_id, rank, CAST(round(key * 1e6) AS BIGINT) AS key_fp
         FROM r WHERE rank <= 50 ORDER BY rank"""),

    "sp10_class_balance" -> api(
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val d = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"))
        val k = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .agg(min(col("n")).as("__k"))
        d.withColumn("rn", row_number().over(
            W.partitionBy(col("lang"))
              .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
          .join(broadcast(k))
          .filter(col("rn") <= col("__k"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("doc_id")).cast("long").as("id_sum"),
            min(col("doc_id")).as("mn"))
          .orderBy(col("lang"))
      },
      """WITH k AS (SELECT min(n) AS k FROM
             (SELECT lang, count(*) AS n FROM documents GROUP BY 1)),
         r AS (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
               FROM documents)
         SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
                min(doc_id) AS mn
         FROM r, k WHERE rn <= k.k GROUP BY lang ORDER BY lang"""),

    "sp09_kfold" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"))
        val folded = docs.withColumn("fold",
          (col("doc_id") * 2654435761L) % 4294967296L % 5)
        folded.groupBy(col("fold"))
          .agg(count(lit(1)).as("n_test"),
            count_distinct(col("lang")).as("langs_covered"),
            min(col("doc_id")).as("first_doc"))
          .withColumn("n_train",
            sum(col("n_test")).over(org.apache.spark.sql.expressions
              .Window.partitionBy()) - col("n_test"))
          .orderBy(col("fold"))
      },
      """WITH f AS (SELECT ((doc_id * 2654435761) % 4294967296) % 5
                      AS fold, lang, doc_id FROM documents),
         r AS (SELECT fold, count(*) AS n_test,
                      count(DISTINCT lang) AS langs_covered,
                      min(doc_id) AS first_doc
               FROM f GROUP BY fold)
         SELECT fold, n_test, langs_covered, first_doc,
                CAST(sum(n_test) OVER () - n_test AS BIGINT) AS n_train
         FROM r ORDER BY fold"""),

    "sp08_group_split" -> api(
      (s, dir) => {
        val ev = graft.streaming.Events.readRaw(s, dir)
        val tagged = ev.withColumn("split",
          graft.ops.Sampling.splitTag(col("user_id"),
            Seq("train" -> 0.8, "eval" -> 0.2)))
        val per = tagged.groupBy(col("split"))
          .agg(count(lit(1)).as("n_events"),
            count_distinct(col("user_id")).as("n_users"))
        val total = ev.agg(count_distinct(col("user_id")).as("__tu"))
        per.crossJoin(broadcast(total))
          .withColumn("no_leak",
            sum(col("n_users")).over(
              org.apache.spark.sql.expressions.Window.partitionBy())
              === col("__tu"))
          .select(col("split"), col("n_events"), col("n_users"),
            col("no_leak"))
          .orderBy(col("split"))
      },
      """WITH t AS (SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)),
                                  1, 4) < 'cccc'
                               THEN 'train' ELSE 'eval' END AS split,
                         user_id
                  FROM events),
         per AS (SELECT split, count(*) AS n_events,
                        count(DISTINCT user_id) AS n_users
                 FROM t GROUP BY split),
         tot AS (SELECT count(DISTINCT user_id) AS tu FROM events)
         SELECT split, n_events, CAST(n_users AS BIGINT) AS n_users,
                (SELECT sum(n_users) FROM per) = tu AS no_leak
         FROM per, tot ORDER BY split"""),

    // weighted corpus mixing: up-weight English (1.4 -> one full epoch +
    // a deterministic hash-sampled 0.4 remainder) and down-sample the
    // rest to 0.5 — the oracle reproduces the md5-prefix thresholds
    // exactly (floor(0.4*65536)=0x6666, floor(0.5*65536)=0x8000)
    "sp03_weighted_mix" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        graft.ops.Sampling.weightedMix(
            Seq(docs.filter(col("lang") === "en") -> 1.4,
              docs.filter(col("lang") =!= "en") -> 0.5), "doc_id")
          .select(col("doc_id"), col("mix_epoch").cast("long").as("mix_epoch"))
          .orderBy(col("doc_id"), col("mix_epoch"))
      },
      """SELECT doc_id, CAST(e AS BIGINT) AS mix_epoch FROM (
           SELECT doc_id, 0 AS e FROM documents WHERE lang = 'en'
           UNION ALL
           SELECT doc_id, 1 FROM documents
           WHERE lang = 'en'
             AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '6666'
           UNION ALL
           SELECT doc_id, 0 FROM documents
           WHERE lang <> 'en'
             AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000') t
         ORDER BY doc_id, mix_epoch"""),

    // per-group quota: cap any one source's contribution at 15 documents
    // (first 15 by n_chars asc, id asc; corpus has 25/source, so the cap
    // genuinely binds) — one shuffle on the group key
    "sp02_group_quota" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Sampling.perGroupQuota(
            s.read.parquet(s"$dir/documents.parquet"),
            groupCol = "source", orderCol = "n_chars", idCol = "doc_id",
            quota = 15)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, n_chars,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS rn
           FROM documents) t
         WHERE rn <= 15 ORDER BY doc_id"""),

    // multimodal: binary payload column + expression-level metadata decode
    // (codec-level decode is the ScalaTest-covered stub; SURVEY brief)
    "m01_multimodal_meta" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        m.metaDecode(
            m.withBinaryPayload(s.read.parquet(s"$dir/documents.parquet"), "text"),
            "doc_id", "payload")
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
                CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                CAST(octet_length(encode(text)) % 512 + 1 AS INTEGER) AS width,
                CAST(octet_length(encode(text)) * 7 % 384 + 1 AS INTEGER) AS height,
                3 AS channels
         FROM documents ORDER BY doc_id"""),

    // multimodal: REAL codec decode. Each document's utf-8 bytes become a
    // 24-bit BI_RGB BMP (width 16 -> 48-byte rows, no alignment padding),
    // then the pure-JVM BMP decoder recovers the dimensions partition-wise.
    // The oracle recomputes the container arithmetic from the byte length;
    // pixel-level decode correctness (incl. padding and bottom-up rows)
    // is OpsSpec golden-tested.
    "m02_codec_decode" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        m.decodeMedia(
            m.withBmpPayload(s.read.parquet(s"$dir/documents.parquet"),
              "doc_id", "text", width = 16),
            "doc_id", "payload")
          .select(col("doc_id"), col("format"), col("n_bytes"),
            col("width"), col("height"), col("channels"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, 'bmp' AS format,
                CAST(54 + 48 * greatest(octet_length(encode(text)) // 48, 1) AS INTEGER) AS n_bytes,
                16 AS width,
                CAST(greatest(octet_length(encode(text)) // 48, 1) AS INTEGER) AS height,
                3 AS channels
         FROM documents ORDER BY doc_id"""),

    // multimodal pipeline verbs: encode -> RESIZE (nearest-neighbor,
    // decode+resample+re-encode per partition) -> decode. The recovered
    // 8x6 container dims are constant arithmetic for the oracle; pixel
    // correctness of the resample is OpsSpec golden-tested.
    "m03_resize" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        m.decodeMedia(
            m.resizeImages(
              m.withBmpPayload(s.read.parquet(s"$dir/documents.parquet"),
                "doc_id", "text", width = 16),
              "doc_id", "payload", newW = 8, newH = 6),
            "doc_id", "payload")
          .select(col("doc_id"), col("format"), col("n_bytes"),
            col("width"), col("height"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, 'bmp' AS format,
                CAST(54 + 24 * 6 AS INTEGER) AS n_bytes,
                8 AS width, 6 AS height
         FROM documents ORDER BY doc_id"""),

    // audio resampling: 8 kHz corpus WAVs upsampled 2x by linear
    // interpolation, then re-encoded and re-decoded — the checksum
    // (exact integer sum of ALL output samples) proves the
    // interpolate→encode→decode path bit-faithful against the oracle's
    // per-byte reconstruction: out[2i]=s[i], out[2i+1]=s[i]+(s[i+1]-s[i])/2
    // with truncating integer division (same rounding as DuckDB's //).
    "m12_audio_resample" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        m.audioChecksum(
            m.resampleAudio(
              m.withWavPayload(
                s.read.parquet(s"$dir/documents.parquet")
                  .withColumn("text", coalesce(col("text"), lit(""))),
                "doc_id", "text", sampleRate = 8000),
              "doc_id", "payload", factor = 2),
            "doc_id", "payload")
          .orderBy(col("doc_id"))
      },
      """WITH d AS (SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
                  octet_length(encode(coalesce(text, ''))) AS len
           FROM documents),
         px AS (SELECT doc_id, u.i AS i,
                  CAST('0x' || substr(hx, 2 * u.i + 1, 2) AS INTEGER) AS v
           FROM d, unnest(generate_series(0, len - 1)) AS u(i)
           WHERE len > 0),
         pr AS (SELECT doc_id, v,
                  lead(v) OVER (PARTITION BY doc_id ORDER BY i) AS nv
           FROM px),
         sm AS (SELECT doc_id, count(*) AS n, sum(v) AS sv,
                  sum(CASE WHEN nv IS NOT NULL
                           THEN v + (nv - v) // 2 ELSE 0 END) AS si
           FROM pr GROUP BY doc_id)
         SELECT d.doc_id, CAST(16000 AS INTEGER) AS sample_rate,
                CAST(CASE WHEN sm.n IS NULL THEN 0
                          ELSE 2 * sm.n - 1 END AS BIGINT) AS n_samples,
                CAST(coalesce(sm.sv, 0) + coalesce(sm.si, 0) AS BIGINT)
                  AS sum_samples
         FROM d LEFT JOIN sm USING (doc_id) ORDER BY d.doc_id"""),

    // multimodal audio: WAV payloads built from corpus bytes (one PCM
    // sample per utf-8 byte) -> keep every 4th frame -> re-decode. The
    // oracle recomputes the container arithmetic from the byte length:
    // kept = ceil(n/4) frames, 44-byte header + 2 bytes/sample, rate
    // 8000/4, duration = kept/2000 (one IEEE division on both engines).
    "m04_frame_sample" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        // coalesce(text,'') on BOTH engines: the WAV builder would map a
        // null source to an empty-sample container while the oracle's
        // octet_length(encode(text)) yields NULL — pin the contract so a
        // future null-text corpus cannot diverge
        m.decodeMedia(
            m.frameSampleAudio(
              m.withWavPayload(
                s.read.parquet(s"$dir/documents.parquet")
                  .withColumn("text", coalesce(col("text"), lit(""))),
                "doc_id", "text", sampleRate = 8000),
              "doc_id", "payload", everyN = 4),
            "doc_id", "payload")
          .select(col("doc_id"), col("format"), col("n_bytes"),
            col("channels"), col("sample_rate"), col("duration_s"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, 'wav' AS format,
                CAST(44 + 2 * ((octet_length(encode(coalesce(text, ''))) + 3) // 4) AS INTEGER) AS n_bytes,
                CAST(1 AS INTEGER) AS channels,
                CAST(2000 AS INTEGER) AS sample_rate,
                CAST((octet_length(encode(coalesce(text, ''))) + 3) // 4 AS DOUBLE) / 2000 AS duration_s
         FROM documents ORDER BY doc_id"""),

    // multimodal: PNG round-trip through a REAL compression codec —
    // utf-8 bytes -> RGB pixels -> Deflater + per-row predictive filters
    // (cycling all five) -> full chunk-walk + Inflater + unfilter decode.
    // PNG is lossless, so the recovered per-channel means equal the m05
    // byte arithmetic exactly; the oracle re-derives them from the raw
    // bytes, proving the whole compress/filter/decompress path is
    // bit-faithful. Map-only (payloads never shuffle), like every codec
    // pass.
    "m10_png_roundtrip" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        m.pngFeatures(
            m.withPngPayload(
              s.read.parquet(s"$dir/documents.parquet")
                .withColumn("text", coalesce(col("text"), lit(""))),
              "doc_id", "text", width = 16),
            "doc_id", "payload")
          .orderBy(col("doc_id"))
      },
      """WITH d AS (
           SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
                  octet_length(encode(coalesce(text, ''))) AS len
           FROM documents),
         dims AS (SELECT doc_id, hx, len, greatest(len // 48, 1) AS height FROM d),
         px AS (SELECT doc_id, u.i AS i,
                       CASE WHEN u.i < len
                            THEN CAST('0x' || substr(hx, 2 * u.i + 1, 2) AS INTEGER)
                            ELSE 0 END AS v
                FROM dims, unnest(generate_series(0, height * 48 - 1)) AS u(i)),
         agg AS (SELECT doc_id,
                        sum(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS sr,
                        sum(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS sg,
                        sum(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS sb
                 FROM px GROUP BY doc_id)
         SELECT dims.doc_id, CAST(16 AS INTEGER) AS width,
                CAST(dims.height AS INTEGER) AS height,
                CAST(3 AS INTEGER) AS channels,
                CAST(agg.sr AS DOUBLE) / (16 * dims.height) AS mean_r,
                CAST(agg.sg AS DOUBLE) / (16 * dims.height) AS mean_g,
                CAST(agg.sb AS DOUBLE) / (16 * dims.height) AS mean_b
         FROM dims JOIN agg USING (doc_id) ORDER BY dims.doc_id"""),

    // multimodal: resize THROUGH the compressed container — PNG decode,
    // nearest-neighbor resample, PNG re-encode, then a second full
    // decode recovers the new dims. n_bytes is deflate-dependent and
    // deliberately not asserted; resample pixel correctness is OpsSpec
    // golden-tested (shared resampler with the BMP path).
    "m11_png_resize" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        m.decodeMedia(
            m.resizeImages(
              m.withPngPayload(s.read.parquet(s"$dir/documents.parquet"),
                "doc_id", "text", width = 16),
              "doc_id", "payload", newW = 8, newH = 6),
            "doc_id", "payload")
          .select(col("doc_id"), col("format"),
            col("width"), col("height"), col("channels"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, 'png' AS format, 8 AS width, 6 AS height,
                3 AS channels
         FROM documents ORDER BY doc_id"""),

    // image feature extraction end-to-end: BMP payloads from corpus
    // bytes -> width/height/channels + per-channel means. The oracle
    // re-derives every pixel from the utf-8 bytes (hex-pair extraction):
    // height = len div 48 full rows (encode truncates, zero-pads a short
    // single row), channel c = byte positions i % 3 == c, mean = integer
    // channel sum / (16*height) — one IEEE division on both engines.
    "m05_image_features" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        m.imageFeatures(
            m.withBmpPayload(
              s.read.parquet(s"$dir/documents.parquet")
                .withColumn("text", coalesce(col("text"), lit(""))),
              "doc_id", "text", width = 16),
            "doc_id", "payload")
          .orderBy(col("doc_id"))
      },
      """WITH d AS (
           SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
                  octet_length(encode(coalesce(text, ''))) AS len
           FROM documents),
         dims AS (SELECT doc_id, hx, len, greatest(len // 48, 1) AS height FROM d),
         px AS (SELECT doc_id, u.i AS i,
                       CASE WHEN u.i < len
                            THEN CAST('0x' || substr(hx, 2 * u.i + 1, 2) AS INTEGER)
                            ELSE 0 END AS v
                FROM dims, unnest(generate_series(0, height * 48 - 1)) AS u(i)),
         agg AS (SELECT doc_id,
                        sum(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS sb,
                        sum(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS sg,
                        sum(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS sr
                 FROM px GROUP BY doc_id)
         SELECT dims.doc_id, CAST(16 AS INTEGER) AS width,
                CAST(dims.height AS INTEGER) AS height,
                CAST(3 AS INTEGER) AS channels,
                CAST(agg.sb AS DOUBLE) / (16 * dims.height) AS mean_b,
                CAST(agg.sg AS DOUBLE) / (16 * dims.height) AS mean_g,
                CAST(agg.sr AS DOUBLE) / (16 * dims.height) AS mean_r
         FROM dims JOIN agg USING (doc_id) ORDER BY dims.doc_id"""),

    // image near-duplicate detection via 64-bit perceptual hash (aHash):
    // decode → 8×8 grid sample → integer grayscale → mean threshold,
    // then the SAME pigeonhole pair machinery as simhash text dedup
    // (chunks=4 / h<=3 — the documented 100 TB setting; recall guarantee
    // maxHamming <= chunks-1 holds). All-integer, so the oracle
    // re-derives every hash bit from the payload bytes and enumerates
    // pairs exhaustively — the measured corpus has 42 identical-image
    // pairs at hamming 0 and NOTHING at 1-3, so the h<=3 gate is
    // boundary-proof, not threshold-lucky.
    "m07_image_phash_pairs" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .withColumn("text", coalesce(col("text"), lit("")))
        val fp = m.imagePHash(
          m.withBmpPayload(docs, "doc_id", "text", width = 16),
          "doc_id", "payload")
        graft.ops.Dedup.fingerprintPairs(fp, maxHamming = 3, chunks = 4)
          .select(col("id_a"), col("id_b"),
            col("hamming").cast("long").as("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      s"""WITH $phashCtes
         SELECT id_a, id_b, hamming FROM hm
         WHERE hamming <= 3 ORDER BY id_a, id_b"""),

    // Image duplicate CLUSTERS: m07's perceptual-hash pairs resolved to
    // connected components (the d08 machinery on the multimodal side) —
    // the asset-level dedup a crawl's image store runs. The oracle
    // re-derives every hash bit AND the transitive closure (recursive
    // CTE), so the green hash proves pair recall and cluster resolution
    // together.
    "m09_image_dup_clusters" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .withColumn("text", coalesce(col("text"), lit("")))
        val fp = m.imagePHash(
          m.withBmpPayload(docs, "doc_id", "text", width = 16),
          "doc_id", "payload")
        val pairs = graft.ops.Dedup.fingerprintPairs(fp, maxHamming = 3,
          chunks = 4)
        graft.ops.Clustering.connectedComponents(
            docs.select(col("doc_id")), "doc_id", pairs)
          .orderBy(col("doc_id"))
      },
      s"""WITH RECURSIVE $phashCtes,
         p2 AS (SELECT id_a, id_b FROM hm WHERE hamming <= 3),
         edges AS (SELECT id_a AS eu, id_b AS ev FROM p2
                   UNION ALL SELECT id_b, id_a FROM p2),
         reach(id, lab) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT g.ev, r.lab FROM reach r JOIN edges g ON g.eu = r.id),
         comp AS (SELECT id AS doc_id, min(lab) AS cluster
                  FROM reach GROUP BY id)
         SELECT doc_id, cluster, (doc_id = cluster) AS is_canonical
         FROM comp ORDER BY doc_id"""),

    // CDC latest-wins upsert: base snapshot + a keyed revision delta
    // (every 10th order re-priced at 2x, version 1) folded by
    // row_number-over-key — the incremental-snapshot primitive a corpus
    // refresh needs. Gate aggregates the merged snapshot per status with
    // cents-exact revenue and the count of keys the delta won.
    "u01_upsert" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val base = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("ver", lit(0L))
        val delta = s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") * 2).as("o_totalprice"))
          .withColumn("ver", lit(1L))
        graft.ops.Cdc.upsert(base, delta, Seq("o_orderkey"), "ver")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
            sum((col("ver") === 1).cast("long")).as("n_updated"))
          .orderBy(col("o_orderstatus"))
      },
      """WITH delta AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
                  1 AS ver
           FROM orders WHERE o_orderkey % 10 = 0),
         merged AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS ver FROM orders
           UNION ALL SELECT * FROM delta),
         latest AS (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                        ORDER BY ver DESC) AS rn
           FROM merged)
         SELECT o_orderstatus, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
                CAST(sum(CASE WHEN ver = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
         FROM latest WHERE rn = 1
         GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    // corpus-trained bigram LM quality scoring (CCNet/KenLM-style
    // perplexity gate): add-one-smoothed p(b|a), per-doc sum of
    // FIXED-POINT log-probs (integer sum -> partition-order-proof)
    "t09_lm_score" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.TextAnalysis.bigramLmScore(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      """WITH s AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(coalesce(text, '')), '\W+'),
                              x -> x <> '') AS toks
           FROM documents),
         bg AS (SELECT doc_id, toks[i] AS a, toks[i+1] AS b
                FROM s, unnest(generate_series(1, len(toks)-1)) AS u(i)),
         uni AS (SELECT unnest(toks) AS t FROM s),
         c1 AS (SELECT t, count(*) AS c1 FROM uni GROUP BY t),
         c2 AS (SELECT a, b, count(*) AS c2 FROM bg GROUP BY a, b),
         v AS (SELECT count(DISTINCT t) AS v FROM uni),
         sc AS (SELECT bg.doc_id,
                       CAST(round(ln(CAST(c2.c2 + 1 AS DOUBLE) /
                                     CAST(c1.c1 + v.v AS DOUBLE)) * 1e6) AS BIGINT) AS fp
                FROM bg JOIN c2 USING (a, b) JOIN c1 ON bg.a = c1.t CROSS JOIN v),
         pd AS (SELECT doc_id, count(*) AS n_bigrams, sum(fp) AS score_fp
                FROM sc GROUP BY doc_id)
         SELECT d.doc_id, CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                CAST(coalesce(pd.score_fp, 0) AS BIGINT) AS score_fp
         FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id"""),

    // temperature-based source re-balancing (mC4/mT5 mixing rule,
    // alpha=0.5): keep rates (n_min/n_s)^0.5 derived from per-source
    // counts, applied as a deterministic md5-bucket gate — the oracle
    // re-derives the exact thresholds (sqrt and / are correctly rounded,
    // so both engines compute identical doubles)
    "sp04_temperature_mix" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Sampling.temperatureSample(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "source")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).cast("long").as("sc"),
            min(col("doc_id")).as("mn"))
          .orderBy(col("source"))
      },
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         m AS (SELECT min(n) AS nmin FROM c),
         r AS (SELECT source,
                      CAST(floor(sqrt(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE)) * 65536) AS BIGINT) AS thr
               FROM c CROSS JOIN m)
         SELECT d.source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sc,
                min(doc_id) AS mn
         FROM documents d JOIN r ON d.source = r.source
         WHERE r.thr >= 65536
            OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', r.thr)
         GROUP BY d.source ORDER BY d.source"""),

    // range-partitioned + sorted parquet layout: the 100 TB zone-map
    // story — repartitionByRange co-locates key ranges per file and
    // sortWithinPartitions orders row groups, so a key-range predicate
    // prunes files AND row groups on read-back (PlanSpec pins the pushed
    // filter on the scan)
    "io05_sorted_layout" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val tmp = scratchDir(s"io05_sorted_${new java.io.File(dir).getName}")
        s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .repartitionByRange(8, col("o_orderkey"))
          .sortWithinPartitions(col("o_orderkey"))
          .write.mode("overwrite").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("o_orderkey").between(1000, 5000))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
            min(col("o_orderkey")).as("mn"), max(col("o_orderkey")).as("mx"))
      },
      """SELECT count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
                min(o_orderkey) AS mn, max(o_orderkey) AS mx
         FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000"""),

    // append-mode watermarked streaming aggregation: each hourly window
    // emits exactly once when the watermark passes its end — state is
    // dropped at emission (bounded by open windows, not stream length),
    // where Complete mode (st03) re-emits full history every trigger.
    // Oracle = batch windows with end <= max(ts) - delay (boundary
    // inclusive, verified by probe).
    "st04_stream_append" -> api(
      (outer, dir) => {
        val s = outer.newSession()   // state partitions sized to key count
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val out = graft.streaming.Events.streamingHourlyClosed(
          graft.streaming.Events.readStream(s, dir))
        val sink = "st04_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .select(unix_micros(col("h_end")).as("h_end"), col("event_type"),
            col("n"), col("sv").cast("double").as("sv"))
          .orderBy(col("h_end"), col("event_type"))
      },
      """WITH mx AS (SELECT max(ts) AS mt FROM events)
         SELECT epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS h_end,
                event_type, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
         FROM events CROSS JOIN mx
         WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mt - INTERVAL 30 MINUTE
         GROUP BY 1, 2 ORDER BY 1, 2"""),

    // exact phrase search over positional postings (Search.phraseSearch,
    // s18): the inverted-index-with-positions eval run relationally —
    // postings filter to the phrase's own tokens BEFORE any shuffle,
    // then one (doc, pos + i) hash equi-join per additional token, so
    // join fan-in is occurrence counts, never corpus size. Complements
    // s15's bag-of-words BM25 with exact consecutive-token matching.
    // proximity search (Search.proximitySearch, s19): docs containing
    // ALL query terms with the minimum covering token window — the
    // relevance signal between bm25's bag-of-words and s18's exact
    // phrase. Posting filtered to query terms before any shuffle,
    // materialized once; one doc-keyed join per extra term enumerates
    // occurrence combos (per-doc cost = product of occurrence counts —
    // selective-terms contract, cap-guarded in the API). The oracle
    // enumerates the same combos exhaustively.
    "s19_proximity_search" -> api(
      (s, dir) => {
        graft.ops.Search.proximitySearch(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            Seq("vector", "merge", "scan"))
          .orderBy(col("doc_id"))
      },
      """WITH s AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\W+'),
                   x -> x <> '') AS toks FROM documents),
         tk AS (SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) - 1 AS pos
                FROM s),
         c AS (SELECT a.doc_id, a.pos AS p0, b.pos AS p1, d.pos AS p2
               FROM tk a
               JOIN tk b ON a.doc_id = b.doc_id
               JOIN tk d ON a.doc_id = d.doc_id
               WHERE a.tok = 'vector' AND b.tok = 'merge'
                 AND d.tok = 'scan')
         SELECT doc_id,
                CAST(min(greatest(p0, p1, p2) - least(p0, p1, p2))
                     AS BIGINT) AS min_span,
                count(*) AS n_combos
         FROM c GROUP BY doc_id ORDER BY doc_id"""),

    "s18_phrase_search" -> api(
      (s, dir) => {
        graft.ops.Search.phraseSearch(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            phrase = "slow hash batch")
          .orderBy(col("doc_id"))
      },
      """WITH tk AS (SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\W+'),
                              x -> x <> '') AS t
           FROM documents WHERE text IS NOT NULL),
         p AS (SELECT doc_id, u.i - 1 AS pos, t[u.i] AS tok
               FROM tk, unnest(generate_series(1, len(t))) AS u(i)),
         m AS (SELECT a.doc_id, a.pos
               FROM p a
               JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                       AND b.tok = 'hash'
               JOIN p c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
                       AND c.tok = 'batch'
               WHERE a.tok = 'slow')
         SELECT doc_id, count(*) AS n_matches,
                CAST(min(pos) AS BIGINT) AS first_pos
         FROM m GROUP BY doc_id ORDER BY doc_id"""),

    // MMR diversified retrieval (Search.mmr): greedy maximal-marginal-
    // relevance re-rank of probe 0's top-16 cosine pool, k = 5, λ = 0.5
    // (binary-exact). The pairwise sim matrix is bounded pool², computed
    // through the same codegen'd cosine kernel as retrieval; the 5-step
    // greedy is driver-side control flow over ~16 scores (the centroid-
    // collect pattern). Oracle: the greedy unrolled to 5 chained
    // argmax-CTEs, ties on ascending id at every step.
    "s17_mmr_rerank" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        graft.ops.Search.mmr(emb, emb.filter(col("vec_id") === 0),
            "vec_id", "embedding", poolSize = 16, k = 5)
          .orderBy(col("rank"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
         p AS (SELECT emb FROM e WHERE vec_id = 0),
         pool AS (SELECT c.vec_id AS cid,
                         list_cosine_similarity(p.emb, c.emb) AS sim, c.emb
                  FROM e c, p WHERE c.vec_id <> 0
                  ORDER BY sim DESC, c.vec_id LIMIT 16),
         pr AS (SELECT a.cid AS ia, b.cid AS ib,
                       list_cosine_similarity(a.emb, b.emb) AS s
                FROM pool a, pool b WHERE a.cid <> b.cid),
         s1 AS (SELECT cid, (0.5 * sim) AS m FROM pool
                ORDER BY (0.5 * sim) DESC, cid LIMIT 1),
         sel1 AS (SELECT cid FROM s1),
         s2 AS (SELECT c.cid,
                  ((0.5 * c.sim) - (0.5 * (SELECT max(pr.s) FROM pr
                    WHERE pr.ia = c.cid
                      AND pr.ib IN (SELECT cid FROM sel1)))) AS m
                FROM pool c WHERE c.cid NOT IN (SELECT cid FROM sel1)
                ORDER BY m DESC, c.cid LIMIT 1),
         sel2 AS (SELECT cid FROM sel1 UNION ALL SELECT cid FROM s2),
         s3 AS (SELECT c.cid,
                  ((0.5 * c.sim) - (0.5 * (SELECT max(pr.s) FROM pr
                    WHERE pr.ia = c.cid
                      AND pr.ib IN (SELECT cid FROM sel2)))) AS m
                FROM pool c WHERE c.cid NOT IN (SELECT cid FROM sel2)
                ORDER BY m DESC, c.cid LIMIT 1),
         sel3 AS (SELECT cid FROM sel2 UNION ALL SELECT cid FROM s3),
         s4 AS (SELECT c.cid,
                  ((0.5 * c.sim) - (0.5 * (SELECT max(pr.s) FROM pr
                    WHERE pr.ia = c.cid
                      AND pr.ib IN (SELECT cid FROM sel3)))) AS m
                FROM pool c WHERE c.cid NOT IN (SELECT cid FROM sel3)
                ORDER BY m DESC, c.cid LIMIT 1),
         sel4 AS (SELECT cid FROM sel3 UNION ALL SELECT cid FROM s4),
         s5 AS (SELECT c.cid,
                  ((0.5 * c.sim) - (0.5 * (SELECT max(pr.s) FROM pr
                    WHERE pr.ia = c.cid
                      AND pr.ib IN (SELECT cid FROM sel4)))) AS m
                FROM pool c WHERE c.cid NOT IN (SELECT cid FROM sel4)
                ORDER BY m DESC, c.cid LIMIT 1)
         SELECT rank, cid AS vec_id, m AS mmr FROM (
           SELECT CAST(1 AS BIGINT) AS rank, cid, m FROM s1
           UNION ALL SELECT 2, cid, m FROM s2
           UNION ALL SELECT 3, cid, m FROM s3
           UNION ALL SELECT 4, cid, m FROM s4
           UNION ALL SELECT 5, cid, m FROM s5) t
         ORDER BY rank"""),

    // NATIVE session_window streaming aggregation (st01's gap-sessions
    // through Spark's built-in session-merge state instead of the
    // custom flatMapGroupsWithState machine). Append mode: a session
    // emits once the watermark (max ts - 30 min) passes its end
    // (last event + gap), so the oracle filters the batch-derived
    // sessions by the same closed-session predicate (st04 mechanics).
    "st17_stream_session_window" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val out = graft.streaming.Events.streamingSessionWindows(
          graft.streaming.Events.readStream(s, dir), 30)
        val sink = "st17_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .select(col("user_id"), unix_micros(col("s_start")).as("s_start"),
            unix_micros(col("s_end")).as("s_end"), col("n_events"),
            col("cents"))
          .orderBy(col("user_id"), col("s_start"))
      },
      """WITH x AS (
           SELECT user_id, event_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS ns
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         y AS (SELECT user_id, ts, value,
                      sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS seq
               FROM x),
         sess AS (SELECT user_id, seq, min(ts) AS t0,
                         max(ts) + INTERVAL 30 MINUTE AS t1,
                         count(*) AS n_events,
                         sum(CAST(round(value * 100) AS BIGINT)) AS cents
                  FROM y GROUP BY user_id, seq),
         mx AS (SELECT max(ts) AS mt FROM events)
         SELECT user_id, epoch_us(t0) AS s_start, epoch_us(t1) AS s_end,
                CAST(n_events AS BIGINT) AS n_events,
                CAST(cents AS BIGINT) AS cents
         FROM sess CROSS JOIN mx
         WHERE t1 <= mt - INTERVAL 30 MINUTE
         ORDER BY user_id, s_start"""),

    // time-range window frame (RANGE BETWEEN on days): 7-day rolling
    // revenue per customer — cents-exact so the rolling sums are
    // order-independent; one shuffle on the customer key
    "w04_rolling_range" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey")).orderBy(col("d"))
          .rangeBetween(-6, 0)
        s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"),
            unix_date(col("o_orderdate").cast("date")).cast("long").as("d"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .withColumn("cents_7d", sum(col("cents")).over(w))
          .select(col("o_orderkey"), col("o_custkey"), col("d"), col("cents_7d"))
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey, o_custkey,
                CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                  PARTITION BY o_custkey
                  ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_7d
         FROM orders ORDER BY o_orderkey"""),

    // Rolling EXACT MEDIAN over a trailing time-range frame — the robust
    // counterpart of w04's rolling sum (a spike-resistant baseline for
    // monitoring). Exact interpolated percentile as a WINDOW aggregate:
    // cents-integer input, median of n values is either a value or a
    // .5 midpoint — exact in double on both engines (quantile_cont ≡
    // Spark Percentile, the p05 precedent). Same per-customer shuffle
    // as any keyed window.
    // Window-frame EXCLUDE (w12) — SAME TEXT on both engines: DuckDB
    // executes the EXCLUDE clause natively, Spark gets the dialect's
    // full-frame-minus-slice algebra (Dialect.rewriteWindowExclude).
    // All three kinds + NO OTHERS, RANGE and bounded-ROWS frames; cents
    // stay integer so subtraction is exact (float EXCLUDE would drift —
    // documented), the ROWS frame orders by the unique key (tied ROWS
    // order is engine-nondeterministic), AVG rounds after the one
    // division. Outer CASTs pin DuckDB's HUGEINT window sums to BIGINT.
    // GROUPS window-frame mode (w14, [[Dialect.rewriteGroupsFrames]]):
    // frame bounds count PEER GROUPS — lowered onto a dense_rank group
    // index + RANGE frame over it in ONE wrapped statement. DuckDB 1.0
    // predates GROUPS (parser error, probed), so the oracle re-derives
    // the same semantics explicitly via dense_rank + RANGE — the u09
    // convention for forms DuckDB can't run natively. Covers between,
    // running (unbounded‥current), strictly-backward (2‥1 preceding,
    // empty on the first groups → NULL) and the single-bound shorthand.
    "w14_groups_frames" -> diff("orders",
      """SELECT o_orderkey AS k,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS s_adj,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_run,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             GROUPS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s_back,
           CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             GROUPS 1 PRECEDING) AS BIGINT) AS mn_g
         FROM orders WHERE o_orderkey % 11 = 0
         ORDER BY k""",
      """WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  dense_rank() OVER (PARTITION BY o_orderstatus
                                     ORDER BY o_orderkey % 5) AS gi
           FROM orders WHERE o_orderkey % 11 = 0)
         SELECT k,
           CAST(sum(cents) OVER (PARTITION BY st ORDER BY gi
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS s_adj,
           count(*) OVER (PARTITION BY st ORDER BY gi
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_run,
           CAST(sum(cents) OVER (PARTITION BY st ORDER BY gi
             RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s_back,
           CAST(min(cents) OVER (PARTITION BY st ORDER BY gi
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS mn_g
         FROM b ORDER BY k"""),

    // min/max window EXCLUDE CURRENT ROW (w15, SAME text both engines —
    // DuckDB executes EXCLUDE natively, probed): lowered as the
    // before/after ROWS-frame split LEAST/GREATEST combine (frame minus
    // current row), incl. the edge frames whose before- or after-slice
    // is empty. BIGINT cents keep min/max exact.
    "w15_minmax_exclude" -> multiSession(Seq("orders"),
      """SELECT o_orderkey AS k,
           MIN(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
             EXCLUDE CURRENT ROW) AS mn_w,
           MAX(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE CURRENT ROW) AS mx_all,
           MIN(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING
             EXCLUDE CURRENT ROW) AS mn_f,
           MAX(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
             EXCLUDE CURRENT ROW) AS mx_b
         FROM orders WHERE o_orderkey % 9 = 0
         ORDER BY k"""),

    // min/max window EXCLUDE GROUP / TIES (w16, SAME text both engines —
    // DuckDB executes EXCLUDE natively, probed): subtraction algebra
    // has no inverse for min, so the frame minus the PEER GROUP splits
    // into before/after GROUPS frames (lowered through the w14
    // dense_rank group index) combined with LEAST/GREATEST; TIES keeps
    // the current row as a third combine leg. The order key is coarse
    // (mod 5) so peer groups are real; group-defined slices make the
    // result order-insensitive within ties. Shrinks the w15 refusal
    // matrix to its genuinely-unaddressable corners (row edges inside
    // peer groups, value-offset RANGE edges).
    "w16_minmax_exclude_group" -> multiSession(Seq("orders"),
      """SELECT o_orderkey AS k,
           MIN(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE GROUP) AS mn_run,
           MAX(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE TIES) AS mx_ties,
           MIN(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE GROUP) AS mn_all,
           MAX(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             EXCLUDE TIES) AS mx_fwd
         FROM orders WHERE o_orderkey % 9 = 0
         ORDER BY k"""),

    // FILTER-carrying aggregates under EXCLUDE (w17, SAME text both
    // engines — DuckDB executes FILTER + EXCLUDE natively, probed):
    // `agg(x) FILTER (WHERE c)` folds into `agg(CASE WHEN c THEN x
    // END)` — exactly the FILTER semantics for SUM/COUNT/AVG/MIN/MAX
    // since the aggregate skips the CASE's NULLs — and the folded call
    // re-enters the w12/w15/w16 EXCLUDE algebra unchanged. Closes the
    // FILTER cell of the EXCLUDE residual matrix; only DISTINCT stays
    // refused (genuinely not decomposable). Integer cents keep the
    // sums exact; the AVG arm rounds after its one division.
    "w17_filter_exclude" -> multiSession(Seq("orders"),
      """SELECT o_orderkey AS k,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
             FILTER (WHERE o_orderpriority < '3') OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               EXCLUDE GROUP) AS BIGINT) AS s_f,
           COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE TIES) AS c_f,
           MIN(CAST(round(o_totalprice * 100) AS BIGINT))
             FILTER (WHERE o_orderkey % 3 = 0) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               EXCLUDE GROUP) AS mn_f,
           round(AVG(CAST(round(o_totalprice * 100) AS BIGINT))
             FILTER (WHERE o_orderkey % 2 = 1) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
               RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               EXCLUDE CURRENT ROW), 6) AS avg_f
         FROM orders WHERE o_orderkey % 9 = 0
         ORDER BY k"""),

    // DISTINCT window aggregates (w18, [[graft.sql.Dialect
    // .rewriteDistinctWindow]] + the COUNT branch of the EXCLUDE
    // algebra): Spark refuses DISTINCT window functions natively;
    // COUNT(DISTINCT) lowers onto size(collect_set OVER the same spec)
    // — NULL-skipping, empty-frame and BIGINT semantics all line up
    // with DuckDB's native evaluation (probed); the set dedups inside
    // the aggregation buffer so unbounded frames stay O(partition), and
    // the whole-partition EXCLUDE CURRENT ROW arm is pure counting
    // algebra (no per-row collect at all). The five
    // arms pin: whole partition, bounded ROWS frame, EXCLUDE CURRENT
    // ROW (before/after collect split), FILTER folded inside the
    // DISTINCT, and EXCLUDE TIES (GROUPS split + typed self singleton).
    // Same text on both engines. sum/avg DISTINCT over a window refuse
    // loudly (not reproducibly ordered); DialectSpec pins that.
    "w18_count_distinct_window" -> multiSession(Seq("orders"),
      """SELECT o_orderkey AS k,
           count(DISTINCT o_orderpriority) OVER (
             PARTITION BY o_orderstatus) AS cd_part,
           count(DISTINCT o_custkey % 10) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS cd_frame,
           count(DISTINCT o_custkey % 10) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE CURRENT ROW) AS cd_excl,
           count(DISTINCT o_orderpriority)
             FILTER (WHERE o_totalprice > 150000) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderkey
               ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING
               EXCLUDE CURRENT ROW) AS cd_filt,
           count(DISTINCT o_custkey % 10) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE TIES) AS cd_ties
         FROM orders WHERE o_orderkey % 7 = 0
         ORDER BY k"""),

    // sum/avg(DISTINCT …) OVER for integral/decimal inputs (w22,
    // [[graft.sql.Dialect.rewriteDistinctWindow]] +
    // [[graft.functions.ArrayFoldExact]]): the last practical w18 cell.
    // The DISTINCT set collects once per frame (collect_set — dedup
    // inside the aggregation buffer) and folds through the order-free
    // EXACT sum: integral/decimal addition commutes exactly, so the
    // set's nondeterministic element order cannot change the answer;
    // float inputs refuse at analysis time with the w18 reproducibility
    // reason. AVG is the exact sum cast to double once, divided once —
    // bitwise equal to DuckDB's double accumulation while the sum is
    // double-exact. Composes with FILTER (folds inside the DISTINCT)
    // and EXCLUDE (collect-split for bounded frames, subtraction
    // algebra for the whole-partition case — both exact). Same text on
    // both engines; raw doubles compare bitwise, no rounding needed.
    // IGNORE/RESPECT NULLS on navigation window functions (w23,
    // [[graft.sql.Dialect.rewriteIgnoreNulls]]): DuckDB spells the
    // modifier INSIDE the call's parens, Spark outside — each parser
    // refuses the other's spelling (both probed), so the pass moves
    // the in-parens form out and the DuckDB text runs on both. NULLs
    // are manufactured with a % gate; last_value needs the explicit
    // full frame (both engines default to CURRENT ROW-bounded).
    "w23_ignore_nulls" -> multiSession(Seq("orders"),
      """SELECT o_orderkey AS k,
           lag(CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE CAST(round(o_totalprice) AS BIGINT) END
               IGNORE NULLS) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey) AS prev_np,
           first_value(CASE WHEN o_orderkey % 4 = 0 THEN NULL
                            ELSE o_custkey END IGNORE NULLS) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey) AS first_np,
           last_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL
                           ELSE o_custkey END IGNORE NULLS) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_np,
           lead(CASE WHEN o_orderkey % 5 = 0 THEN NULL
                     ELSE o_custkey END RESPECT NULLS) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey) AS next_rn
         FROM orders WHERE o_orderkey % 7 = 0
         ORDER BY k"""),

    "w22_sum_distinct_window" -> multiSession(Seq("orders"),
      """SELECT o_orderkey AS k,
           CAST(sum(DISTINCT o_custkey % 97) OVER (
             PARTITION BY o_orderstatus) AS BIGINT) AS sd_part,
           avg(DISTINCT o_custkey % 97) OVER (
             PARTITION BY o_orderstatus) AS ad_part,
           CAST(sum(DISTINCT o_custkey % 11) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN 4 PRECEDING AND 4 FOLLOWING) AS BIGINT)
             AS sd_frame,
           CAST(sum(DISTINCT o_custkey % 11)
             FILTER (WHERE o_totalprice > 120000) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderkey
               ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS BIGINT)
             AS sd_filt,
           CAST(sum(DISTINCT o_custkey % 11) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE CURRENT ROW) AS BIGINT) AS sd_excl,
           avg(DISTINCT o_custkey % 13) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
             EXCLUDE CURRENT ROW) AS ad_excl,
           CAST(sum(DISTINCT o_custkey % 10) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 5
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE TIES) AS BIGINT) AS sd_ties,
           CAST(sum(DISTINCT CAST(round(o_totalprice) AS DECIMAL(18,2))
             ) OVER (PARTITION BY o_orderstatus) AS DOUBLE) AS sd_dec
         FROM orders WHERE o_orderkey % 7 = 0
         ORDER BY k"""),

    // EXCLUDE over GROUPS frames (w19): the last practical cell of the
    // EXCLUDE matrix — the w14 GROUPS lowering (dense_rank group index)
    // composes with the w12/w16/w18 exclusion algebra, so every
    // aggregate family runs: sum/avg subtraction, count, min/max
    // before/after GROUPS split, COUNT(DISTINCT) collect split. DuckDB
    // has no GROUPS mode ("not implemented yet", probed), so the oracle
    // hand-builds the identical semantics: dense_rank() AS gi, then the
    // same frames in RANGE mode over gi with DuckDB's NATIVE EXCLUDE
    // (peer groups by gi == peer groups by g). One exchange+sort total:
    // every window shares the partition/order pair.
    "w19_groups_exclude" -> diff("orders",
      """SELECT o_orderkey AS k,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 7
             GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE GROUP) AS BIGINT) AS s_g,
           COUNT(*) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 7
             GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE TIES) AS c_t,
           round(AVG(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 7
             GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE GROUP), 6) AS a_g,
           MAX(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey % 7
             GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE TIES) AS mx_t,
           count(DISTINCT CAST(round(o_totalprice*100) AS BIGINT) % 1000)
             OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey % 7
             GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE GROUP) AS cd_g
         FROM orders WHERE o_orderkey % 11 = 0 ORDER BY k""",
      """WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                  o_orderkey % 7 AS g,
                  CAST(round(o_totalprice*100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 11 = 0),
         r AS (SELECT *, dense_rank() OVER (PARTITION BY st ORDER BY g)
                 AS gi FROM b)
         SELECT k,
           CAST(SUM(cents) OVER (PARTITION BY st ORDER BY gi
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE GROUP) AS BIGINT) AS s_g,
           COUNT(*) OVER (PARTITION BY st ORDER BY gi
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE TIES) AS c_t,
           round(AVG(cents) OVER (PARTITION BY st ORDER BY gi
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE GROUP), 6) AS a_g,
           MAX(cents) OVER (PARTITION BY st ORDER BY gi
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE TIES) AS mx_t,
           count(DISTINCT cents % 1000) OVER (PARTITION BY st ORDER BY gi
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE GROUP) AS cd_g
         FROM r ORDER BY k"""),

    // FILTER over windows WITHOUT EXCLUDE (w20,
    // [[graft.sql.Dialect.rewriteWindowFilter]]): Spark refuses FILTER
    // on window functions entirely; the w17 fold — agg(CASE WHEN cond
    // THEN arg END) — is exact for every NULL-skipping aggregate, so it
    // now runs standalone: running counts/sums over a filtered subset
    // without losing the unfiltered row grid (the classic "events vs
    // qualifying events" window shape). COUNT(DISTINCT)+FILTER chains
    // into the w18 collect lowering. Same text on both engines.
    "w20_window_filter" -> multiSession(Seq("orders"),
      """SELECT o_orderkey AS k,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey) AS c_run,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
             FILTER (WHERE o_orderkey % 2 = 0) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderkey
               ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS s_f,
           MIN(CAST(round(o_totalprice * 100) AS BIGINT))
             FILTER (WHERE o_orderpriority < '3') OVER (
               PARTITION BY o_orderstatus) AS mn_f,
           round(AVG(CAST(round(o_totalprice * 100) AS BIGINT))
             FILTER (WHERE o_orderkey % 3 = 0) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS a_f,
           count(DISTINCT o_orderpriority)
             FILTER (WHERE o_totalprice > 100000) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderkey
               ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS cd_f
         FROM orders WHERE o_orderkey % 13 = 0
         ORDER BY k"""),

    // Chained named windows (w21, [[graft.sql.Dialect
    // .inlineChainedWindows]]): a window spec that STARTS with another
    // window's name copies the base and appends clauses —
    // `WINDOW w1 AS (PARTITION BY st), w2 AS (w1 ORDER BY k)` plus the
    // inline forms `OVER (w1 ...)` / bare-copy `OVER (w1)`. Spark
    // resolves only bare `OVER w`; the pass inlines the base text with
    // the standard's refusal matrix (no framed base, no PARTITION
    // override, no double ORDER BY — each probed to match DuckDB's own
    // parser errors). DIVERGENCE (probed, so the oracle pre-inlines the
    // specs): when a chained reference APPENDS A FRAME, DuckDB silently
    // drops the copied PARTITION BY and frames over the whole relation
    // — Postgres and the standard copy the partitioning; this engine
    // follows the standard.
    "w21_chained_windows" -> diff("orders",
      """SELECT o_orderkey AS k,
           COUNT(*) OVER w2 AS c_run,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             w2 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS s_roll,
           MAX(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (w1)
             AS mx_p
         FROM orders WHERE o_orderkey % 17 = 0
         WINDOW w1 AS (PARTITION BY o_orderstatus),
                w2 AS (w1 ORDER BY o_orderkey)
         ORDER BY k""",
      """SELECT o_orderkey AS k,
           COUNT(*) OVER (PARTITION BY o_orderstatus
             ORDER BY o_orderkey) AS c_run,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS s_roll,
           MAX(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_orderstatus) AS mx_p
         FROM orders WHERE o_orderkey % 17 = 0
         ORDER BY k"""),

    "w12_window_exclude" -> multiSession(Seq("orders"),
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                  o_orderkey % 20 AS g,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 7 = 0)
         SELECT k,
           CAST(SUM(cents) OVER (PARTITION BY st ORDER BY g
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE CURRENT ROW) AS BIGINT) AS s_cur,
           CAST(SUM(cents) OVER (PARTITION BY st ORDER BY g
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE GROUP) AS BIGINT) AS s_grp,
           CAST(SUM(cents) OVER (PARTITION BY st ORDER BY g
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE TIES) AS BIGINT) AS s_ties,
           COUNT(*) OVER (PARTITION BY st ORDER BY g
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE GROUP) AS c_grp,
           round(AVG(cents) OVER (PARTITION BY st ORDER BY g
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             EXCLUDE CURRENT ROW), 6) AS a_cur,
           CAST(SUM(cents) OVER (PARTITION BY st ORDER BY k
             ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING
             EXCLUDE CURRENT ROW) AS BIGINT) AS s_rows,
           CAST(SUM(cents) OVER (PARTITION BY st ORDER BY k
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
             EXCLUDE NO OTHERS) AS BIGINT) AS s_none
         FROM o ORDER BY k"""),

    "w11_rolling_median" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey")).orderBy(col("d"))
          .rangeBetween(-13, 0)
        s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"),
            unix_date(col("o_orderdate").cast("date")).cast("long").as("d"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .withColumn("med_14d", expr("percentile(cents, 0.5)").over(w))
          .select(col("o_orderkey"), col("o_custkey"), col("d"),
            col("med_14d"))
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey, o_custkey,
                CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
                quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)
                  OVER (PARTITION BY o_custkey
                        ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                        RANGE BETWEEN 13 PRECEDING AND CURRENT ROW) AS med_14d
         FROM orders ORDER BY o_orderkey"""),

    // ordered-stage conversion funnel over 30-min gap sessions:
    // view -> click (at/after first view) -> purchase (at/after first
    // qualifying click); stacked running-min windows share one
    // session-keyed sort
    "e04_funnel" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.streaming.Events.sessionFunnel(
            graft.streaming.Events.read(s, dir),
            Seq("view", "click", "purchase"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("reached_1")).as("n_view"),
            sum(col("reached_2")).as("n_view_click"),
            sum(col("reached_3")).as("n_full"))
      },
      """WITH x AS (
           SELECT user_id, event_id, ts, event_type,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS ns
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         se AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sess
                FROM x),
         r1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                          OVER ws AS s1
                FROM se WINDOW ws AS (PARTITION BY user_id, sess
                                      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)),
         r2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND s1 IS NOT NULL THEN ts END)
                          OVER ws AS s2
                FROM r1 WINDOW ws AS (PARTITION BY user_id, sess
                                      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)),
         r3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND s2 IS NOT NULL THEN ts END)
                          OVER ws AS s3
                FROM r2 WINDOW ws AS (PARTITION BY user_id, sess
                                      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)),
         per AS (SELECT user_id, sess,
                        max(CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END) AS f1,
                        max(CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END) AS f2,
                        max(CASE WHEN s3 IS NOT NULL THEN 1 ELSE 0 END) AS f3
                 FROM r3 GROUP BY user_id, sess)
         SELECT count(*) AS n_sessions, CAST(sum(f1) AS BIGINT) AS n_view,
                CAST(sum(f2) AS BIGINT) AS n_view_click,
                CAST(sum(f3) AS BIGINT) AS n_full
         FROM per"""),

    // stream-static join: the unbounded stream broadcast-joins a static
    // dimension (event_type -> category) — the production enrichment
    // shape (dim re-read per micro-batch, never shuffled into the stream)
    "st05_stream_static" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        import s.implicits._
        val dim = Seq(("view", "engagement"), ("click", "engagement"),
          ("purchase", "transactional"), ("signup", "transactional"),
          ("error", "ops")).toDF("event_type", "category")
        val out = graft.streaming.Events.readStream(s, dir)
          .join(broadcast(dim), "event_type")
          .groupBy(col("category"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).as("sv"))
        val sink = "st05_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .select(col("category"), col("n"), col("sv").cast("double").as("sv"))
          .orderBy(col("category"))
      },
      """SELECT CASE event_type WHEN 'view' THEN 'engagement'
                                WHEN 'click' THEN 'engagement'
                                WHEN 'purchase' THEN 'transactional'
                                WHEN 'signup' THEN 'transactional'
                                ELSE 'ops' END AS category,
                count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
         FROM events GROUP BY 1 ORDER BY 1"""),

    // snapshot drift profiling: column profiles of the base snapshot vs
    // the CDC-upserted snapshot side by side — the monitoring step after
    // every incremental corpus refresh (pairs with u01)
    "pr02_snapshot_diff" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
        val base = s.read.parquet(s"$dir/orders.parquet")
          .select(cols.map(col): _*)
        val delta = s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") * 2).as("o_totalprice"))
        val merged = graft.ops.Cdc.upsert(
          base.withColumn("ver", lit(0L)), delta.withColumn("ver", lit(1L)),
          Seq("o_orderkey"), "ver").drop("ver")
        val pb = graft.ops.Profile.summarize(base, cols)
          .select(col("column"), col("n").as("n_base"),
            col("n_distinct").as("dist_base"))
        val pn = graft.ops.Profile.summarize(merged, cols)
          .select(col("column"), col("n").as("n_new"),
            col("n_distinct").as("dist_new"))
        pb.join(pn, "column")
          .select(col("column"), col("n_base"), col("n_new"),
            col("dist_base"), col("dist_new"))
          .orderBy(col("column"))
      },
      """WITH delta AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
                  1 AS ver
           FROM orders WHERE o_orderkey % 10 = 0),
         merged AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
             SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS ver FROM orders
             UNION ALL SELECT * FROM delta) t
           QUALIFY row_number() OVER (PARTITION BY o_orderkey
                                      ORDER BY ver DESC) = 1),
         pb AS (
           SELECT 'o_orderkey' AS "column", count(*) AS n_base,
                  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS dist_base FROM orders
           UNION ALL
           SELECT 'o_orderstatus', count(*),
                  CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
           UNION ALL
           SELECT 'o_totalprice', count(*),
                  CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders),
         pn AS (
           SELECT 'o_orderkey' AS "column", count(*) AS n_new,
                  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS dist_new FROM merged
           UNION ALL
           SELECT 'o_orderstatus', count(*),
                  CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM merged
           UNION ALL
           SELECT 'o_totalprice', count(*),
                  CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM merged)
         SELECT pb."column", pb.n_base, pn.n_new, pb.dist_base, pn.dist_new
         FROM pb JOIN pn USING ("column") ORDER BY pb."column""""),

    // GROUPING SETS (generalizes r01 rollup / r02 cube) with grouping()
    // markers — identical SQL text in both engines
    "g02_grouping_sets" -> same("lineitem",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
                CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                 (l_returnflag, l_linestatus), ())
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),

    // exact duplicated-span detection (Lee et al. substring-dedup
    // signal): per doc, how many of its 8-token rolling spans occur
    // verbatim in another document — md5 span keys so the oracle
    // re-derives them exactly
    "d11_dup_spans" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.duplicatedSpans(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", k = 8)
          .orderBy(col("doc_id"))
      },
      """WITH s AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\W+'),
                              x -> x <> '') AS toks
           FROM documents),
         sp AS (
           SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(toks) - 7),
                         i -> md5(array_to_string(toks[i:i+7], ' ')))) AS digest
           FROM s WHERE len(toks) >= 8),
         dup AS (SELECT digest FROM sp GROUP BY digest
                 HAVING count(DISTINCT doc_id) >= 2),
         pd AS (SELECT sp.doc_id, count(*) AS n_dup_spans
                FROM sp JOIN dup USING (digest) GROUP BY sp.doc_id)
         SELECT s.doc_id,
                CAST(CASE WHEN len(toks) >= 8 THEN len(toks) - 7 ELSE 0 END AS BIGINT) AS n_spans,
                CAST(coalesce(pd.n_dup_spans, 0) AS BIGINT) AS n_dup_spans
         FROM s LEFT JOIN pd USING (doc_id) ORDER BY s.doc_id"""),

    // stream-stream time-bounded join: purchases correlate with the same
    // user's views from the preceding hour — both sides watermarked so
    // join state is evicted as event time advances (the unbounded-stream
    // contract); a finite replay emits exactly the batch join
    "st06_stream_stream_join" -> api(
      (outer, dir) => {
        // Stream-stream join state costs scale with shuffle partitions
        // (4 state stores per partition per batch, each checkpointed):
        // size them to the join-key cardinality (~1.5k users), not the
        // batch default. An isolated child session keeps the conf from
        // leaking into other queries; on a cluster this is the same knob
        // sized to executor count instead.
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val E = graft.streaming.Events
        def side(t: String, p: String) = E.readStream(s, dir)
          .filter(col("event_type") === t)
          .select(col("user_id").as(s"${p}_user"),
            col("ts").cast("timestamp").as(s"${p}_ts"),
            col("event_id").as(s"${p}_id"))
          .withWatermark(s"${p}_ts", "2 hours")
        val joined = side("purchase", "p").join(side("view", "v"),
          col("p_user") === col("v_user") &&
            col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("v_ts") <= col("p_ts"))
        val sink = "st06_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = joined.select(col("p_id"), col("v_id"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .agg(count(lit(1)).as("n_pairs"),
            count_distinct(col("p_id")).as("n_purchases"),
            min(col("p_id")).as("mn_p"), min(col("v_id")).as("mn_v"))
      },
      """SELECT count(*) AS n_pairs,
                CAST(count(DISTINCT p.event_id) AS BIGINT) AS n_purchases,
                min(p.event_id) AS mn_p, min(v.event_id) AS mn_v
         FROM events p JOIN events v
           ON v.user_id = p.user_id
          AND p.event_type = 'purchase' AND v.event_type = 'view'
          AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts"""),

    // streaming ingestion dedup against a static reference snapshot
    // (docs with id % 7 == 0 play the "previous corpus"): stream-static
    // LEFT ANTI join on md5 digests — STATELESS (no watermark, no state
    // store; the reference broadcasts per micro-batch), the shape for
    // continuous corpus ingestion against yesterday's snapshot
    "st07_stream_ref_dedup" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val ref = s.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 7 === 0)
          .select(md5(col("text")).as("digest")).distinct()
        val stream = s.readStream
          .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
          .parquet(graft.streaming.Replay.linkDir(s"$dir/documents.parquet"))
          .withColumn("digest", md5(col("text")))
        val fresh = stream.join(broadcast(ref), Seq("digest"), "left_anti")
        val sink = "st07_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = fresh.select(col("doc_id"), col("n_chars"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .agg(count(lit(1)).as("n_fresh"),
            sum(col("n_chars")).cast("long").as("sc"),
            min(col("doc_id")).as("mn"))
      },
      """SELECT count(*) AS n_fresh, CAST(sum(n_chars) AS BIGINT) AS sc,
                min(doc_id) AS mn
         FROM documents d
         WHERE NOT EXISTS (
           SELECT 1 FROM documents r
           WHERE r.doc_id % 7 = 0 AND md5(r.text) = md5(d.text))"""),

    // composed curation pipeline v2 over the round-7 operators: bigram-LM
    // quality gate (fixed-point per-bigram threshold) -> exact dedup
    // (lowest id per digest) -> temperature re-balancing by source ->
    // per-source rollup. Every stage is deterministic and the oracle
    // replays the whole chain in SQL.
    "p06_pipeline_v2" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val scored = graft.ops.TextAnalysis.bigramLmScore(docs, "doc_id", "text")
        val gated = docs.join(scored, "doc_id")
          .filter(col("n_bigrams") > 0 &&
            col("score_fp") > col("n_bigrams") * lit(-3420000L))
        val deduped = graft.ops.Dedup.exactDedup(gated, "text", "doc_id")
        val mixed = graft.ops.Sampling.temperatureSample(deduped, "doc_id", "source")
        mixed.groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).cast("long").as("sc"),
            min(col("doc_id")).as("mn"))
          .orderBy(col("source"))
      },
      """WITH s AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(coalesce(text, '')), '\W+'),
                              x -> x <> '') AS toks
           FROM documents),
         bg AS (SELECT doc_id, toks[i] AS a, toks[i+1] AS b
                FROM s, unnest(generate_series(1, len(toks)-1)) AS u(i)),
         uni AS (SELECT unnest(toks) AS t FROM s),
         c1 AS (SELECT t, count(*) AS c1 FROM uni GROUP BY t),
         c2 AS (SELECT a, b, count(*) AS c2 FROM bg GROUP BY a, b),
         v AS (SELECT count(DISTINCT t) AS v FROM uni),
         sc AS (SELECT bg.doc_id,
                       CAST(round(ln(CAST(c2.c2 + 1 AS DOUBLE) /
                                     CAST(c1.c1 + v.v AS DOUBLE)) * 1e6) AS BIGINT) AS fp
                FROM bg JOIN c2 USING (a, b) JOIN c1 ON bg.a = c1.t CROSS JOIN v),
         pd AS (SELECT doc_id, count(*) AS nb, sum(fp) AS sf FROM sc GROUP BY doc_id),
         gated AS (
           SELECT d.* FROM documents d JOIN pd USING (doc_id)
           WHERE pd.nb > 0 AND pd.sf > pd.nb * -3420000),
         deduped AS (
           SELECT * FROM gated
           QUALIFY row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) = 1),
         c AS (SELECT source, count(*) AS n FROM deduped GROUP BY source),
         m AS (SELECT min(n) AS nmin FROM c),
         r AS (SELECT source,
                      CAST(floor(sqrt(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE)) * 65536) AS BIGINT) AS thr
               FROM c CROSS JOIN m)
         SELECT d.source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sc,
                min(doc_id) AS mn
         FROM deduped d JOIN r ON d.source = r.source
         WHERE r.thr >= 65536
            OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', r.thr)
         GROUP BY d.source ORDER BY d.source"""),

    // parquet schema evolution: two writer generations with different
    // column sets land in one table dir; mergeSchema read unions by name
    // (missing columns null-filled) — the long-lived-table reality at
    // 100 TB, where writers evolve while history stays readable
    "io06_schema_merge" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val tmp = scratchDir(s"io06_merge_${new java.io.File(dir).getName}")
        val docs = s.read.parquet(s"$dir/documents.parquet")
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"))
          .write.mode("overwrite").parquet(tmp)
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .write.mode("append").parquet(tmp)
        s.read.option("mergeSchema", "true").parquet(tmp)
          .agg(count(lit(1)).as("n"), count(col("lang")).as("nl"),
            count(col("source")).as("ns"),
            sum(col("n_chars")).cast("long").as("sc"),
            min(col("doc_id")).as("mn"))
      },
      """WITH u AS (
           SELECT doc_id, lang, NULL AS source, CAST(NULL AS BIGINT) AS n_chars
           FROM documents WHERE doc_id % 2 = 0
           UNION ALL
           SELECT doc_id, NULL, source, n_chars
           FROM documents WHERE doc_id % 2 = 1)
         SELECT count(*) AS n, count(lang) AS nl, count(source) AS ns,
                CAST(sum(n_chars) AS BIGINT) AS sc, min(doc_id) AS mn
         FROM u"""),

    // cohort retention: users bucketed by first-seen day, activity
    // counted per day offset — two keyed aggregations (user spine, then
    // cohort cell), the standard growth-analytics rollup
    "e05_cohort_retention" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val ev = graft.streaming.Events.read(s, dir)
          .select(col("user_id"), col("ts").cast("date").as("d"))
        val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
        ev.join(first, "user_id")
          .select(col("user_id"), col("d0"),
            datediff(col("d"), col("d0")).cast("long").as("day_offset"))
          .filter(col("day_offset") <= 7)
          .groupBy(col("d0"), col("day_offset"))
          .agg(count_distinct(col("user_id")).as("n_users"))
          .orderBy(col("d0"), col("day_offset"))
      },
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
         f AS (SELECT user_id, min(d) AS d0 FROM e GROUP BY user_id)
         SELECT f.d0, CAST(datediff('day', f.d0, e.d) AS BIGINT) AS day_offset,
                CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM e JOIN f USING (user_id)
         WHERE datediff('day', f.d0, e.d) <= 7
         GROUP BY f.d0, datediff('day', f.d0, e.d)
         ORDER BY d0, day_offset"""),

    // product quantization ANN (the compression tier for billion-scale
    // vectors): seeded per-subspace codebook -> PQ codes -> ADC top-10.
    // Every distance enters integer domain as round(d2*1e6) at the
    // (subvector, centroid) grain, so the ENTIRE pipeline — code
    // assignment argmins and ADC integer sums — is re-derived exactly by
    // the oracle (s06/s07 discipline applied to PQ).
    "s08_ann_pq" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val P = graft.ops.Pq
        val cb = P.seededCodebook(emb, "vec_id", "embedding", dim = 64, m = 4, k = 16)
        val codes = P.encode(emb, cb, "vec_id", "embedding", dim = 64, m = 4)
        P.adcTopK(codes, cb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", dim = 64, m = 4, k = 10)
          .orderBy(col("probe_id"), col("rank"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         sub AS (SELECT vec_id, u.s AS s, emb[u.s*16+1 : u.s*16+16] AS sv
                 FROM e, unnest([0, 1, 2, 3]) AS u(s)),
         cb AS (SELECT s, vec_id AS cid, sv AS cvec FROM sub WHERE vec_id < 16),
         enc0 AS (SELECT v.vec_id, v.s, cb.cid,
                         CAST(round(list_sum(list_transform(generate_series(1, 16),
                              i -> (v.sv[i] - cb.cvec[i]) * (v.sv[i] - cb.cvec[i]))) * 1e6) AS BIGINT) AS d
                  FROM sub v JOIN cb USING (s)),
         codes AS (SELECT vec_id, s, cid AS code FROM (
                     SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                                  ORDER BY d, cid) AS rn
                     FROM enc0) t
                   WHERE rn = 1),
         dt AS (SELECT p.vec_id AS probe_id, p.s, cb.cid,
                       CAST(round(list_sum(list_transform(generate_series(1, 16),
                            i -> (p.sv[i] - cb.cvec[i]) * (p.sv[i] - cb.cvec[i]))) * 1e6) AS BIGINT) AS pd
                FROM sub p JOIN cb USING (s) WHERE p.vec_id < 5),
         sc AS (SELECT dt.probe_id, c.vec_id, sum(dt.pd) AS adist_fp
                FROM codes c JOIN dt ON c.s = dt.s AND c.code = dt.cid
                WHERE c.vec_id <> dt.probe_id
                GROUP BY dt.probe_id, c.vec_id),
         r AS (SELECT probe_id, vec_id, adist_fp,
                      CAST(row_number() OVER (PARTITION BY probe_id
                                              ORDER BY adist_fp, vec_id) AS BIGINT) AS rank
               FROM sc)
         SELECT probe_id, rank, vec_id, CAST(adist_fp AS BIGINT) AS adist_fp
         FROM r WHERE rank <= 10 ORDER BY probe_id, rank"""),

    // IVF x PQ — the production billion-scale ANN stack: seeded coarse
    // quantizer (nlist=8) restricts each probe to its nprobe=2 nearest
    // cells, PQ/ADC ranks only candidates living there. Both levels stay
    // fixed-point, so the full two-level search (cell argmins, probe cell
    // choice, candidate set, ADC sums, ranking) is re-derived exactly by
    // the oracle — a strict-oracled APPROXIMATE index.
    "s09_ann_ivfpq" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val P = graft.ops.Pq
        val cb = P.seededCodebook(emb, "vec_id", "embedding", dim = 64, m = 4, k = 16)
        val codes = P.encode(emb, cb, "vec_id", "embedding", dim = 64, m = 4)
        val coarse = P.seededCoarseCentroids(emb, "vec_id", "embedding", nlist = 8)
        val cells = P.nearestCells(emb, coarse, "vec_id", "embedding", take = 1)
        P.ivfpqTopK(codes, cb, cells, coarse,
            emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            dim = 64, m = 4, nprobe = 2, k = 10)
          .orderBy(col("probe_id"), col("rank"))
      },
      ivfpqOracle),

    // IVF×PQ over a PERSISTED index: codes/cells/codebook/coarse written
    // once as bucketed catalog tables (the io05/writeBucketed layout),
    // then the search reads them back — the corpus is never re-encoded at
    // query time (PlanSpec-pinned), which is the artifact contract a real
    // ANN index must honor at 100 TB (encoding is the expensive full-scan
    // pass; searches must not repay it). Same fixed-point two-level
    // semantics as s09, so it shares s09's exact re-derivation oracle.
    "s11_ann_ivfpq_persisted" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val P = graft.ops.Pq
        val prefix = s"graft_s11_${new java.io.File(dir).getName}"
        P.writeIndex(emb, "vec_id", "embedding",
          dim = 64, m = 4, k = 16, nlist = 8, prefix)
        val idx = P.loadIndex(s, prefix)
        P.ivfpqTopK(idx.codes, idx.codebook, idx.cells, idx.coarse,
            emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            dim = 64, m = 4, nprobe = 2, k = 10)
          .orderBy(col("probe_id"), col("rank"))
      },
      ivfpqOracle),

    // INCREMENTAL index maintenance: build the persisted index on the
    // first 4/5 of the corpus, then appendIndex the remaining delta —
    // encoding and cell-assigning ONLY the new vectors against the STORED
    // (fixed) quantizers, appended into the bucketed tables. Per-vector
    // encoding is independent and the quantizers are frozen, so the
    // appended index must be bit-identical to a from-scratch build over
    // the full corpus — which is literally what the shared oracle checks
    // (it re-derives the search over ALL vectors). Append cost ∝ delta,
    // never the base — the property that makes a 100 TB index
    // maintainable.
    "s12_ann_index_append" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val P = graft.ops.Pq
        val cut = 4L * emb.count() / 5L
        val prefix = s"graft_s12_${new java.io.File(dir).getName}"
        P.writeIndex(emb.filter(col("vec_id") < cut), "vec_id", "embedding",
          dim = 64, m = 4, k = 16, nlist = 8, prefix)
        P.appendIndex(emb.filter(col("vec_id") >= cut), "vec_id", "embedding",
          dim = 64, m = 4, prefix)
        val idx = P.loadIndex(s, prefix)
        P.ivfpqTopK(idx.codes, idx.codebook, idx.cells, idx.coarse,
            emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            dim = 64, m = 4, nprobe = 2, k = 10)
          .orderBy(col("probe_id"), col("rank"))
      },
      ivfpqOracle),

    // Index DELETE maintenance (Pq.deleteFromIndex): remove every
    // vec_id % 7 == 0 from the persisted bucketed index (quantizers
    // frozen, data tables rewritten minus the delete set), then search.
    // The oracle is the full IVF×PQ re-derivation with ONLY the
    // candidate set filtered — quantizer CTEs untouched — so a green
    // hash proves deletion removed exactly the deleted ids from results
    // while disturbing nothing else (codebook seeds that were deleted
    // still quantize, as frozen quantizers must).
    "s14_ann_index_delete" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val P = graft.ops.Pq
        val prefix = s"graft_s14_${new java.io.File(dir).getName}"
        P.writeIndex(emb, "vec_id", "embedding",
          dim = 64, m = 4, k = 16, nlist = 8, prefix)
        P.deleteFromIndex(emb.filter(col("vec_id") % 7 === 0)
          .select(col("vec_id")), "vec_id", prefix)
        val idx = P.loadIndex(s, prefix)
        P.ivfpqTopK(idx.codes, idx.codebook, idx.cells, idx.coarse,
            emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            dim = 64, m = 4, nprobe = 2, k = 10)
          .orderBy(col("probe_id"), col("rank"))
      },
      // candidate-set surgery on the shared CTE text: the only
      // difference vs ivfpqOracle is deleted ids never become candidates
      ivfpqOracle.replace("WHERE cells.vec_id <> pc.probe_id",
        "WHERE cells.vec_id <> pc.probe_id AND cells.vec_id % 7 <> 0")),

    // EXISTS / NOT EXISTS correlated subqueries — planned as left-semi /
    // left-anti hash joins on the correlation key (no per-row probing).
    "sub04_exists" -> multi(Seq("customer", "orders"),
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 300000)
           AND NOT EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c.c_custkey
                             AND o2.o_orderstatus = 'P')
         ORDER BY c_custkey"""),

    // LATERAL correlated derived table with ORDER BY + LIMIT: per-group
    // top-n via a lateral subquery (decorrelated by Catalyst into a
    // ranked window join, not a per-row re-execution).
    "sub05_lateral" -> multi(Seq("orders"),
      """SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
         FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_orderpriority = p.o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         ORDER BY 1, 2"""),

    // Statistical aggregates beyond the reference's count/min/max/sum/avg:
    // sample stddev/variance, correlation and covariance per group — the
    // profiling statistics a corpus-quality dashboard needs. One hash
    // shuffle on the group key, partial aggregation map-side; round(,6)
    // per the established transcendental-output discipline.
    // higher-moment stats (population skewness / excess kurtosis) from
    // EXACT integer power sums: l_quantity is integral 1..50, so
    // sum(q^k) up to k=4 stays far under 2^53 and the BIGINT->DOUBLE
    // casts are exact; the moment algebra then uses only +,-,*,/ and
    // sqrt — every one correctly rounded in IEEE — so both engines
    // compute bitwise-identical doubles (no libm, no power(x,1.5)).
    // Built-in skewness/kurtosis are NOT used on purpose: Spark's are
    // population moments, DuckDB's are bias-corrected sample moments —
    // the explicit sums are the engine-neutral form.
    "g19_moments" -> same("lineitem",
      """WITH t AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
                    FROM lineitem),
         m AS (SELECT l_returnflag, count(*) AS n,
                      CAST(sum(q) AS DOUBLE) AS s1,
                      CAST(sum(q*q) AS DOUBLE) AS s2,
                      CAST(sum(q*q*q) AS DOUBLE) AS s3,
                      CAST(sum(q*q*q*q) AS DOUBLE) AS s4
               FROM t GROUP BY l_returnflag),
         d AS (SELECT l_returnflag, n, s1/n AS mu, s2/n AS m2r,
                      s3/n AS m3r, s4/n AS m4r FROM m),
         c AS (SELECT l_returnflag, n, m2r - mu*mu AS v,
                      m3r - 3*mu*m2r + 2*mu*mu*mu AS m3,
                      m4r - 4*mu*m3r + 6*mu*mu*m2r - 3*mu*mu*mu*mu AS m4
               FROM d)
         SELECT l_returnflag, n,
                round(m3 / (v * sqrt(v)), 6) AS skew_pop,
                round(m4 / (v * v) - 3, 6) AS kurt_excess
         FROM c ORDER BY l_returnflag"""),

    "g05_stats" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            round(stddev_samp(col("l_extendedprice")), 6).as("sd_price"),
            round(var_samp(col("l_quantity")), 6).as("var_qty"),
            round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"),
            round(covar_samp(col("l_extendedprice"), col("l_discount")), 6).as("cov_pd"))
          .orderBy(col("l_returnflag"))
      },
      """SELECT l_returnflag, count(*) AS n,
                round(stddev_samp(l_extendedprice), 6) AS sd_price,
                round(var_samp(l_quantity), 6) AS var_qty,
                round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
                round(covar_samp(l_extendedprice, l_discount), 6) AS cov_pd
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Distribution windows: ntile buckets + percent_rank + cume_dist with
    // a unique-key tiebreak so peer groups are single rows and the rank
    // fractions are exact small-integer divisions (bit-identical across
    // engines). One shuffle on the partition key.
    "w05_ntile" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
          .withColumn("tile", ntile(4).over(w).cast("long"))
          .withColumn("pr", round(percent_rank().over(w), 6))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
                CAST(ntile(4) OVER w AS BIGINT) AS tile,
                round(percent_rank() OVER w, 6) AS pr,
                round(cume_dist() OVER w, 6) AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderkey"""),

    // PIVOT: long-to-wide reshaping with explicit pivot values (the only
    // scale-sane form — value discovery would need an extra pass). Cents-
    // exact long sums; absent combinations stay NULL on both engines
    // (oracle CASE arms carry no ELSE, so empty sums yield NULL exactly
    // like Spark's pivot).
    "g03_pivot" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val qc = round(col("l_quantity") * 100).cast("long")
        val cc = round(col("l_extendedprice") * 100).cast("long")
        s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum(qc).as("qty"), sum(cc).as("cents"))
          .select(col("l_returnflag"),
            col("F_qty").as("f_qty"), col("F_cents").as("f_cents"),
            col("O_qty").as("o_qty"), col("O_cents").as("o_cents"))
          .orderBy(col("l_returnflag"))
      },
      """SELECT l_returnflag,
                CAST(sum(CASE WHEN l_linestatus = 'F'
                              THEN CAST(round(l_quantity * 100) AS BIGINT) END) AS BIGINT) AS f_qty,
                CAST(sum(CASE WHEN l_linestatus = 'F'
                              THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS f_cents,
                CAST(sum(CASE WHEN l_linestatus = 'O'
                              THEN CAST(round(l_quantity * 100) AS BIGINT) END) AS BIGINT) AS o_qty,
                CAST(sum(CASE WHEN l_linestatus = 'O'
                              THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS o_cents
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // UNPIVOT (melt): wide-to-long reshaping, the inverse of g03 — used to
    // normalize per-source metric columns into (metric, value) rows before
    // a generic agg. Map-only after the agg; ELSE 0 keeps sums non-null so
    // Spark/SQL null-dropping differences never engage.
    "g04_unpivot" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val qc = round(col("l_quantity") * 100).cast("long")
        s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("l_linestatus") === "F", qc).otherwise(0L)).as("qty_f"),
            sum(when(col("l_linestatus") === "O", qc).otherwise(0L)).as("qty_o"))
          .unpivot(Array(col("l_returnflag")),
            Array(col("qty_f"), col("qty_o")), "status", "qty")
          .orderBy(col("l_returnflag"), col("status"))
      },
      """WITH w AS (SELECT l_returnflag,
                  sum(CASE WHEN l_linestatus = 'F'
                           THEN CAST(round(l_quantity * 100) AS BIGINT) ELSE 0 END) AS qty_f,
                  sum(CASE WHEN l_linestatus = 'O'
                           THEN CAST(round(l_quantity * 100) AS BIGINT) ELSE 0 END) AS qty_o
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, 'qty_f' AS status, CAST(qty_f AS BIGINT) AS qty FROM w
         UNION ALL
         SELECT l_returnflag, 'qty_o' AS status, CAST(qty_o AS BIGINT) AS qty FROM w
         ORDER BY l_returnflag, status"""),

    // PIVOT as SQL TEXT (g03 is the DataFrame API form): the SQL-standard
    // `FROM (...) PIVOT (agg FOR col IN (...))` clause parses natively in
    // BOTH Spark and DuckDB with identical implicit group-by-the-rest
    // semantics and value-named output columns, so the statement is its
    // own oracle. Fixed-point cents inside, outer CAST because DuckDB
    // widens sum(BIGINT) to HUGEINT. Plan: one hash aggregate — pivot
    // lowers to grouped conditional aggregation, no extra shuffle.
    "g17_pivot_sql" -> same("lineitem",
      """SELECT l_returnflag, CAST(F AS BIGINT) AS f_qty, CAST(O AS BIGINT) AS o_qty
         FROM (SELECT l_returnflag, l_linestatus,
                      CAST(round(l_quantity * 100) AS BIGINT) AS qc
               FROM lineitem)
         PIVOT (sum(qc) FOR l_linestatus IN ('F', 'O'))
         ORDER BY l_returnflag"""),

    // UNPIVOT as SQL TEXT (g04 is the API form): SQL-standard
    // `UNPIVOT (val FOR name IN (cols))`, same grammar and same
    // drop-null-values default in Spark and DuckDB. Wide per-priority
    // rollup first (5 rows), then the melt is driver-free and map-only.
    "g18_unpivot_sql" -> same("orders",
      """SELECT o_orderpriority, metric, CAST(v AS BIGINT) AS v
         FROM (SELECT o_orderpriority,
                      count(*) AS n_orders,
                      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
               FROM orders GROUP BY o_orderpriority)
         UNPIVOT (v FOR metric IN (n_orders, cents))
         ORDER BY o_orderpriority, metric"""),

    // ORC round-trip: third columnar format next to parquet (io03/io05)
    // and arrow — write a pruned projection as ORC, read it back, and
    // aggregate. The oracle computes the same result straight from the
    // parquet source, so a green hash proves ORC write+read fidelity for
    // longs, strings, doubles and dates.
    // Distributed Arrow IPC export round-trip: every partition writes
    // its own .arrow stream file from the executor (nothing on the
    // driver — the scale path toArrowIpc's cap points at), read back
    // per-file through the Arrow ingest and aggregated; small batchRows
    // forces multiple record batches per file.
    // media ingestion through Spark's REAL at-rest path: PNG payloads
    // written as individual FILES, read back with the built-in
    // `binaryFile` source (path/length/content schema, pathGlobFilter
    // pushdown), ids recovered from file names, pixels recovered through
    // the full PNG decode. This is the 100 TB shape for opaque media —
    // one file per object, executors read only matching paths, payload
    // bytes never shuffle (the decode is map-side; the only exchange is
    // the final ORDER BY). Oracle: the m05/m10 byte arithmetic on the
    // written subset.
    "io14_binary_source" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        val out = scratchDir(s"io14_png_${new java.io.File(dir).getName}")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        import s.implicits._
        m.withPngPayload(
            s.read.parquet(s"$dir/documents.parquet")
              .filter(col("doc_id") < 50)
              .withColumn("text", coalesce(col("text"), lit(""))),
            "doc_id", "text", width = 16)
          .select(col("doc_id").cast("long"), col("payload"))
          .as[(Long, Array[Byte])]
          .foreachPartition { (it: Iterator[(Long, Array[Byte])]) =>
            // task-commit protocol (same contract as
            // ArrowExport.writePartitionFile): write to a dot-prefixed
            // temp and ATOMIC_MOVE into place, so a retried or
            // speculative attempt can never leave a torn doc_N.png for
            // the binaryFile reader to decode — the *.png pathGlobFilter
            // below hides any orphaned .tmp from a mid-write death, and
            // both attempts write identical bytes so replace-wins is safe
            val tid = org.apache.spark.TaskContext.get.taskAttemptId
            it.foreach { case (id, bytes) =>
              val tmp = java.nio.file.Paths.get(
                s"$out/.doc_$id.attempt-$tid.tmp")
              java.nio.file.Files.write(tmp, bytes)
              java.nio.file.Files.move(tmp,
                java.nio.file.Paths.get(s"$out/doc_$id.png"),
                java.nio.file.StandardCopyOption.ATOMIC_MOVE,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            }
          }
        val files = s.read.format("binaryFile")
          .option("pathGlobFilter", "*.png").load(out)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.png$", 1)
              .cast("long").as("doc_id"),
            col("content").as("payload"))
        m.pngFeatures(files, "doc_id", "payload")
          .orderBy(col("doc_id"))
      },
      """WITH d AS (
           SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
                  octet_length(encode(coalesce(text, ''))) AS len
           FROM documents WHERE doc_id < 50),
         dims AS (SELECT doc_id, hx, len, greatest(len // 48, 1) AS height FROM d),
         px AS (SELECT doc_id, u.i AS i,
                       CASE WHEN u.i < len
                            THEN CAST('0x' || substr(hx, 2 * u.i + 1, 2) AS INTEGER)
                            ELSE 0 END AS v
                FROM dims, unnest(generate_series(0, height * 48 - 1)) AS u(i)),
         agg AS (SELECT doc_id,
                        sum(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS sr,
                        sum(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS sg,
                        sum(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS sb
                 FROM px GROUP BY doc_id)
         SELECT dims.doc_id, CAST(16 AS INTEGER) AS width,
                CAST(dims.height AS INTEGER) AS height,
                CAST(3 AS INTEGER) AS channels,
                CAST(agg.sr AS DOUBLE) / (16 * dims.height) AS mean_r,
                CAST(agg.sg AS DOUBLE) / (16 * dims.height) AS mean_g,
                CAST(agg.sb AS DOUBLE) / (16 * dims.height) AS mean_b
         FROM dims JOIN agg USING (doc_id) ORDER BY dims.doc_id"""),

    "io15_arrow_export" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val tmp = scratchDir(s"io15_arrow_${new java.io.File(dir).getName}")
        val df = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .repartition(4)
        graft.api.ArrowExport.writeArrowIpcFiles(df, tmp, batchRows = 1024)
        val files = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".arrow")).sortBy(_.getName)
        val back = files.map(f => graft.api.ArrowExport.fromArrowIpc(s,
          java.nio.file.Files.readAllBytes(f.toPath))).reduce(_ unionByName _)
        back.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
            min(col("o_orderkey")).as("k_min"),
            max(col("o_orderkey")).as("k_max"))
          .orderBy(col("o_orderstatus"))
      },
      """SELECT o_orderstatus, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents,
                min(o_orderkey) AS k_min, max(o_orderkey) AS k_max
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    "io07_orc_roundtrip" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val tmp = scratchDir(s"io07_orc_${new java.io.File(dir).getName}")
        s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate").cast("date").as("o_date"))
          .write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
            min(col("o_date")).as("d_min"), max(col("o_date")).as("d_max"))
          .orderBy(col("o_orderstatus"))
      },
      """SELECT o_orderstatus, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
                min(CAST(o_orderdate AS DATE)) AS d_min,
                max(CAST(o_orderdate AS DATE)) AS d_max
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    // Fixed-width histogram over a metric column — the value-distribution
    // profile every ingestion dashboard draws. Bucketing is a map-only
    // expression; one shuffle on the (small) bucket key; cents-exact sums.
    "e06_histogram" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.streaming.Events.readRaw(s, dir)
          .select(floor(col("value") / lit(25.0)).cast("long").as("bucket"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"),
            min(col("cents")).as("cents_min"), max(col("cents")).as("cents_max"))
          .orderBy(col("bucket"))
      },
      """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
                min(CAST(round(value * 100) AS BIGINT)) AS cents_min,
                max(CAST(round(value * 100) AS BIGINT)) AS cents_max
         FROM events GROUP BY 1 ORDER BY bucket"""),

    // Conditional expressions: multi-arm CASE, NULLIF/COALESCE chains and
    // GREATEST/LEAST — row-local codegen'd expressions (whole-stage), no
    // shuffle beyond the determinism sort.
    "q26_conditional" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_linenumber"),
            when(col("l_quantity") >= 25, lit("bulk"))
              .when(col("l_quantity") >= 10, lit("mid"))
              .otherwise(lit("small")).as("size_class"),
            coalesce(nullif(col("l_returnflag"), lit("N")), lit("-")).as("flag_or_dash"),
            greatest(col("l_discount"), col("l_tax")).as("rate_max"),
            least(col("l_discount"), col("l_tax")).as("rate_min"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      """SELECT l_orderkey, l_linenumber,
                CASE WHEN l_quantity >= 25 THEN 'bulk'
                     WHEN l_quantity >= 10 THEN 'mid'
                     ELSE 'small' END AS size_class,
                coalesce(nullif(l_returnflag, 'N'), '-') AS flag_or_dash,
                greatest(l_discount, l_tax) AS rate_max,
                least(l_discount, l_tax) AS rate_min
         FROM lineitem ORDER BY l_orderkey, l_linenumber"""),

    // Audio feature extraction over WAV payloads: sample count, mean
    // amplitude, RMS energy, peak ratio — the audio analog of m05's image
    // features. Decode is partition-wise (payloads never move); Long
    // accumulators make the double divisions bit-reproducible, so the
    // oracle re-derives every feature from the source bytes.
    "m06_audio_features" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val m = graft.ops.Multimodal
        m.audioFeatures(
            m.withWavPayload(
              s.read.parquet(s"$dir/documents.parquet")
                .withColumn("text", coalesce(col("text"), lit(""))),
              "doc_id", "text"),
            "doc_id", "payload")
          .orderBy(col("doc_id"))
      },
      """WITH d AS (SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
                           octet_length(encode(coalesce(text, ''))) AS len
                    FROM documents),
         sm AS (SELECT doc_id,
                       CAST('0x' || substr(hx, 2 * u.i + 1, 2) AS INTEGER) AS v
                FROM d, unnest(generate_series(0, len - 1)) AS u(i)
                WHERE len > 0),
         agg AS (SELECT doc_id, count(*) AS n, sum(v) AS sv,
                        sum(v * v) AS svv,
                        sum(CASE WHEN v >= 128 THEN 1 ELSE 0 END) AS pk
                 FROM sm GROUP BY doc_id)
         SELECT d.doc_id, CAST(8000 AS INTEGER) AS sample_rate,
                CAST(coalesce(agg.n, 0) AS BIGINT) AS n_samples,
                CASE WHEN agg.n IS NULL THEN 0.0
                     ELSE CAST(agg.sv AS DOUBLE) / agg.n END AS mean_amp,
                CASE WHEN agg.n IS NULL THEN 0.0
                     ELSE sqrt(CAST(agg.svv AS DOUBLE) / agg.n) END AS rms,
                CASE WHEN agg.n IS NULL THEN 0.0
                     ELSE CAST(agg.pk AS DOUBLE) / agg.n END AS peak_ratio
         FROM d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id"""),

    // Ordered string aggregation ("group into list"): per-group sorted
    // concat — collect_list is UNORDERED in a distributed engine, so the
    // deterministic form is sort_array before joining. Group sizes here
    // are bounded (nations per region); the operator is only scale-sane
    // when they are.
    "g06_string_agg" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val n = s.read.parquet(s"$dir/nation.parquet")
        val r = s.read.parquet(s"$dir/region.parquet")
        n.join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_regionkey"), col("r_name"))
          .agg(count(lit(1)).as("n_nations"),
            concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))
          .orderBy(col("r_regionkey"))
      },
      """SELECT r_regionkey, r_name, count(*) AS n_nations,
                string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_regionkey, r_name ORDER BY r_regionkey"""),

    // Time-series resample + gap-fill + forward-fill (graft.ops.Resample):
    // 15-minute activity bins per user over a dense grid, empty bins
    // carried forward — the feature-store primitive. Integer micros
    // `div` binning (exact long arithmetic), sequence/explode grid
    // bounded by each key's observed span.
    "e07_resample_ffill" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val ev = graft.streaming.Events.readRaw(s, dir)
          .filter(col("user_id") < 20)
          .withColumn("cents", round(col("value") * 100).cast("long"))
        graft.ops.Resample.binFill(ev, "user_id", "ts", "cents",
            binWidth = 900L * graft.streaming.Events.MicrosPerSecond)
          .orderBy(col("user_id"), col("bin"))
      },
      """WITH b AS (SELECT user_id,
                  CAST(floor(epoch(ts) / 900) AS BIGINT) AS bin,
                  count(*) AS n,
                  sum(CAST(round(value * 100) AS BIGINT)) AS cents
           FROM events WHERE user_id < 20 GROUP BY 1, 2),
         bounds AS (SELECT user_id, min(bin) AS lo, max(bin) AS hi
                    FROM b GROUP BY 1),
         grid AS (SELECT user_id, u.g AS bin
                  FROM bounds, unnest(generate_series(lo, hi)) AS u(g)),
         j AS (SELECT g.user_id, g.bin, b.n, b.cents
               FROM grid g LEFT JOIN b USING (user_id, bin))
         SELECT user_id, bin, coalesce(n, 0) AS n,
                CAST(last_value(cents IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY bin) AS BIGINT) AS cents_ff
         FROM j ORDER BY user_id, bin"""),

    // HTML boilerplate removal (web-corpus cleanup): wrap each document
    // in markup in-query (escaped, so the round trip is exact), then
    // strip tags, decode entities, collapse whitespace. Clean text is
    // gated by length + md5 — a single divergent character anywhere in
    // 500 documents flips the hash. Map-only expression tree.
    "t10_html_strip" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val T = graft.ops.TextAnalysis
        val html = concat(lit("<html><body><h1>"), col("source"),
          lit("</h1>\n<p class=\"c\">"),
          T.htmlEscape(coalesce(col("text"), lit(""))),
          lit("</p>\n<a href=\"http://example.com\">link</a></body></html>"))
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), T.stripHtml(html).as("clean"))
          .select(col("doc_id"),
            length(col("clean")).cast("long").as("n_clean"),
            md5(col("clean")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      """WITH h AS (SELECT doc_id,
             '<html><body><h1>' || source || '</h1>' || chr(10) ||
             '<p class="c">' ||
             replace(replace(replace(coalesce(text, ''),
               '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
             '</p>' || chr(10) ||
             '<a href="http://example.com">link</a></body></html>' AS html
           FROM documents),
         st AS (SELECT doc_id,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(
                 regexp_replace(html, '<[^>]+>', '', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', chr(39)), '&amp;', '&'),
               '[ \t\n\r]+', ' ', 'g')) AS clean
           FROM h)
         SELECT doc_id, CAST(length(clean) AS BIGINT) AS n_clean,
                md5(clean) AS clean_md5
         FROM st ORDER BY doc_id""")
,
    // Spark's NATIVE session_window operator (dynamic-width event-time
    // sessions as a first-class aggregation), complementing e02's
    // composed gaps-and-islands formulation. Session identity comes from
    // session_window; the gated start comes from min(raw micros), so no
    // timestamp ever needs casting. Boundary semantics: a gap of EXACTLY
    // the window size starts a NEW session (window end exclusive) — the
    // oracle's islands use >= accordingly. One shuffle on user_id.
    "e08_session_window" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.streaming.Events.readRaw(s, dir)
          .select(col("user_id"), col("ts"),
            expr("cast(timestamp_micros(ts) as timestamp_ntz)").as("tse"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy(col("user_id"), session_window(col("tse"), "30 minutes"))
          .agg(expr("min(ts)").as("start_us"),
            count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
          .select(col("user_id"), col("start_us"), col("n_events"), col("cents"))
          .orderBy(col("user_id"), col("start_us"))
      },
      """WITH x AS (SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS ns
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (SELECT user_id, ts, value,
                sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
              FROM x)
         SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
                count(*) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
         FROM y GROUP BY user_id, sid ORDER BY user_id, start_us"""),

    // Edit-distance fuzzy dedup (graft.ops.Dedup.editDistancePairs):
    // dual-key blocking + exact levenshtein verify over 64-char prefixes.
    // The oracle enumerates ALL blocked pairs exhaustively with the same
    // predicate, so a green hash proves the two-equi-join formulation
    // loses nothing vs brute force — and it recovers exactly the
    // corpus's 25 planted near-duplicates.
    "d12_editdist_pairs" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.editDistancePairs(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            prefixLen = 64, blockLen = 24, maxDist = 8)
          .orderBy(col("id_a"), col("id_b"))
      },
      """WITH p AS (SELECT doc_id, substr(coalesce(text, ''), 1, 64) AS pre
                    FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS dist
         FROM p a JOIN p b ON a.doc_id < b.doc_id
         WHERE (substr(a.pre, 1, 24) = substr(b.pre, 1, 24)
             OR substr(a.pre, greatest(length(a.pre) - 23, 1)) =
                substr(b.pre, greatest(length(b.pre) - 23, 1)))
           AND levenshtein(a.pre, b.pre) <= 8
         ORDER BY id_a, id_b"""),

    // Deterministic argmax/argmin per group via lexicographic struct
    // extrema — "pick the representative row per cluster by score" with
    // a unique-key tiebreak, in ONE aggregation pass (no rank window, no
    // self-join). Struct comparison is field-order lexicographic in both
    // engines.
    "g07_argmax" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .groupBy(col("o_orderpriority"))
          .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("mx"),
            min(struct(col("o_totalprice"), col("o_orderkey"))).as("mn"))
          .select(col("o_orderpriority"),
            col("mx.o_orderkey").as("best_key"),
            col("mx.o_totalprice").as("best_price"),
            col("mn.o_orderkey").as("worst_key"),
            col("mn.o_totalprice").as("worst_price"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority,
                (max({'p': o_totalprice, 'k': o_orderkey})).k AS best_key,
                (max({'p': o_totalprice, 'k': o_orderkey})).p AS best_price,
                (min({'p': o_totalprice, 'k': o_orderkey})).k AS worst_key,
                (min({'p': o_totalprice, 'k': o_orderkey})).p AS worst_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // SCD-type-2 history (graft.ops.Cdc.scd2): keep every version of
    // every key with its validity range — the warehouse complement of
    // u01's collapse-to-latest. Versions synthesized deterministically
    // (v1: every 10th key repriced 2x; v2: every 20th 3x), cents exact.
    "u02_scd2" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        def snap(mod: Int, mult: Int, ver: Long) =
          s.read.parquet(s"$dir/orders.parquet")
            .filter(col("o_orderkey") % mod === 0)
            .select(col("o_orderkey"),
              (round(col("o_totalprice") * 100).cast("long") * mult).as("cents"))
            .withColumn("ver", lit(ver))
        val hist = snap(1, 1, 0L).unionByName(snap(10, 2, 1L))
          .unionByName(snap(20, 3, 2L))
        graft.ops.Cdc.scd2(hist, Seq("o_orderkey"), "ver", openEnd = 9999L)
          .select(col("o_orderkey"), col("ver"), col("cents"), col("eff_to"))
          .orderBy(col("o_orderkey"), col("ver"))
      },
      """WITH hist AS (
           SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  0 AS ver FROM orders
           UNION ALL
           SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 2, 1
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 3, 2
           FROM orders WHERE o_orderkey % 20 = 0)
         SELECT o_orderkey, CAST(ver AS BIGINT) AS ver,
                CAST(cents AS BIGINT) AS cents,
                CAST(coalesce(lead(ver) OVER (PARTITION BY o_orderkey
                                              ORDER BY ver), 9999) AS BIGINT) AS eff_to
         FROM hist ORDER BY o_orderkey, ver"""),

    // Point-in-time (AS OF) reconstruction over the u02 SCD2 intervals
    // (Cdc.asOf): the table state at version 1 — keys with a v1 snapshot
    // show the 2x payload, everything else the v0 one. A pure interval
    // filter: no join, no shuffle, prunable at scan time.
    // BITEMPORAL point-in-time (Cdc.bitemporalAsOf, u08): statements
    // carry business validity [vf, vt) AND a transaction version; a
    // later tx about the same (key, vf) supersedes (a correction). The
    // query reconstructs "as believed at tx 2, what held at business
    // time 7": base rows (tx0, valid from 0), a tx1 re-statement from
    // vf=5 for every 10th key, and a tx2 CORRECTION of the same
    // interval for every 20th — which must supersede tx1. Two
    // max(struct) argmaxes, no windows; oracle mirrors with
    // row_number DESC picks.
    "u08_bitemporal" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        def stmt(mod: Int, mult: Int, vf: Long, tx: Long) =
          s.read.parquet(s"$dir/orders.parquet")
            .filter(col("o_orderkey") % mod === 0)
            .select(col("o_orderkey"),
              (round(col("o_totalprice") * 100).cast("long") * mult)
                .as("cents"),
              lit(vf).as("vf"), lit(9999L).as("vt"), lit(tx).as("tx"))
        val hist = stmt(1, 1, 0L, 0L)
          .unionByName(stmt(10, 2, 5L, 1L))
          .unionByName(stmt(20, 3, 5L, 2L))
        graft.ops.Cdc.bitemporalAsOf(hist, Seq("o_orderkey"),
            "vf", "vt", "tx", txAt = 2L, validAt = 7L)
          .orderBy(col("o_orderkey"))
      },
      """WITH hist AS (
           SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  CAST(0 AS BIGINT) AS vf, CAST(9999 AS BIGINT) AS vt,
                  CAST(0 AS BIGINT) AS tx
           FROM orders
           UNION ALL
           SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) * 2, 5, 9999, 1
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) * 3, 5, 9999, 2
           FROM orders WHERE o_orderkey % 20 = 0),
         bel AS (SELECT o_orderkey, vf, vt, tx, cents FROM (
                   SELECT h.*, row_number() OVER (
                     PARTITION BY o_orderkey, vf ORDER BY tx DESC) AS rn
                   FROM hist h WHERE tx <= 2) WHERE rn = 1),
         eff AS (SELECT o_orderkey, vf, vt, tx, cents FROM (
                   SELECT b.*, row_number() OVER (
                     PARTITION BY o_orderkey ORDER BY vf DESC) AS rn
                   FROM bel b WHERE vf <= 7 AND vt > 7) WHERE rn = 1)
         SELECT o_orderkey, vf, vt, tx, cents
         FROM eff ORDER BY o_orderkey"""),

    // MERGE INTO at the SQL surface (u09): all four arm kinds in one
    // statement — conditional MATCHED DELETE ahead of MATCHED UPDATE
    // (textual priority), conditional NOT-MATCHED INSERT, and a
    // NOT MATCHED BY SOURCE DELETE — lowered by MergeSql onto one full-
    // outer join + per-column CASE chains. DuckDB 1.0 predates MERGE, so
    // the oracle is the arm-by-arm relational equivalent (the verdict's
    // anticipated fallback); the rollup gates the post-merge table.
    // DML statement forms (u10, [[graft.sql.DmlSql]]): INSERT INTO
    // (SELECT source + VALUES-with-column-list), UPDATE … SET … WHERE,
    // DELETE FROM … WHERE — each returns the post-statement table (the
    // u09 MERGE convention), chained here by re-registering views. The
    // oracle re-derives every step relationally (UNION ALL / CASE /
    // NOT-coalesce — the standard's semantics for each form). INSERT is
    // a shuffle-free union, UPDATE a map-side CASE, DELETE a map-side
    // filter.
    "u10_dml_statements" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("u10_base")
        graft.api.Table.sessionSql(s,
          """INSERT INTO u10_base
             SELECT k + 1000000, 'X', cents DIV 2 FROM u10_base
             WHERE k % 3 = 0""").df.createOrReplaceTempView("u10_i1")
        graft.api.Table.sessionSql(s,
          """INSERT INTO u10_i1 (st, k)
             VALUES ('V', 999999901), ('V', 999999902)""").df
          .createOrReplaceTempView("u10_i2")
        graft.api.Table.sessionSql(s,
          """UPDATE u10_i2 SET st = 'U', cents = cents * 2
             WHERE cents < 5000000""").df
          .createOrReplaceTempView("u10_u")
        graft.api.Table.sessionSql(s,
          "DELETE FROM u10_u WHERE st = 'X' AND cents % 10 = 0").df
          .groupBy(col("st"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"),
            min(col("k")).as("mn"), max(col("k")).as("mx"))
          .orderBy(col("st"))
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 7 = 0),
         i1 AS (SELECT * FROM base
                UNION ALL
                SELECT k + 1000000, 'X', cents // 2 FROM base
                WHERE k % 3 = 0),
         i2 AS (SELECT * FROM i1
                UNION ALL
                SELECT * FROM (VALUES (999999901, 'V', NULL),
                                      (999999902, 'V', NULL))
                       v(k, st, cents)),
         u AS (SELECT k,
                 CASE WHEN cents < 5000000 THEN 'U' ELSE st END AS st,
                 CASE WHEN cents < 5000000 THEN cents * 2
                      ELSE cents END AS cents
               FROM i2),
         d AS (SELECT * FROM u
               WHERE NOT coalesce(st = 'X' AND cents % 10 = 0, FALSE))
         SELECT st, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM d GROUP BY st ORDER BY st"""),

    // INSERT … ON CONFLICT upsert (u12, [[graft.sql.DmlSql]]): both
    // arms — DO UPDATE with `excluded.`-referencing SET expressions
    // (the incoming row rides the plan as a genuine struct column) and
    // DO NOTHING — chained, each returning the post-statement table.
    // One keyed join + one anti-join per statement; the duplicate-
    // source-key contract enforced by one aggregate. The oracle
    // re-derives both arms relationally (LEFT JOIN + CASE / NOT EXISTS
    // — DuckDB's native ON CONFLICT needs a unique index, which frames
    // don't carry).
    "u12_insert_on_conflict" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 4 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("u12_base")
        graft.api.Table.sessionSql(s,
          """INSERT INTO u12_base
             SELECT k + 12, 'C', cents DIV 3 FROM u12_base WHERE k % 3 = 0
             ON CONFLICT (k) DO UPDATE
               SET cents = excluded.cents + cents, st = 'U'""").df
          .createOrReplaceTempView("u12_up")
        graft.api.Table.sessionSql(s,
          """INSERT INTO u12_up VALUES
               (2, 'N', 777), (4, 'N', 888)
             ON CONFLICT (k) DO NOTHING""").df
          .groupBy(col("st"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"),
            min(col("k")).as("mn"), max(col("k")).as("mx"))
          .orderBy(col("st"))
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 4 = 0),
         s1 AS (SELECT k + 12 AS k, 'C' AS st, cents // 3 AS cents
                FROM base WHERE k % 3 = 0),
         up AS (SELECT b.k,
                  CASE WHEN s1.k IS NOT NULL THEN 'U' ELSE b.st END AS st,
                  CASE WHEN s1.k IS NOT NULL THEN s1.cents + b.cents
                       ELSE b.cents END AS cents
                FROM base b LEFT JOIN s1 ON s1.k = b.k
                UNION ALL
                SELECT k, st, cents FROM s1 s
                WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.k = s.k)),
         s2(k, st, cents) AS (VALUES (2, 'N', 777), (4, 'N', 888)),
         fin AS (SELECT * FROM up
                 UNION ALL
                 SELECT k, st, cents FROM s2 s
                 WHERE NOT EXISTS (SELECT 1 FROM up u WHERE u.k = s.k))
         SELECT st, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM fin GROUP BY st ORDER BY st"""),

    // Correlated DML (u13, [[graft.sql.DmlSql]]): UPDATE … FROM (the
    // Postgres/DuckDB enrich-from-lookup form — WHERE is the JOIN
    // predicate, matched rows take both-alias SET expressions,
    // unmatched pass through; a target row matching several source
    // rows REFUSES) and DELETE … USING (any match deletes). The mixed
    // equi+theta predicate here exercises the checkpoint-guard path:
    // the join materializes ONCE, guard and output read the blocks.
    // The oracle re-derives both statements relationally (LEFT JOIN +
    // CASE / NOT EXISTS — the standard's semantics).
    "u13_correlated_dml" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("u13_base")
        s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey").as("ck"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
          .createOrReplaceTempView("u13_src")
        s.read.parquet(s"$dir/supplier.parquet")
          .select(col("s_suppkey").as("sk"), col("s_nationkey").as("nat"))
          .createOrReplaceTempView("u13_sup")
        graft.api.Table.sessionSql(s,
          """UPDATE u13_base AS t SET cents = t.cents + s.bal_cents,
               st = 'J'
             FROM u13_src AS s
             WHERE t.k = s.ck AND t.cents < 20000000""").df
          .createOrReplaceTempView("u13_u")
        graft.api.Table.sessionSql(s,
          """DELETE FROM u13_u AS t USING u13_sup AS s
             WHERE t.k = s.sk AND s.nat < 10""").df
          .groupBy(col("st"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"),
            min(col("k")).as("mn"), max(col("k")).as("mx"))
          .orderBy(col("st"))
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 7 = 0),
         src AS (SELECT c_custkey AS ck,
                CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
           FROM customer),
         u AS (SELECT t.k,
                 CASE WHEN s.ck IS NOT NULL THEN 'J' ELSE t.st END AS st,
                 CASE WHEN s.ck IS NOT NULL THEN t.cents + s.bal_cents
                      ELSE t.cents END AS cents
               FROM base t LEFT JOIN src s
                 ON t.k = s.ck AND t.cents < 20000000),
         s2 AS (SELECT s_suppkey AS sk, s_nationkey AS nat FROM supplier),
         d AS (SELECT * FROM u t WHERE NOT EXISTS (
                 SELECT 1 FROM s2 s WHERE t.k = s.sk AND s.nat < 10))
         SELECT st, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM d GROUP BY st ORDER BY st"""),

    // Conditional upsert (u14, [[graft.sql.DmlSql]]): ON CONFLICT …
    // DO UPDATE SET … WHERE — a conflicting row updates only when the
    // condition holds (bare names = target columns, excluded. = the
    // incoming row); FALSE/NULL keeps the target row AND still blocks
    // the insert (DuckDB's probed rule, see DmlSqlSpec). The oracle
    // re-derives the arm relationally (DuckDB's native ON CONFLICT
    // needs a unique index, which frames don't carry).
    "u14_conflict_where" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 4 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("u14_base")
        graft.api.Table.sessionSql(s,
          """INSERT INTO u14_base
             SELECT k + 8, 'C', cents DIV 5 FROM u14_base WHERE k % 3 = 0
             ON CONFLICT (k) DO UPDATE
               SET cents = excluded.cents + cents, st = 'W'
               WHERE cents < 15000000""").df
          .groupBy(col("st"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"),
            min(col("k")).as("mn"), max(col("k")).as("mx"))
          .orderBy(col("st"))
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 4 = 0),
         s1 AS (SELECT k + 8 AS k, 'C' AS st, cents // 5 AS cents
                FROM base WHERE k % 3 = 0),
         up AS (SELECT b.k,
                  CASE WHEN s1.k IS NOT NULL AND b.cents < 15000000
                       THEN 'W' ELSE b.st END AS st,
                  CASE WHEN s1.k IS NOT NULL AND b.cents < 15000000
                       THEN s1.cents + b.cents ELSE b.cents END AS cents
                FROM base b LEFT JOIN s1 ON s1.k = b.k
                UNION ALL
                SELECT k, st, cents FROM s1 s
                WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.k = s.k))
         SELECT st, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM up GROUP BY st ORDER BY st"""),

    // RETURNING (u15, [[graft.sql.DmlSql]]): every plain DML form
    // returns its AFFECTED rows projected through the item list —
    // inserted rows, the post-image of updated rows (SET over the OLD
    // row), deleted rows (Postgres/DuckDB semantics, probed). Each arm
    // stays expression-level over the plain statement's plan (the
    // DELETE arm is the complement filter of the statement's own
    // anti-join). The oracle re-derives each arm relationally.
    "u15_dml_returning" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 6 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("u15_base")
        val ins = graft.api.Table.sessionSql(s,
          """INSERT INTO u15_base
             SELECT k + 5000000, 'I', cents DIV 2 FROM u15_base
             WHERE k % 4 = 0
             RETURNING k, st, cents""").df
          .select(lit("ins").as("arm"), col("k"), col("cents"))
        val upd = graft.api.Table.sessionSql(s,
          """UPDATE u15_base SET cents = cents + 7, st = 'U'
             WHERE k % 5 = 0
             RETURNING k, st, cents""").df
          .select(lit("upd").as("arm"), col("k"), col("cents"))
        val del = graft.api.Table.sessionSql(s,
          """DELETE FROM u15_base WHERE cents % 3 = 0
             RETURNING k, st, cents * 2 AS cents""").df
          .select(lit("del").as("arm"), col("k"), col("cents"))
        ins.unionByName(upd).unionByName(del)
          .groupBy(col("arm"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"),
            min(col("k")).as("mn"), max(col("k")).as("mx"))
          .orderBy(col("arm"))
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 6 = 0),
         ins AS (SELECT 'ins' AS arm, k + 5000000 AS k, cents // 2 AS cents
                 FROM base WHERE k % 4 = 0),
         upd AS (SELECT 'upd' AS arm, k, cents + 7 AS cents
                 FROM base WHERE k % 5 = 0),
         del AS (SELECT 'del' AS arm, k, cents * 2 AS cents
                 FROM base WHERE cents % 3 = 0),
         u AS (SELECT * FROM ins UNION ALL SELECT * FROM upd
               UNION ALL SELECT * FROM del)
         SELECT arm, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM u GROUP BY arm ORDER BY arm"""),

    // CTE-headed DML (u16, [[graft.api.Table.cteHeadedDml]]): `WITH c
    // AS (…) UPDATE/INSERT …` — Postgres/DuckDB's form (probed). CTEs
    // bind as statement-scoped views (unique internal names, the
    // recursion lowering's scoping rule), the rewritten DML re-enters
    // the normal statement dispatch, so the correlated-UPDATE guard,
    // RETURNING, and every other DML feature compose. The oracle
    // re-derives the chain relationally (the hot CTE keys on the
    // target's own k, so the UPDATE…FROM is a CASE).
    "u16_cte_dml" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 8 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("u16_base")
        graft.api.Table.sessionSql(s,
          """WITH hot(hk) AS (
               SELECT k FROM u16_base WHERE cents > 20000000)
             UPDATE u16_base AS t SET st = 'H'
             FROM hot WHERE t.k = hot.hk""").df
          .createOrReplaceTempView("u16_u")
        graft.api.Table.sessionSql(s,
          """WITH extra(k, st, cents) AS (
               SELECT k + 30000000, 'X', cents DIV 4 FROM u16_u
               WHERE k % 5 = 0)
             INSERT INTO u16_u SELECT * FROM extra""").df
          .groupBy(col("st"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"),
            min(col("k")).as("mn"), max(col("k")).as("mx"))
          .orderBy(col("st"))
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 8 = 0),
         u AS (SELECT k,
                 CASE WHEN cents > 20000000 THEN 'H' ELSE st END AS st,
                 cents
               FROM base),
         fin AS (SELECT * FROM u
                 UNION ALL
                 SELECT k + 30000000, 'X', cents // 4 FROM u
                 WHERE k % 5 = 0)
         SELECT st, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM fin GROUP BY st ORDER BY st"""),

    // Schema-defined DDL + by-name/bulk DML (u17): CREATE TABLE
    // (col TYPE …) binds an EMPTY typed frame the chain builds on;
    // INSERT BY NAME maps source columns by name (unnamed target
    // columns NULL — DuckDB, probed); TRUNCATE empties keeping the
    // schema. The chain seeds an empty table, loads it by name from a
    // shuffled projection, appends VALUES, and rolls up; a TRUNCATE
    // arm pins the empty result. The oracle re-derives relationally
    // (the empty table is a WHERE FALSE base).
    "u17_schema_ddl" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 9 === 0)
          .createOrReplaceTempView("u17_src")
        graft.api.Table.sessionSql(s,
          """CREATE OR REPLACE TEMP TABLE u17_t (
               k BIGINT NOT NULL, st VARCHAR, cents BIGINT, note VARCHAR)""")
        graft.api.Table.sessionSql(s,
          """INSERT INTO u17_t BY NAME
             SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                    o_orderkey AS k, o_orderstatus AS st
             FROM u17_src""").df.createOrReplaceTempView("u17_f")
        graft.api.Table.sessionSql(s,
          "INSERT INTO u17_f (k, note) VALUES (1, 'manual')").df
          .createOrReplaceTempView("u17_g")
        val full = graft.api.Table.sessionSql(s,
          """SELECT 'full' AS arm, count(*) AS n,
                    CAST(sum(cents) AS BIGINT) AS cents,
                    count(note) AS n_note, count(st) AS n_st
             FROM u17_g""").df
        graft.api.Table.sessionSql(s, "TRUNCATE u17_g").df
          .createOrReplaceTempView("u17_e")
        val empty = graft.api.Table.sessionSql(s,
          """SELECT 'trunc' AS arm, count(*) AS n,
                    CAST(sum(cents) AS BIGINT) AS cents,
                    count(note) AS n_note, count(st) AS n_st
             FROM u17_e""").df
        full.unionByName(empty).orderBy(col("arm"))
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                CAST(NULL AS VARCHAR) AS note
           FROM orders WHERE o_orderkey % 9 = 0),
         g AS (SELECT * FROM base
               UNION ALL
               SELECT 1, NULL, NULL, 'manual'),
         fl AS (SELECT 'full' AS arm, count(*) AS n,
                  CAST(sum(cents) AS BIGINT) AS cents,
                  count(note) AS n_note, count(st) AS n_st
                FROM g),
         tr AS (SELECT 'trunc' AS arm, count(*) AS n,
                  CAST(sum(cents) AS BIGINT) AS cents,
                  count(note) AS n_note, count(st) AS n_st
                FROM g WHERE FALSE)
         SELECT * FROM fl UNION ALL SELECT * FROM tr ORDER BY arm"""),

    // DROP TABLE/VIEW + ALTER TABLE surgery (u18, [[graft.sql.DdlSql
    // .parseDrop]]/[[graft.sql.DdlSql.parseAlter]]): the catalog-DDL
    // completion — DROP [IF EXISTS] unbinds, ALTER re-binds the
    // immutable frame derived per the action (RENAME TO / RENAME
    // COLUMN / ADD COLUMN with NULL backfill / DROP COLUMN). The chain
    // proves each action composes with DML on the altered frame
    // (UPDATE fills the added column) and repeat runs exercise the real
    // DROP (the leading IF EXISTS is a no-op only on the first pass).
    // The oracle rebuilds the final shape straight off nation.
    "u18_drop_alter" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/nation.parquet")
          .createOrReplaceTempView("nation")
        def ss(q: String) = graft.api.Table.sessionSql(s, q)
        ss("DROP TABLE IF EXISTS u18_final")
        ss("""CREATE OR REPLACE TEMP TABLE u18_t AS
              SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r
              FROM nation""")
        ss("ALTER TABLE u18_t ADD COLUMN score BIGINT")
        ss("UPDATE u18_t SET score = k * 10 WHERE r <= 2").df
          .createOrReplaceTempView("u18_t")
        ss("ALTER TABLE u18_t RENAME COLUMN name TO nation_name")
        ss("ALTER TABLE u18_t DROP COLUMN r")
        // the type-change arm (r18): plain cast, then a USING
        // conversion — both in-place cast projections
        ss("ALTER TABLE u18_t ALTER COLUMN score TYPE DOUBLE")
        ss("ALTER TABLE u18_t ALTER COLUMN nation_name SET DATA TYPE " +
          "VARCHAR USING substr(nation_name, 1, 5)")
        ss("ALTER TABLE u18_t RENAME TO u18_final")
        ss("""SELECT k, nation_name, score FROM u18_final
              ORDER BY k""").df
      },
      """SELECT n_nationkey AS k,
                substr(n_name, 1, 5) AS nation_name,
                CASE WHEN n_regionkey <= 2
                     THEN CAST(n_nationkey * 10 AS DOUBLE) END AS score
         FROM nation ORDER BY k"""),

    // Subquery-correlated DML (u19): the remaining DML expressiveness
    // tier — a CORRELATED scalar subquery in SET (the enrich-from-
    // aggregate shape), NOT EXISTS and IN-subquery DELETE predicates —
    // all flow through the existing DmlSql lowering because the CASE
    // projection / filter are full Spark expressions (scalar subqueries
    // plan as broadcast subquery joins; the anti/semi shapes stay
    // equi-joins). Chain probed against DuckDB's native execution; the
    // oracle rebuilds the final state with the groupby-left-join
    // equivalence of the correlated max.
    "u19_subquery_dml" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        Seq("orders", "customer").foreach { t =>
          s.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
        }
        def ss(q: String) = graft.api.Table.sessionSql(s, q)
        ss("""CREATE OR REPLACE TEMP TABLE u19_t AS
              SELECT o_orderkey AS k, o_custkey AS c,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders WHERE o_orderkey % 23 = 0""")
        ss("""UPDATE u19_t SET cents = coalesce(
                (SELECT CAST(max(round(o_totalprice * 100)) AS BIGINT)
                 FROM orders
                 WHERE o_custkey = u19_t.c AND o_orderkey % 23 <> 0),
                cents)""").df.createOrReplaceTempView("u19_t")
        ss("""DELETE FROM u19_t WHERE NOT EXISTS
                (SELECT 1 FROM customer
                 WHERE c_custkey = u19_t.c AND c_acctbal > 0)""").df
          .createOrReplaceTempView("u19_t")
        ss("""DELETE FROM u19_t WHERE k IN
                (SELECT o_orderkey FROM orders
                 WHERE o_totalprice > 450000)""").df
          .createOrReplaceTempView("u19_t")
        ss("""SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                     min(k) AS mn, max(k) AS mx
              FROM u19_t""").df
      },
      """WITH base AS (SELECT o_orderkey AS k, o_custkey AS c,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 23 = 0),
         mx AS (SELECT o_custkey AS c,
                  CAST(max(round(o_totalprice * 100)) AS BIGINT) AS m
                FROM orders WHERE o_orderkey % 23 <> 0 GROUP BY 1),
         upd AS (SELECT b.k, b.c, coalesce(mx.m, b.cents) AS cents
                 FROM base b LEFT JOIN mx USING (c)),
         d1 AS (SELECT * FROM upd u
                WHERE EXISTS (SELECT 1 FROM customer
                              WHERE c_custkey = u.c AND c_acctbal > 0)),
         d2 AS (SELECT * FROM d1
                WHERE k NOT IN (SELECT o_orderkey FROM orders
                                WHERE o_totalprice > 450000))
         SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM d2"""),

    // Multi-statement script execution (u20, [[graft.sql.Dialect
    // .splitStatements]] + the sessionSql script loop): top-level
    // semicolons split into sequential statements; a statement that
    // MUTATES a bare-named table re-binds the name to its post-image
    // (the script sees its own writes — DuckDB's execute semantics),
    // and the final statement's table is the result. The oracle
    // rebuilds the end state in one query. RETURNING mid-script refuses
    // (its projection is not the post-image); a semicolon inside a
    // literal never splits (masked scan, fuzz-pinned).
    "u20_script" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/region.parquet")
          .createOrReplaceTempView("region")
        graft.api.Table.sessionSql(s,
          """DROP TABLE IF EXISTS u20_t;
             CREATE OR REPLACE TEMP TABLE u20_t AS
               SELECT r_regionkey AS k, r_name AS nm FROM region;
             INSERT INTO u20_t VALUES (99, 'extra;not a split');
             UPDATE u20_t SET nm = upper(nm) WHERE k % 2 = 0;
             DELETE FROM u20_t WHERE k = 1;
             SELECT k, nm FROM u20_t ORDER BY k;""").df
      },
      """WITH t AS (SELECT r_regionkey AS k, r_name AS nm FROM region
                    UNION ALL SELECT 99, 'extra;not a split')
         SELECT k, CASE WHEN k % 2 = 0 THEN upper(nm) ELSE nm END AS nm
         FROM t WHERE k <> 1 ORDER BY k"""),

    // Upsert RETURNING (u21, [[graft.sql.DmlSql]] runOnConflict
    // returningOnly): RETURNING composed with ON CONFLICT — Postgres
    // semantics, probed: DO NOTHING returns ONLY the inserted rows
    // (conflicting rows are not affected); DO UPDATE returns inserted
    // rows plus the post-image of rows whose u14 WHERE gate fired
    // (FALSE/NULL blocks the update AND the return). The most common
    // RETURNING shape in application code (get-or-create / upsert-
    // and-read). The oracle re-derives both arms relationally (DuckDB's
    // native ON CONFLICT needs a unique index, which frames don't
    // carry — the u12/u14 discipline). Both statements target the
    // ORIGINAL base (sessionSql DML outside scripts never rebinds).
    "u21_upsert_returning" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 9 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("u21_base")
        val up = graft.api.Table.sessionSql(s,
          """INSERT INTO u21_base
             SELECT k + 18, 'C', cents DIV 3 FROM u21_base WHERE k % 2 = 0
             ON CONFLICT (k) DO UPDATE
               SET cents = excluded.cents + cents, st = 'U'
               WHERE cents < 18000000
             RETURNING k, st, cents""").df
          .select(lit("up").as("arm"), col("k"), col("st"), col("cents"))
        val dn = graft.api.Table.sessionSql(s,
          """INSERT INTO u21_base
             SELECT min(k), 'N', 111 FROM u21_base
             UNION ALL SELECT 999000001, 'N', 222
             ON CONFLICT (k) DO NOTHING
             RETURNING k, st, cents""").df
          .select(lit("dn").as("arm"), col("k"), col("st"), col("cents"))
        up.unionByName(dn)
          .groupBy(col("arm"), col("st"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"),
            min(col("k")).as("mn"), max(col("k")).as("mx"))
          .orderBy(col("arm"), col("st"))
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 9 = 0),
         s1 AS (SELECT k + 18 AS k, 'C' AS st, cents // 3 AS cents
                FROM base WHERE k % 2 = 0),
         upd AS (SELECT 'up' AS arm, b.k, 'U' AS st,
                        s1.cents + b.cents AS cents
                 FROM base b JOIN s1 ON s1.k = b.k
                 WHERE b.cents < 18000000),
         ins1 AS (SELECT 'up' AS arm, k, st, cents FROM s1 s
                  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.k = s.k)),
         s2 AS (SELECT min(k) AS k, 'N' AS st, CAST(111 AS BIGINT) AS cents
                FROM base
                UNION ALL SELECT 999000001, 'N', 222),
         ins2 AS (SELECT 'dn' AS arm, k, st, cents FROM s2 s
                  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.k = s.k)),
         u AS (SELECT * FROM upd UNION ALL SELECT * FROM ins1
               UNION ALL SELECT * FROM ins2)
         SELECT arm, st, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM u GROUP BY arm, st ORDER BY arm, st"""),

    // Script transactions (u22, [[graft.api.Table.sessionSql]] script
    // loop): `BEGIN; …; COMMIT|ROLLBACK;` — the engine's tables are
    // immutable lazy frames bound by name, so a transaction IS a
    // catalog snapshot: BEGIN captures every session binding (name →
    // analyzed plan, zero execution), ROLLBACK restores the bindings
    // and drops views created since, COMMIT discards the snapshot; a
    // failing statement inside an open transaction rolls back before
    // rethrowing. The script below runs a transaction that ROLLS BACK
    // (cents*3 — absent from the oracle: a broken rollback would
    // change every sum) and one that COMMITS; the oracle re-derives
    // the committed chain relationally (the u12/u20 discipline — the
    // driver's oracle runs as one DuckDB statement).
    // Prepared statements (u24, [[graft.sql.PrepareSql]]): PREPARE
    // stores text with $N / ? placeholders, EXECUTE substitutes the
    // argument expressions (paren-wrapped) and re-enters the dispatch,
    // DEALLOCATE drops — DuckDB's probed rules (re-PREPARE replaces,
    // $1 repeats against one argument, excess arguments error). The
    // script proves placeholders in WHERE, LIMIT, and a projected
    // expression; the oracle is the hand-substituted single statement.
    "u24_prepared_stmt" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .createOrReplaceTempView("u24_orders")
        graft.api.Table.sessionSql(s,
          """PREPARE u24p AS
               SELECT o_orderstatus AS st, count(*) AS n,
                      CAST(sum(CAST(round(o_totalprice) AS BIGINT) % $2)
                        AS BIGINT) AS modsum,
                      CAST($2 AS BIGINT) AS modulus
               FROM u24_orders
               WHERE o_orderkey % $1 = 0 AND o_totalprice > $3
               GROUP BY o_orderstatus
               ORDER BY st;
             EXECUTE u24p(7, 97, 50000.0)""").df
      },
      """SELECT o_orderstatus AS st, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice) AS BIGINT) % 97)
                  AS BIGINT) AS modsum,
                CAST(97 AS BIGINT) AS modulus
         FROM orders
         WHERE o_orderkey % 7 = 0 AND o_totalprice > 50000.0
         GROUP BY o_orderstatus
         ORDER BY st"""),

    // SQL macros (u23, [[graft.sql.MacroSql]]): CREATE MACRO stores
    // session-scoped TEXT; calls expand before the dialect passes, so
    // bodies compose with the whole surface (here: a scalar macro
    // using a list comprehension + subscript, a defaulted parameter
    // bound by name, a TABLE macro consumed in FROM, and one macro
    // calling another — late-bound like DuckDB's). The oracle
    // re-derives the same result with every macro inlined by hand
    // (the u20 end-state-oracle convention: the driver's DuckDB runner
    // gets ONE statement).
    "u23_sql_macros" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/nation.parquet")
          .createOrReplaceTempView("u23_nation")
        graft.api.Table.sessionSql(s,
          """CREATE OR REPLACE MACRO u23_disc(v, pct := 10) AS
               CAST(v * (100 - pct) / 100 AS BIGINT);
             CREATE OR REPLACE MACRO u23_tag(n) AS
               upper(n) || '#' || CAST(len([c FOR c IN
                 string_split(n, '_') IF c <> '']) AS STRING);
             CREATE OR REPLACE MACRO u23_both(n, v) AS
               u23_tag(n) || '@' || CAST(u23_disc(v) AS STRING);
             CREATE OR REPLACE MACRO u23_south(r) AS TABLE
               SELECT n_nationkey AS k, n_name AS nm,
                      CAST(n_regionkey AS BIGINT) AS reg
               FROM u23_nation WHERE n_regionkey <= r;
             SELECT k, u23_both(nm, k * 100) AS t,
                    u23_disc(k * 100, pct := 25) AS d25, reg
             FROM u23_south(2) ORDER BY k""").df
      },
      """SELECT k,
                upper(nm) || '#' ||
                  CAST(len(list_filter(string_split(nm, '_'),
                    c -> c <> '')) AS STRING) ||
                  '@' ||
                  CAST(CAST((k * 100) * (100 - 10) / 100 AS BIGINT)
                    AS STRING) AS t,
                CAST((k * 100) * (100 - 25) / 100 AS BIGINT) AS d25,
                reg
         FROM (SELECT n_nationkey AS k, n_name AS nm,
                      CAST(n_regionkey AS BIGINT) AS reg
               FROM nation WHERE n_regionkey <= 2)
         ORDER BY k"""),

    "u22_script_txn" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("u22_base")
        graft.api.Table.sessionSql(s,
          """BEGIN;
             UPDATE u22_base SET cents = cents * 3 WHERE k % 4 = 0;
             CREATE OR REPLACE TEMP TABLE u22_tmp AS
               SELECT k FROM u22_base WHERE k % 4 = 0;
             ROLLBACK;
             BEGIN TRANSACTION;
             UPDATE u22_base SET st = 'T', cents = cents + 5
               WHERE k % 3 = 0;
             DELETE FROM u22_base WHERE cents > 30000000;
             COMMIT;
             SELECT st, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                    min(k) AS mn, max(k) AS mx
             FROM u22_base GROUP BY st ORDER BY st""").df
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 10 = 0),
         u AS (SELECT k,
                 CASE WHEN k % 3 = 0 THEN 'T' ELSE st END AS st,
                 CASE WHEN k % 3 = 0 THEN cents + 5 ELSE cents END AS cents
               FROM base),
         d AS (SELECT * FROM u WHERE cents <= 30000000)
         SELECT st, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM d GROUP BY st ORDER BY st"""),

    // CTAS / CREATE VIEW statement forms (u11, [[graft.sql.DdlSql]]):
    // CREATE TABLE materializes its defining query ONCE (snapshot — an
    // eager localCheckpoint; durable publish stays with the WAP writer)
    // and CREATE VIEW binds the lazy plan; both bind a session view AND
    // return the defined table (the u09/u10 statement-form convention).
    // The chain here proves composition: a TABLE snapshot over the
    // base, a VIEW aggregating the table, a final SELECT through both
    // bindings. The oracle re-derives the chain as CTEs.
    "u11_ctas" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .createOrReplaceTempView("u11_src")
        graft.api.Table.sessionSql(s,
          """CREATE OR REPLACE TEMP TABLE u11_hot AS
             SELECT o_orderkey AS k, o_orderstatus AS st,
                    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             FROM u11_src WHERE o_orderkey % 5 = 0""")
        graft.api.Table.sessionSql(s,
          """CREATE OR REPLACE VIEW u11_agg AS
             SELECT st, count(*) AS n,
                    CAST(sum(cents) AS BIGINT) AS cents,
                    min(k) AS mn, max(k) AS mx
             FROM u11_hot GROUP BY st""")
        graft.api.Table.sessionSql(s,
          "SELECT st, n, cents, mn, mx FROM u11_agg ORDER BY st").df
      },
      """WITH hot AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 5 = 0),
         agg AS (SELECT st, count(*) AS n,
                   CAST(sum(cents) AS BIGINT) AS cents,
                   min(k) AS mn, max(k) AS mx
                 FROM hot GROUP BY st)
         SELECT st, n, cents, mn, mx FROM agg ORDER BY st"""),

    "u09_merge_into" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("u09_target")
        s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 110).cast("long").as("cents"))
          .createOrReplaceTempView("u09_source")
        graft.api.Table.sessionSql(s,
          """MERGE INTO u09_target t USING u09_source s ON t.o_orderkey = s.o_orderkey
             WHEN MATCHED AND s.cents > 30000000 THEN DELETE
             WHEN MATCHED THEN UPDATE SET cents = s.cents, o_orderstatus = 'U'
             WHEN NOT MATCHED AND s.cents % 5 = 0 THEN
               INSERT (o_orderkey, o_orderstatus, cents)
               VALUES (s.o_orderkey, 'N', s.cents)
             WHEN NOT MATCHED BY SOURCE AND t.cents < 1000000 THEN DELETE""").df
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
            min(col("o_orderkey")).as("mn"), max(col("o_orderkey")).as("mx"))
          .orderBy(col("o_orderstatus"))
      },
      """WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 3 = 0),
         s AS (SELECT o_orderkey AS k,
                  CAST(round(o_totalprice * 110) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 2 = 0),
         j AS (SELECT t.k AS tk, t.st, t.cents AS tc, s.k AS sk, s.cents AS sc
           FROM t FULL OUTER JOIN s ON t.k = s.k),
         m AS (SELECT coalesce(tk, sk) AS k,
                  CASE WHEN tk IS NOT NULL AND sk IS NOT NULL THEN 'U'
                       WHEN sk IS NOT NULL THEN 'N' ELSE st END AS o_orderstatus,
                  CASE WHEN sk IS NOT NULL THEN sc ELSE tc END AS cents
           FROM j
           WHERE NOT (tk IS NOT NULL AND sk IS NOT NULL AND sc > 30000000)
             AND NOT (tk IS NOT NULL AND sk IS NULL AND tc < 1000000)
             AND NOT (tk IS NULL AND sk IS NOT NULL AND sc % 5 <> 0))
         SELECT o_orderstatus, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM m GROUP BY 1 ORDER BY 1"""),

    "u06_point_in_time" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        def snap(mod: Int, mult: Int, ver: Long) =
          s.read.parquet(s"$dir/orders.parquet")
            .filter(col("o_orderkey") % mod === 0)
            .select(col("o_orderkey"),
              (round(col("o_totalprice") * 100).cast("long") * mult).as("cents"))
            .withColumn("ver", lit(ver))
        val hist = snap(1, 1, 0L).unionByName(snap(10, 2, 1L))
          .unionByName(snap(20, 3, 2L))
        val scd = graft.ops.Cdc.scd2(hist, Seq("o_orderkey"), "ver",
          openEnd = 9999L)
        graft.ops.Cdc.asOf(scd, "ver", at = 1L)
          .select(col("o_orderkey"), col("ver"), col("cents"))
          .orderBy(col("o_orderkey"))
      },
      """WITH hist AS (
           SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  0 AS ver FROM orders
           UNION ALL
           SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 2, 1
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 3, 2
           FROM orders WHERE o_orderkey % 20 = 0),
         scd AS (
           SELECT o_orderkey, ver, cents,
                  coalesce(lead(ver) OVER (PARTITION BY o_orderkey
                                           ORDER BY ver), 9999) AS eff_to
           FROM hist)
         SELECT o_orderkey, CAST(ver AS BIGINT) AS ver,
                CAST(cents AS BIGINT) AS cents
         FROM scd WHERE ver <= 1 AND eff_to > 1
         ORDER BY o_orderkey"""),

    // Stratified split (graft.ops.Sampling.stratifiedSplit): per-stratum
    // pct% held out in md5-of-id order, all-integer threshold arithmetic
    // so no float fraction ever decides a row count. Gate aggregates per
    // (stratum, split).
    "sp05_stratified" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Sampling.stratifiedSplit(
            s.read.parquet(s"$dir/documents.parquet"), "lang", "doc_id", pct = 20)
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
          .orderBy(col("lang"), col("split"))
      },
      """WITH r AS (
           SELECT lang, doc_id,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM documents)
         SELECT lang, CASE WHEN rn * 100 <= n * 20 THEN 'test'
                           ELSE 'train' END AS split,
                count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM r GROUP BY 1, 2 ORDER BY lang, split"""),

    // Filtered vector search — top-k under a metadata predicate (the
    // "filtered ANN" problem): the label filter is pushed INTO the
    // corpus parquet scan (PlanSpec-pinned), so the search never scores
    // a vector the predicate excludes. Same bounded-heap exact ranking
    // as s01; oracle re-derives the filtered ranking bit-for-bit.
    "s10_ann_filtered" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        graft.ops.Similarity.bruteForceTopK(
            emb.filter(col("label") < 4), emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10)
          .select(col("probe_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("sim"))
          .orderBy(col("probe_id"), col("rank"))
      },
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] emb FROM embeddings),
         scored AS (
           SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
                  list_cosine_similarity(p.emb, c.emb) AS sim
           FROM e p, e c
           WHERE p.vec_id < 5 AND c.label < 4 AND c.vec_id <> p.vec_id)
         SELECT probe_id, rank, vec_id, sim FROM (
           SELECT probe_id, vec_id, sim,
                  CAST(row_number() OVER (PARTITION BY probe_id
                                          ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
           FROM scored) t
         WHERE rank <= 10 ORDER BY probe_id, rank"""),

    // Durable streaming sink: stream the events corpus through a PARQUET
    // file sink (exactly-once via the checkpointed file-sink log) into a
    // scratch dir, then read the files back and aggregate — the
    // production sink path (memory sinks are test-only), sharing e01's
    // hourly oracle. Integer time arithmetic end to end (readStreamRaw).
    "st08_stream_file_sink" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val out = graft.streaming.Events.readStreamRaw(s, dir)
          .select(
            expr(s"ts - ts % ${graft.streaming.Events.MicrosPerHour}").as("h"),
            col("event_type"), col("value"))
        val base = scratchDir(s"st08_sink_${new java.io.File(dir).getName}")
        val q = out.writeStream.format("parquet")
          .option("path", s"$base/data")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.read.parquet(s"$base/data")
          .groupBy(col("h"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sv"))
          .orderBy(col("h"), col("event_type"))
      },
      hourlyOracle),

    // The LLM text-curation pipeline AS a stream: documents replayed
    // through the file source, stateless map-only transforms (quality
    // gate on n_chars, language ID, BPE token count) to a memory sink —
    // no state store, so the stream IS the batch plan run incrementally.
    // One-batch replay == batch semantics, so the batch oracle
    // (including the recursive-CTE BPE re-derivation) applies unchanged:
    // the proof that curation logic runs identically in batch backfill
    // and streaming ingest.
    "st09_stream_doc_pipeline" -> api(
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        val out = s.readStream.schema(schema)
          .parquet(graft.streaming.Replay.linkDir(s"$dir/documents.parquet"))
          .filter(col("n_chars") >= 200)
          .withColumn("text", coalesce(col("text"), lit("")))
          .select(col("doc_id"), col("lang"),
            graft.ops.TextAnalysis.langId(col("text")).as("pred_lang"),
            graft.ops.TextAnalysis.bpeTokenCount(col("text")).as("bpe_tokens"))
        val sink = "st09_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink).orderBy(col("doc_id"))
      },
      s"""WITH RECURSIVE $bpeCountCtes,
         f AS (SELECT doc_id, lang, coalesce(text, '') AS text
               FROM documents WHERE n_chars >= 200),
         c AS (SELECT doc_id, lang,
                  len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|that|it|for|was)\\b')) AS c_en,
                  len(regexp_extract_all(lower(text), '\\b(der|die|das|und|ist|nicht|ein|mit|auf|zu)\\b')) AS c_de,
                  len(regexp_extract_all(lower(text), '\\b(le|la|les|et|est|dans|que|pour|une|pas)\\b')) AS c_fr,
                  len(regexp_extract_all(lower(text), '\\b(el|los|las|de|que|y|en|un|por|con)\\b')) AS c_es
               FROM f)
         SELECT c.doc_id, c.lang,
                CASE WHEN c_en > 0 AND c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
                     WHEN c_de > 0 AND c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
                     WHEN c_fr > 0 AND c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
                     WHEN c_es > 0 AND c_es = greatest(c_en, c_de, c_fr, c_es) THEN 'es'
                     ELSE 'und' END AS pred_lang,
                CAST(coalesce(pc.n, 0) AS BIGINT) AS bpe_tokens
         FROM c LEFT JOIN pc USING (doc_id)
         ORDER BY doc_id"""),

    // Value-picking window functions (first/last/nth within an ordered
    // frame, unique tiebreak) — same-text in both engines, including the
    // named WINDOW clause and explicit unbounded frame for last_value.
    "w06_value_windows" -> multi(Seq("orders"),
      """SELECT o_orderkey,
                first_value(o_orderkey) OVER w AS fv,
                last_value(o_orderkey) OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
                nth_value(o_orderkey, 3) OVER w AS nv
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderkey"""),

    // Boolean / conditional aggregates: count_if, bool_and, bool_or —
    // the data-quality assertion primitives ("every row positive", "any
    // row discounted"), one map-side-combined aggregation.
    "g08_bool_agg" -> multi(Seq("lineitem"),
      """SELECT l_returnflag,
                CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
                bool_and(l_quantity > 0) AS all_pos,
                bool_or(l_discount > 0.09) AS any_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Composed pipeline v3 over the round-7 operators: web-corpus HTML
    // cleanup (t10's chain) -> length quality gate -> edit-distance
    // fuzzy dedup on the CLEANED text (d12's blocked join, min-id
    // representative kept via anti-join) -> per-source rollup. One
    // oracle SQL chains the identical stages, so the hash proves the
    // operators compose, not just pass individually. All stages map-only
    // or equi-keyed; nothing touches the driver.
    "p07_pipeline_v3" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val T = graft.ops.TextAnalysis
        val html = concat(lit("<html><body><h1>"), col("source"),
          lit("</h1>\n<p class=\"c\">"),
          T.htmlEscape(coalesce(col("text"), lit(""))),
          lit("</p>\n<a href=\"http://example.com\">link</a></body></html>"))
        val cleaned = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), T.stripHtml(html).as("clean"))
          .withColumn("n_clean", length(col("clean")).cast("long"))
          .filter(col("n_clean") >= 200)
        val pairs = graft.ops.Dedup.editDistancePairs(cleaned, "doc_id", "clean",
          prefixLen = 64, blockLen = 24, maxDist = 8)
        cleaned.join(pairs.select(col("id_b").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_clean")).as("total_chars"))
          .orderBy(col("source"))
      },
      """WITH h AS (SELECT doc_id, source,
             '<html><body><h1>' || source || '</h1>' || chr(10) ||
             '<p class="c">' ||
             replace(replace(replace(coalesce(text, ''),
               '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
             '</p>' || chr(10) ||
             '<a href="http://example.com">link</a></body></html>' AS html
           FROM documents),
         st AS (SELECT doc_id, source,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(
                 regexp_replace(html, '<[^>]+>', '', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', chr(39)), '&amp;', '&'),
               '[ \t\n\r]+', ' ', 'g')) AS clean
           FROM h),
         k AS (SELECT doc_id, source, clean, length(clean) AS n_clean
               FROM st WHERE length(clean) >= 200),
         p AS (SELECT doc_id, substr(clean, 1, 64) AS pre FROM k),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM p a JOIN p b ON a.doc_id < b.doc_id
                   WHERE (substr(a.pre, 1, 24) = substr(b.pre, 1, 24)
                       OR substr(a.pre, greatest(length(a.pre) - 23, 1)) =
                          substr(b.pre, greatest(length(b.pre) - 23, 1)))
                     AND levenshtein(a.pre, b.pre) <= 8)
         SELECT source, count(*) AS n_docs,
                CAST(sum(n_clean) AS BIGINT) AS total_chars
         FROM k WHERE doc_id NOT IN (SELECT id_b FROM pairs)
         GROUP BY source ORDER BY source"""),

    // Exact ordered-set aggregates: median, percentile_cont/_disc with
    // WITHIN GROUP — same text in Spark 4 and DuckDB. Exact percentiles
    // complement ap01/ap02's sketches: one sort-based aggregation per
    // group, round(,6) absorbing interpolation float noise (q14
    // discipline).
    "g09_percentiles" -> multi(Seq("lineitem"),
      """SELECT l_returnflag,
                round(median(l_extendedprice), 6) AS med_price,
                round(percentile_cont(0.25) WITHIN GROUP
                      (ORDER BY l_extendedprice), 6) AS p25_price,
                round(percentile_cont(0.75) WITHIN GROUP
                      (ORDER BY l_extendedprice), 6) AS p75_price,
                percentile_disc(0.5) WITHIN GROUP
                      (ORDER BY l_quantity) AS med_qty_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Distribution-rank windows: percent_rank / cume_dist / nth_value
    // over a named WINDOW — same text in both engines; unique order key
    // keeps ranks deterministic. One exchange on the partition key.
    "w07_dist_windows" -> multi(Seq("orders"),
      """SELECT o_orderkey,
                round(percent_rank() OVER w, 6) AS pr,
                round(cume_dist() OVER w, 6) AS cd,
                nth_value(o_orderkey, 2) OVER w AS nth2
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
         ORDER BY o_orderkey"""),

    // Higher-order array functions — transform / filter / exists /
    // aggregate / zip_with over the tokenized text, all inside
    // whole-stage codegen (no UDFs). DuckDB spells these list_transform
    // / list_filter / list_sum, so the oracle is a re-derivation, not
    // the same text. n_mirror pairs each token with its mirror
    // (zip_with + reverse) — an order-sensitive lambda the simpler
    // list ops can't fake.
    "q27_higher_order" -> api(
      (s, dir) => {
        val toks = split(coalesce(col("text"), lit("")), " ")
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            aggregate(transform(toks, t => length(t)), lit(0L),
              (a, x) => a + x).as("sum_len"),
            size(filter(toks, t => length(t) >= 6)).cast("long").as("n_long"),
            exists(toks, t => t === "the").as("has_the"),
            aggregate(
              zip_with(toks, reverse(toks),
                (x, y) => when(x === y, 1L).otherwise(0L)),
              lit(0L), (a, x) => a + x).as("n_mirror"))
          .orderBy(col("doc_id"))
      },
      """WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
                    FROM documents)
         SELECT doc_id,
                CAST(list_sum(list_transform(toks, t -> length(t)))
                     AS BIGINT) AS sum_len,
                len(list_filter(toks, t -> length(t) >= 6)) AS n_long,
                len(list_filter(toks, t -> t = 'the')) > 0 AS has_the,
                CAST(list_sum(list_transform(generate_series(1, len(toks)),
                     i -> CASE WHEN toks[i] = toks[len(toks) + 1 - i]
                          THEN 1 ELSE 0 END)) AS BIGINT) AS n_mirror
         FROM t ORDER BY doc_id""")

    ,

    // URL canonicalization — the web-corpus dedup key. The corpus has no
    // URL column, so the query plants four crawl-shaped variants
    // (case-mangled host, default ports, utm/fbclid tracking params,
    // fragments, trailing slashes) deterministically from (source,
    // doc_id), then normalizes with TextOps.normalizeUrl / urlHost /
    // registrableDomain. Every step is a RE2-safe regex, so the oracle
    // replays the identical patterns in DuckDB (with its explicit 'g'
    // flag). Map-only, codegen'd, no shuffle.
    "t12_url_normalize" -> api(
      (s, dir) => {
        val T = graft.ops.TextOps
        val id = col("doc_id")
        val url = when(id % 4 === 0,
            concat(lit("HTTP://WWW."), upper(col("source")),
              lit(".Example.COM:80/Docs/"), id,
              lit("/?utm_source=feed&utm_campaign=x")))
          .when(id % 4 === 1,
            concat(lit("https://"), col("source"), lit(".example.com/docs/"),
              id, lit("?id="), id, lit("&fbclid=abc#sec2")))
          .when(id % 4 === 2,
            concat(lit("https://cdn.Example.co.UK:443/assets/"), id, lit("/")))
          .otherwise(
            concat(lit("http://"), col("source"),
              lit(".example.net/p?a=1&utm_medium=m&b="), id))
        s.read.parquet(s"$dir/documents.parquet")
          .select(id, url.as("__u"))
          .select(id, T.normalizeUrl(col("__u")).as("url"),
            T.urlHost(col("__u")).as("host"),
            T.registrableDomain(col("__u")).as("domain"))
          .orderBy(id)
      },
      """WITH r AS (SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN 'HTTP://WWW.' || upper(source) ||
                    '.Example.COM:80/Docs/' || doc_id ||
                    '/?utm_source=feed&utm_campaign=x'
                  WHEN doc_id % 4 = 1 THEN 'https://' || source ||
                    '.example.com/docs/' || doc_id || '?id=' || doc_id ||
                    '&fbclid=abc#sec2'
                  WHEN doc_id % 4 = 2 THEN 'https://cdn.Example.co.UK:443/assets/'
                    || doc_id || '/'
                  ELSE 'http://' || source ||
                    '.example.net/p?a=1&utm_medium=m&b=' || doc_id
             END AS u
           FROM documents),
         n AS (SELECT doc_id,
             regexp_replace(lower(regexp_extract(u,
                 '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)),
               ':(80|443)$', '')
             ||
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(
                 regexp_extract(regexp_replace(u, '#.*$', ''),
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1),
                 '&(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*', '', 'g'),
               '\?(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*&?', '?', 'g'),
               '[?&]+$', '', 'g'), '/+\?', '?', 'g'), '/+$', '', 'g') AS url,
             lower(regexp_extract(u, '://([^/:?#]+)', 1)) AS host
           FROM r)
         SELECT doc_id, url, host,
                CASE WHEN len(string_split(host, '.')) <= 2 THEN host
                     WHEN string_split(host, '.')[-2] IN
                          ('co', 'com', 'net', 'org', 'ac', 'gov', 'edu')
                       THEN string_split(host, '.')[-3] || '.' ||
                            string_split(host, '.')[-2] || '.' ||
                            string_split(host, '.')[-1]
                     ELSE string_split(host, '.')[-2] || '.' ||
                          string_split(host, '.')[-1]
                END AS domain
         FROM n ORDER BY doc_id"""),

    // Exact n-gram CONTAINMENT pairs (Dedup.containmentPairs) — the
    // asymmetric signal Jaccard misses: every doc_id % 25 == 0 gets an
    // 8-token EXCERPT planted as a new document, whose containment in
    // its source is exactly 1.0 while its Jaccard is tiny. Candidates
    // ride the inverted gram index (equi-join on the gram, never
    // all-pairs); the oracle enumerates ALL gram-sharing pairs
    // exhaustively, so the green hash proves the inverted-index
    // formulation loses nothing at this corpus AND recovers every
    // planted excerpt.
    "d17_containment_pairs" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val T = graft.ops.TextOps
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val excerpts = docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            array_join(slice(T.tokens(col("text")), 1, 8), " ").as("text"))
        // hashGrams: the 100 TB setting (8-byte hashes through the
        // shuffle instead of gram strings) — measured ~15% faster even
        // at sf0.1 and pair-identical; the oracle still derives pairs
        // from raw grams, so a hash collision would fail the gate loudly
        graft.ops.Dedup.containmentPairs(docs.unionByName(excerpts),
            "doc_id", "text", shingleK = 5, threshold = 0.5,
            maxDocFreq = 1000L, hashGrams = true)
          .orderBy(col("id_a"), col("id_b"))
      },
      """WITH u AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000,
                  array_to_string(list_filter(string_split_regex(lower(text),
                    '\W+'), x -> x <> '')[1:8], ' ')
           FROM documents WHERE doc_id % 25 = 0),
         s AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\W+'),
                   x -> x <> '') AS toks FROM u),
         sh AS (SELECT doc_id,
                 CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
                      ELSE list_distinct(list_transform(
                        generate_series(1, len(toks)-4),
                        i -> array_to_string(toks[i:i+4], ' '))) END AS gs
                FROM s WHERE len(toks) > 0),
         g AS (SELECT doc_id, unnest(gs) AS g FROM sh),
         n AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      count(*) AS shared
               FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(CAST(shared AS DOUBLE) / na.n, 6) AS c_ab,
                round(CAST(shared AS DOUBLE) / nb.n, 6) AS c_ba
         FROM p JOIN n na ON na.doc_id = p.id_a
                JOIN n nb ON nb.doc_id = p.id_b
         WHERE greatest(round(CAST(shared AS DOUBLE) / na.n, 6),
                        round(CAST(shared AS DOUBLE) / nb.n, 6)) >= 0.5
         ORDER BY id_a, id_b"""),

    // FIXED-POINT PageRank over a synthetic doc link graph — iterative
    // weighted single-source shortest path: Bellman-Ford relaxation on
    // the Iterate combinator — after k rounds every reached node holds
    // the min cost over paths of <= k edges, which is exactly what the
    // oracle's hop-bounded recursive CTE enumerates. Integer weights
    // ((5·src + 3·dst) % 10 + 1) keep path sums exact in both engines.
    // Scale shape: each round is ONE keyed equi-join (edges ⋈ frontier)
    // + ONE min aggregation — state is a (node, dist) table, never a
    // path enumeration; the exponential path set exists only in the
    // tiny-N oracle.
    "gr06_shortest_path" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"))
        val n = docs.count()
        val edges = docs
          .select(col("doc_id").as("src"),
            explode(array((col("doc_id") * 7 + 1) % n,
              (col("doc_id") * 13 + 3) % n)).as("dst"))
          .withColumn("w", (col("src") * 5 + col("dst") * 3) % 10 + 1)
          .localCheckpoint(true)
        val dist0 = docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id"), lit(0L).as("dist"))
        val dist = graft.ops.Iterate.loop(dist0, 6) { (d, _) =>
          val relax = edges.join(d, col("src") === col("doc_id"))
            .select(col("dst").as("doc_id"),
              (col("dist") + col("w")).as("dist"))
          d.unionByName(relax)
            .groupBy(col("doc_id")).agg(min(col("dist")).as("dist"))
        }
        dist.orderBy(col("doc_id"))
      },
      """WITH RECURSIVE n AS (SELECT count(*) AS n FROM documents),
         v AS (SELECT doc_id FROM documents),
         e AS (SELECT doc_id AS src, (doc_id*7+1) % n.n AS dst FROM v, n
               UNION ALL
               SELECT doc_id, (doc_id*13+3) % n.n FROM v, n),
         ew AS (SELECT src, dst, (src*5 + dst*3) % 10 + 1 AS w FROM e),
         walk(id, d, hops) AS (
           SELECT doc_id, CAST(0 AS BIGINT), 0
           FROM documents WHERE doc_id % 100 = 0
           UNION
           SELECT ew.dst, wk.d + ew.w, wk.hops + 1
           FROM walk wk JOIN ew ON ew.src = wk.id
           WHERE wk.hops < 6)
         SELECT id AS doc_id, CAST(min(d) AS BIGINT) AS dist
         FROM walk GROUP BY id ORDER BY doc_id"""),

    // WITH RECURSIVE at the SQL SURFACE — the same statement text runs
    // on BOTH engines: Spark 4's native recursive CTE (SPARK-24497
    // lineage; UnionLoop under the hood, each iteration a distributed
    // join of the previous frontier against the edge CTE) and DuckDB's
    // recursive CTE. This closes the gr-family gap where recursion was
    // reachable only through the Iterate API while the oracles used
    // recursive SQL. Hop-bounded path enumeration (UNION ALL keeps
    // duplicate paths — `paths` counts them, which UNION-distinct
    // engines can't fake): work is seeds × out-degree^hops, bounded by
    // the WHERE hops guard, and Spark additionally enforces
    // spark.sql.cteRecursionLevelLimit (100) / RowLimit (1e6) as
    // runaway backstops. Note Spark supports UNION ALL recursion only
    // (UNION-distinct raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE);
    // same-text queries therefore bound recursion explicitly, exactly
    // like this one.
    "gr07_recursive_sql" -> multiSession(Seq("documents"),
      """WITH RECURSIVE n AS (SELECT count(*) AS cnt FROM documents),
         e AS (SELECT CAST(doc_id AS BIGINT) AS src,
                      CAST((doc_id * 7 + 1) % n.cnt AS BIGINT) AS dst
               FROM documents, n
               UNION ALL
               SELECT CAST(doc_id AS BIGINT),
                      CAST((doc_id * 13 + 3) % n.cnt AS BIGINT)
               FROM documents, n),
         reach(id, hops) AS (
           SELECT CAST(doc_id AS BIGINT), CAST(0 AS BIGINT)
           FROM documents WHERE doc_id % 100 = 0
           UNION ALL
           SELECT e.dst, r.hops + 1
           FROM reach AS r JOIN e ON e.src = r.id
           WHERE r.hops < 3)
         SELECT id, CAST(min(hops) AS BIGINT) AS dist,
                CAST(count(*) AS BIGINT) AS paths
         FROM reach GROUP BY id ORDER BY id"""),

    // UNION-DISTINCT recursion at the SQL surface (gr09) — the form
    // Spark's native UnionLoop rejects and this dialect lowers onto
    // frontier-minus-seen rounds (RecursiveUnion + Table.
    // runRecursiveUnion). Same text on both engines; the fixture graph
    // is the gr01/gr07 functional graph ((7k+1)%N, (13k+3)%N), which is
    // CYCLIC by construction (every functional graph on a finite set
    // ends in cycles) and carries NO hop bound here — UNION ALL
    // recursion would never terminate; the EXCEPT-seen guard drains at
    // the reachability closure. That termination-on-cycles is exactly
    // what the distinct form buys.
    "gr09_recursive_distinct" -> multiSession(Seq("documents"),
      """WITH RECURSIVE reach(id) AS (
           SELECT CAST(doc_id AS BIGINT) FROM documents WHERE doc_id % 97 = 0
           UNION
           SELECT e.dst FROM reach r JOIN (
             SELECT CAST(doc_id AS BIGINT) AS src,
                    CAST((doc_id * 7 + 1) %
                         (SELECT count(*) FROM documents) AS BIGINT) AS dst
             FROM documents
             UNION ALL
             SELECT CAST(doc_id AS BIGINT),
                    CAST((doc_id * 13 + 3) %
                         (SELECT count(*) FROM documents) AS BIGINT)
             FROM documents) e ON e.src = r.id)
         SELECT count(*) AS n_reached, CAST(sum(id) AS BIGINT) AS id_sum,
                min(id) AS mn, max(id) AS mx
         FROM reach"""),

    // Multi-CTE WITH RECURSIVE (gr10): non-recursive HELPER CTEs ride
    // alongside the one UNION-distinct recursive CTE — the common
    // real-world shape (an edge table + a seed set next to the
    // traversal). Helpers bind once in textual order before the
    // recursion; same text on both engines (DuckDB executes the list
    // natively). The graph is the gr09 cyclic functional graph; the
    // EXCEPT-seen guard drains at the closure.
    "gr10_recursive_helpers" -> multiSession(Seq("documents"),
      """WITH RECURSIVE
         e(src, dst) AS (
           SELECT CAST(doc_id AS BIGINT),
                  CAST((doc_id * 7 + 1) %
                       (SELECT count(*) FROM documents) AS BIGINT)
           FROM documents
           UNION ALL
           SELECT CAST(doc_id AS BIGINT),
                  CAST((doc_id * 13 + 3) %
                       (SELECT count(*) FROM documents) AS BIGINT)
           FROM documents),
         seeds(id) AS (
           SELECT CAST(doc_id AS BIGINT) FROM documents
           WHERE doc_id % 101 = 0),
         reach(id) AS (
           SELECT id FROM seeds
           UNION
           SELECT e.dst FROM reach r JOIN e ON e.src = r.id)
         SELECT count(*) AS n_reached, CAST(sum(id) AS BIGINT) AS id_sum,
                min(id) AS mn, max(id) AS mx
         FROM reach"""),

    // Several independent recursions in ONE WITH RECURSIVE (gr11):
    // they drain SEQUENTIALLY in textual order, each closure binding
    // before the next starts — here the second traversal SEEDS from the
    // first's drained closure, the helper edge tables feed both, and
    // the outer statement joins both closures. BOTH recursions are
    // DEPTH-CAPPED (d < 16 / d < 24): a functional graph's orbits have
    // diameter ∝ N, so an uncapped drain needs rounds ∝ corpus size —
    // measured 65 s at sf0.1 (≈400 rounds: max seed gap along the orbit
    // is (N/k)·ln k) before the cap; hop-bounded traversal is the
    // recursion shape that survives a 100× corpus (rounds fixed by the
    // cap, per-round work ∝ frontier). Same text on both engines
    // (DuckDB executes multiple recursive CTEs natively, probed).
    // TRUE mutual recursion is gr12 below; acyclic references (either
    // text direction) drain dependencies-first via the SCC plan.
    "gr11_multi_recursion" -> multiSession(Seq("documents"),
      """WITH RECURSIVE
         e7(src, dst) AS (
           SELECT CAST(doc_id AS BIGINT),
                  CAST((doc_id * 7 + 1) %
                       (SELECT count(*) FROM documents) AS BIGINT)
           FROM documents),
         e13(src, dst) AS (
           SELECT CAST(doc_id AS BIGINT),
                  CAST((doc_id * 13 + 3) %
                       (SELECT count(*) FROM documents) AS BIGINT)
           FROM documents),
         reach7(id, d) AS (
           SELECT CAST(doc_id AS BIGINT), 0 FROM documents
           WHERE doc_id % 103 = 0
           UNION
           SELECT e7.dst, r.d + 1 FROM reach7 r
           JOIN e7 ON e7.src = r.id WHERE r.d < 16),
         walk13(id, d) AS (
           SELECT max(id), 0 FROM reach7
           UNION
           SELECT e13.dst, r.d + 1 FROM walk13 r
           JOIN e13 ON e13.src = r.id WHERE r.d < 24)
         SELECT (SELECT count(DISTINCT id) FROM reach7) AS n7,
                (SELECT CAST(sum(id) AS BIGINT)
                 FROM (SELECT DISTINCT id FROM reach7) v) AS s7,
                (SELECT count(DISTINCT id) FROM walk13) AS n13,
                (SELECT CAST(sum(id) AS BIGINT)
                 FROM (SELECT DISTINCT id FROM walk13) u) AS s13,
                count(*) AS n_both
         FROM (SELECT DISTINCT id FROM reach7) r7
         JOIN (SELECT DISTINCT id FROM walk13) r13 ON r7.id = r13.id"""),

    // TRUE mutual recursion (gr12, [[graft.sql.RecursiveUnion]] SCC
    // grouping + [[graft.api.Table]] drainMutualGroup): pp steps
    // through the 7-edge relation FROM qq and qq steps through the
    // 13-edge relation FROM pp — a cyclic reference pair, so the two
    // drain as ONE simultaneous loop (each round: every member's step
    // against the round-start state — own frontier for self, sibling
    // closures for cross-references; stop when a round adds nothing
    // anywhere). DuckDB executes the same text natively (semantics
    // probed: even/odd chain, empty-seed member, drained-frontier
    // sibling feeding through its closure). Both alternation depths
    // are CAPPED (d < 12) — the gr11 lesson: rounds fixed by the cap,
    // per-round work ∝ frontier × sibling closure, the only recursion
    // shape that survives a 100× corpus.
    "gr12_mutual_recursion" -> multiSession(Seq("documents"),
      """WITH RECURSIVE
         e7(src, dst) AS (
           SELECT CAST(doc_id AS BIGINT),
                  CAST((doc_id * 7 + 1) %
                       (SELECT count(*) FROM documents) AS BIGINT)
           FROM documents),
         e13(src, dst) AS (
           SELECT CAST(doc_id AS BIGINT),
                  CAST((doc_id * 13 + 3) %
                       (SELECT count(*) FROM documents) AS BIGINT)
           FROM documents),
         pp(id, d) AS (
           SELECT CAST(doc_id AS BIGINT), 0 FROM documents
           WHERE doc_id % 103 = 0
           UNION
           SELECT e7.dst, q.d + 1 FROM qq q
           JOIN e7 ON e7.src = q.id WHERE q.d < 12),
         qq(id, d) AS (
           SELECT CAST(doc_id AS BIGINT), 1 FROM documents
           WHERE doc_id % 97 = 0
           UNION
           SELECT e13.dst, p.d + 1 FROM pp p
           JOIN e13 ON e13.src = p.id WHERE p.d < 12)
         SELECT (SELECT count(*) FROM pp) AS np,
                (SELECT CAST(sum(id) AS BIGINT)
                 FROM (SELECT DISTINCT id FROM pp) v) AS sp,
                (SELECT count(*) FROM qq) AS nq,
                (SELECT CAST(sum(id) AS BIGINT)
                 FROM (SELECT DISTINCT id FROM qq) u) AS sq,
                count(*) AS n_both
         FROM (SELECT DISTINCT id FROM pp) a
         JOIN (SELECT DISTINCT id FROM qq) b ON a.id = b.id"""),

    // graph analytics in the d08 loop discipline (per-iteration keyed
    // join + aggregation, nothing driver-side but the tiny N). Ranks
    // live in integer 1e12-scale fixed point with the damping step as
    // integer division ((85·inc) div 100), so THREE unrolled iterations
    // are bit-reproducible by the oracle's CTE chain — the float-free
    // way to strict-gate an iterative algorithm. Every node has
    // out-degree 2 ((7k+1)%N, (13k+3)%N); mass sent to a non-existent
    // id (sparse doc_id spaces) drops identically in both engines.
    "gr01_pagerank" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"))
        val n = docs.count() // control-plane scalar: sizes the literals
        val S = 1000000000000L
        val base = (15L * S) / (100L * n)
        val edges = docs
          .select(col("doc_id").as("src"),
            explode(array((col("doc_id") * 7 + 1) % n,
              (col("doc_id") * 13 + 3) % n)).as("dst"))
          .localCheckpoint(true)
        val r0 = docs.withColumn("r", lit(S / n))
        val r = graft.ops.Iterate.loop(r0, 3) { (r, _) =>
          val contrib = edges.join(r, col("src") === col("doc_id"))
            .groupBy(col("dst"))
            .agg(sum(expr("r div 2")).as("inc"))
          docs.join(contrib, col("doc_id") === col("dst"), "left")
            .select(col("doc_id"),
              (lit(base) + expr("(85 * coalesce(inc, 0L)) div 100")).as("r"))
        }
        r.orderBy(col("doc_id"))
      },
      """WITH n AS (SELECT count(*) AS n FROM documents),
         v AS (SELECT doc_id FROM documents),
         e AS (SELECT doc_id AS src, (doc_id*7+1) % n.n AS dst FROM v, n
               UNION ALL
               SELECT doc_id, (doc_id*13+3) % n.n FROM v, n),
         r0 AS (SELECT doc_id, 1000000000000 // n.n AS r FROM v, n),
         c1 AS (SELECT e.dst, sum(r0.r // 2) AS inc
                FROM e JOIN r0 ON r0.doc_id = e.src GROUP BY e.dst),
         r1 AS (SELECT v.doc_id,
                  (15000000000000 // (100 * n.n))
                    + (85 * coalesce(c1.inc, 0)) // 100 AS r
                FROM v CROSS JOIN n LEFT JOIN c1 ON c1.dst = v.doc_id),
         c2 AS (SELECT e.dst, sum(r1.r // 2) AS inc
                FROM e JOIN r1 ON r1.doc_id = e.src GROUP BY e.dst),
         r2 AS (SELECT v.doc_id,
                  (15000000000000 // (100 * n.n))
                    + (85 * coalesce(c2.inc, 0)) // 100 AS r
                FROM v CROSS JOIN n LEFT JOIN c2 ON c2.dst = v.doc_id),
         c3 AS (SELECT e.dst, sum(r2.r // 2) AS inc
                FROM e JOIN r2 ON r2.doc_id = e.src GROUP BY e.dst),
         r3 AS (SELECT v.doc_id,
                  (15000000000000 // (100 * n.n))
                    + (85 * coalesce(c3.inc, 0)) // 100 AS r
                FROM v CROSS JOIN n LEFT JOIN c3 ON c3.dst = v.doc_id)
         SELECT doc_id, CAST(r AS BIGINT) AS r FROM r3 ORDER BY doc_id"""),

    // Bounded BFS hop distances from a seed set (every doc_id % 100 ==
    // 0) over the same synthetic link graph as gr01 — min-hop
    // propagation, 4 Bellman-Ford-style rounds (after round k every
    // node within k hops has its exact distance). All-integer, so the
    // recursive-CTE oracle reproduces it bit-for-bit; nodes beyond 4
    // hops are absent from both sides by construction.
    "gr02_bfs_hops" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"))
        val n = docs.count()
        val edges = docs
          .select(col("doc_id").as("src"),
            explode(array((col("doc_id") * 7 + 1) % n,
              (col("doc_id") * 13 + 3) % n)).as("dst"))
          .localCheckpoint(true)
        val dist0 = docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id"), lit(0L).as("dist"))
        val dist = graft.ops.Iterate.loop(dist0, 4) { (dist, _) =>
          val prop = edges.join(dist, col("src") === col("doc_id"))
            .select(col("dst").as("doc_id"), (col("dist") + 1).as("dist"))
          dist.unionByName(prop)
            .groupBy(col("doc_id")).agg(min(col("dist")).as("dist"))
        }
        dist.filter(col("dist") <= 4).orderBy(col("doc_id"))
      },
      """WITH RECURSIVE n AS (SELECT count(*) AS n FROM documents),
         v AS (SELECT doc_id FROM documents),
         e AS (SELECT doc_id AS src, (doc_id*7+1) % n.n AS dst FROM v, n
               UNION ALL
               SELECT doc_id, (doc_id*13+3) % n.n FROM v, n),
         reach(id, d) AS (
           SELECT doc_id, 0 FROM documents WHERE doc_id % 100 = 0
           UNION
           SELECT e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id
           WHERE r.d < 4)
         SELECT id AS doc_id, CAST(min(d) AS BIGINT) AS dist
         FROM reach GROUP BY id ORDER BY doc_id"""),

    // Dedup IMPACT report — the before/after accounting a curation run
    // publishes: per source, how many documents and characters exact
    // dedup removes and the fractional savings. Survivors come from the
    // d01 machinery (min doc_id per content digest); one digest shuffle
    // + one source rollup.
    // Distributed triangle counting (vertex-ordered enumeration) over a
    // densified synthetic graph: doc links land in a 97-hub space, so
    // hub-hub closures exist. Canonical undirected edges (a < b,
    // DISTINCT) make each triangle enumerable exactly once as a < b < c:
    // the wedge join (e1.b = e2.a) builds open paths, a semi-join
    // against the edge set keeps the closed ones. This is the standard
    // scale recipe — work is bounded by sum(deg^2) wedges, shuffles key
    // on vertex ids, and the hot joins never materialize anything wider
    // than (a,b,c). Per-node participation counts come from exploding
    // the three corners of each closed triangle.
    "gr03_triangles" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"))
        val de = docs.select(col("doc_id").as("s"),
          explode(array((col("doc_id") * 7 + 1) % 97,
            (col("doc_id") * 13 + 3) % 97,
            (col("doc_id") * 29 + 7) % 97)).as("d"))
          .filter(col("s") =!= col("d"))
        val e = de.select(least(col("s"), col("d")).as("a"),
            greatest(col("s"), col("d")).as("b"))
          .distinct().localCheckpoint(true)
        val wedge = e.as("e1")
          .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
          .select(col("a"), col("b"), col("c"))
        val tri = wedge.join(
          e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
        tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
          .orderBy(col("doc_id"))
      },
      """WITH v AS (SELECT doc_id FROM documents),
         de AS (SELECT doc_id AS s, (doc_id*7+1) % 97 AS d FROM v
                UNION ALL SELECT doc_id, (doc_id*13+3) % 97 FROM v
                UNION ALL SELECT doc_id, (doc_id*29+7) % 97 FROM v),
         e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
               FROM de WHERE s <> d),
         wedge AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                   FROM e e1 JOIN e e2 ON e2.a = e1.b),
         tri AS (SELECT w.a, w.b, w.c FROM wedge w
                 WHERE EXISTS (SELECT 1 FROM e
                               WHERE e.a = w.a AND e.b = w.c)),
         corners AS (SELECT a AS doc_id FROM tri
                     UNION ALL SELECT b FROM tri
                     UNION ALL SELECT c FROM tri)
         SELECT doc_id, count(*) AS n_tri FROM corners
         GROUP BY doc_id ORDER BY doc_id"""),

    // Community detection by SYNCHRONOUS label propagation (3 rounds,
    // deterministic): every node adopts the most frequent label among
    // its neighbors, ties to the smallest label — the randomized-LPA
    // variant made reproducible by fixed round count + total tiebreak
    // order, so the oracle can replay the exact same 3 rounds as three
    // mechanical CTE blocks. Per round: one edges⋈labels shuffle and a
    // (node, label)-keyed vote count with an argmax via max(struct) —
    // no window over the event volume, hot hub nodes cost a partial-
    // aggregated groupBy. Isolated nodes keep their own label.
    "gr04_label_propagation" -> api(
      (s, dir) => {
        val v = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").as("id"))
        val de = v.select(col("id").as("s"),
            explode(array((col("id") * 7 + 1) % 97,
              (col("id") * 13 + 3) % 97,
              (col("id") * 29 + 7) % 97)).as("d"))
          .filter(col("s") =!= col("d"))
        val e = de.select(col("s"), col("d"))
          .union(de.select(col("d").as("s"), col("s").as("d")))
          .distinct().localCheckpoint(true)
        val lab0 = v.select(col("id"), col("id").as("lab"))
        val lab = graft.ops.Iterate.loop(lab0, 3) { (lab, _) =>
          val votes = e.join(lab.withColumnRenamed("id", "__n"),
              col("d") === col("__n"))
            .groupBy(col("s"), col("lab")).agg(count(lit(1)).as("c"))
          val best = votes
            .groupBy(col("s"))
            .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
            .select(col("s").as("id"), (-col("m.nl")).as("blab"))
          lab.join(best, Seq("id"), "left")
            .select(col("id"), coalesce(col("blab"), col("lab")).as("lab"))
        }
        lab.orderBy(col("id"))
          .select(col("id").as("doc_id"), col("lab").as("community"))
      },
      """WITH v AS (SELECT doc_id AS id FROM documents),
         de AS (SELECT id AS s, (id*7+1) % 97 AS d FROM v
                UNION ALL SELECT id, (id*13+3) % 97 FROM v
                UNION ALL SELECT id, (id*29+7) % 97 FROM v),
         e AS (SELECT DISTINCT s, d FROM (
                 SELECT s, d FROM de WHERE s <> d
                 UNION ALL SELECT d, s FROM de WHERE s <> d)),
         l0 AS (SELECT id, id AS lab FROM v),
         v1 AS (SELECT e.s AS id, l.lab, count(*) AS c
                FROM e JOIN l0 l ON l.id = e.d GROUP BY 1, 2),
         b1 AS (SELECT id, lab FROM (SELECT id, lab,
                  row_number() OVER (PARTITION BY id
                    ORDER BY c DESC, lab) AS rn FROM v1) WHERE rn = 1),
         l1 AS (SELECT l.id, coalesce(b.lab, l.lab) AS lab
                FROM l0 l LEFT JOIN b1 b ON b.id = l.id),
         v2 AS (SELECT e.s AS id, l.lab, count(*) AS c
                FROM e JOIN l1 l ON l.id = e.d GROUP BY 1, 2),
         b2 AS (SELECT id, lab FROM (SELECT id, lab,
                  row_number() OVER (PARTITION BY id
                    ORDER BY c DESC, lab) AS rn FROM v2) WHERE rn = 1),
         l2 AS (SELECT l.id, coalesce(b.lab, l.lab) AS lab
                FROM l1 l LEFT JOIN b2 b ON b.id = l.id),
         v3 AS (SELECT e.s AS id, l.lab, count(*) AS c
                FROM e JOIN l2 l ON l.id = e.d GROUP BY 1, 2),
         b3 AS (SELECT id, lab FROM (SELECT id, lab,
                  row_number() OVER (PARTITION BY id
                    ORDER BY c DESC, lab) AS rn FROM v3) WHERE rn = 1),
         l3 AS (SELECT l.id, coalesce(b.lab, l.lab) AS lab
                FROM l2 l LEFT JOIN b3 b ON b.id = l.id)
         SELECT id AS doc_id, lab AS community FROM l3 ORDER BY doc_id"""),

    "d18_dedup_impact" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val keep = graft.ops.Dedup.exactGroups(docs, "text", "doc_id")
          .select(col("keep_id").as("doc_id"), lit(1L).as("__keep"))
        docs.join(keep, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("__keep"), lit(0L))).as("n_kept"),
            sum(col("n_chars")).cast("long").as("chars_before"),
            sum(when(col("__keep").isNotNull, col("n_chars"))
              .otherwise(0L)).cast("long").as("chars_after"))
          .withColumn("savings",
            round(lit(1.0) - col("chars_after").cast("double")
              / col("chars_before"), 6))
          .orderBy(col("source"))
      },
      """WITH k AS (SELECT min(doc_id) AS keep_id
                    FROM documents GROUP BY md5(text))
         SELECT source, count(*) AS n_docs,
                CAST(sum(CASE WHEN doc_id IN (SELECT keep_id FROM k)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                CAST(sum(n_chars) AS BIGINT) AS chars_before,
                CAST(sum(CASE WHEN doc_id IN (SELECT keep_id FROM k)
                     THEN n_chars ELSE 0 END) AS BIGINT) AS chars_after,
                round(1 - CAST(sum(CASE WHEN doc_id IN
                        (SELECT keep_id FROM k)
                      THEN n_chars ELSE 0 END) AS DOUBLE) / sum(n_chars), 6)
                  AS savings
         FROM documents GROUP BY source ORDER BY source"""),

    // Crawl-URL deduplication: canonicalize-then-group — the t12
    // normalizer composed into the d01 exact-dedup shape, which is how a
    // crawl frontier dedups fetched pages. Every doc gets a crawl-noise
    // variant (scheme/host case, default port, utm debris, fragment) of
    // its page URL (page = doc_id % 50), and the group-by on the
    // CANONICAL form must collapse exactly the variant grid: 50 pages,
    // min doc_id kept, all variants counted. One map-only normalize +
    // one hash shuffle on the canonical key.
    "d16_url_dedup" -> api(
      (s, dir) => {
        val T = graft.ops.TextOps
        val id = col("doc_id")
        val scheme = when(id % 2 === 0, lit("HTTP://")).otherwise(lit("http://"))
        val host = when(id % 3 === 0, lit("WWW.Example.COM:80"))
          .when(id % 3 === 1, lit("www.example.com"))
          .otherwise(lit("www.EXAMPLE.com:80"))
        val tail = when(id % 2 === 1,
          lit("?utm_source=crawl&utm_campaign=x")).otherwise(lit(""))
        val frag = when(id % 5 === 2, lit("#frag")).otherwise(lit(""))
        val u = concat(scheme, host, lit("/page/"), id % 50, tail, frag)
        s.read.parquet(s"$dir/documents.parquet")
          .select(id, T.normalizeUrl(u).as("url"))
          .groupBy(col("url"))
          .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))
          .orderBy(col("url"))
      },
      """WITH r AS (SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'http://' END)
             || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM:80'
                      WHEN doc_id % 3 = 1 THEN 'www.example.com'
                      ELSE 'www.EXAMPLE.com:80' END)
             || '/page/' || (doc_id % 50)
             || (CASE WHEN doc_id % 2 = 1
                      THEN '?utm_source=crawl&utm_campaign=x' ELSE '' END)
             || (CASE WHEN doc_id % 5 = 2 THEN '#frag' ELSE '' END) AS u
           FROM documents),
         n AS (SELECT doc_id,
             regexp_replace(lower(regexp_extract(u,
                 '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)),
               ':(80|443)$', '')
             ||
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(
                 regexp_extract(regexp_replace(u, '#.*$', ''),
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1),
                 '&(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*', '', 'g'),
               '\?(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*&?', '?', 'g'),
               '[?&]+$', '', 'g'), '/+\?', '?', 'g'), '/+$', '', 'g') AS url
           FROM r)
         SELECT url, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM n GROUP BY url ORDER BY url"""),

    // Distribution drift (PSI) between the even/odd event_id cohorts per
    // event type — the train/serve-skew monitor. The two cohorts draw
    // from the same generator so PSI lands near zero, which is exactly
    // what the strict oracle should prove: both engines derive identical
    // histograms, proportions and Σ(p_ref−p_cur)·ln(p_ref/p_cur).
    "pr04_drift_psi" -> api(
      (s, dir) => {
        val ev = graft.streaming.Events.readRaw(s, dir)
          .withColumn("__ref", col("event_id") % 2 === 0)
        graft.ops.Profile.psi(ev, "event_type", "value", "__ref",
            bins = 10, lo = 0.0, hi = 500.0)
          .orderBy(col("event_type"))
      },
      """WITH h AS (
           SELECT event_type,
                  least(greatest(CAST(floor((value - 0.0) / 50.0) AS BIGINT),
                    0), 9) AS b,
                  sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
                  sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS nb
           FROM events GROUP BY 1, 2),
         t AS (SELECT event_type, na, nb,
                  sum(na) OVER (PARTITION BY event_type) AS ta,
                  sum(nb) OVER (PARTITION BY event_type) AS tb
               FROM h),
         p AS (SELECT event_type, na, nb,
                  greatest(na / ta, 1e-6) AS pa,
                  greatest(nb / tb, 1e-6) AS pb
               FROM t)
         SELECT event_type,
                CAST(sum(na) AS BIGINT) AS n_ref,
                CAST(sum(nb) AS BIGINT) AS n_cur,
                round(sum((pa - pb) * ln(pa / pb)), 6) AS psi
         FROM p GROUP BY event_type ORDER BY event_type"""),

    // Length-bucketed inference batching: pad every doc to the next
    // 64-token multiple, cut each (source, bucket) into batches of ≤2048
    // padded tokens. One window per (shard, bucket) — the packSequences
    // scale discipline — then pure arithmetic; the oracle replays the
    // same row_number cut in DuckDB.
    "p10_length_batches" -> api(
      (s, dir) => {
        graft.ops.Packing.lengthBatches(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "source",
            graft.ops.TextAnalysis.tokenCount(coalesce(col("text"), lit(""))),
            widthTokens = 64, maxBatchTokens = 2048)
          .orderBy(col("source"), col("doc_id"))
      },
      """WITH d AS (SELECT source, doc_id,
                  CAST(len(regexp_extract_all(coalesce(text, ''), '\w+'))
                       AS BIGINT) AS n_tokens
           FROM documents),
         b AS (SELECT source, doc_id, n_tokens,
                  greatest((n_tokens + 63) // 64, 1) * 64 AS bucket_len
               FROM d),
         r AS (SELECT source, doc_id, n_tokens, bucket_len,
                  row_number() OVER (PARTITION BY source, bucket_len
                                     ORDER BY doc_id) AS rn
               FROM b)
         SELECT source, doc_id, n_tokens, bucket_len,
                CAST((rn - 1) // greatest(2048 // bucket_len, 1) AS BIGINT)
                  AS batch_id
         FROM r ORDER BY source, doc_id""")

    ,

    // SemDeDup semantic dedup: nearest-centroid clustering confines the
    // quadratic cosine check to single cells; within a cell the min-id
    // representative of every >= 0.9 group survives. Centroids are the
    // first 8 base embeddings (deterministic, oracle-rederivable);
    // near-dups are the d08 rotation planting (cosine 0.94 to the base
    // vector) since the corpus has no natural pairs above 0.66. The
    // oracle re-derives centroids, argmin assignment (dist tie -> lower
    // cell), intra-cell pruning — a green hash proves clustering AND
    // pruning agree row-for-row. Cross-cell near-dups are deliberately
    // NOT pruned (the SemDeDup contract: recall is traded for the
    // never-corpus² candidate volume).
    "d13_semantic_dedup" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val base = s.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val r1 = base.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            rotVec(col("v"), 0.94).as("v"))
        val u = base.unionByName(r1)
        val cents = base.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cell"), col("v").as("cv"))
        graft.ops.Dedup.semanticDedup(u, "vec_id", "v", cents, "cell", "cv",
            threshold = 0.9)
          .orderBy(col("id"))
      },
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         r1 AS (SELECT vec_id + 1000000 AS vec_id, ${rotSql("v")} AS v
                FROM e WHERE vec_id % 10 = 0),
         u AS (SELECT * FROM e UNION ALL SELECT * FROM r1),
         c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
         d AS (SELECT u.vec_id, c.cell,
                 list_sum(list_transform(generate_series(1, len(u.v)),
                   i -> (u.v[i] - c.cv[i]) * (u.v[i] - c.cv[i]))) AS d2
               FROM u CROSS JOIN c),
         a AS (SELECT vec_id, cell FROM
                (SELECT vec_id, cell,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY d2, cell) AS rn
                 FROM d) WHERE rn = 1),
         j AS (SELECT u.vec_id, a.cell, u.v FROM u JOIN a USING (vec_id)),
         pruned AS (SELECT DISTINCT bb.vec_id
                    FROM j aa JOIN j bb
                      ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
                    WHERE list_cosine_similarity(aa.v, bb.v) >= 0.9)
         SELECT j.vec_id AS id, j.cell FROM j
         WHERE j.vec_id NOT IN (SELECT vec_id FROM pruned)
         ORDER BY id""")

    ,

    // String-function breadth through the Table.sql dialect. Texts differ
    // only where the engines name the same function differently
    // (instr ↔ strpos); everything else is same-text, values byte-equal.
    "q28_string_fns" -> diff("part",
      """SELECT p_partkey,
                lpad(p_brand, 12, '*') AS pb,
                rpad(left(p_type, 10), 12, '.') AS pt,
                right(p_name, 6) AS r6,
                reverse(p_brand) AS rev,
                translate(p_name, 'ae', 'AE') AS tr,
                split_part(p_type, ' ', 2) AS sp2,
                repeat('-', p_size % 5) AS rp,
                CAST(ascii(p_name) AS BIGINT) AS ac,
                chr(65 + p_size % 26) AS ch,
                CAST(instr(p_name, 'al') AS BIGINT) AS pos
         FROM part ORDER BY p_partkey""",
      """SELECT p_partkey,
                lpad(p_brand, 12, '*') AS pb,
                rpad(left(p_type, 10), 12, '.') AS pt,
                right(p_name, 6) AS r6,
                reverse(p_brand) AS rev,
                translate(p_name, 'ae', 'AE') AS tr,
                split_part(p_type, ' ', 2) AS sp2,
                repeat('-', p_size % 5) AS rp,
                CAST(ascii(p_name) AS BIGINT) AS ac,
                chr(65 + p_size % 26) AS ch,
                CAST(strpos(p_name, 'al') AS BIGINT) AS pos
         FROM part ORDER BY p_partkey"""),

    // Calendar-function breadth. Divergences the oracle compensates for:
    // Spark date_trunc returns TIMESTAMP (cast to DATE both sides),
    // datediff is (end, start) vs DuckDB's ('day', start, end), DuckDB
    // dayofweek is 0-based Sunday vs Spark's 1-based, and date_add
    // spells as date + int in DuckDB.
    "q29_date_fns" -> diff("orders",
      """SELECT o_orderkey,
                CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS mon,
                last_day(CAST(o_orderdate AS DATE)) AS eom,
                CAST(date_part('quarter', CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
                CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT) AS dd,
                date_add(CAST(o_orderdate AS DATE), 30) AS plus30,
                CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
                CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS woy
         FROM orders ORDER BY o_orderkey""",
      """SELECT o_orderkey,
                CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS mon,
                last_day(CAST(o_orderdate AS DATE)) AS eom,
                CAST(date_part('quarter', CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
                CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS dd,
                CAST(o_orderdate AS DATE) + 30 AS plus30,
                CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
                CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS woy
         FROM orders ORDER BY o_orderkey""")

    ,

    // Sliding-window streaming rollup (2 h / 30 min): every event expands
    // into exactly 4 epoch-aligned overlapping windows before the state
    // shuffle. Complete-mode replay for the same finite-stream reason as
    // st03; the oracle re-derives the expansion arithmetically in BIGINT
    // microseconds (base slide-floor minus 0..3 slides).
    "st10_stream_sliding" -> api(
      (outer, dir) => {
        val s = outer.newSession()   // state partitions sized to key count
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val out = graft.streaming.Events.streamingSlidingTypeCounts(
          graft.streaming.Events.readStream(s, dir))
        val sink = "st10_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table(sink)
          .select(unix_micros(col("ws")).as("ws"), col("event_type"), col("n"))
          .orderBy(col("ws"), col("event_type"))
      },
      """WITH b AS (SELECT event_type,
                  epoch_us(ts) // 1800000000 * 1800000000 AS base
           FROM events),
         w AS (SELECT event_type, base - CAST(i AS BIGINT) * 1800000000 AS ws
               FROM b CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) g)
         SELECT ws, event_type, count(*) AS n
         FROM w GROUP BY ws, event_type ORDER BY ws, event_type""")

    ,

    // Z-ordered parquet layout: Morton-interleave (l_partkey, l_suppkey)
    // bucket ids, range-partition + sort by the z-value, write, read
    // back through a RECTANGLE predicate on both dimensions — the
    // multi-dim zone-map story io05's single-key sort can't serve. The
    // z-value orders the layout only, so the oracle is the plain
    // aggregate over the original table; PlanSpec pins both predicates
    // pushed to the read-back scan. Fixed bucket ranges cover sf1
    // (partkey < 2^18, suppkey < 2^14), keeping the layout
    // deterministic across SFs.
    // write–audit–publish (Wap.writeAuditPublish, io17): stage →
    // audit the STAGED BYTES (count + exact content sum vs source) →
    // atomic rename into place; a failing audit must leave the
    // destination absent and keep staging for inspection — both proven
    // in-query (the published read-back plus two gate booleans), with
    // the oracle pinning the source-side truth.
    "io17_write_audit_publish" -> api(
      (s, dir) => {
        val src = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("n_chars"))
        val want = src.agg(count(lit(1)), sum(col("n_chars"))).head
        val out = scratchDir(s"io17_${new java.io.File(dir).getName}")
        graft.ops.Wap.writeAuditPublish(src, out) { staged =>
          val got = staged.agg(count(lit(1)), sum(col("n_chars"))).head
          require(got == want, s"audit mismatch: $got vs $want")
        }
        // a FAILING audit must block the publish entirely
        val out2 = scratchDir(s"io17_fail_${new java.io.File(dir).getName}")
        val blocked =
          try {
            graft.ops.Wap.writeAuditPublish(src.limit(10), out2)(st =>
              require(st.count() == -1, "forced audit failure"))
            false
          } catch { case _: IllegalStateException => true }
        val fs = new org.apache.hadoop.fs.Path(out2).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        s.read.parquet(out).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          max(lit(blocked)).as("failed_audit_blocked"),
          max(lit(!fs.exists(new org.apache.hadoop.fs.Path(out2))))
            .as("unpublished_absent"))
      },
      """SELECT count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS chars,
                true AS failed_audit_blocked,
                true AS unpublished_absent
         FROM documents"""),

    // COPY … TO export at the SQL surface (io21, [[graft.sql.CopySql]]):
    // DuckDB's export statement — the source subquery re-enters the full
    // pipeline, each task writes its partition (the only export shape
    // that fans out at 100 TB), and the statement RETURNS the dataset
    // READ BACK from the written files, so the gated rollup proves the
    // round-trip preserved every value and type (timestamps included),
    // not merely that a write happened. The oracle is the same rollup
    // straight off the source table.
    "io21_copy_roundtrip" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_orderkey") % 11 === 0)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"),
            col("l_shipdate"))
          .createOrReplaceTempView("io21_src")
        val out = scratchDir(s"io21_${new java.io.File(dir).getName}")
        graft.api.Table.sessionSql(s,
          s"""COPY (SELECT * FROM io21_src WHERE l_linenumber <= 4)
              TO '$out' (FORMAT PARQUET)""").df
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"),
            min(col("l_shipdate")).as("mn"), max(col("l_shipdate")).as("mx"))
          .orderBy(col("l_returnflag"))
      },
      """WITH src AS (SELECT l_returnflag,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                l_shipdate
           FROM lineitem
           WHERE l_orderkey % 11 = 0 AND l_linenumber <= 4)
         SELECT l_returnflag, count(*) AS n,
                CAST(sum(cents) AS BIGINT) AS cents,
                min(l_shipdate) AS mn, max(l_shipdate) AS mx
         FROM src GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // COPY … FROM import (io22, [[graft.sql.CopySql]]) — the ingestion
    // twin of io21, all three formats in one chain: three slices export
    // (PARQUET / CSV / JSON), then three COPY FROM statements append
    // them into a seed table, file columns aligned BY NAME and cast
    // into the target types (CSV comes back via header + inference,
    // JSON as NDJSON — the documented lossy-format divergences are
    // erased by the cast-into-target contract). The final rollup gates
    // every imported value; the oracle is the same rollup straight off
    // the source rows, so the query proves export → import → append
    // lost nothing. Each import is one pruned scan + one shuffle-free
    // union.
    "io22_copy_from" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val src = s.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_orderkey") % 13 === 0)
          .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
            col("l_returnflag").as("flag"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"))
        src.createOrReplaceTempView("io22_all")
        src.filter(col("ln") === 1).drop("ln")
          .createOrReplaceTempView("io22_t")
        val base = new java.io.File(dir).getName
        val (p1, p2, p3) = (scratchDir(s"io22p_$base") + ".parquet",
          scratchDir(s"io22c_$base") + ".csv",
          scratchDir(s"io22j_$base") + ".json")
        val p4 = scratchDir(s"io22h_$base") + ".csv"
        graft.api.Table.sessionSql(s,
          s"""COPY (SELECT k, flag, cents FROM io22_all WHERE ln = 2)
              TO '$p1' (FORMAT PARQUET)""")
        graft.api.Table.sessionSql(s,
          s"""COPY (SELECT k, flag, cents FROM io22_all WHERE ln = 3)
              TO '$p2' (FORMAT CSV)""")
        graft.api.Table.sessionSql(s,
          s"""COPY (SELECT k, flag, cents FROM io22_all WHERE ln = 4)
              TO '$p3' (FORMAT JSON)""")
        // headerless pipe-delimited arm: the file carries NO names, so
        // the import maps positionally into the target schema (DuckDB's
        // HEADER-false rule) — the exporting subquery must emit the
        // target's column order, exactly the contract a user signs
        graft.api.Table.sessionSql(s,
          s"""COPY (SELECT k, flag, cents FROM io22_all WHERE ln = 5)
              TO '$p4' (FORMAT CSV, HEADER false, DELIMITER '|')""")
        // dirty-CSV fidelity arm (r18): values carrying the delimiter,
        // the quote char itself, and NULLs round-trip byte-exact via
        // QUOTE/ESCAPE/NULLSTR (single-quote as the CSV quote char,
        // doubling-style escape, '~N~' as the NULL marker)
        val p5 = scratchDir(s"io22q_$base") + ".csv"
        graft.api.Table.sessionSql(s,
          s"""COPY (SELECT k,
                      CASE WHEN k % 2 = 0 THEN NULL
                           ELSE concat('v,', flag, '''q''') END AS flag,
                      cents FROM io22_all WHERE ln = 6)
              TO '$p5' (FORMAT CSV, QUOTE '''', ESCAPE '''',
                        NULLSTR '~N~')""")
        graft.api.Table.sessionSql(s, s"COPY io22_t FROM '$p1'").df
          .createOrReplaceTempView("io22_s1")
        graft.api.Table.sessionSql(s,
          s"COPY io22_s1 FROM '$p2' (FORMAT CSV)").df
          .createOrReplaceTempView("io22_s2")
        graft.api.Table.sessionSql(s,
          s"COPY io22_s2 FROM '$p3' (FORMAT JSON)").df
          .createOrReplaceTempView("io22_s3")
        graft.api.Table.sessionSql(s,
          s"COPY io22_s3 FROM '$p4' (FORMAT CSV, HEADER false, DELIM '|')")
          .df.createOrReplaceTempView("io22_s4")
        graft.api.Table.sessionSql(s,
          s"""COPY io22_s4 FROM '$p5' (FORMAT CSV, QUOTE '''',
                ESCAPE '''', NULLSTR '~N~')""").df
          .groupBy(col("flag"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"),
            min(col("k")).as("mn"), max(col("k")).as("mx"))
          // the NULLSTR arm makes a NULL flag group — DuckDB default
          // sort is nulls LAST where Spark's is first
          .orderBy(col("flag").asc_nulls_last)
      },
      """WITH src AS (SELECT l_orderkey AS k, l_linenumber AS ln,
                l_returnflag AS flag,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem WHERE l_orderkey % 13 = 0),
         u AS (SELECT k, flag, cents FROM src WHERE ln <= 5
               UNION ALL
               SELECT k,
                      CASE WHEN k % 2 = 0 THEN NULL
                           ELSE concat('v,', flag, '''q''') END AS flag,
                      cents
               FROM src WHERE ln = 6)
         SELECT flag, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
         FROM u GROUP BY flag ORDER BY flag"""),

    // Partitioned export (io23, COPY ... TO (PARTITION_BY ...)): the
    // hive-layout twin of io21 — two partition levels (returnflag,
    // linestatus), key=value directories both engines write
    // identically; each task writes its partition files (exchange-free
    // terminal write), downstream scans prune on the keys. The
    // statement returns the read-back (partition columns recovered from
    // directory names), a partition-pruned filter rides on it, and the
    // rollup gates values AND the partition-column recovery; the oracle
    // is the same rollup straight off the source. A second COPY TO onto
    // the same path proves the overwrite gate recognizes the nested
    // partitioned layout as a prior export.
    "io23_copy_partitioned" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        s.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_orderkey") % 19 === 0)
          .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("io23_src")
        val out = scratchDir(s"io23_${new java.io.File(dir).getName}")
        graft.api.Table.sessionSql(s,
          s"""COPY io23_src TO '$out'
              (FORMAT PARQUET, PARTITION_BY (l_returnflag, l_linestatus))""")
        // overwrite the export in place: the safety gate must accept the
        // nested key=value layout (and refuse anything else loudly)
        graft.api.Table.sessionSql(s,
          s"""COPY io23_src TO '$out'
              (FORMAT PARQUET, PARTITION_BY (l_returnflag, l_linestatus))""")
          .df
          .filter(col("l_returnflag") =!= "N") // prunes on the hive key
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"),
            min(col("l_orderkey")).as("mn"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS cents,
                min(l_orderkey) AS mn
         FROM lineitem
         WHERE l_orderkey % 19 = 0 AND l_returnflag <> 'N'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""),

    // DuckDB's file-reading FROM forms (io24, [[graft.sql
    // .FileReadSql]]): read_parquet('p') / read_csv('p') table
    // functions and the bare FROM '<path>' literal, each binding a
    // statement-scoped lazy reader view (pruning/pushdown reach the
    // file scan — the io01-io04 shape at the SQL surface). The chain:
    // COPY exports a CSV slice whose source is itself a read_parquet()
    // call (the COPY subquery re-enters the session pipeline), then one
    // statement joins read_csv() of that export against a bare-literal
    // parquet join target. The oracle is the same join over the bound
    // tables — proving the file forms read exactly the table contents.
    "io24_file_read_sql" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val out = scratchDir(s"io24_${new java.io.File(dir).getName}") +
          ".csv"
        graft.api.Table.sessionSql(s,
          s"""COPY (SELECT n_nationkey, n_name, n_regionkey
                    FROM read_parquet('$dir/nation.parquet'))
              TO '$out' (FORMAT CSV)""")
        graft.api.Table.sessionSql(s,
          s"""SELECT r.r_name, count(*) AS n, min(c.n_name) AS mn
              FROM read_csv('$out') c
              JOIN '$dir/region.parquet' r
                ON c.n_regionkey = r.r_regionkey
              GROUP BY r.r_name ORDER BY r.r_name""").toDF
      },
      """SELECT r.r_name, count(*) AS n, min(n.n_name) AS mn
         FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name ORDER BY r.r_name"""),

    // EXPORT / IMPORT DATABASE (io25, [[graft.sql.ExportSql]]): the
    // whole-catalog transfer pair over the session temp views — every
    // bound table writes as <dir>/<name>.parquet plus a manifest; the
    // import reads the manifest and binds everything back. Runs in
    // CHILD sessions (newSession isolates the temp-view catalog — the
    // shared driver session binds dozens of unrelated query views), and
    // the gating rollup joins the two RE-IMPORTED tables in the second
    // child session, proving the round-trip carried data AND bindings.
    // One exchange-free terminal write per table; the manifest is a
    // driver-side byte file. FORMAT defaults to PARQUET (type-exact;
    // DuckDB defaults CSV — documented divergence).
    "io25_export_database" -> api(
      (s, dir) => {
        val s2 = s.newSession()
        Registry.registerAll(s2)
        s2.read.parquet(s"$dir/nation.parquet")
          .createOrReplaceTempView("nation_x")
        s2.read.parquet(s"$dir/region.parquet")
          .createOrReplaceTempView("region_x")
        val out = scratchDir(s"io25_${new java.io.File(dir).getName}")
        graft.api.Table.sessionSql(s2, s"EXPORT DATABASE '$out'")
        val s3 = s.newSession()
        Registry.registerAll(s3)
        graft.api.Table.sessionSql(s3, s"IMPORT DATABASE '$out'")
        graft.api.Table.sessionSql(s3,
          """SELECT r.r_name, count(*) AS n, min(n.n_name) AS mn
             FROM nation_x n JOIN region_x r
               ON n.n_regionkey = r.r_regionkey
             GROUP BY r.r_name ORDER BY r.r_name""").df
      },
      """SELECT r.r_name, count(*) AS n, min(n.n_name) AS mn
         FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name ORDER BY r.r_name"""),

    // Schema-evolution read (io20): a dataset written in TWO schema
    // generations (gen-1 lacks `lang`; gen-2 adds it) under one root,
    // read back with mergeSchema=true — Spark reconciles the footers
    // into the union schema and gen-1 rows surface the new column as
    // NULL, exactly the lakehouse add-a-column migration. The rollup
    // gates both generations' values and the null backfill. (Without
    // mergeSchema Spark takes ONE footer's schema — a silent column
    // drop; the option is the contract this query pins.)
    "io20_schema_evolution" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val root = scratchDir(s"io20_${new java.io.File(dir).getName}")
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("n_chars"))
          .write.parquet(s"$root/gen=1")
        docs.filter(col("doc_id") % 2 =!= 0)
          .select(col("doc_id"), col("n_chars"), col("lang"))
          .write.parquet(s"$root/gen=2")
        s.read.option("mergeSchema", "true").parquet(root)
          .groupBy(col("gen"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).as("chars"),
            sum(col("lang").isNull.cast("long")).as("n_lang_null"),
            count_distinct(col("lang")).as("n_langs"))
          .orderBy(col("gen"))
      },
      """SELECT 1 AS gen, count(*) AS n,
                CAST(sum(n_chars) AS BIGINT) AS chars,
                count(*) AS n_lang_null, CAST(0 AS BIGINT) AS n_langs
         FROM documents WHERE doc_id % 2 = 0
         UNION ALL
         SELECT 2, count(*), CAST(sum(n_chars) AS BIGINT),
                0, count(DISTINCT lang)
         FROM documents WHERE doc_id % 2 <> 0
         ORDER BY gen"""),

    // Retention sweep over the versioned layout (io19): three publishes,
    // expire to the newest two — v=1 is deleted and a time-travel read
    // of it refuses loudly, v=2 stays reachable, the pointer (v=3) is
    // untouched. Closes io18's documented "time travel is only as deep
    // as retention" note with the GC that enforces it (and that can
    // NEVER delete the pointer target).
    "io19_retention" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        val root = scratchDir(s"io19_${new java.io.File(dir).getName}")
        graft.ops.Wap.Versioned.publishVersion(docs, root)(_ => ())
        graft.ops.Wap.Versioned.publishVersion(
          docs.filter(col("lang") === "en"), root)(_ => ())
        graft.ops.Wap.Versioned.publishVersion(
          docs.filter(col("lang") =!= "en"), root)(_ => ())
        val expired = graft.ops.Wap.Versioned.expireVersions(s, root,
          keepLast = 2)
        val v1Refused =
          try {
            graft.ops.Wap.Versioned.readVersion(s, root, Some(1L)).count()
            false
          } catch { case _: IllegalArgumentException => true }
        val v2 = graft.ops.Wap.Versioned.readVersion(s, root, Some(2L))
          .agg(count(lit(1)).as("v2_docs"), sum(col("n_chars")).as("v2_chars"))
        val cur = graft.ops.Wap.Versioned.readVersion(s, root)
          .agg(count(lit(1)).as("cur_docs"), sum(col("n_chars")).as("cur_chars"))
        v2.crossJoin(cur).select(
          lit(expired == Seq(1L)).as("expired_exactly_v1"),
          lit(v1Refused).as("expired_read_refused"),
          col("v2_docs"), col("v2_chars"), col("cur_docs"), col("cur_chars"),
          lit(graft.ops.Wap.Versioned.currentVersion(s, root)
            .contains(3L)).as("pointer_untouched"))
      },
      """SELECT true AS expired_exactly_v1,
                true AS expired_read_refused,
                (SELECT count(*) FROM documents WHERE lang = 'en') AS v2_docs,
                (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents
                 WHERE lang = 'en') AS v2_chars,
                (SELECT count(*) FROM documents WHERE lang <> 'en') AS cur_docs,
                (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents
                 WHERE lang <> 'en') AS cur_chars,
                true AS pointer_untouched"""),

    // Versioned publish + time travel (io18) — io17's deployment story
    // made first-class: two audited publishes mint root/v=1 and v=2 with
    // an ATOMIC pointer swap (FileContext OVERWRITE rename — no delete
    // window anywhere on the publish path, closing io17's one caveat), a
    // third publish with a FAILING audit is proven to leave the pointer
    // and both versions untouched, and the query reads BOTH VERSION AS
    // OF 1 and AS OF 2 plus the pointer-current version. v1 = full doc
    // stats, v2 = en-only — so the two reads differ and the oracle pins
    // each against the source table.
    "io18_time_travel" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        val root = scratchDir(s"io18_${new java.io.File(dir).getName}")
        graft.ops.Wap.Versioned.publishVersion(docs, root) { staged =>
          require(staged.count() == docs.count(), "v1 audit")
        }
        graft.ops.Wap.Versioned.publishVersion(
          docs.filter(col("lang") === "en"), root)(_ => ())
        val blocked =
          try {
            graft.ops.Wap.Versioned.publishVersion(docs.limit(1), root)(_ =>
              require(false, "forced audit failure"))
            false
          } catch { case _: IllegalStateException => true }
        val v1 = graft.ops.Wap.Versioned.readVersion(s, root, Some(1L))
          .agg(count(lit(1)).as("v1_docs"), sum(col("n_chars")).as("v1_chars"))
        val v2 = graft.ops.Wap.Versioned.readVersion(s, root, Some(2L))
          .agg(count(lit(1)).as("v2_docs"), sum(col("n_chars")).as("v2_chars"))
        val cur = graft.ops.Wap.Versioned.readVersion(s, root)
          .agg(count(lit(1)).as("cur_docs"))
        v1.crossJoin(v2).crossJoin(cur)
          .select(col("v1_docs"), col("v1_chars"), col("v2_docs"),
            col("v2_chars"),
            (col("cur_docs") === col("v2_docs")).as("pointer_at_v2"),
            lit(blocked).as("failed_audit_blocked"),
            lit(graft.ops.Wap.Versioned.currentVersion(s, root)
              .contains(2L)).as("pointer_untouched_by_failed_publish"))
      },
      """SELECT (SELECT count(*) FROM documents) AS v1_docs,
                (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS v1_chars,
                (SELECT count(*) FROM documents WHERE lang = 'en') AS v2_docs,
                (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents
                 WHERE lang = 'en') AS v2_chars,
                true AS pointer_at_v2,
                true AS failed_audit_blocked,
                true AS pointer_untouched_by_failed_publish"""),

    // bucketed-table SHUFFLE-FREE join (io16) — the 100 TB co-location
    // layout demonstrated end-to-end: both join sides written with
    // bucketBy(16, custkey) + sortBy, so the bucketed scans report hash
    // partitioning AND per-bucket order and the merge join needs NO
    // Exchange and NO Sort anywhere in the plan (PlanSpec-pinned) —
    // grouping on the same key reuses the bucketing too, and the output
    // TopK is TakeOrderedAndProject (exchange-free). merge hints keep
    // the tiny sf customer side from auto-broadcasting, which would
    // demonstrate nothing. The oracle is the plain join over the
    // original parquet — layout must not change results.
    "io16_bucketed_join" -> api(
      (s, dir) => {
        val sfx = new java.io.File(dir).getName.replace(".", "_")
        // repartition on the bucket key with numPartitions == numBuckets:
        // Spark's repartition hash IS the bucket hash (murmur3 pmod n),
        // so every task writes exactly ONE file per bucket — the
        // condition under which the scan reports per-bucket ORDER and
        // the merge join skips its Sort (multi-file buckets are only
        // sorted within each file)
        graft.ops.Skew.writeBucketed(
          s.read.parquet(s"$dir/orders.parquet")
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
            .repartition(16, col("o_custkey")),
          s"io16_orders_$sfx", "o_custkey", buckets = 16)
        graft.ops.Skew.writeBucketed(
          s.read.parquet(s"$dir/customer.parquet")
            .select(col("c_custkey"), col("c_name"))
            .repartition(16, col("c_custkey")),
          s"io16_cust_$sfx", "c_custkey", buckets = 16)
        val o = s.table(s"io16_orders_$sfx").hint("merge")
        val c = s.table(s"io16_cust_$sfx").hint("merge")
        o.join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
            max(col("c_name")).as("name"))
          .orderBy(col("o_custkey")).limit(2000)
      },
      """SELECT o_custkey, count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents,
                max(c_name) AS name
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY o_custkey ORDER BY o_custkey LIMIT 2000"""),

    "io09_zorder_layout" -> api(
      (s, dir) => {
        val K = graft.ops.Skew
        val tmp = scratchDir(s"io09_zorder_${new java.io.File(dir).getName}")
        s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice"))
          .withColumn("__z", K.zorder2(
            K.rangeBucket(col("l_partkey"), 0L, 1L << 18, 16),
            K.rangeBucket(col("l_suppkey"), 0L, 1L << 14, 16)))
          .repartitionByRange(8, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
          .write.mode("overwrite").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("l_partkey").between(500, 1500) &&
            col("l_suppkey").between(50, 150))
          .agg(count(lit(1)).as("n"),
            sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"),
            min(col("l_orderkey")).as("mn"), max(col("l_orderkey")).as("mx"))
      },
      """SELECT count(*) AS n,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
                min(l_orderkey) AS mn, max(l_orderkey) AS mx
         FROM lineitem
         WHERE l_partkey BETWEEN 500 AND 1500
           AND l_suppkey BETWEEN 50 AND 150""")

    ,

    // Small-file compaction — the maintenance job every 100 TB table
    // runs: rewrite a table into ~target-sized files (range-partitioned
    // by key so the layout stays pruning-friendly), then PROVE the
    // rewrite moved every row unchanged. Gates: row count +
    // order-insensitive content checksum vs the source (32-bit md5
    // prefixes summed, pr09's overflow-free discipline) and the ACTUAL
    // file count vs the planned one (an empty range partition would
    // leak the real count and turn the row red). The 1-row sum().first()
    // is control-plane staging for the plan parameter — the same
    // legitimate tier as centroid/codebook collects, not a data-path
    // collect.
    "io11_compaction" -> api(
      (s, dir) => {
        val src = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
        val targetChars = 400000L
        val totalChars = src.agg(sum(length(col("t")))).first().getLong(0)
        val planned = math.max(1L,
          math.ceil(totalChars.toDouble / targetChars).toLong)
        val out = scratchDir(s"io11_${new java.io.File(dir).getName}")
        src.repartitionByRange(planned.toInt, col("doc_id"))
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          // project the file name first: non-deterministic expressions
          // may not appear inside aggregate arguments
          .withColumn("__f", input_file_name())
          .agg(count(lit(1)).as("n_rows"),
            sum(conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":"), col("t"))), 1, 8), 16, 10).cast("long"))
              .as("checksum"),
            count_distinct(col("__f")).as("__nf"))
          .select(col("n_rows"), col("checksum"),
            when(col("__nf") === planned, lit(planned)).otherwise(col("__nf"))
              .as("n_files"))
      },
      """WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents)
         SELECT count(*) AS n_rows,
                CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                         || ':' || t), 1, 8))::BIGINT) AS BIGINT) AS checksum,
                greatest(1, CAST(ceil(CAST(sum(length(t)) AS DOUBLE)
                         / 400000) AS BIGINT)) AS n_files
         FROM d""")

    ,

    // Parquet BLOOM FILTERS on the point-lookup key: at 100 TB a needle
    // query (`doc_id IN (...)`) should skip row groups whose min/max
    // straddle the probe but whose bloom says "definitely absent" —
    // stats alone can't skip when keys are scattered. The write sets
    // parquet.bloom.filter.enabled#doc_id (+ expected NDV, sized to
    // the corpus) and small row groups so skipping has granularity;
    // the read-back filter reaches the scan as PushedFilters (In), and
    // the footer-level bloom presence is pinned in OpsSpec. Oracle:
    // the same probe against the original table.
    "io13_parquet_bloom" -> api(
      (s, dir) => {
        val out = scratchDir(s"io13_bloom_${new java.io.File(dir).getName}")
        s.read.parquet(s"$dir/documents.parquet")
          .write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#doc_id", "true")
          .option("parquet.bloom.filter.expected.ndv#doc_id", "1000000")
          .option("parquet.block.size", (1 << 20).toString)
          .parquet(out)
        s.read.parquet(out)
          .filter(col("doc_id").isin(7L, 77L, 177L, 277L, 377L))
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE doc_id IN (7, 77, 177, 277, 377) ORDER BY doc_id"""),

    // DYNAMIC partition overwrite — the incremental-backfill write mode
    // a day-partitioned 100 TB table lives by: rewrite ONLY the
    // partitions present in the patch, leave every other day's files
    // untouched. The query seeds a day-partitioned copy of events,
    // patches one day with doubled values via
    // partitionOverwriteMode=dynamic, reads the table back and
    // aggregates per event_type — green iff the patched day changed,
    // no other day did, and no rows were lost or appended (static
    // overwrite mode would have wiped the other 29 days; the oracle's
    // CASE re-derivation would turn every untouched day red).
    "io12_dynamic_overwrite" -> api(
      (s, dir) => {
        val MpD = graft.streaming.Events.MicrosPerDay
        val ev = graft.streaming.Events.readRaw(s, dir)
          .withColumn("day", expr(s"ts div $MpD"))
          .select(col("event_id"), col("day"), col("event_type"), col("value"))
        val out = scratchDir(s"io12_${new java.io.File(dir).getName}")
        ev.write.partitionBy("day").mode("overwrite").parquet(out)
        val d0 = 19723L // first corpus day (span 19723-19752 at every SF)
        ev.filter(col("day") === d0)
          .withColumn("value", col("value") * 2)
          .write.partitionBy("day").mode("overwrite")
          .option("partitionOverwriteMode", "dynamic").parquet(out)
        s.read.parquet(out)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("cents"))
          .orderBy(col("event_type"))
      },
      s"""WITH ev AS (SELECT event_type, value,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           FROM events)
         SELECT event_type, count(*) AS n,
                CAST(sum(CAST(round(CASE WHEN day = 19723
                         THEN value * 2 ELSE value END * 100) AS BIGINT))
                  AS BIGINT) AS cents
         FROM ev GROUP BY event_type ORDER BY event_type""")

    ,

    // Per-dimension embedding QA card: mean/std/min/max for each of the
    // 64 dims in one posexplode + keyed aggregation. Output is dims
    // rows regardless of corpus size; round(,6) absorbs merge-order
    // float noise (g05 discipline).
    "pr05_embedding_stats" -> api(
      (s, dir) => graft.ops.Profile.embeddingStats(
        s.read.parquet(s"$dir/embeddings.parquet"), "embedding"),
      """SELECT CAST(i AS BIGINT) AS dim,
                round(avg(x), 6) AS mean,
                round(stddev_samp(x), 6) AS std,
                round(min(x), 6) AS mn,
                round(max(x), 6) AS mx
         FROM (SELECT unnest(embedding::DOUBLE[]) AS x,
                      generate_subscripts(embedding, 1) AS i
               FROM embeddings)
         GROUP BY i ORDER BY dim""")

    ,

    // Count-min-sketch frequency estimates under a strict error-contract
    // gate — the third sketch family after HLL distinct (ap01/ap02) and
    // approximate quantiles (ap02). One merge-order-invariant
    // count_min_sketch aggregate (counter addition commutes exactly, so
    // the sketch is deterministic under any partitioning) is probed
    // in-plan per key via cms_estimate against the exact counts:
    // lower_ok (est >= true — the structural CMS guarantee) and
    // upper_ok (est <= true + eps*N, the formal bound at eps=0.05, width
    // 40 < 100 keys so real collisions are exercised). The oracle
    // re-derives the exact counts and asserts both gates TRUE.
    "ap03_freq_sketch" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val ev = graft.streaming.Events.readRaw(s, dir)
          .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
          .filter(col("k").isNotNull)
        val sk = ev.agg(expr(
          "count_min_sketch(k, CAST(0.05 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)")
          .as("sk"))
        val truth = ev.groupBy(col("k")).agg(count(lit(1)).as("n_true"))
        truth.crossJoin(broadcast(sk))
          .withColumn("__tot", sum(col("n_true")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .select(col("k"), col("n_true"),
            (call_function("cms_estimate", col("sk"), col("k"))
              >= col("n_true")).as("lower_ok"),
            (call_function("cms_estimate", col("sk"), col("k"))
              <= col("n_true") + ceil(col("__tot") * 0.05)).as("upper_ok"))
          .orderBy(col("k"))
      },
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                count(*) AS n_true, TRUE AS lower_ok, TRUE AS upper_ok
         FROM events
         WHERE json_extract_string(props, '$.k') IS NOT NULL
         GROUP BY 1 ORDER BY k""")

    ,

    // grouping() marker functions over explicit GROUPING SETS — how
    // consumers of r01/g02-style multi-level rollups tell an aggregated
    // NULL from a data NULL. Same text in both engines.
    "g10_grouping_fn" -> multi(Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus,
                CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
                count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), (l_linestatus), ())
         ORDER BY g_rf, g_ls,
                  l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST"""),

    // try_cast error-tolerant conversions — the ANSI-mode-safe ingestion
    // path for dirty columns (Spark 4 runs ANSI by default, so a plain
    // CAST on one malformed row kills the whole job). Only the string
    // type name differs between engines (STRING vs VARCHAR).
    "q30_try_cast" -> diff("documents",
      """SELECT doc_id,
                try_cast(CASE WHEN doc_id % 3 = 0
                              THEN 'x' || CAST(doc_id AS STRING)
                              ELSE CAST(doc_id AS STRING) END AS BIGINT) AS ti,
                try_cast(CASE WHEN doc_id % 2 = 0
                              THEN CAST(doc_id AS STRING) || '.5'
                              ELSE 'nope' END AS DOUBLE) AS td
         FROM documents ORDER BY doc_id""",
      """SELECT doc_id,
                try_cast(CASE WHEN doc_id % 3 = 0
                              THEN 'x' || CAST(doc_id AS VARCHAR)
                              ELSE CAST(doc_id AS VARCHAR) END AS BIGINT) AS ti,
                try_cast(CASE WHEN doc_id % 2 = 0
                              THEN CAST(doc_id AS VARCHAR) || '.5'
                              ELSE 'nope' END AS DOUBLE) AS td
         FROM documents ORDER BY doc_id""")

    ,

    // VAD-shaped audio activity segmentation: WAV payloads (m06's
    // construction) framed at 64 samples, integer Σv² energy per frame,
    // active iff ≥ 628000 (the measured median frame energy, so the
    // threshold genuinely splits frames), consecutive active frames
    // merged into segments. All-integer decisions — the oracle
    // re-derives every byte, frame energy, and island boundary exactly.
    "m08_audio_segments" -> api(
      (s, dir) => {
        val m = graft.ops.Multimodal
        m.audioSegments(
            m.withWavPayload(
              s.read.parquet(s"$dir/documents.parquet")
                .withColumn("text", coalesce(col("text"), lit(""))),
              "doc_id", "text"),
            "doc_id", "payload", frame = 64, energyThreshold = 628000L)
          .orderBy(col("doc_id"))
      },
      """WITH d AS (SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
                           octet_length(encode(coalesce(text, ''))) AS len
                    FROM documents),
         sm AS (SELECT doc_id, u.i,
                       CAST('0x' || substr(hx, 2 * u.i + 1, 2) AS INTEGER) AS v
                FROM d, unnest(generate_series(0, len - 1)) AS u(i)
                WHERE len > 0),
         fr AS (SELECT doc_id, i // 64 AS f, sum(v * v) AS e
                FROM sm GROUP BY 1, 2 HAVING count(*) = 64),
         ac AS (SELECT doc_id, f,
                       CASE WHEN e >= 628000 THEN 1 ELSE 0 END AS a
                FROM fr),
         st AS (SELECT doc_id, f, a,
                       CASE WHEN a = 1 AND coalesce(lag(a) OVER
                              (PARTITION BY doc_id ORDER BY f), 0) = 0
                            THEN 1 ELSE 0 END AS s
                FROM ac),
         gid AS (SELECT doc_id, f, a,
                        sum(s) OVER (PARTITION BY doc_id ORDER BY f
                                     ROWS UNBOUNDED PRECEDING) AS g
                 FROM st),
         runs AS (SELECT doc_id, g, count(*) AS rl
                  FROM gid WHERE a = 1 GROUP BY doc_id, g),
         agg AS (SELECT doc_id, count(*) AS n_frames, sum(a) AS n_active
                 FROM ac GROUP BY 1),
         seg AS (SELECT doc_id, count(*) AS n_segments, max(rl) AS longest
                 FROM runs GROUP BY 1)
         SELECT d.doc_id,
                CAST(coalesce(agg.n_frames, 0) AS BIGINT) AS n_frames,
                CAST(coalesce(agg.n_active, 0) AS BIGINT) AS n_active,
                CAST(coalesce(seg.n_segments, 0) AS BIGINT) AS n_segments,
                CAST(coalesce(seg.longest, 0) AS BIGINT) AS longest_run
         FROM d LEFT JOIN agg USING (doc_id) LEFT JOIN seg USING (doc_id)
         ORDER BY d.doc_id"""),

    // Retrieve-then-rerank — the production two-stage search: the IVF×PQ
    // ADC shortlist (cheap, quantized) refined by TRUE cosine on the
    // original vectors, bounded-heap ranked (never a rank window). The
    // oracle shares every CTE with s09/s11/s12 and re-scores the same
    // shortlist exactly, so the green hash proves shortlist AND refine.
    "s13_ann_rerank" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val P = graft.ops.Pq
        val cb = P.seededCodebook(emb, "vec_id", "embedding",
          dim = 64, m = 4, k = 16)
        val codes = P.encode(emb, cb, "vec_id", "embedding", dim = 64, m = 4)
        val coarse = P.seededCoarseCentroids(emb, "vec_id", "embedding",
          nlist = 8)
        val cells = P.nearestCells(emb, coarse, "vec_id", "embedding",
          take = 1)
        val probes = emb.filter(col("vec_id") < 5)
        val shortlist = P.ivfpqTopK(codes, cb, cells, coarse, probes,
          "vec_id", "embedding", dim = 64, m = 4, nprobe = 2, k = 10)
        graft.ops.Similarity.rerankExact(shortlist, emb, probes,
            "vec_id", "embedding", k = 5)
          .select(col("probe_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("sim"))
          .orderBy(col("probe_id"), col("rank"))
      },
      rerankOracle)

    ,

    // Pairwise correlation matrix — the feature-redundancy screen; all
    // six pairs ride one aggregation pass, unpivoted driver-free.
    "pr07_corr_matrix" -> api(
      (s, dir) => graft.ops.Profile.corrMatrix(
          s.read.parquet(s"$dir/lineitem.parquet"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("col_a"), col("col_b")),
      """SELECT col_a, col_b, c AS corr FROM (
           SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                  round(corr(l_quantity, l_extendedprice), 6) AS c FROM lineitem
           UNION ALL SELECT 'l_quantity', 'l_discount',
                  round(corr(l_quantity, l_discount), 6) FROM lineitem
           UNION ALL SELECT 'l_quantity', 'l_tax',
                  round(corr(l_quantity, l_tax), 6) FROM lineitem
           UNION ALL SELECT 'l_extendedprice', 'l_discount',
                  round(corr(l_extendedprice, l_discount), 6) FROM lineitem
           UNION ALL SELECT 'l_extendedprice', 'l_tax',
                  round(corr(l_extendedprice, l_tax), 6) FROM lineitem
           UNION ALL SELECT 'l_discount', 'l_tax',
                  round(corr(l_discount, l_tax), 6) FROM lineitem) t
         ORDER BY col_a, col_b"""),

    // Robust outliers per group: median + MAD, flag |v−med| beyond the
    // 3·1.4826·MAD robust z-score. Both stats round to 6 places BEFORE
    // the threshold compare so DuckDB's mad()-free re-derivation lands
    // on identical flags.
    "pr08_mad_outliers" -> api(
      (s, dir) => graft.ops.Profile.madOutliers(
          graft.streaming.Events.readRaw(s, dir), "event_type", "value",
          k = 3.0)
        .orderBy(col("event_type")),
      """WITH m AS (SELECT event_type, round(median(value), 6) AS med
                    FROM events GROUP BY 1),
         md AS (SELECT e.event_type,
                       round(median(abs(e.value - m.med)), 6) AS mad
                FROM events e JOIN m USING (event_type) GROUP BY 1)
         SELECT e.event_type, count(*) AS n, m.med AS median, md.mad AS mad,
                CAST(sum(CASE WHEN abs(e.value - m.med) >
                       3 * 1.4826 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_outliers
         FROM events e JOIN m USING (event_type) JOIN md USING (event_type)
         GROUP BY e.event_type, m.med, md.mad ORDER BY e.event_type""")

    ,

    // CDC with tombstones — the delete verb u01's upsert lacks: deletes
    // at v1 remove keys, a NEWER insert (v2) resurrects a subset, and a
    // STALE delete (v-1, older than the base row) must lose version
    // resolution and leave the base row standing. One windowed fold.
    "u03_cdc_deletes" -> api(
      (s, dir) => {
        val base = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("ver", lit(0L))
        val orders = s.read.parquet(s"$dir/orders.parquet")
        val dels = orders.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("ver", lit(1L)).withColumn("deleted", lit(true))
        val resurrect = orders.filter(col("o_orderkey") % 20 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") * 3).as("o_totalprice"))
          .withColumn("ver", lit(2L)).withColumn("deleted", lit(false))
        val stale = orders.filter(col("o_orderkey") % 7 === 3)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("ver", lit(-1L)).withColumn("deleted", lit(true))
        graft.ops.Cdc.upsertWithDeletes(base,
            dels.unionByName(resurrect).unionByName(stale),
            Seq("o_orderkey"), "ver", "deleted")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
            sum((col("ver") === 2).cast("long")).as("n_resurrected"))
          .orderBy(col("o_orderstatus"))
      },
      """WITH changes AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS ver,
                  FALSE AS deleted FROM orders
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice, 1, TRUE
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice * 3, 2, FALSE
           FROM orders WHERE o_orderkey % 20 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice, -1, TRUE
           FROM orders WHERE o_orderkey % 7 = 3),
         latest AS (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                        ORDER BY ver DESC) AS rn
           FROM changes)
         SELECT o_orderstatus, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents,
                CAST(sum(CASE WHEN ver = 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_resurrected
         FROM latest WHERE rn = 1 AND NOT deleted
         GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    // MERGE with automatic SCHEMA EVOLUTION (Cdc.upsertEvolved): the
    // update batch carries a column the base lacks (priority) and omits
    // one it has (o_totalprice) — alignment is by name, the missing side
    // null-fills, and untouched base rows surface the new column as
    // null. The oracle replays the same widen-then-latest-wins MERGE
    // relationally. One shuffle on the key, same as plain u01.
    "u04_upsert_evolved" -> api(
      (s, dir) => {
        val orders = s.read.parquet(s"$dir/orders.parquet")
        val base = orders
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("ver", lit(0L))
        val upd = orders.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"),
            lit("U").as("o_orderstatus"),
            (col("o_orderkey") % 3).cast("long").as("priority"))
          .withColumn("ver", lit(1L))
        graft.ops.Cdc.upsertEvolved(base, upd, Seq("o_orderkey"), "ver")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
            count(col("priority")).as("n_priority"),
            sum(col("priority")).cast("long").as("sum_priority"))
          .orderBy(col("o_orderstatus"))
      },
      """WITH changes AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS ver,
                  CAST(NULL AS BIGINT) AS priority FROM orders
           UNION ALL
           SELECT o_orderkey, 'U', CAST(NULL AS DOUBLE), 1, o_orderkey % 3
           FROM orders WHERE o_orderkey % 5 = 0),
         latest AS (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                        ORDER BY ver DESC) AS rn
           FROM changes)
         SELECT o_orderstatus, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents,
                count(priority) AS n_priority,
                CAST(sum(priority) AS BIGINT) AS sum_priority
         FROM latest WHERE rn = 1
         GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    // Incremental aggregate maintenance (Cdc.maintainCountSum): a
    // (count, cents) rollup kept in sync with a LWW delta by ALGEBRA —
    // (+1,+v) for winning delta rows, (−1,−v) for the base rows they
    // replace — never rescanning the base table. The delta exercises all
    // three cases: replace (group flips to 'X', price rescaled), stale
    // update (older version, must not adjust), fresh insert (new keys,
    // new group 'N'). The oracle recomputes the rollup from the FULL
    // fold, so a green hash proves incremental == recompute exactly
    // (long cents make the sums drift-free by construction).
    "u05_agg_maintenance" -> api(
      (s, dir) => {
        val orders = s.read.parquet(s"$dir/orders.parquet")
        val base = orders.select(col("o_orderkey").as("k"),
            col("o_orderstatus").as("g"),
            round(col("o_totalprice") * 100).cast("long").as("v"))
          .withColumn("ver", lit(0L))
        val delta = orders.filter(col("o_orderkey") % 4 === 1)
          .select(col("o_orderkey").as("k"), lit("X").as("g"),
            round(col("o_totalprice") * 110).cast("long").as("v"),
            lit(1L).as("ver"))
          .unionByName(orders.filter(col("o_orderkey") % 4 === 2)
            .select(col("o_orderkey").as("k"), col("o_orderstatus").as("g"),
              round(col("o_totalprice") * 100).cast("long").as("v"),
              lit(-1L).as("ver")))
          .unionByName(orders.filter(col("o_orderkey") % 10 === 0)
            .select((col("o_orderkey") + 10000000L).as("k"), lit("N").as("g"),
              round(col("o_totalprice") * 100).cast("long").as("v"),
              lit(1L).as("ver")))
        val oldAgg = base.groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        graft.ops.Cdc.maintainCountSum(base, delta, Seq("k"), "ver",
            "g", "v", oldAgg)
          .orderBy(col("g"))
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS g,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS v,
                  0 AS ver, 0 AS chg FROM orders),
         delta AS (
           SELECT o_orderkey, 'X',
                  CAST(round(o_totalprice * 110) AS BIGINT), 1, 1
           FROM orders WHERE o_orderkey % 4 = 1
           UNION ALL
           SELECT o_orderkey, o_orderstatus,
                  CAST(round(o_totalprice * 100) AS BIGINT), -1, 1
           FROM orders WHERE o_orderkey % 4 = 2
           UNION ALL
           SELECT o_orderkey + 10000000, 'N',
                  CAST(round(o_totalprice * 100) AS BIGINT), 1, 1
           FROM orders WHERE o_orderkey % 10 = 0),
         allr AS (SELECT * FROM base UNION ALL SELECT * FROM delta),
         latest AS (SELECT *, row_number() OVER (PARTITION BY k
                      ORDER BY ver DESC, chg DESC) AS rn FROM allr)
         SELECT g, count(*) AS n, CAST(sum(v) AS BIGINT) AS sv
         FROM latest WHERE rn = 1 GROUP BY g ORDER BY g"""),

    // Growth accounting: per-day events, exact actives, first-seen
    // ("new") users and the cumulative user count. The cumulative window
    // runs over the #days rollup, never the event volume.
    "e09_new_users" -> api(
      (s, dir) => graft.streaming.Events.dailyNewUsers(
        graft.streaming.Events.readRaw(s, dir)),
      """WITH ev AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                       AS day, user_id FROM events),
         fs AS (SELECT user_id, min(day) AS fday FROM ev GROUP BY 1),
         d AS (SELECT day, count(*) AS n_events,
                      count(DISTINCT user_id) AS n_active
               FROM ev GROUP BY 1),
         nu AS (SELECT fday AS day, count(*) AS n_new FROM fs GROUP BY 1)
         SELECT d.day, d.n_events, d.n_active,
                coalesce(nu.n_new, 0) AS n_new,
                CAST(sum(coalesce(nu.n_new, 0)) OVER
                     (ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS cum_users
         FROM d LEFT JOIN nu USING (day) ORDER BY d.day"""),

    // Rolling 7-day active users (DAU/WAU/stickiness): exact distinct
    // users per day AND per trailing 7-day window, joined into the
    // engagement card. Rolling DISTINCT does not decompose into a window
    // frame, so the scale trick is: dedup to (day, user) FIRST (the only
    // pass over event volume), then explode each such row to the ≤7
    // trailing days it supports and count distinct per day — the
    // expansion runs on the deduped relation (days×users), never raw
    // events, and 7 is the window constant, not data-driven. Days beyond
    // the observed span are clipped so both engines cover exactly
    // [min_day, max_day]. Stickiness rounds to 6.
    // lag-k autocorrelation of the daily event-count series (k = 1, 7 —
    // day-over-day persistence and weekly seasonality). The heavy step
    // is the keyed daily rollup; the lag window + moment sums then run
    // on the BOUNDED series (one row per day), so the single-partition
    // window is O(days), never O(events). The correlation is the g19
    // discipline: exact integer sums through one mirrored
    // correctly-rounded chain (+,-,*,/,sqrt only).
    // seasonal-naive forecast quality (e27): MASE of the weekly
    // seasonal-naive forecast x̂(d) = x(d−7) against the naive-1
    // baseline over the daily-count series — the standard "is there
    // weekly structure worth modeling" check (MASE < 1 ⇒ seasonal
    // beats naive). All errors are exact integer |differences| summed
    // exactly; the two MAEs and their ratio run one mirrored double
    // chain. Two self-joins of the DAYS-sized rollup — nothing scales
    // with events beyond the one dailyCounts aggregation.
    "e27_seasonal_mase" -> api(
      (s, dir) => {
        val d = dailyCounts(s, dir)
        def pairs(k: Int) = d.as("a").join(
            d.select((col("day") + k).as("day"), col("x").as("xl")),
            Seq("day"))
          .agg(count(lit(1)).as("n"), sum(abs(col("x") - col("xl"))).as("sae"))
        val p7 = pairs(7).select(col("n").as("n7"), col("sae").as("s7"))
        val p1 = pairs(1).select(col("n").as("n1"), col("sae").as("s1"))
        p7.crossJoin(p1).select(col("n7"), col("s7"), col("n1"), col("s1"),
          round((col("s7").cast("double") / col("n7").cast("double")) /
            (col("s1").cast("double") / col("n1").cast("double")), 6)
            .as("mase"))
      },
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                           count(*) AS x
                    FROM events GROUP BY 1),
         p7 AS (SELECT count(*) AS n7,
                       CAST(sum(abs(a.x - b.x)) AS BIGINT) AS s7
                FROM d a JOIN d b ON a.day = b.day + 7),
         p1 AS (SELECT count(*) AS n1,
                       CAST(sum(abs(a.x - b.x)) AS BIGINT) AS s1
                FROM d a JOIN d b ON a.day = b.day + 1)
         SELECT n7, s7, n1, s1,
                round((CAST(s7 AS DOUBLE) / CAST(n7 AS DOUBLE))
                      / (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 6)
                  AS mase
         FROM p7, p1"""),

    // Grouped OLS trend (e28): per event_type, least-squares slope /
    // intercept / r² of daily counts against the day index — the
    // workhorse trend fit beside e23's robust Theil–Sen. Every moment
    // (n, Σx, Σy, Σxx, Σxy, Σyy) is EXACT (decimal-widened products,
    // the e21/e26 discipline; DuckDB mirrors in HUGEINT), and each
    // output runs ONE mirrored double chain over those exact integers
    // before rounding. x is the day offset from the global first day
    // (one broadcast scalar), so both engines share the regressor.
    "e28_ols_trend" -> api(
      (s, dir) => {
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val d = s.read.parquet(s"$dir/events.parquet")
          .select(col("event_type"),
            // parquet ts reads as TIMESTAMP_NTZ; unix_micros wants TZ.
            // Integer floor-div, not `/` (that's double division)
            expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
              .as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("y"))
        val m0 = d.agg(min(col("day")).as("d0"))
        val t = d.crossJoin(broadcast(m0))
          .select(col("event_type"), (col("day") - col("d0")).as("x"),
            col("y"))
        val xd = col("x").cast(d38)
        val yd = col("y").cast(d38)
        val m = t.groupBy(col("event_type"))
          .agg(count(lit(1)).cast(d38).as("n"), sum(xd).as("sx"),
            sum(yd).as("sy"), sum(xd * xd).as("sxx"),
            sum(xd * yd).as("sxy"), sum(yd * yd).as("syy"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val sxyN = col("n") * col("sxy") - col("sx") * col("sy")
        val sxxN = col("n") * col("sxx") - col("sx") * col("sx")
        val syyN = col("n") * col("syy") - col("sy") * col("sy")
        m.select(col("event_type"), col("n").cast("long").as("n_days"),
            round(dd(sxyN) / dd(sxxN), 6).as("slope"),
            round(dd(col("sy") * col("sxx") - col("sx") * col("sxy"))
              / dd(sxxN), 6).as("intercept"),
            round((dd(sxyN) * dd(sxyN)) / (dd(sxxN) * dd(syyN)), 6)
              .as("r2"))
          .orderBy(col("event_type"))
      },
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         m0 AS (SELECT min(day) AS d0 FROM d),
         t AS (SELECT event_type, day - d0 AS x, y FROM d, m0),
         m AS (SELECT event_type, count(*) AS n, sum(x) AS sx,
                      sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy,
                      sum(y*y) AS syy
               FROM t GROUP BY 1)
         SELECT event_type, CAST(n AS BIGINT) AS n_days,
                round(CAST(n*sxy - sx*sy AS DOUBLE)
                      / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope,
                round(CAST(sy*sxx - sx*sxy AS DOUBLE)
                      / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS intercept,
                round((CAST(n*sxy - sx*sy AS DOUBLE)
                       * CAST(n*sxy - sx*sy AS DOUBLE))
                      / (CAST(n*sxx - sx*sx AS DOUBLE)
                         * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2
         FROM m ORDER BY event_type"""),

    "e21_autocorrelation" -> api(
      (s, dir) => {
        // moment products are events²-scale, so they go through
        // DECIMAL(38,0) (exact — the §2 sum-overflow discipline); the
        // DuckDB oracle's HUGEINT arithmetic is exact the same way, and
        // both cast the identical integer to double before the chain
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val d = dailyCounts(s, dir)
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        val l = d.select(col("x"),
          lag(col("x"), 1).over(w).as("x1"),
          lag(col("x"), 7).over(w).as("x7"))
        // widen BEFORE multiplying: a LONG product wraps above ~3e9
        // events/day and the decimal cast can't undo that — decimal
        // operands make the multiply itself exact (d38×d38 stays 38,0)
        def ac(xl: String, k: Int) = {
          val xd = col("x").cast(d38); val yd = col(xl).cast(d38)
          l.filter(col(xl).isNotNull)
          .agg(count(lit(1)).cast(d38).as("n"),
            sum(xd).as("sx"),
            sum(yd).as("sy"),
            sum(xd * xd).as("sxx"),
            sum(yd * yd).as("syy"),
            sum(xd * yd).as("sxy"))
          .select(lit(k.toLong).as("lag_k"),
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double"))), 6).as("acf"))
        }
        ac("x1", 1).unionByName(ac("x7", 7)).orderBy(col("lag_k"))
      },
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         l AS (SELECT x, lag(x, 1) OVER (ORDER BY day) AS x1,
                      lag(x, 7) OVER (ORDER BY day) AS x7 FROM d),
         m1 AS (SELECT count(*) AS n, sum(x) AS sx, sum(x1) AS sy,
                       sum(x*x) AS sxx, sum(x1*x1) AS syy,
                       sum(x*x1) AS sxy FROM l WHERE x1 IS NOT NULL),
         m7 AS (SELECT count(*) AS n, sum(x) AS sx, sum(x7) AS sy,
                       sum(x*x) AS sxx, sum(x7*x7) AS syy,
                       sum(x*x7) AS sxy FROM l WHERE x7 IS NOT NULL)
         SELECT CAST(1 AS BIGINT) AS lag_k,
                round(CAST(n*sxy - sx*sy AS DOUBLE) /
                      (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
                       sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS acf
         FROM m1
         UNION ALL
         SELECT CAST(7 AS BIGINT),
                round(CAST(n*sxy - sx*sy AS DOUBLE) /
                      (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
                       sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
         FROM m7 ORDER BY lag_k"""),

    // CUSUM changepoint locator over the same daily series: the day t
    // maximizing |S_t| where S_t = Σ_{i<=t}(x_i − x̄) — reported in the
    // integer scaling N·S_t = N·cumsum_t − t·total, which needs NO
    // division and stays EXACT, so the argmax (ties to the earlier day)
    // is bitwise deterministic. Same scale shape as e21: heavy keyed
    // rollup first, O(days) window after.
    "e22_cusum_changepoint" -> api(
      (s, dir) => {
        val d = dailyCounts(s, dir)
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        val c = d.select(col("day"),
          row_number().over(w).cast("long").as("t_idx"),
          sum(col("x")).over(w).as("cum"))
        val tot = d.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        c.join(broadcast(tot))
          .select(col("day").as("changepoint_day"),
            abs(col("n") * col("cum") - col("t_idx") * col("sx"))
              .as("cusum_scaled"))
          .orderBy(col("cusum_scaled").desc, col("changepoint_day"))
          .limit(1)
      },
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         t AS (SELECT count(*) AS n, sum(x) AS sx FROM d),
         c AS (SELECT day,
                  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t_idx,
                  sum(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS cum
           FROM d)
         SELECT c.day AS changepoint_day,
                CAST(abs(t.n * c.cum - c.t_idx * t.sx) AS BIGINT)
                  AS cusum_scaled
         FROM c CROSS JOIN t
         ORDER BY cusum_scaled DESC, changepoint_day LIMIT 1"""),

    // Theil–Sen robust trend slope (Theil 1950 / Sen 1968): the median
    // of all pairwise slopes of the daily series — outlier-days cannot
    // drag it the way least squares is dragged. The O(days²) pair set
    // exists only AFTER the keyed rollup bounds the series, and it is
    // generated map-side from ONE sorted array via nested transform()
    // HOFs — no self-join, no cartesian anywhere in the plan. Slope
    // division and the even-count median midpoint are single
    // correctly-rounded IEEE ops, identical in both engines.
    "e23_theil_sen" -> api(
      (s, dir) => {
        val d = dailyCounts(s, dir)
          .select(col("day"), col("x").cast("double").as("x"))
        val arr = d.agg(sort_array(collect_list(
          struct(col("day"), col("x")))).as("a"))
        arr.select(explode(flatten(expr(
            """transform(a, (ai, i) ->
                 transform(slice(a, i + 2, size(a)), aj ->
                   (aj.x - ai.x) / CAST(aj.day - ai.day AS DOUBLE)))""")))
            .as("slope"))
          .agg(expr("percentile(slope, 0.5D)").as("theil_sen_slope"),
            count(lit(1)).as("n_pairs"))
      },
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS DOUBLE) AS x
           FROM events GROUP BY 1),
         p AS (SELECT (b.x - a.x) / CAST(b.day - a.day AS DOUBLE) AS slope
           FROM d a JOIN d b ON b.day > a.day)
         SELECT median(slope) AS theil_sen_slope,
                count(*) AS n_pairs FROM p"""),

    // two-proportion A/B z-test on purchase conversion (the experiment
    // readout): arms by user-id parity, per-arm distinct users and
    // converters from ONE user-keyed rollup, then the pooled-variance
    // z statistic as a mirrored correctly-rounded chain over the exact
    // integer counts. O(users) shuffle, O(1) output.
    // Welch's unequal-variance t-test on event values between the two
    // user-id A/B buckets (e26) — the means complement to e25's
    // two-proportion z. Exactness discipline: values become 1e6
    // fixed-point longs, moment sums widen to Decimal(38,0) BEFORE the
    // square (v*v reaches 1e18 per row — a long sum would wrap), then
    // t and the Welch–Satterthwaite dof derive through ONE mirrored
    // double chain (fp units cancel in t). Single aggregation pass,
    // one output row.
    "e26_welch_ttest" -> api(
      (s, dir) => {
        val ev = graft.streaming.Events.readRaw(s, dir)
          .filter(col("value").isNotNull)
          .select(coalesce(col("user_id") % 2 === 0, lit(false)).as("g"),
            round(col("value") * 1e6).cast("decimal(38,0)").as("v"))
        val one = ev.agg(
          sum(when(col("g"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("g"), 1L).otherwise(0L)).as("n_b"),
          sum(when(col("g"), col("v"))).as("s1a"),
          sum(when(!col("g"), col("v"))).as("s1b"),
          sum(when(col("g"), col("v") * col("v"))).as("s2a"),
          sum(when(!col("g"), col("v") * col("v"))).as("s2b"))
        def d(c: Column): Column = c.cast("double")
        val (na, nb) = (d(col("n_a")), d(col("n_b")))
        val va = (d(col("s2a")) - d(col("s1a")) * d(col("s1a")) / na) /
          (na - 1)
        val vb = (d(col("s2b")) - d(col("s1b")) * d(col("s1b")) / nb) /
          (nb - 1)
        val sea = va / na
        val seb = vb / nb
        val se = sea + seb
        val t = (d(col("s1a")) / na - d(col("s1b")) / nb) / sqrt(se)
        val dof = se * se / (sea * sea / (na - 1) + seb * seb / (nb - 1))
        one.select(col("n_a"), col("n_b"),
          round(d(col("s1a")) / na / 1e6, 6).as("mean_a"),
          round(d(col("s1b")) / nb / 1e6, 6).as("mean_b"),
          round(t, 6).as("t_stat"), round(dof, 6).as("dof"))
      },
      """WITH e AS (SELECT coalesce(user_id % 2 = 0, false) AS g,
                           CAST(round(value * 1e6) AS HUGEINT) AS v
                    FROM events WHERE value IS NOT NULL),
         a AS (SELECT
                 CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS DOUBLE) AS na,
                 CAST(sum(CASE WHEN NOT g THEN 1 ELSE 0 END) AS DOUBLE)
                   AS nb,
                 CAST(sum(CASE WHEN g THEN v END) AS DOUBLE) AS s1a,
                 CAST(sum(CASE WHEN NOT g THEN v END) AS DOUBLE) AS s1b,
                 CAST(sum(CASE WHEN g THEN v*v END) AS DOUBLE) AS s2a,
                 CAST(sum(CASE WHEN NOT g THEN v*v END) AS DOUBLE) AS s2b
               FROM e),
         -- one mirrored chain: va=(S2-S1*S1/n)/(n-1), se_i=va_i/n_i
         a2 AS (SELECT na, nb, s1a, s1b,
                       (s2a - s1a * s1a / na) / (na - 1) / na AS sea,
                       (s2b - s1b * s1b / nb) / (nb - 1) / nb AS seb
                FROM a)
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                round(s1a / na / 1e6, 6) AS mean_a,
                round(s1b / nb / 1e6, 6) AS mean_b,
                round((s1a / na - s1b / nb) / sqrt(sea + seb), 6)
                  AS t_stat,
                round((sea + seb) * (sea + seb)
                      / (sea * sea / (na - 1) + seb * seb / (nb - 1)), 6)
                  AS dof
         FROM a2"""),

    "e25_ab_test" -> api(
      (s, dir) => {
        val E = graft.streaming.Events
        val users = E.readRaw(s, dir)
          .groupBy(col("user_id"))
          // "purchase over 100" keeps conversion mid-range (~80%) —
          // a bare any-purchase predicate saturates at 100% in this
          // corpus and the pooled variance (and z) degenerates to 0/0
          .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 100, 1L).otherwise(0L)).as("conv"))
          // coalesce mirrors the oracle's CASE: a null user_id falls
          // into the ELSE arm (B) there, so it must be isA = false here
          .select(coalesce(col("user_id") % 2 === 0, lit(false)).as("isA"),
            col("conv"))
        val stats = users.agg(
          sum(when(col("isA"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("isA"), col("conv")).otherwise(0L)).as("c1"),
          sum(when(!col("isA"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("isA"), col("conv")).otherwise(0L)).as("c2"))
        val p1 = col("c1").cast("double") / col("n1")
        val p2 = col("c2").cast("double") / col("n2")
        val pp = (col("c1") + col("c2")).cast("double") /
          (col("n1") + col("n2"))
        stats.select(col("n1"), col("c1"), col("n2"), col("c2"),
          (p1 - p2).as("lift"),
          ((p1 - p2) / sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n1") + lit(1.0) / col("n2")))).as("z"))
      },
      """WITH u AS (SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' AND value > 100
                           THEN 1 ELSE 0 END) AS conv
           FROM events GROUP BY user_id),
         s AS (SELECT
                  sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n1,
                  sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS c1,
                  sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS n2,
                  sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE conv END) AS c2
           FROM u)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
                CAST(n2 AS BIGINT) AS n2, CAST(c2 AS BIGINT) AS c2,
                CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2 AS lift,
                (CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
                  / sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                         * (CAST(1 AS DOUBLE)
                            - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                         * (CAST(1 AS DOUBLE) / n1
                            + CAST(1 AS DOUBLE) / n2)) AS z
         FROM s"""),

    // Mann–Kendall trend test (Mann 1945 / Kendall 1975 — e23's
    // standard companion: MK decides IF there is a monotone trend,
    // Theil–Sen estimates its slope): S = Σ_{i<j} sign(x_j − x_i) over
    // the daily series, a PURE-INTEGER statistic with the tie-corrected
    // variance n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over 18. Same join-free
    // array-HOF pair generation as e23; the only floats are two final
    // mirrored divisions.
    "e24_mann_kendall" -> api(
      (s, dir) => {
        val d = dailyCounts(s, dir)
        val arr = d.agg(sort_array(collect_list(
          struct(col("day"), col("x")))).as("a"))
        val sAgg = arr.select(explode(flatten(expr(
            """transform(a, (ai, i) ->
                 transform(slice(a, i + 2, size(a)), aj ->
                   CASE WHEN aj.x > ai.x THEN 1
                        WHEN aj.x < ai.x THEN -1 ELSE 0 END))""")))
            .as("sgn"))
          .agg(coalesce(sum(col("sgn")), lit(0L)).as("s_stat"))
        val nD = d.agg(count(lit(1)).as("n_days"))
        val ties = d.groupBy(col("x")).agg(count(lit(1)).as("t"))
          .filter(col("t") > 1)
          .agg(coalesce(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)),
            lit(0L)).as("tsum"))
        sAgg.join(broadcast(nD)).join(broadcast(ties))
          .select(col("s_stat"), col("n_days"),
            ((col("n_days") * (col("n_days") - 1) * (lit(2L) * col("n_days") + 5)
              - col("tsum")).cast("double") / lit(18.0)).as("var_s"),
            ((lit(2L) * col("s_stat")).cast("double") /
              (col("n_days") * (col("n_days") - 1)).cast("double"))
              .as("tau_a"))
      },
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         p AS (SELECT CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
           FROM d a JOIN d b ON b.day > a.day),
         s AS (SELECT CAST(coalesce(sum(sgn), 0) AS BIGINT) AS s_stat FROM p),
         n AS (SELECT count(*) AS n_days FROM d),
         t AS (SELECT CAST(coalesce(sum(t*(t-1)*(t*2+5)), 0) AS BIGINT) AS tsum
           FROM (SELECT count(*) AS t FROM d GROUP BY x) q WHERE q.t > 1)
         SELECT s.s_stat, n.n_days,
                CAST(n.n_days*(n.n_days-1)*(2*n.n_days+5) - t.tsum AS DOUBLE)
                  / 18.0 AS var_s,
                CAST(2*s.s_stat AS DOUBLE)
                  / CAST(n.n_days*(n.n_days-1) AS DOUBLE) AS tau_a
         FROM s CROSS JOIN n CROSS JOIN t"""),

    // Day-of-week × hour activity heatmap — the seasonality card every
    // events dashboard opens with. Pure integer epoch arithmetic on the
    // canonical micros (dow 0 = Monday via the +3 epoch offset;
    // 1970-01-01 was a Thursday), one map-side-combined rollup over a
    // 7×24-key space — hot keys are impossible by construction.
    "e17_dow_hour" -> api(
      (s, dir) => {
        val E = graft.streaming.Events
        E.readRaw(s, dir)
          .select(
            expr(s"((ts div ${E.MicrosPerDay}) + 3) % 7").as("dow"),
            expr(s"(ts div ${E.MicrosPerHour}) % 24").as("hour"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy(col("dow"), col("hour"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
          .orderBy(col("dow"), col("hour"))
      },
      """SELECT ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
                (epoch_us(ts) // 3600000000) % 24 AS hour,
                count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc
         FROM events GROUP BY 1, 2 ORDER BY dow, hour"""),

    // Inactivity churn flags: days since each user's last event vs the
    // corpus horizon, churned = quiet ≥ 7 days — the simplest retention
    // gate a growth dashboard runs daily. One keyed max + a one-row
    // broadcast horizon; integer day arithmetic end to end.
    "e18_churn" -> api(
      (s, dir) => {
        val E = graft.streaming.Events
        val u = E.readRaw(s, dir)
          .select(col("user_id"), expr(s"ts div ${E.MicrosPerDay}").as("day"))
          .groupBy(col("user_id")).agg(max(col("day")).as("last_day"))
        val h = u.agg(max(col("last_day")).as("__today"))
        u.join(broadcast(h))
          .select(col("user_id"), col("last_day"),
            (col("__today") - col("last_day")).as("days_inactive"),
            (col("__today") - col("last_day") >= 7).as("churned"))
          .orderBy(col("user_id"))
      },
      """WITH u AS (SELECT user_id,
                  max(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS last_day
           FROM events GROUP BY 1),
         h AS (SELECT max(last_day) AS today FROM u)
         SELECT user_id, last_day, (h.today - last_day) AS days_inactive,
                (h.today - last_day) >= 7 AS churned
         FROM u, h ORDER BY user_id"""),

    "e10_rolling_active" -> api(
      (s, dir) => {
        val MpD = graft.streaming.Events.MicrosPerDay
        val du = graft.streaming.Events.readRaw(s, dir)
          .select(expr(s"ts div $MpD").as("day"), col("user_id"))
          .distinct()
        val span = du.agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
        val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
        val wau = du
          .select(explode(sequence(col("day"),
            col("day") + 6)).as("day"), col("user_id"))
          .groupBy(col("day"))
          .agg(count_distinct(col("user_id")).as("wau"))
        dau.join(wau, Seq("day"))
          .join(broadcast(span),
            col("day") >= col("__lo") && col("day") <= col("__hi"))
          .select(col("day"), col("dau"), col("wau"),
            round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
          .orderBy(col("day"))
      },
      """WITH du AS (SELECT DISTINCT
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  user_id FROM events),
         span AS (SELECT min(day) AS lo, max(day) AS hi FROM du),
         dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
         ex AS (SELECT d.day + u.g AS day, d.user_id
                 FROM du d CROSS JOIN
                      (SELECT unnest(generate_series(0, 6)) AS g) u),
         w AS (SELECT day, count(DISTINCT user_id) AS wau FROM ex GROUP BY 1)
         SELECT dau.day, dau.dau, w.wau,
                round(CAST(dau.dau AS DOUBLE) / w.wau, 6) AS stickiness
         FROM dau JOIN w USING (day) JOIN span ON day BETWEEN lo AND hi
         ORDER BY day"""),

    // Funnel TIME-TO-CONVERT: per 30-min-gap session, micros from the
    // first 'view' to the first qualifying 'click' AT-OR-AFTER it (the
    // sessionFunnel running-min staging), rolled into the latency card —
    // conversions, exact median / p90 / max seconds. All session math
    // rides ONE user-keyed shuffle (e04's discipline); deltas stay
    // integer micros until the final exact-percentile interpolation,
    // rounded to 6.
    // Fixed-point EWMA per user (alpha = 1/2 in integer cents:
    // s_i = (v_i + s_{i-1}) div 2) — a GENUINELY sequential recurrence:
    // the integer floor at every step makes it inexpressible as any
    // window aggregate (no closed form survives the per-step
    // truncation), so this is the one place the last-resort tier is
    // justified: typed groupByKey + flatMapGroups, O(1) state
    // per key, one shuffle on user_id, per-group sort bounded by the
    // max events-per-user (99 at sf0.1). Values are non-negative so
    // Scala's truncating / and the oracle's flooring // agree. The
    // recursive-CTE oracle replays the identical integer recurrence.
    // RFM segmentation (recency / frequency / monetary quartiles) — the
    // classic behavioral-cohort card. One keyed rollup to per-user
    // (r, f, m), then three ntile(4) ranks with explicit user_id
    // tiebreaks so both engines bucket identically. The ntile windows
    // are GLOBAL but run over the users-sized rollup, never the event
    // volume — at 100 TB you'd swap them for approx-quantile cutpoints
    // computed in one pass; the segment arithmetic is unchanged.
    "e16_rfm" -> api(
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        rfmRollup(s, dir)
          .withColumn("rq", ntile(4).over(W.orderBy(col("r"), col("user_id"))))
          .withColumn("fq", ntile(4).over(W.orderBy(col("f").desc, col("user_id"))))
          .withColumn("mq", ntile(4).over(W.orderBy(col("m").desc, col("user_id"))))
          .select(col("user_id"), col("r"), col("f"), col("m"),
            (col("rq") * 100 + col("fq") * 10 + col("mq")).cast("long").as("rfm"))
          .orderBy(col("user_id"))
      },
      """WITH u AS (SELECT user_id,
                  max(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS last_day,
                  count(*) AS f,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
           FROM events GROUP BY 1),
         g AS (SELECT max(last_day) AS today FROM u),
         q AS (SELECT user_id, (g.today - last_day) AS r, f, m FROM u, g)
         SELECT user_id, r, f, m,
                CAST(ntile(4) OVER (ORDER BY r, user_id) * 100
                   + ntile(4) OVER (ORDER BY f DESC, user_id) * 10
                   + ntile(4) OVER (ORDER BY m DESC, user_id) AS BIGINT) AS rfm
         FROM q ORDER BY user_id"""),

    // RFM by QUANTILE CUTPOINTS — e16's scale path: instead of three
    // global ntile windows (a one-partition sort of all users), ONE
    // aggregation computes the three quartile cutpoints per dimension,
    // broadcast-joins them back, and bucketing is a map-only comparison.
    // Exact `percentile` here so DuckDB's quantile_cont strict-matches
    // (linear interpolation on both engines, integer-valued inputs); at
    // 100 TB swap in approx_percentile — SAME plan shape. RfmCutpointSpec
    // certifies the approx variant against this exact one at sf0.1
    // (>=99% bucket agreement + identical no-window/broadcast plan), and
    // PlanSpec pins this path as window-free with one broadcast join.
    "e20_rfm_cutpoints" -> api(
      (s, dir) => {
        val q = rfmRollup(s, dir)
        val cut = q.agg(
          expr("percentile(r, array(0.25, 0.5, 0.75))").as("rc"),
          expr("percentile(f, array(0.25, 0.5, 0.75))").as("fc"),
          expr("percentile(m, array(0.25, 0.5, 0.75))").as("mc"))
        def ascB(v: String, c: String): Column =
          lit(1) + when(col(v) > col(c)(0), 1).otherwise(0) +
            when(col(v) > col(c)(1), 1).otherwise(0) +
            when(col(v) > col(c)(2), 1).otherwise(0)
        def descB(v: String, c: String): Column =
          lit(1) + when(col(v) < col(c)(2), 1).otherwise(0) +
            when(col(v) < col(c)(1), 1).otherwise(0) +
            when(col(v) < col(c)(0), 1).otherwise(0)
        q.join(broadcast(cut))
          .select(col("user_id"), col("r"), col("f"), col("m"),
            (ascB("r", "rc") * 100 + descB("f", "fc") * 10 + descB("m", "mc"))
              .cast("long").as("rfm"))
          .orderBy(col("user_id"))
      },
      """WITH u AS (SELECT user_id,
                  max(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS last_day,
                  count(*) AS f,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
           FROM events GROUP BY 1),
         g AS (SELECT max(last_day) AS today FROM u),
         q AS (SELECT user_id, (g.today - last_day) AS r, f, m FROM u, g),
         c AS (SELECT quantile_cont(r, [0.25, 0.5, 0.75]) AS rc,
                      quantile_cont(f, [0.25, 0.5, 0.75]) AS fc,
                      quantile_cont(m, [0.25, 0.5, 0.75]) AS mc FROM q)
         SELECT user_id, r, f, m,
                CAST((1 + CASE WHEN r > rc[1] THEN 1 ELSE 0 END
                        + CASE WHEN r > rc[2] THEN 1 ELSE 0 END
                        + CASE WHEN r > rc[3] THEN 1 ELSE 0 END) * 100
                   + (1 + CASE WHEN f < fc[3] THEN 1 ELSE 0 END
                        + CASE WHEN f < fc[2] THEN 1 ELSE 0 END
                        + CASE WHEN f < fc[1] THEN 1 ELSE 0 END) * 10
                   + (1 + CASE WHEN m < mc[3] THEN 1 ELSE 0 END
                        + CASE WHEN m < mc[2] THEN 1 ELSE 0 END
                        + CASE WHEN m < mc[1] THEN 1 ELSE 0 END)
                  AS BIGINT) AS rfm
         FROM q, c ORDER BY user_id"""),

    // Linear-interpolation gap fill over the same 15-min per-user grid
    // as e07: missing bins get the straight line between neighbors
    // (leading/trailing gaps clamp to the nearest observation). The
    // interpolation is a fixed-order double expression rounded to 6, so
    // Spark and DuckDB agree bitwise. Same scale shape as e07 — keyed
    // binning, per-key grid, two windows on one exchange.
    "e15_interpolate" -> api(
      (s, dir) => {
        val ev = graft.streaming.Events.readRaw(s, dir)
          .filter(col("user_id") < 20)
          .withColumn("cents", round(col("value") * 100).cast("long"))
        graft.ops.Resample.binInterpolate(ev, "user_id", "ts", "cents",
            binWidth = 900L * graft.streaming.Events.MicrosPerSecond)
          .orderBy(col("user_id"), col("bin"))
      },
      """WITH b AS (SELECT user_id,
                  CAST(floor(epoch(ts) / 900) AS BIGINT) AS bin,
                  count(*) AS n,
                  sum(CAST(round(value * 100) AS BIGINT)) AS c
           FROM events WHERE user_id < 20 GROUP BY 1, 2),
         bounds AS (SELECT user_id, min(bin) AS lo, max(bin) AS hi
                    FROM b GROUP BY 1),
         grid AS (SELECT user_id, u.g AS bin
                  FROM bounds, unnest(generate_series(lo, hi)) AS u(g)),
         j AS (SELECT g.user_id, g.bin, b.n, b.c
               FROM grid g LEFT JOIN b USING (user_id, bin)),
         w AS (SELECT user_id, bin, n,
                 CAST(c AS DOUBLE) AS v,
                 CAST(last_value(c IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS pv,
                 last_value(CASE WHEN c IS NOT NULL THEN bin END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY bin
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
                 CAST(first_value(c IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bin
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS nv,
                 first_value(CASE WHEN c IS NOT NULL THEN bin END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY bin
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
               FROM j)
         SELECT user_id, bin, coalesce(n, 0) AS n,
                round(CASE WHEN v IS NOT NULL THEN v
                           WHEN pb IS NULL THEN nv
                           WHEN nb IS NULL THEN pv
                           ELSE pv + (nv - pv) * CAST(bin - pb AS DOUBLE)
                                / CAST(nb - pb AS DOUBLE) END, 6) AS cents_li
         FROM w ORDER BY user_id, bin"""),

    "e14_ewma" -> api(
      (s, dir) => {
        import s.implicits._
        graft.streaming.Events.readRaw(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            round(col("value") * 100).cast("long").as("v"))
          .as[(Long, Long, Long, Long)]
          .groupByKey(_._1)
          .flatMapGroups { (u: Long, it: Iterator[(Long, Long, Long, Long)]) =>
            val rows = it.toArray.sortBy(t => (t._2, t._3))
            var acc = 0L
            var first = true
            rows.iterator.map { case (_, _, eid, v) =>
              acc = if (first) { first = false; v } else (v + acc) / 2
              (u, eid, acc)
            }
          }
          .toDF("user_id", "event_id", "ewma_cents")
          .orderBy(col("user_id"), col("event_id"))
      },
      """WITH RECURSIVE ev AS (
           SELECT user_id, event_id,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  CAST(round(value * 100) AS BIGINT) AS v
           FROM events),
         w(user_id, event_id, rn, ewma) AS (
           SELECT user_id, event_id, rn, v FROM ev WHERE rn = 1
           UNION ALL
           SELECT e.user_id, e.event_id, e.rn, (e.v + w.ewma) // 2
           FROM w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1)
         SELECT user_id, event_id, ewma AS ewma_cents
         FROM w ORDER BY user_id, event_id"""),

    // Event-type Markov transition matrix: per (prev -> cur) pair the
    // observed count and the row-normalized transition probability —
    // the session-behavior fingerprint drift monitors and bot detectors
    // key on. One user-keyed shuffle for the lag; the normalizing
    // window runs over the k^2-sized transition rollup, not the event
    // volume. Lag order (ts, event_id) is a total order, so both
    // engines pick identical predecessors.
    "e13_markov_transitions" -> api(
      (s, dir) => {
        val ev = graft.streaming.Events.read(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        ev.withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("cur"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p", round(col("n") /
            sum(col("n")).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("prev"))), 6))
          .orderBy(col("prev"), col("cur"))
      },
      """WITH tr AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev,
                     event_type AS cur FROM events),
         c AS (SELECT prev, cur, count(*) AS n FROM tr
               WHERE prev IS NOT NULL GROUP BY prev, cur)
         SELECT prev, cur, n,
                round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev),
                      6) AS p
         FROM c ORDER BY prev, cur"""),

    // Kaplan-Meier survival of view→purchase conversion WITH CENSORING —
    // what e12's converters-only latency stats cannot say: users who
    // never purchase are censored at their last activity instead of
    // silently dropped, so the curve is unbiased. Discrete day grid
    // t = 1..14; at-risk counts and event counts are exact integers and
    // the survival curve is carried as the cumulative 1e6 fixed-point
    // sum of ln(1 - d/r) increments (the t09 float discipline; the
    // d = r edge is floored at 1e-9 on both engines). One pass to the
    // per-user study frame, rolled up to (dur, cens) counts BEFORE the
    // 14-row grid fan-out, so the nested-loop input is the rollup (a few
    // hundred rows), never the user population.
    "e19_survival_km" -> api(
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val E = graft.streaming.Events
        val ev = E.readRaw(s, dir).select(col("user_id"), col("event_type"),
          expr(s"ts div ${E.MicrosPerDay}").as("day"))
        val per = ev.groupBy(col("user_id")).agg(
            min(when(col("event_type") === "view", col("day"))).as("v"),
            max(col("day")).as("last"))
          .filter(col("v").isNotNull)
        val conv = ev.filter(col("event_type") === "purchase")
          .join(per, "user_id").filter(col("day") >= col("v"))
          .groupBy(col("user_id")).agg(min(col("day")).as("p"))
        val study = per.join(conv, Seq("user_id"), "left")
          .select(
            when(col("p").isNotNull, col("p") - col("v") + 1).as("dur"),
            greatest(col("last") - col("v") + 1, lit(1L)).as("cens"))
        // rollup-before-grid: aggregate the users-sized study frame to
        // (dur, cens) counts FIRST, so the 14-row grid fans out over at
        // most |distinct durations × censoring days| rows (a few hundred)
        // instead of every user. d and r are integer sums of cnt-weighted
        // indicators — order-free, bitwise identical to the per-user form.
        val rollup = study.groupBy(col("dur"), col("cens"))
          .agg(count(lit(1)).as("cnt"))
        val grid = s.range(1, 15).select(col("id").as("t"))
        grid.crossJoin(rollup).groupBy(col("t")).agg(
            sum(when(col("dur") === col("t"), col("cnt")).otherwise(0L)).as("d"),
            sum(when((col("dur").isNotNull && col("dur") >= col("t")) ||
              (col("dur").isNull && col("cens") >= col("t")), col("cnt"))
              .otherwise(0L)).as("r"))
          .withColumn("fp", when(col("r") > 0,
            round(log(greatest(lit(1.0)
              - (col("d").cast("double") / col("r").cast("double")),
              lit(1e-9))) * 1e6).cast("long")).otherwise(lit(0L)))
          .withColumn("surv_fp", sum(col("fp")).over(
            W.orderBy(col("t")).rowsBetween(W.unboundedPreceding, 0)))
          .select(col("t"), col("d"), col("r"), col("surv_fp"))
          .orderBy(col("t"))
      },
      """WITH ev AS (SELECT user_id, event_type,
                            epoch_us(ts) // 86400000000 AS day FROM events),
         per AS (SELECT user_id,
                        min(CASE WHEN event_type = 'view' THEN day END) AS v,
                        max(day) AS lastd
                 FROM ev GROUP BY user_id),
         perv AS (SELECT * FROM per WHERE v IS NOT NULL),
         conv AS (SELECT e.user_id, min(e.day) AS p
                  FROM ev e JOIN perv USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.day >= perv.v
                  GROUP BY e.user_id),
         study AS (SELECT CASE WHEN c.p IS NOT NULL
                               THEN c.p - perv.v + 1 END AS T,
                          greatest(perv.lastd - perv.v + 1, 1) AS C
                   FROM perv LEFT JOIN conv c USING (user_id)),
         g AS (SELECT t FROM unnest(generate_series(1, 14)) AS u(t)),
         km AS (SELECT g.t,
                  sum(CASE WHEN study.T = g.t THEN 1 ELSE 0 END) AS d,
                  sum(CASE WHEN (study.T IS NOT NULL AND study.T >= g.t)
                             OR (study.T IS NULL AND study.C >= g.t)
                           THEN 1 ELSE 0 END) AS r
                FROM g CROSS JOIN study GROUP BY g.t),
         fp AS (SELECT t, d, r,
                  CASE WHEN r > 0 THEN CAST(round(ln(greatest(1.0
                    - (CAST(d AS DOUBLE) / CAST(r AS DOUBLE)), 1e-9)) * 1e6)
                    AS BIGINT) ELSE 0 END AS fp
                FROM km)
         SELECT CAST(t AS BIGINT) AS t, CAST(d AS BIGINT) AS d,
                CAST(r AS BIGINT) AS r,
                CAST(sum(fp) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS surv_fp
         FROM fp ORDER BY t"""),

    "e12_time_to_convert" -> api(
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val ev = graft.streaming.Events.readRaw(s, dir)
        val w = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val newSession = when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) >
            lit(30L * graft.streaming.Events.MicrosPerMinute), 1).otherwise(0)
        val sessed = ev.withColumn("sid",
          sum(newSession).over(w.rowsBetween(W.unboundedPreceding, 0)))
        val ws = W.partitionBy(col("user_id"), col("sid"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(W.unboundedPreceding, 0)
        val staged = sessed
          .withColumn("__s1", min(when(col("event_type") === "view",
            col("ts"))).over(ws))
        val per = staged.groupBy(col("user_id"), col("sid"))
          .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"),
            min(when(col("event_type") === "click" && col("__s1").isNotNull,
              col("ts"))).as("t2"))
          .filter(col("t1").isNotNull && col("t2").isNotNull)
          .select(((col("t2") - col("t1"))
            / lit(1000000.0)).as("delta_s"))
        per.agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(delta_s, 0.5D)"), 6).as("median_s"),
          round(expr("percentile(delta_s, 0.9D)"), 6).as("p90_s"),
          round(max(col("delta_s")), 6).as("max_s"))
      },
      """WITH x AS (
           SELECT user_id, event_id, ts, event_type,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS ns
           FROM events WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
         y AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
               FROM x),
         z AS (SELECT *, min(CASE WHEN event_type = 'view'
                   THEN epoch_us(ts) END) OVER
                 (PARTITION BY user_id, sid ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS s1
               FROM y),
         per AS (SELECT user_id, sid,
                  min(CASE WHEN event_type = 'view'
                      THEN epoch_us(ts) END) AS t1,
                  min(CASE WHEN event_type = 'click' AND s1 IS NOT NULL
                      THEN epoch_us(ts) END) AS t2
                 FROM z GROUP BY user_id, sid),
         d AS (SELECT (t2 - t1) / 1000000.0 AS delta_s FROM per
               WHERE t1 IS NOT NULL AND t2 IS NOT NULL)
         SELECT count(*) AS n_converted,
                round(quantile_cont(delta_s, 0.5), 6) AS median_s,
                round(quantile_cont(delta_s, 0.9), 6) AS p90_s,
                round(max(delta_s), 6) AS max_s
         FROM d""")

    ,

    // Event-rate anomaly detection: flag hours whose count deviates
    // >= 3 robust-z from the trailing-24-hour mean, per event type — the
    // ingestion-spike monitor. The z-test is evaluated in INTEGER
    // algebra — (24n−s)²·23 >= 9·24·(24q−s²) over window sums of counts
    // — so the strict hash cannot be burned by stddev float accumulation
    // order. Event volume collapses to the hourly rollup in one shuffle;
    // the windows ride the #hours relation.
    "e11_rate_anomaly" -> api(
      (s, dir) => {
        val MpH = graft.streaming.Events.MicrosPerHour
        val hourly = graft.streaming.Events.readRaw(s, dir)
          .select((col("ts") - col("ts") % MpH).as("h"), col("event_type"))
          .groupBy(col("h"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val fr = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(-24, -1)
        val scored = hourly
          .withColumn("w", count(col("n")).over(fr))
          .withColumn("s", sum(col("n")).over(fr))
          .withColumn("q", sum(col("n") * col("n")).over(fr))
        val eligible = col("w") === 24
        val flagged = eligible &&
          (lit(24) * col("n") - col("s")) * (lit(24) * col("n") - col("s")) * 23 >=
          lit(9) * 24 * (lit(24) * col("q") - col("s") * col("s"))
        scored.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            sum(eligible.cast("long")).as("n_eligible"),
            sum(flagged.cast("long")).as("n_flagged"))
          .orderBy(col("event_type"))
      },
      """WITH hourly AS (
           SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
           FROM events GROUP BY 1, 2),
         sc AS (SELECT event_type, n,
                  count(n) OVER fr AS w, sum(n) OVER fr AS s,
                  sum(n * n) OVER fr AS q
                FROM hourly
                WINDOW fr AS (PARTITION BY event_type ORDER BY h
                              ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         SELECT event_type, count(*) AS n_hours,
                CAST(sum(CASE WHEN w = 24 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_eligible,
                CAST(sum(CASE WHEN w = 24 AND
                       (24*n - s) * (24*n - s) * 23 >= 9 * 24 * (24*q - s*s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         FROM sc GROUP BY event_type ORDER BY event_type"""),

    // INTERVAL arithmetic — month-end clamping (Jan 31 + 1 month =
    // Feb 29), day offsets, and week/quarter truncation; same text in
    // both engines once results are cast to DATE (Spark keeps DATE,
    // DuckDB widens to TIMESTAMP).
    "q33_interval_arith" -> multi(Seq("orders"),
      """SELECT o_orderkey,
                CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
                  AS plus_month,
                CAST(CAST(o_orderdate AS DATE) - INTERVAL 90 DAY AS DATE)
                  AS minus_90d,
                CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE)
                  AS week_start,
                CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
                  AS quarter_start
         FROM orders ORDER BY o_orderkey"""),

    // Streaming CDC materialization over a genuinely MULTI-batch replay:
    // the corpus is split into three range-partitioned files and admitted
    // one per micro-batch (maxFilesPerTrigger=1), foreachBatch folds each
    // batch into the running snapshot with Cdc.upsert (version = ts,
    // unique per user at every SF — probed), and the final snapshot is
    // aggregated. Last-writer-wins is ORDER-INDEPENDENT, so the batch
    // admission order cannot change the result — which is exactly what
    // lets a batch oracle (argmax per user over the whole corpus) gate a
    // multi-batch incremental pipeline.
    // Watermark-BOUNDED streaming dedup (dropDuplicatesWithinWatermark):
    // the feed carries ~1/7 redelivered events (same event_id, ts
    // shifted +5 min — the at-least-once delivery shape), range-split
    // into three files and admitted one per micro-batch, so
    // redeliveries cross batch boundaries and must be dropped from
    // keyed STATE, not in-batch. Unlike plain dropDuplicates, state
    // here is evicted once the watermark passes an id's ts + delay —
    // the production answer to unbounded-stream dedup memory. Output
    // (per type: unique count, exact-decimal value sum, feed volume,
    // dup drops) is keep-first/keep-any independent because a
    // redelivery differs only in ts, so the batch oracle gates it
    // exactly.
    "st13_stream_dedup_watermark" -> api(
      (outer, dir) => {
        val s = outer.newSession()   // state partitions sized to key count
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val feed = scratchDir("st13_feed")
        val ev = graft.streaming.Events.readRaw(s, dir)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        val redelivered = ev.filter(col("event_id") % 7 === 0)
          .withColumn("ts", col("ts") +
            lit(5L * graft.streaming.Events.MicrosPerMinute))
        ev.unionByName(redelivered)
          .repartitionByRange(3, col("ts"))
          .write.mode("overwrite").parquet(feed)
        val schema = "event_id LONG, ts LONG, event_type STRING, value DOUBLE"
        val sink = "st13_sink_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(feed)
          .withColumn("tst", expr("timestamp_micros(ts)"))
          // delay must cover the feed's max DISORDER: file admission
          // order is not ts-ascending (mtime ties break arbitrarily),
          // so a whole later-range file can arrive first and a short
          // delay would late-drop the earlier ranges wholesale. The
          // replay's disorder bound is the corpus span (31 days); a
          // live in-order stream would use minutes here.
          .withWatermark("tst", "31 days")
          .dropDuplicatesWithinWatermark("event_id")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_unique"),
            expr("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")
              .as("sv"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        val feedCounts = s.read.schema(schema).parquet(feed)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n_feed"))
        s.table(sink).join(feedCounts, Seq("event_type"))
          .select(col("event_type"), col("n_unique"), col("sv"),
            col("n_feed"), (col("n_feed") - col("n_unique")).as("dup_dropped"))
          .orderBy(col("event_type"))
      },
      """WITH f AS (SELECT event_type, count(*) AS n_feed FROM
             (SELECT event_type FROM events
              UNION ALL
              SELECT event_type FROM events WHERE event_id % 7 = 0) u
           GROUP BY event_type),
         o AS (SELECT event_type, count(*) AS n_unique,
                      CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                        AS sv
               FROM events GROUP BY event_type)
         SELECT o.event_type, n_unique, sv, n_feed,
                n_feed - n_unique AS dup_dropped
         FROM o JOIN f ON f.event_type = o.event_type
         ORDER BY o.event_type"""),

    "st11_stream_cdc_upsert" -> api(
      (outer, dir) => {
        val s = outer.newSession()   // state partitions sized to key count
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val feed = scratchDir("st11_feed")
        graft.streaming.Events.readRaw(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"), col("value"))
          .repartitionByRange(3, col("ts"))
          .write.mode("overwrite").parquet(feed)
        val schema = "user_id LONG, ts LONG, event_type STRING, value DOUBLE"
        var target = s.read.schema(schema).parquet(feed).where(lit(false))
          .localCheckpoint(true)
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(feed)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            target = graft.ops.Cdc.upsert(target, batch,
              Seq("user_id"), "ts").localCheckpoint(true)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        target.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"),
            round(sum(col("value")), 6).as("sv"))
          .orderBy(col("event_type"))
      },
      """WITH latest AS (
           SELECT *, row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC) AS rn
           FROM events)
         SELECT event_type, count(*) AS n_users, round(sum(value), 6) AS sv
         FROM latest WHERE rn = 1
         GROUP BY event_type ORDER BY event_type""")

    ,

    // Streaming MATERIALIZED-VIEW maintenance: st11's multi-batch replay
    // but the per-type rollup is maintained INCREMENTALLY with
    // Cdc.maintainCountSum — each micro-batch adjusts the rollup by its
    // own delta algebra (work ∝ |batch|), it is never recomputed from
    // the snapshot. The snapshot still folds along (the subtraction side
    // needs pre-batch state), exactly how a warehouse keeps view + base
    // in lockstep. ts is unique per user (st11's probed invariant), so
    // LWW is admission-order independent and a batch oracle (argmax per
    // user over the whole corpus, then rollup) gates the incremental
    // path end to end — including that incremental == recompute.
    "st12_stream_view_maintenance" -> api(
      (outer, dir) => {
        val s = outer.newSession()   // state partitions sized to key count
        s.conf.set("spark.sql.shuffle.partitions", 8)
        Registry.registerAll(s)
        val feed = scratchDir("st12_feed")
        graft.streaming.Events.readRaw(s, dir)
          .select(col("user_id").as("k"), col("ts").as("ver"),
            col("event_type").as("g"),
            round(col("value") * 100).cast("long").as("v"))
          .repartitionByRange(3, col("ver"))
          .write.mode("overwrite").parquet(feed)
        val schema = "k LONG, ver LONG, g STRING, v LONG"
        var snap = s.read.schema(schema).parquet(feed).where(lit(false))
          .localCheckpoint(true)
        var view = snap.groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
          .localCheckpoint(true)
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(feed)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            // view first (adjustments subtract against PRE-batch state),
            // then the snapshot folds the same batch
            view = graft.ops.Cdc.maintainCountSum(snap, batch,
              Seq("k"), "ver", "g", "v", view).localCheckpoint(true)
            snap = graft.ops.Cdc.upsert(snap, batch, Seq("k"), "ver")
              .localCheckpoint(true)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        view.orderBy(col("g"))
      },
      """WITH latest AS (
           SELECT *, row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC) AS rn
           FROM events)
         SELECT event_type AS g, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv
         FROM latest WHERE rn = 1
         GROUP BY event_type ORDER BY g""")

    ,

    // NOT IN + NULL three-valued logic — the classic correctness trap:
    // one NULL in the subquery makes NOT IN return zero rows (every
    // comparison is UNKNOWN), while NOT EXISTS and the null-stripped
    // variant behave "intuitively". Same text in both engines; the row
    // proves both implement ANSI 3VL identically.
    // Quantified comparisons (> ALL / < ANY): Spark SQL has no ALL/ANY
    // subquery comparison, so the Spark text uses the equivalent scalar
    // max() reduction — `x > ALL (S)` ⟺ `x > (SELECT max(*) FROM S)` and
    // `x < ANY (S)` ⟺ `x < (SELECT max(*) FROM S)` — while the oracle
    // runs DuckDB's native quantifiers. The equivalences hold because
    // the probe set is non-empty and null-free (o_totalprice is NOT
    // NULL); on an empty S, ALL is vacuously true while the scalar form
    // yields NULL — documented, not exercised. Plan: two one-row
    // broadcast scalar subqueries against a map-only scan.
    "sub07_any_all" -> api(
      (s, dir) => {
        s.read.parquet(s"$dir/orders.parquet")
          .createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderkey,
                    o_totalprice > (SELECT max(o_totalprice) FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
                      AS above_all_urgent,
                    o_totalprice < (SELECT max(o_totalprice) FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
                      AS below_some_urgent
             FROM orders ORDER BY o_orderkey""")
      },
      """SELECT o_orderkey,
                o_totalprice > ALL (SELECT o_totalprice FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
                  AS above_all_urgent,
                o_totalprice < ANY (SELECT o_totalprice FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
                  AS below_some_urgent
         FROM orders ORDER BY o_orderkey"""),

    "sub06_not_in_null" -> multi(Seq("orders", "customer"),
      """WITH probe AS (
           SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
                       ELSE c_custkey END AS k
           FROM customer)
         SELECT
           (SELECT count(*) FROM orders
            WHERE o_custkey IN (SELECT k FROM probe)) AS n_in,
           (SELECT count(*) FROM orders
            WHERE o_custkey NOT IN (SELECT k FROM probe)) AS n_not_in_with_null,
           (SELECT count(*) FROM orders
            WHERE o_custkey NOT IN (SELECT k FROM probe
                                    WHERE k IS NOT NULL)) AS n_not_in_clean,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM probe p
                              WHERE p.k = o.o_custkey)) AS n_not_exists"""),

    // Duplicate survivorship by QUALITY, not min-id: crawl copies of the
    // same page truncated at different lengths share a PREFIX key
    // (md5 of the first 60 chars); within each group keep the LONGEST
    // copy (ties toward the lower id). The corpus has no natural
    // truncation pairs, so every fifth document is planted as an
    // 80-char truncated copy (id + 1000000) — the original must win
    // every planted group (group_size 2), singletons pass through. One
    // prefix-keyed argmax aggregation; the exact-dup min-id policy
    // stays d01's.
    "d15_dedup_best_of" -> api(
      (s, dir) => {
        val base = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        val trunc = base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            substring(col("text"), 1, 80).as("text"))
        val u = base.unionByName(trunc)
          .select(col("doc_id"), length(col("text")).cast("long").as("len"),
            md5(substring(col("text"), 1, 60)).as("__g"))
        u.groupBy(col("__g"))
          .agg(max(struct(col("len"), (-col("doc_id")).as("__nid"))).as("w"),
            count(lit(1)).as("group_size"))
          .select((-col("w.__nid")).as("doc_id"), col("w.len").as("len"),
            col("group_size").cast("long").as("group_size"))
          .orderBy(col("doc_id"))
      },
      """WITH u AS (
           SELECT doc_id, coalesce(text, '') AS text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, substr(coalesce(text, ''), 1, 80)
           FROM documents WHERE doc_id % 5 = 0),
         k AS (SELECT doc_id, length(text) AS len,
                      md5(substr(text, 1, 60)) AS g
               FROM u)
         SELECT doc_id, len, group_size FROM (
           SELECT doc_id, len,
                  count(*) OVER (PARTITION BY g) AS group_size,
                  row_number() OVER (PARTITION BY g
                                     ORDER BY len DESC, doc_id) AS rn
           FROM k) t
         WHERE rn = 1 ORDER BY doc_id"""),

    // Temporal split with an embargo band — train strictly before day
    // 19743, a 2-day quarantine (tagged for dropping, never for either
    // split), eval after. The corpus spans days 19723–19752, so all
    // three bands are non-empty at every SF. Integral day arithmetic
    // (micros DIV), map-only.
    "sp07_temporal_split" -> api(
      (s, dir) => {
        val ev = graft.streaming.Events.readRaw(s, dir)
          .withColumn("day",
            expr(s"ts div ${graft.streaming.Events.MicrosPerDay}"))
        graft.ops.Sampling.temporalSplit(ev, col("day"),
            trainEndDay = 19743L, embargoDays = 2)
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"),
            count_distinct(col("user_id")).as("n_users"),
            min(col("day")).as("min_day"), max(col("day")).as("max_day"))
          .orderBy(col("split"))
      },
      """WITH ev AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                       AS day, user_id FROM events),
         t AS (SELECT day, user_id,
                      CASE WHEN day < 19743 THEN 'train'
                           WHEN day < 19745 THEN 'embargo'
                           ELSE 'eval' END AS split
               FROM ev)
         SELECT split, count(*) AS n,
                count(DISTINCT user_id) AS n_users,
                min(day) AS min_day, max(day) AS max_day
         FROM t GROUP BY split ORDER BY split"""),

    // Nested-JSON ingestion: a struct-of-struct + array document parsed
    // with an explicit from_json schema, nested fields projected and the
    // array exploded — the shape multimodal metadata and API payloads
    // arrive in. The oracle re-derives the rows relationally from the
    // base columns, proving parse + traversal dropped nothing.
    "q34_nested_json" -> api(
      (s, dir) => {
        val js = concat(lit("{\"meta\":{\"src\":\""), col("source"),
          lit("\",\"n\":"), col("n_chars"),
          lit("},\"tags\":[\""), col("lang"), lit("\",\"t"),
          col("doc_id") % 3, lit("\"]}"))
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), from_json(js,
            org.apache.spark.sql.types.StructType.fromDDL(
              "meta STRUCT<src: STRING, n: BIGINT>, tags ARRAY<STRING>"))
            .as("j"))
          .select(col("doc_id"), col("j.meta.src").as("src"),
            col("j.meta.n").as("n"), explode(col("j.tags")).as("tag"))
          .orderBy(col("doc_id"), col("tag"))
      },
      """SELECT doc_id, src, n, tag FROM (
           SELECT doc_id, source AS src, n_chars AS n, lang AS tag
           FROM documents
           UNION ALL
           SELECT doc_id, source, n_chars, 't' || (doc_id % 3)
           FROM documents) t
         ORDER BY doc_id, tag"""),

    // to_json serialization — the inverse of q34: a named struct row
    // rendered as a JSON string, byte-compared against the oracle's
    // hand-built string (field order, quoting, and integer rendering
    // must all agree).
    "q35_to_json" -> api(
      (s, dir) => s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          to_json(struct(col("source").as("src"),
            col("n_chars").as("n"))).as("js"))
        .orderBy(col("doc_id")),
      """SELECT doc_id,
                '{"src":"' || source || '","n":' || n_chars || '}' AS js
         FROM documents ORDER BY doc_id"""),

    // Higher-order array functions — transform / filter / aggregate /
    // zip_with over per-order item arrays, the lambda surface for
    // array-typed feature columns. Values stay integer (cents /
    // basis points), so the sequential lambda folds are exact; the
    // oracle re-derives every result RELATIONALLY (plain aggregates),
    // proving the HOF pipeline against first principles rather than a
    // same-text echo.
    "q36_array_hof" -> api(
      (s, dir) => {
        val items = s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"),
            struct(col("l_linenumber"),
              round(col("l_quantity") * 100).cast("long").as("qc"),
              round(col("l_tax") * 10000).cast("long").as("tc")).as("it"))
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(col("it"))).as("items"))
        items.select(col("l_orderkey"),
            size(col("items")).cast("long").as("n_items"),
            aggregate(transform(col("items"), x => x.getField("qc")),
              lit(0L), (a, x) => a + x).as("sum_qc"),
            size(filter(col("items"), x => x.getField("qc") > 2500))
              .cast("long").as("n_big"),
            aggregate(zip_with(
              transform(col("items"), x => x.getField("qc")),
              transform(col("items"), x => x.getField("tc")),
              (a, b) => a * b), lit(0L), (a, x) => a + x).as("dot_qt"))
          .orderBy(col("l_orderkey"))
      },
      """SELECT l_orderkey, count(*) AS n_items,
                CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                  AS sum_qc,
                CAST(sum(CASE WHEN round(l_quantity * 100) > 2500
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
                CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)
                       * CAST(round(l_tax * 10000) AS BIGINT)) AS BIGINT)
                  AS dot_qt
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""),

    // Native UNPIVOT (melt): wide metric columns to (key, metric, cents)
    // long form — the inverse of g03's pivot and the shape feature
    // stores ingest. Values go through exact cents; the oracle is the
    // classic UNION ALL re-derivation.
    // Regular-expression function surface — extract (capture group),
    // replace-all, and match-test — row-level over part names, where
    // the Java and RE2 regex engines agree (anchors, classes,
    // alternation; no backrefs/lookaround, which RE2 lacks). Spark's
    // regexp_replace is replace-ALL by default; DuckDB needs the
    // explicit 'g' flag — pinned here so the divergence stays
    // documented. Pure map-side: codegen'd string ops, no shuffle
    // except the presentation sort.
    // Grid-bucketed radius join (the spatial analog of LSH banding):
    // points land in 25-unit grid cells, each probe expands to its 3×3
    // cell neighborhood, candidates equi-join on the cell key and an
    // exact integer distance check verifies — a radius-25 neighbor
    // CANNOT sit outside the 3×3 ring of a 25-wide grid, so recall is 1
    // by construction and the oracle brute-forces probes × corpus.
    // At 100 TB the corpus side shuffles once on cell (each point lives
    // in exactly ONE cell; only probes replicate 9×) and no distance is
    // computed outside a candidate cell. Coordinates are synthesized
    // from the key (·37, ·91 mod 1000) so both engines share them.
    // POSITIONAL JOIN (j12, [[graft.sql.PositionalSql]] over
    // [[graft.ops.Zip.positionalJoin]]): pair rows by position, shorter
    // side NULL-padded — DuckDB's zip-join, same text on both engines.
    // Both operands are ORDER BYed derived tables (position means
    // something only under an explicit order; the zip's RDD boundary
    // preserves it where a plain subquery-under-join would not). Scale
    // shape: one count-per-partition pass per side (zipWithIndex), one
    // equi-join on the position key.
    "j12_positional_join" -> multiSession(Seq("nation", "region"),
      """SELECT a.n_name, b.r_name
         FROM (SELECT n_name FROM nation ORDER BY n_nationkey DESC) a
         POSITIONAL JOIN
              (SELECT r_name FROM region ORDER BY r_regionkey) b
         ORDER BY a.n_name"""),

    // SEMI JOIN / ANTI JOIN keyword forms (j13): DuckDB's explicit join
    // types; Spark's grammar accepts the same bare SEMI/ANTI spellings
    // (LEFT is optional), so the text is shared verbatim. Semantically
    // identical to the EXISTS/NOT EXISTS forms j03/j02 pin — the output
    // carries only left-side columns, duplicates on the right collapse.
    // Plan shape: LeftSemi/LeftAnti hash joins, right side broadcast
    // when small (orders at sf0.01 is, and the theta term rides the
    // join condition — no post-filter).
    "j13_semi_anti" -> multiSession(Seq("customer", "orders"),
      """WITH s AS (SELECT c_custkey FROM customer
                    SEMI JOIN orders ON c_custkey = o_custkey
                                    AND o_totalprice > 400000),
              a AS (SELECT c_custkey FROM customer
                    ANTI JOIN orders ON c_custkey = o_custkey
                                    AND o_totalprice > 400000)
         SELECT 'has_big' AS tag, c_custkey FROM s
         UNION ALL
         SELECT 'no_big' AS tag, c_custkey FROM a
         ORDER BY tag, c_custkey"""),

    "j11_spatial_grid" -> api(
      (s, dir) => {
        val pts = s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey").as("id"),
            (col("c_custkey") * 37 % 1000).as("x"),
            (col("c_custkey") * 91 % 1000).as("y"))
        val corpus = pts.withColumn("cell",
          expr("(x div 25) * 1000 + (y div 25)"))
        val probeCells = for (dx <- -1 to 1; dy <- -1 to 1)
          yield expr(s"((x div 25) + $dx) * 1000 + ((y div 25) + $dy)")
        val probes = pts.filter(col("id") % 750 === 0)
          .select(col("id").as("probe_id"), col("x").as("px"),
            col("y").as("py"), explode(array(probeCells: _*)).as("cell"))
        probes.join(corpus, Seq("cell"))
          .withColumn("dist2",
            (col("px") - col("x")) * (col("px") - col("x")) +
              (col("py") - col("y")) * (col("py") - col("y")))
          .filter(col("dist2") <= 625)
          .select(col("probe_id"), col("id").as("nbr_id"), col("dist2"))
          .orderBy(col("probe_id"), col("nbr_id"))
      },
      """WITH p AS (SELECT c_custkey AS id, (c_custkey * 37) % 1000 AS x,
                           (c_custkey * 91) % 1000 AS y FROM customer),
         pr AS (SELECT * FROM p WHERE id % 750 = 0)
         SELECT pr.id AS probe_id, p.id AS nbr_id,
                (pr.x - p.x) * (pr.x - p.x) + (pr.y - p.y) * (pr.y - p.y)
                  AS dist2
         FROM pr JOIN p
           ON (pr.x - p.x) * (pr.x - p.x) + (pr.y - p.y) * (pr.y - p.y) <= 625
         ORDER BY probe_id, nbr_id"""),

    // QUALIFY clause (Snowflake/DuckDB dialect): filter on a window
    // function AFTER the select list evaluates — top-2 orders per
    // customer here. Spark has no QUALIFY; graft.sql.Dialect.splitQualify
    // rewrites the clause into subquery + filter (predicate evaluated as
    // a lateral-alias column, then dropped), so the SAME text runs on
    // both engines. The plan is the one you'd hand-write: one shuffle on
    // o_custkey, rank + filter before the final order — no extra
    // exchange from the rewrite.
    "q39_qualify" -> same("orders",
      """SELECT o_custkey, o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
                CAST(row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
         FROM orders
         QUALIFY rn <= 2
         ORDER BY o_custkey, rn"""),

    // try_* arithmetic (ANSI-safe ingestion tier): Spark 4 runs ANSI
    // mode, so raw +/÷ THROW on int64 overflow and division by zero —
    // try_add/try_divide/try_multiply return NULL instead, the right
    // semantics for a pipeline that must survive dirty numerics without
    // a crash loop. The oracle emulates each NULL condition explicitly
    // (HUGEINT headroom for the overflow probe, CASE for ÷0). Map-only.
    "q46_try_arith" -> api(
      (s, dir) => {
        val t = tbl(s, dir, "lineitem")
        t.sql(
          """SELECT l_orderkey, l_linenumber,
                    try_add(9223372036854775807, l_linenumber - 3) AS ta,
                    try_divide(l_quantity, l_linenumber - 1) AS td,
                    try_multiply(4611686018427387904, l_linenumber) AS tm
             FROM lineitem WHERE l_orderkey <= 300
             ORDER BY l_orderkey, l_linenumber""").toDF
      },
      """SELECT l_orderkey, l_linenumber,
                CASE WHEN l_linenumber - 3 <= 0
                     THEN 9223372036854775807 + (l_linenumber - 3) END AS ta,
                CASE WHEN l_linenumber <> 1
                     THEN CAST(l_quantity AS DOUBLE)
                          / CAST(l_linenumber - 1 AS DOUBLE) END AS td,
                CASE WHEN CAST(4611686018427387904 AS HUGEINT) * l_linenumber
                          <= 9223372036854775807
                     THEN 4611686018427387904 * l_linenumber END AS tm
         FROM lineitem WHERE l_orderkey <= 300
         ORDER BY l_orderkey, l_linenumber"""),

    // Round-9 np.* namespace extensions, scalar tier: numpy spells
    // operators as functions (add/true_divide/floor_divide/bitwise_*),
    // and the semantics diverge from SQL exactly where it matters —
    // true_divide is float division even on ints, floor_divide FLOORS
    // where SQL div truncates (−7//2 = −4, not −3), copysign transfers
    // sign through abs. The oracle re-derives each from DuckDB
    // primitives. All map-only codegen'd Catalyst expressions.
    "q44_np_extended" -> api(
      (s, dir) => {
        val t = tbl(s, dir, "lineitem")
        t.sql(
          """SELECT l_orderkey, l_linenumber,
                    np.floor_divide(l_orderkey - 500, 7) AS fd,
                    np.bitwise_xor(l_orderkey, l_linenumber) AS bx,
                    np.true_divide(l_quantity, 3) AS td,
                    np.copysign(l_quantity, l_discount - 0.03) AS cs,
                    np.left_shift(l_linenumber, 4) AS ls
             FROM lineitem WHERE l_orderkey <= 1000
             ORDER BY l_orderkey, l_linenumber""").toDF
      },
      """SELECT l_orderkey, l_linenumber,
                CAST(floor(CAST(l_orderkey - 500 AS DOUBLE)
                     / CAST(7 AS DOUBLE)) AS BIGINT) AS fd,
                xor(l_orderkey, l_linenumber) AS bx,
                CAST(l_quantity AS DOUBLE) / CAST(3 AS DOUBLE) AS td,
                CASE WHEN CAST(l_discount - 0.03 AS DOUBLE) >= 0
                     THEN abs(CAST(l_quantity AS DOUBLE))
                     ELSE -abs(CAST(l_quantity AS DOUBLE)) END AS cs,
                l_linenumber << 4 AS ls
         FROM lineitem WHERE l_orderkey <= 1000
         ORDER BY l_orderkey, l_linenumber"""),

    // Round-9 np.* namespace extensions, aggregate tier: np.std/np.var
    // are POPULATION moments (numpy ddof=0) — deliberately not SQL's
    // sample stddev/variance — and np.median is the exact percentile.
    // Rounded to 6 like g05's sample moments.
    "q45_np_stats" -> api(
      (s, dir) => {
        val t = tbl(s, dir, "lineitem")
        t.sql(
          """SELECT l_returnflag,
                    round(np.std(l_quantity), 6) AS sd,
                    round(np.var(l_quantity), 6) AS vr,
                    np.median(l_quantity) AS md
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""").toDF
      },
      """SELECT l_returnflag,
                round(stddev_pop(l_quantity), 6) AS sd,
                round(var_pop(l_quantity), 6) AS vr,
                median(l_quantity) AS md
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // np.percentile (q in 0..100) / np.quantile (q in 0..1) — numpy's
    // default 'linear' interpolation IS Spark's exact Percentile and
    // DuckDB's quantile_cont (the p05 precedent); q/100 is one
    // correctly-rounded division so both engines see the same double.
    "q47_np_percentile" -> api(
      (s, dir) => {
        val t = tbl(s, dir, "lineitem")
        t.sql(
          """SELECT l_returnflag,
                    np.percentile(l_extendedprice, 25) AS p25,
                    np.quantile(l_extendedprice, 0.5) AS q50,
                    np.percentile(l_extendedprice, 90) AS p90
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""").toDF
      },
      """SELECT l_returnflag,
                quantile_cont(l_extendedprice, 0.25) AS p25,
                quantile_cont(l_extendedprice, 0.5) AS q50,
                quantile_cont(l_extendedprice, 0.9) AS p90
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // GROUP BY ALL (the modern shorthand both Spark ≥3.4 and DuckDB
    // support natively): every non-aggregate select item becomes a
    // grouping key — one text, zero dialect work. Also exercises the
    // analyzer's aggregate/grouping classification on a mixed list.
    "q41_group_by_all" -> same("lineitem",
      """SELECT l_returnflag, l_linestatus,
                count(*) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS sq,
                CAST(max(round(l_extendedprice * 100)) AS BIGINT) AS mx_c
         FROM lineitem
         GROUP BY ALL
         ORDER BY l_returnflag, l_linestatus"""),

    // DuckDB-style star modifier `* EXCLUDE (cols)`: project everything
    // except the named columns — the ergonomic form for wide tables
    // where "all 400 features minus the 2 raw blobs" beats typing 398
    // names. Spark has no EXCLUDE; graft.sql.Dialect.expandStarExclude
    // expands the star against the RECEIVER's schema at bind time, so
    // the same text runs on both engines and the projection still
    // prunes the parquet scan (ReadSchema drops the excluded columns —
    // at 100 TB, excluding the payload column is the whole I/O story).
    "q42_star_exclude" -> same("documents",
      """SELECT * EXCLUDE (text, source) FROM documents
         WHERE n_chars >= 100 ORDER BY doc_id"""),

    // DuckDB-style `* REPLACE (expr AS name)` star modifier — q42's
    // sibling: swap named columns inside the star expansion while
    // preserving position and name. Spark has no REPLACE; the dialect
    // pre-pass expands it against the bound schema (nested parens and
    // commas in the replacement expression included), while DuckDB runs
    // the same text natively.
    "q48_star_replace" -> same("documents",
      """SELECT * REPLACE (upper(lang) AS lang,
                           md5(coalesce(text, '')) AS text,
                           CAST(round(n_chars / 100.0, 2) AS DOUBLE) AS n_chars)
         FROM documents WHERE doc_id < 200 ORDER BY doc_id"""),

    // ORDER BY ALL next to GROUP BY ALL (q41): both parse natively in
    // Spark ≥3.4 and DuckDB with identical left-to-right semantics, and
    // our nulls-last pre-pass ("ALL NULLS LAST") also parses in both —
    // the statement is its own oracle.
    "q49_order_by_all" -> same("lineitem",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qc
         FROM lineitem GROUP BY ALL ORDER BY ALL"""),

    // DuckDB ≥1.3 `* RENAME (old AS new)` star modifier
    // (Dialect.expandStarRename). The oracle DuckDB here is 1.0, which
    // predates RENAME, so the oracle runs the EXPANDED equivalent text —
    // still a strict hash gate on the rename semantics.
    "q50_star_rename" -> diff("part",
      """SELECT * RENAME (p_retailprice AS price, p_name AS part_name)
         FROM part WHERE p_size > 47 ORDER BY p_partkey""",
      """SELECT p_partkey, p_name AS part_name, p_brand, p_type, p_size,
                p_retailprice AS price
         FROM part WHERE p_size > 47 ORDER BY p_partkey"""),

    // null-safe comparison operators at the SQL surface: IS [NOT]
    // DISTINCT FROM is the three-valued-logic-free equality both engines
    // parse natively (same text). Nulls are planted in-query so the
    // null<->null and null<->value cells all genuinely occur.
    "q51_is_distinct_from" -> same("orders",
      """WITH t AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 5 = 0 THEN NULL
                       ELSE o_orderstatus END AS a,
                  CASE WHEN o_orderkey % 7 = 0 THEN NULL
                       ELSE o_orderstatus END AS b
           FROM orders)
         SELECT count(*) AS n_total,
                CAST(sum(CASE WHEN a IS DISTINCT FROM b THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_distinct,
                CAST(sum(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_same,
                CAST(sum(CASE WHEN a IS NOT DISTINCT FROM b
                              AND a IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_both_null
         FROM t"""),

    // named WINDOW clause: one definition shared by several window
    // functions — both engines parse the same text natively, and Spark
    // still collapses the shared spec into ONE Window exec
    "q52_named_window" -> multi(Seq("orders"),
      """SELECT o_custkey, o_orderkey,
                CAST(row_number() OVER w AS BIGINT) AS rn,
                CAST(rank() OVER w AS BIGINT) AS rk,
                CAST(count(*) OVER w AS BIGINT) AS n_so_far
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey"""),

    // DuckDB/Postgres DISTINCT ON — latest order per customer. Spark
    // has no DISTINCT ON; Dialect.distinctOn lowers it onto a
    // row_number window (same text runs natively in DuckDB). The sort
    // is made total (date DESC, key) so the kept row is deterministic.
    "q53_distinct_on" -> same("orders",
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey,
                o_totalprice
         FROM orders
         ORDER BY o_custkey, o_orderdate DESC, o_orderkey"""),

    // DuckDB's dynamic star COLUMNS('regex') — the dialect expands the
    // partial-match regex against the receiver schema (bare form →
    // plain columns; f(COLUMNS(..)) → one f(col) AS col per hit, the
    // probed DuckDB output naming). Same statement text on both engines.
    "q55_dynamic_columns" -> same("events",
      """SELECT COLUMNS('_id') FROM events
         WHERE event_id <= 5 ORDER BY event_id"""),

    // COLUMNS extensions (q55b, r18): the LAMBDA form — the predicate
    // evaluates over column NAMES (here via Spark's own expr, exact
    // SQL LIKE/length semantics) — and the star-modifier form
    // COLUMNS(* EXCLUDE (…)). Wrapped-aggregate naming composes. Same
    // text on both engines.
    "q55b_columns_lambda" -> same("events",
      """SELECT COLUMNS(c -> c LIKE '%_id' AND length(c) > 6),
                COLUMNS(* EXCLUDE (props, ts, event_id, user_id)),
                min(COLUMNS(c -> c = 'ts'))
         FROM events WHERE event_id <= 5
         GROUP BY event_id, user_id, event_type, value
         ORDER BY event_id"""),

    // DuckDB's UNION ALL BY NAME — the dialect splits at the top-level
    // BY NAME operator and folds with unionByName(allowMissingColumns):
    // result columns are the first operand's then new names appended,
    // missing slots NULL; the trailing ORDER BY binds to the WHOLE
    // union. Same text both engines; scale shape is a plain union (no
    // shuffle beyond the final sort).
    "q56_union_by_name" -> multiSession(Seq("orders", "customer"),
      """SELECT o_orderkey AS k, o_totalprice AS price FROM orders
         WHERE o_orderkey % 500 = 1
         UNION ALL BY NAME
         SELECT c_acctbal AS bal, c_custkey AS k FROM customer
         WHERE c_custkey % 500 = 2
         ORDER BY k, price, bal"""),

    // DuckDB's bare SEMI / ANTI JOIN spelling (no LEFT keyword) — Spark's
    // grammar makes LEFT optional for both, so the statement is
    // same-text with no dialect work; the pair of counts pins both
    // semantics (semi + anti partition the probe side).
    "q58_semi_anti_join" -> multi(Seq("orders", "customer"),
      """SELECT 'semi' AS side, count(*) AS n
         FROM orders o SEMI JOIN customer c
           ON c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
         UNION ALL
         SELECT 'anti' AS side, count(*) AS n
         FROM orders o ANTI JOIN customer c
           ON c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
         ORDER BY side"""),

    // DuckDB's FROM-first statement form (Dialect.fromFirst): the select
    // list rides after the table expression ("FROM t SELECT list WHERE
    // ..."), or is omitted entirely ("FROM t" == SELECT *). The dialect
    // moves the list to the front; everything downstream sees a standard
    // statement. Same text both engines.
    // DuckDB's SUMMARIZE statement (q59) as a same-text dialect form:
    // Table.sql routes it to Profile.summarizeFull — DuckDB's exact
    // output columns and naming (probed), one aggregation pass + a
    // driver-free unpivot. The oracle is EXPLICIT exact SQL rather than
    // the literal statement because DuckDB's own SUMMARIZE values are
    // approximate (HLL approx_unique, approximate quantiles — probed:
    // 498 vs the true 500 on sf0.01 doc_id); ours are exact, the
    // documented divergence discipline. Integral stats re-derive from
    // exact decimal moments with a mirrored double-arithmetic chain.
    "q59_summarize" -> diff("documents",
      "SUMMARIZE documents",
      summarizeOracle(Seq(
        "doc_id" -> "BIGINT", "text" -> "VARCHAR", "lang" -> "VARCHAR",
        "source" -> "VARCHAR", "n_chars" -> "BIGINT"), "documents")),

    // DuckDB's DESCRIBE statement (q60) as a SAME-TEXT form (unlike
    // SUMMARIZE its values are fully deterministic — schema only):
    // (column_name, column_type, null, key, default, extra), rows in
    // schema order, types in DuckDB spelling, nullability from the
    // schema, constraint columns NULL. Replaces Spark's own
    // 3-column DESCRIBE shape at the Table surface by contract.
    "q60_describe" -> same("documents", "DESCRIBE documents"),

    // DuckDB sampling clauses (q64, [[graft.sql.SampleSql]]): query-level
    // `USING SAMPLE n% / n ROWS` and table-level `TABLESAMPLE (…)`, all
    // three lowered onto the deterministic md5 bucket grid (DOCUMENTED
    // divergence from DuckDB's PRNG sampling — the oracle mirrors the
    // gate expression, the `CAST('0x'||substr(md5…))` discipline of
    // sp14). Percent is a map-only filter (PlanSpec pins no Exchange);
    // the rows form is a bounded TakeOrderedAndProject on the hash.
    // DuckDB list-function surface (q65): the same statement text runs
    // on both engines through the Registry's spelling aliases —
    // string_split_regex/list_filter/list_transform/list_distinct/
    // list_sort/unnest/array_length/list_contains all resolve onto
    // native codegen'd collection builtins (pure name delegation, no
    // UDFs). Map-only token work into one keyed agg.
    "q65_list_functions" -> multiSession(Seq("documents"),
      """WITH s AS (SELECT doc_id,
              list_filter(string_split_regex(lower(coalesce(text, '')),
                                             '[^a-z0-9]+'),
                          x -> x <> '') AS toks
            FROM documents),
         g AS (SELECT doc_id, toks,
                 list_sort(list_distinct(
                   list_transform(toks, t -> substr(t, 1, 1)))) AS initials
               FROM s),
         x AS (SELECT unnest(initials) AS initial,
                      array_length(toks) AS n_toks,
                      list_contains(initials, 'z') AS has_z
               FROM g)
         SELECT initial, count(*) AS n_docs,
                CAST(max(n_toks) AS BIGINT) AS max_toks,
                CAST(max(CASE WHEN has_z THEN 1 ELSE 0 END) AS BIGINT) AS any_z
         FROM x GROUP BY initial ORDER BY initial"""),

    // GROUP BY ALL / ORDER BY ALL (q66): DuckDB's shorthand, adopted
    // natively by Spark 3.4+ — ALL groups every non-aggregate select
    // item and orders by the full output list, so the same text runs on
    // both engines (probed: both also accept `ORDER BY ALL NULLS LAST`,
    // which the dialect's nulls-last rewrite appends, and agree on the
    // null placement of the nullif-derived key). Plan shape: identical
    // to the spelled-out GROUP BY — one partial+final hash aggregate.
    "q66_by_all" -> multiSession(Seq("lineitem"),
      """SELECT nullif(l_returnflag, 'N') AS rf, l_linestatus AS ls,
                count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq
         FROM lineitem GROUP BY ALL ORDER BY ALL"""),

    // Ordered aggregates, DuckDB's inline spelling (q67, [[graft.sql
    // .Dialect.rewriteOrderedAggs]]): `agg(args ORDER BY keys)` with
    // the sort inside the argument list. string_agg/listagg lower onto
    // Spark's native listagg … WITHIN GROUP (any key direction);
    // array_agg and DuckDB's list() — which have NO Spark ordered
    // variant — lower onto a struct-sort (collect into (keys, value)
    // structs, array_sort, project the value; ASC keys only, refusals
    // pinned in DialectSpec). list()/array_to_string() ride the
    // registry's name delegation. Same text on both engines.
    "q67_ordered_aggs" -> multiSession(Seq("nation", "region"),
      """SELECT r_regionkey AS k,
           string_agg(n_name, '|' ORDER BY n_name DESC) AS names_desc,
           array_to_string(array_agg(n_name ORDER BY n_nationkey),
                           ',') AS by_key,
           array_to_string(list(substr(n_name, 8) ORDER BY n_name),
                           ',') AS tails,
           string_agg(DISTINCT substr(n_name, 1, 1), ''
                      ORDER BY substr(n_name, 1, 1)) AS initials,
           array_to_string(array_agg(DISTINCT n_nationkey % 4
                             ORDER BY n_nationkey % 4 DESC), ',') AS quads
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_regionkey ORDER BY k"""),

    // Pattern operators (q68): ILIKE is native on BOTH engines (probed,
    // case-insensitive LIKE); SIMILAR TO — DuckDB's FULL-string regex
    // match, no %-conversion — and GLOB — the unix-glob operator —
    // lower onto anchored RLIKE ([[graft.sql.Dialect
    // .rewriteSimilarGlob]]). NOT variants stay in place (Spark accepts
    // NOT RLIKE). Same text on both engines.
    "q68_pattern_ops" -> multiSession(Seq("part"),
      """SELECT p_partkey AS k, p_name, p_type,
             (p_name ILIKE 'SMALL%') AS is_small,
             (p_name SIMILAR TO '(red|blue) [a-z]+') AS rb,
             (p_name GLOB '*g[ei]*') AS has_gei,
             (p_name NOT SIMILAR TO '.*o.*') AS no_o
         FROM part
         WHERE p_name ILIKE '%e%' AND p_partkey % 7 = 0
         ORDER BY k"""),

    // 1-based bracket subscripts (q69, [[graft.sql.Dialect
    // .rewriteSubscripts]]): DuckDB/Postgres `l[1]` is the FIRST
    // element — unrewritten, the same text reaches Spark's 0-based
    // subscript and silently returns the SECOND (the engine's one
    // silent same-text divergence until r18). Every bracket subscript
    // lowers onto try_element_at: 1-based, negative-from-end, NULL out
    // of bounds, NULL at literal index 0 (Spark throws there even in
    // try mode), function-call receivers included. Same text on both
    // engines; the plan is one map-only projection over the scan.
    "q69_subscripts" -> multiSession(Seq("documents"),
      """WITH s AS (SELECT doc_id, text,
              CASE WHEN text IS NULL THEN NULL
                   ELSE string_split(text, ' ') END AS toks
            FROM documents)
         SELECT doc_id,
                toks[1] AS first_tok,
                toks[2] AS second_tok,
                toks[-1] AS last_tok,
                toks[array_length(toks) + 5] AS oob,
                toks[0] AS zero_idx,
                toks[1 + doc_id % 3] AS dyn,
                string_split(coalesce(text, ''), ' ')[1] AS fn_recv,
                array_to_string(toks[2:4], '_') AS sl_mid,
                array_to_string(toks[:2], '_') AS sl_head,
                array_to_string(toks[-2:], '_') AS sl_tail,
                array_to_string(toks[3:999], '_') AS sl_clamp
         FROM s
         WHERE doc_id % 5 = 0
         ORDER BY doc_id"""),

    // DuckDB literal syntax (q70, [[graft.sql.Dialect
    // .rewriteStructLiterals]] + the rewriteSubscripts literal arms):
    // `[a, b]` / `ARRAY[a, b]` list literals lower onto array(); struct
    // literals `{'k': v}` onto named_struct() — nested forms re-enter
    // the passes, subscripts/slices compose on top, and dotted field
    // access stays native on both engines. Same text throughout.
    "q70_literal_syntax" -> multiSession(Seq("nation"),
      """SELECT n_nationkey AS k,
           ({'name': n_name, 'reg': n_regionkey}).name AS sname,
           ({'a': {'r2': CAST(n_regionkey * 2 AS BIGINT)}}).a.r2 AS r2,
           CAST([n_regionkey, n_nationkey][1] AS BIGINT) AS first_el,
           CAST(ARRAY[n_nationkey % 3, 4][2] AS BIGINT) AS second_el,
           array_to_string(['x', n_name], '|') AS joined,
           array_to_string([n_name, 'y', 'z'][2:3], ',') AS lit_slice
         FROM nation ORDER BY k"""),

    // strftime/strptime (q77, [[graft.functions.Registry
    // .strftimeToJava]]): DuckDB's C-style %-directive formats
    // translate to Spark's Java datetime patterns at ANALYSIS time
    // (literal formats only — a runtime-varying format refuses
    // loudly); free literal text Java-pattern-quotes so words never
    // become pattern letters. The round-trip leg proves strptime
    // parses what strftime printed. Same text on both engines.
    "q77_strftime" -> multiSession(Seq("events"),
      """SELECT event_id AS k,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso,
             strftime(ts, '%d/%m/%y %I %p') AS uk,
             strftime(ts, '%a %b %j') AS dow,
             strftime(ts, 'on %-d at %-H h %%') AS freeform,
             CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M'),
               '%Y-%m-%d %H:%M') AS STRING) AS round_trip
         FROM events WHERE event_id % 101 = 0
         ORDER BY k"""),

    // DuckDB arithmetic operators (q76): `//` integer division (→
    // Spark div, both truncate toward zero; the float-operand cell is
    // a documented loud-refusal divergence), `**` power (→ power(),
    // left-associative, unary minus binds tighter — both probed), and
    // `<<`/`>>` shifts (native on BOTH engines, no rewrite). Integral
    // inputs keep every double bitwise-comparable. Same text.
    "q76_arith_operators" -> multiSession(Seq("lineitem"),
      """SELECT l_linenumber AS ln,
             CAST(sum(CAST(l_quantity AS BIGINT) // 7) AS BIGINT)
               AS idiv,
             CAST(sum((CAST(l_quantity AS BIGINT) - 25) // 4) AS BIGINT)
               AS idiv_neg,
             CAST(sum(CAST(l_quantity AS BIGINT) << 2) AS BIGINT)
               AS shl,
             CAST(sum(CAST(l_quantity AS BIGINT) >> 1) AS BIGINT)
               AS shr,
             CAST(sum(CAST(2 ** (l_linenumber % 5) AS BIGINT))
               AS BIGINT) AS pw,
             CAST(max(-2 ** 2) AS BIGINT) AS neg_pw
         FROM lineitem GROUP BY l_linenumber ORDER BY ln"""),

    // FROM-position series table functions (q75, [[graft.sql.Dialect
    // .rewriteSeriesTvf]]): DuckDB's `FROM range(…)` (stop-exclusive,
    // column `range`) rides Spark's native range TVF with the column
    // aliased; `FROM generate_series(…)` (stop-inclusive) explodes
    // the engine's guarded scalar. DOCUMENTED DIVERGENCE probed: the
    // DuckDB TVF form THROWS on an unreachable stop ("cannot generate
    // infinite series") where its scalar returns [] — this engine
    // yields zero rows (the scalar's guard); the empty-series leg
    // here uses range(3, 3), empty on both. The join leg proves
    // table-position composition. Same text throughout.
    "q75_series_tvf" -> multiSession(Seq(),
      """SELECT CAST(sum(r.range) AS BIGINT) AS s_range,
                count(*) AS n_pairs,
                CAST(sum(g.generate_series) AS BIGINT) AS s_series,
                (SELECT count(*) FROM range(3, 3)) AS n_empty
         FROM range(0, 30, 7) r
         JOIN generate_series(1, 9, 2) g
           ON g.generate_series > r.range"""),

    // DuckDB aggregate spellings (q74): arg_max/arg_min (Spark's
    // max_by/min_by), bool_and/bool_or, bit_and/or/xor, mode,
    // quantile_cont (the exact interpolating percentile — Registry
    // lowering shared with np.quantile) and median — same text on
    // both engines, integral/clean inputs so interpolation compares
    // bitwise. arg/mode determinism relies on unique extrema/modes in
    // the fixture groups (hash-verified).
    "q74_duckdb_aggregates" -> multiSession(Seq("orders"),
      """SELECT o_orderstatus AS st,
             arg_max(o_orderkey, o_totalprice) AS k_of_max,
             arg_min(o_orderkey, o_totalprice) AS k_of_min,
             bool_and(o_totalprice > 1000) AS all_gt,
             bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
             bit_and(o_custkey) AS band,
             bit_or(o_custkey) AS bor,
             bit_xor(o_custkey) AS bxor,
             mode(o_orderpriority) AS m,
             quantile_cont(CAST(round(o_totalprice) AS BIGINT), 0.25)
               AS q25,
             median(CAST(round(o_totalprice) AS BIGINT)) AS med
         FROM orders GROUP BY o_orderstatus ORDER BY st"""),

    // Dot-call function chaining (q73, [[graft.sql.Dialect
    // .rewriteDotCalls]]): DuckDB's `recv.fn(args)` = `fn(recv,
    // args)`, chaining left to right — lowered one link at a time,
    // leftmost-first, so `text.string_split(' ').len()` nests inside
    // out. Qualified columns WITHOUT a call stay; a bare string
    // literal receiver is DuckDB's own parser error (parenthesize).
    // Same text on both engines.
    "q73_dot_calls" -> multiSession(Seq("documents"),
      """SELECT doc_id AS k,
             text.lower().md5() AS h,
             lang.upper() AS lu,
             CAST(text.string_split(' ').len() AS BIGINT) AS ntok,
             CAST((source).trim().len() AS BIGINT) AS slen
         FROM documents WHERE doc_id % 11 = 0 ORDER BY k"""),

    // Trailing commas (q72, [[graft.sql.Dialect.stripTrailingCommas]]):
    // DuckDB tolerates a dangling comma before a clause keyword, in
    // list/struct literals, and in IN lists — but NOT in ordinary
    // function arguments or at end of input (the pass removes exactly
    // the legal commas, keeping refusal parity cell for cell). Same
    // text on both engines.
    "q72_trailing_commas" -> multiSession(Seq("nation"),
      """SELECT n_regionkey AS r,
                count(*) AS n,
                array_to_string([n_regionkey, 7,], '-') AS lit,
         FROM nation
         WHERE n_regionkey IN (0, 1, 2,)
         GROUP BY n_regionkey,
         ORDER BY r"""),

    // List comprehensions and MAP literals (q71, the r18 literal-pass
    // second wave): `[expr FOR v IN lst [IF cond]]` lowers onto
    // transform(filter(…)) — DuckDB's filter-then-map order — and
    // `MAP {k: v}` onto map(); reads go through map_keys/cardinality,
    // which agree across engines (the map SUBSCRIPT diverges: DuckDB
    // wraps in a one-element list — documented in the dialect pass).
    // Subscripts compose on top of comprehensions. Same text on both.
    "q71_comprehension_map" -> multiSession(Seq("nation"),
      """SELECT n_nationkey AS k,
           array_to_string([upper(s) FOR s IN string_split(n_name, '_')],
             '-') AS comp_up,
           CAST(len([x FOR x IN [n_regionkey, n_nationkey, 7]
             IF x % 2 = 1]) AS BIGINT) AS n_odd,
           array_to_string(map_keys(MAP {'r': n_regionkey,
             'k2': n_nationkey * 2}), ',') AS mk,
           CAST(cardinality(MAP {'a': 1, 'b': 2}) AS BIGINT) AS mc,
           CAST([y * y FOR y IN [n_nationkey % 5, 2]][1] AS BIGINT) AS sq1
         FROM nation ORDER BY k"""),

    "q64_sample_clause" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"), col("source"))
        val t = Table(docs)
        val pct = t.sql(
          "SELECT doc_id, lang FROM docs WHERE lang <> 'de' USING SAMPLE 25%")
          .df.select(lit("pct").as("form"), col("doc_id"))
        val rws = t.sql(
          "SELECT doc_id FROM docs USING SAMPLE reservoir(40 ROWS)")
          .df.select(lit("rows").as("form"), col("doc_id"))
        docs.createOrReplaceTempView("q64_docs")
        val ts = Table.sessionSql(s,
          "SELECT doc_id FROM q64_docs TABLESAMPLE (bernoulli(25%)) " +
            "WHERE doc_id % 2 = 0")
          .df.select(lit("ts").as("form"), col("doc_id"))
        // derived-table target (r17 ext): the gate keys on the
        // SUBQUERY's first column, alias before the clause (DuckDB's
        // only accepted position there, probed)
        val tsd = Table.sessionSql(s,
          """SELECT doc_id FROM (SELECT doc_id, lang FROM q64_docs
               WHERE lang <> 'fr') AS d TABLESAMPLE (25%)""")
          .df.select(lit("tsd").as("form"), col("doc_id"))
        pct.unionByName(rws).unionByName(ts).unionByName(tsd)
          .groupBy(col("form"))
          .agg(count(lit(1)).as("n"),
            sum(col("doc_id")).cast("long").as("id_sum"),
            min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
          .orderBy(col("form"))
      },
      """WITH g AS (SELECT doc_id, lang,
              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                   AS INTEGER) AS h
            FROM documents),
         pct AS (SELECT 'pct' AS form, doc_id FROM g
                 WHERE lang <> 'de' AND h < 16384),
         rws AS (SELECT 'rows' AS form, doc_id FROM documents
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 40),
         ts AS (SELECT 'ts' AS form, doc_id FROM g
                WHERE h < 16384 AND doc_id % 2 = 0),
         tsd AS (SELECT 'tsd' AS form, doc_id FROM g
                 WHERE lang <> 'fr' AND h < 16384),
         u AS (SELECT * FROM pct UNION ALL SELECT * FROM rws
               UNION ALL SELECT * FROM ts UNION ALL SELECT * FROM tsd)
         SELECT form, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
                min(doc_id) AS mn, max(doc_id) AS mx
         FROM u GROUP BY form ORDER BY form"""),

    // DuckDB's PIVOT statement (q61, SAME text both engines): dynamic ON
    // values (both engines collect the distinct domain sorted), implicit
    // GROUP BY (columns neither pivoted nor aggregated), multi-aggregate
    // value_alias naming — lowered onto RelationalGroupedDataset.pivot
    // (PivotSql). At 100 TB prefer the ON … IN (…) form: the dynamic
    // domain costs a second scan and an unbounded output schema. cents
    // ride as DOUBLE: USING accepts only bare aggregates (no outer CAST
    // to pin DuckDB's DECIMAL sum), and integral doubles under 2^53 sum
    // exactly in any order.
    "q61_pivot" -> multiSession(Seq("orders"),
      """PIVOT (SELECT o_orderstatus AS st, o_orderpriority AS pri,
                       CAST(round(o_totalprice * 100) AS DOUBLE) AS cents
                FROM orders)
         ON pri USING sum(cents) AS s, count(*) AS n
         GROUP BY st ORDER BY st"""),

    // LATERAL correlated subquery (q63, SAME text): per-customer top-2
    // orders via JOIN LATERAL (… ORDER BY … LIMIT 2) — the
    // "top-N per group without a window function" idiom both engines
    // execute natively (Spark plans it as a rewritten correlated join).
    // Fully tie-broken ORDER BYs keep the row set deterministic.
    "q63_lateral" -> multiSession(Seq("customer", "orders"),
      """SELECT c.c_custkey, l.o_orderkey, l.cents
         FROM customer c JOIN LATERAL (
           SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY cents DESC, o_orderkey LIMIT 2) l ON true
         WHERE c.c_custkey % 10 = 0
         ORDER BY c.c_custkey, l.cents DESC, l.o_orderkey"""),

    // DuckDB's UNPIVOT statement (q62, same text): wide → long with
    // NULL cells dropped (DuckDB semantics; Spark's unpivot keeps them,
    // so the lowering filters) — Dataset.unpivot, map-only expand.
    "q62_unpivot" -> multiSession(Seq("orders"),
      """UNPIVOT (SELECT o_orderkey AS k,
                  CASE WHEN o_totalprice < 100000
                       THEN CAST(round(o_totalprice * 100) AS BIGINT) END AS lo,
                  CASE WHEN o_totalprice >= 100000
                       THEN CAST(round(o_totalprice * 100) AS BIGINT) END AS hi
                  FROM orders WHERE o_orderkey % 5 = 0)
         ON lo, hi INTO NAME band VALUE cents
         ORDER BY k, band"""),

    "q57_from_first" -> same("orders",
      """FROM orders
         SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS price
         WHERE o_orderkey % 200 = 7 ORDER BY k"""),

    // market-basket co-occurrence: brand pairs bought together in one
    // order, with lift = N·c_ab / (c_a·c_b). The basket self-join is
    // keyed on the order and order sizes are bounded, so pair volume is
    // ∝ orders (never brands²); counts stay exact longs and the lift
    // division is one mirrored correctly-rounded chain
    "q54_market_basket" -> multi(Seq("lineitem", "part"),
      """WITH b AS (SELECT DISTINCT l_orderkey, p_brand
                    FROM lineitem JOIN part ON l_partkey = p_partkey),
         n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
         c AS (SELECT p_brand, count(*) AS c1 FROM b GROUP BY p_brand),
         p AS (SELECT a.l_orderkey, a.p_brand AS b1, bb.p_brand AS b2
               FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                AND a.p_brand < bb.p_brand),
         pc AS (SELECT b1, b2, count(*) AS c_ab FROM p GROUP BY b1, b2)
         SELECT pc.b1, pc.b2, pc.c_ab,
                round(CAST(pc.c_ab * n.n_orders AS DOUBLE)
                      / CAST(ca.c1 * cb.c1 AS DOUBLE), 6) AS lift
         FROM pc JOIN c ca ON pc.b1 = ca.p_brand
                 JOIN c cb ON pc.b2 = cb.p_brand
                 CROSS JOIN n
         WHERE pc.c_ab >= 30
         ORDER BY pc.b1, pc.b2"""),

    // Relational division ("for all"): customers who placed an order in
    // EVERY order-priority class. The Spark plan is the scale-right
    // counting formulation — one grouped distinct-count against a
    // broadcast universe count, no correlated subquery in sight — while
    // the oracle is the textbook double-NOT-EXISTS, proving the two
    // formulations equivalent. At 100 TB the counting plan wins by
    // construction: two aggregations and a broadcast of ONE row vs a
    // nested correlated anti-join per (customer, class) pair.
    "q40_division" -> api(
      (s, dir) => {
        val o = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_custkey"), col("o_orderpriority"))
        val k = o.agg(count_distinct(col("o_orderpriority")).as("__k"))
        o.groupBy(col("o_custkey"))
          .agg(count_distinct(col("o_orderpriority")).as("__np"))
          .join(broadcast(k), col("__np") === col("__k"))
          .select(col("o_custkey"))
          .orderBy(col("o_custkey"))
      },
      """SELECT c.o_custkey
         FROM (SELECT DISTINCT o_custkey FROM orders) c
         WHERE NOT EXISTS (
           SELECT 1 FROM (SELECT DISTINCT o_orderpriority AS p FROM orders) ps
           WHERE NOT EXISTS (
             SELECT 1 FROM orders o
             WHERE o.o_custkey = c.o_custkey AND o.o_orderpriority = ps.p))
         ORDER BY o_custkey"""),

    "q38_regex" -> api(
      (s, dir) => {
        s.read.parquet(s"$dir/part.parquet")
          .select(col("p_partkey"),
            regexp_extract(col("p_name"), "^([a-z]+)", 1).as("adj"),
            regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
            col("p_name").rlike("^(red|blue) ").as("is_primary"),
            regexp_extract(col("p_name"), "(\\w+)$", 1).as("noun"))
          .orderBy(col("p_partkey"))
      },
      """SELECT p_partkey,
                regexp_extract(p_name, '^([a-z]+)', 1) AS adj,
                regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
                regexp_matches(p_name, '^(red|blue) ') AS is_primary,
                regexp_extract(p_name, '(\w+)$', 1) AS noun
         FROM part ORDER BY p_partkey"""),

    "q37_unpivot" -> api(
      (s, dir) => {
        val w = s.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_orderkey") <= 1000)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice") * 100).cast("long").as("price_c"),
            round(col("l_discount") * 10000).cast("long").as("disc_bp"),
            round(col("l_tax") * 10000).cast("long").as("tax_bp"))
        w.unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("price_c"), col("disc_bp"), col("tax_bp")),
            "metric", "v")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
      },
      """SELECT l_orderkey, l_linenumber, metric, v FROM (
           SELECT l_orderkey, l_linenumber, 'price_c' AS metric,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS v
           FROM lineitem WHERE l_orderkey <= 1000
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'disc_bp',
                  CAST(round(l_discount * 10000) AS BIGINT)
           FROM lineitem WHERE l_orderkey <= 1000
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'tax_bp',
                  CAST(round(l_tax * 10000) AS BIGINT)
           FROM lineitem WHERE l_orderkey <= 1000) t
         ORDER BY l_orderkey, l_linenumber, metric"""),

    // Aggregate FILTER clause — per-aggregate predicates without CASE
    // gymnastics; same text in both engines (the g08/count_if family's
    // ANSI spelling).
    // Pearson correlation matrix over lineitem's numeric columns from
    // EXACT decimal sums: the 2-decimal inputs and their products are
    // exactly representable, the decimal Σx/Σx²/Σxy are order-free, and
    // the closed-form corr from those sums is a fixed chain of
    // correctly-rounded double ops (+,-,*,/,sqrt are all IEEE
    // correctly-rounded) — so the doubles match bitwise across engines
    // with no fixed-point crutch. One aggregation pass for all sums.
    // The built-in corr() is NOT used on purpose: its streaming-update
    // double accumulation is partitioning-dependent — pr07 gates that
    // built-in under a round-to-6 tolerance; this query is the
    // tolerance-free upgrade of the same statistic.
    "g16_corr_matrix" -> multi(Seq("lineitem"),
      """WITH s AS (SELECT
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sdd,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sqd,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS spd
         FROM lineitem)
         SELECT pair, corr FROM (
           SELECT 'quantity_price' AS pair,
                  ((n * sqp) - (sq * sp))
                    / (sqrt((n * sqq) - (sq * sq))
                       * sqrt((n * spp) - (sp * sp))) AS corr FROM s
           UNION ALL
           SELECT 'quantity_discount',
                  ((n * sqd) - (sq * sd))
                    / (sqrt((n * sqq) - (sq * sq))
                       * sqrt((n * sdd) - (sd * sd))) FROM s
           UNION ALL
           SELECT 'price_discount',
                  ((n * spd) - (sp * sd))
                    / (sqrt((n * spp) - (sp * sp))
                       * sqrt((n * sdd) - (sd * sd))) FROM s) t
         ORDER BY pair"""),

    "g12_agg_filter" -> multi(Seq("lineitem"),
      """SELECT l_returnflag,
                count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                     FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_qty,
                round(avg(l_extendedprice)
                      FILTER (WHERE l_tax < 0.04), 6) AS cheap_tax_avg
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Reaggregatable DataSketches HLL — THE pre-aggregated-rollup
    // pattern at 100 TB: per-day user sketches (computed once, stored
    // next to the rollup) UNION to any coarser grain without rescanning
    // events. Strict-oracled through error-gate contracts (ap01
    // mechanics): per-day estimates and the union-of-sketches global
    // estimate are gated against exact distinct counts computed in-plan;
    // bounds hold deterministically (DataSketches HLL is deterministic
    // for fixed input; lgConfigK=12 ⇒ σ≈1.6%).
    "g13_sketch_union" -> api(
      (s, dir) => {
        val MpD = graft.streaming.Events.MicrosPerDay
        val ev = graft.streaming.Events.readRaw(s, dir)
          .select(expr(s"ts div $MpD").as("day"), col("user_id"))
        val daily = ev.groupBy(col("day"))
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
            count_distinct(col("user_id")).as("nd"))
        val dailyGate = daily
          .select((abs(hll_sketch_estimate(col("sk")) - col("nd"))
            .cast("double") / col("nd")).as("__e"))
          .agg(count(lit(1)).as("n_days"), max(col("__e")).as("__me"))
        val union = daily
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as("__gest"))
        val exact = ev.agg(count_distinct(col("user_id")).as("n_users"))
        dailyGate.crossJoin(broadcast(union)).crossJoin(broadcast(exact))
          .select(col("n_days"), col("n_users"),
            when(col("__me") <= 0.05, lit(0.05)).otherwise(col("__me"))
              .as("daily_err_bound"),
            when(abs(col("__gest") - col("n_users")).cast("double")
                / col("n_users") <= 0.05, lit(0.05))
              .otherwise(abs(col("__gest") - col("n_users")).cast("double")
                / col("n_users")).as("union_err_bound"))
      },
      """SELECT CAST(count(DISTINCT CAST(epoch_us(ts) // 86400000000
                     AS BIGINT)) AS BIGINT) AS n_days,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                CAST(0.05 AS DOUBLE) AS daily_err_bound,
                CAST(0.05 AS DOUBLE) AS union_err_bound
         FROM events"""),

    // lead/lag with explicit offsets and defaults — the gap-tolerant
    // form (offset 3, constant fallback); same text in both engines.
    // INTERVAL range frame over event-time ordering: trailing-2-hour
    // per-user rolling count/sum where the frame boundary is a TIME
    // span, not a row count — w04's day-integer trick done natively on
    // the timestamp column. Same text on both engines (Spark ≥2.3 and
    // DuckDB both take INTERVAL bounds in RANGE frames); equal
    // timestamps are frame peers in both. One shuffle on user_id.
    "w10_range_interval" -> multi(Seq("events"),
      """SELECT event_id,
                CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL '2' HOUR PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_2h,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
                  PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL '2' HOUR PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cents_2h
         FROM events ORDER BY event_id"""),

    "w09_lag_offsets" -> multi(Seq("orders"),
      """SELECT o_custkey, o_orderkey,
                lag(o_orderkey, 3, -1) OVER w AS prev3,
                lead(o_orderkey, 2, -1) OVER w AS next2
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""")

    ,

    // Dirty-CSV round-trip fidelity: every row gets embedded delimiters,
    // quotes, AND newlines injected, then travels Spark write -> read
    // (quoted, escape-aware, multiLine). The aggregate fingerprint
    // (row count + char volume + md5-derived checksum) must equal the
    // oracle's, computed from the ORIGINAL table — any mis-split row,
    // dropped quote, or swallowed newline changes it. The row count
    // alone catches the classic failure (newline-in-field splitting
    // records).
    "io10_csv_dirty" -> api(
      (s, dir) => {
        val tmp = scratchDir(s"io10_dirty_${new java.io.File(dir).getName}")
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            concat(lit("a,b \""),
              substring(coalesce(col("text"), lit("")), 1, 40),
              lit("\"\nl2;"), col("source")).as("dirty"))
          .write.mode("overwrite").option("header", "true").csv(tmp)
        s.read.option("header", "true").option("multiLine", "true")
          .schema("doc_id LONG, dirty STRING")
          .csv(tmp)
          .agg(count(lit(1)).as("n"),
            sum(length(col("dirty"))).cast("long").as("total_chars"),
            sum(conv(substring(md5(col("dirty")), 1, 8), 16, 10)
              .cast("long")).as("checksum"))
      },
      """WITH d AS (SELECT 'a,b "' || substr(coalesce(text, ''), 1, 40) ||
                           '"' || chr(10) || 'l2;' || source AS dirty
                    FROM documents)
         SELECT count(*) AS n,
                CAST(sum(length(dirty)) AS BIGINT) AS total_chars,
                CAST(sum(CAST('0x' || substr(md5(dirty), 1, 8) AS BIGINT))
                     AS BIGINT) AS checksum
         FROM d""")

    ,

    // MAP-type surface: build "k:v,k:v" strings from the row, parse with
    // str_to_map, explode to (key, value) rows. DuckDB's MAP is a
    // different animal, so the oracle derives the same rows relationally
    // (one UNION ALL branch per key) — which is exactly what proves the
    // map parse+explode did not reorder, drop, or mangle entries.
    "q31_map_fns" -> api(
      (s, dir) => {
        val kv = concat(lit("lang:"), col("lang"),
          lit(",src:"), col("source"),
          lit(",len:"), col("n_chars").cast("string"))
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), kv.as("__kv"))
          .select(col("doc_id"),
            explode(expr("str_to_map(__kv, ',', ':')")).as(Seq("key", "value")))
          .orderBy(col("doc_id"), col("key"))
      },
      """SELECT doc_id, key, value FROM (
           SELECT doc_id, 'lang' AS key, lang AS value FROM documents
           UNION ALL
           SELECT doc_id, 'src', source FROM documents
           UNION ALL
           SELECT doc_id, 'len', CAST(n_chars AS VARCHAR) FROM documents)
         ORDER BY doc_id, key""")

    ,

    // Winsorization: clip a metric at its exact per-group 1st/99th
    // percentiles — the standard outlier guard before training-weight
    // computation. Exact percentiles ride one sort-based aggregation;
    // the clip itself is a broadcast of 5 tiny rows back onto the
    // stream. round(,6) absorbs merge-order float noise.
    "pr06_winsorize" -> api(
      (s, dir) => {
        val ev = graft.streaming.Events.readRaw(s, dir)
          .select(col("event_type"), col("value"))
        val bounds = ev.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.01)").as("lo"),
            expr("percentile(value, 0.99)").as("hi"))
        ev.join(broadcast(bounds), Seq("event_type"))
          .select(col("event_type"),
            least(greatest(col("value"), col("lo")), col("hi")).as("cv"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("cv")), 6).as("clipped_sum"),
            round(min(col("cv")), 6).as("clip_lo"),
            round(max(col("cv")), 6).as("clip_hi"))
          .orderBy(col("event_type"))
      },
      """WITH b AS (SELECT event_type,
                  percentile_cont(0.01) WITHIN GROUP (ORDER BY value) AS lo,
                  percentile_cont(0.99) WITHIN GROUP (ORDER BY value) AS hi
           FROM events GROUP BY event_type)
         SELECT e.event_type, count(*) AS n,
                round(sum(least(greatest(e.value, b.lo), b.hi)), 6)
                  AS clipped_sum,
                round(min(least(greatest(e.value, b.lo), b.hi)), 6) AS clip_lo,
                round(max(least(greatest(e.value, b.lo), b.hi)), 6) AS clip_hi
         FROM events e JOIN b USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""")

    ,

    // IGNORE NULLS value windows — gap-fill's window-function cousin
    // (carry the last known value across nulls). The engines place the
    // modifier differently (Spark: after the call; DuckDB: inside the
    // argument list), hence the diff oracle.
    "w08_ignore_nulls" -> diff("orders",
      """SELECT o_orderkey,
                first_value(CASE WHEN o_orderstatus = 'O' THEN NULL
                                 ELSE o_orderpriority END) IGNORE NULLS
                  OVER w AS fv,
                last_value(CASE WHEN o_orderstatus = 'O' THEN NULL
                                ELSE o_orderpriority END) IGNORE NULLS
                  OVER w AS lv
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey""",
      """SELECT o_orderkey,
                first_value(CASE WHEN o_orderstatus = 'O' THEN NULL
                                 ELSE o_orderpriority END IGNORE NULLS)
                  OVER w AS fv,
                last_value(CASE WHEN o_orderstatus = 'O' THEN NULL
                                ELSE o_orderpriority END IGNORE NULLS)
                  OVER w AS lv
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey"""),

    // Bitwise aggregates — flag-mask accumulation (feature presence
    // masks, permission bits). Same text in both engines.
    "g11_bit_agg" -> multi(Seq("lineitem"),
      """SELECT l_returnflag,
                CAST(bit_and(l_linenumber) AS BIGINT) AS ba,
                CAST(bit_or(l_linenumber) AS BIGINT) AS bo,
                CAST(bit_xor(l_linenumber) AS BIGINT) AS bx
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Array set algebra over token arrays — distinct-normalized inputs,
    // sorted + joined outputs (the driver comparator is scalar-only).
    // DuckDB spells union/except via list_distinct/list_filter, so the
    // oracle is a re-derivation.
    "q32_array_setops" -> api(
      (s, dir) => {
        val toks = split(coalesce(col("text"), lit("")), " ")
        val a = array_distinct(slice(toks, 1, 6))
        val b = array_distinct(slice(toks, 4, 6))
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            array_join(sort_array(array_intersect(a, b)), ",").as("i"),
            array_join(sort_array(array_union(a, b)), ",").as("u"),
            array_join(sort_array(array_except(a, b)), ",").as("x"))
          .orderBy(col("doc_id"))
      },
      """WITH t AS (SELECT doc_id,
                  list_distinct(string_split(coalesce(text, ''), ' ')[1:6]) AS a,
                  list_distinct(string_split(coalesce(text, ''), ' ')[4:9]) AS b
           FROM documents)
         -- DuckDB's array_to_string(list_sort([])) is NULL where Spark's
         -- array_join('') is '' — coalesce the empty-set case
         SELECT doc_id,
                coalesce(array_to_string(list_sort(list_intersect(a, b)), ','),
                         '') AS i,
                coalesce(array_to_string(list_sort(list_distinct(a || b)), ','),
                         '') AS u,
                coalesce(array_to_string(list_sort(
                  list_filter(a, x -> NOT list_contains(b, x))), ','), '') AS x
         FROM t ORDER BY doc_id""")

    ,

    // Composed pipeline v4 over the wave-3 operators: crawl-shaped URL →
    // canonical registrable domain (t12's regex chain) → length quality
    // gate → per-domain quota (sp02's window) → length-bucketed
    // inference batches (p10's capacity cut) → per-batch rollup. One
    // oracle chains the identical stages, so the green hash proves the
    // wave-3 operators COMPOSE — domains fan in from four URL shapes to
    // three registrable domains, exercising the quota against real
    // contention.
    // Feature hashing (the "hashing trick"): categorical features are
    // mapped to a FIXED bucket space by hashing the feature string —
    // no vocabulary build, no driver-side dictionary, new categories
    // at serving time land in the same space. Bucket = first 3 hex
    // chars of md5(feature) (4096 buckets, engine-portable); the
    // rollup audits collisions per bucket (nf > 1 ⇒ colliding
    // features share a slot, the accepted trade-off of the trick).
    // Map-only until the bucket rollup — at 100 TB the shuffle
    // carries (bucket, feature) pairs, never document payloads.
    // Equal-width binning — the discretization for feature prep and
    // histogram features: ONE (min, max) aggregation broadcasts back and
    // bin assignment is map-only all-integer arithmetic (the e20
    // cutpoint discipline applied to fixed-width bins; no window, no
    // sort). The top edge clamps into the last bin on both engines.
    "fe04_equal_width_bins" -> api(
      (s, dir) => {
        val o = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val mm = o.agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
        o.join(broadcast(mm))
          .select(col("cents"),
            least(expr("(cents - mn) * 16 DIV (mx - mn + 1)"), lit(15L))
              .as("bin"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), min(col("cents")).as("lo"),
            max(col("cents")).as("hi"))
          .orderBy(col("bin"))
      },
      """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                    FROM orders),
         m AS (SELECT min(cents) AS mn, max(cents) AS mx FROM o)
         SELECT CAST(least((cents - mn) * 16 // (mx - mn + 1), 15) AS BIGINT)
                  AS bin,
                count(*) AS n, min(cents) AS lo, max(cents) AS hi
         FROM o, m GROUP BY 1 ORDER BY bin"""),

    // ---- geospatial family (Geo.scala): grid-bucketed spatial ops.
    // Coordinates are derived in-query from integer keys onto a
    // 1/16-degree dyadic grid ((k % 320) * 0.0625 spans [0, 20)), so
    // every coordinate, difference, square, and sum below is EXACT in
    // IEEE double — the argmin and the cell floor are bitwise
    // deterministic across engines. DuckDB literals go through
    // CAST(… AS DOUBLE) because its bare 0.0625 is DECIMAL.

    // nearest site per probe: sites announce to their 3x3 neighbor
    // cells (map-side x9 on the SMALL side), probes equi-join their one
    // cell, exact box residual, one min(struct) argmin — no cross join,
    // no per-probe subquery. The oracle replays the same semantics as a
    // window over the box join.
    "geo01_nearest_site" -> api(
      (s, dir) => {
        graft.ops.Geo.nearestJoin(
            geoGridCustomers(s, dir), "c_custkey", "plat", "plon",
            geoGridSuppliers(s, dir), "s_suppkey", "slat", "slon",
            boxDeg = 2.0, distCol = "dist2",
            metric = graft.ops.Geo.planarSq)
          .select(col("c_custkey"), col("s_suppkey").as("nearest_site"),
            col("dist2"))
          .orderBy(col("c_custkey"))
      },
      """WITH c AS (SELECT c_custkey,
                  (c_custkey % 320) * CAST(0.0625 AS DOUBLE) AS plat,
                  ((c_custkey * 7) % 320) * CAST(0.0625 AS DOUBLE) AS plon
           FROM customer),
         s AS (SELECT s_suppkey,
                  ((s_suppkey * 11) % 320) * CAST(0.0625 AS DOUBLE) AS slat,
                  ((s_suppkey * 13) % 320) * CAST(0.0625 AS DOUBLE) AS slon
           FROM supplier),
         j AS (SELECT c.c_custkey, s.s_suppkey,
                  (c.plat - s.slat) * (c.plat - s.slat)
                    + (c.plon - s.slon) * (c.plon - s.slon) AS dist2
           FROM c JOIN s
             ON abs(c.plat - s.slat) < 2.0 AND abs(c.plon - s.slon) < 2.0),
         r AS (SELECT c_custkey, s_suppkey, dist2,
                  row_number() OVER (PARTITION BY c_custkey
                                     ORDER BY dist2, s_suppkey) AS rn
           FROM j)
         SELECT c_custkey, s_suppkey AS nearest_site, dist2
         FROM r WHERE rn = 1 ORDER BY c_custkey"""),

    // spatial density grid: one quantization + one grouped count,
    // output ∝ occupied cells (the heat-map primitive)
    "geo02_cell_density" -> api(
      (s, dir) => {
        val sixt = lit(0.0625)
        val e = s.read.parquet(s"$dir/events.parquet")
          .select(((col("event_id") % 320).cast("double") * sixt).as("lat"),
            (((col("event_id") * 7) % 320).cast("double") * sixt).as("lon"))
        graft.ops.Geo.cellDensity(e, "lat", "lon", cellDeg = 1.0)
          .orderBy(col("cell_lat"), col("cell_lon"))
      },
      """WITH e AS (SELECT (event_id % 320) * CAST(0.0625 AS DOUBLE) AS lat,
                  ((event_id * 7) % 320) * CAST(0.0625 AS DOUBLE) AS lon
           FROM events)
         SELECT CAST(floor(lat / 1.0) AS BIGINT) AS cell_lat,
                CAST(floor(lon / 1.0) AS BIGINT) AS cell_lon,
                count(*) AS n
         FROM e GROUP BY 1, 2 ORDER BY cell_lat, cell_lon"""),

    // radius analytics on the boxJoin primitive: per probe, how many
    // sites fall in the box and how close the best one is — one cell
    // equi-join + one keyed rollup, pair volume ∝ local site density
    "geo04_radius_count" -> api(
      (s, dir) => {
        graft.ops.Geo.boxJoin(geoGridCustomers(s, dir), "plat", "plon",
            geoGridSuppliers(s, dir), "slat", "slon",
            boxDeg = 2.0, distCol = "d2", metric = graft.ops.Geo.planarSq)
          .groupBy(col("c_custkey"))
          .agg(count(lit(1)).as("n_sites"), min(col("d2")).as("d2min"))
          .orderBy(col("c_custkey"))
      },
      """WITH c AS (SELECT c_custkey,
                  (c_custkey % 320) * CAST(0.0625 AS DOUBLE) AS plat,
                  ((c_custkey * 7) % 320) * CAST(0.0625 AS DOUBLE) AS plon
           FROM customer),
         s AS (SELECT s_suppkey,
                  ((s_suppkey * 11) % 320) * CAST(0.0625 AS DOUBLE) AS slat,
                  ((s_suppkey * 13) % 320) * CAST(0.0625 AS DOUBLE) AS slon
           FROM supplier)
         SELECT c.c_custkey, count(*) AS n_sites,
                min((c.plat - s.slat) * (c.plat - s.slat)
                    + (c.plon - s.slon) * (c.plon - s.slon)) AS d2min
         FROM c JOIN s
           ON abs(c.plat - s.slat) < 2.0 AND abs(c.plon - s.slon) < 2.0
         GROUP BY c.c_custkey ORDER BY c.c_custkey"""),

    // haversine itself (transcendental → round-6 per the q14 float
    // discipline; association mirrored term-for-term): distance from
    // each supplier site to a fixed anchor, map-only
    "geo03_haversine" -> api(
      (s, dir) => {
        val sixt = lit(0.0625)
        val sup = s.read.parquet(s"$dir/supplier.parquet")
          .select(col("s_suppkey"),
            ((col("s_suppkey") * 11 % 320).cast("double") * sixt + 40.0)
              .as("slat"),
            ((col("s_suppkey") * 13 % 320).cast("double") * sixt - 10.0)
              .as("slon"))
        sup.select(col("s_suppkey"),
            round(graft.ops.Geo.haversineKm(
              col("slat"), col("slon"), lit(48.8566), lit(2.3522)), 6)
              .as("km"))
          .orderBy(col("s_suppkey"))
      },
      """WITH s AS (SELECT s_suppkey,
                  (s_suppkey * 11 % 320) * CAST(0.0625 AS DOUBLE)
                    + CAST(40.0 AS DOUBLE) AS slat,
                  (s_suppkey * 13 % 320) * CAST(0.0625 AS DOUBLE)
                    - CAST(10.0 AS DOUBLE) AS slon
           FROM supplier)
         SELECT s_suppkey,
                round(CAST(6371.0088 AS DOUBLE) * 2 * asin(sqrt(
                  power(sin(radians(CAST(48.8566 AS DOUBLE) - slat) / 2), 2)
                  + cos(radians(slat)) * cos(radians(CAST(48.8566 AS DOUBLE)))
                    * power(sin(radians(CAST(2.3522 AS DOUBLE) - slon) / 2), 2)
                )), 6) AS km
         FROM s ORDER BY s_suppkey"""),

    // k-nearest-sites join (Geo.knnJoin, geo05): geo01's argmin
    // generalized to k=3 through the bounded-heap topk_by aggregate —
    // only k (score, key) pairs per probe survive the partial and final
    // buffers, so the shuffle is O(k·probes) where a rank window would
    // shuffle every in-box candidate. Exact-double negation + ascending-
    // key ties keep the order bitwise-deterministic on the dyadic grid.
    "geo05_knn_sites" -> api(
      (s, dir) => {
        graft.ops.Geo.knnJoin(
            geoGridCustomers(s, dir), "c_custkey", "plat", "plon",
            geoGridSuppliers(s, dir), "s_suppkey", "slat", "slon",
            boxDeg = 2.0, k = 3, distCol = "d2",
            metric = graft.ops.Geo.planarSq)
          .orderBy(col("c_custkey"), col("rank"))
      },
      """WITH c AS (SELECT c_custkey,
                  (c_custkey % 320) * CAST(0.0625 AS DOUBLE) AS plat,
                  ((c_custkey * 7) % 320) * CAST(0.0625 AS DOUBLE) AS plon
           FROM customer),
         s AS (SELECT s_suppkey,
                  ((s_suppkey * 11) % 320) * CAST(0.0625 AS DOUBLE) AS slat,
                  ((s_suppkey * 13) % 320) * CAST(0.0625 AS DOUBLE) AS slon
           FROM supplier),
         j AS (SELECT c.c_custkey, s.s_suppkey,
                  (c.plat - s.slat) * (c.plat - s.slat)
                    + (c.plon - s.slon) * (c.plon - s.slon) AS d2
           FROM c JOIN s
             ON abs(c.plat - s.slat) < 2.0 AND abs(c.plon - s.slon) < 2.0),
         r AS (SELECT c_custkey, s_suppkey, d2,
                  row_number() OVER (PARTITION BY c_custkey
                                     ORDER BY d2, s_suppkey) AS rn
           FROM j)
         SELECT c_custkey, CAST(rn AS BIGINT) AS rank, s_suppkey, d2
         FROM r WHERE rn <= 3 ORDER BY c_custkey, rank"""),

    // point-in-polygon containment (Geo.polygonJoin, geo06): events
    // quantized onto an integer grid, tested against a broadcast
    // polygon catalog (a triangle, a CONCAVE arrow — ray casting's
    // discriminating case — and a bbox-overlapping square) with exact
    // integer ray casting (codegen'd point_in_polygon; half-open edge
    // rule, cross-multiplied intersections — no float anywhere). Probe
    // side is MAP-ONLY: bbox prune + crossing loop per broadcast
    // polygon, then one keyed rollup. The oracle re-derives the SAME
    // crossing arithmetic from an explicit edge VALUES table.
    "geo06_point_in_polygon" -> api(
      (s, dir) => {
        import s.implicits._
        val pts = s.read.parquet(s"$dir/events.parquet")
          .select(col("event_id"), (col("event_id") % 1000).as("px"),
            ((col("event_id") * 7) % 1000).as("py"))
        val polys = Seq(
          (1L, Seq(100L, 400L, 250L), Seq(100L, 100L, 400L)),
          (2L, Seq(500L, 900L, 900L, 700L, 500L),
            Seq(500L, 500L, 900L, 650L, 900L)),
          (3L, Seq(0L, 200L, 200L, 0L), Seq(0L, 0L, 200L, 200L))
        ).toDF("poly_id", "xs", "ys")
        graft.ops.Geo.polygonJoin(pts, "px", "py", polys,
            "poly_id", "xs", "ys")
          .groupBy(col("poly_id"))
          .agg(count(lit(1)).as("n_points"),
            sum(col("px")).as("sx"), sum(col("py")).as("sy"),
            min(col("event_id")).as("first_event"))
          .orderBy(col("poly_id"))
      },
      """WITH pts AS (SELECT event_id, event_id % 1000 AS px,
                             (event_id * 7) % 1000 AS py
           FROM events),
         e(pid, x1, y1, x2, y2) AS (VALUES
           (1, 100, 100, 400, 100), (1, 400, 100, 250, 400),
           (1, 250, 400, 100, 100),
           (2, 500, 500, 900, 500), (2, 900, 500, 900, 900),
           (2, 900, 900, 700, 650), (2, 700, 650, 500, 900),
           (2, 500, 900, 500, 500),
           (3, 0, 0, 200, 0), (3, 200, 0, 200, 200),
           (3, 200, 200, 0, 200), (3, 0, 200, 0, 0)),
         cr AS (SELECT p.event_id, p.px, p.py, e.pid
                FROM pts p JOIN e
                  ON ((e.y1 > p.py) <> (e.y2 > p.py))
                 AND (CASE WHEN e.y2 - e.y1 > 0
                           THEN (p.px - e.x1) * (e.y2 - e.y1)
                              < (p.py - e.y1) * (e.x2 - e.x1)
                           ELSE (p.px - e.x1) * (e.y2 - e.y1)
                              > (p.py - e.y1) * (e.x2 - e.x1) END)),
         inside AS (SELECT event_id, px, py, pid
                    FROM cr GROUP BY event_id, px, py, pid
                    HAVING count(*) % 2 = 1)
         SELECT CAST(pid AS BIGINT) AS poly_id,
                count(*) AS n_points,
                CAST(sum(px) AS BIGINT) AS sx, CAST(sum(py) AS BIGINT) AS sy,
                min(event_id) AS first_event
         FROM inside GROUP BY pid ORDER BY poly_id"""),

    // per-polygon geometry metrics (Geo.polygonMetrics, geo07): signed
    // shoelace double-area (exact integer), centroid (exact integer
    // numerators, one mirrored double division), and perimeter in 1e6
    // fixed-point (per-edge rounding BEFORE the order-free sum — the
    // t09 discipline). 60 deterministic rectangles/triangles generated
    // from id arithmetic; the oracle re-derives the SAME shoelace
    // algebra from the same generated vertex lists. Map-only.
    "geo07_polygon_metrics" -> api(
      (s, dir) => {
        val p = s.range(60).select(col("id").as("poly_id"),
          (col("id") * 37 % 500).as("a"), (col("id") * 91 % 500).as("b"),
          (col("id") % 20 + 50).as("w"), (col("id") % 30 + 40).as("h"),
          (col("id") % 17 + 10).as("c"))
        val polys = p.select(col("poly_id"),
          when(col("poly_id") % 2 === 0,
            array(col("a"), col("a") + col("w"), col("a") + col("w"),
              col("a")))
            .otherwise(array(col("a"), col("a") + col("w"),
              col("a") + col("c"))).as("xs"),
          when(col("poly_id") % 2 === 0,
            array(col("b"), col("b"), col("b") + col("h"),
              col("b") + col("h")))
            .otherwise(array(col("b"), col("b"), col("b") + col("h")))
            .as("ys"))
        graft.ops.Geo.polygonMetrics(polys, "poly_id", "xs", "ys")
          .withColumn("cx", round(col("cx"), 6))
          .withColumn("cy", round(col("cy"), 6))
          .orderBy(col("poly_id"))
      },
      """WITH p AS (SELECT i AS poly_id, (i*37)%500 AS a, (i*91)%500 AS b,
                           i%20+50 AS w, i%30+40 AS h, i%17+10 AS c
                    FROM range(60) t(i)),
         v AS (SELECT poly_id,
                 CASE WHEN poly_id%2=0 THEN [a, a+w, a+w, a]
                      ELSE [a, a+w, a+c] END AS xs,
                 CASE WHEN poly_id%2=0 THEN [b, b, b+h, b+h]
                      ELSE [b, b, b+h] END AS ys
               FROM p),
         e AS (SELECT poly_id, len(xs) AS n,
                      xs[i+1] AS x1, ys[i+1] AS y1,
                      xs[(i+1)%len(xs) + 1] AS x2,
                      ys[(i+1)%len(xs) + 1] AS y2
               FROM v, unnest(generate_series(0, len(xs)-1)) u(i)),
         m AS (SELECT poly_id, max(n) AS nv,
                      sum(x1*y2 - x2*y1) AS a2,
                      sum((x1+x2)*(x1*y2 - x2*y1)) AS cxn,
                      sum((y1+y2)*(x1*y2 - x2*y1)) AS cyn,
                      sum(CAST(round(sqrt(CAST((x2-x1)*(x2-x1)
                            + (y2-y1)*(y2-y1) AS DOUBLE)) * 1e6)
                          AS BIGINT)) AS pf
               FROM e GROUP BY poly_id)
         SELECT poly_id, CAST(nv AS BIGINT) AS n_vertices,
                CAST(a2 AS BIGINT) AS area2_signed,
                CAST(abs(a2) AS DOUBLE) / 2.0 AS area,
                round(CASE WHEN a2 <> 0
                  THEN CAST(cxn AS DOUBLE) / CAST(a2*3 AS DOUBLE) END, 6)
                  AS cx,
                round(CASE WHEN a2 <> 0
                  THEN CAST(cyn AS DOUBLE) / CAST(a2*3 AS DOUBLE) END, 6)
                  AS cy,
                CAST(pf AS BIGINT) AS perimeter_fp
         FROM m ORDER BY poly_id"""),

    // smoothed target encoding (the leakage-safe categorical feature):
    // enc(cat) = (cat_sum + m·prior) / (cat_n + m) with prior = global
    // mean, m = 100. ONE grouped agg + ONE broadcast global row; the
    // arithmetic is exact-long sums cast to double through a
    // correctly-rounded chain mirrored association-for-association, so
    // both engines produce identical doubles before the final round
    // per-row z-score standardization (fe06): the feature-scaling
    // staple, exact in the g19 discipline: integer moment sums through
    // DECIMAL(38,0) (widen-first products), then ONE mirrored
    // correctly-rounded chain (n.x - S1) / sqrt(n.S2 - S1^2) per row.
    // One global agg broadcast back over the scan; map-only after it.
    "fe06_standardize" -> api(
      (s, dir) => {
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val xd = col("n_chars").cast("long").cast(d38)
        val st = docs.filter(col("n_chars").isNotNull)
          .agg(count(lit(1)).cast(d38).as("__n"),
            sum(xd).as("__s1"), sum(xd * xd).as("__s2"))
        docs.filter(col("n_chars").isNotNull)
          .join(broadcast(st))
          .select(col("doc_id"),
            round((col("__n") * xd - col("__s1")).cast("double")
              / sqrt((col("__n") * col("__s2") - col("__s1") * col("__s1"))
                .cast("double")), 6).as("z"))
          .orderBy(col("doc_id"))
      },
      """WITH s AS (SELECT count(*) AS n, sum(n_chars) AS s1,
                  sum(n_chars * CAST(n_chars AS BIGINT)) AS s2
           FROM documents WHERE n_chars IS NOT NULL)
         SELECT doc_id,
                round(CAST(n * n_chars - s1 AS DOUBLE)
                      / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)), 6) AS z
         FROM documents, s WHERE n_chars IS NOT NULL
         ORDER BY doc_id"""),

    "fe05_target_encoding" -> api(
      (s, dir) => {
        val c = s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_mktsegment"),
            round(col("c_acctbal") * 100).cast("long").as("cents"))
        val g = c.agg(sum(col("cents")).as("gs"),
          count(lit(1)).as("gn"))
        c.groupBy(col("c_mktsegment"))
          .agg(sum(col("cents")).as("cs"), count(lit(1)).as("cn"))
          .join(broadcast(g))
          .select(col("c_mktsegment"), col("cn").as("n"),
            round((col("cs").cast("double") +
                lit(100.0) * (col("gs").cast("double") / col("gn"))) /
              (col("cn") + lit(100L)).cast("double"), 6).as("enc"))
          .orderBy(col("c_mktsegment"))
      },
      """WITH c AS (SELECT c_mktsegment,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
         g AS (SELECT CAST(sum(cents) AS DOUBLE) AS gs,
                      count(*) AS gn FROM c),
         k AS (SELECT c_mktsegment, CAST(sum(cents) AS DOUBLE) AS cs,
                      count(*) AS cn FROM c GROUP BY c_mktsegment)
         SELECT k.c_mktsegment, k.cn AS n,
                round((k.cs + 100.0 * (g.gs / g.gn))
                      / CAST(k.cn + 100 AS DOUBLE), 6) AS enc
         FROM k, g ORDER BY k.c_mktsegment"""),

    "fe01_feature_hash" -> api(
      (s, dir) => {
        s.read.parquet(s"$dir/documents.parquet")
          .select(explode(array(
            concat(lit("lang="), col("lang")),
            concat(lit("source="), col("source")),
            concat(lit("len_bucket="),
              expr("n_chars div 500").cast("string")))).as("feat"))
          .select(col("feat"), substring(md5(col("feat")), 1, 3).as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            count_distinct(col("feat")).as("nf"),
            min(col("feat")).as("first_feat"))
          .orderBy(col("bucket"))
      },
      """WITH f AS (
           SELECT unnest([ 'lang=' || lang, 'source=' || source,
                           'len_bucket=' || CAST(n_chars // 500 AS VARCHAR) ])
                  AS feat
           FROM documents)
         SELECT substr(md5(feat), 1, 3) AS bucket, count(*) AS n,
                count(DISTINCT feat) AS nf, min(feat) AS first_feat
         FROM f GROUP BY 1 ORDER BY bucket"""),

    // Group-mean imputation — the standard repair for a feature column
    // with holes: nulls take their group's mean, groups that are ALL
    // null fall back to the global mean. Nulls are planted in-query
    // (doc_id % 7 = 0) so the oracle re-derives the exact same holes.
    // Means are exact integer-sum ÷ count in one fixed-order double
    // division; one rollup per grain plus a broadcast of the one-row
    // global — the imputed scan itself stays map-only.
    "fe03_impute" -> api(
      (s, dir) => {
        val d = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"),
            when(col("doc_id") % 7 === 0, lit(null).cast("long"))
              .otherwise(col("n_chars")).as("v"))
        val byLang = d.filter(col("v").isNotNull)
          .groupBy(col("lang"))
          .agg(sum(col("v")).as("__s"), count(lit(1)).as("__c"))
          .select(col("lang"),
            (col("__s").cast("double") / col("__c").cast("double")).as("__gm"))
        val global = d.filter(col("v").isNotNull)
          .agg((sum(col("v")).cast("double") / count(lit(1)).cast("double"))
            .as("__gg"))
        d.join(byLang, Seq("lang"), "left").join(broadcast(global))
          .select(col("doc_id"), col("lang"),
            round(coalesce(col("v").cast("double"), col("__gm"), col("__gg")), 6)
              .as("v_imputed"),
            col("v").isNull.as("was_imputed"))
          .orderBy(col("doc_id"))
      },
      """WITH d AS (SELECT doc_id, lang,
                  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS v
           FROM documents),
         bl AS (SELECT lang,
                  CAST(sum(v) AS DOUBLE) / CAST(count(v) AS DOUBLE) AS gm
                FROM d WHERE v IS NOT NULL GROUP BY 1),
         g AS (SELECT CAST(sum(v) AS DOUBLE) / CAST(count(v) AS DOUBLE) AS gg
               FROM d WHERE v IS NOT NULL)
         SELECT doc_id, lang,
                round(coalesce(CAST(v AS DOUBLE), bl.gm, g.gg), 6) AS v_imputed,
                v IS NULL AS was_imputed
         FROM d LEFT JOIN bl USING (lang), g
         ORDER BY doc_id"""),

    // Smoothed mean-target encoding — the leakage-prone feature op done
    // the distributed-safe way: one pass computes per-category (n, sum)
    // plus the global prior, the encode is (sum + m·prior)/(n + m) with
    // m = 20 — additive smoothing pulls rare categories toward the
    // prior so a 1-row category can't memorize its target. Integer
    // sums + one fixed-order double expression (bit-reproducible);
    // the broadcast global is ONE row. Target here is n_chars.
    "fe02_target_encode" -> api(
      (s, dir) => {
        val d = s.read.parquet(s"$dir/documents.parquet")
          .select(col("lang"), col("n_chars"))
        val g = d.agg(sum(col("n_chars")).as("__ts"),
          count(lit(1)).as("__tn"))
        d.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
          .join(broadcast(g))
          .select(col("lang"), col("n"), col("sc").cast("long").as("sc"),
            round((col("sc").cast("double") +
              lit(20.0) * (col("__ts").cast("double") / col("__tn").cast("double")))
              / (col("n").cast("double") + lit(20.0)), 6).as("enc"))
          .orderBy(col("lang"))
      },
      """WITH g AS (SELECT CAST(sum(n_chars) AS DOUBLE) AS ts,
                           CAST(count(*) AS DOUBLE) AS tn FROM documents),
         c AS (SELECT lang, count(*) AS n, sum(n_chars) AS sc
               FROM documents GROUP BY lang)
         SELECT lang, n, CAST(sc AS BIGINT) AS sc,
                round((CAST(sc AS DOUBLE) + 20.0 * (g.ts / g.tn))
                      / (CAST(n AS DOUBLE) + 20.0), 6) AS enc
         FROM c, g ORDER BY lang"""),

    "p11_pipeline_v4" -> api(
      (s, dir) => {
        val T = graft.ops.TextOps
        val id = col("doc_id")
        val url = when(id % 4 === 0,
            concat(lit("HTTP://WWW."), upper(col("source")),
              lit(".Example.COM:80/Docs/"), id,
              lit("/?utm_source=feed&utm_campaign=x")))
          .when(id % 4 === 1,
            concat(lit("https://"), col("source"), lit(".example.com/docs/"),
              id, lit("?id="), id, lit("&fbclid=abc#sec2")))
          .when(id % 4 === 2,
            concat(lit("https://cdn.Example.co.UK:443/assets/"), id, lit("/")))
          .otherwise(
            concat(lit("http://"), col("source"),
              lit(".example.net/p?a=1&utm_medium=m&b="), id))
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .withColumn("domain", T.registrableDomain(url))
          .filter(col("n_chars") >= 200)
        val quota = graft.ops.Sampling.perGroupQuota(docs, "domain",
          "n_chars", "doc_id", quota = 60)
        graft.ops.Packing.lengthBatches(quota, "doc_id", "domain",
            graft.ops.TextAnalysis.tokenCount(coalesce(col("text"), lit(""))),
            widthTokens = 64, maxBatchTokens = 2048)
          .groupBy(col("domain"), col("bucket_len"), col("batch_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("tok_sum"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("domain"), col("bucket_len"), col("batch_id"))
      },
      """WITH r AS (SELECT doc_id, source, n_chars, text,
             CASE WHEN doc_id % 4 = 0 THEN 'HTTP://WWW.' || upper(source) ||
                    '.Example.COM:80/Docs/' || doc_id ||
                    '/?utm_source=feed&utm_campaign=x'
                  WHEN doc_id % 4 = 1 THEN 'https://' || source ||
                    '.example.com/docs/' || doc_id || '?id=' || doc_id ||
                    '&fbclid=abc#sec2'
                  WHEN doc_id % 4 = 2 THEN 'https://cdn.Example.co.UK:443/assets/'
                    || doc_id || '/'
                  ELSE 'http://' || source ||
                    '.example.net/p?a=1&utm_medium=m&b=' || doc_id
             END AS u
           FROM documents),
         h AS (SELECT *, lower(regexp_extract(u, '://([^/:?#]+)', 1)) AS host
               FROM r),
         dm AS (SELECT doc_id, n_chars, text,
                CASE WHEN len(string_split(host, '.')) <= 2 THEN host
                     WHEN string_split(host, '.')[-2] IN
                          ('co', 'com', 'net', 'org', 'ac', 'gov', 'edu')
                       THEN string_split(host, '.')[-3] || '.' ||
                            string_split(host, '.')[-2] || '.' ||
                            string_split(host, '.')[-1]
                     ELSE string_split(host, '.')[-2] || '.' ||
                          string_split(host, '.')[-1]
                END AS domain
               FROM h WHERE n_chars >= 200),
         q AS (SELECT domain, doc_id, text FROM (
                 SELECT *, row_number() OVER (PARTITION BY domain
                            ORDER BY n_chars, doc_id) AS rn
                 FROM dm) t WHERE rn <= 60),
         tok AS (SELECT domain, doc_id,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '\w+'))
                        AS BIGINT) AS n_tokens
                 FROM q),
         b AS (SELECT domain, doc_id, n_tokens,
                 greatest((n_tokens + 63) // 64, 1) * 64 AS bucket_len
               FROM tok),
         rr AS (SELECT *, row_number() OVER (PARTITION BY domain, bucket_len
                           ORDER BY doc_id) AS rn2
                FROM b),
         lb AS (SELECT domain, doc_id, n_tokens, bucket_len,
                  CAST((rn2 - 1) // greatest(2048 // bucket_len, 1) AS BIGINT)
                    AS batch_id
                FROM rr)
         SELECT domain, bucket_len, batch_id, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS tok_sum,
                min(doc_id) AS first_doc
         FROM lb GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")

    ,

    // Exact per-group heavy hitters (top-3 most frequent order
    // priorities per order status) WITHOUT a rank window: first a
    // map-side-combined count aggregation collapses the stream to one
    // row per distinct (flag, mode) — bounded by the value domain, not
    // the row count — then a per-flag collect_list over that tiny
    // domain is sorted and sliced. At 1e11 rows the second stage still
    // sees ≤ |priorities| rows per flag. Ties break by ascending mode
    // (the -cnt/mode struct sort key), mirrored in the oracle's window
    // ORDER BY.
    // EXACT order statistics per group — median / p25 / p90 via Spark's
    // exact `percentile` aggregate (bit-identical to DuckDB's
    // quantile_cont on this data, verified on the interpolated p90
    // bits) — plus a deterministic MODE: most frequent quantity with
    // ties broken to the smallest value, built relationally
    // (frequency rollup -> per-group max-count window -> conditional
    // min) so both engines resolve ties identically where a native
    // mode() aggregate is free to pick either. Exact per-group
    // percentiles need the group's values together — that's one keyed
    // shuffle; the mode branch rides a rollup whose cardinality is
    // (groups x distinct quantities), tiny next to the fact table.
    "g15_quantiles_mode" -> api(
      (s, dir) => {
        val li = s.read.parquet(s"$dir/lineitem.parquet")
        val quant = li.groupBy(col("l_returnflag"))
          .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("med_q"),
            round(expr("percentile(l_quantity, 0.25)"), 6).as("p25_q"),
            round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"))
        val freq = li.groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("c"))
          .withColumn("mc", max(col("c")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("l_returnflag"))))
        val mode = freq.groupBy(col("l_returnflag"))
          .agg(min(when(col("c") === col("mc"), col("l_quantity")))
            .as("mode_q"))
        quant.join(mode, Seq("l_returnflag")).orderBy(col("l_returnflag"))
      },
      """WITH q AS (
           SELECT l_returnflag,
                  round(quantile_cont(l_quantity, 0.5), 6) AS med_q,
                  round(quantile_cont(l_quantity, 0.25), 6) AS p25_q,
                  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
           FROM lineitem GROUP BY l_returnflag),
         f AS (SELECT l_returnflag, l_quantity, count(*) AS c
               FROM lineitem GROUP BY l_returnflag, l_quantity),
         fm AS (SELECT *, max(c) OVER (PARTITION BY l_returnflag) AS mc
                FROM f),
         m AS (SELECT l_returnflag,
                      min(CASE WHEN c = mc THEN l_quantity END) AS mode_q
               FROM fm GROUP BY l_returnflag)
         SELECT q.l_returnflag, med_q, p25_q, p90_price, mode_q
         FROM q JOIN m ON m.l_returnflag = q.l_returnflag
         ORDER BY q.l_returnflag"""),

    "g14_heavy_hitters" -> api(
      (s, dir) => {
        val counts = s.read.parquet(s"$dir/orders.parquet")
          .groupBy(col("o_orderstatus").as("flag"), col("o_orderpriority").as("mode"))
          .agg(count(lit(1)).as("cnt"))
        counts.groupBy(col("flag"))
          .agg(slice(sort_array(collect_list(
            struct((-col("cnt")).as("nc"), col("mode"), col("cnt")))), 1, 3)
            .as("top"))
          .select(col("flag"), posexplode(col("top")))
          .select(col("flag"), (col("pos") + 1).cast("long").as("rank"),
            col("col.mode").as("mode"), col("col.cnt").as("cnt"))
          .orderBy(col("flag"), col("rank"))
      },
      """WITH c AS (SELECT o_orderstatus AS flag, o_orderpriority AS mode,
                           count(*) AS cnt
                    FROM orders GROUP BY 1, 2),
         r AS (SELECT flag, mode, cnt,
                      row_number() OVER (PARTITION BY flag
                                         ORDER BY cnt DESC, mode) AS rank
               FROM c)
         SELECT flag, CAST(rank AS BIGINT) AS rank, mode, cnt
         FROM r WHERE rank <= 3 ORDER BY flag, rank""")

    ,

    // Schema-evolution union: two relations with different column sets
    // and orders merged BY NAME (missing columns null-filled) — how
    // heterogeneous corpus shards with drifting schemas stack into one
    // table. The synthetic line number keeps the ORDER BY key set unique
    // across both branches without nullable sort keys.
    "set03_union_by_name" -> api(
      (s, dir) => {
        val a = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey").as("key"), lit(0L).as("ln"),
            col("o_orderpriority").as("grp"), col("o_totalprice").as("val"))
        val b = s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_linestatus").as("grp"),
            col("l_orderkey").as("key"),
            col("l_linenumber").cast("long").as("ln"),
            col("l_quantity").as("extra"))
        a.unionByName(b, allowMissingColumns = true)
          .orderBy(col("key"), col("ln"))
      },
      """SELECT key, ln, grp, val, extra FROM (
           SELECT o_orderkey AS key, CAST(0 AS BIGINT) AS ln,
                  o_orderpriority AS grp, o_totalprice AS val,
                  CAST(NULL AS DOUBLE) AS extra
           FROM orders
           UNION ALL
           SELECT l_orderkey, CAST(l_linenumber AS BIGINT), l_linestatus,
                  CAST(NULL AS DOUBLE), l_quantity
           FROM lineitem) t
         ORDER BY key, ln""")

    ,

    // Partition integrity manifest: per-bucket row count, char volume,
    // and an ORDER-INDEPENDENT content checksum (sum of md5-prefix
    // integers over id+payload) — the artifact a 100 TB export job
    // publishes so a downstream consumer can verify each shard without
    // re-reading its neighbors. One map-side-combined aggregation; the
    // md5 bucket assignment is the sp01 deterministic-hash discipline,
    // so the manifest is reproducible across engines and runs.
    "pr09_manifest" -> api(
      (s, dir) => {
        // checksum sums 32-bit (8-hex) md5 prefixes in an Int64: overflow
        // -free by construction up to 2^63/2^32 = 2^31 (~2.1e9) rows PER
        // BUCKET (r8 ADVICE: the previous 48-bit prefix wrapped silently
        // past ~65k average-valued rows — Spark wraps where DuckDB's
        // HUGEINT would diverge). Widen the bucket count, not the
        // prefix, if a 100 TB export exceeds that per-bucket bound.
        val d = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"),
            col("n_chars"))
        d.select(
            (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
              .cast("long") % 8).as("bucket"),
            col("n_chars"),
            conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":"), col("t"))), 1, 8), 16, 10).cast("long").as("h"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars")).cast("long").as("total_chars"),
            sum(col("h")).cast("long").as("checksum"))
          .orderBy(col("bucket"))
      },
      """WITH d AS (SELECT doc_id, coalesce(text, '') AS t, n_chars
                    FROM documents)
         SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                       ::BIGINT % 8 AS BIGINT) AS bucket,
                count(*) AS n_rows,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || t),
                         1, 8))::BIGINT) AS BIGINT) AS checksum
         FROM d GROUP BY 1 ORDER BY bucket""")

    ,

    // Point-in-time join against an SCD2 dimension — the feature-store
    // correctness join: each click is matched to the signup VERSION that
    // was valid at its event time (user equi-key + validity-window
    // residual over Cdc.scd2's eff_from/eff_to), never a future one —
    // the leakage a plain latest-version join commits. Rolled up per
    // signup-cohort day (clicks before any signup land in cohort −1).
    // One user-keyed shuffle; validity windows per user are few, so the
    // residual runs inside the hash join.
    "a03_scd2_pit" -> api(
      (s, dir) => {
        val MpD = graft.streaming.Events.MicrosPerDay
        val ev = graft.streaming.Events.readRaw(s, dir)
        val dim = graft.ops.Cdc.scd2(
          ev.filter(col("event_type") === "signup")
            .select(col("user_id").as("d_user"), col("ts").as("eff_from")),
          Seq("d_user"), "eff_from")
        val facts = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts"))
        facts.join(dim, col("user_id") === col("d_user") &&
            col("ts") >= col("eff_from") && col("ts") < col("eff_to"),
            "left")
          .select(col("event_id"), col("user_id"),
            when(col("eff_from").isNull, lit(-1L))
              .otherwise(expr(s"eff_from div $MpD")).as("cohort_day"))
          .groupBy(col("cohort_day"))
          .agg(count(lit(1)).as("n_clicks"),
            count_distinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_day"))
      },
      """WITH sg AS (SELECT user_id, epoch_us(ts) AS eff_from
                     FROM events WHERE event_type = 'signup'),
         d AS (SELECT user_id, eff_from,
                 coalesce(lead(eff_from) OVER (PARTITION BY user_id
                   ORDER BY eff_from), 9223372036854775807) AS eff_to
               FROM sg),
         f AS (SELECT user_id, event_id, epoch_us(ts) AS ts
               FROM events WHERE event_type = 'click'),
         j AS (SELECT f.event_id, f.user_id, d.eff_from
               FROM f LEFT JOIN d ON d.user_id = f.user_id
                 AND f.ts >= d.eff_from AND f.ts < d.eff_to)
         SELECT CASE WHEN eff_from IS NULL THEN -1
                     ELSE eff_from // 86400000000 END AS cohort_day,
                count(*) AS n_clicks,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM j GROUP BY 1 ORDER BY cohort_day"""),

    // Exact two-sample Kolmogorov–Smirnov drift per event type — the
    // unbinned complement to pr04's PSI: D = max |ECDF_A − ECDF_B| over
    // the even/odd event_id cohorts, computed ENTIRELY in integers
    // (max |ca·nB − cb·nA| over the value-sorted merge, divided once at
    // the end) so no float accumulation can split the engines. Work
    // collapses to one (type, value) rollup; the running counts window
    // over that distinct-value relation.
    // Declarative data-quality expectation suite (the Great-
    // Expectations/dbt-test shape): six checks — positivity, domain
    // membership, regex format, date range, not-null, key uniqueness —
    // evaluated in ONE pass over orders as conditional sums inside a
    // single aggregate, then unpivoted via stack() into the
    // (check, n_pass, n_fail, pass_rate) report. At 100 TB this is the
    // cheapest possible audit: one scan, map-side combined partials,
    // a 1-row shuffle; uniqueness rides the same pass as
    // count(DISTINCT key) instead of a separate self-join.
    "pr14_expectations" -> api(
      (s, dir) => {
        val o = s.read.parquet(s"$dir/orders.parquet")
        o.agg(count(lit(1)).as("n"),
            sum(when(col("o_totalprice") > 0, 1L).otherwise(0L)).as("c1"),
            sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L)
              .otherwise(0L)).as("c2"),
            sum(when(col("o_orderpriority").rlike("^[1-5]-"), 1L)
              .otherwise(0L)).as("c3"),
            sum(when(expr("o_orderdate >= timestamp'1992-01-01' and " +
              "o_orderdate < timestamp'2000-01-01'"), 1L)
              .otherwise(0L)).as("c4"),
            sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("c5"),
            count_distinct(col("o_orderkey")).as("c6"))
          .selectExpr("""stack(6,
              'custkey_not_null', c5,
              'orderdate_in_range', c4,
              'orderkey_unique', c6,
              'priority_format', c3,
              'status_in_domain', c2,
              'totalprice_positive', c1) as (check_name, n_pass)""", "n")
          .select(col("check_name"), col("n_pass"),
            (col("n") - col("n_pass")).as("n_fail"),
            round(col("n_pass") / col("n"), 6).as("pass_rate"))
          .orderBy(col("check_name"))
      },
      """WITH a AS (SELECT count(*) AS n,
           CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS c1,
           CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1
                    ELSE 0 END) AS BIGINT) AS c2,
           CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                    THEN 1 ELSE 0 END) AS BIGINT) AS c3,
           CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1992-01-01'
                         AND o_orderdate < TIMESTAMP '2000-01-01'
                    THEN 1 ELSE 0 END) AS BIGINT) AS c4,
           CAST(sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS c5,
           count(DISTINCT o_orderkey) AS c6
         FROM orders),
         u AS (
           SELECT 'custkey_not_null' AS check_name, c5 AS n_pass, n FROM a
           UNION ALL SELECT 'orderdate_in_range', c4, n FROM a
           UNION ALL SELECT 'orderkey_unique', c6, n FROM a
           UNION ALL SELECT 'priority_format', c3, n FROM a
           UNION ALL SELECT 'status_in_domain', c2, n FROM a
           UNION ALL SELECT 'totalprice_positive', c1, n FROM a)
         SELECT check_name, n_pass, n - n_pass AS n_fail,
                round(CAST(n_pass AS DOUBLE) / n, 6) AS pass_rate
         FROM u ORDER BY check_name"""),

    // chi-square test of independence (event_type × user-parity
    // contingency) + Cramér's V effect size. The full r×c grid comes
    // from a broadcast cross of the two TINY margin rollups (so
    // zero-observation cells contribute their expected mass, as the
    // statistic requires); each cell's (o−e)²/e term is rounded to 9
    // and summed as DECIMAL — the pr16 discipline that makes the
    // floating sum partition-order independent and cross-engine exact.
    // k-anonymity release audit (Profile.kAnonymity, pr21): the privacy
    // gate before data leaves the pipeline — rows whose quasi-identifier
    // combination (nation, market segment) is shared by fewer than k=10
    // rows are re-identifiable to a < k-person crowd. One keyed rollup
    // (shuffle ∝ distinct combinations) folded into one summary row.
    // Data-quality expectation suite (pr22): the dbt-test /
    // Great-Expectations contract gate — not_null / accepted_values /
    // between / matches_regex fuse into ONE aggregation pass of
    // conditional sums; each unique() is one keyed agg (violations =
    // duplicated rows beyond the first per key = N − distinct keys).
    // Violations are PLANTED (the fe03 null trick + a narrowed accepted
    // set + a tight bound) so every check kind exercises both verdicts
    // and the oracle re-derives exact counts.
    "pr22_expectations" -> api(
      (s, dir) => {
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_discount"),
            when(col("l_orderkey") % 7 === 0, lit(null).cast("string"))
              .otherwise(col("l_linestatus")).as("status"))
        graft.ops.Profile.expectations(li, Seq(
            graft.ops.Profile.NotNull("status"),
            graft.ops.Profile.AcceptedValues("l_returnflag", Seq("A", "N")),
            graft.ops.Profile.Between("l_discount", 0.0, 0.05),
            graft.ops.Profile.MatchesRegex("status", "^[OF]$"),
            graft.ops.Profile.Unique(Seq("l_orderkey", "l_linenumber")),
            graft.ops.Profile.Unique(Seq("l_orderkey"))))
          .orderBy(col("check"), col("target"))
      },
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                  l_discount,
                  CASE WHEN l_orderkey % 7 = 0 THEN NULL
                       ELSE l_linestatus END AS status
           FROM lineitem),
         r AS (
           SELECT 1 AS ord, 'not_null' AS chk, 'status' AS target,
                  CAST(sum(CASE WHEN status IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_violations
           FROM li
           UNION ALL
           SELECT 2, 'accepted_values', 'l_returnflag',
                  CAST(sum(CASE WHEN l_returnflag IS NOT NULL
                                 AND l_returnflag NOT IN ('A', 'N')
                                THEN 1 ELSE 0 END) AS BIGINT)
           FROM li
           UNION ALL
           SELECT 3, 'between', 'l_discount',
                  CAST(sum(CASE WHEN l_discount IS NOT NULL
                                 AND (l_discount < 0.0 OR l_discount > 0.05)
                                THEN 1 ELSE 0 END) AS BIGINT)
           FROM li
           UNION ALL
           SELECT 4, 'matches_regex', 'status',
                  CAST(sum(CASE WHEN status IS NOT NULL
                                 AND NOT regexp_matches(status, '^[OF]$')
                                THEN 1 ELSE 0 END) AS BIGINT)
           FROM li
           UNION ALL
           SELECT 5, 'unique', 'l_orderkey,l_linenumber',
                  count(*) - count(DISTINCT (l_orderkey, l_linenumber))
           FROM li
           UNION ALL
           SELECT 6, 'unique', 'l_orderkey',
                  count(*) - count(DISTINCT l_orderkey)
           FROM li)
         SELECT chk AS check, target, n_violations,
                n_violations = 0 AS passed
         FROM (SELECT * FROM r ORDER BY chk, target, ord)""" ),

    "pr21_k_anonymity" -> api(
      (s, dir) => {
        graft.ops.Profile.kAnonymity(
          s.read.parquet(s"$dir/customer.parquet"),
          Seq("c_nationkey", "c_mktsegment"), k = 10L)
      },
      """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
                    FROM customer GROUP BY 1, 2)
         SELECT CAST(10 AS BIGINT) AS k_threshold,
                CAST(min(n) AS BIGINT) AS k_actual,
                count(*) AS n_groups,
                CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_violating_groups,
                CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
                  AS rows_at_risk,
                round(CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS DOUBLE)
                      / sum(n), 6) AS risk_fraction
         FROM g"""),

    "pr20_chi_square" -> api(
      (s, dir) => {
        val E = graft.streaming.Events
        val ev = E.readRaw(s, dir)
          .filter(col("event_type").isNotNull)
          .select(col("event_type").as("r"),
            coalesce(col("user_id") % 2 === 0, lit(false)).as("ca"))
        // margins and totals derive from the ONE cells rollup — the
        // events corpus is scanned exactly once, everything after is
        // O(distinct cells)
        val cells = ev.groupBy(col("r"), col("ca")).agg(count(lit(1)).as("o"))
          .localCheckpoint(false)
        val rmarg = cells.groupBy(col("r")).agg(sum(col("o")).as("ro"))
        val cmarg = cells.groupBy(col("ca")).agg(sum(col("o")).as("co"))
        val tot = cells.agg(sum(col("o")).as("n"),
          count_distinct(col("r")).as("nr"))
        val eExp = (col("ro").cast("double") * col("co")) / col("n")
        rmarg.crossJoin(broadcast(cmarg))
          .join(cells, Seq("r", "ca"), "left")
          .join(broadcast(tot))
          .select(col("n"), col("nr"),
            // decimal(38,9): a chi-square term is bounded by n, not by
            // 1/e like pr16's entropy terms — 18,9 would NULL out (and
            // silently drop) a concentrated cell at ~1e9 rows
            round((coalesce(col("o"), lit(0L)) - eExp) *
                (coalesce(col("o"), lit(0L)) - eExp) / eExp, 9)
              .cast("decimal(38,9)").as("term"))
          .agg(max(col("n")).as("n"), max(col("nr")).as("n_rows_dim"),
            sum(col("term")).as("__chi"))
          .select(col("n"), col("n_rows_dim"),
            round(col("__chi").cast("double"), 6).as("chi2"),
            round(sqrt(col("__chi").cast("double") /
              (col("n") * least(col("n_rows_dim") - 1, lit(1L)))
                .cast("double")), 6).as("cramers_v"))
      },
      """WITH e AS (SELECT event_type AS r,
                  coalesce(user_id % 2 = 0, false) AS ca
           FROM events WHERE event_type IS NOT NULL),
         cells AS (SELECT r, ca, count(*) AS o FROM e GROUP BY r, ca),
         rm AS (SELECT r, count(*) AS ro FROM e GROUP BY r),
         cm AS (SELECT ca, count(*) AS co FROM e GROUP BY ca),
         t AS (SELECT count(*) AS n, count(DISTINCT r) AS nr FROM e),
         g AS (SELECT rm.r, cm.ca, rm.ro, cm.co FROM rm CROSS JOIN cm),
         terms AS (SELECT t.n, t.nr,
                  round((coalesce(cells.o, 0)
                           - (CAST(g.ro AS DOUBLE) * g.co) / t.n)
                        * (coalesce(cells.o, 0)
                           - (CAST(g.ro AS DOUBLE) * g.co) / t.n)
                        / ((CAST(g.ro AS DOUBLE) * g.co) / t.n), 9)
                    AS term
           FROM g LEFT JOIN cells ON g.r = cells.r AND g.ca = cells.ca
                  CROSS JOIN t),
         m AS (SELECT CAST(max(n) AS BIGINT) AS n,
                  CAST(max(nr) AS BIGINT) AS n_rows_dim,
                  sum(CAST(term AS DECIMAL(38,9))) AS chi FROM terms)
         SELECT n, n_rows_dim, round(CAST(chi AS DOUBLE), 6) AS chi2,
                round(sqrt(CAST(chi AS DOUBLE)
                           / CAST(n * least(n_rows_dim - 1, 1) AS DOUBLE)),
                      6) AS cramers_v
         FROM m"""),

    // Mann–Whitney U / ROC-AUC of "does event value separate purchases
    // from the rest": AUC = P(score_pos > score_neg) + ½·P(=), held as
    // the EXACT integer 2U = Σ_v p_v·(2·negs_below(v) + negs_at(v))
    // from one value-keyed rollup + one cumulative window on the
    // distinct-value relation (pr18's shape; midrank tie handling falls
    // out of the +negs_at term with no rational midranks anywhere).
    // Products widen through DECIMAL(38,0); the only float is the final
    // mirrored division.
    "pr19_auc_mwu" -> api(
      (s, dir) => {
        val E = graft.streaming.Events
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = E.readRaw(s, dir)
          .filter(col("value").isNotNull)
          .select(round(col("value") * 100).cast("long").as("cents"),
            coalesce(col("event_type") === "purchase", lit(false)).as("pos"))
        val counts = ev.groupBy(col("cents")).agg(
          sum(when(col("pos"), 1L).otherwise(0L)).as("p"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("q"))
        // totals fold the value-keyed rollup, not a second corpus scan
        val tot = counts.agg(sum(col("p")).as("np"), sum(col("q")).as("nq"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("cents")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        counts
          .select(col("p"), col("q"),
            (sum(col("q")).over(w) - col("q")).as("qb"))
          .agg(sum(col("p").cast(d38) *
              (lit(2).cast(d38) * col("qb").cast(d38) + col("q").cast(d38)))
            .cast("long").as("u2"))
          .join(broadcast(tot))
          .select(col("u2"), col("np"), col("nq"),
            (col("u2").cast("double") /
              (lit(2.0) * (col("np").cast("double") * col("nq").cast("double"))))
              .as("auc"))
      },
      """WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                  coalesce(event_type = 'purchase', false) AS pos
           FROM events WHERE value IS NOT NULL),
         c AS (SELECT cents,
                  sum(CASE WHEN pos THEN 1 ELSE 0 END) AS p,
                  sum(CASE WHEN pos THEN 0 ELSE 1 END) AS q
           FROM e GROUP BY cents),
         t AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
                  sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nq FROM e),
         a AS (SELECT p, q,
                  sum(q) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) - q AS qb
           FROM c),
         m AS (SELECT CAST(sum(p * (2*qb + q)) AS BIGINT) AS u2 FROM a)
         SELECT m.u2, CAST(t.np AS BIGINT) AS np, CAST(t.nq AS BIGINT) AS nq,
                CAST(m.u2 AS DOUBLE)
                  / (2.0 * (CAST(t.np AS DOUBLE) * CAST(t.nq AS DOUBLE)))
                  AS auc
         FROM m CROSS JOIN t"""),

    // join-cardinality profiling FROM STATISTICS: |A ⋈ B on k| =
    // Σ_k n_A(k)·n_B(k), computed from two per-key count rollups and a
    // join of the (distinct-key-sized) count tables — the fan-out
    // estimator a planner/skew-audit consults WITHOUT paying the join's
    // output volume. The oracle EXECUTES the join and must agree
    // exactly; at 100 TB the statistics path shuffles O(distinct keys)
    // while the verified quantity is O(join output).
    "pr17_join_cardinality" -> api(
      (s, dir) => {
        val o = s.read.parquet(s"$dir/orders.parquet")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_o"))
        val e = s.read.parquet(s"$dir/events.parquet")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_e"))
        o.join(e, col("o_custkey") === col("user_id"))
          .agg(coalesce(sum(col("n_o") * col("n_e")), lit(0L))
              .as("join_rows"),
            count(lit(1)).as("n_common_keys"),
            max(col("n_o") * col("n_e")).as("max_key_fanout"))
      },
      """SELECT (SELECT count(*) FROM orders o JOIN events e
                   ON o.o_custkey = e.user_id) AS join_rows,
                (SELECT count(*) FROM
                   (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_custkey IN (SELECT user_id FROM events)) t)
                  AS n_common_keys,
                (SELECT max(n_o * n_e) FROM
                   (SELECT o_custkey, count(*) AS n_o FROM orders
                    GROUP BY o_custkey) a
                   JOIN (SELECT user_id, count(*) AS n_e FROM events
                         GROUP BY user_id) b ON a.o_custkey = b.user_id)
                  AS max_key_fanout"""),

    // Per-column Shannon entropy — the concentration profile that flags
    // near-constant columns (entropy ≈ 0) and id-like columns (entropy
    // ≈ ln N) before anyone joins or models on them. Determinism: each
    // value's −p·ln p term is rounded to 9 and cast to DECIMAL, so the
    // per-column SUM is exact integer arithmetic (partition-order
    // independent — the t21 discipline); one keyed rollup per column,
    // entropy reduces over the distinct-value relation.
    "pr16_entropy" -> api(
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        def colEntropy(c: String) = {
          val vc = ev.filter(col(c).isNotNull)
            .groupBy(col(c).cast("string").as("v"))
            .agg(count(lit(1)).as("cnt"))
          val n = vc.agg(sum(col("cnt")).as("__n"))
          vc.join(broadcast(n))
            .select(round(-(col("cnt").cast("double") / col("__n").cast("double")) *
              log(col("cnt").cast("double") / col("__n").cast("double")), 9)
              .cast("decimal(18,9)").as("term"),
              col("__n"))
            .agg(max(col("__n")).as("n"),
              count(lit(1)).as("n_distinct"),
              round(sum(col("term")).cast("double"), 6).as("entropy"))
            .select(lit(c).as("column"), col("n"), col("n_distinct"),
              col("entropy"))
        }
        colEntropy("event_type")
          .unionByName(colEntropy("user_id"))
          .unionByName(colEntropy("props"))
          .orderBy(col("column"))
      },
      """WITH e AS (
           SELECT 'event_type' AS col, CAST(event_type AS VARCHAR) AS v
           FROM events WHERE event_type IS NOT NULL
           UNION ALL
           SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
           WHERE user_id IS NOT NULL
           UNION ALL
           SELECT 'props', CAST(props AS VARCHAR) FROM events
           WHERE props IS NOT NULL),
         vc AS (SELECT col, v, count(*) AS cnt FROM e GROUP BY 1, 2),
         n AS (SELECT col, CAST(sum(cnt) AS BIGINT) AS n FROM vc GROUP BY 1)
         SELECT vc.col AS "column", max(n.n) AS n,
                count(*) AS n_distinct,
                round(CAST(sum(CAST(round(
                  -(CAST(cnt AS DOUBLE) / CAST(n.n AS DOUBLE)) *
                  ln(CAST(cnt AS DOUBLE) / CAST(n.n AS DOUBLE)), 9)
                  AS DECIMAL(18,9))) AS DOUBLE), 6) AS entropy
         FROM vc JOIN n ON n.col = vc.col
         GROUP BY vc.col ORDER BY "column""""),

    // Benford first-digit fraud screen: observed leading-digit
    // distribution of order amounts vs the Benford expectation
    // log10(1+1/d). The digit comes from the INTEGER cents rendered as
    // a string — integer-to-string is exact and engine-identical, where
    // float formatting or pow/log10 index arithmetic would not be.
    // Deviation in ROUNDED space; all nine log10 constants verified
    // >= 0.004 ulp-millionths from their 6dp rounding boundary, so the
    // cross-engine round is stable. One scan, 9-row rollup.
    "pr15_benford" -> api(
      (s, dir) => {
        val o = s.read.parquet(s"$dir/orders.parquet")
        o.select(substring(round(col("o_totalprice") * 100)
            .cast("long").cast("string"), 1, 1).as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
          .withColumn("share", round(col("n") /
            sum(col("n")).over(org.apache.spark.sql.expressions
              .Window.partitionBy()), 6))
          .withColumn("benford",
            round(log10(lit(1) + lit(1.0) / col("digit").cast("double")), 6))
          .withColumn("dev", round(col("share") - col("benford"), 6))
          .orderBy(col("digit"))
      },
      """WITH d AS (SELECT substr(CAST(CAST(round(o_totalprice * 100)
                      AS BIGINT) AS VARCHAR), 1, 1) AS digit
                    FROM orders),
         c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
         sh AS (SELECT digit, n,
                       round(CAST(n AS DOUBLE) / sum(n) OVER (), 6) AS share
                FROM c)
         SELECT digit, n, share,
                round(log10(1 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford,
                round(share - round(log10(1 + 1.0 / CAST(digit AS DOUBLE)),
                      6), 6) AS dev
         FROM sh ORDER BY digit"""),

    "pr13_ks_drift" -> api(
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val ev = graft.streaming.Events.readRaw(s, dir)
          .select(col("event_type"), col("value"),
            (col("event_id") % 2 === 0).as("__a"))
        val pv = ev.groupBy(col("event_type"), col("value"))
          .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("na"),
            sum(when(col("__a"), 0L).otherwise(1L)).as("nb"))
        val wt = W.partitionBy(col("event_type"))
        val wr = wt.orderBy(col("value"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        pv
          .withColumn("ca", sum(col("na")).over(wr))
          .withColumn("cb", sum(col("nb")).over(wr))
          .withColumn("ta", sum(col("na")).over(wt))
          .withColumn("tb", sum(col("nb")).over(wt))
          .groupBy(col("event_type"))
          .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
            max(abs(col("ca") * col("tb") - col("cb") * col("ta")))
              .as("__d"))
          .select(col("event_type"), col("n_a"), col("n_b"),
            round(col("__d").cast("double") / (col("n_a") * col("n_b")), 6)
              .as("ks"))
          .orderBy(col("event_type"))
      },
      """WITH pv AS (SELECT event_type, value,
                  sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
                  sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS nb
           FROM events GROUP BY 1, 2),
         c AS (SELECT event_type,
                  sum(na) OVER (PARTITION BY event_type ORDER BY value
                                ROWS UNBOUNDED PRECEDING) AS ca,
                  sum(nb) OVER (PARTITION BY event_type ORDER BY value
                                ROWS UNBOUNDED PRECEDING) AS cb,
                  sum(na) OVER (PARTITION BY event_type) AS ta,
                  sum(nb) OVER (PARTITION BY event_type) AS tb
               FROM pv)
         SELECT event_type, CAST(max(ta) AS BIGINT) AS n_a,
                CAST(max(tb) AS BIGINT) AS n_b,
                round(CAST(max(abs(ca * tb - cb * ta)) AS DOUBLE)
                      / (max(ta) * max(tb)), 6) AS ks
         FROM c GROUP BY event_type ORDER BY event_type"""),

    // Functional-dependency / candidate-key audit — schema-contract
    // checks a 100 TB ingest runs before trusting joins: does lhs → rhs
    // actually hold, and is the claimed key unique? One keyed
    // aggregation per check (count_distinct rhs per lhs collapses to
    // #lhs rows, then a tiny rollup); violations are counted, not
    // sampled. part proves a HOLDING dependency (p_partkey → p_name),
    // lineitem proves a VIOLATED one (l_partkey → l_suppkey: parts ship
    // from several suppliers), and (l_orderkey, l_linenumber) is the
    // uniqueness check.
    "pr11_fd_audit" -> api(
      (s, dir) => {
        val part = s.read.parquet(s"$dir/part.parquet")
        val li = s.read.parquet(s"$dir/lineitem.parquet")
        def fd(df: DataFrame, name: String, lhs: String, rhs: String) =
          df.groupBy(col(lhs))
            .agg(count_distinct(col(rhs)).as("__nr"))
            .agg(lit(name).as("check"),
              count(lit(1)).as("n_lhs"),
              sum(when(col("__nr") > 1, 1L).otherwise(0L)).as("n_violating"),
              max(col("__nr")).as("max_rhs"))
        val uniq = li
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(count(lit(1)).as("__c"))
          .agg(lit("uniq:l_orderkey,l_linenumber").as("check"),
            count(lit(1)).as("n_lhs"),
            sum(when(col("__c") > 1, 1L).otherwise(0L)).as("n_violating"),
            max(col("__c")).as("max_rhs"))
        fd(part, "fd:p_partkey->p_name", "p_partkey", "p_name")
          .unionByName(fd(li, "fd:l_partkey->l_suppkey",
            "l_partkey", "l_suppkey"))
          .unionByName(uniq)
          .orderBy(col("check"))
      },
      """SELECT 'fd:l_partkey->l_suppkey' AS "check",
                count(*) AS n_lhs,
                CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_violating,
                CAST(max(nr) AS BIGINT) AS max_rhs
         FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nr
               FROM lineitem GROUP BY 1)
         UNION ALL
         SELECT 'fd:p_partkey->p_name', count(*),
                CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT),
                CAST(max(nr) AS BIGINT)
         FROM (SELECT p_partkey, count(DISTINCT p_name) AS nr
               FROM part GROUP BY 1)
         UNION ALL
         SELECT 'uniq:l_orderkey,l_linenumber', count(*),
                CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
                CAST(max(c) AS BIGINT)
         FROM (SELECT l_orderkey, l_linenumber, count(*) AS c
               FROM lineitem GROUP BY 1, 2)
         ORDER BY "check""""),

    // DYNAMIC PARTITION PRUNING over a day-partitioned fact table — the
    // mechanism that makes dimension-filtered scans of a 100 TB
    // partitioned table read only the qualifying partitions, discovered
    // at RUNTIME from the dim side (no literal day filter anywhere in
    // the query). The fact table is seeded day-partitioned in scratch;
    // the dim is the selective day subset; PlanSpec pins that the scan
    // carries a dynamicpruning partition filter. Oracle re-derives from
    // raw events with the same day predicate.
    // Bloom-filter join pre-filtering — the hand-rolled runtime filter:
    // build a bloom over the small dim's keys (one aggregate row,
    // broadcast onto the fact scan), discard ~all non-matching fact
    // rows BEFORE any join machinery, then an exact broadcast semi-join
    // kills the bloom's false positives. Correctness never depends on
    // the bloom (the semi-join is exact); the bloom only thins the
    // stream. At 100 TB the payoff is shuffle avoidance when the dim is
    // too big to broadcast-join outright but its key set fits a
    // few-MB bloom: the fact side drops to ~matching rows at scan time
    // instead of carrying the full table into a shuffle. Revenue sums
    // in exact decimal, surfaced as double (the r01 discipline).
    "j10_bloom_prejoin" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        val sup = s.read.parquet(s"$dir/supplier.parquet")
          .filter(col("s_nationkey") === 3).select(col("s_suppkey"))
        li.createOrReplaceTempView("j10_fact")
        sup.createOrReplaceTempView("j10_dim")
        // might_contain requires the bloom as a scalar subquery — Spark
        // plans it as an uncorrelated subquery broadcast to every scan
        // task, exactly the runtime-filter shape
        s.sql(
          """SELECT l_suppkey, count(*) AS n,
                    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS rev
             FROM j10_fact
             WHERE bloom_might_contain(
                     (SELECT bloom_agg(s_suppkey, 10000) FROM j10_dim),
                     l_suppkey)
               AND l_suppkey IN (SELECT s_suppkey FROM j10_dim)
             GROUP BY l_suppkey ORDER BY l_suppkey""")
      },
      """SELECT l_suppkey, count(*) AS n,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS rev
         FROM lineitem
         WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                             WHERE s_nationkey = 3)
         GROUP BY l_suppkey ORDER BY l_suppkey"""),

    "j09_dynamic_pruning" -> api(
      (s, dir) => {
        val MpD = graft.streaming.Events.MicrosPerDay
        val ev = graft.streaming.Events.readRaw(s, dir)
          .withColumn("day", expr(s"ts div $MpD"))
          .select(col("event_id"), col("day"), col("event_type"), col("value"))
        val out = scratchDir(s"j09_${new java.io.File(dir).getName}")
        ev.write.partitionBy("day").mode("overwrite").parquet(out)
        val fact = s.read.parquet(out)
        val dim = ev.select(col("day")).distinct()
          .filter(col("day") % 7 === 0)
          .withColumn("tag", lit("keep"))
        fact.join(broadcast(dim), Seq("day"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("cents"),
            count_distinct(col("day")).as("n_days"))
          .orderBy(col("event_type"))
      },
      """WITH ev AS (SELECT event_type, value,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           FROM events)
         SELECT event_type, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS cents,
                CAST(count(DISTINCT day) AS BIGINT) AS n_days
         FROM ev WHERE day % 7 = 0
         GROUP BY event_type ORDER BY event_type"""),

    // Shuffle-key skew profile (graft.ops.Profile.keySkew): exact key
    // cardinality, heaviest-key / top-5 share and the Gini coefficient
    // of the per-key count distribution — the pre-shot diagnostic before
    // committing a join or aggregation key at 100 TB. The Gini rank-sum
    // runs over a count-of-counts rollup (one row per DISTINCT per-key
    // count), never a per-key global sort; the oracle re-derives it with
    // an explicit per-key ranking, so a green hash proves the tie-run
    // closed form equals the naive formula.
    "pr10_key_skew" -> api(
      (s, dir) => graft.ops.Profile.keySkew(
        s.read.parquet(s"$dir/lineitem.parquet"), "l_suppkey", topK = 5),
      """WITH c AS (SELECT l_suppkey, count(*) AS c
                    FROM lineitem GROUP BY 1),
         r AS (SELECT c, row_number() OVER (ORDER BY c) AS i FROM c),
         t AS (SELECT count(*) AS n, sum(c) AS tot, max(c) AS mx,
                      sum(i * c) AS ric FROM r),
         tp AS (SELECT sum(c) AS top5 FROM
                  (SELECT c FROM c ORDER BY c DESC LIMIT 5))
         SELECT CAST(n AS BIGINT) AS n_keys, CAST(tot AS BIGINT) AS n_rows,
                round(CAST(mx AS DOUBLE) / tot, 6) AS max_share,
                round(CAST(top5 AS DOUBLE) / tot, 6) AS top_share,
                round(2.0 * ric / (CAST(n AS DOUBLE) * tot)
                      - (n + 1.0) / n, 6) AS gini
         FROM t, tp""")

    ,

    // Interval-overlap join (validity windows × validity windows) — the
    // two-sided generalization of j06's point-in-interval join. Both
    // sides quantize to day buckets and equi-join; a pair sharing
    // several buckets survives only in the bucket holding its overlap
    // start, so no distinct is ever shuffled. The oracle runs DuckDB's
    // native inequality join over the same intervals.
    "j08_interval_overlap" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val epoch = lit("1970-01-01")
        val a = s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_totalprice") > 450000)
          .select(col("o_orderkey").as("a_key"),
            datediff(col("o_orderdate"), epoch).cast("long").as("a_lo"))
          .withColumn("a_hi", col("a_lo") + 14)
        val b = s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_totalprice") < 25000)
          .select(col("o_orderkey").as("b_key"),
            datediff(col("o_orderdate"), epoch).cast("long").as("b_lo"))
          .withColumn("b_hi", col("b_lo") + 7)
        graft.ops.RangeJoin.bucketedOverlapJoin(a, "a_lo", "a_hi",
            b, "b_lo", "b_hi", width = 8)
          .groupBy(col("a_key"))
          .agg(count(lit(1)).as("n_overlap"),
            min(col("b_key")).as("first_b"),
            max(col("b_key")).as("last_b"))
          .orderBy(col("a_key"))
      },
      """WITH a AS (SELECT o_orderkey AS a_key,
                           CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS a_lo
                    FROM orders WHERE o_totalprice > 450000),
         b AS (SELECT o_orderkey AS b_key,
                      CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS b_lo
               FROM orders WHERE o_totalprice < 25000)
         SELECT a_key, count(*) AS n_overlap,
                min(b_key) AS first_b, max(b_key) AS last_b
         FROM a JOIN b ON a_lo <= b_lo + 7 AND b_lo <= a_lo + 14
         GROUP BY a_key ORDER BY a_key""")

    ,

    // Corpus vocabulary statistics per source: token volume, vocabulary
    // size, type-token ratio, frequency-weighted mean token length, and
    // hapax legomena (frequency-1 types — the vocabulary's long tail).
    // Formulated as the explicit two-level aggregation (term frequency
    // first, then per-source rollup) so the heavy stage map-side
    // combines on (source, token) — the same shape count(DISTINCT)
    // expands to, but with the per-token frequencies kept for the
    // hapax/mean-length stats.
    // Inverted-index build (the search/retrieval side of a corpus
    // pipeline): token -> document frequency, total term frequency,
    // doc-id range, and the first five postings. The posting-list
    // sample is deterministic on both engines: set-collect then SORT
    // then slice (collect_set order is partition-dependent, the sort
    // erases that). Shuffle carries (token, doc_id) pairs — the
    // standard index-build shape that scales by token-hash
    // partitioning; posting lists stay bounded in the output via the
    // head slice, full lists would go to a bucketed sink at 100 TB.
    // Zipf-law fit over the corpus vocabulary: least-squares slope of
    // ln(freq) vs ln(rank) for the top-1000 words ≈ −zipf exponent —
    // the one-number sanity check that a text corpus is natural-ish
    // (≈ −1) rather than template spam. Determinism discipline: the
    // per-row ln values are rounded to 6 then cast to DECIMAL so every
    // regression SUM is exact integer arithmetic (order-independent
    // across partitions — a raw double sum would hash-diverge run to
    // run); only the final closed-form slope divides in double, in one
    // fixed operand order. The regression runs over a 1000-row rollup,
    // never the corpus.
    "t21_zipf_slope" -> api(
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val wc = s.read.parquet(s"$dir/documents.parquet")
          .select(explode(split(lower(coalesce(col("text"), lit(""))),
            "[^a-z]+")).as("tok"))
          .filter(length(col("tok")) >= 2)
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("tok")).limit(1000)
        val r = wc
          .withColumn("rn",
            row_number().over(W.orderBy(col("c").desc, col("tok"))))
          .select(
            round(log(col("rn").cast("double")), 6)
              .cast("decimal(18,6)").as("x"),
            round(log(col("c").cast("double")), 6)
              .cast("decimal(18,6)").as("y"))
        r.agg(count(lit(1)).cast("double").as("n"),
            sum(col("x")).cast("double").as("sx"),
            sum(col("y")).cast("double").as("sy"),
            sum(col("x") * col("y")).cast("double").as("sxy"),
            sum(col("x") * col("x")).cast("double").as("sxx"))
          .select(col("n").cast("long").as("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"))
      },
      """WITH wc AS (SELECT tok, count(*) AS c
             FROM (SELECT unnest(string_split_regex(lower(coalesce(text, '')),
                     '[^a-z]+')) AS tok FROM documents)
             WHERE length(tok) >= 2
             GROUP BY tok ORDER BY c DESC, tok LIMIT 1000),
         r AS (SELECT
                 CAST(round(ln(CAST(row_number() OVER (ORDER BY c DESC, tok)
                   AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
                 CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
               FROM wc),
         a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                      CAST(sum(x) AS DOUBLE) AS sx,
                      CAST(sum(y) AS DOUBLE) AS sy,
                      CAST(sum(x * y) AS DOUBLE) AS sxy,
                      CAST(sum(x * x) AS DOUBLE) AS sxx
               FROM r)
         SELECT CAST(n AS BIGINT) AS n,
                round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
         FROM a"""),

    // LSH tuning table: the S-curve P[candidate] = 1 − (1 − s^r)^b for
    // the banding configs the dedup family actually uses — how an
    // engineer picks (bands, rows) for a target similarity threshold
    // before burning a cluster pass. Pure fixed-order double math on a
    // generated grid; threshold50 readers find where each config
    // crosses 0.5.
    // TF-IDF-weighted sparse-cosine near-dup (Dedup.tfidfCosinePairs):
    // the lexical-WEIGHTING complement of the set-based families — word
    // TRIGRAM tf·idf vectors in 1e3 fixed point (order-free long dots
    // and norms), candidates from the df-capped inverted term index,
    // cosine = one fixed chain of correctly-rounded double ops. The
    // oracle re-derives the identical integers, so the unrounded
    // cosines gate bitwise. Trigrams (not bigrams): same near-dup pairs
    // on this corpus but sparser dfs, measured ~6x cheaper Σdf² fan-out.
    "d20_tfidf_cosine" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        graft.ops.Dedup.tfidfCosinePairs(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
            threshold = 0.8, maxDocFreq = 1000L)
          .orderBy(col("id_a"), col("id_b"))
      },
      """WITH s AS (SELECT doc_id,
              list_filter(string_split_regex(lower(coalesce(text, '')), '\W+'),
                          x -> x <> '') AS toks
            FROM documents),
         t AS (SELECT doc_id,
                      toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS term
               FROM s, unnest(generate_series(1, len(toks)-2)) AS u(i)),
         tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
                FROM t GROUP BY doc_id, term),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         dfq AS (SELECT term, count(*) AS c FROM tf GROUP BY term
                 HAVING count(*) <= 1000),
         p AS (SELECT tf.doc_id AS id, tf.term,
                 CAST(round((tf.tf * ln(n.n / CAST(dfq.c AS DOUBLE))) * 1e3)
                      AS BIGINT) AS fp
               FROM tf JOIN dfq USING (term) CROSS JOIN n),
         norms AS (SELECT id, sum(fp * fp) AS n2 FROM p GROUP BY id),
         dots AS (SELECT a.id AS id_a, b.id AS id_b, sum(a.fp * b.fp) AS dot
                  FROM p a JOIN p b ON a.term = b.term AND a.id < b.id
                  GROUP BY a.id, b.id)
         SELECT id_a, id_b,
                CAST(dot AS DOUBLE)
                  / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
                  AS cos
         FROM dots JOIN norms na ON na.id = id_a JOIN norms nb ON nb.id = id_b
         WHERE CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               >= 0.8
         ORDER BY id_a, id_b"""),

    "d19_lsh_curve" -> api(
      (s, dir) => {
        import s.implicits._
        val confs = Seq((16, 4), (8, 8), (32, 2)).toDF("b", "r")
        confs.crossJoin(
            s.range(1, 20).select((col("id").cast("double") * 0.05).as("s")))
          .select(col("b").cast("long").as("b"), col("r").cast("long").as("r"),
            round(col("s"), 2).as("s"),
            round(lit(1.0) - pow(lit(1.0) - pow(col("s"), col("r").cast("double")),
              col("b").cast("double")), 6).as("p"))
          .orderBy(col("b"), col("r"), col("s"))
      },
      """SELECT CAST(c.b AS BIGINT) AS b, CAST(c.r AS BIGINT) AS r,
                round(CAST(i AS DOUBLE) * 0.05, 2) AS s,
                round(1.0 - power(1.0 - power(CAST(i AS DOUBLE) * 0.05,
                  CAST(c.r AS DOUBLE)), CAST(c.b AS DOUBLE)), 6) AS p
         FROM (VALUES (16, 4), (8, 8), (32, 2)) AS c(b, r),
              (SELECT unnest(generate_series(1, 19)) AS i)
         ORDER BY b, r, s"""),

    // Collocation mining: top-20 adjacent word pairs by pointwise mutual
    // information, PMI = ln(c_ab·N / (c_a·c_b)) — the signal that
    // separates real phrases ("neural network") from frequent-but-
    // independent pairs. Bigrams come from the token array per document
    // (map-only transform, no positional shuffle); the two unigram
    // lookups join the bigram rollup against the vocabulary — all
    // shuffles carry (word, count) pairs, never documents. Fixed-order
    // double math + rounded ordering keys, engine-bit-exact.
    "t20_collocations" -> api(
      (s, dir) => {
        val warr = filter(
          split(lower(coalesce(col("text"), lit(""))), "[^a-z]+"),
          x => length(x) >= 2)
        val base = s.read.parquet(s"$dir/documents.parquet")
          .select(warr.as("w"))
        val words = base.select(explode(col("w")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val tot = words.agg(sum(col("c")).cast("long").as("__N"))
        val bi = base
          .select(explode(when(size(col("w")) >= 2,
            transform(sequence(lit(1), size(col("w")) - 1),
              i => struct(element_at(col("w"), i).as("w1"),
                element_at(col("w"), i + lit(1)).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
            .as("p"))
          .select(col("p.w1"), col("p.w2"))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
          .filter(col("cab") >= 5)
        bi.join(words.select(col("tok").as("w1"), col("c").as("ca")), Seq("w1"))
          .join(words.select(col("tok").as("w2"), col("c").as("cb")), Seq("w2"))
          .join(broadcast(tot))
          .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"),
            col("cab"),
            round(log(col("cab").cast("double") * col("__N").cast("double") /
              (col("ca").cast("double") * col("cb").cast("double"))), 6)
              .as("pmi"))
          .orderBy(col("pmi").desc, col("bigram")).limit(20)
      },
      """WITH d AS (SELECT list_filter(
                  string_split_regex(lower(coalesce(text, '')), '[^a-z]+'),
                  x -> length(x) >= 2) AS w FROM documents),
         wc AS (SELECT tok, count(*) AS c
                FROM (SELECT unnest(w) AS tok FROM d) GROUP BY tok),
         n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM wc),
         bi AS (SELECT w[g] AS w1, w[g + 1] AS w2
                FROM d, unnest(generate_series(1,
                  CAST(len(w) - 1 AS BIGINT))) AS u(g)),
         bc AS (SELECT w1, w2, count(*) AS cab FROM bi GROUP BY 1, 2
                HAVING count(*) >= 5)
         SELECT bc.w1 || ' ' || bc.w2 AS bigram, cab,
                round(ln(CAST(cab AS DOUBLE) * CAST(n.n AS DOUBLE)
                      / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE))), 6) AS pmi
         FROM bc JOIN wc a ON a.tok = bc.w1
                 JOIN wc b ON b.tok = bc.w2, n
         ORDER BY pmi DESC, bigram LIMIT 20"""),

    // BPE vocabulary TRAINING step (the merge-candidate scan): count
    // adjacent character pairs across the corpus weighted by word
    // frequency, emit the top-30 merge candidates. The scale shape is
    // the one that matters: the corpus collapses to the DISTINCT-word
    // vocabulary first (one shuffle on word, vocab-sized output), and
    // the character-pair explosion runs over the vocab — at 100 TB the
    // vocab is millions of rows while the corpus is trillions of
    // tokens, so exploding after the rollup is orders of magnitude
    // less work than per-token bigrams. Deterministic top-30: count
    // desc, then pair.
    "t19_bpe_pair_counts" -> api(
      (s, dir) => {
        val words = s.read.parquet(s"$dir/documents.parquet")
          .select(explode(split(lower(coalesce(col("text"), lit(""))),
            "[^a-z]+")).as("w"))
          .filter(length(col("w")) >= 2)
          .groupBy(col("w")).agg(count(lit(1)).as("wn"))
        words
          .select(col("wn"), explode(transform(
            sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
          .groupBy(col("pair")).agg(sum(col("wn")).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(30)
      },
      """WITH wc AS (SELECT w, count(*) AS wn
           FROM (SELECT unnest(string_split_regex(lower(coalesce(text, '')),
                   '[^a-z]+')) AS w FROM documents)
           WHERE length(w) >= 2 GROUP BY w),
         pairs AS (SELECT substr(w, g, 2) AS pair, wn
                   FROM wc, unnest(generate_series(1,
                     CAST(length(w) - 1 AS BIGINT))) AS u(g)),
         agg AS (SELECT pair, sum(wn) AS n FROM pairs GROUP BY pair)
         SELECT pair, CAST(n AS BIGINT) AS n FROM agg
         ORDER BY n DESC, pair LIMIT 30"""),

    // Kneser–Ney bigram LM scores (TextAnalysis.knBigramScore, t27):
    // the standard interpolated-KN smoothing next to t09's add-one
    // baseline — discounted ML term + continuation-probability backoff
    // from distinct-context counts, every input an exact integer count,
    // per-bigram probabilities through ONE mirrored double chain into
    // 1e6 fixed point before the order-free per-doc sum.
    "t27_kn_lm_score" -> api(
      (s, dir) => {
        graft.ops.TextAnalysis.knBigramScore(
            s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      """WITH s AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')),
                   '\W+'), x -> x <> '') AS toks FROM documents),
         bg AS (SELECT doc_id, toks[i] AS a, toks[i+1] AS b
                FROM s, unnest(generate_series(1, len(toks) - 1)) u(i)),
         c2 AS (SELECT a, b, count(*) AS c2 FROM bg GROUP BY a, b),
         ctx AS (SELECT a, CAST(sum(c2) AS BIGINT) AS c1,
                        count(*) AS n1f FROM c2 GROUP BY a),
         cont AS (SELECT b, count(*) AS n1b FROM c2 GROUP BY b),
         nbi AS (SELECT count(*) AS nbi FROM c2),
         sc AS (SELECT doc_id,
                  CAST(round(ln(
                    greatest(CAST(c2.c2 AS DOUBLE) - 0.75, 0.0)
                      / CAST(ctx.c1 AS DOUBLE)
                    + 0.75 * CAST(ctx.n1f AS DOUBLE)
                      / CAST(ctx.c1 AS DOUBLE)
                      * (CAST(cont.n1b AS DOUBLE)
                         / CAST(nbi.nbi AS DOUBLE))) * 1e6)
                    AS BIGINT) AS fp
                FROM bg JOIN c2 USING (a, b) JOIN ctx USING (a)
                        JOIN cont USING (b), nbi),
         pd AS (SELECT doc_id, count(*) AS nb,
                       CAST(sum(fp) AS BIGINT) AS sf
                FROM sc GROUP BY doc_id)
         SELECT d.doc_id, coalesce(pd.nb, 0) AS n_bigrams,
                coalesce(pd.sf, 0) AS kn_score_fp
         FROM documents d LEFT JOIN pd USING (doc_id)
         ORDER BY d.doc_id"""),

    // Corpus bits-per-byte per source under the KN bigram LM (t33,
    // [[graft.ops.TextAnalysis.bitsPerByte]]) — the compression-style
    // eval every LM-data paper reports; the per-source ranking is the
    // mixing signal. Σ log P is the exact fixed-point corpus sum (t27's
    // per-doc scores, order-free integer addition); the ONLY float work
    // is one double chain per source — negate, un-fix, divide by a
    // shared ln-2 LITERAL (Math.log(2.0) is not guaranteed correctly
    // rounded; the literal is bit-identical by construction), divide by
    // the byte total (DuckDB spells octet_length as strlen), round 6 —
    // mirrored verbatim below. One doc-keyed equi-join + one tiny
    // source-keyed rollup on top of the t27 aggregations.
    // Token-window chunking (t34, [[graft.ops.TextAnalysis
    // .tokenWindows]]): fixed 128-token windows at stride 64 (50%
    // overlap) — the context-window shape between documents and a
    // model's input budget. MAP-ONLY (split + sequence/explode +
    // slice per chunk; no shuffle); the tail window clamps, empty
    // docs produce no chunks. The oracle re-derives with DuckDB's
    // 1-based inclusive slices and generate_series; chunk text
    // compares by md5 to keep the gated parquet narrow.
    "t34_token_windows" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 3 === 0)
        graft.ops.TextAnalysis
          .tokenWindows(docs, "doc_id", "text", 128, 64)
          .select(col("doc_id"), col("chunk_ix"), col("n_tokens"),
            md5(col("chunk")).as("h"))
          .orderBy(col("doc_id"), col("chunk_ix"))
      },
      """WITH d AS (SELECT doc_id, text FROM documents
                    WHERE doc_id % 3 = 0 AND length(coalesce(text, '')) > 0),
         s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d),
         n AS (SELECT doc_id, toks, len(toks) AS nt FROM s),
         w AS (SELECT doc_id, toks, nt,
                      unnest(generate_series(0, nt - 1, 64)) AS start
               FROM n)
         SELECT doc_id,
                CAST(start / 64 AS BIGINT) AS chunk_ix,
                CAST(least(nt - start, 128) AS BIGINT) AS n_tokens,
                md5(array_to_string(toks[start + 1 : start + 128], ' '))
                  AS h
         FROM w
         ORDER BY doc_id, chunk_ix"""),

    "t33_bits_per_byte" -> api(
      (s, dir) => {
        graft.ops.TextAnalysis.bitsPerByte(
            s.read.parquet(s"$dir/documents.parquet"),
            "doc_id", "text", "source")
          .orderBy(col("source"))
      },
      """WITH s AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')),
                   '\W+'), x -> x <> '') AS toks FROM documents),
         bg AS (SELECT doc_id, toks[i] AS a, toks[i+1] AS b
                FROM s, unnest(generate_series(1, len(toks) - 1)) u(i)),
         c2 AS (SELECT a, b, count(*) AS c2 FROM bg GROUP BY a, b),
         ctx AS (SELECT a, CAST(sum(c2) AS BIGINT) AS c1,
                        count(*) AS n1f FROM c2 GROUP BY a),
         cont AS (SELECT b, count(*) AS n1b FROM c2 GROUP BY b),
         nbi AS (SELECT count(*) AS nbi FROM c2),
         sc AS (SELECT doc_id,
                  CAST(round(ln(
                    greatest(CAST(c2.c2 AS DOUBLE) - 0.75, 0.0)
                      / CAST(ctx.c1 AS DOUBLE)
                    + 0.75 * CAST(ctx.n1f AS DOUBLE)
                      / CAST(ctx.c1 AS DOUBLE)
                      * (CAST(cont.n1b AS DOUBLE)
                         / CAST(nbi.nbi AS DOUBLE))) * 1e6)
                    AS BIGINT) AS fp
                FROM bg JOIN c2 USING (a, b) JOIN ctx USING (a)
                        JOIN cont USING (b), nbi),
         pd AS (SELECT doc_id, count(*) AS nb,
                       CAST(sum(fp) AS BIGINT) AS sf
                FROM sc GROUP BY doc_id),
         m AS (SELECT d.doc_id, d.source,
                      CAST(strlen(coalesce(d.text, '')) AS BIGINT) AS bytes,
                      coalesce(pd.nb, 0) AS nb, coalesce(pd.sf, 0) AS sf
               FROM documents d LEFT JOIN pd USING (doc_id))
         SELECT source, count(*) AS n_docs,
                CAST(sum(nb) AS BIGINT) AS n_bigrams,
                CAST(-sum(sf) AS BIGINT) AS neg_logprob_fp,
                CAST(sum(bytes) AS BIGINT) AS n_bytes,
                CASE WHEN sum(bytes) = 0 THEN NULL
                     ELSE round(CAST(-sum(sf) AS DOUBLE) / 1e6
                                / 0.6931471805599453
                                / CAST(sum(bytes) AS DOUBLE), 6)
                END AS bpb
         FROM m GROUP BY source ORDER BY source"""),

    // RAKE keyword extraction (TextAnalysis.rakeKeywords, t26): top-20
    // corpus keywords by degree/frequency phrase scores — candidate
    // phrases are maximal runs between stopwords/punctuation, per-word
    // ratios 1e6-fixed-point before the order-free sum, tie-break on
    // phrase text. Phrase derivation map-only and materialized once;
    // stats are equi-keyed aggs. The oracle re-runs the same regex
    // chain and score algebra.
    "t26_rake_keywords" -> api(
      (s, dir) => {
        graft.ops.TextAnalysis.rakeKeywords(
          s.read.parquet(s"$dir/documents.parquet"), "text", topK = 20)
      },
      """WITH ph AS (SELECT list_filter(list_transform(string_split(
              regexp_replace(regexp_replace(regexp_replace(
                lower(coalesce(text, '')),
                '[^a-z0-9\s]+', '|', 'g'), '\s+', ' ', 'g'),
                '\b(the|and|of|to|in|is|that|it|for|was)\b', '|', 'g'),
              '|'), p -> trim(p)), p -> p <> '') AS ps
            FROM documents),
         occ AS (SELECT unnest(ps) AS phrase FROM ph),
         w AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS word,
                      len(string_split(phrase, ' ')) AS plen FROM occ),
         ws AS (SELECT word, count(*) AS freq, sum(plen) AS deg
                FROM w GROUP BY word),
         dp AS (SELECT DISTINCT phrase FROM occ),
         wp AS (SELECT d.phrase, t.word
                FROM dp d, unnest(string_split(d.phrase, ' ')) AS t(word)),
         sc AS (SELECT phrase,
                       CAST(sum(CAST(round(1e6 * ws.deg / ws.freq)
                         AS BIGINT)) AS BIGINT) AS score_fp
                FROM wp JOIN ws USING (word) GROUP BY phrase),
         oc AS (SELECT phrase, count(*) AS n_occurrences
                FROM occ GROUP BY phrase)
         SELECT sc.phrase,
                CAST(len(string_split(sc.phrase, ' ')) AS BIGINT)
                  AS n_words,
                sc.score_fp, CAST(oc.n_occurrences AS BIGINT)
                  AS n_occurrences
         FROM sc JOIN oc USING (phrase)
         ORDER BY score_fp DESC, phrase LIMIT 20"""),

    // Unigram-LM (SentencePiece-style) tokenizer TRAINING (t29):
    // TextAnalysis.unigramLmTrain — seed = most frequent substrings,
    // K = 2 hard-EM rounds (Viterbi E-step as a map-only HOF fold over
    // the distinct-word vocab, one keyed agg M-step, prune-to-budget +
    // all single chars), then the trained pieces ROUND-TRIP through a
    // segmentation of the 5 most frequent words (unigramSegment). The
    // oracle re-runs the whole thing K-unrolled in DuckDB: recursive
    // CTEs carry the Viterbi DP array per word position and the
    // backtrack walk (MATERIALIZED between stages — the gr08/t25
    // discipline), scores in 1e6 fixed point with the identical
    // first-maximum/longest-piece tie rule, so every piece count,
    // score, and segmentation is bit-equal.
    "t29_unigram_lm" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val pieces = graft.ops.TextAnalysis.unigramLmTrain(
          docs, "text", budget = 24, rounds = 2)
        val words = docs.select(explode(split(lower(coalesce(col("text"),
            lit(""))), "[^a-z0-9]+")).as("w"))
          .filter(col("w") =!= "" && length(col("w")) <= 8)
          .groupBy(col("w")).agg(count(lit(1)).as("wn"))
          .orderBy(col("wn").desc, col("w")).limit(5)
        val segs = graft.ops.TextAnalysis.unigramSegment(words, "w", pieces)
          .select(lit("seg").as("kind"), col("w").as("k"),
            col("wn").as("n"), lit(null).cast("long").as("v"),
            concat_ws(".", col("pieces")).as("s"))
        pieces.select(lit("piece").as("kind"), col("piece").as("k"),
            col("c").as("n"), col("score_fp").as("v"),
            lit(null).cast("string").as("s"))
          .unionByName(segs)
          .orderBy(col("kind"), col("k"))
      },
      unigramLmOracle(budget = 24, rounds = 2, nSeg = 5)),

    // Tokenize the CORPUS with the trained unigram model (t30): the
    // apply step after t29's training — final pieces rank into vocab
    // ids (score desc, piece — deterministic), the distinct-word vocab
    // segments ONCE (Viterbi fold, map-only), and per-document stats
    // roll up through the doc→word stream: token counts, OOV words
    // (beyond the trained length cap — counted, never segmented), and
    // the exact id-sum fingerprint. Work = corpus explode + vocab-sized
    // segmentation + two keyed aggs; the oracle re-runs training AND
    // applies the same model over every word (the t29 CTE chain with a
    // full-vocab Viterbi tail).
    "t30_unigram_tokenize" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val pieces = graft.ops.TextAnalysis.unigramLmTrain(
          docs, "text", budget = 24, rounds = 2)
        val ids = pieces.select(col("piece"), row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score_fp").desc, col("piece"))).as("pid"))
        val dw = docs.select(col("doc_id"),
          explode(filter(split(lower(coalesce(col("text"), lit(""))),
            "[^a-z0-9]+"), x => x =!= "")).as("w"))
        val words = dw.filter(length(col("w")) <= 8)
          .select(col("w")).distinct()
        val wstats = graft.ops.TextAnalysis.unigramSegment(words, "w", pieces)
          .select(col("w"), explode(col("pieces")).as("piece"))
          .join(ids, Seq("piece"))
          .groupBy(col("w"))
          .agg(count(lit(1)).as("n_pieces"), sum(col("pid")).as("id_sum"))
        val agg = dw.join(wstats, Seq("w"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(when(length(col("w")) > 8, 1L).otherwise(0L)).as("n_oov"),
            sum(col("n_pieces")).as("n_pieces"),
            sum(col("id_sum")).as("id_sum"))
        docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_words"), lit(0L)).as("n_words"),
            coalesce(col("n_oov"), lit(0L)).as("n_oov"),
            coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
            coalesce(col("id_sum"), lit(0L)).as("id_sum"))
          .orderBy(col("doc_id"))
      },
      unigramTokenizeOracle(budget = 24, rounds = 2)),

    // WordPiece tokenizer TRAINING + greedy apply (t31): the third
    // standard subword algorithm (BERT family) beside BPE (t25,
    // frequency argmax) and Unigram-LM (t29, EM) — merges pick the
    // LIKELIHOOD argmax cnt/(cl·cr); inference is greedy
    // longest-match-first with ## continuation, [UNK] on a dead end.
    // Per round: two keyed aggs over the distinct-word vocab + a 1-row
    // argmax collect + a map-only merge fold (Iterate.loop lineage
    // cuts); apply inlines the induced vocabulary as a literal map —
    // model-sized collects only. The oracle re-runs all 6 rounds
    // K-unrolled (replace-to-fixpoint application, the t25 mold) and
    // re-segments the top-5 words with a recursive greedy walk.
    "t31_wordpiece" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val merges = graft.ops.TextAnalysis.wordPieceTrain(docs, "text", 6)
        val vocab = graft.ops.TextAnalysis.wordPieceVocab(docs, "text", merges)
        val words = docs.select(explode(split(lower(coalesce(col("text"),
            lit(""))), "[^a-z0-9]+")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("w")).agg(count(lit(1)).as("wn"))
          .orderBy(col("wn").desc, col("w")).limit(5)
        val segs = graft.ops.TextAnalysis.wordPieceSegment(words, "w", vocab)
          .select(lit("seg").as("kind"), col("w").as("k"),
            lit(null).cast("long").as("rank"), col("wn").as("n"),
            lit(null).cast("long").as("cl"), lit(null).cast("long").as("cr"),
            lit(null).cast("long").as("score_fp"),
            concat_ws(".", col("pieces")).as("s"))
        merges.select(lit("merge").as("kind"),
            concat(col("lhs"), lit("|"), col("rhs")).as("k"),
            col("rank").cast("long").as("rank"),
            col("pair_count").as("n"), col("lhs_count").as("cl"),
            col("rhs_count").as("cr"), col("score_fp"),
            concat(col("lhs"), expr("substring(rhs, 3)")).as("s"))
          .unionByName(segs)
          .orderBy(col("kind"), col("k"))
      },
      wordPieceOracle(k = 6, nSeg = 5)),

    // Tokenize the CORPUS with the trained WordPiece vocabulary (t32):
    // the apply step after t31's training — the t30 mold on the greedy
    // tokenizer. Vocabulary pieces rank into ids (ORDER BY piece;
    // [UNK] → 0), the distinct-word vocab segments ONCE (map-only
    // greedy fold, materialized), and per-document stats roll up
    // through the doc→word stream: word/UNK/piece counts and the exact
    // id-sum fingerprint. Work = corpus explode + vocab-sized
    // segmentation + two keyed aggs; the oracle re-runs training AND
    // greedy-walks every distinct word.
    "t32_wordpiece_tokenize" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val merges = graft.ops.TextAnalysis.wordPieceTrain(docs, "text", 6)
        val vocab = graft.ops.TextAnalysis.wordPieceVocab(docs, "text", merges)
        val ids = vocab.select(col("piece"), row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("piece"))).as("pid"))
        val dw = docs.select(col("doc_id"),
          explode(filter(split(lower(coalesce(col("text"), lit(""))),
            "[^a-z0-9]+"), x => x =!= "")).as("w"))
        val words = dw.select(col("w")).distinct()
        val wstats = graft.ops.TextAnalysis.wordPieceSegment(words, "w", vocab)
          .select(col("w"), explode(col("pieces")).as("piece"))
          .join(ids, Seq("piece"), "left")
          .groupBy(col("w"))
          .agg(count(lit(1)).as("n_pieces"),
            sum(coalesce(col("pid").cast("long"), lit(0L))).as("id_sum"),
            max((col("piece") === "[UNK]").cast("long")).as("is_unk"))
        val agg = dw.join(wstats, Seq("w"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"), sum(col("is_unk")).as("n_unk"),
            sum(col("n_pieces")).as("n_pieces"), sum(col("id_sum")).as("id_sum"))
        docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_words"), lit(0L)).as("n_words"),
            coalesce(col("n_unk"), lit(0L)).as("n_unk"),
            coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
            coalesce(col("id_sum"), lit(0L)).as("id_sum"))
          .orderBy(col("doc_id"))
      },
      wordPieceTokenizeOracle(k = 6)),

    // Trained quality-classifier INFERENCE gate (t28): the
    // fastText-style linear filter (CCNet/DCLM/FineWeb) as score →
    // threshold → survivor flag. Weights are TRAINED in-query as
    // naive-Bayes log-odds over the full 256-bucket hashed-unigram
    // domain (md5-prefix buckets — the fe01/DSIR cross-engine hash;
    // add-one smoothing; target class = lang='en'), so DuckDB re-derives
    // features AND weights exactly; inference is
    // TextAnalysis.linearQualityScore — broadcast model, map-only
    // probe (PlanSpec-pinned), exact fixed-point sums, one mirrored
    // double chain. Training rollup is one pass over the token stream
    // (localCheckpoint: three consumers).
    "t28_quality_classifier" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val feats = docs.select(col("doc_id"),
            (col("lang") === "en").as("__tgt"),
            explode(filter(split(lower(coalesce(col("text"), lit(""))),
              "\\W+"), x => x =!= "")).as("__t"))
          .select(col("doc_id"), col("__tgt"),
            substring(md5(col("__t")), 1, 2).as("b"))
          .localCheckpoint(true)
        val cr = feats.groupBy(col("b")).agg(count(lit(1)).as("cr"))
        val ct = feats.filter(col("__tgt")).groupBy(col("b"))
          .agg(count(lit(1)).as("ct"))
        val tot = feats.agg(count(lit(1)).cast("double").as("nr"),
          sum(when(col("__tgt"), 1L).otherwise(0L)).cast("double").as("nt"))
        val domain = s.range(256)
          .select(format_string("%02x", col("id")).as("b"))
        val weights = domain.join(cr, Seq("b"), "left")
          .join(ct, Seq("b"), "left").crossJoin(broadcast(tot))
          .select(col("b"),
            round((log((coalesce(col("ct"), lit(0L)) + 1).cast("double")
                / (col("nt") + 256.0))
              - log((coalesce(col("cr"), lit(0L)) + 1).cast("double")
                / (col("nr") + 256.0))) * 1e6).cast("long").as("w_fp"))
        graft.ops.TextAnalysis.linearQualityScore(
            docs, "doc_id", "text", weights, nBuckets = 256)
          .select(col("doc_id"), col("n_tokens"), col("logit6"),
            col("quality6"), (col("quality6") >= 0.5).as("kept"))
          .orderBy(col("doc_id"))
      },
      """WITH s AS (SELECT doc_id, lang,
                  list_filter(string_split_regex(lower(coalesce(text, '')), '\W+'),
                              x -> x <> '') AS toks
           FROM documents),
         f AS (SELECT s.doc_id, s.lang = 'en' AS tgt,
                      substr(md5(u.t), 1, 2) AS b
               FROM s, unnest(toks) AS u(t)),
         cr AS (SELECT b, count(*) AS cr FROM f GROUP BY b),
         ct AS (SELECT b, count(*) AS ct FROM f WHERE tgt GROUP BY b),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS nr,
                        CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS DOUBLE) AS nt
                 FROM f),
         dom AS (SELECT printf('%02x', i) AS b FROM range(256) AS r(i)),
         w AS (SELECT dom.b,
                 CAST(round((ln(CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE)
                               / (tot.nt + 256.0))
                           - ln(CAST(coalesce(cr.cr, 0) + 1 AS DOUBLE)
                               / (tot.nr + 256.0))) * 1e6) AS BIGINT) AS w_fp
               FROM dom LEFT JOIN cr ON cr.b = dom.b
                        LEFT JOIN ct ON ct.b = dom.b CROSS JOIN tot),
         pd AS (SELECT f.doc_id, count(*) AS n_tokens, sum(w.w_fp) AS sum_fp
                FROM f JOIN w ON w.b = f.b GROUP BY f.doc_id),
         sc AS (SELECT d.doc_id,
                  CAST(coalesce(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
                  CAST(pd.sum_fp AS DOUBLE)
                    / (CAST(pd.n_tokens AS DOUBLE) * 1e6)
                    + CAST(0 AS DOUBLE) / 1e6 AS z
                FROM documents d LEFT JOIN pd USING (doc_id))
         SELECT doc_id, n_tokens, round(z, 6) AS logit6,
                round(1.0 / (1.0 + exp(-z)), 6) AS quality6,
                round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS kept
         FROM sc ORDER BY doc_id"""),

    // BPE merge TRAINING end-to-end (TextAnalysis.bpeTrain, t25): learn
    // the top-4 merges from the corpus — t19's candidate scan iterated
    // to an actual trained vocabulary, the artifact bpe_tokens consumes.
    // Each round: ONE pair-keyed aggregation over the distinct-word
    // vocab + a 1-row TakeOrdered argmax + a map-only greedy merge fold,
    // on Iterate.loop (bounded lineage). The oracle re-runs all 4 rounds
    // K-unrolled with recursive replace-to-fixpoint application — the
    // tie-break (count desc, lhs, rhs) makes both argmaxes identical.
    "t25_bpe_train" -> api(
      (s, dir) => {
        graft.ops.TextAnalysis.bpeTrain(
          s.read.parquet(s"$dir/documents.parquet"), "text", numMerges = 4)
      },
      bpeTrainOracle(4)),

    "t18_postings" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        docs.select(col("doc_id"),
            explode(split(lower(coalesce(col("text"), lit(""))), "\\W+"))
              .as("tok"))
          .filter(length(col("tok")) >= 3)
          .groupBy(col("tok"))
          .agg(count_distinct(col("doc_id")).as("df"),
            count(lit(1)).as("tf"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"),
            array_join(slice(sort_array(collect_set(col("doc_id"))), 1, 5),
              ",").as("postings_head"))
          .filter(col("df") >= 2)
          .orderBy(col("tok"))
      },
      """WITH t AS (SELECT doc_id,
                      unnest(string_split_regex(lower(coalesce(text, '')),
                        '\W+')) AS tok
                    FROM documents)
         SELECT tok, count(DISTINCT doc_id) AS df, count(*) AS tf,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc,
                array_to_string(list_sort(list(DISTINCT doc_id))[1:5],
                  ',') AS postings_head
         FROM t WHERE length(tok) >= 3
         GROUP BY tok HAVING count(DISTINCT doc_id) >= 2
         ORDER BY tok"""),

    // Fuzzy entity linkage (record linkage): dirty part names (one char
    // deterministically dropped at position 6+key%(len-6)) are linked
    // back to a canonical entity catalog — DISTINCT clean names keyed
    // by their min partkey — via prefix-4 blocking and a top-1
    // Jaro-Winkler score (codegen'd graft expression, DuckDB-bit-exact;
    // see Kernels.jaroWinkler). The catalog-vs-corpus shape is the
    // 100 TB design: the entity catalog is tiny and BROADCAST, the
    // dirty corpus streams map-side through block + score + per-record
    // top-1 without ever shuffling on the blocking key; ranking ties
    // break on the ROUNDED score then canon_key, so both engines rank
    // identically. `ok` self-audits the linkage (matched name equals
    // the pre-perturbation name).
    "t17_fuzzy_linkage" -> api(
      (s, dir) => {
        Registry.registerAll(s)
        val part = s.read.parquet(s"$dir/part.parquet")
          .select(col("p_partkey"), col("p_name"))
        val catalog = part.groupBy(col("p_name").as("canon_name"))
          .agg(min(col("p_partkey")).as("canon_key"))
          .withColumn("blk", expr("substring(canon_name, 1, 4)"))
        val dirty = part.filter(col("p_partkey") % 10 === 0)
          .withColumn("pos",
            lit(6) + col("p_partkey") % (length(col("p_name")) - 6))
          .select(col("p_partkey").as("dirty_key"), col("p_name").as("orig"),
            concat(expr("substring(p_name, 1, pos - 1)"),
              expr("substring(p_name, pos + 1)")).as("dirty_name"))
          .withColumn("blk", expr("substring(dirty_name, 1, 4)"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("dirty_key"))
          .orderBy(col("jw").desc, col("canon_key"))
        dirty.join(broadcast(catalog), Seq("blk"))
          .withColumn("jw",
            round(expr("jaro_winkler(dirty_name, canon_name)"), 6))
          .filter(col("jw") >= 0.85)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("dirty_key"), col("canon_key"), col("jw"),
            (col("canon_name") === col("orig")).as("ok"))
          .orderBy(col("dirty_key"))
      },
      """WITH catalog AS (
           SELECT p_name AS canon_name, min(p_partkey) AS canon_key
           FROM part GROUP BY p_name),
         dirty AS (
           SELECT p_partkey AS dirty_key, p_name AS orig,
                  substr(p_name, 1, pos - 1) || substr(p_name, pos + 1)
                    AS dirty_name
           FROM (SELECT p_partkey, p_name,
                        6 + p_partkey % (length(p_name) - 6) AS pos
                 FROM part WHERE p_partkey % 10 = 0)),
         cand AS (
           SELECT d.dirty_key, d.orig, c.canon_key, c.canon_name,
                  round(jaro_winkler_similarity(d.dirty_name, c.canon_name),
                        6) AS jw
           FROM dirty d JOIN catalog c
             ON substr(d.dirty_name, 1, 4) = substr(c.canon_name, 1, 4)),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY dirty_key
                       ORDER BY jw DESC, canon_key) AS rn
           FROM cand WHERE jw >= 0.85)
         SELECT dirty_key, canon_key, jw, canon_name = orig AS ok
         FROM r WHERE rn = 1 ORDER BY dirty_key"""),

    // OOV-rate quality gate: corpus vocabulary = tokens holding more
    // than 1/50 of total token volume (freq*50 > total as an INTEGER
    // compare — no float threshold); per-document fraction of
    // tokens OUTSIDE that vocab, rolled up per source — the
    // tokenizer-coverage check run before committing a vocab/tokenizer
    // to a corpus. Two passes over token volume (corpus term frequency,
    // then per-doc membership via broadcast of the small vocab), both
    // map-side combined.
    "t16_oov_rate" -> api(
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val toks = docs.select(col("doc_id"), col("source"),
            explode(split(lower(coalesce(col("text"), lit(""))), "\\W+"))
              .as("tok"))
          .filter(col("tok") =!= "")
        val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val total = tf.agg(sum(col("c")).as("t"))
        val vocab = tf.crossJoin(broadcast(total))
          .filter(col("c") * 50 > col("t"))
          .select(col("tok"), lit(1L).as("__in"))
        val perDoc = toks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy(col("doc_id"), col("source"))
          .agg(count(lit(1)).as("n_tok"),
            sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        perDoc.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast("long").as("n_tokens"),
            sum(col("n_oov")).cast("long").as("n_oov"),
            round(sum(col("n_oov")).cast("double") / sum(col("n_tok")), 6)
              .as("oov_rate"))
          .orderBy(col("source"))
      },
      """WITH t AS (SELECT doc_id, source,
                      unnest(list_filter(string_split_regex(
                        lower(coalesce(text, '')), '\W+'),
                        x -> x <> '')) AS tok
                    FROM documents),
         tf AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
         tot AS (SELECT sum(c) AS t FROM tf),
         v AS (SELECT tok FROM tf, tot WHERE c * 50 > t),
         pd AS (SELECT t.doc_id, t.source, count(*) AS n_tok,
                  sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
                FROM t LEFT JOIN v ON t.tok = v.tok
                GROUP BY 1, 2)
         SELECT source, count(*) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                CAST(sum(n_oov) AS BIGINT) AS n_oov,
                round(CAST(sum(n_oov) AS DOUBLE) / sum(n_tok), 6) AS oov_rate
         FROM pd GROUP BY source ORDER BY source"""),

    "t13_vocab" -> api(
      (s, dir) => {
        val toks = s.read.parquet(s"$dir/documents.parquet")
          .select(col("source"),
            explode(split(lower(coalesce(col("text"), lit(""))), "\\W+"))
              .as("tok"))
          .filter(col("tok") =!= "")
        val tf = toks.groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("c"))
        tf.groupBy(col("source"))
          .agg(sum(col("c")).cast("long").as("n_tokens"),
            count(lit(1)).as("vocab"),
            round(count(lit(1)).cast("double") / sum(col("c")), 6).as("ttr"),
            round(sum(col("c") * length(col("tok"))).cast("double")
              / sum(col("c")), 6).as("mean_tok_len"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long")
              .as("hapax"))
          .orderBy(col("source"))
      },
      """WITH t AS (SELECT source,
                           unnest(list_filter(string_split_regex(
                             lower(coalesce(text, '')), '\W+'),
                             x -> x <> '')) AS tok
                    FROM documents),
         tf AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2)
         SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                count(*) AS vocab,
                round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
                round(CAST(sum(c * length(tok)) AS DOUBLE) / sum(c), 6)
                  AS mean_tok_len,
                CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS hapax
         FROM tf GROUP BY source ORDER BY source""")

    ,

    // Sentence segmentation statistics — the document-structure signal
    // quality filters read (too-few or degenerate sentences flag
    // boilerplate). Split on terminator+whitespace runs (RE2-safe — no
    // lookbehind, so the same pattern runs in both engines), empties
    // dropped; per-doc counts and exact char stats, all inside codegen'd
    // higher-order array functions — no shuffle at all before the
    // output sort.
    "t14_sentences" -> api(
      (s, dir) => {
        val parts = filter(
          split(coalesce(col("text"), lit("")), "[.!?]+\\s+"),
          p => length(p) > 0)
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            size(parts).cast("long").as("n_sent"),
            round(
              aggregate(transform(parts, p => length(p).cast("long")),
                lit(0L), (a, x) => a + x).cast("double")
                / greatest(size(parts), lit(1)), 6).as("mean_chars"),
            aggregate(transform(parts, p => length(p).cast("long")),
              lit(0L), (a, x) => greatest(a, x)).as("max_chars"))
          .orderBy(col("doc_id"))
      },
      """WITH p AS (SELECT doc_id,
                           list_filter(string_split_regex(
                             coalesce(text, ''), '[.!?]+\s+'),
                             x -> length(x) > 0) AS parts
                    FROM documents)
         SELECT doc_id, CAST(len(parts) AS BIGINT) AS n_sent,
                round(CAST(coalesce(list_sum(list_transform(parts,
                        x -> length(x))), 0) AS DOUBLE)
                      / greatest(len(parts), 1), 6) AS mean_chars,
                CAST(coalesce(list_max(list_transform(parts,
                       x -> length(x))), 0) AS BIGINT) AS max_chars
         FROM p ORDER BY doc_id""")
  )

  /** One shared per-JVM scratch root under target/tmp, swept by a SINGLE
    * shutdown hook — per-invocation hooks would accumulate unboundedly in
    * a long-lived session running scratch-backed queries repeatedly.
    * The root itself is UUID-suffixed so two concurrent JVMs never share
    * a path or read each other's partial writes.
    */
  private lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Paths.get("target", "tmp",
      s"run_${java.util.UUID.randomUUID().toString.take(8)}")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del)); f.delete(); ()
      }
      del(root.toFile)
    }))
    root
  }

  /** Per-query scratch directory under [[scratchRoot]] — UUID-suffixed so
    * repeated invocations of the same query never collide (same
    * discipline as the st01/st02 sink names); the shared root's one
    * shutdown hook sweeps everything on JVM exit.
    */
  private def scratchDir(prefix: String): String =
    scratchRoot.resolve(
      s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}").toString

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Registry.registerAll(spark)
    queries("q07_agg_group")(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, QFn] =
    defs.map { case (n, (fn, _)) => n -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.collect { case (n, (_, Some(o))) => n -> o }.toMap
}
