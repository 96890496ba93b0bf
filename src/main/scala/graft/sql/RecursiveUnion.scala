package graft.sql

/** UNION-distinct recursive CTEs (gr09/gr10). Spark 4 executes
  * `WITH RECURSIVE … UNION ALL …` natively (SPARK-24497 / UnionLoop)
  * but REJECTS the UNION-distinct form (`UNION_NOT_SUPPORTED_IN_
  * RECURSIVE_CTE`) — yet that form is exactly what makes recursion over
  * a CYCLIC graph terminate in DuckDB/Postgres: each round keeps only
  * rows never seen before, so the frontier drains at the closure.
  *
  * This parser detects the form; [[graft.api.Table]] lowers it onto the
  * engine's iterate machinery as frontier-minus-seen:
  *
  *   seen ← distinct(seed);  frontier ← seen
  *   repeat: next ← distinct(step(frontier)) EXCEPT seen
  *           stop when next is empty; seen ← seen ∪ next; frontier ← next
  *
  * which is the SQL-standard semantics of the UNION-distinct recursive
  * term (the working table each round is the set of NEW rows). The
  * UNION ALL form keeps Spark's native path — this file returns None
  * for it.
  *
  * Non-recursive HELPER CTEs may ride alongside the recursive CTEs
  * (gr10 — the common real-world shape: a seed-data or parameter CTE
  * next to the traversal). Helpers bind once, in textual order, before
  * any recursion runs; a helper must not reference a recursive CTE
  * (its closure does not exist until the loop drains — refused loudly).
  *
  * SEVERAL recursions may share one WITH RECURSIVE (gr11/gr12 —
  * DuckDB executes them in one statement, Postgres refuses mutual
  * shapes): the parser groups them into strongly-connected components
  * of the reference graph and emits the groups dependencies-first, so
  * an ACYCLIC reference (backward or forward in text) drains the
  * referenced recursion fully before the referencing one starts —
  * legal because UNION-distinct steps are monotone, so staged and
  * simultaneous evaluation reach the same least fixpoint. A CYCLIC
  * group (TRUE mutual recursion, gr12) drains as ONE simultaneous
  * loop: each round every member's step runs against the round-start
  * state — its OWN frontier for the self-reference, the SIBLINGS'
  * closures-so-far for cross-references — and the loop stops when a
  * full round adds no row to any member. Both rules were probed
  * against DuckDB 1.x (even/odd mutual chain; a three-CTE statement
  * mixing a cycle with a dependent; a member whose frontier drains
  * while a sibling keeps consuming its closure).
  *
  * Scale shape: each round is one distinct + one EXCEPT (both keyed
  * shuffles on the full row), lineage cut every round (the Iterate
  * discipline), frontier-sized work per round once the closure stops
  * growing. The anti-join against `seen` is the cycle guard — cost
  * tracks closure size, never path count (UNION ALL on a cycle never
  * terminates; on a DAG with many paths it enumerates every path).
  */
object RecursiveUnion {

  /** A non-recursive helper CTE bound once before any recursion. */
  final case class Helper(name: String, cols: Option[Seq[String]],
                          body: String)

  /** One recursive CTE: declared name/columns, seed text, step text. */
  final case class Rec(name: String, cols: Option[Seq[String]],
                       seed: String, step: String)

  /** The statement: helper CTEs, recursive CTEs (textual order), the
    * outer statement after the CTE list, and the drain plan — SCC
    * groups of the recursion reference graph, dependencies first
    * (gr11/gr12). A singleton group is an ordinary recursion; a
    * multi-member group is a mutual recursion draining as one
    * simultaneous loop.
    */
  final case class Stmt(recs: Seq[Rec], outer: String,
                        helpers: Seq[Helper] = Nil,
                        groups: Seq[Seq[Rec]] = Nil) {
    def drainGroups: Seq[Seq[Rec]] =
      if (groups.nonEmpty) groups else recs.map(Seq(_))
  }

  import Dialect.{findTopLevelKeywordIn, splitTopLevel, stripLiterals, wordAt}
  import Dialect.{matchParenAt => matchParen, skipWsAt => skipWs}

  private[graft] final case class RawCte(name: String,
                                         cols: Option[Seq[String]],
                                         body: String, bodyMask: String)

  /** QUIET tokenization of a `WITH [RECURSIVE] name [(cols)] AS (body),
    * …` head: Some((recursive?, ctes, restStart)) — None when any shape
    * this scanner does not recognize appears (AS MATERIALIZED,
    * unparenthesized bodies, duplicate names, …), so callers fall back
    * to the native path. Shared by the recursion lowering and the
    * CTE-headed DML form (u16).
    */
  private[graft] def tokenizeWith(
      sql: String): Option[(Boolean, Seq[RawCte], Int)] = {
    val m = stripLiterals(sql)
    var i = skipWs(m, 0)
    if (!wordAt(m, i, "with")) return None
    i = skipWs(m, i + 4)
    val rec = wordAt(m, i, "recursive")
    if (rec) i = skipWs(m, i + 9)
    val ctes = scala.collection.mutable.ArrayBuffer.empty[RawCte]
    var more = true
    while (more) {
      val ns = i
      while (i < m.length &&
        (m.charAt(i).isLetterOrDigit || m.charAt(i) == '_')) i += 1
      val name = sql.substring(ns, i)
      if (name.isEmpty || name.head.isDigit) return None
      i = skipWs(m, i)
      var cols: Option[Seq[String]] = None
      if (i < m.length && m.charAt(i) == '(') {
        val close = matchParen(m, i)
        cols = Some(splitTopLevel(sql.substring(i + 1, close)).map(_.trim))
        if (!cols.get.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")))
          return None
        i = skipWs(m, close + 1)
      }
      if (!wordAt(m, i, "as")) return None
      i = skipWs(m, i + 2)
      if (i >= m.length || m.charAt(i) != '(') return None
      val bodyClose = matchParen(m, i)
      ctes += RawCte(name, cols, sql.substring(i + 1, bodyClose),
        m.substring(i + 1, bodyClose))
      i = skipWs(m, bodyClose + 1)
      if (i < m.length && m.charAt(i) == ',') i = skipWs(m, i + 1)
      else more = false
    }
    if (ctes.map(_.name.toLowerCase).distinct.size != ctes.size) return None
    Some((rec, ctes.toSeq, i))
  }

  /** Word-boundary occurrence search on a masked view. */
  private[graft] def containsWord(mask: String, w: String): Boolean =
    (0 until mask.length).exists(k => wordAt(mask, k, w))

  /** The top-level UNION-distinct boundary of a CTE body, or None when
    * the body has no top-level bare UNION (UNION ALL / BY NAME keep
    * their own paths).
    */
  private def unionDistinctAt(bodyMask: String): Option[Int] = {
    val u = findTopLevelKeywordIn(bodyMask, 0, "union")
    if (u < 0) return None
    val after = skipWs(bodyMask, u + 5)
    if (wordAt(bodyMask, after, "all") || wordAt(bodyMask, after, "by")) None
    else Some(u)
  }

  /** None when the statement is not `WITH RECURSIVE …` with a
    * UNION-distinct recursive CTE — the native path keeps everything
    * else. Loud on shapes this lowering would mis-execute (several
    * UNION-distinct candidates, other self-referencing CTEs, multiple
    * top-level set operators in the recursive body, a helper that
    * reads the recursion's result).
    */
  def parse(sql: String): Option[Stmt] = {
    // stage 1 — QUIET list tokenization: any shape the scanner does
    // not recognize (AS MATERIALIZED, unparenthesized bodies, …) keeps
    // the native path; loudness starts only once a UNION-distinct
    // recursive CTE establishes ownership below
    val (ctes, i) = tokenizeWith(sql) match {
      case Some((true, cs, rest)) => (cs, rest)
      case _ => return None // not WITH RECURSIVE — native handles it
    }
    // the recursive CTEs: UNION-distinct bodies that reference their
    // own name OR any other UNION-distinct candidate — mutual members
    // (gr12) reference only each other, never themselves, so the
    // self-reference test alone would miss them. With a SINGLE CTE the
    // reference is not required at all (a degenerate non-recursive
    // UNION-distinct body still lowers here — it drains in one extra
    // round and keeps pre-gr10 behavior).
    val candidates = ctes.filter(c =>
      unionDistinctAt(c.bodyMask).isDefined)
    val refs = candidates.filter(c =>
      containsWord(c.bodyMask, c.name) ||
        candidates.exists(o => !(o eq c) && containsWord(c.bodyMask, o.name)))
    val recs =
      if (refs.nonEmpty) refs.toSeq
      else if (ctes.size == 1 && candidates.nonEmpty) ctes.toSeq
      else return None // no UNION-distinct recursion — native handles it
    // this lowering owns the statement from here — malformed shapes
    // error loudly instead of falling through to a confusing native error
    recs.foreach { r =>
      val u = unionDistinctAt(r.bodyMask).get
      require(findTopLevelKeywordIn(r.bodyMask, u + 5, "union") < 0 &&
        Seq("intersect", "except")
          .forall(findTopLevelKeywordIn(r.bodyMask, 0, _) < 0),
        "UNION-distinct recursion supports exactly one top-level UNION " +
          s"in the recursive CTE body of ${r.name} (seed UNION step) — " +
          "parenthesize inner set operations")
    }
    // drain plan (gr11/gr12): SCC groups of the reference graph,
    // dependencies first. An edge r→x means r's body reads x; Tarjan
    // emits components sink-first, so every group's dependencies are
    // drained (and bound) before the group runs. A singleton group is
    // the ordinary sequential case; a multi-member group is TRUE
    // mutual recursion and drains as one simultaneous loop.
    val n = recs.size
    val adj: IndexedSeq[Seq[Int]] = recs.toIndexedSeq.map(r =>
      recs.indices.filter(k =>
        !(recs(k) eq r) && containsWord(r.bodyMask, recs(k).name)).toSeq)
    val groups = sccGroups(n, adj)
    // within a mutual group DuckDB binds seeds BEFORE any sibling
    // exists — a seed referencing a sibling is its own Binder error
    // ("Circular reference"); mirror the refusal. The group's seed
    // span is body[0, union) — recompute per rec below.
    groups.filter(_.size > 1).foreach { g =>
      g.foreach { gi =>
        val r = recs(gi)
        val u = unionDistinctAt(r.bodyMask).get
        val seedMask = r.bodyMask.substring(0, u)
        g.foreach { gj =>
          require(gi == gj || !containsWord(seedMask, recs(gj).name),
            s"the seed of recursive CTE ${recs(gi).name} references its " +
              s"mutual-recursion sibling ${recs(gj).name} — seeds bind " +
              "before any sibling exists (DuckDB's circular-reference " +
              "error); reference siblings only in the step")
        }
      }
    }
    val helpers = ctes.toSeq.filterNot(c => recs.exists(_ eq c))
    helpers.foreach { h =>
      require(!containsWord(h.bodyMask, h.name),
        s"helper CTE ${h.name} references itself — only a UNION-distinct " +
          "self-referencing CTE may recurse; rewrite or rename")
      recs.foreach { r =>
        require(!containsWord(h.bodyMask, r.name),
          s"helper CTE ${h.name} references the recursive CTE ${r.name} — " +
            "its closure exists only after the recursion; consume it in " +
            "the outer statement instead")
      }
    }
    val outer = sql.substring(i).trim
    require(outer.nonEmpty,
      "WITH RECURSIVE needs an outer statement after the CTE list")
    val parsed = recs.map { r =>
      val u = unionDistinctAt(r.bodyMask).get
      Rec(r.name, r.cols, r.body.substring(0, u).trim,
        r.body.substring(u + 5).trim)
    }
    Some(Stmt(parsed, outer,
      helpers.map(h => Helper(h.name, h.cols, h.body)),
      groups.map(_.map(parsed))))
  }

  /** Tarjan SCC over `n` nodes with adjacency `adj` (edge r→x = r
    * depends on x), emitting components sink-first — every component
    * appears before any component that depends on it, which is exactly
    * drain order. Iterative (an explicit stack): CTE lists are tiny
    * but a parser must not be stack-depth-bound.
    */
  private def sccGroups(n: Int,
                        adj: IndexedSeq[Seq[Int]]): Seq[Seq[Int]] = {
    val index = Array.fill(n)(-1)
    val low = Array.fill(n)(0)
    val onStack = Array.fill(n)(false)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    var counter = 0
    // explicit DFS frames: (node, next-child cursor)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    for (root <- 0 until n if index(root) < 0) {
      frames += Array(root, 0)
      index(root) = counter; low(root) = counter; counter += 1
      stack += root; onStack(root) = true
      while (frames.nonEmpty) {
        val f = frames.last
        val v = f(0)
        if (f(1) < adj(v).size) {
          val w = adj(v)(f(1)); f(1) += 1
          if (index(w) < 0) {
            index(w) = counter; low(w) = counter; counter += 1
            stack += w; onStack(w) = true
            frames += Array(w, 0)
          } else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          frames.remove(frames.size - 1)
          if (frames.nonEmpty) {
            val p = frames.last(0)
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val comp = scala.collection.mutable.ArrayBuffer.empty[Int]
            var w = -1
            while (w != v) {
              w = stack.remove(stack.size - 1); onStack(w) = false
              comp += w
            }
            // textual order inside the group (stable driver output)
            out += comp.sorted.toSeq
          }
        }
      }
    }
    out.toSeq
  }

}
