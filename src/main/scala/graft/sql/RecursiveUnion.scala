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
  * SEVERAL INDEPENDENT recursions may share one WITH RECURSIVE (gr11 —
  * DuckDB/Postgres execute them in one statement): they drain
  * SEQUENTIALLY in textual order, each closure binding before the next
  * recursion starts, so a later recursion may consume an earlier one's
  * closure (probed against DuckDB: a recursion seeded from another's
  * result). TRUE mutual recursion — a recursive CTE referencing one
  * declared later — has no sequential order and refuses loudly.
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

  /** The statement: helper CTEs and recursive CTEs (each list in
    * textual order — recursions drain sequentially, gr11) and the outer
    * statement after the CTE list.
    */
  final case class Stmt(recs: Seq[Rec], outer: String,
                        helpers: Seq[Helper] = Nil)

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
    // own name; with a SINGLE CTE the self-reference is not required (a
    // degenerate non-recursive UNION-distinct body still lowers here —
    // it drains in one extra round and keeps pre-gr10 behavior)
    val selfRef = ctes.filter(c =>
      unionDistinctAt(c.bodyMask).isDefined && containsWord(c.bodyMask, c.name))
    val recs =
      if (selfRef.nonEmpty) selfRef.toSeq
      else if (ctes.size == 1 && unionDistinctAt(ctes.head.bodyMask).isDefined)
        ctes.toSeq
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
    // recursions drain in textual order: a body referencing a LATER
    // recursive CTE has no sequential execution — true mutual recursion
    // stays a loud refusal (gr11)
    val recIdx = recs.zipWithIndex.toMap
    recs.foreach { r =>
      recs.drop(recIdx(r) + 1).foreach { later =>
        require(!containsWord(r.bodyMask, later.name),
          s"recursive CTE ${r.name} references ${later.name}, declared " +
            "after it — recursions drain in textual order (no mutual " +
            "recursion); reorder so each references only earlier ones")
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
    Some(Stmt(
      recs.map { r =>
        val u = unionDistinctAt(r.bodyMask).get
        Rec(r.name, r.cols, r.body.substring(0, u).trim,
          r.body.substring(u + 5).trim)
      },
      outer, helpers.map(h => Helper(h.name, h.cols, h.body))))
  }

}
