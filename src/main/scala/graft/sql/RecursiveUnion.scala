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
  * Non-recursive HELPER CTEs may ride alongside the one recursive CTE
  * (gr10 — the common real-world shape: a seed-data or parameter CTE
  * next to the traversal). Helpers bind once, in textual order, before
  * the recursion runs; a helper must not reference the recursive CTE
  * (its closure does not exist until the loop drains — refused loudly).
  * Exactly one CTE may be the UNION-distinct recursive one.
  *
  * Scale shape: each round is one distinct + one EXCEPT (both keyed
  * shuffles on the full row), lineage cut every round (the Iterate
  * discipline), frontier-sized work per round once the closure stops
  * growing. The anti-join against `seen` is the cycle guard — cost
  * tracks closure size, never path count (UNION ALL on a cycle never
  * terminates; on a DAG with many paths it enumerates every path).
  */
object RecursiveUnion {

  /** A non-recursive helper CTE bound once before the recursion. */
  final case class Helper(name: String, cols: Option[Seq[String]],
                          body: String)

  /** One recursive CTE: declared name/columns, seed text, step text,
    * helper CTEs in textual order, and the outer statement after the
    * CTE list.
    */
  final case class Stmt(name: String, cols: Option[Seq[String]],
                        seed: String, step: String, outer: String,
                        helpers: Seq[Helper] = Nil)

  import Dialect.{findTopLevelKeywordIn, splitTopLevel, stripLiterals, wordAt}
  import Dialect.{matchParenAt => matchParen, skipWsAt => skipWs}

  private final case class RawCte(name: String, cols: Option[Seq[String]],
                                  body: String, bodyMask: String)

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
    val m = stripLiterals(sql)
    var i = skipWs(m, 0)
    if (!wordAt(m, i, "with")) return None
    i = skipWs(m, i + 4)
    if (!wordAt(m, i, "recursive")) return None
    i = skipWs(m, i + 9)
    // stage 1 — QUIET list tokenization: any shape this scanner does
    // not recognize (AS MATERIALIZED, unparenthesized bodies, …) keeps
    // the native path; loudness starts only once a UNION-distinct
    // recursive CTE establishes ownership below
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
    // the recursive CTE: a UNION-distinct body that references its own
    // name; with a SINGLE CTE the self-reference is not required (a
    // degenerate non-recursive UNION-distinct body still lowers here —
    // it drains in one extra round and keeps pre-gr10 behavior)
    val selfRef = ctes.filter(c =>
      unionDistinctAt(c.bodyMask).isDefined && containsWord(c.bodyMask, c.name))
    val rec =
      if (selfRef.nonEmpty) selfRef
      else if (ctes.size == 1 && unionDistinctAt(ctes.head.bodyMask).isDefined)
        ctes.toSeq
      else return None // no UNION-distinct recursion — native handles it
    require(rec.size == 1,
      s"UNION-distinct recursion supports exactly one recursive CTE, " +
        s"found ${rec.map(_.name).mkString(", ")} — rewrite all but one")
    val r = rec.head
    val u = unionDistinctAt(r.bodyMask).get
    // this lowering owns the statement from here — malformed shapes
    // error loudly instead of falling through to a confusing native error
    require(findTopLevelKeywordIn(r.bodyMask, u + 5, "union") < 0 &&
      Seq("intersect", "except")
        .forall(findTopLevelKeywordIn(r.bodyMask, 0, _) < 0),
      "UNION-distinct recursion supports exactly one top-level UNION in " +
        "the recursive CTE body (seed UNION step) — parenthesize inner " +
        "set operations")
    val helpers = ctes.toSeq.filter(_ ne r)
    helpers.foreach { h =>
      require(!containsWord(h.bodyMask, h.name),
        s"helper CTE ${h.name} references itself — only ${r.name} may " +
          "recurse; rewrite or rename")
      require(!containsWord(h.bodyMask, r.name),
        s"helper CTE ${h.name} references the recursive CTE ${r.name} — " +
          "its closure exists only after the recursion; consume it in " +
          "the outer statement instead")
    }
    val outer = sql.substring(i).trim
    require(outer.nonEmpty,
      "WITH RECURSIVE needs an outer statement after the CTE list")
    Some(Stmt(r.name, r.cols, r.body.substring(0, u).trim,
      r.body.substring(u + 5).trim, outer,
      helpers.map(h => Helper(h.name, h.cols, h.body))))
  }

}
