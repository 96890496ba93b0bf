package graft.sql

/** UNION-distinct recursive CTEs (gr09). Spark 4 executes
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
  * Scale shape: each round is one distinct + one EXCEPT (both keyed
  * shuffles on the full row), lineage cut every round (the Iterate
  * discipline), frontier-sized work per round once the closure stops
  * growing. The anti-join against `seen` is the cycle guard — cost
  * tracks closure size, never path count (UNION ALL on a cycle never
  * terminates; on a DAG with many paths it enumerates every path).
  */
object RecursiveUnion {

  /** One recursive CTE: declared name/columns, seed text, step text,
    * and the outer statement after the CTE's closing paren.
    */
  final case class Stmt(name: String, cols: Option[Seq[String]],
                        seed: String, step: String, outer: String)

  import Dialect.{findTopLevelKeywordIn, splitTopLevel, stripLiterals, wordAt}
  import Dialect.{matchParenAt => matchParen, skipWsAt => skipWs}

  /** None when the statement is not `WITH RECURSIVE name[(cols)] AS
    * (seed UNION step) outer` with a DISTINCT union — the native path
    * keeps everything else. Loud on shapes this lowering would
    * mis-execute (multiple CTEs, multiple top-level set operators in
    * the body).
    */
  def parse(sql: String): Option[Stmt] = {
    val m = stripLiterals(sql)
    var i = skipWs(m, 0)
    if (!wordAt(m, i, "with")) return None
    i = skipWs(m, i + 4)
    if (!wordAt(m, i, "recursive")) return None
    i = skipWs(m, i + 9)
    val ns = i
    while (i < m.length && (m.charAt(i).isLetterOrDigit || m.charAt(i) == '_')) i += 1
    val name = sql.substring(ns, i)
    require(name.nonEmpty && !name.head.isDigit,
      "WITH RECURSIVE needs a CTE name")
    i = skipWs(m, i)
    var cols: Option[Seq[String]] = None
    if (i < m.length && m.charAt(i) == '(') {
      val close = matchParen(m, i)
      cols = Some(splitTopLevel(sql.substring(i + 1, close)).map(_.trim))
      require(cols.get.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
        "recursive CTE column list must be plain names")
      i = skipWs(m, close + 1)
    }
    require(wordAt(m, i, "as"), "recursive CTE needs AS (…)")
    i = skipWs(m, i + 2)
    require(i < m.length && m.charAt(i) == '(',
      "recursive CTE body must be parenthesized")
    val bodyClose = matchParen(m, i)
    val body = sql.substring(i + 1, bodyClose)
    val bodyMask = m.substring(i + 1, bodyClose)
    val u = findTopLevelKeywordIn(bodyMask, 0, "union")
    if (u < 0) return None // no recursion boundary — native handles it
    val after = skipWs(bodyMask, u + 5)
    if (wordAt(bodyMask, after, "all") || wordAt(bodyMask, after, "by"))
      return None // UNION ALL → Spark native; BY NAME → its own pass
    // this lowering owns the statement from here — malformed shapes
    // error loudly instead of falling through to a confusing native error
    require(findTopLevelKeywordIn(bodyMask, u + 5, "union") < 0 &&
      Seq("intersect", "except")
        .forall(findTopLevelKeywordIn(bodyMask, 0, _) < 0),
      "UNION-distinct recursion supports exactly one top-level UNION in " +
        "the CTE body (seed UNION step) — parenthesize inner set " +
        "operations")
    val rest = skipWs(m, bodyClose + 1)
    require(rest >= m.length || m.charAt(rest) != ',',
      "UNION-distinct recursion supports a single CTE — inline or nest " +
        "the additional CTEs")
    val outer = sql.substring(bodyClose + 1).trim
    require(outer.nonEmpty,
      "WITH RECURSIVE needs an outer statement after the CTE")
    Some(Stmt(name, cols, body.substring(0, u).trim,
      body.substring(u + 5).trim, outer))
  }

}
