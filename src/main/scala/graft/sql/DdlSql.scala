package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CTAS / view-definition statement forms (u11) — the DuckDB-workflow
  * staples next to the DML family ([[DmlSql]], u10):
  *
  *   CREATE [OR REPLACE] [TEMP | TEMPORARY] TABLE name AS <select>
  *   CREATE [OR REPLACE] [TEMP | TEMPORARY] VIEW  name AS <select>
  *
  * This engine's tables are immutable frames bound to session views, so
  * both forms bind `name` in the session catalog AND return the defined
  * table (the u09/u10 returns-the-post-statement-table convention —
  * deliberately diverging from engines that return an empty result;
  * callers chain on either the view name or the returned frame).
  *
  * TABLE vs VIEW is materialized vs recomputed: a TABLE materializes
  * the query's result ONCE (an eager localCheckpoint — a 100 TB
  * pipeline publishing durably should use the WAP writer,
  * [[graft.ops.Wap]], which this form deliberately does not shadow),
  * while a VIEW binds the lazy PLAN and re-executes it per reference.
  * Both resolve names at DEFINITION time (early binding — re-registering
  * a source view later changes neither; the one documented divergence
  * from text-bound views, and the same rule Spark applies to a
  * DataFrame-backed temp view). Without OR REPLACE an existing binding
  * refuses loudly (the standard's already-exists error).
  *
  * Scale shape: VIEW is pure metadata (zero jobs); TABLE costs exactly
  * one materialization of the defining query (executor block storage,
  * the Iterate checkpoint discipline) and every later reference reads
  * the snapshot instead of re-running the plan.
  */
object DdlSql {

  final case class Stmt(isView: Boolean, orReplace: Boolean,
                        name: String, body: String)

  import Dialect.{stripLiterals, wordAt, skipWsAt => skipWs}

  /** First-words dispatch (masked scan): None unless the statement is
    * `CREATE [OR REPLACE] [TEMP|TEMPORARY] TABLE|VIEW … AS …` — other
    * CREATE forms (USING data sources, indexes, databases) keep Spark's
    * native path. Malformed claimed shapes fail loudly from here.
    */
  def parse(sql: String): Option[Stmt] = {
    val m = stripLiterals(sql)
    var i = skipWs(m, 0)
    if (!wordAt(m, i, "create")) return None
    i = skipWs(m, i + 6)
    var orReplace = false
    if (wordAt(m, i, "or")) {
      val j = skipWs(m, i + 2)
      if (!wordAt(m, j, "replace")) return None
      orReplace = true
      i = skipWs(m, j + 7)
    }
    if (wordAt(m, i, "temporary")) i = skipWs(m, i + 9)
    else if (wordAt(m, i, "temp")) i = skipWs(m, i + 4)
    val isView =
      if (wordAt(m, i, "view")) { i = skipWs(m, i + 4); true }
      else if (wordAt(m, i, "table")) { i = skipWs(m, i + 5); false }
      else return None
    val ns = i
    while (i < m.length &&
      (m.charAt(i).isLetterOrDigit || m.charAt(i) == '_')) i += 1
    val name = sql.substring(ns, i)
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      (i >= m.length || (m.charAt(i) != '.' && sql.charAt(i) != '`')),
      s"CREATE ${if (isView) "VIEW" else "TABLE"} needs a plain session " +
        s"view name (got '${sql.substring(ns).trim.take(30)}') — " +
        "qualified names have no session-catalog meaning here")
    i = skipWs(m, i)
    require(wordAt(m, i, "as"),
      s"CREATE ${if (isView) "VIEW" else "TABLE"} $name must be followed " +
        "by AS <select> — column-defined CREATE TABLE is not a form of " +
        "this engine (tables are immutable frames)")
    val body = sql.substring(i + 2).trim
    require(body.nonEmpty, s"empty defining query for $name")
    Some(Stmt(isView, orReplace, name, body))
  }

  /** Execute: run the defining query through `runBody` (the caller's
    * full statement pipeline, so dialect forms compose inside the AS
    * body), snapshot it for TABLE, bind the session view, return it.
    */
  def run(spark: SparkSession, st: Stmt,
          runBody: String => DataFrame): DataFrame = {
    if (!st.orReplace)
      require(!spark.catalog.tableExists(st.name),
        s"${if (st.isView) "view" else "table"} '${st.name}' already " +
          "exists — use CREATE OR REPLACE")
    val defined = runBody(st.body)
    val bound = if (st.isView) defined else defined.localCheckpoint(true)
    bound.createOrReplaceTempView(st.name)
    bound
  }
}
