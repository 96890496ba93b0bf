package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DML statement forms (u10): `INSERT INTO`, `UPDATE … SET … [WHERE]`,
  * `DELETE FROM … [WHERE]` — the three simpler siblings of MERGE INTO
  * (u09), sharing its convention: this engine's tables are immutable
  * frames, so each statement RETURNS the post-statement table instead
  * of mutating in place ([[MergeSql]] doc, the q59/q60 statement-form
  * rule). Callers chain statements by re-registering the returned frame.
  *
  *   INSERT INTO t [(cols)] VALUES (…), (…) | <select statement>
  *   UPDATE t [AS a] SET c = e, … [WHERE pred]
  *   DELETE FROM t [AS a] [WHERE pred]
  *
  * Semantics (SQL standard, probed against DuckDB):
  *   - INSERT with a column list fills unnamed target columns with
  *     NULL; without one the source is positional over the full target
  *     schema. Inserted expressions cast into the target column types.
  *   - UPDATE evaluates every SET expression against the OLD row (the
  *     standard's simultaneous-assignment rule — a CASE projection over
  *     the input columns gives exactly that); rows where the predicate
  *     is false or NULL keep their values.
  *   - DELETE removes rows where the predicate is TRUE; false or NULL
  *     keep the row. No WHERE removes every row (valid SQL — loudness
  *     would be wrong here).
  *
  * Scale shape: INSERT is one union (no shuffle), UPDATE a map-side
  * CASE projection, DELETE a map-side filter — all three stay inside
  * whole-stage codegen with no exchange of their own.
  */
object DmlSql {

  sealed trait Stmt
  final case class Insert(targetRef: String, cols: Option[Seq[String]],
                          values: Option[String], source: Option[String])
    extends Stmt
  final case class Update(targetRef: String, alias: String,
                          sets: Seq[(String, String)], where: Option[String])
    extends Stmt
  final case class Delete(targetRef: String, alias: String,
                          where: Option[String]) extends Stmt

  import Dialect.{findTopLevelKeywordIn, splitTopLevel, stripLiterals, wordAt}
  import Dialect.{matchParenAt => matchParen, skipWsAt => skipWs}

  /** First-word dispatch (masked scan): None unless the statement is
    * INSERT INTO / UPDATE / DELETE FROM. Malformed DML fails loudly
    * from here rather than falling through to Spark's parser.
    */
  def parse(sql: String): Option[Stmt] = {
    val m = stripLiterals(sql)
    val i = skipWs(m, 0)
    if (wordAt(m, i, "insert")) Some(parseInsert(sql, m, i))
    else if (wordAt(m, i, "update")) Some(parseUpdate(sql, m, i))
    else if (wordAt(m, i, "delete")) Some(parseDelete(sql, m, i))
    else None
  }

  /** `name [AS alias]` — the MERGE rule: a bare (possibly dotted /
    * backticked) name with no alias defaults its alias to the LAST
    * identifier part, backticks stripped (advice r15: `db.t` must not
    * become the alias text).
    */
  private def parseTargetRef(text: String, what: String): (String, String) = {
    val t = text.trim
    require(t.nonEmpty, s"empty $what target")
    val parts = t.split("\\s+").toSeq
    val name = parts.head
    require(Dialect.isBareIdentifier(name),
      s"$what target must be a table name, got: $t")
    val explicit = parts.tail.filterNot(_.equalsIgnoreCase("as"))
    require(explicit.size <= 1, s"malformed $what target: $t")
    val alias = explicit.headOption.getOrElse {
      val last = name.split("\\.").last.replaceAll("`", "")
      require(last.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"cannot derive an alias from '$name' — add an explicit alias")
      last
    }
    require(alias.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"malformed $what alias: $alias")
    (name, alias)
  }

  private def parseInsert(sql: String, m: String, start: Int): Insert = {
    var i = skipWs(m, start + 6)
    require(wordAt(m, i, "into"), "INSERT must be followed by INTO")
    i = skipWs(m, i + 4)
    val ns = i
    while (i < m.length && (m.charAt(i).isLetterOrDigit ||
      m.charAt(i) == '_' || m.charAt(i) == '.')) i += 1
    val name = sql.substring(ns, i)
    require(name.nonEmpty && Dialect.isBareIdentifier(name),
      "INSERT INTO needs a table name")
    i = skipWs(m, i)
    var cols: Option[Seq[String]] = None
    if (i < m.length && m.charAt(i) == '(') {
      // a paren here is the column list ONLY if the remainder still has
      // a VALUES/SELECT — `INSERT INTO t (SELECT …)` is a source, not a
      // column list
      val close = matchParen(m, i)
      val inner = sql.substring(i + 1, close).trim
      val innerM = stripLiterals(inner)
      val isColList = splitTopLevel(inner)
        .forall(_.trim.matches("[A-Za-z_][A-Za-z0-9_]*")) &&
        !wordAt(innerM, skipWs(innerM, 0), "select")
      if (isColList) {
        cols = Some(splitTopLevel(inner).map(_.trim))
        require(cols.get.map(_.toLowerCase).distinct.size == cols.get.size,
          "duplicate column in INSERT column list")
        i = skipWs(m, close + 1)
      }
    }
    val rest = sql.substring(i)
    val restM = m.substring(i)
    val k = skipWs(restM, 0)
    if (wordAt(restM, k, "values")) {
      val v = rest.substring(k + 6).trim
      require(v.startsWith("("),
        "INSERT VALUES needs parenthesized row expressions")
      Insert(name, cols, Some(v), None)
    } else {
      require(rest.trim.nonEmpty,
        "INSERT INTO needs VALUES (…) or a SELECT source")
      Insert(name, cols, None, Some(rest.trim))
    }
  }

  private def parseUpdate(sql: String, m: String, start: Int): Update = {
    val setPos = findTopLevelKeywordIn(m, start + 6, "set")
    require(setPos > 0, "UPDATE requires SET")
    val (name, alias) = parseTargetRef(sql.substring(start + 6, setPos),
      "UPDATE")
    val wherePos = findTopLevelKeywordIn(m, setPos + 3, "where")
    val setEnd = if (wherePos < 0) sql.length else wherePos
    val sets = splitTopLevel(sql.substring(setPos + 3, setEnd)).map { item =>
      val eq = findTopLevelEquals(item)
      require(eq > 0, s"malformed SET assignment: ${item.trim}")
      val lhs = item.substring(0, eq).trim
      val rhs = item.substring(eq + 1).trim
      require(rhs.nonEmpty, s"empty SET expression for $lhs")
      val col = lhs.split("\\.").last
      require(col.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"SET left-hand side must be a column name, got: $lhs")
      (col, rhs)
    }
    require(sets.nonEmpty, "UPDATE SET with no assignments")
    require(sets.map(_._1.toLowerCase).distinct.size == sets.size,
      "duplicate column in UPDATE SET")
    val where =
      if (wherePos < 0) None
      else {
        val w = sql.substring(wherePos + 5).trim
        require(w.nonEmpty, "empty WHERE in UPDATE")
        Some(w)
      }
    Update(name, alias, sets, where)
  }

  private def parseDelete(sql: String, m: String, start: Int): Delete = {
    var i = skipWs(m, start + 6)
    require(wordAt(m, i, "from"), "DELETE must be followed by FROM")
    i = skipWs(m, i + 4)
    val wherePos = findTopLevelKeywordIn(m, i, "where")
    val refEnd = if (wherePos < 0) sql.length else wherePos
    val (name, alias) = parseTargetRef(sql.substring(i, refEnd), "DELETE")
    val where =
      if (wherePos < 0) None
      else {
        val w = sql.substring(wherePos + 5).trim
        require(w.nonEmpty, "empty WHERE in DELETE")
        Some(w)
      }
    Delete(name, alias, where)
  }

  // same '=' scanner as MergeSql (kept local: private there)
  private def findTopLevelEquals(item: String): Int = {
    val m = stripLiterals(item)
    var depth = 0
    var i = 0
    while (i < m.length) {
      val c = m.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == '=' && depth == 0) {
        val prev = if (i > 0) m.charAt(i - 1) else ' '
        val nxt = if (i + 1 < m.length) m.charAt(i + 1) else ' '
        if (prev != '<' && prev != '>' && prev != '!' && prev != '=' &&
          nxt != '=') return i
      }
      i += 1
    }
    -1
  }

  /** Execute a parsed DML statement. `resolve` maps the target name to
    * its frame (session catalog at the session surface); `runStmt` runs
    * a SELECT source through the caller's full SQL pipeline.
    */
  def run(spark: SparkSession, st: Stmt, resolve: String => DataFrame,
          runStmt: String => DataFrame): DataFrame = st match {
    case Insert(ref, cols, values, source) =>
      val t = resolve(ref)
      val src = (values, source) match {
        case (Some(v), _) => spark.sql(s"SELECT * FROM VALUES $v")
        case (_, Some(s)) => runStmt(s)
        case _ => throw new IllegalStateException("unreachable")
      }
      cols.foreach { cs =>
        cs.foreach { c =>
          require(t.columns.exists(_.equalsIgnoreCase(c)),
            s"INSERT references unknown target column '$c' " +
              s"(target has: ${t.columns.mkString(", ")})")
        }
        require(cs.size == src.columns.length,
          s"INSERT column list (${cs.size}) and source width " +
            s"(${src.columns.length}) differ")
      }
      if (cols.isEmpty)
        require(src.columns.length == t.columns.length,
          s"positional INSERT source has ${src.columns.length} columns, " +
            s"target has ${t.columns.length}")
      val srcCols = src.columns
      val aligned = src.select(t.schema.fields.toSeq.map { f =>
        val pos = cols match {
          case Some(cs) => cs.indexWhere(_.equalsIgnoreCase(f.name))
          case None => t.columns.indexOf(f.name)
        }
        val e: Column =
          if (pos < 0) lit(null) else src.col(s"`${srcCols(pos)}`")
        e.cast(f.dataType).as(f.name)
      }: _*)
      t.union(aligned)

    case Update(ref, alias, sets, where) =>
      val t = resolve(ref).as(alias)
      sets.foreach { case (n, _) =>
        require(t.columns.exists(_.equalsIgnoreCase(n)),
          s"UPDATE references unknown column '$n' " +
            s"(target has: ${t.columns.mkString(", ")})")
      }
      val pred = where.map(expr).getOrElse(lit(true))
      t.select(t.schema.fields.toSeq.map { f =>
        sets.find(_._1.equalsIgnoreCase(f.name)) match {
          case Some((_, e)) =>
            when(pred, expr(e).cast(f.dataType))
              .otherwise(col(s"$alias.`${f.name}`")).as(f.name)
          case None => col(s"$alias.`${f.name}`").as(f.name)
        }
      }: _*)

    case Delete(ref, alias, where) =>
      val t = resolve(ref).as(alias)
      where match {
        case None => t.limit(0) // DELETE without WHERE removes all rows
        case Some(w) => t.filter(!coalesce(expr(w), lit(false)))
      }
  }
}
