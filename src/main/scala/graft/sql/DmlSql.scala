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
  *     [ON CONFLICT (keys) DO NOTHING | DO UPDATE SET c = e, …]   (u12)
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
  /** `ON CONFLICT (keys) DO NOTHING | DO UPDATE SET …` (u12). The
    * conflict target is a REQUIRED explicit column list — this engine's
    * frames carry no primary-key metadata to default to. `action` None
    * = DO NOTHING; Some(sets) = DO UPDATE, whose right-hand sides may
    * reference target columns bare and the incoming row as
    * `excluded.col` (the Postgres/DuckDB spelling — exposed to the plan
    * as a genuine struct column, so resolution is the analyzer's, not
    * text surgery).
    */
  final case class Conflict(keys: Seq[String],
                            action: Option[Seq[(String, String)]])
  final case class Insert(targetRef: String, cols: Option[Seq[String]],
                          values: Option[String], source: Option[String],
                          conflict: Option[Conflict] = None)
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
      val last = Dialect.defaultAliasOf(name)
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
    val restAll = sql.substring(i)
    val restMAll = m.substring(i)
    // trailing ON CONFLICT clause (u12) splits off the source text
    val conflictPos = {
      var p = findTopLevelKeywordIn(restMAll, 0, "on")
      var found = -1
      while (p >= 0 && found < 0) {
        if (wordAt(restMAll, skipWs(restMAll, p + 2), "conflict")) found = p
        else p = findTopLevelKeywordIn(restMAll, p + 2, "on")
      }
      found
    }
    val (rest, restM) =
      if (conflictPos < 0) (restAll, restMAll)
      else (restAll.substring(0, conflictPos), restMAll.substring(0, conflictPos))
    val conflict =
      if (conflictPos < 0) None
      else Some(parseConflict(restAll.substring(conflictPos),
        restMAll.substring(conflictPos)))
    val k = skipWs(restM, 0)
    if (wordAt(restM, k, "values")) {
      val v = rest.substring(k + 6).trim
      require(v.startsWith("("),
        "INSERT VALUES needs parenthesized row expressions")
      Insert(name, cols, Some(v), None, conflict)
    } else {
      require(rest.trim.nonEmpty,
        "INSERT INTO needs VALUES (…) or a SELECT source")
      Insert(name, cols, None, Some(rest.trim), conflict)
    }
  }

  private def parseConflict(sql: String, m: String): Conflict = {
    var i = skipWs(m, 0)
    require(wordAt(m, i, "on"), "internal: conflict clause must start at ON")
    i = skipWs(m, i + 2)
    require(wordAt(m, i, "conflict"), "internal: expected CONFLICT")
    i = skipWs(m, i + 8)
    require(i < m.length && m.charAt(i) == '(',
      "ON CONFLICT needs an explicit (column, …) conflict target — this " +
        "engine's frames carry no primary key to default to")
    val close = matchParen(m, i)
    val keys = splitTopLevel(sql.substring(i + 1, close)).map(_.trim)
    require(keys.nonEmpty &&
      keys.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")) &&
      keys.map(_.toLowerCase).distinct.size == keys.size,
      s"malformed ON CONFLICT column list: ${sql.substring(i, close + 1)}")
    i = skipWs(m, close + 1)
    require(wordAt(m, i, "do"), "ON CONFLICT (…) must be followed by DO")
    i = skipWs(m, i + 2)
    if (wordAt(m, i, "nothing")) {
      require(sql.substring(i + 7).trim.isEmpty,
        s"unexpected text after DO NOTHING: ${sql.substring(i + 7).trim.take(40)}")
      Conflict(keys, None)
    } else {
      require(wordAt(m, i, "update"),
        "ON CONFLICT supports DO NOTHING or DO UPDATE SET …")
      i = skipWs(m, i + 6)
      require(wordAt(m, i, "set"), "DO UPDATE requires SET")
      val sets = parseSets(sql.substring(i + 3), "DO UPDATE")
      Conflict(keys, Some(sets))
    }
  }

  private def parseUpdate(sql: String, m: String, start: Int): Update = {
    val setPos = findTopLevelKeywordIn(m, start + 6, "set")
    require(setPos > 0, "UPDATE requires SET")
    val (name, alias) = parseTargetRef(sql.substring(start + 6, setPos),
      "UPDATE")
    val wherePos = findTopLevelKeywordIn(m, setPos + 3, "where")
    val setEnd = if (wherePos < 0) sql.length else wherePos
    val sets = parseSets(sql.substring(setPos + 3, setEnd), "UPDATE")
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

  /** `c = expr, …` assignment list (UPDATE SET and DO UPDATE SET). */
  private def parseSets(text: String, what: String): Seq[(String, String)] = {
    val sets = splitTopLevel(text).map { item =>
      val eq = Dialect.findTopLevelEquals(item)
      require(eq > 0, s"malformed SET assignment: ${item.trim}")
      val lhs = item.substring(0, eq).trim
      val rhs = item.substring(eq + 1).trim
      require(rhs.nonEmpty, s"empty SET expression for $lhs")
      val col = lhs.split("\\.").last
      require(col.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"SET left-hand side must be a column name, got: $lhs")
      (col, rhs)
    }
    require(sets.nonEmpty, s"$what SET with no assignments")
    require(sets.map(_._1.toLowerCase).distinct.size == sets.size,
      s"duplicate column in $what SET")
    sets
  }


  /** Execute a parsed DML statement. `resolve` maps the target name to
    * its frame (session catalog at the session surface); `runStmt` runs
    * a SELECT source through the caller's full SQL pipeline.
    */
  def run(spark: SparkSession, st: Stmt, resolve: String => DataFrame,
          runStmt: String => DataFrame): DataFrame = st match {
    case Insert(ref, cols, values, source, conflict) =>
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
      conflict match {
        case None => t.union(aligned)
        case Some(c) => runOnConflict(t, aligned, c)
      }

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

  /** `ON CONFLICT` lowering (u12) over the target-ALIGNED source:
    *
    *   DO NOTHING — target ∪ (source ANTI-JOIN target on the keys);
    *   DO UPDATE  — one LEFT join of target against the source, whose
    *     row rides along as a STRUCT column literally named `excluded`,
    *     so a SET expression's `excluded.c` resolves as native struct
    *     field access and a bare `c` resolves to the target column
    *     (exactly the Postgres/DuckDB scoping — no text rewriting);
    *     non-conflicting source rows append via the same anti-join.
    *
    * Contracts, all loud: the conflict keys must be target columns; a
    * source with duplicate conflict keys refuses (it would update one
    * target row twice — the u09 MERGE one-source-row rule, enforced by
    * ONE keyed aggregate, no join re-run); NULL keys never conflict
    * (SQL equality), so null-keyed source rows insert. Duplicate keys
    * in the TARGET all update — frames carry no unique constraint, the
    * documented divergence from index-backed engines.
    *
    * Scale shape: one shuffle on the conflict keys for the join, one
    * for the anti-join (AQE broadcasts a small source), the guard is
    * one keyed count; every SET is expression-level from there.
    */
  private def runOnConflict(t: DataFrame, aligned: DataFrame,
                            c: Conflict): DataFrame = {
    c.keys.foreach { k =>
      require(t.columns.exists(_.equalsIgnoreCase(k)),
        s"ON CONFLICT references unknown column '$k' " +
          s"(target has: ${t.columns.mkString(", ")})")
    }
    // NULL keys never conflict (SQL equality), so they are EXCLUDED from
    // the uniqueness guard — two null-keyed source rows both insert
    // (review-caught: counting them grouped the NULLs together and
    // falsely refused; same rule as MergeSql's guard)
    val dup = aligned
      .filter(c.keys.map(k => col(s"`$k`").isNotNull).reduce(_ && _))
      .groupBy(c.keys.map(k => col(s"`$k`")): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dup == 0,
      "ON CONFLICT source contains duplicate conflict keys — one target " +
        "row may be affected only once; deduplicate the source first")
    val newRows = aligned.join(
      t.select(c.keys.map(k => col(s"`$k`")): _*), c.keys, "left_anti")
    // re-alias every output before the union: the anti-join can carry a
    // constraint referencing the pruned target key attribute, and
    // Union's constraint rewriting crashes on it (key not found: k#N —
    // surfaced when the target is a CTAS snapshot); a fresh Project
    // with aliases keeps only output-expressible constraints
    def fresh(df: DataFrame): DataFrame =
      df.select(df.columns.map(cn => col(s"`$cn`").as(cn)): _*)
    c.action match {
      case None => fresh(t).union(fresh(newRows)) // DO NOTHING
      case Some(sets) =>
        sets.foreach { case (n, _) =>
          require(t.columns.exists(_.equalsIgnoreCase(n)),
            s"DO UPDATE SET references unknown column '$n' " +
              s"(target has: ${t.columns.mkString(", ")})")
        }
        val s2 = aligned.select(
          c.keys.map(k => col(s"`$k`").as(s"__ck_$k")) :+
            struct(aligned.columns.map(cn => col(s"`$cn`")): _*)
              .as("excluded"): _*)
        val cond = c.keys.map(k =>
          t.col(s"`$k`") === s2.col(s"`__ck_$k`")).reduce(_ && _)
        val joined = t.join(s2, cond, "left")
        val updated = joined.select(t.schema.fields.toSeq.map { f =>
          sets.find(_._1.equalsIgnoreCase(f.name)) match {
            case Some((_, e)) =>
              when(col("excluded").isNotNull, expr(e).cast(f.dataType))
                .otherwise(t.col(s"`${f.name}`")).as(f.name)
            case None => t.col(s"`${f.name}`").as(f.name)
          }
        }: _*)
        fresh(updated).union(fresh(newRows))
    }
  }
}
