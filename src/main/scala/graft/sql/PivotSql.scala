package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DuckDB's `PIVOT` / `UNPIVOT` statement forms (q61/q62):
  *
  *   PIVOT <ref> ON <col> [IN (v1, …)] USING agg [AS a] [, …]
  *     [GROUP BY g1, …] [ORDER BY …] [LIMIT …]
  *   UNPIVOT <ref> ON c1, c2, … INTO NAME <n> VALUE <v>
  *     [ORDER BY …] [LIMIT …]
  *
  * lowered onto Spark's native `RelationalGroupedDataset.pivot` /
  * `Dataset.unpivot`. Naming and semantics mirror DuckDB exactly
  * (probed): a single UNALIASED aggregate names columns by the pivot
  * value alone; any ALIASED aggregate appends `_alias` (Spark does
  * this only for multi-agg, so the single-aliased case renames after
  * the fact); an omitted GROUP BY groups by every column not pivoted
  * on and not referenced by the aggregates (DuckDB's implicit rule);
  * UNPIVOT drops NULL cells.
  *
  * Scale shape: PIVOT is one hash aggregation (pivot values become a
  * wide projection — Spark's two-pass distinct-value collection when
  * the IN list is omitted, one pass when provided, which is the form
  * to prefer at 100 TB: an unbounded ON domain would both scan twice
  * and mint an unbounded schema); UNPIVOT is a map-only expand.
  */
object PivotSql {

  import Dialect.{findTopLevelKeywordIn, splitTopLevel, stripLiterals, wordAt}
  import Dialect.{matchParenAt => matchParen, skipWsAt => skipWs}

  final case class Pivot(ref: String, onCol: String,
                         inValues: Option[Seq[String]],
                         aggs: Seq[(String, Option[String])],
                         groupBy: Option[Seq[String]], tail: String)

  final case class Unpivot(ref: String, onCols: Seq[String],
                           nameCol: String, valueCol: String, tail: String)

  /** ref = bare identifier or parenthesized subquery; returns (refText,
    * next offset).
    */
  private def parseRef(sql: String, m: String, from: Int,
                       stopKw: String): (String, Int) = {
    val i = skipWs(m, from)
    if (i < m.length && m.charAt(i) == '(') {
      val close = matchParen(m, i)
      (sql.substring(i + 1, close), close + 1)
    } else {
      val stop = findTopLevelKeywordIn(m, i, stopKw)
      require(stop > i, s"expected $stopKw after the PIVOT/UNPIVOT source")
      val ref = sql.substring(i, stop).trim
      require(Dialect.isBareIdentifier(ref),
        s"PIVOT/UNPIVOT source must be a table name or (subquery), got: $ref")
      (ref, stop)
    }
  }

  private def splitTail(sql: String, m: String, from: Int): (Int, String) = {
    val cut = Seq("order", "limit", "offset")
      .map(kw => findTopLevelKeywordIn(m, from, kw)).filter(_ >= 0)
      .minOption.getOrElse(sql.length)
    (cut, sql.substring(cut).trim)
  }

  def parsePivot(sql: String): Option[Pivot] = {
    val m = stripLiterals(sql)
    var i = skipWs(m, 0)
    if (!wordAt(m, i, "pivot")) return None
    i += 5
    val (ref, afterRef) = parseRef(sql, m, i, "on")
    i = skipWs(m, afterRef)
    require(wordAt(m, i, "on"), "PIVOT needs ON <column>")
    i = skipWs(m, i + 2)
    val usingPos = findTopLevelKeywordIn(m, i, "using")
    require(usingPos > i, "PIVOT needs USING <aggregate>")
    var onPart = sql.substring(i, usingPos).trim
    var inValues: Option[Seq[String]] = None
    val inPos = findTopLevelKeywordIn(m.substring(i, usingPos), 0, "in")
    if (inPos >= 0) {
      val rel = sql.substring(i, usingPos)
      val relMask = m.substring(i, usingPos)
      val open = skipWs(relMask, inPos + 2)
      require(open < relMask.length && relMask.charAt(open) == '(',
        "PIVOT ON … IN needs a parenthesized value list")
      val close = matchParen(relMask, open)
      inValues = Some(splitTopLevel(rel.substring(open + 1, close))
        .map(_.trim))
      onPart = rel.substring(0, inPos).trim
    }
    require(onPart.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"PIVOT ON expects one column name, got: $onPart")
    val grp = findTopLevelKeywordIn(m, usingPos + 5, "group")
    val (tailCut, tail) = splitTail(sql, m, usingPos + 5)
    val aggEnd = if (grp >= 0 && grp < tailCut) grp else tailCut
    val aggs = splitTopLevel(sql.substring(usingPos + 5, aggEnd)).map { a =>
      val am = stripLiterals(a)
      val as = findTopLevelKeywordIn(am, 0, "as")
      if (as < 0) (a.trim, None)
      else {
        val alias = a.substring(as + 2).trim
        require(alias.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"malformed aggregate alias: $alias")
        (a.substring(0, as).trim, Some(alias))
      }
    }
    require(aggs.nonEmpty && aggs.forall(_._1.nonEmpty),
      "PIVOT USING needs at least one aggregate")
    require(aggs.size == 1 || aggs.forall(_._2.isDefined),
      "PIVOT with multiple aggregates requires an AS alias on each " +
        "(the aliases name the output columns)")
    val groupBy =
      if (grp < 0 || grp >= tailCut) None
      else {
        val by = findTopLevelKeywordIn(m, grp + 5, "by")
        require(by > 0, "malformed GROUP BY in PIVOT")
        Some(splitTopLevel(sql.substring(by + 2, tailCut)).map(_.trim))
      }
    Some(Pivot(ref, onPart, inValues, aggs, groupBy, tail))
  }

  def parseUnpivot(sql: String): Option[Unpivot] = {
    val m = stripLiterals(sql)
    var i = skipWs(m, 0)
    if (!wordAt(m, i, "unpivot")) return None
    i += 7
    val (ref, afterRef) = parseRef(sql, m, i, "on")
    i = skipWs(m, afterRef)
    require(wordAt(m, i, "on"), "UNPIVOT needs ON <columns>")
    i = skipWs(m, i + 2)
    val into = findTopLevelKeywordIn(m, i, "into")
    require(into > i, "UNPIVOT needs INTO NAME <col> VALUE <col>")
    val onCols = splitTopLevel(sql.substring(i, into)).map(_.trim)
    require(onCols.nonEmpty &&
      onCols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"UNPIVOT ON expects column names, got: ${onCols.mkString(", ")}")
    var k = skipWs(m, into + 4)
    require(wordAt(m, k, "name"), "UNPIVOT INTO needs NAME <col>")
    k = skipWs(m, k + 4)
    val (tailCut, tail) = splitTail(sql, m, k)
    val vPos = findTopLevelKeywordIn(m.substring(0, tailCut), k, "value")
    require(vPos > k, "UNPIVOT INTO needs VALUE <col>")
    val nameCol = sql.substring(k, vPos).trim
    val valueCol = sql.substring(vPos + 5, tailCut).trim
    require(nameCol.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      valueCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"malformed UNPIVOT INTO NAME/VALUE names: '$nameCol' / '$valueCol'")
    Some(Unpivot(ref, onCols, nameCol, valueCol, tail))
  }

  /** Identifiers the aggregate expressions reference — DuckDB's
    * implicit-GROUP-BY rule excludes them (and the ON column) from the
    * grouping set. An identifier directly followed by `(` is a FUNCTION
    * CALL, not a column reference (review-caught: a source column named
    * `sum` must not vanish from the grouping set because the aggregate
    * says `sum(v)`).
    */
  private def referencedCols(aggText: String, columns: Seq[String]): Set[String] = {
    val m = stripLiterals(aggText).toLowerCase
    columns.filter(c => {
      val p = java.util.regex.Pattern.compile(
        "(?<![a-z0-9_])" + java.util.regex.Pattern.quote(c.toLowerCase) +
          "(?![a-z0-9_])(?!\\s*\\()")
      p.matcher(m).find()
    }).toSet
  }

  /** Literal pivot values from an IN list: quoted strings keep their
    * content, numbers parse as Long/Double — the value must render to
    * the same column name DuckDB prints.
    */
  private def literalValue(t: String): Any = {
    val s = t.trim
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1)
    else if (s.matches("-?\\d+")) s.toLong
    else if (s.matches("-?\\d+\\.\\d+")) s.toDouble
    else throw new IllegalArgumentException(
      s"PIVOT IN values must be string or numeric literals, got: $s")
  }

  def runPivot(spark: SparkSession, p: Pivot,
               resolve: String => DataFrame,
               runTail: (DataFrame, String) => DataFrame): DataFrame = {
    val src = resolve(p.ref)
    require(src.columns.exists(_.equalsIgnoreCase(p.onCol)),
      s"PIVOT ON column '${p.onCol}' not in the source " +
        s"(${src.columns.mkString(", ")})")
    val groupCols = p.groupBy.getOrElse {
      val used = referencedCols(p.aggs.map(_._1).mkString(","),
        src.columns.toSeq)
      src.columns.toSeq.filterNot(c =>
        c.equalsIgnoreCase(p.onCol) || used.contains(c))
    }
    require(groupCols.nonEmpty,
      "PIVOT has no grouping columns (every column is pivoted or " +
        "aggregated) — add a GROUP BY")
    val grouped = src.groupBy(groupCols.map(col): _*)
    val pivoted = p.inValues match {
      case Some(vs) => grouped.pivot(p.onCol, vs.map(literalValue))
      case None => grouped.pivot(p.onCol)
    }
    val aggCols = p.aggs.map { case (e, a) =>
      a.fold(expr(e))(al => expr(e).as(al))
    }
    var out = pivoted.agg(aggCols.head, aggCols.tail: _*)
    // DuckDB names a single ALIASED aggregate's columns value_alias;
    // Spark appends the alias only for multi-agg — rename to match
    if (p.aggs.size == 1) p.aggs.head._2.foreach { al =>
      val gset = groupCols.map(_.toLowerCase).toSet
      out.columns.filterNot(c => gset.contains(c.toLowerCase)).foreach { c =>
        out = out.withColumnRenamed(c, s"${c}_$al")
      }
    }
    runTail(out, p.tail)
  }

  def runUnpivot(spark: SparkSession, u: Unpivot,
                 resolve: String => DataFrame,
                 runTail: (DataFrame, String) => DataFrame): DataFrame = {
    val src = resolve(u.ref)
    u.onCols.foreach(c => require(src.columns.exists(_.equalsIgnoreCase(c)),
      s"UNPIVOT ON column '$c' not in the source"))
    val ids = src.columns.toSeq.filterNot(c =>
      u.onCols.exists(_.equalsIgnoreCase(c)))
    val out = src.unpivot(ids.map(col).toArray, u.onCols.map(col).toArray,
        u.nameCol, u.valueCol)
      .filter(col(u.valueCol).isNotNull) // DuckDB drops NULL cells
    runTail(out, u.tail)
  }
}
