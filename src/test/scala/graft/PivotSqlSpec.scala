package graft

import graft.api.Table
import org.apache.spark.sql.functions._

/** DuckDB PIVOT / UNPIVOT statement forms (q61/q62): expected values and
  * column names probed against DuckDB 1.0 on identical fixtures.
  */
class PivotSqlSpec extends GraftSuite {
  import spark.implicits._

  private def bind(): Unit =
    Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L), ("a", "x", 10L))
      .toDF("g", "k", "v").createOrReplaceTempView("pv")

  test("PIVOT: dynamic ON values, implicit GROUP BY, DuckDB naming") {
    bind()
    // no GROUP BY: g is the only column not pivoted/aggregated
    val out = Table.sessionSql(spark,
      "PIVOT pv ON k USING sum(v) ORDER BY g").toDF
    assert(out.columns.toSeq == Seq("g", "x", "y"))
    assert(out.collect().map(r => (r.getString(0), Option(r.get(1)),
      Option(r.get(2)))).toSeq ==
      Seq(("a", Some(11L), Some(2L)), ("b", Some(3L), None)))
  }

  test("PIVOT: IN list, single aliased agg renames to value_alias") {
    bind()
    val out = Table.sessionSql(spark,
      "PIVOT pv ON k IN ('x') USING sum(v) AS s GROUP BY g ORDER BY g").toDF
    assert(out.columns.toSeq == Seq("g", "x_s"))
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 11L), ("b", 3L)))
  }

  test("PIVOT: multiple aliased aggregates interleave value_alias columns") {
    bind()
    val out = Table.sessionSql(spark,
      "PIVOT pv ON k USING sum(v) AS s, count(*) AS n GROUP BY g ORDER BY g").toDF
    assert(out.columns.toSet == Set("g", "x_s", "x_n", "y_s", "y_n"))
    val a = out.collect().head
    assert(a.getLong(a.fieldIndex("x_s")) == 11L &&
      a.getLong(a.fieldIndex("x_n")) == 2L &&
      a.getLong(a.fieldIndex("y_n")) == 1L)
  }

  test("PIVOT over a subquery source; trailing LIMIT") {
    bind()
    val out = Table.sessionSql(spark,
      """PIVOT (SELECT g, k, v * 2 AS v FROM pv) ON k USING sum(v)
         GROUP BY g ORDER BY g LIMIT 1""").toDF.collect()
    assert(out.length == 1 && out.head.getLong(1) == 22L)
  }

  test("UNPIVOT: NULL cells drop (DuckDB semantics), names bind") {
    Seq(("a", Some(1L), Option.empty[Long]), ("b", Option.empty[Long], Some(4L)))
      .toDF("g", "x", "y").createOrReplaceTempView("uv")
    val out = Table.sessionSql(spark,
      "UNPIVOT uv ON x, y INTO NAME k VALUE v ORDER BY g, k").toDF
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "x", 1L), ("b", "y", 4L)))
  }

  test("loud guards: unknown ON column, multi-agg without aliases, " +
      "all-columns-consumed pivot") {
    bind()
    def bad(q: String): String = intercept[Exception](
      Table.sessionSql(spark, q).toDF.collect()).getMessage
    assert(bad("PIVOT pv ON nope USING sum(v) GROUP BY g")
      .contains("not in the source"))
    assert(bad("PIVOT pv ON k USING sum(v), count(*) GROUP BY g")
      .contains("requires an AS alias"))
    assert(bad("PIVOT (SELECT k, v FROM pv) ON k USING sum(v)")
      .contains("no grouping columns"))
    assert(bad("UNPIVOT pv ON nope INTO NAME a VALUE b")
      .contains("not in the source"))
  }

  test("non-PIVOT statements pass through untouched") {
    assert(graft.sql.PivotSql.parsePivot("SELECT 'pivot pv on k' AS s").isEmpty)
    assert(graft.sql.PivotSql.parseUnpivot("-- unpivot\nSELECT 1").isEmpty)
  }

  test("a column named like an aggregate function stays in the " +
      "implicit GROUP BY") {
    Seq(("a", "x", 1L, 7L), ("a", "y", 2L, 7L), ("b", "x", 3L, 8L))
      .toDF("g", "k", "v", "sum").createOrReplaceTempView("pv_fn")
    val out = Table.sessionSql(spark,
      "PIVOT pv_fn ON k USING sum(v) ORDER BY g").toDF
    // implicit grouping = (g, sum): the word 'sum' in the aggregate is
    // a function CALL, not a reference to the column named sum
    assert(out.columns.toSeq == Seq("g", "sum", "x", "y"))
    assert(out.collect().map(_.getLong(1)).toSeq == Seq(7L, 8L))
  }
}
