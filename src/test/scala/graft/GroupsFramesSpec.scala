package graft

import graft.api.Table
import graft.sql.Dialect

/** GROUPS window-frame mode (w14): dense_rank + RANGE lowering. The
  * expected values are the SQL-standard GROUPS semantics computed by
  * hand on the fixture (DuckDB 1.0 cannot probe them — its parser
  * predates GROUPS; the w14 driver oracle re-derives them relationally).
  */
class GroupsFramesSpec extends GraftSuite {
  import spark.implicits._

  private def fixture(): Unit =
    Seq((1, 1, 10L), (1, 1, 20L), (1, 2, 30L), (1, 2, 5L), (1, 3, 40L),
      (2, 1, 7L))
      .toDF("p", "g", "v").createOrReplaceTempView("gf")

  test("GROUPS between / running / backward / single-bound shorthand") {
    fixture()
    val got = Table.sessionSql(spark,
      """SELECT p, g, v,
           SUM(v) OVER (PARTITION BY p ORDER BY g
             GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s,
           COUNT(*) OVER (PARTITION BY p ORDER BY g
             GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
           SUM(v) OVER (PARTITION BY p ORDER BY g
             GROUPS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS sb,
           MIN(v) OVER (PARTITION BY p ORDER BY g
             GROUPS 1 PRECEDING) AS mn
         FROM gf ORDER BY p, g, v""").toDF
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getLong(6))).toSeq
    assert(got == Seq(
      (1, 1, 10L, 65L, 2L, -1L, 10L),
      (1, 1, 20L, 65L, 2L, -1L, 10L),
      (1, 2, 5L, 105L, 4L, 30L, 5L),
      (1, 2, 30L, 105L, 4L, 30L, 5L),
      (1, 3, 40L, 75L, 5L, 65L, 5L),
      (2, 1, 7L, 7L, 1L, -1L, 7L)))
  }

  test("the wrap keeps WHERE below the windows and the alias resolving") {
    fixture()
    val got = Table.sessionSql(spark,
      """SELECT t.g, SUM(t.v) OVER (ORDER BY t.g
           GROUPS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s
         FROM gf t WHERE t.p = 1 AND t.v <> 5
         ORDER BY t.g, t.v""").toDF
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // rows after WHERE: (1,10),(1,20),(2,30),(3,40) — suffix group sums
    assert(got == Seq((1, 100L), (1, 100L), (2, 70L), (3, 40L)))
  }

  test("same (partition, order) pair shares one group-index column") {
    fixture()
    val q = """SELECT SUM(v) OVER (PARTITION BY p ORDER BY g
                 GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a,
               COUNT(*) OVER (PARTITION BY p ORDER BY g
                 GROUPS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS b
               FROM gf"""
    val rewritten = Dialect.rewriteGroupsFrames(q)
    assert(rewritten.contains("__grp_0") && !rewritten.contains("__grp_1"))
    assert(Table.sessionSql(spark, q).toDF.count() == 6L)
  }

  test("nulls in the ORDER key group LAST (the dialect's sort default)") {
    Seq((1, Option(1), 10L), (1, Option.empty[Int], 99L), (1, Option(2), 30L))
      .toDF("p", "g", "v").createOrReplaceTempView("gfn")
    val got = Table.sessionSql(spark,
      """SELECT v, SUM(v) OVER (ORDER BY g
           GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
         FROM gfn ORDER BY v""").toDF
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // null group is LAST: its 1-PRECEDING window reaches g=2, not g=1
    assert(got == Seq((10L, 10L), (30L, 40L), (99L, 129L)))
  }

  test("loud refusals: subquery, star, join, WITH, no ORDER BY") {
    fixture()
    def bad(sql: String): String =
      intercept[IllegalArgumentException](
        Table.sessionSql(spark, sql).toDF.collect()).getMessage
    assert(bad("""SELECT x FROM (SELECT SUM(v) OVER (ORDER BY g
        GROUPS 1 PRECEDING) AS x FROM gf) t""")
      .contains("outermost SELECT"))
    assert(bad("""SELECT *, SUM(v) OVER (ORDER BY g GROUPS 1 PRECEDING)
        FROM gf""").contains("select item"))
    assert(bad("""SELECT a.v FROM gf a JOIN gf b ON a.g = b.g
        WHERE SUM(a.v) OVER (ORDER BY a.g GROUPS 1 PRECEDING) > 0""")
      .contains("single-table"))
    assert(bad("""WITH c AS (SELECT * FROM gf)
        SELECT SUM(v) OVER (ORDER BY g GROUPS 1 PRECEDING) FROM c""")
      .contains("plain SELECT"))
    assert(bad("""SELECT SUM(v) OVER (PARTITION BY p
        GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM gf""")
      .contains("requires an ORDER BY"))
  }

  test("an identifier named groups never triggers the rewrite") {
    val q = "SELECT groups, SUM(v) OVER (PARTITION BY groups ORDER BY o) FROM t"
    assert(Dialect.rewriteGroupsFrames(q) == q)
    val q2 = "SELECT 'groups between' AS s FROM t -- groups 1 preceding"
    assert(Dialect.rewriteGroupsFrames(q2) == q2)
  }
}
