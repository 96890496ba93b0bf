package graft


import graft.api.Table

/** WITH RECURSIVE at the SQL surface (gr07 machinery): Spark 4 executes
  * linear-recursive CTEs natively (SPARK-24497 / UnionLoop), and the
  * dialect passes — rewrite, alias-into-WHERE, nulls-last, QUALIFY /
  * DISTINCT ON detection — must leave recursive statements intact on
  * their way through [[Table.sessionSql]].
  */
class RecursiveSqlSpec extends GraftSuite {
  import spark.implicits._

  test("sessionSql executes a recursive CTE with a join step natively") {
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst").createOrReplaceTempView("edges")
    val got = Table.sessionSql(spark,
      """WITH RECURSIVE reach(id, hops) AS (
           SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
           UNION ALL
           SELECT e.dst, r.hops + 1
           FROM reach r JOIN edges e ON e.src = r.id
           WHERE r.hops < 10)
         SELECT id, hops FROM reach ORDER BY id""").toDF
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the 10->11 component is unreachable from seed 1
    assert(got.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("recursive text survives the dialect rewrites it does not target") {
    import graft.sql.Dialect
    val sql =
      """WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL
           SELECT n + 1 FROM t WHERE n < 4)
         SELECT n FROM t ORDER BY n"""
    assert(Dialect.rewrite(sql) == sql)
    assert(Dialect.distinctOn(sql).isEmpty)
    assert(Dialect.splitQualify(sql).isEmpty)
    assert(!graft.sql.AsOfSql.detect(sql))
  }

  test("nulls-last ORDER BY rewrite composes with a recursive CTE") {
    Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "tag").createOrReplaceTempView("rn_items")
    val got = Table.sessionSql(spark,
      """WITH RECURSIVE r(id, hops) AS (
           SELECT CAST(1 AS BIGINT), 0
           UNION ALL SELECT id + 1, hops + 1 FROM r WHERE id < 3)
         SELECT i.tag FROM r JOIN rn_items i ON i.id = r.id
         ORDER BY i.tag""").toDF.collect().map(r => Option(r.getString(0)))
    // DuckDB sorts nulls last; the dialect pass must reach the outer
    // ORDER BY even when the statement opens with WITH RECURSIVE
    assert(got.toSeq == Seq(Some("a"), Some("b"), None))
  }

  test("UNION-distinct recursion is rejected by Spark (documented gap)") {
    val e = intercept[Exception] {
      Table.sessionSql(spark,
        """WITH RECURSIVE t(n) AS (SELECT 1 UNION
             SELECT (n % 3) + 1 FROM t)
           SELECT n FROM t""").toDF.collect()
    }
    assert(e.getMessage.contains("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"))
  }
}
