package graft

import graft.api.Table
import graft.sql.PrepareSql

/** Prepared statements (u24): PREPARE / EXECUTE / DEALLOCATE with
  * DuckDB's probed placeholder rules.
  */
class PrepareSqlSpec extends GraftSuite {
  import spark.implicits._

  private def one(sql: String) = Table.sessionSql(spark, sql).toDF.collect()

  test("$N placeholders: 1-based, repeatable, paren-wrapped") {
    one("PREPARE ps1 AS SELECT CAST($1 AS INT) + 1 AS v")
    assert(one("EXECUTE ps1(41)").head.getInt(0) == 42)
    // expression arguments keep precedence through the paren wrap
    assert(one("EXECUTE ps1(20 + 21)").head.getInt(0) == 42)
    // a repeated $1 consumes ONE argument at many sites (probed)
    one("PREPARE ps2 AS SELECT CAST($1 AS INT) + CAST($1 AS INT) AS v")
    assert(one("EXECUTE ps2(3)").head.getInt(0) == 6)
  }

  test("? placeholders bind positionally") {
    one("PREPARE psq AS SELECT CAST(? AS INT) * 10 + CAST(? AS INT) AS v")
    assert(one("EXECUTE psq(4, 2)").head.getInt(0) == 42)
  }

  test("re-PREPARE replaces silently (probed); DEALLOCATE drops") {
    one("PREPARE psr AS SELECT CAST($1 AS INT) AS v")
    one("PREPARE psr AS SELECT CAST($1 AS INT) * 2 AS v")
    assert(one("EXECUTE psr(5)").head.getInt(0) == 10)
    one("DEALLOCATE PREPARE psr")
    assert(intercept[IllegalArgumentException](
      one("EXECUTE psr(5)")).getMessage.contains("does not exist"))
    assert(intercept[IllegalArgumentException](
      one("DEALLOCATE psr")).getMessage.contains("does not exist"))
  }

  test("arity mismatches and placeholder mixing refuse loudly") {
    one("PREPARE psa AS SELECT CAST($1 AS INT) AS v")
    assert(intercept[IllegalArgumentException](
      one("EXECUTE psa(1, 2)")).getMessage.contains("excess"))
    assert(intercept[IllegalArgumentException](
      one("EXECUTE psa()")).getMessage.contains("$1"))
    one("PREPARE psm AS SELECT CAST($1 AS INT) + CAST(? AS INT) AS v")
    assert(intercept[IllegalArgumentException](
      one("EXECUTE psm(1, 2)")).getMessage.contains("mixes"))
    one("DEALLOCATE psa")
    one("DEALLOCATE psm")
  }

  test("prepared statements compose with tables, dialect sugar, and " +
    "macros") {
    Seq((1, 30.0), (2, 10.0), (3, 20.0)).toDF("id", "price")
      .createOrReplaceTempView("prep_t")
    one("""PREPARE topn AS SELECT id FROM prep_t
           WHERE price > $2 ORDER BY price DESC LIMIT $1""")
    assert(one("EXECUTE topn(2, 5.0)").map(_.getInt(0)).toSeq == Seq(1, 3))
    // a macro call inside a prepared body expands at EXECUTE time
    one("CREATE OR REPLACE MACRO prep_dbl(x) AS x * 2")
    one("PREPARE pm AS SELECT prep_dbl(CAST($1 AS INT)) AS v")
    assert(one("EXECUTE pm(21)").head.getInt(0) == 42)
    one("DROP MACRO prep_dbl")
    one("DEALLOCATE topn"); one("DEALLOCATE pm")
  }

  test("placeholders inside string literals are data; other statements " +
    "pass through the parsers") {
    one("PREPARE psl AS SELECT '$1?' AS s, CAST($1 AS INT) AS v")
    val r = one("EXECUTE psl(7)").head
    assert(r.getString(0) == "$1?" && r.getInt(1) == 7)
    one("DEALLOCATE psl")
    assert(PrepareSql.parsePrepare("SELECT 1").isEmpty)
    assert(PrepareSql.parseExecute("SELECT 1").isEmpty)
    assert(PrepareSql.parseDeallocate("DROP TABLE t").isEmpty)
    // EXECUTE ... with trailing text is not this statement form
    assert(PrepareSql.parseExecute("EXECUTE x(1) WHERE a").isEmpty)
  }
}
