package graft

import graft.api.Table
import graft.sql.MacroSql

/** SQL macros (u23): CREATE/DROP MACRO|FUNCTION, scalar and TABLE
  * forms, positional + defaulted parameters, call-time late binding.
  * Every behavioral rule here was probed against DuckDB 1.x.
  */
class MacroSqlSpec extends GraftSuite {
  import spark.implicits._

  private def one(sql: String) = Table.sessionSql(spark, sql).toDF.collect()

  test("scalar macro: define, call, parameters substitute with parens") {
    one("CREATE OR REPLACE MACRO addx(a, b) AS a + 2 * b")
    assert(one("SELECT addx(1, 2) AS v").head.getInt(0) == 5)
    // paren-wrapping keeps precedence: (1+1) * 2, not 1 + 1*2
    one("CREATE OR REPLACE MACRO dbl(x) AS x * 2")
    assert(one("SELECT dbl(1 + 1) AS v").head.getInt(0) == 4)
    // arguments may be full expressions including function calls
    assert(one("SELECT dbl(length('abc')) AS v").head.getInt(0) == 6)
    one("DROP MACRO addx"); one("DROP MACRO dbl")
  }

  test("defaulted parameters: named-only (the DuckDB binder rule)") {
    one("CREATE OR REPLACE MACRO defm(a, b := 10) AS a * b")
    assert(one("SELECT defm(3) AS v").head.getInt(0) == 30)
    assert(one("SELECT defm(3, b := 4) AS v").head.getInt(0) == 12)
    // two positionals for one positional parameter: DuckDB binder error
    assert(intercept[IllegalArgumentException](
      one("SELECT defm(3, 4) AS v")).getMessage
      .contains("positional"))
    // unknown named parameter
    assert(intercept[IllegalArgumentException](
      one("SELECT defm(3, z := 4) AS v")).getMessage
      .contains("no parameter"))
    one("DROP MACRO defm")
  }

  test("TABLE macro expands to a derived table in FROM position") {
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s")
      .createOrReplaceTempView("mt")
    one("CREATE OR REPLACE MACRO top_ids(n) AS TABLE " +
      "SELECT id FROM mt WHERE id <= n")
    assert(one("SELECT CAST(sum(id) AS BIGINT) AS s FROM top_ids(2)")
      .head.getLong(0) == 3L)
    one("DROP MACRO top_ids")
  }

  test("late binding: a macro calling another resolves at CALL time") {
    one("CREATE OR REPLACE MACRO base(x) AS x + 1")
    one("CREATE OR REPLACE MACRO outer_m(x) AS base(x) * 10")
    assert(one("SELECT outer_m(1) AS v").head.getInt(0) == 20)
    // redefining the inner macro changes the outer's result (DuckDB
    // text macros late-bind)
    one("CREATE OR REPLACE MACRO base(x) AS x + 2")
    assert(one("SELECT outer_m(1) AS v").head.getInt(0) == 30)
    // a CTE name SHADOWS a same-named macro inside its statement
    // (DuckDB scoping; the definition head must never expand)
    assert(one(
      """WITH base(n) AS (SELECT 41)
         SELECT n + 1 AS v FROM base""").head.getInt(0) == 42)
    one("DROP MACRO base"); one("DROP MACRO outer_m")
  }

  test("macro body composes with the dialect passes (literals, " +
    "comprehensions, subscripts)") {
    one("CREATE OR REPLACE MACRO second_el(l) AS l[2]")
    assert(one("SELECT second_el([10, 20, 30]) AS v").head.getInt(0) == 20)
    one("CREATE OR REPLACE MACRO squares(l) AS [x * x FOR x IN l]")
    assert(one("SELECT squares([1, 2, 3])[3] AS v").head.getInt(0) == 9)
    one("DROP MACRO second_el"); one("DROP MACRO squares")
  }

  test("CREATE without OR REPLACE refuses a duplicate; DROP manages " +
    "the registry; IF EXISTS tolerates") {
    one("CREATE OR REPLACE MACRO dup_m(x) AS x")
    assert(intercept[IllegalArgumentException](
      one("CREATE MACRO dup_m(x) AS x + 1")).getMessage
      .contains("already exists"))
    one("DROP MACRO dup_m")
    assert(intercept[IllegalArgumentException](
      one("DROP MACRO dup_m")).getMessage.contains("does not exist"))
    one("DROP MACRO IF EXISTS dup_m") // no error
    one("CREATE FUNCTION dup_m(x) AS x - 1") // FUNCTION synonym
    assert(one("SELECT dup_m(5) AS v").head.getInt(0) == 4)
    one("DROP FUNCTION dup_m")
  }

  test("self-recursive macros refuse loudly at the expansion guard") {
    one("CREATE OR REPLACE MACRO rec_m(x) AS rec_m(x) + 1")
    assert(intercept[IllegalArgumentException](
      one("SELECT rec_m(1) AS v")).getMessage
      .contains("did not terminate"))
    one("DROP MACRO rec_m")
  }

  test("qualified names and quoted text never expand; word boundaries " +
    "hold") {
    one("CREATE OR REPLACE MACRO q_m(x) AS x * 2")
    // quoted: the call-looking text inside a literal is data
    assert(one("SELECT 'q_m(3)' AS s").head.getString(0) == "q_m(3)")
    // a column merely SHARING the macro name (no call parens) stays
    Seq(7).toDF("q_m").createOrReplaceTempView("qm_t")
    assert(one("SELECT q_m FROM qm_t").head.getInt(0) == 7)
    one("DROP MACRO q_m")
  }

  test("macros inside scripts and DML sources") {
    one("CREATE OR REPLACE MACRO cents_of(d) AS CAST(round(d * 100) AS BIGINT)")
    Seq((1, 1.25), (2, 2.5)).toDF("id", "amt")
      .createOrReplaceTempView("pay_t")
    val got = one(
      """CREATE OR REPLACE TEMP TABLE pay2 AS
           SELECT id, cents_of(amt) AS c FROM pay_t;
         SELECT CAST(sum(c) AS BIGINT) AS s FROM pay2""")
    assert(got.head.getLong(0) == 375L)
    one("DROP MACRO cents_of")
  }

  test("parse guards: malformed parameter lists refuse loudly; other " +
    "statements pass through") {
    assert(MacroSql.parseCreate("SELECT 1").isEmpty)
    assert(MacroSql.parseCreate("CREATE TABLE t AS SELECT 1").isEmpty)
    assert(MacroSql.parseDrop("DROP TABLE t").isEmpty)
    assert(intercept[IllegalArgumentException](
      one("CREATE MACRO bad_m(1x) AS 1")).getMessage
      .contains("bare identifier"))
    assert(intercept[IllegalArgumentException](
      one("CREATE MACRO bad_m(a := 1, b) AS a + b")).getMessage
      .contains("after all"))
  }
}
