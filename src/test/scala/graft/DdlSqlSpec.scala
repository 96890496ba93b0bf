package graft

import graft.api.Table
import org.apache.spark.sql.functions._

/** CTAS / CREATE VIEW statement forms (u11, [[graft.sql.DdlSql]]):
  * snapshot-vs-binding semantics, already-exists refusals, and the
  * native-path boundary.
  */
class DdlSqlSpec extends GraftSuite {
  import spark.implicits._

  test("CREATE TABLE materializes once; CREATE VIEW re-executes per " +
    "reference") {
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .createOrReplaceTempView("ddl_base")
    val t = Table.sessionSql(spark,
      "CREATE OR REPLACE TEMP TABLE ddl_t AS SELECT k, v * 2 AS v2 " +
        "FROM ddl_base").toDF
    // the statement RETURNS the defined table (u09/u10 convention)
    assert(t.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 20L), (2L, 40L)))
    // materialized vs recomputed: a per-query clock pins it — the TABLE
    // froze its timestamp at definition; the VIEW computes a fresh one
    // per reference (both are EARLY-BOUND in names, documented)
    Table.sessionSql(spark,
      "CREATE OR REPLACE TEMP TABLE ddl_ts_t AS SELECT current_timestamp() AS ts")
    Table.sessionSql(spark,
      "CREATE OR REPLACE VIEW ddl_ts_v AS SELECT current_timestamp() AS ts")
    val t1 = spark.table("ddl_ts_t").collect().head.getTimestamp(0)
    val v1 = spark.table("ddl_ts_v").collect().head.getTimestamp(0)
    Thread.sleep(50)
    val t2 = spark.table("ddl_ts_t").collect().head.getTimestamp(0)
    val v2 = spark.table("ddl_ts_v").collect().head.getTimestamp(0)
    assert(t1 == t2, "TABLE must serve the materialized snapshot")
    assert(v1 != v2, "VIEW must re-execute its defining plan")
  }

  test("without OR REPLACE an existing binding refuses loudly") {
    Seq(1L).toDF("k").createOrReplaceTempView("ddl_dup")
    val e = intercept[IllegalArgumentException](Table.sessionSql(spark,
      "CREATE TABLE ddl_dup AS SELECT 1 AS x"))
    assert(e.getMessage.contains("already exists"))
    // a fresh name binds fine without OR REPLACE
    spark.catalog.dropTempView("ddl_fresh")
    assert(Table.sessionSql(spark,
      "CREATE TABLE ddl_fresh AS SELECT 1 AS x").toDF.count() == 1)
  }

  test("dialect forms compose inside the AS body; other CREATE forms " +
    "and malformed shapes behave") {
    Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "x")
      .createOrReplaceTempView("ddl_gb")
    val t = Table.sessionSql(spark,
      """CREATE OR REPLACE TEMP TABLE ddl_all AS
         SELECT g, count(*) AS n, sum(x) AS sx FROM ddl_gb
         GROUP BY ALL ORDER BY ALL""").toDF
    assert(t.columns.toSeq == Seq("g", "n", "sx"))
    assert(t.count() == 2)
    // CREATE forms this engine does not claim keep the native path
    // (here: Spark's own CREATE TEMPORARY VIEW ... USING errors natively,
    // proving DdlSql.parse returned None rather than claiming it)
    assert(graft.sql.DdlSql.parse(
      "CREATE DATABASE somewhere").isEmpty)
    assert(graft.sql.DdlSql.parse(
      "CREATE INDEX idx ON t (k)").isEmpty)
    // claimed-but-malformed shapes refuse loudly
    assert(intercept[IllegalArgumentException](graft.sql.DdlSql.parse(
      "CREATE TABLE db.t AS SELECT 1")).getMessage
      .contains("plain session view name"))
    assert(intercept[IllegalArgumentException](graft.sql.DdlSql.parse(
      "CREATE TABLE t (k INT)")).getMessage.contains("AS <select>"))
  }

  test("TABLE materializes once: the snapshot survives source removal") {
    Seq((7L, "x")).toDF("k", "tag").createOrReplaceTempView("ddl_tmp_src")
    Table.sessionSql(spark,
      "CREATE OR REPLACE TEMP TABLE ddl_snap AS SELECT * FROM ddl_tmp_src")
    spark.catalog.dropTempView("ddl_tmp_src")
    // a VIEW over the dropped source would fail to analyze; the TABLE
    // snapshot still serves
    assert(spark.table("ddl_snap").collect().head.getLong(0) == 7L)
  }
}
